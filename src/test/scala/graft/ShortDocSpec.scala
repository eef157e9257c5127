package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression: text queries must survive documents with fewer tokens than
  * their n-gram sizes (Spark's sequence(0,-1) descends where DuckDB's
  * generate_series is empty — divergence once crashed q34). */
class ShortDocSpec extends AnyFunSuite {

  test("q34/q49 run on a corpus containing empty and 1-2 token docs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-short").toString
    Seq(
      (0L, "", "en", "synth", 0L),
      (1L, "one", "en", "synth", 3L),
      (2L, "two words", "en", "synth", 9L),
      (3L, "three word doc", "en", "synth", 14L),
      (4L, "a full four token document right here", "en", "synth", 37L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val j = SparkEntry.queries("q34_ngram_jaccard")(spark, dir).collect()
    assert(j.length == 4) // adjacent pairs 0-1, 1-2, 2-3, 3-4
    val w = SparkEntry.queries("q49_winnowing")(spark, dir).collect()
    assert(w.length == 5)
    assert(w.take(3).forall(_.getAs[Int]("n_fingerprints") == 0))

    // r12 text family on the same degenerate corpus: the similarity join
    // falls back to token sets below the shingle width (no pair here
    // reaches tau — all texts distinct), bloom decontamination sees an
    // empty bench split (no id % 19 == 0 with spans), and the span
    // remover must pass every doc through untouched (nothing reaches
    // 8 tokens)
    assert(SparkEntry.queries("q105_similarity_join")(spark, dir)
      .collect().isEmpty)
    assert(SparkEntry.queries("q106_bloom_decontamination")(spark, dir)
      .collect().isEmpty)
    val sd = SparkEntry.queries("q112_span_dedup")(spark, dir).collect()
    assert(sd.length == 5 && sd.forall(_.getAs[Long]("n_removed") == 0L))
  }
}
