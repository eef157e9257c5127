package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the r12 ingest/decontamination additions beyond
  * engine parity (the DuckDB hash-match proves Spark == DuckDB, not that
  * the operators do their jobs): q101 fuzzy decontamination and q102
  * incremental ingest dedup, on synthesized fixtures with KNOWN
  * contamination/duplication structure plus the live sf0.001 corpus.
  */
class IngestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private val words = (1 to 40).map(i => s"w$i")

  test("q101: an exact benchmark copy scores Jaccard 1.0 and is flagged") {
    // bench doc 19 (19 % 19 == 0) and train doc 20 share their FULL text;
    // train doc 21 shares only the first half; train doc 22 is disjoint
    val t = words.mkString(" ")
    val half = (words.take(20) ++ (1 to 20).map(i => s"u$i")).mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val tmp = writeDocs(Seq(19L -> t, 20L -> t, 21L -> half, 22L -> other))

    val rows = SparkEntry.queries("q101_fuzzy_decontamination")(spark, tmp)
      .collect()
    val byDoc = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(byDoc(20L) == ((19L, 1.0, true)),
      s"exact copy not fully flagged: ${byDoc.get(20L)}")
    val (b21, j21, c21) = byDoc(21L)
    assert(b21 == 19L && j21 > 0.0 && j21 < 1.0 && !c21,
      s"half overlap should score in (0, tau): ${byDoc(21L)}")
    assert(!byDoc.contains(22L), "a disjoint doc must not appear at all")
  }

  test("q101 on the live corpus: report is sorted, split-respecting, bounded") {
    val rows = SparkEntry.queries("q101_fuzzy_decontamination")(spark, dir)
      .collect()
    assert(rows.nonEmpty, "live corpus has cross-split near-dups; none found")
    assert(rows.length <= 50)
    rows.foreach { r =>
      assert(r.getLong(0) % 19 != 0, "a bench doc leaked into the train side")
      assert(r.getLong(1) % 19 == 0, "a train doc leaked into the bench side")
      val j = r.getDouble(2)
      assert(j > 0.0 && j <= 1.0, s"jaccard out of range: $j")
    }
    val sims = rows.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse, "report not sorted by similarity")
  }

  test("q102: exact copy -> 'exact' with sim 1; disjoint text -> 'novel'") {
    val t1 = words.mkString(" ")
    val t2 = (1 to 40).map(i => s"v$i").mkString(" ")
    val novel = (1 to 40).map(i => s"q$i").mkString(" ")
    // stored: 1, 2; batch (% 10 == 7): 7 = byte-identical to stored 1,
    // 17 = vocabulary-disjoint from everything stored
    val tmp = writeDocs(Seq(1L -> t1, 2L -> t2, 7L -> t1, 17L -> novel))

    val rows = SparkEntry.queries("q102_ingest_dedup")(spark, tmp).collect()
    val byDoc = rows.map(r => r.getLong(0) -> r).toMap
    assert(rows.length == 2, s"batch is exactly {7, 17}: ${rows.toSeq}")
    val r7 = byDoc(7L)
    assert(r7.getString(1) == "exact" && r7.getLong(2) == 1L
      && r7.getDouble(3) == 1.0, s"exact copy misclassified: $r7")
    val r17 = byDoc(17L)
    assert(r17.getString(1) == "novel" && r17.isNullAt(2) && r17.isNullAt(3),
      s"disjoint doc misclassified: $r17")
  }

  test("q103: a benchmark vector duplicated into train is found at cosine 1.0") {
    // 40 deterministic 8-dim vectors; train vec 20 is BYTE-IDENTICAL to
    // bench vec 19 (identical vectors always share a home cell — equal
    // distances to every centroid — so the IVF search cannot miss it)
    val sp = spark
    import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-semdecon").toString
    def vec(i: Long): Array[Float] =
      (0 until 8).map(j => math.sin(i * 7.0 + j).toFloat).toArray
    val rows = (0L until 40L).map(i =>
      (i, if (i == 20L) vec(19L) else vec(i), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val out = SparkEntry.queries("q103_semantic_decontamination")(sp, tmp)
      .collect()
    val top = out.head
    assert(top.getLong(0) == 20L && top.getLong(1) == 19L
      && top.getDouble(2) == 1.0 && top.getBoolean(3),
      s"planted semantic duplicate not ranked first: $top")
    out.foreach { r =>
      assert(r.getLong(0) % 19 != 0 && r.getLong(1) % 19 == 0,
        s"split leak: $r")
    }
  }

  test("q103 on the live corpus: report is sorted, split-respecting, bounded") {
    val rows = SparkEntry.queries("q103_semantic_decontamination")(spark, dir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getLong(0) % 19 != 0 && r.getLong(1) % 19 == 0, s"split leak: $r")
      val sim = r.getDouble(2)
      assert(sim >= -1.0 - 1e-9 && sim <= 1.0 + 1e-9, s"cosine out of range: $r")
      assert(r.getBoolean(3) == (sim >= graft.queries.TextSearch.SemTau),
        s"flag inconsistent with SemTau: $r")
    }
    val sims = rows.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse, "report not sorted by similarity")
  }

  test("q102 on the live corpus: statuses partition the batch, near is evidenced") {
    val sp = spark
    val out = SparkEntry.queries("q102_ingest_dedup")(sp, dir)
    val rows = out.collect()
    val batchCount = sp.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 === 7).count()
    assert(rows.length == batchCount,
      s"every batch doc classified exactly once: ${rows.length} vs $batchCount")
    rows.foreach { r =>
      r.getString(1) match {
        case "novel" =>
          assert(r.isNullAt(2) && r.isNullAt(3), s"novel with anchor: $r")
        case "exact" | "near" =>
          assert(!r.isNullAt(2) && r.getLong(2) % 10 != 7,
            s"anchor must be a STORED doc: $r")
          // any shared band implies >= 4 of 12 equal minhashes vs SOME
          // stored doc; the chosen (min-id) anchor of a 'near' doc shares
          // a band with it by construction
          if (r.getString(1) == "near")
            assert(r.getDouble(3) >= 4.0 / 12 - 1e-9,
              s"near anchor without band-level agreement: $r")
        case other => fail(s"unknown status $other")
      }
    }
    // the corpus's near-dup structure must surface (it drives q35/q51 too)
    assert(rows.exists(_.getString(1) == "near"),
      "live corpus has near-dups straddling the batch split; none detected")
  }
}
