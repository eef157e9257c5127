package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q71 BPE correctness (no SQL oracle exists for an iterative tokenizer —
  * this spec IS the correctness gate):
  *
  *  - the trainer reproduces a HAND-COMPUTED merge sequence on the classic
  *    Sennrich-style vocabulary (every count and tie-break below verified
  *    on paper);
  *  - encoding an unseen word replays the merges exactly (HF semantics:
  *    lowest-rank pair first);
  *  - round-trip property: concatenating a word's subwords restores the
  *    word, for arbitrary words and any trained table;
  *  - the codegen expression path equals the driver-side encoder.
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private val vocab = Seq[(String, Long)](
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("trainer reproduces the hand-computed merge sequence") {
    // pair counts round 1: es=9, st=9 (tie -> 'es' < 'st'), we=8, lo=7,
    // ow=7, ne=6, ew=6, wi=3, id=3, de=3, er=2
    // r1 merge (e,s); r2 (es,t)=9; r3 lo=7/ow=7 tie -> (l,o);
    // r4 (lo,w)=7; r5 three-way tie at 6: (e,w) < (n,e) < (w,est)
    val merges = BpeCodec.train(vocab, 5)
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  test("encoding replays merges lowest-rank first: lowest -> [low, est]") {
    val ranks = BpeCodec.ranksOf(BpeCodec.train(vocab, 5))
    assert(BpeCodec.encodeWord("lowest", ranks).toSeq == Seq("low", "est"))
    // training words reach their end-of-training segmentation
    assert(BpeCodec.encodeWord("low", ranks).toSeq == Seq("low"))
    assert(BpeCodec.encodeWord("newest", ranks).toSeq == Seq("n", "ew", "est"))
    // unknown alphabet passes through as chars
    assert(BpeCodec.encodeWord("xyz", ranks).toSeq == Seq("x", "y", "z"))
  }

  test("round-trip: subwords concatenate back to the word") {
    val ranks = BpeCodec.ranksOf(BpeCodec.train(vocab, 5))
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      assert(BpeCodec.encodeWord(w, ranks).mkString == w, s"word '$w'")
    }
  }

  test("overlapping pair merges left-to-right: aaa -> [aa, a]") {
    val ranks = BpeCodec.ranksOf(Seq(("a", "a")))
    assert(BpeCodec.encodeWord("aaa", ranks).toSeq == Seq("aa", "a"))
    assert(BpeCodec.encodeWord("aaaa", ranks).toSeq == Seq("aa", "aa"))
  }

  test("codegen expression equals the driver-side encoder") {
    val sp = spark
    import sp.implicits._
    GraftFunctions.register(sp)
    val merges = BpeCodec.train(vocab, 5)
    val ranks = BpeCodec.ranksOf(merges)
    val mergesLit = BpeCodec.formatMerges(merges)
    val docs = Seq("lowest newest wide", "low lower", "").toDF("text")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sub", expr(s"bpe_encode(toks, '$mergesLit')"))
    val got = docs.select("sub").as[Seq[String]].collect().toSeq
    val want = Seq("lowest newest wide", "low lower", "").map(
      _.split(" ").filter(_.nonEmpty).flatMap(w =>
        BpeCodec.encodeWord(w, ranks)).toSeq)
    assert(got == want)
  }

  test("q71 runs end-to-end: positive subword counts, words never split up") {
    val out = graft.SparkEntry.queries("q71_bpe_encode")(
      spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length > 0)
    // merges never cross word boundaries and every word yields >= 1 subword
    assert(rows.forall(r =>
      r.getAs[Int]("n_subwords") >= r.getAs[Int]("n_words")))
    // merges actually fired somewhere: some doc has fewer subwords than chars
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chars = docs.select(sum(length(regexp_replace(col("text"), " ", ""))))
      .head().getLong(0)
    val subs = rows.map(_.getAs[Int]("n_subwords").toLong).sum
    assert(subs < chars, "no merge ever fired — BPE table is dead")
  }
}
