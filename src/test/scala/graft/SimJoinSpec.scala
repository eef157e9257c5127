package graft

import graft.queries.SimJoin
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Exactness checks for q105's prefix-filtered set-similarity join beyond
  * engine parity (the DuckDB oracle runs the NAIVE all-pairs join, so the
  * driver hash-match already proves cross-algorithm equality at sf0.01):
  * a planted boundary fixture, live-corpus equality against the in-engine
  * naive twin, randomized corpora hammering the prefix-filter lemma, and
  * the filter's selectivity pinned on the live corpus.
  */
class SimJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def setsOf(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    SimJoin.shingleSetsOf(rows.toDF("doc_id", "text"))
  }

  test("planted pairs: exact copy collapses, tau boundary kept, just-below dropped") {
    val w = (1 to 21).map(i => s"w$i")
    val a = w.take(20).mkString(" ") // 16 shingles
    // byte-identical to a: collapsed by the built-in q30 composition
    val copy = a
    // 12 shared shingles, 16 each: J = 12/20 = 0.6 — EXACTLY tau, kept
    val boundary = (w.take(16) ++ (1 to 4).map(i => s"x$i")).mkString(" ")
    // 11 shared shingles: J = 11/21 < tau, dropped
    val below = (w.take(15) ++ (1 to 5).map(i => s"y$i")).mkString(" ")
    // one extra trailing token: 17 shingles, 16 shared with a ->
    // J = 16/17 (a NEAR-identical pair that must survive the collapse)
    val nearCopy = w.mkString(" ")
    val sets = setsOf(Seq(1L -> a, 2L -> copy, 3L -> boundary, 4L -> below,
      5L -> nearCopy))

    val got = SimJoin.similarPairs(sets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getDouble(5)))
    assert(got.toSet == Set((1L, 3L, 12L, 0.6), (1L, 5L, 16L, 0.9412)),
      s"boundary fixture mismatch: ${got.mkString(", ")}")
  }

  test("live corpus: prefix-filtered output equals the naive twin row for row") {
    val sets = SimJoin.shingleSets(spark, dir)
    val fast = SimJoin.similarPairs(sets).collect().toSeq
    val naive = SimJoin.naivePairs(sets).collect().toSeq
    assert(fast.nonEmpty, "live corpus has planted near-dups; none found")
    assert(fast == naive,
      s"prefix filter dropped or invented pairs: fast=${fast.size} naive=${naive.size}")
  }

  test("live corpus: candidate set is prefix-bounded, not all-pairs") {
    val sets = SimJoin.shingleSets(spark, dir)
    val n = sets.count()
    val cand = SimJoin.candidatePairs(sets).count()
    val result = SimJoin.similarPairs(sets).count()
    assert(cand >= result, "candidates must cover the result set")
    // 500 docs -> 124,750 unordered pairs; the filter must reduce this by
    // orders of magnitude (measured: ~30 candidates)
    assert(cand * 100 < n * (n - 1) / 2,
      s"prefix filter is not selective: $cand candidates for $n docs")
  }

  test("randomized corpora: prefix filter never loses a qualifying pair") {
    // small vocabulary + short docs force heavy shingle collisions, hot
    // shingles, and the under-5-token fallback path — the adversarial
    // regime for the prefix lemma's global-order reasoning
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val vocabSize = 3 + rnd.nextInt(5)
      val docs = (1L to (4 + rnd.nextInt(8)).toLong).map { id =>
        val len = 1 + rnd.nextInt(9)
        id -> (1 to len).map(_ => s"t${rnd.nextInt(vocabSize)}").mkString(" ")
      }
      val sets = setsOf(docs)
      val fast = SimJoin.similarPairs(sets).collect().toSeq
      val naive = SimJoin.naivePairs(sets).collect().toSeq
      assert(fast == naive,
        s"trial $trial diverged on corpus $docs: fast=$fast naive=$naive")
    }
  }

  test("q117 planted: embedded quote found DIRECTED; Jaccard would miss it; tiny inner excluded") {
    // outer = 60 tokens (56 shingles); inner = its first 14 tokens
    // (10 shingles, all shared) -> c(inner->outer) = 1.0 while
    // J = 10/56 ~ 0.18 — far under q105's bar: the relation only the
    // containment join sees. tiny = 4 tokens (1 fallback shingle,
    // also inside outer? no - distinct words) under MinInnerShingles.
    val w = (1 to 60).map(i => s"w$i")
    val outer = w.mkString(" ")
    val inner = w.take(14).mkString(" ")
    val tiny = (1 to 4).map(i => s"w$i").mkString(" ")
    val rows = SimJoin.containmentPairs(setsOf(Seq(
      1L -> outer, 2L -> inner, 3L -> tiny))).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 1L)),
      s"expected exactly inner->outer containment: ${rows.toSeq}")
    val r = rows.head
    assert(r.getLong(2) == 10 && r.getLong(4) == 10
      && r.getDouble(5) == 1.0, s"wrong containment row: $r")
    // and q105 indeed cannot see it (J ~ 0.18 < 0.6)
    assert(SimJoin.similarPairs(setsOf(Seq(1L -> outer, 2L -> inner)))
      .collect().isEmpty, "Jaccard join unexpectedly caught the quote")
  }

  test("q117 randomized: one-sided prefix filter never loses a qualifying pair") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val vocabSize = 4 + rnd.nextInt(6)
      val docs = (1L to (5 + rnd.nextInt(8)).toLong).map { id =>
        val len = 1 + rnd.nextInt(14)
        id -> (1 to len).map(_ => s"t${rnd.nextInt(vocabSize)}").mkString(" ")
      }
      val sets = setsOf(docs)
      val fast = SimJoin.containmentPairs(sets).collect().toSeq
      val naive = SimJoin.naiveContainmentPairs(sets).collect().toSeq
      assert(fast == naive,
        s"trial $trial diverged on corpus $docs: fast=$fast naive=$naive")
    }
  }
}
