package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q99 heavy hitters: the Misra-Gries guarantee (every item with true
  * count > n/(capacity+1) survives the sketch) must hold through BOTH
  * bounded-memory paths — the reduce-side decrement-all and the merge-side
  * subtraction — because the sf* corpora have vocabularies smaller than
  * the production capacity and would never fire them. The end-to-end law
  * (sketch candidates + exact rescue == naive full groupBy) is pinned here
  * and by the q99 oracle.
  */
class HeavyHittersSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  /** Skewed synthetic stream: token "hot<i>" appears 100*(8-i) times for
    * i in 0..7, plus a 2000-token distinct tail ("cold<j>" once each).
    * n = 100*(8+7+..+1) + 2000 = 3600 + 2000 = 5600. */
  private def skewedDocs: Seq[Array[String]] = {
    val rows = mutable.ArrayBuffer.empty[String]
    (0 until 8).foreach(i => (0 until 100 * (8 - i)).foreach(_ => rows += s"hot$i"))
    (0 until 2000).foreach(j => rows += s"cold$j")
    // deterministic interleave (worst case for MG is heavy items arriving
    // AFTER the buffer fills with tail): tail first, then hot
    val (cold, hot) = rows.partition(_.startsWith("cold"))
    (cold ++ hot).grouped(7).map(_.toArray).toSeq
  }

  test("reduce path: decrement-all fires and every heavy item survives") {
    val capacity = 16 // far below the 2008 distinct tokens -> constant churn
    val agg = new HeavyHitterSketch(capacity)
    var buf = agg.zero
    skewedDocs.foreach(doc => buf = agg.reduce(buf, doc))
    val cand = agg.finish(buf).toSet
    assert(buf.size <= capacity)
    // n=5600, bound n/(cap+1)=329.4: hot0..hot4 (800,700,600,500,400) are
    // guaranteed; hot5 (300) and below are not (may or may not appear)
    (0 to 4).foreach(i => assert(cand.contains(s"hot$i"),
      s"hot$i (count ${100 * (8 - i)}) lost by the sketch"))
  }

  test("merge path: subtraction compression preserves the guarantee") {
    val capacity = 16
    val agg = new HeavyHitterSketch(capacity)
    // two disjoint-tail halves, each with its own full buffer, sharing the
    // heavy items; merged n = 11200, bound = 658.8 -> hot0+hot1 guaranteed
    // per-half counts double across the merge
    def half(tag: String): mutable.HashMap[String, Long] = {
      var b = agg.zero
      val rows = mutable.ArrayBuffer.empty[String]
      (0 until 8).foreach(i => (0 until 100 * (8 - i)).foreach(_ => rows += s"hot$i"))
      (0 until 2000).foreach(j => rows += s"cold$tag$j")
      val (cold, hot) = rows.partition(_.startsWith("cold"))
      (cold ++ hot).grouped(7).foreach(doc => b = agg.reduce(b, doc.toArray))
      b
    }
    val merged = agg.merge(half("a"), half("b"))
    assert(merged.size <= capacity)
    val cand = agg.finish(merged).toSet
    (0 to 4).foreach(i => assert(cand.contains(s"hot$i"),
      s"hot$i (merged count ${200 * (8 - i)}) lost across merge"))
  }

  test("sketch undercounts are bounded by n/(capacity+1)") {
    val capacity = 16
    val agg = new HeavyHitterSketch(capacity)
    var buf = agg.zero
    skewedDocs.foreach(doc => buf = agg.reduce(buf, doc))
    val n = 5600L
    val bound = n / (capacity + 1L)
    val trueCounts = (0 until 8).map(i => s"hot$i" -> 100L * (8 - i)).toMap
    buf.foreach { case (k, c) =>
      val truth = trueCounts.getOrElse(k, 1L)
      assert(c <= truth, s"$k overcounted: sketch $c > true $truth")
      assert(truth - c <= bound, s"$k undercount ${truth - c} exceeds $bound")
    }
  }

  test("q99 end-to-end equals the naive full-vocabulary groupBy") {
    val sfDir = "/root/testdata/sf0.001"
    val result = graft.SparkEntry.queries("q99_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val naive = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("token"))
    val n = naive.count()
    val thr = math.max(n / 1000L, 5L)
    val expected = naive.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thr)
      .orderBy(col("cnt").desc, col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(result.toSeq == expected.toSeq)
    assert(result.nonEmpty, "rig degenerate: no heavy hitters at sf0.001")
  }
}
