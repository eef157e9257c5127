package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class WeightedPercentileSpec extends AnyFunSuite {

  test("finish computes the weighted lower-interpolation percentile") {
    val agg = new WeightedPercentile(0.5)
    val buf = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (100.0, 1.0))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == 2.0) // cum weight 2 >= 0.5*4
    // heavy weight drags the percentile
    val buf2 = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 10.0))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf2) == 3.0)
  }

  test("merge is associative and order-insensitive") {
    val agg = new WeightedPercentile(0.9)
    val xs = (1 to 100).map(i => (i.toDouble, 1.0))
    val (l, r) = xs.splitAt(37)
    // merge mutates its left buffer in place (that is the r4 fix: no
    // per-row immutable-map churn) — build fresh partials per merge
    def partial(s: Seq[(Double, Double)]) = s.foldLeft(agg.zero)(agg.reduce)
    val ab = agg.finish(agg.merge(partial(l), partial(r)))
    val ba = agg.finish(agg.merge(partial(r), partial(l)))
    assert(ab == ba)
    assert(ab == 90.0)
  }

  test("empty input yields NaN; p bounds validated") {
    assert(new WeightedPercentile(0.5).finish(agg0.zero).isNaN)
    intercept[IllegalArgumentException](new WeightedPercentile(1.5))
  }
  private def agg0 = new WeightedPercentile(0.5)

  test("buffer stays bounded on high-cardinality input, answer stays close") {
    val cap = 256
    val agg = new WeightedPercentile(0.5, maxBuckets = cap)
    // 100k distinct values: the exact map would hold all of them; the
    // bounded buffer must never exceed the 2*cap compression threshold
    val n = 100000
    var buf = agg.zero
    (1 to n).foreach { i =>
      buf = agg.reduce(buf, (i.toDouble, 1.0))
      assert(buf.size <= 2 * cap + 1, s"buffer grew to ${buf.size}")
    }
    val got = agg.finish(buf)
    // the equi-depth rebuild bounds any percentile's rank error by about
    // half a bucket weight = total/(2*cap), stable across compression
    // cycles: ~0.2% of rank at this adversarial cap=256, exact at the
    // 8192 default until 16384 distinct values
    assert(math.abs(got - n / 2.0) / (n / 2.0) < 0.01, s"median drifted: $got")
    // merging two compressed partials stays bounded too
    var other = agg.zero
    (n + 1 to 2 * n).foreach { i => other = agg.reduce(other, (i.toDouble, 1.0)) }
    val merged = agg.merge(buf, other)
    assert(merged.size <= 2 * cap + 1)
    val m2 = agg.finish(merged)
    assert(math.abs(m2 - n) / n < 0.01, s"merged median drifted: $m2")
  }

  test("exact below the compression threshold") {
    val agg = new WeightedPercentile(0.5, maxBuckets = 256)
    val buf = (1 to 512).map(i => (i.toDouble, 1.0)).foldLeft(agg.zero)(agg.reduce)
    assert(buf.size == 512) // never compressed: 512 <= 2 * 256
    assert(agg.finish(buf) == 256.0)
  }

  test("distributed aggregation matches local computation") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val median = udaf(new WeightedPercentile(0.5))
    val data = (1 to 1000).map(i => ((i % 7).toString, i.toDouble, 1.0))
    val df = data.toDF("k", "v", "w").repartition(8)
    val got = df.groupBy("k").agg(median(col("v"), col("w")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    data.groupBy(_._1).foreach { case (k, rows) =>
      val vals = rows.map(_._2).sorted
      val target = 0.5 * vals.size
      val want = vals(math.ceil(target).toInt - 1)
      assert(got(k) == want, s"group $k")
    }
  }
}
