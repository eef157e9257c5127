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
    val a = l.foldLeft(agg.zero)(agg.reduce)
    val b = r.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(a, b)) == agg.finish(agg.merge(b, a)))
    assert(agg.finish(agg.merge(a, b)) == 90.0)
  }

  test("empty input yields NaN; p bounds validated") {
    assert(new WeightedPercentile(0.5).finish(Map.empty).isNaN)
    intercept[IllegalArgumentException](new WeightedPercentile(1.5))
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
