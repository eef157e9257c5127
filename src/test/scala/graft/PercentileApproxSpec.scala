package graft

import org.scalatest.funsuite.AnyFunSuite

/** Q44b: the approx-percentile scale twin must track the exact pass. With
  * accuracy 10000 the GK sketch guarantees rank error <= n/10000, which on
  * these distributions lands the value well within 1% relative error — the
  * crossover contract documented on the query (exact for bounded groups,
  * sketch beyond).
  */
class PercentileApproxSpec extends AnyFunSuite {

  test("q44b: approx percentiles within 1% of exact") {
    val rows = SparkEntry.queries("q44b_percentiles_approx")(
      TestSpark.spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      assert(r.getAs[Double]("p50_rel_err") <= 0.01,
        s"$flag p50 rel err ${r.getAs[Double]("p50_rel_err")}")
      assert(r.getAs[Double]("p95_rel_err") <= 0.01,
        s"$flag p95 rel err ${r.getAs[Double]("p95_rel_err")}")
    }
  }
}
