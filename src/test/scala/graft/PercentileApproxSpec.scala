package graft

import org.scalatest.funsuite.AnyFunSuite

/** Q44b/Q12c: the approximate operators must track their exact twins. With
  * accuracy 10000 the GK sketch guarantees rank error <= n/10000, which on
  * these distributions lands the value well within 1% relative error;
  * approx_count_distinct's default rsd is 5%. Since r11 the same bounds are
  * driver-enforced: the oracle-compared projections carry the exact value
  * plus a within-tolerance boolean the DuckDB oracle pins to TRUE, so this
  * spec asserts the booleans (and recomputes the percentile rel-err
  * numerically as the sharper local check).
  */
class PercentileApproxSpec extends AnyFunSuite {

  test("q44b: approx percentiles within 1% of exact") {
    val rows = SparkEntry.queries("q44b_percentiles_approx")(
      TestSpark.spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      assert(r.getAs[Boolean]("p50_within_tol"), s"$flag p50 out of tolerance")
      assert(r.getAs[Boolean]("p95_within_tol"), s"$flag p95 out of tolerance")
    }
  }

  test("q44b: the numeric rel err is itself well under the 1% bar") {
    val sp = TestSpark.spark
    import org.apache.spark.sql.functions._
    val li = sp.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val rows = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("ex"),
        expr("percentile_approx(l_quantity, 0.5, 10000)").as("ap"))
      .select(col("l_returnflag"),
        (abs(col("ap") - col("ex")) / col("ex")).as("rel"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("rel") <= 0.01,
      s"${r.getAs[String]("l_returnflag")} rel err ${r.getAs[Double]("rel")}"))
  }

  test("q12c: approx distinct within 5% of exact") {
    val rows = SparkEntry.queries("q12c_approx_distinct")(
      TestSpark.spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Boolean]("within_tol"), "approx distinct out of 5%")
  }
}
