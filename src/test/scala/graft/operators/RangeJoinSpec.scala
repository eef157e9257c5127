package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoin.binned: the bin rewrite must produce EXACTLY the naive
  * inequality join's pair set (no duplicates from multi-bin intervals, no
  * losses at bin borders), and its plan must contain no nested-loop join —
  * while the naive form demonstrably does (that contrast IS the operator's
  * reason to exist).
  */
class RangeJoinSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {

  private lazy val spark = graft.TestSpark.spark

  private def eventSides(dir: String) = {
    val e = graft.Q.events(spark, dir)
    val secs = expr("unix_seconds(CAST(ts AS TIMESTAMP))")
    val clicks = e.filter(col("event_type") === "click")
      .select(secs.as("cts")).withColumn("chi", col("cts") + 3600L)
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), secs.as("pts"))
    (purch, clicks)
  }

  test("binned pair set == naive inequality-join pair set (sf0.001)") {
    val (purch, clicks) = eventSides("/root/testdata/sf0.001")
    val binned = RangeJoin.binned(purch, clicks,
        col("pts"), col("cts"), col("chi"), 3600L)
      .select("p_event", "pts", "cts")
    val naive = purch.join(clicks,
        col("pts") > col("cts") && col("pts") <= col("chi"))
      .select("p_event", "pts", "cts")
    assert(binned.count() == naive.count())
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("plan contrast: naive plans a nested loop, binned does not") {
    val (purch, clicks) = eventSides("/root/testdata/sf0.001")
    val naive = purch.join(clicks,
      col("pts") > col("cts") && col("pts") <= col("chi"))
    naive.collect()
    val naivePlan = collectWithSubqueries(naive.queryExecution.executedPlan) {
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(naivePlan.nonEmpty, "expected the naive inequality join to BNLJ")

    val binned = RangeJoin.binned(purch, clicks,
      col("pts"), col("cts"), col("chi"), 3600L)
    binned.collect()
    val bnlj = collectWithSubqueries(binned.queryExecution.executedPlan) {
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bnlj.isEmpty, "bin rewrite still nested-loops")
  }

  test("boundary semantics (lo, hi]: lo excluded, hi included, across bins") {
    val sp = spark
    import sp.implicits._
    // interval (100, 200] with binWidth 60 spans bins 1..3
    val iv = Seq((100L, 200L)).toDF("lo", "hi")
    val pts = Seq(100L, 101L, 159L, 160L, 200L, 201L).toDF("pt")
    val got = RangeJoin.binned(pts, iv, col("pt"), col("lo"), col("hi"), 60L)
      .select("pt").as[Long].collect().sorted.toSeq
    assert(got == Seq(101L, 159L, 160L, 200L))
  }

  test("interval fan-out is bounded by span/binWidth + 1, and exact") {
    val sp = spark
    import sp.implicits._
    val iv = Seq((0L, 599L)).toDF("lo", "hi") // spans bins 0..9 at width 60
    val pts = Seq.empty[Long].toDF("pt")
    // no points -> join emits nothing, but the replicated interval side is
    // observable through the bin explode count
    val expanded = iv.withColumn("b",
      explode(sequence(floor(col("lo") / 60).cast("long"),
        floor(col("hi") / 60).cast("long"))))
    assert(expanded.count() == 10)
    assert(RangeJoin.binned(pts, iv, col("pt"), col("lo"), col("hi"), 60L)
      .count() == 0)
  }
}
