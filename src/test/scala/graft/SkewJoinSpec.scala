package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling — the runtime answer to skewed keys at 100TB
  * (SURVEY §4): a pathologically skewed join key is split into subpartitions
  * by OptimizeSkewedJoin instead of stalling one task. */
class SkewJoinSpec extends AnyFunSuite {

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Seq.empty
    }
    (p +: (p.children ++ nested).flatMap(collectAll)) ++ p.subqueries.flatMap(collectAll)
  }

  test("OptimizeSkewedJoin splits a hot key into subpartitions") {
    val spark = TestSpark.spark
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows on ONE key vs 2k spread over 100 keys; payload pads bytes
      val skewed = spark.range(0, 202000).select(
        org.apache.spark.sql.functions.when($"id" < 200000, 0L)
          .otherwise($"id" % 100 + 1).as("k"),
        org.apache.spark.sql.functions.lpad($"id".cast("string"), 64, "x").as("pad"))
      val dim = spark.range(0, 101).select($"id".as("k"),
        ($"id" * 2).as("v"))
      val joined = skewed.join(dim, "k")
      // execute THIS frame (count() would spawn a separate QueryExecution
      // and the inspected AQE plan would never have run)
      val n = joined.collect().length
      assert(n == 202000)
      val plans = collectAll(joined.queryExecution.executedPlan)
      val smj = plans.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "expected a sort-merge join")
      assert(smj.exists(_.isSkewJoin),
        s"skew join not triggered:\n${joined.queryExecution.executedPlan}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
