package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Shared executed-plan traversal for specs (AQE wraps executed subtrees
  * in leaf QueryStageExec nodes; traverse into them or the interesting
  * operators are invisible). */
object PlanWalk {

  def executedPlanOf(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Seq.empty
    }
    (p +: (p.children ++ nested).flatMap(collectAll)) ++ p.subqueries.flatMap(collectAll)
  }
}
