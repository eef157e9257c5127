package org.apache.spark.sql.execution.streaming.runtime

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.streaming.StreamingQuery

/** Executed-plan extraction for streaming queries.
  *
  * Batch specs plan-walk `df.queryExecution.executedPlan`; a streaming
  * query's per-micro-batch plans live on its `StreamExecution
  * .lastExecution` (an `IncrementalExecution`), reachable only through
  * `StreamingQueryWrapper` — which is `private[sql]`, hence this one-file
  * residence in Spark's package namespace (the same arrangement as
  * [[org.apache.spark.sql.execution.GraftCheckpoint]]). Everything touched
  * is public Spark source behavior (StreamingQueryWrapper.scala /
  * StreamExecution.scala).
  *
  * The extracted plan is the LAST micro-batch's executed plan — exactly
  * the repeated-per-batch shape a stream-static join regime test needs to
  * pin (every batch re-plans the same dataflow; only source offsets
  * differ).
  */
object GraftStreamPlan {

  /** The final micro-batch's executed plan, if one ran. Valid after
    * `awaitTermination` (an AvailableNow stream keeps its last
    * IncrementalExecution after finishing). */
  def lastExecutedPlan(q: StreamingQuery): Option[SparkPlan] = q match {
    case w: StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution).map(_.executedPlan)
    case s: StreamExecution =>
      Option(s.lastExecution).map(_.executedPlan)
    case _ => None
  }
}
