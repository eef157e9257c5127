package graft.streaming

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.streaming.StreamingQuery

/** Per-rig capture of the streaming queries' per-micro-batch physical
  * plans — the plan a streaming operator actually repeats every trigger,
  * which exists only inside a live `IncrementalExecution` and is otherwise
  * invisible to PLANS.md / plan specs (the rigs run to completion and
  * return only their sink tables). Each run-to-completion helper records
  * its final micro-batch plan here under its query name; `DumpPlans`
  * renders them and plan specs can walk them. Overwritten per run — the
  * registry holds the LATEST plan per name, which is what both consumers
  * want. */
object StreamPlans {

  private val plans =
    new java.util.concurrent.ConcurrentHashMap[String, SparkPlan]()

  /** Record `q`'s last micro-batch executed plan. A run that executed NO
    * batch CLEARS the entry instead of leaving a previous run's plan
    * behind — a consumer must fail with "no plan captured", not assert
    * against a stale, misattributed plan (the contract the removed
    * per-query AtomicReference had by construction). */
  def record(name: String, q: StreamingQuery): Unit =
    org.apache.spark.sql.execution.streaming.runtime.GraftStreamPlan
      .lastExecutedPlan(q) match {
      case Some(p) => plans.put(name, p)
      case None => plans.remove(name)
    }

  /** Record an explicitly built plan (the foreachBatch case, where the
    * interesting per-batch job is a batch frame the sink runs itself). */
  def recordPlan(name: String, p: SparkPlan): Unit = plans.put(name, p)

  def get(name: String): Option[SparkPlan] = Option(plans.get(name))
}
