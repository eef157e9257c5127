package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{ResolvedHint, SubqueryAlias}

/** Shared spec utilities (companions to PlanWalk/TestSpark): session-conf
  * scoping with restore, and the analyzed-plan walk that maps broadcast
  * hints back to their BroadcastBounds registry names. One implementation
  * so a change to the bound-tagging scheme cannot silently pass one spec
  * and fail another. */
object SpecHelpers {

  /** Set the given session confs for the duration of `body`, restoring the
    * previous values (or unsetting) afterwards — exception-safe. */
  def withConf(spark: SparkSession, pairs: (String, String)*)(
      body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Registered-bound names hinted anywhere in df's ANALYZED plan;
    * `"<unregistered>"` marks a hint whose child is not a
    * `graft_bcast_<name>` alias. */
  def hintedBounds(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collectWithSubqueries {
      case h: ResolvedHint =>
        h.child match {
          case sa: SubqueryAlias if sa.alias.startsWith(BroadcastBounds.Tag) =>
            sa.alias.stripPrefix(BroadcastBounds.Tag)
          case _ => "<unregistered>"
        }
    }.toSet
}
