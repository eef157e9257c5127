package org.apache.spark.sql.execution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Iteration-safe localCheckpoint.
  *
  * Spark's `Dataset.localCheckpoint` truncates LINEAGE but carries the
  * origin plan's `Statistics` onto the resulting [[LogicalRDD]]
  * (`originStats`, kept so AQE/join planning sees realistic sizes after a
  * one-shot checkpoint). In an ITERATIVE algorithm that checkpoints per
  * round, that carry-over compounds: size-only estimation multiplies child
  * sizes at every join (`SizeInBytesOnlyStatsPlanVisitor.visitJoin`), so
  * round k's "size" is a product over round k-1's already-inflated leaves
  * — the digit count of the BigInt grows geometrically with round count,
  * and by ~round 10 of a multi-join loop the optimizer spends MINUTES in
  * BigInteger multiplication (observed: q51's delta-iteration hung the
  * driver in `ToomCook3` with million-digit "sizes").
  *
  * This helper re-wraps the checkpointed RDD in a fresh [[LogicalRDD]]
  * with `originStats = None`: each generation's stats reset to the flat
  * `defaultSizeInBytes` leaf estimate, the physical partitioning and
  * ordering survive (so co-partitioned iterative joins still skip their
  * exchanges), and the blocks are the SAME materialized RDD — no extra
  * pass over the data. It lives in `org.apache.spark.sql.execution`
  * because `Dataset.ofRows` is `private[sql]`; everything used is public
  * Spark source behavior (ExistingRDD.scala).
  */
object GraftCheckpoint {
  def localCheckpointFlatStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    val ckpt = df.localCheckpoint()
    val plan = ckpt.queryExecution.analyzed
    val clean = plan match {
      // LogicalRDD's second parameter list (session, originStats,
      // originConstraints) defaults the origin carry-overs to None — a
      // bare copy()(session) is exactly "same RDD, fresh stats"
      case lr: LogicalRDD => lr.copy()(spark, None, None)
      case other => other // non-LogicalRDD analyzed plan: nothing to strip
    }
    Dataset.ofRows(spark, clean)
  }
}
