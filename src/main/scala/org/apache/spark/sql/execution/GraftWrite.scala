package org.apache.spark.sql.execution

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.catalyst.plans.logical.CommandResult
import org.apache.spark.sql.execution.datasources.DataSource

/** Parquet write that returns the plan that ACTUALLY executed.
  *
  * `df.write.parquet(path)` runs its own QueryExecution internally; the
  * caller-visible `df.queryExecution` never executes, so under AQE its
  * `executedPlan` is the UN-finalized adaptive plan — recording it (the
  * pre-r13 foreachBatch pattern) renders a shape that can differ from
  * what ran. A QueryExecutionListener cannot help either: foreachBatch
  * sinks run their writes as NESTED executions (the micro-batch already
  * holds the execution id), which post no SQLExecutionEnd event. So this
  * helper does what DataFrameWriter.saveToV1Source does — build the V1
  * write command and execute it eagerly — but KEEPS the QueryExecution:
  * after `assertCommandExecuted()` the `CommandResult` node carries the
  * executed physical plan, whose AQE subtree is finalized
  * (`isFinalPlan=true`). Lives in Spark's package namespace for
  * `Dataset.logicalPlan` (same arrangement as [[GraftCheckpoint]]).
  */
object GraftWrite {

  /** Overwrite `df` as parquet at `path` (optionally partitioned);
    * returns the executed write plan — the DataWritingCommandExec whose
    * child is the finalized query plan. */
  def parquetCaptured(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): SparkPlan = {
    // every frame in this engine is the classic (local JVM) Dataset —
    // the cast reaches its private[sql] logicalPlan
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    val spark = cdf.sparkSession
    val cmd = DataSource(
      sparkSession = spark,
      className = "parquet",
      partitionColumns = partitionBy,
      options = Map("path" -> path))
      .planForWriting(SaveMode.Overwrite, cdf.logicalPlan)
    val qe = spark.sessionState.executePlan(cmd)
    qe.assertCommandExecuted()
    qe.commandExecuted match {
      case cr: CommandResult =>
        cr.commandPhysicalPlan.asInstanceOf[SparkPlan]
      case _ => qe.executedPlan
    }
  }
}
