package org.apache.spark.sql.execution

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.command.DataWritingCommandExec
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
import org.apache.spark.sql.util.QueryExecutionListener

/** Parquet write that returns the plan that ACTUALLY executed.
  *
  * `df.write.parquet(path)` runs its own QueryExecution internally; the
  * caller-visible `df.queryExecution` never executes, so under AQE its
  * `executedPlan` is the UN-finalized adaptive plan — recording it (the
  * pre-r13 foreachBatch pattern) renders a shape that can differ from
  * what ran. This helper registers a QueryExecutionListener for the
  * duration of the write, matches the write command by output path (so a
  * concurrent query in the same session can't be mis-captured), and
  * drains the listener bus before returning — the captured
  * `executedPlan` is then the completed execution, `isFinalPlan=true`
  * under AQE. Lives in Spark's package namespace for
  * `listenerBus.waitUntilEmpty` (same arrangement as [[GraftCheckpoint]]).
  */
object GraftWrite {

  /** Overwrite `df` as parquet at `path`; returns the executed write
    * plan (a DataWritingCommandExec whose child is the finalized query
    * plan), or the caller's un-run plan if the listener saw nothing —
    * never null, never throws past the write itself. */
  def parquetCaptured(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): SparkPlan = {
    val spark = df.sparkSession
    val captured = new AtomicReference[SparkPlan]()
    val target = new org.apache.hadoop.fs.Path(path).getName
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        val mine = qe.executedPlan.collectFirst {
          case w: DataWritingCommandExec
              if w.cmd.isInstanceOf[InsertIntoHadoopFsRelationCommand] &&
                w.cmd.asInstanceOf[InsertIntoHadoopFsRelationCommand]
                  .outputPath.getName == target => w
        }
        mine.foreach(_ => captured.compareAndSet(null, qe.executedPlan))
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      df.write.mode("overwrite").partitionBy(partitionBy: _*).parquet(path)
      spark.sparkContext.listenerBus.waitUntilEmpty()
    } finally spark.listenerManager.unregister(listener)
    Option(captured.get).getOrElse(df.queryExecution.executedPlan)
  }
}
