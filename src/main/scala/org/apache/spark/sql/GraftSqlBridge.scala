package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge for graft's SQL entry points (the same
  * pattern as [[org.apache.spark.sql.execution.GraftWrite]]): the public
  * Column API wraps expressions in ColumnNodes since Spark 4, and the
  * converters live behind `private[sql]` — re-exported here instead of
  * copied.
  */
object GraftSqlBridge {

  /** A [[Column]] over a raw Catalyst expression (the Spark-4 spelling
    * of the old `new Column(expr)`). */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The inverse: the raw Catalyst expression under a [[Column]] (the
    * Spark-4 spelling of the old `col.expr`). */
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A DataFrame over a logical plan — analysis (and for commands,
    * execution) happens at construction, exactly like `spark.sql`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The ANALYZED logical plan of a DataFrame — what a resolution rule
    * substitutes for an unresolved relation it owns. */
  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** `df`'s plan re-issued as a STREAMING DataFrame (r19): the V1
    * streaming Source contract requires `getBatch` to return a frame
    * with `isStreaming = true`, but a change-computation plan over
    * batch parquet leaves is not one. Delta's source solves this by
    * building its batch frame through `internalCreateDataFrame(rdd,
    * schema, isStreaming = true)` — the same `private[sql]` door
    * re-exported here. The RDD is `queryExecution.toRdd`, which is
    * LAZY: the whole distributed plan (joins, excepts, pruned scans)
    * executes only when the micro-batch's sink consumes it — nothing
    * is collected or materialized at wrap time. */
  def streamingFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** The V1 Sink twin of [[streamingFrame]]: a sink's `addBatch`
    * receives the micro-batch with a STREAMING plan, on which batch
    * actions (joins, windows, writes) are illegal — re-issue it as a
    * batch frame over the same lazy RDD, exactly what Spark's own
    * ForeachBatchSink does before handing the user their frame. */
  def batchFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }

  /** The session's registered catalog plugin `name`, when one exists —
    * `sessionState.catalogManager` is private[sql], re-exported here so
    * graft's lakehouse-verb statements can resolve `<catalog>.<ns>.<t>`
    * names through a [[org.apache.spark.sql.connector.catalog
    * .TableCatalog]]. */
  def catalogPlugin(spark: SparkSession, name: String)
      : Option[org.apache.spark.sql.connector.catalog.CatalogPlugin] =
    try {
      val cm = spark.asInstanceOf[classic.SparkSession]
        .sessionState.catalogManager
      if (cm.isCatalogRegistered(name)) Some(cm.catalog(name)) else None
    } catch { case scala.util.control.NonFatal(_) => None }
}
