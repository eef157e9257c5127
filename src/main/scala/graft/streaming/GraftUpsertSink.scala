package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** STREAMING UPSERT SINK over a graft store (r19) — the write half the
  * `graft-cdc` source (q144) is the read half of:
  *
  *   df.writeStream.format("graft-upsert")
  *     .option("name", "<registered store table>")
  *     .option("checkpointLocation", ...)
  *
  * Every rig until now wrote the store from `foreachBatch` (the
  * Delta-documented pattern); this sink packages that commit discipline
  * as a declarative format, which makes STORE-TO-STORE CDC REPLICATION
  * a single statement with no user code:
  * `readStream.format("graft-cdc") → writeStream.format("graft-upsert")`
  * (q146's topology — no feed artifact anywhere on either side).
  *
  * SEMANTICS — two input shapes, detected by column:
  *   - change rows (`_change_type` + `_commit_version` present — what
  *     the graft-cdc source emits): APPLY them. A batch may span
  *     several source versions, so each key's chain nets to its LAST
  *     state (max `_commit_version`; a same-version update pair nets
  *     to the postimage — preimages never win). A final `delete`
  *     removes the key; anything else upserts its image.
  *   - plain rows: REPLACE-on-key upsert. A duplicate key within one
  *     batch is a named error (no deterministic winner exists), the
  *     same guard INSERT's PK path rides.
  *
  * EXACTLY-ONCE: batch k commits store version k+1 reading manifest k —
  * the [[IngestIndex]] replay contract verbatim, so a re-delivered
  * batch rewrites byte-identical state (the netting is deterministic)
  * and `writeManifest`'s conflict barrier adjudicates it as a replay.
  * Version numbers therefore MIRROR the micro-batch sequence; the
  * target must have no other writer (the store's single-writer law —
  * a foreign commit shifts the version chain and fails loudly).
  *
  * COST GEOMETRY is the store's: per trigger O(batch + touched
  * buckets), one manifest write; deletes are copy-on-write non-re-adds
  * riding the same rewrite (no table-sized tombstone lists); a live
  * deletion vector on the target composes ([[IngestIndex
  * .mergeCommitDv]] — tombstoned rows neither resurrect nor block
  * re-inserted keys).
  */
class GraftUpsertSink(
    sqlContext: SQLContext,
    name: String,
    stateDir: String,
    table: String) extends Sink {

  override def addBatch(batchId: Long, data0: DataFrame): Unit = {
    val spark = sqlContext.sparkSession
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keys = IngestIndex.keyColsFor(table)
    // a real streaming trigger hands the micro-batch with a STREAMING
    // plan, on which batch ops are illegal — re-issue it as a batch
    // frame (ForeachBatchSink's own move); direct batch callers (the
    // spec's unit laws) pass through
    val data =
      if (data0.isStreaming) org.apache.spark.sql.GraftSqlBridge
        .batchFrame(data0)
      else data0
    val hasChangeCols = data.columns.contains("_change_type")
    val payload = data.columns.toSeq
      .filterNot(c => c == "_change_type" || c == "_commit_version")
    require(keys.forall(k =>
      payload.exists(_.equalsIgnoreCase(k))),
      s"graft-upsert '$name': the stream must carry the table's key " +
        s"column(s) ${keys.mkString(", ")}; got ${payload.mkString(", ")}")
    val keyStr = concat_ws(",", keys.map(k => col(k).cast("string")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    // the effective per-key change of this batch: payload + __delete
    val effective: DataFrame =
      if (hasChangeCols) {
        // chain netting: last version wins; within it the postimage
        // outranks its preimage (insert/update_postimage/delete never
        // share a netted version with each other for one key)
        val ranked = data.withColumn("__rn",
          row_number().over(w.orderBy(col("_commit_version").desc,
            when(col("_change_type") === "update_preimage", 1)
              .otherwise(0).asc)))
        ranked.filter(col("__rn") === 1)
          .select((payload.map(col) :+
            (col("_change_type") === "delete").as("__delete")).toSeq: _*)
      } else {
        // plain upsert: replace-on-key; in-batch duplicates have no
        // deterministic winner — the named guard rides the key window
        // (the FILTER forces its evaluation; a merely-dropped guard
        // column would be pruned before it could raise)
        data.select((payload.map(col) :+
          when(count(lit(1)).over(w) > 1,
            raise_error(concat(
              lit(s"graft-upsert '$name': duplicate key ("), keyStr,
              lit(") within one micro-batch — no deterministic " +
                "winner; net the stream upstream"))).isNotNull)
            .otherwise(lit(true)).as("__ok")).toSeq: _*)
          .filter(col("__ok")).drop("__ok")
          .withColumn("__delete", lit(false))
      }
    // ONE materialization of the netted batch: the commit's bucket
    // assignment, touched-set collect and combine each act on it, and
    // the upstream plan (a CDC source batch is a whole changesBetween
    // computation) must not re-run per consumer job
    val eff = org.apache.spark.sql.execution.GraftCheckpoint
      .localCheckpointFlatStats(effective)
    val m = IngestIndex.readManifest(fs, stateDir, batchId)
    val next = batchId + 1
    val combine: (DataFrame, DataFrame) => DataFrame = (cur, d) => {
      // cur is delta-SHAPED (carries __delete) only on the very first
      // trigger's empty frame — select the payload explicitly
      val have = cur.columns
        .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      val curP = cur.select(payload
        .filter(c => have(c.toLowerCase(java.util.Locale.ROOT)))
        .map(col): _*)
      curP.join(d.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(d.filter(!col("__delete")).drop("__delete"),
          allowMissingColumns = true)
    }
    val nm = IngestIndex.mergeCommitDv(spark, stateDir, m, table, next,
      eff, combine)
    IngestIndex.writeManifest(fs, stateDir, next, nm,
      op = if (hasChangeCols) "sink-apply" else "sink-upsert")
    ()
  }

  override def toString: String = s"GraftUpsertSink[$name @ $stateDir]"
}

/** `format("graft-upsert")` registration: resolves the target store by
  * its registered name, accepts Append/Update output modes. */
class GraftUpsertSinkProvider extends StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-upsert"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft-upsert: the store is hash-bucketed by its key — " +
        "partitionBy does not apply")
    require(outputMode != OutputMode.Complete(),
      "graft-upsert: Complete mode re-emits the whole result every " +
        "trigger — the sink applies DELTAS (Append/Update)")
    val name = parameters.getOrElse("name",
      throw new IllegalArgumentException(
        "graft-upsert: .option(\"name\", <registered store table>) " +
          "is required (GraftSql.registerTable first, or a " +
          "<catalog>.<ns>.<table> name)"))
    val t = graft.operators.GraftSql.resolveStore(name).getOrElse(
      throw new IllegalArgumentException(
        s"graft-upsert: '$name' is not a registered graft store " +
          "table — GraftSql.registerTable first, or address it " +
          "through a graft catalog (<catalog>.<ns>.<table>)"))
    new GraftUpsertSink(sqlContext, name, t.stateDir, t.table)
  }
}
