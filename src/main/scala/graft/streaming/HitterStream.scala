package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.{HeavyHitterCounts, HeavyHitterSketch}

/** Q111: STREAMING heavy hitters — the approximate-aggregation member of
  * the streaming family (q33 windows, q50 sessions, q53 near-dup, q81
  * enrich, q86 upsert, q98 join, q104 ingest-dedup, and now a mergeable
  * sketch).
  *
  * Topology: each micro-batch folds its token stream into a Misra-Gries
  * sketch (q99's typed Aggregator — one bounded buffer per partition,
  * ONE <= capacity map per batch to the driver), and foreachBatch merges
  * it into a VERSIONED persistent sketch with the PODS-2012
  * mergeable-summaries rule — the same rule the batch aggregate uses
  * internally, so the batch-by-batch fold is just another merge tree and
  * the MG guarantee transfers verbatim: every token with true count >
  * n/(capacity+1) over the WHOLE stream survives the final sketch,
  * whatever the micro-batch slicing. The exact rescue pass then counts
  * only the candidates and applies q99's threshold, so the streamed
  * output is EXACTLY q99's — the DuckDB oracle for a streaming query.
  *
  * State shape (the q86/q104 outside-the-state-store pattern): one
  * parquet version per batch — `sketch` (token, cnt: <= capacity rows,
  * ~100 KB) + `meta` (running token total). Versions derive from the
  * checkpoint-stable batchId and writes are OVERWRITE of deterministic
  * paths, so a replayed trigger is idempotent and a crashed run resumes
  * (q104's exactly-once recipe). At 100 TB/day the per-batch driver
  * exchange is one bounded map — the vocabulary never shuffles.
  */
object HitterStream {

  private def cap: Int = HeavyHitterSketch.DefaultCapacity

  /** Run the stream over the staged replay to completion, then
    * exact-rescue the final sketch's candidates against `sfDir`'s
    * documents (the corpus the replay carries). Returns q99's exact
    * output contract: (token, cnt) for cnt >= max(n/1000, 5). */
  def heavyHitters(spark: SparkSession, replayDir: String,
      stateDir: String, sfDir: String): DataFrame = {
    import spark.implicits._
    val schema = ReplayStage.DocSchema
    val counts = new HeavyHitterCounts(cap)
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(replayDir)
      .writeStream
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // ONE pass per batch slice: the sketch (as a udaf, so it can ride
        // an untyped agg) and the exact token total share the scan.
        // coalesce to array(): a NULL text would otherwise contribute
        // size(NULL) = -1 to n_total (legacy sizeOfNull) and NPE the MG
        // udaf's reduce — the batch twin q99 and the oracle both treat a
        // null doc as zero tokens
        val toks = batch.select(
          coalesce(split(col("text"), " "), array()).as("toks"))
        val sketchUdaf = udaf(counts)
        val aggDf = toks.agg(sketchUdaf(col("toks")).as("sketch"),
          coalesce(sum(size(col("toks"))), lit(0L)).as("n"))
        // collect() (not head()) executes aggDf's OWN QueryExecution, so
        // the recorded executedPlan below is the completed, AQE-finalized
        // plan — head() would run a separate limit-wrapped execution and
        // leave aggDf.queryExecution un-run
        val row = aggDf.collect().head
        val batchSketch: Map[String, Long] =
          row.getAs[Map[String, Long]]("sketch")
        val batchN = row.getLong(1)
        StreamPlans.recordPlan("q111_streaming_sketch",
          aggDf.queryExecution.executedPlan)
        val (prev, prevN) =
          if (batchId == 0L) (Map.empty[String, Long], 0L)
          else {
            val v = s"$stateDir/v$batchId"
            (spark.read.parquet(s"$v/sketch").collect()
              .map(r => r.getString(0) -> r.getLong(1)).toMap,
              spark.read.parquet(s"$v/meta").head().getLong(0))
          }
        val merged = HeavyHitterSketch.mergeCounts(prev, batchSketch, cap)
        val nv = s"$stateDir/v${batchId + 1}"
        merged.toSeq.toDF("token", "cnt")
          .coalesce(1).write.mode("overwrite").parquet(s"$nv/sketch")
        Seq(prevN + batchN).toDF("n_total")
          .coalesce(1).write.mode("overwrite").parquet(s"$nv/meta")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // final version = highest v<k> the stream wrote; an empty replay
    // (zero batches executed) has no versions and no hitters
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(stateDir))
      .map(_.getPath.getName).filter(_.matches("v\\d+"))
      .map(_.drop(1).toInt)
    if (versions.isEmpty)
      return Seq.empty[(String, Long)].toDF("token", "cnt")
    val last = versions.max
    val candidates = spark.read.parquet(s"$stateDir/v$last/sketch")
      .select("token")
    val nTotal = spark.read.parquet(s"$stateDir/v$last/meta")
      .head().getLong(0)
    val thr = math.max(nTotal / 1000L, 5L)
    require(thr > nTotal / (cap + 1L),
      s"q111 threshold $thr does not clear the MG guarantee " +
        s"${nTotal / (cap + 1L)} — raise the threshold or the capacity")
    graft.Q.t(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .join(graft.BroadcastBounds.bounded("mg-candidates")(candidates),
        Seq("token"), "left_semi")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thr)
      .orderBy(col("cnt").desc, col("token"))
  }
}
