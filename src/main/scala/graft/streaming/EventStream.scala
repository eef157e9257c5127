package graft.streaming

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface (SURVEY §2B Q33): replay the events table
  * as a file-source stream, watermarked tumbling-window aggregation, append
  * mode. Verified against batch Spark (Q27 restricted to closed windows),
  * not DuckDB — DuckDB has no streaming.
  *
  * Scale notes: the aggregation state lives in the StateStore keyed by
  * (window, event_type); the 2h watermark bounds state to ~2 windows per
  * key regardless of input volume, which is what makes this run forever on
  * an unbounded stream. File replay here stands in for any source
  * (Kafka etc.) — the plan below the source is identical.
  */
object EventStream {

  /** Copies events.parquet into `replayDir` as N files so the file source
    * replays them as N micro-batches (driver-side setup, not timed work). */
  def stageReplay(spark: SparkSession, sfDir: String, replayDir: String,
      nFiles: Int = 4): Unit = {
    Q.events(spark, sfDir)
      .repartitionByRange(nFiles, col("ts"))
      .write.mode("overwrite").parquet(replayDir)
    // the file source replays in (mtime, path) order; parallel part-file
    // writes land with arbitrary mtimes, so pin them to the range order for
    // a deterministic replay (part-00000 = earliest ts range, first batch).
    // Hadoop FS, not java.io.File — replayDir may be a URI / remote scheme.
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(replayDir)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir)
      .filter { st =>
        st.isFile && st.getPath.getName.startsWith("part-") &&
          st.getPath.getName.endsWith(".parquet")
      }
      .sortBy(_.getPath.getName)
      .zipWithIndex.foreach { case (st, i) =>
        fs.setTimes(st.getPath, 1700000000000L + i * 60000L, -1)
      }
  }

  /** The streaming query: 1-hour tumbling counts + value sums per
    * event_type with a 2-hour watermark. */
  def hourlyCounts(spark: SparkSession, replayDir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampNTZType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1) // one replay file per micro-batch
      .parquet(replayDir)
      // watermarks require TIMESTAMP (tz-aware); session tz is pinned UTC so
      // the cast is value-preserving
      .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_value"))
  }

  /** Runs the stream to completion against the staged replay and returns
    * the append-mode output (i.e. only windows CLOSED by the watermark). */
  def runToCompletion(spark: SparkSession, replayDir: String,
      sinkTable: String = "stream_hourly"): DataFrame = {
    val q = hourlyCounts(spark, replayDir)
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkTable)
  }

  /** Checkpointed variant with a parquet file sink: state and watermark
    * survive across calls — successive calls process only newly arrived
    * files, exactly like a restarted production stream. Returns everything
    * emitted so far (cumulative across runs). */
  def runCheckpointed(spark: SparkSession, replayDir: String,
      outDir: String, checkpointDir: String): DataFrame = {
    val q = hourlyCounts(spark, replayDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }

  /** Streaming ingest-dedup: exact-hash dedup at stream time with bounded
    * state — dropDuplicatesWithinWatermark keys state by the content hash
    * and expires it once the watermark passes, which is what makes
    * continuous training-data ingestion dedup-able without unbounded
    * memory. Returns the deduplicated stream run to completion. */
  def dedupedEvents(spark: SparkSession, replayDir: String,
      sinkTable: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampNTZType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(replayDir)
      .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      // to_json(struct(...)) keeps nulls distinguishable — concat_ws skips
      // NULLs, which lets adjacent fields shift together and collide
      .withColumn("content_hash",
        md5(to_json(struct(col("user_id"), col("event_type"), col("value"), col("props")))))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("content_hash")
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkTable)
  }

  /** Batch twin of [[hourlyCounts]] for equivalence assertions. */
  def batchHourlyCounts(spark: SparkSession, sfDir: String): DataFrame =
    Q.events(spark, sfDir)
      .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
}
