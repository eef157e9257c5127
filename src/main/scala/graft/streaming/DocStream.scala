package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming NEAR-dup ingest (r5) — the LSH twin of the exact-hash
  * `dropDuplicatesWithinWatermark` ingest in [[EventStream.dedupedEvents]]:
  * documents arrive as a stream, each computes its 12-hash MinHash
  * signature (the `minhash_sig` codegen expression — stateless projection,
  * so the batch hot-loop work is identical at stream time) and its 3 LSH
  * band buckets; custom `flatMapGroupsWithState` state keyed by BUCKET
  * VALUE assigns every (doc, band) the bucket's ANCHOR — the first document
  * that ever hit the bucket. A doc whose anchors are all itself is novel;
  * any earlier anchor marks it a near-dup candidate against that anchor
  * (same recall contract as batch q35's candidate pairs).
  *
  * Scale contract: state is one (anchor, last-seen) record per DISTINCT
  * bucket seen within the dedup horizon; an event-time timeout expires
  * buckets unseen for `horizonMinutes`, so state is bounded by bucket
  * arrival rate x horizon no matter how long the stream runs — the
  * standard trade of stream-time dedup (dedup against the recent past,
  * not all history). One transient bound to size for: the handler buffers
  * each bucket's rows WITHIN a micro-batch (for the deterministic in-batch
  * anchor choice), so a hot bucket's per-batch footprint is its arrival
  * count per trigger — throttle with maxFilesPerTrigger/maxBytesPerTrigger
  * where a duplicate storm can land in one batch (the 10x hot-cluster run
  * in BENCH_NOTES_r5.md exercises exactly this). Verified against the
  * batch bucket-anchor twin in DocStreamSpec, including the expiry path.
  */
object DocStream {

  /** Per-bucket state: the anchor doc + the latest event-time seen
    * (microsecond epoch), which drives the expiry timeout. */
  final case class BucketState(anchor: Long, lastUs: Long)

  /** One emitted assignment: this doc's band bucket resolved to `anchor_doc`
    * (== doc_id when the doc opened the bucket). */
  final case class BandAssign(doc_id: Long, band: Int, anchor_doc: Long)

  /** Stages documents as an id-ordered replay: N parquet files partitioned
    * by doc_id range with pinned mtimes (the file source replays in
    * (mtime, path) order), plus a synthetic ingest timestamp of
    * `spacingSeconds` per doc id — deterministic arrival order == id order,
    * so the streamed anchors are reproducible and equal to the batch twin's
    * MIN(doc_id). */
  def stageDocReplay(spark: SparkSession, sfDir: String, replayDir: String,
      nFiles: Int = 4, spacingSeconds: Long = 1L): Unit = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        expr(s"timestamp_micros(1700000000000000 + doc_id * ${spacingSeconds}000000)")
          .as("ts"))
      .repartitionByRange(nFiles, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(replayDir)
    ReplayStage.pinReplayOrder(spark, replayDir)
  }

  /** Dedup horizon sized to the staged corpus: the synthetic replay spans
    * `nDocs * spacingSeconds`, so a fixed horizon silently starts expiring
    * buckets mid-replay once the corpus outgrows it (and the q53
    * matches_batch flags would quietly go false — nothing crashes).
    * Production streams pick the horizon from the dedup SLA; the replay rig
    * must pick it from the data it stages. */
  def horizonMinutesFor(nDocs: Long, spacingSeconds: Long = 1L): Int =
    math.max(120L, nDocs * spacingSeconds / 60L + 10L).toInt

  /** [[bandAnchors]] plus the per-micro-batch state-store row counts — the
    * observable side of the bounded-state contract (one state row per
    * distinct live bucket; expired buckets leave the store). */
  final case class StreamRun(result: DataFrame, stateRowsPerBatch: Seq[Long])

  /** The streaming query run to completion: every arriving doc's 3 band
    * buckets resolve to their anchors through bounded per-bucket state. */
  def bandAnchors(spark: SparkSession, replayDir: String, sinkTable: String,
      horizonMinutes: Int = 120): DataFrame =
    bandAnchorsRun(spark, replayDir, sinkTable, horizonMinutes).result

  /** [[bandAnchors]] returning the per-batch state-store row counts too. */
  def bandAnchorsRun(spark: SparkSession, replayDir: String, sinkTable: String,
      horizonMinutes: Int = 120): StreamRun = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    graft.functions.GraftFunctions.register(spark)
    val horizonUs = horizonMinutes * 60000000L
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampNTZType)))
    val banded = graft.queries.LlmOps.minhashBands(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replayDir)
        .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        .withWatermark("ts", s"$horizonMinutes minutes")
        // THE q35 signature + banding helpers on the stream (stateless
        // projections — streaming changes nothing about the hot loop);
        // sharing them is what keeps q35 and q53 on one formula
        .withColumn("toks", split(col("text"), " "))
        .withColumn("sigl", graft.queries.LlmOps.minhashSigCol))
    val q = banded
      .select(col("doc_id"), col("ts"), col("b"), col("bv"))
      .as[(Long, java.time.Instant, Int, String)]
      // keyed by (band, bucket value) — the batch twin's bucket identity;
      // bv alone would merge equal band-values ACROSS bands
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[BucketState, BandAssign](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, String), rows: Iterator[(Long, java.time.Instant, Int, String)],
         state: org.apache.spark.sql.streaming.GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // bucket unseen for the whole horizon: forget its anchor (the
            // next hit re-opens it) — THE state bound
            state.remove()
            Iterator.empty
          } else {
            // within a micro-batch the group iterator is unordered; sort by
            // doc id so the in-batch anchor choice is deterministic (and,
            // with id-ordered replay, equal to the batch twin's MIN)
            val sorted = rows.toArray.sortBy(_._1)
            var st = state.getOption
            // the framework only fires timeouts for groups with NO data in
            // the batch; a bucket that went stale and THEN received data is
            // delivered here with its old state — enforce the horizon
            // ourselves so expiry semantics don't depend on arrival timing
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            if (st.exists(_.lastUs + horizonUs < wmUs)) st = None
            val out = sorted.map { case (doc, ts, b, _) =>
              val us = ts.getEpochSecond * 1000000L + ts.getNano / 1000L
              val anchor = st.map(_.anchor).getOrElse(doc)
              st = Some(BucketState(anchor,
                math.max(st.map(_.lastUs).getOrElse(0L), us)))
              BandAssign(doc, b, anchor)
            }
            state.update(st.get)
            // expire once event time passes last-seen + horizon (timeout
            // API is millis; round up so expiry is never early)
            state.setTimeoutTimestamp((st.get.lastUs + horizonUs) / 1000L + 1L)
            out.iterator
          }
      }
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    StreamPlans.record("q53_streaming_neardup", q)
    // recentProgress (default retention 100 updates) covers the replay's
    // micro-batch count; numRowsTotal is the state store's live row count
    // AFTER the batch's removals — the number the bounded-state claim is
    // about
    val stateRows = q.recentProgress.toSeq
      .flatMap(p => p.stateOperators.headOption.map(_.numRowsTotal))
    StreamRun(spark.table(sinkTable), stateRows)
  }

  /** Batch twin of [[bandAnchors]] with an infinite horizon: every band
    * bucket's anchor is the corpus-wide MIN(doc_id). Uses the same shared
    * signature/banding helpers as q35 and the stream. */
  def batchBandAnchors(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val bands = graft.queries.LlmOps.minhashBands(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("sigl", graft.queries.LlmOps.minhashSigCol)
        .select(col("doc_id"), col("sigl")))
    val anchors = bands.groupBy("b", "bv")
      .agg(min(col("doc_id")).as("anchor_doc"))
    bands.join(anchors, Seq("b", "bv"))
      .select(col("doc_id"), col("b").as("band"), col("anchor_doc"))
  }
}
