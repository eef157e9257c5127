package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** CHANGE DATA FEED over the q86 keyed-upsert topology (q120/q121): each
  * micro-batch's MERGE into the bucketed persistent state table
  * ([[IngestIndex]]) also EMITS the Delta-Lake-style row-level change log
  * — `insert` for keys the merge first creates, `update_preimage` +
  * `update_postimage` pairs for keys it revises — written per batch to a
  * deterministic path. Downstream consumers (incremental materialized
  * views, replication, audit) read the feed instead of diffing snapshots.
  *
  * Why the feed is FREE at scale: the merge already full-outer-joins the
  * batch delta against exactly the touched buckets' current rows; the
  * change rows are a projection of that same join, materialized once
  * (flat-stats local checkpoint) and scanned twice — zero extra reads of
  * the state table, CDF write IO O(changed keys). This is the argument
  * Delta's CDF makes (the change files ride the same commit), re-expressed
  * on the bucketed-manifest layout.
  *
  * Replay/restart: the feed write is mode=overwrite at a batchId-derived
  * path and the merge follows the [[IngestIndex]] contract (batch k reads
  * manifest v(k), overwrites v(k+1)), so a replayed trigger rewrites
  * byte-identical state AND byte-identical change rows — the feed is
  * exactly-once under the same recipe as the table itself.
  *
  * TIME TRAVEL (q121): the run keeps `retain` manifest versions, so
  * [[IngestIndex.tableAt]] can read the state AS OF any retained version
  * — the Delta/Iceberg `VERSION AS OF` surface on the same layout.
  *
  * Unlike the other streaming rigs, this family is fully DuckDB-oracle-
  * able: the replay slices by `event_id % nBatches` (deterministic, SQL-
  * reconstructible membership — IngestStream.stageReplay's argument), so
  * the whole feed equals a batch cumulative-window computation over the
  * raw events table, and the driver's hash gate checks it end to end.
  */
object CdfStream {

  /** One state row per user: the q86 aggregate. The merged sum is cast
    * back to DECIMAL(18,4) after each addition so the stored schema stays
    * identical across versions (plus-widening would drift the parquet
    * decimal precision version by version); values are exact at scale 4
    * throughout, so batch-wise accumulation equals the one-shot sum. */
  private val dec = DecimalType(18, 4)

  private val EventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stage events as `nBatches` replay files; batch k holds the events
    * with event_id % nBatches == k — a deterministic membership the
    * DuckDB oracle reconstructs with `event_id % n` (sampled range
    * boundaries could not be mirrored in SQL). Replayed in k order via
    * pinned mtimes. */
  def stageModReplay(spark: SparkSession, sfDir: String, replayDir: String,
      nBatches: Int = 4): Unit = {
    val events = graft.Q.events(spark, sfDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(replayDir)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    (0 until nBatches).foreach { k =>
      ReplayStage.stageSlice(fs, replayDir, k,
        events.filter(pmod(col("event_id"), lit(nBatches)) === k))
    }
  }

  private def aggOf(df: DataFrame): DataFrame =
    df.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      max(col("ts")).as("last_ts"),
      sum(col("value").cast(dec)).as("sum_value"))

  /** Run the upsert stream to completion, committing state versions under
    * `stateDir` (retaining `retain` snapshots — plus, when `retainMillis`
    * > 0, every snapshot younger than that wall-clock window: the
    * production time-based VERSION-AS-OF retention) and the change feed
    * under `cdfDir/b<batchId>`. Returns the final committed version.
    *
    * DELETES (r15, q130): with `deleteMod = Some(m)`, batch k also
    * REMOVES every batch-active user with `user_id % m == k` AFTER its
    * upsert applies — the missing Delta-CDF op type. The rule is
    * deliberately batch-membership-gated (only users WITH activity in
    * batch k delete at k) so the whole chain stays SQL-reconstructible:
    * a user's final state is the aggregate of their events in batches
    * STRICTLY AFTER their delete batch (they re-INSERT on their next
    * activity — the re-crawl topology). Delete cost rides the merge's
    * existing join: the removed keys were already in the touched slice,
    * zero extra reads.
    *
    * PER-COMMIT NET CHANGE (r16, advisor fix): a batch's feed rows are
    * NETTED per key, Delta's CDF contract — one commit emits at most one
    * change per key. A key upserted and then deleted inside the same
    * micro-batch therefore emits a single `delete` row carrying the
    * PRE-COMMIT image (the stored row the commit removed) when it
    * existed before the batch, and NOTHING when the batch both created
    * and removed it (net change: none — an external last-op-per-commit
    * consumer replaying the feed sees exactly the table's commits). The
    * in-repo view consumer's signed algebra is invariant under the
    * netting (post − pre − post telescopes to the same −pre), so feeds
    * with and without netting maintain identical views — but only the
    * netted feed is safe for consumers that do not telescope. */
  def runUpsertCdf(spark: SparkSession, replayDir: String, stateDir: String,
      cdfDir: String, retain: Int = 8, retainMillis: Long = 0L,
      deleteMod: Option[Int] = None): Long = {
    var top = 0L
    val q = spark.readStream
      .schema(EventsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(replayDir)
      .withColumn("ts", col("ts").cast(TimestampType))
      .writeStream
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val delta = aggOf(batch)
        val fs = new org.apache.hadoop.fs.Path(stateDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val m = IngestIndex.readManifest(fs, stateDir, batchId)
        val next = batchId + 1
        val stateMap = IngestIndex.mergeCommit(spark, stateDir, m,
          "state", next, delta,
          (cur, d) => {
            // ONE materialization of (touched current rows ⋈ batch delta);
            // both the change feed and the merged state project from it —
            // the state table is never re-read for the feed
            val j = org.apache.spark.sql.execution.GraftCheckpoint
              .localCheckpointFlatStats(
                cur.select(col("user_id"), col("n_events").as("c_n"),
                    col("last_ts").as("c_ts"), col("sum_value").as("c_sum"))
                  .join(d, Seq("user_id"), "full_outer"))
            val changed = j.filter(col("n_events").isNotNull)
            // delete rule (q130): batch-active keys whose id lands on
            // this batch under the mod are removed from the commit
            val delPred = deleteMod.map(m =>
                pmod(col("user_id"), lit(m.toLong)) === lit(batchId))
              .getOrElse(lit(false))
            // netted per-commit change rows (r16): survivors emit
            // insert/update pairs as before; a key the SAME batch also
            // deletes nets to one `delete` row with the pre-commit image
            // (previously stored keys) or to nothing (keys the batch
            // both created and removed — net change: none)
            val post = changed.filter(!delPred).select(col("user_id"),
              when(col("c_n").isNull, lit("insert"))
                .otherwise(lit("update_postimage")).as("op"),
              (coalesce(col("c_n"), lit(0L)) + col("n_events"))
                .as("n_events"),
              greatest(col("c_ts"), col("last_ts")).as("last_ts"),
              (coalesce(col("c_sum"), lit(0).cast(dec)) + col("sum_value"))
                .cast(dec).as("sum_value"))
            val pre = changed.filter(col("c_n").isNotNull && !delPred)
              .select(col("user_id"), lit("update_preimage").as("op"),
                col("c_n").as("n_events"), col("c_ts").as("last_ts"),
                col("c_sum").cast(dec).as("sum_value"))
            val dels = changed.filter(col("c_n").isNotNull && delPred)
              .select(col("user_id"), lit("delete").as("op"),
                col("c_n").as("n_events"), col("c_ts").as("last_ts"),
                col("c_sum").cast(dec).as("sum_value"))
            StreamPlans.recordPlan("q120_cdf_emit",
              org.apache.spark.sql.execution.GraftWrite.parquetCaptured(
                post.unionByName(pre).unionByName(dels)
                  .withColumn("batch_id", lit(batchId)),
                s"$cdfDir/b$batchId", Seq.empty))
            j.select(col("user_id"),
                (coalesce(col("c_n"), lit(0L))
                  + coalesce(col("n_events"), lit(0L))).as("n_events"),
                greatest(col("c_ts"), col("last_ts")).as("last_ts"),
                (coalesce(col("c_sum"), lit(0).cast(dec))
                  + coalesce(col("sum_value"), lit(0).cast(dec)))
                  .cast(dec).as("sum_value"),
                // deletion applies only to batch-ACTIVE keys (the rule's
                // membership gate): untouched keys keep their rows even
                // when their id lands on this batch
                (col("n_events").isNotNull && delPred).as("__del"))
              .filter(!col("__del")).drop("__del")
          })
        IngestIndex.writeManifest(fs, stateDir, next,
          Map("state" -> stateMap))
        IngestIndex.gc(fs, stateDir, batchId, next, retain, retainMillis)
        top = math.max(top, next)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    top
  }

  /** The accumulated change feed (all batches). */
  def cdfRows(spark: SparkSession, cdfDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(cdfDir)

  private val FeedSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("op", StringType),
    StructField("n_events", LongType),
    StructField("last_ts", TimestampType),
    StructField("sum_value", DecimalType(18, 4)),
    StructField("batch_id", LongType)))

  /** q125: the DOWNSTREAM half of a CDC pipeline — a SECOND stream
    * consumes the change feed as a file source and maintains the
    * per-nation view INCREMENTALLY: each trigger reduces its change
    * slice to signed per-nation deltas (insert count, postimage −
    * preimage event/value deltas through the broadcast dim) and MERGEs
    * them into a versioned 25-key view table. The upstream table is
    * never read — the feed is the only input, which is the CDC
    * contract. Because the delta algebra is associative (sums of signed
    * terms), the final view is independent of how the feed files slice
    * into triggers — no replay-order pinning needed, unlike every
    * event-time rig. Returns the completed view. */
  def maintainView(spark: SparkSession, feedGlob: String, sfDir: String,
      viewDir: String): DataFrame =
    maintainViewImpl(spark, feedGlob, sfDir, viewDir, seed = None,
      fromBatch = 0L)

  /** q133: CDC CATCH-UP consumer — Delta's `startingVersion` pattern. A
    * consumer arriving mid-stream does NOT replay the whole feed: it
    * bootstraps from ONE snapshot read of the upstream table AS OF
    * version v0 ([[IngestIndex.tableAt]] — the initial-snapshot half of
    * Delta's readChangeFeed contract), reduces it to the view shape,
    * commits that as the view's first version, then consumes ONLY feed
    * rows with `batch_id >= v0` (the changes the snapshot does not
    * already contain — feed batch b is the merge that committed state
    * v(b+1), so a v0 snapshot needs exactly batches b >= v0). Because
    * the delta algebra is associative and the snapshot IS the fold of
    * batches < v0, bootstrap + tail telescopes to the full replay — the
    * law q133 pins with q130b's oracle verbatim, across a boundary that
    * splits delete chains (users deleted before v0 are simply absent
    * from the snapshot; deletes at >= v0 subtract images the bootstrap
    * counted). At scale this is the only viable consumer start: the
    * snapshot read costs one pruned scan of the CURRENT table, not a
    * replay of months of feed. */
  def maintainViewFrom(spark: SparkSession, feedGlob: String,
      sfDir: String, stateDir: String, viewDir: String,
      fromVersion: Long): DataFrame = {
    // the snapshot read is a THUNK: it must only run when the view store
    // is fresh — on a restart the upstream version may have aged past
    // the producer's retention, and tableAt validates (and throws)
    // EAGERLY at frame construction
    val snap = () => {
      val dim = EventStream.userNationDim(spark, sfDir)
      IngestIndex.tableAt(spark, stateDir, "state", fromVersion)
        .join(dim, "user_id")
        .groupBy("nation")
        .agg(count(lit(1)).as("n_users"),
          sum(col("n_events")).as("n_events"),
          sum(col("sum_value").cast(dec)).cast(dec).as("sum_value"))
    }
    maintainViewImpl(spark, feedGlob, sfDir, viewDir, seed = Some(snap),
      fromBatch = fromVersion)
  }

  /** One trigger's change slice reduced to SIGNED per-nation deltas —
    * the fold both view consumers share: preimages AND deletes subtract
    * (a delete carries the removed image — the negative term that
    * cancels its accumulated contributions); inserts/postimages add.
    * `opCol` names the op column (`op` in the feed artifact,
    * `_change_type` from the graft-cdc source — same vocabulary). */
  private def signedNationDelta(batch: DataFrame, dim: DataFrame,
      opCol: String): DataFrame = {
    val op = col(opCol)
    val sgn = when(op === "update_preimage" || op === "delete",
      lit(-1L)).otherwise(lit(1L))
    batch.join(dim, "user_id")
      .groupBy("nation")
      .agg(
        sum(when(op === "insert", 1L)
          .when(op === "delete", -1L).otherwise(0L)).as("n_users"),
        sum(sgn * col("n_events")).as("n_events"),
        sum((sgn.cast(dec) * col("sum_value").cast(dec)).cast(dec))
          .cast(dec).as("sum_value"))
  }

  /** MERGE a signed per-nation delta into the view store as version
    * `next` (reads the manifest at `next - 1`) — the associative
    * accumulate both consumers commit per trigger. */
  private def commitViewDelta(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, viewDir: String,
      next: Long, delta: DataFrame): Unit = {
    val m = IngestIndex.readManifest(fs, viewDir, next - 1)
    val viewMap = IngestIndex.mergeCommit(spark, viewDir, m,
      "view", next, delta,
      (cur, d) => cur
        .select(col("nation"), col("n_users").as("c_u"),
          col("n_events").as("c_e"), col("sum_value").as("c_v"))
        .join(d, Seq("nation"), "full_outer")
        .select(col("nation"),
          (coalesce(col("c_u"), lit(0L))
            + coalesce(col("n_users"), lit(0L))).as("n_users"),
          (coalesce(col("c_e"), lit(0L))
            + coalesce(col("n_events"), lit(0L))).as("n_events"),
          (coalesce(col("c_v"), lit(0).cast(dec))
            + coalesce(col("sum_value"), lit(0).cast(dec)))
            .cast(dec).as("sum_value")))
    IngestIndex.writeManifest(fs, viewDir, next,
      Map("view" -> viewMap))
    IngestIndex.gc(fs, viewDir, next - 1, next)
  }

  /** q144: the view maintained from the STORE'S OWN VERSIONS through
    * the `graft-cdc` streaming source ([[GraftCdcSource]]) — no feed
    * artifact anywhere: the producer only commits store versions, and
    * the consumer's micro-batches ARE the store's retroactive change
    * rows (`changesBetween`, per-step reads restricted to each commit's
    * bucket footprint). Two start modes, both exercised by q144:
    * `startingVersion = Some(v)` tails the history from version v;
    * `None` bootstraps from ONE snapshot read at stream start (the
    * source emits it as the first batch's `insert` rows — q133's
    * catch-up rule, now INSIDE the source, so the consumer's algebra is
    * start-mode-agnostic). Resuming with the same `viewDir` continues
    * from the checkpoint — a later call catches up on commits that
    * landed in between (the mid-stream-arrival seam q144 pins).
    * Returns the completed view. */
  def maintainViewFromCdc(spark: SparkSession, storeName: String,
      sfDir: String, viewDir: String,
      startingVersion: Option[Long]): DataFrame = {
    val dim = EventStream.userNationDim(spark, sfDir)
    val fs = new org.apache.hadoop.fs.Path(viewDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reader = spark.readStream.format("graft-cdc")
      .option("name", storeName)
    startingVersion.foreach(v =>
      reader.option("startingVersion", v.toString))
    val q = reader.load()
      .writeStream
      .option("checkpointLocation", s"$viewDir/_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        commitViewDelta(spark, fs, viewDir, batchId + 1,
          signedNationDelta(batch, dim, "_change_type"))
        ()
      }
      // ProcessingTime(0) + processAllAvailable — the test-rig idiom
      // (synchronous drain). Production backfills can use
      // Trigger.AvailableNow instead: the source implements
      // SupportsTriggerAvailableNow (r20), so per-version batching and
      // the rate limit survive it (GraftCdcSourceSpec pins the law);
      // before r20 the generic V1 wrapper would have collapsed them
      // into a single batch.
      .start()
    q.processAllAvailable()
    q.stop()
    IngestIndex.currentTable(spark, viewDir, "view")
  }

  private def maintainViewImpl(spark: SparkSession, feedGlob: String,
      sfDir: String, viewDir: String, seed: Option[() => DataFrame],
      fromBatch: Long): DataFrame = {
    val dim = EventStream.userNationDim(spark, sfDir)
    val fs = new org.apache.hadoop.fs.Path(viewDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // catch-up bootstrap: the snapshot aggregate is the view's v1,
    // committed BEFORE the stream starts — and ONLY on a fresh view
    // store (review fix): a restart must not re-read the upstream
    // snapshot (its version may have aged past the producer's retention
    // by then — the bootstrap is a one-time event, that's the point of
    // catch-up) nor overwrite v1, a dir the view's newest manifest may
    // still reference for untouched buckets
    val vOff = seed match {
      case Some(s) =>
        if (IngestIndex.latestVersion(fs, viewDir).isEmpty) {
          val m1: IngestIndex.Manifest = Map("view" ->
            IngestIndex.mergeCommit(spark, viewDir, Map.empty, "view", 1L,
              s(), (_, d) => d))
          IngestIndex.writeManifest(fs, viewDir, 1L, m1)
        }
        1L
      case None => 0L
    }
    val q = spark.readStream
      .schema(FeedSchema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet")
      .parquet(feedGlob)
      .writeStream
      .option("checkpointLocation", s"$viewDir/_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // the shared signed fold ([[signedNationDelta]] — delta columns
        // carry the VIEW's names so mergeCommit's batch-shaped empty
        // frame IS view-shaped on the first trigger). Feeds without
        // deletes (q123/q125) see the identical algebra as before. A
        // catch-up consumer drops rows its bootstrap snapshot already
        // contains (batch_id < fromBatch) — the file source still
        // delivers the files, the filter nets their deltas to nothing.
        commitViewDelta(spark, fs, viewDir, batchId + vOff + 1,
          signedNationDelta(
            batch.filter(col("batch_id") >= fromBatch), dim, "op"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    IngestIndex.currentTable(spark, viewDir, "view")
  }
}
