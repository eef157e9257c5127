package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** STREAMING CHANGE-DATA SOURCE over a graft store (r19) — the
  * `readStream` surface the r18 verdict named as the store's one missing
  * production streaming piece. Until now a consumer either tailed the
  * writer-maintained feed artifact (q125) or polled
  * [[IngestIndex.changesBetween]] by hand; this source is Delta's
  * `readChangeFeed` streaming equivalent computed from the store's OWN
  * version layout — no feed artifact:
  *
  *   spark.readStream.format("graft-cdc")
  *     .option("name", "<registered store name>")     // flat or catalog
  *     [.option("startingVersion", v)]                // tail from v
  *     [.option("maxVersionsPerTrigger", k)]          // rate limit
  *     .load()
  *
  * ARCHITECTURE — the V1 [[Source]] API on purpose. Delta's own
  * streaming source is a V1 `Source` for exactly the reason that decides
  * it here: `getBatch` returns an arbitrary DataFrame, so each
  * micro-batch can BE the engine's `changesBetween` plan — per-step
  * reads restricted to each commit's bucket footprint (the ChangesSpec
  * IO law, asserted on executed-plan metrics), row-level EXCEPT
  * cancellation, DV visibility deletes — with no re-implementation of
  * that logic as connector-level partition readers. A DSv2
  * `MicroBatchStream` would force the change computation through
  * `InputPartition`s, i.e. either a driver-side collect (not
  * distributed) or a materialize-to-staging pass (doubled IO); the V1
  * frame stays lazy — [[GraftSqlBridge.streamingFrame]] wraps
  * `queryExecution.toRdd`, and the distributed plan executes only when
  * the sink consumes the batch.
  *
  * OFFSETS are store versions. The offset JSON carries the snapshot
  * BOOTSTRAP version beside the position (`{"version":V,"bootstrap":B}`)
  * so a restarted stream replays its first batch byte-identically even
  * though the store has since advanced — the bootstrap is a one-time
  * event fixed at first-start, exactly q133's catch-up rule.
  *
  * START MODES (Delta's two):
  *   - default: SNAPSHOT BOOTSTRAP — the first batch is the current
  *     snapshot (version at stream start) emitted as `insert` rows at
  *     that version, then each later commit arrives as its change rows.
  *     At scale this is the only viable consumer start: one pruned scan
  *     of the current table, never a replay of months of history.
  *   - `startingVersion = v`: no snapshot; the first batch starts at
  *     version v's OWN changes (inclusive, Delta's convention).
  *
  * EXACTLY-ONCE: the source is RETROACTIVE — any retained (start, end]
  * range recomputes to the same rows, so restart-safety needs no source
  * state beyond the offset log; a range GC evicted fails loudly with the
  * named retention error ([[IngestIndex.changesBetween]]'s contract).
  *
  * Schema: the store's readable schema + `_change_type` +
  * `_commit_version`, fixed at stream start. A table WIDENED mid-stream
  * (ALTER TABLE ADD COLUMNS) raises a named error telling the consumer
  * to restart under the new shape — Delta's behavior; pre-widening
  * change rows under a post-widening declared schema null-fill (the
  * store's read-old-under-new contract).
  */
class GraftCdcSource(
    sqlContext: SQLContext,
    name: String,
    stateDir: String,
    table: String,
    metadataPath: String,
    startingVersion: Option[Long],
    endingVersion: Option[Long],
    maxVersionsPerTrigger: Option[Long],
    declared: StructType) extends Source {

  import GraftCdcSource._

  private def spark = sqlContext.sparkSession
  private def fs = new Path(stateDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Snapshot-bootstrap version: the store's latest at FIRST stream
    * start, PERSISTED under the source's checkpoint `metadataPath` so
    * every offset in one stream lineage carries the same value —
    * offsets compare by json, and a restart-recomputed bootstrap would
    * make `{"version":V,"bootstrap":old}` != `{...,"bootstrap":new}`
    * read as phantom new data at the same version. The bootstrap is a
    * one-time event (q133's catch-up rule); the file is its record.
    * -1 in startingVersion mode (no snapshot). An empty store
    * bootstraps at 0 — the degenerate snapshot is nothing, and the
    * first commit's changes arrive as the first batch. */
  private val bootstrapV: Long = startingVersion match {
    case Some(v) =>
      require(v >= 1, s"graft-cdc '$name': startingVersion must be " +
        s">= 1 (got $v) — version v's own changes are the first batch")
      -1L
    case None =>
      val mp = new Path(metadataPath, "graft-cdc-bootstrap")
      val mfs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (mfs.exists(mp)) {
        val in = mfs.open(mp)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim.toLong
        finally in.close()
      } else {
        val b = IngestIndex.latestVersion(fs, stateDir).getOrElse(0L)
        mfs.mkdirs(mp.getParent)
        val out = mfs.create(mp, false) // no-overwrite: first writer wins
        try out.write(b.toString.getBytes("UTF-8")) finally out.close()
        b
      }
  }

  // a bound BELOW the bootstrap snapshot cannot be served in snapshot
  // mode (the first batch would already exceed it) — a bounded
  // HISTORICAL range is startingVersion's job
  require(endingVersion.forall(e => bootstrapV < 0 || e >= bootstrapV),
    s"graft-cdc '$name': endingVersion (${endingVersion.getOrElse(0L)}) " +
      s"precedes the stream's bootstrap snapshot (v$bootstrapV) — use " +
      "startingVersion for a bounded historical range")

  /** Rate-limit floor: the highest version offered or replayed so far.
    * None on a fresh instance — the first offer then goes straight to
    * the store's latest (never BELOW a committed offset after restart,
    * which would feed `changesBetween(hi, lo)`); rate limiting kicks in
    * once a batch has taught the floor. */
  private var highestSeen: Option[Long] = None

  override def schema: StructType = declared

  override def getOffset: Option[OffsetV1] = {
    // endingVersion (r19): a BOUNDED tail — offers stop at the bound
    // (inclusive), so a backfill/replication job over a fixed range
    // completes under processAllAvailable/AvailableNow instead of
    // idling forever; commits past the bound never arrive
    val latest = math.min(
      IngestIndex.latestVersion(fs, stateDir).getOrElse(0L),
      endingVersion.getOrElse(Long.MaxValue))
    val floor: Option[Long] = highestSeen.orElse {
      // fresh-start floors; a RESTARTED instance has highestSeen==None
      // too, but its first offer (min vs latest) can only land at or
      // above the committed offset because versions only grow
      startingVersion.map(_ - 1).orElse(
        if (bootstrapV >= 1) None else Some(0L))
    }
    val target = (floor, maxVersionsPerTrigger) match {
      case (Some(f), Some(k)) => math.min(latest, f + k)
      case _ if bootstrapV >= 1 && highestSeen.isEmpty &&
          maxVersionsPerTrigger.isDefined =>
        bootstrapV // rate-limited snapshot mode: bootstrap batch alone
      case _ => latest
    }
    val emittable = target match {
      case t if t <= 0L => None
      case t if bootstrapV >= 1 && highestSeen.isEmpty => Some(t)
      case t if floor.exists(t <= _) => None // nothing new
      case t => Some(t)
    }
    emittable.foreach(v => highestSeen =
      Some(math.max(v, highestSeen.getOrElse(0L))))
    emittable.map(v => GraftCdcOffset(v,
      if (startingVersion.isDefined) -1L else bootstrapV))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1)
      : DataFrame = {
    val endO = GraftCdcOffset.of(end)
    highestSeen = Some(math.max(endO.version,
      highestSeen.getOrElse(0L)))
    val batch = start.map(GraftCdcOffset.of) match {
      case Some(s) =>
        batchFrame(spark, stateDir, table, s.version, endO.version)
      case None if endO.bootstrap >= 1 =>
        // first batch, snapshot mode: the bootstrap snapshot as inserts
        // (+ any commits that landed between bootstrap and the offered
        // end — the same union a catch-up consumer folds)
        val snap = IngestIndex
          .tableAt(spark, stateDir, table, endO.bootstrap)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(endO.bootstrap))
        if (endO.version > endO.bootstrap)
          snap.unionByName(batchFrame(spark, stateDir, table,
            endO.bootstrap, endO.version),
            allowMissingColumns = true)
        else snap
      case None =>
        // first batch, startingVersion mode (or empty-store bootstrap):
        // version sv's own changes lead
        val from = startingVersion.map(_ - 1).getOrElse(0L)
        batchFrame(spark, stateDir, table, from, endO.version)
    }
    GraftSqlBridge.streamingFrame(align(name, batch, declared))
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
  override def toString: String =
    s"GraftCdcSource[$name @ $stateDir]"
}

object GraftCdcSource {

  /** The change columns appended to the table's payload. */
  val ChangeFields: Seq[StructField] = Seq(
    StructField("_change_type", StringType, nullable = false),
    StructField("_commit_version", LongType, nullable = false))

  /** One micro-batch's rows: the committed changes in (fromV, toV] —
    * [[IngestIndex.changesBetween]] verbatim, so the per-trigger IO
    * law IS ChangesSpec's law (each step reads only its commit's
    * bucket footprint, asserted there on executed-plan metrics). */
  def batchFrame(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, table: String, fromV: Long, toV: Long)
      : DataFrame =
    IngestIndex.changesBetween(spark, stateDir, table, fromV, toV)

  /** Batch rows aligned to the stream's DECLARED schema: columns the
    * batch lacks (pre-widening steps) null-fill; columns the batch
    * carries that the declaration does not mean the table WIDENED
    * mid-stream — a named error, Delta's restart contract. */
  private[streaming] def align(name: String, df: DataFrame,
      declared: StructType): DataFrame = {
    val declaredNames = declared.fieldNames
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val extra = df.columns.filterNot(c =>
      declaredNames(c.toLowerCase(java.util.Locale.ROOT)))
    if (extra.nonEmpty) throw new IllegalStateException(
      s"graft-cdc '$name': the table gained column(s) " +
        s"${extra.mkString(", ")} after this stream started — " +
        "restart the stream to adopt the widened schema (its declared " +
        "schema is fixed at start, Delta's contract)")
    val have = df.columns
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    df.select(declared.fields.toSeq.map { f =>
      if (have(f.name.toLowerCase(java.util.Locale.ROOT)))
        col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}

/** Version-position offset with the stream's one-time snapshot
  * bootstrap pinned beside it (-1 = startingVersion mode). */
final case class GraftCdcOffset(version: Long, bootstrap: Long)
    extends OffsetV1 {
  override def json: String =
    s"""{"version":$version,"bootstrap":$bootstrap}"""
}

object GraftCdcOffset {
  private val Re =
    """\{"version":(-?\d+),"bootstrap":(-?\d+)\}""".r

  def parse(json: String): GraftCdcOffset = json.trim match {
    case Re(v, b) => GraftCdcOffset(v.toLong, b.toLong)
    case other => throw new IllegalArgumentException(
      s"not a graft-cdc offset: $other")
  }

  /** The offset log hands back [[SerializedOffset]] wrappers after a
    * restart; live triggers hand the typed offset. */
  def of(o: OffsetV1): GraftCdcOffset = o match {
    case g: GraftCdcOffset => g
    case s: SerializedOffset => parse(s.json)
    case other => parse(other.json)
  }
}

/** `format("graft-cdc")` registration: resolves the store by its
  * registered name (flat registry or `<catalog>.<ns>.<table>`), fixes
  * the stream's schema at start, and builds the source. */
class GraftCdcSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  private def resolve(parameters: Map[String, String])
      : (String, graft.operators.GraftSql.StoreTarget) = {
    val name = parameters.getOrElse("name",
      throw new IllegalArgumentException(
        "graft-cdc: .option(\"name\", <registered store table>) is " +
          "required (GraftSql.registerTable first, or a " +
          "<catalog>.<ns>.<table> name)"))
    val t = graft.operators.GraftSql.resolveStore(name).getOrElse(
      throw new IllegalArgumentException(
        s"graft-cdc: '$name' is not a registered graft store table — " +
          "GraftSql.registerTable first, or address it through a " +
          "graft catalog (<catalog>.<ns>.<table>)"))
    (name, t)
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-cdc: the change schema is the table's own plus " +
        "_change_type/_commit_version — do not pass .schema(...)")
    val (_, t) = resolve(parameters)
    val base = graft.operators.GraftSql
      .readableSchema(sqlContext.sparkSession, t)
    (shortName(),
      StructType(base.fields.toSeq ++ GraftCdcSource.ChangeFields))
  }

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val (name, t) = resolve(parameters)
    val declared = sourceSchema(sqlContext, schema, providerName,
      parameters)._2
    val sv = parameters.get("startingVersion").map { s =>
      s.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"graft-cdc '$name': startingVersion must be an integer " +
          s"version (DESCRIBE HISTORY lists them); got '$s'"))
    }
    val ev = parameters.get("endingVersion").map { s =>
      val v = s.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"graft-cdc '$name': endingVersion must be an integer " +
          s"version (DESCRIBE HISTORY lists them); got '$s'"))
      require(v >= 1 && sv.forall(v >= _),
        s"graft-cdc '$name': endingVersion ($v) must be >= 1 and >= " +
          s"startingVersion (${sv.getOrElse(1L)})")
      v
    }
    val mvpt = parameters.get("maxVersionsPerTrigger").map { s =>
      val k = s.toLongOption.getOrElse(-1L)
      require(k >= 1, s"graft-cdc '$name': maxVersionsPerTrigger " +
        s"must be >= 1; got '$s'")
      k
    }
    new GraftCdcSource(sqlContext, name, t.stateDir, t.table,
      metadataPath, sv, ev, mvpt, declared)
  }
}
