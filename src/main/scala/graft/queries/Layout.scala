package graft.queries

import graft.{Q, QueryDef}
import graft.Q._
import graft.functions.ZOrder
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Q107: Z-ORDER data layout — the lakehouse OPTIMIZE ZORDER operation
  * (Delta/Iceberg's multi-column clustering) as a first-class operator.
  *
  * Why it exists at 100 TB: hive partitioning (LakeLayoutSpec) prunes on
  * ONE low-cardinality column; sorting prunes on ONE ordered column. A
  * corpus queried by 2-D boxes (user x value here; source x quality
  * score, date x domain in a training pipeline) needs every FILE to be
  * narrow in BOTH dimensions at once — which is exactly what clustering
  * by a space-filling curve gives: rows are range-partitioned and sorted
  * by the interleaved-bit Morton code, so each output file covers a
  * small square-ish region of the 2-D space, and the parquet footer
  * min/max stats of BOTH raw columns become tight per file. A box
  * predicate then skips most row groups at the SCAN, before any Spark
  * operator runs — data-skipping bought purely with layout, no index
  * structure to maintain.
  *
  * The rewrite itself is one range shuffle (repartitionByRange on the
  * z-value — Spark samples the range bounds, so skew in z-space still
  * yields balanced files) + an in-partition sort + a parquet write:
  * linear in the data, embarrassingly scalable.
  *
  * Correctness contract: LAYOUT INVARIANCE. The query reads the
  * REWRITTEN copy and aggregates a 2-D box; the DuckDB oracle runs the
  * same box aggregate on the ORIGINAL table — hash equality proves the
  * rewrite lost, duplicated and corrupted nothing. The box bounds are
  * derived from min/max range fractions (0.25/0.375 — exact binary
  * doubles) computed identically by both engines from the same data.
  *
  * Pushdown note: the semantic guard `CAST(user_id AS DOUBLE) >= bound`
  * is NOT parquet-pushable (the cast hides the attribute), so the query
  * conjoins a WIDENED integral guard on the raw column
  * (user_id >= floor(lo), < ceil(hi) — a strict superset, so results
  * are unchanged and the oracle doesn't carry it) purely to hand the
  * scan a stats-comparable predicate. ZOrderSpec measures the effect:
  * the z-layout scan emits a fraction of the rows a hash-layout scan of
  * the same data emits under the same predicate.
  */
object Layout {

  /** Output file count of the rewrite = z-range granularity: 16 files
    * = 4 z-bits = a 4x4 grid of 2-D cells, each file ~1 cell. Production
    * tables size this by target file size (~1 GB), not a constant. */
  val ZFiles = 16

  /** Cluster `df` by a space-filling curve over (x, y) scaled from the
    * given ranges, writing `ZFiles` parquet files to `path`. The curve
    * value rides along in the files as `zv` (file-level min/max
    * documents the clustering; droppable). `hilbert` picks the Hilbert
    * index (r17, q107b) over the Morton interleave — same contract,
    * no locality cliffs at quadrant boundaries. */
  private[graft] def curveWrite(df: DataFrame, x: Column, y: Column,
      xr: (Double, Double), yr: (Double, Double), path: String,
      hilbert: Boolean): Unit = {
    val nx = ZOrder.norm16(x, xr._1, xr._2)
    val ny = ZOrder.norm16(y, yr._1, yr._2)
    df.withColumn("zv",
        if (hilbert) ZOrder.hilbert16(nx, ny)
        else ZOrder.interleave16(nx, ny))
      .repartitionByRange(ZFiles, col("zv"))
      .sortWithinPartitions("zv")
      .write.mode("overwrite").parquet(path)
  }

  /** The Morton (Z-order) clustering rewrite — see [[curveWrite]]. */
  private[graft] def zOrderWrite(df: DataFrame, x: Column, y: Column,
      xr: (Double, Double), yr: (Double, Double), path: String): Unit =
    curveWrite(df, x, y, xr, yr, path, hilbert = false)

  /** The measured (min, max) of user_id and value — the clustering
    * ranges AND the box-bound inputs, shared with ZOrderSpec. */
  private[graft] def eventRanges(s: SparkSession, d: String)
      : (DataFrame, (Double, Double), (Double, Double)) = {
    val ev = Q.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    val st = ev.agg(
      min(col("user_id")).cast(DoubleType), max(col("user_id")).cast(DoubleType),
      min(col("value")), max(col("value"))).head
    (ev, (st.getDouble(0), st.getDouble(1)), (st.getDouble(2), st.getDouble(3)))
  }

  /** The q107 2-D box bounds: closed-open [bul, buh) x [bvl, bvh) at
    * exact-binary range fractions — shared by the row filter and the
    * file-manifest pruning so they can never disagree. */
  private[graft] def boxBounds(ur: (Double, Double), vr: (Double, Double))
      : (Double, Double, Double, Double) =
    (ur._1 + 0.25 * (ur._2 - ur._1), ur._1 + 0.375 * (ur._2 - ur._1),
      vr._1 + 0.25 * (vr._2 - vr._1), vr._1 + 0.375 * (vr._2 - vr._1))

  /** A 2-D box filter over integral column `xc` and double column `yc`:
    * the exact double-typed box plus the widened integral pushdown
    * guard on `xc` (the CAST hides the attribute from parquet stats, so
    * the scan gets a strict-superset raw-column predicate). */
  private[graft] def boxFilterOn(df: DataFrame, xc: String, yc: String,
      ur: (Double, Double), vr: (Double, Double)): DataFrame = {
    val (bul, buh, bvl, bvh) = boxBounds(ur, vr)
    df.filter(col(xc) >= lit(math.floor(bul).toLong) &&
        col(xc) < lit(math.ceil(buh).toLong))   // pushable superset
      .filter(col(xc).cast(DoubleType) >= bul &&
        col(xc).cast(DoubleType) < buh &&
        col(yc) >= bvl && col(yc) < bvh)
  }

  /** The q107 box filter: (user_id, value). */
  private[graft] def boxFilter(df: DataFrame,
      ur: (Double, Double), vr: (Double, Double)): DataFrame =
    boxFilterOn(df, "user_id", "value", ur, vr)

  /** FILE-skipping manifest (r13, generalized r14 — the Delta add-file
    * stats analogue): one row per data file with min/max of EACH of
    * `cols`, an ARBITRARY column set. Stored as parquet under
    * `_manifest` INSIDE the layout dir — the leading underscore hides
    * it from every normal parquet read of the directory. Parquet
    * footer stats skip ROW GROUPS after the scan has listed and opened
    * every file; the manifest prunes FILES before the scan ever lists
    * them — at 100 TB that is the difference between "open 100k
    * footers" and "read one 16-row table". */
  private[graft] def writeStatsManifest(s: SparkSession, path: String,
      cols: Seq[String]): Unit = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max"))) :+
      count(lit(1)).as("cnt") // per-file row count: q124's metadata-only
    //                           aggregates answer from this, zero data IO
    s.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** The q107 manifest: stats on the two box columns plus the z-value
    * range (documentation of the clustering). */
  private[graft] def writeManifest(s: SparkSession, path: String): Unit =
    writeStatsManifest(s, path, Seq("user_id", "value", "zv"))

  /** Files whose per-column stats intersect EVERY closed-open interval
    * in `boxes` (col -> [lo, hi), compared in double space), plus the
    * total file count (spec observability). A file drops out exactly
    * when its stats PROVE it holds no qualifying row, so pruning can
    * never change results — and a pruning bug would surface as an
    * oracle hash mismatch on q107/q118. */
  private[graft] def statsPrunedFiles(s: SparkSession, path: String,
      boxes: Seq[(String, Double, Double)]): (Seq[String], Long) = {
    val m = s.read.parquet(s"$path/_manifest")
    val keep = m.filter(boxes.map { case (c, lo, hi) =>
        col(s"${c}__max").cast(DoubleType) >= lo &&
          col(s"${c}__min").cast(DoubleType) < hi
      }.reduce(_ && _))
      .select("file").collect().map(_.getString(0)).toSeq
    (keep, m.count())
  }

  /** q107's (user_id, value) box over [[statsPrunedFiles]]. */
  private[graft] def manifestPrunedFiles(s: SparkSession, path: String,
      ur: (Double, Double), vr: (Double, Double)): (Seq[String], Long) = {
    val (bul, buh, bvl, bvh) = boxBounds(ur, vr)
    statsPrunedFiles(s, path,
      Seq(("user_id", bul, buh), ("value", bvl, bvh)))
  }

  /** METADATA-ONLY box count (q124 — Iceberg/Delta's "answer from
    * manifests" pattern): a file whose per-column stats prove FULL
    * containment in every interval contributes its manifest row count
    * with zero data IO; only files STRADDLING a box edge are scanned
    * (with the exact residual filter). At 100 TB with tight z-clustered
    * files, interior files dominate any large box, so the count touches
    * O(perimeter) files instead of O(area) — and a full-table count
    * touches none at all. Returns (count, filesMetaCounted, filesScanned,
    * filesTotal); the driver-side manifest collect is one row per file
    * (the same bound statsPrunedFiles already carries). */
  private[graft] def metadataCount(s: SparkSession, path: String,
      boxes: Seq[(String, Double, Double)]): (Long, Long, Long, Long) = {
    val m = s.read.parquet(s"$path/_manifest")
    val inter = boxes.map { case (c, lo, hi) =>
      col(s"${c}__max").cast(DoubleType) >= lo &&
        col(s"${c}__min").cast(DoubleType) < hi
    }.reduce(_ && _)
    val full = boxes.map { case (c, lo, hi) =>
      col(s"${c}__min").cast(DoubleType) >= lo &&
        col(s"${c}__max").cast(DoubleType) < hi
    }.reduce(_ && _)
    val rows = m.filter(inter)
      .select(col("file"), col("cnt"), full.as("full")).collect()
    val metaCnt = rows.filter(_.getBoolean(2)).map(_.getLong(1)).sum
    val scanFiles = rows.filterNot(_.getBoolean(2)).map(_.getString(0))
    val scanned =
      if (scanFiles.isEmpty) 0L
      else {
        val df = s.read.parquet(scanFiles.toSeq: _*)
        df.filter(boxes.map { case (c, lo, hi) =>
          // on an INTEGRAL column the exact predicate's CAST hides the
          // attribute from parquet row-group stats (boxFilterOn's
          // argument) — conjoin a widened raw-typed superset guard so
          // the perimeter scan still skips row groups; a floating
          // column's exact predicate is pushable as-is (no-op cast)
          val exact = col(c).cast(DoubleType) >= lo &&
            col(c).cast(DoubleType) < hi
          df.schema(c).dataType match {
            case ByteType | ShortType | IntegerType | LongType =>
              col(c) >= lit(math.floor(lo).toLong) &&
                col(c) < lit(math.ceil(hi).toLong) && exact
            case _ => exact
          }
        }.reduce(_ && _)).count()
      }
    (metaCnt + scanned, rows.count(_.getBoolean(2)).toLong,
      scanFiles.length.toLong, m.count())
  }

  /** Read a layout through its stats manifest: only FILES intersecting
    * every interval are handed to the scan. Empty intersection -> an
    * empty frame with the layout's schema. */
  private[graft] def statsPrunedRead(s: SparkSession, path: String,
      boxes: Seq[(String, Double, Double)]): DataFrame = {
    val (keep, _) = statsPrunedFiles(s, path, boxes)
    if (keep.isEmpty) s.read.parquet(path).limit(0)
    else s.read.parquet(keep: _*)
  }

  /** Read the q107 z layout through its manifest. */
  private[graft] def manifestPrunedRead(s: SparkSession, path: String,
      ur: (Double, Double), vr: (Double, Double)): DataFrame = {
    val (bul, buh, bvl, bvh) = boxBounds(ur, vr)
    statsPrunedRead(s, path,
      Seq(("user_id", bul, buh), ("value", bvl, bvh)))
  }

  /** Q118's one-pass lakehouse OPTIMIZE: bin-pack small files AND
    * z-cluster on (x, y) AND write the file-stats manifest over
    * `statsCols` — the full maintenance loop q110 (compact) and q107
    * (cluster + stats) each did half of. One read of the fragmented
    * input, one range shuffle, ZFiles output files, one 16-row stats
    * pass; at 100 TB this is the nightly OPTIMIZE job's exact shape
    * (Delta OPTIMIZE ZORDER BY). Returns the measured (x, y) ranges —
    * the clustering inputs and the box-bound inputs downstream. */
  /** Measure the (x, y) ranges of `df` and curve-cluster it into
    * `outPath` — the shared body of [[optimize]] and the SQL OPTIMIZE
    * command's in-place rewrite (review fix: the range agg + curveWrite
    * pair used to live in both). Returns the measured ranges. The
    * STATS MANIFEST is the caller's job: it records absolute file
    * paths (`input_file_name`), so an in-place rewrite must write it
    * AFTER installing the directory at its final name. */
  private[graft] def clusterInto(s: SparkSession,
      df: org.apache.spark.sql.DataFrame, x: String, y: String,
      outPath: String, hilbert: Boolean)
      : ((Double, Double), (Double, Double)) = {
    val st = df.agg(
      min(col(x)).cast(DoubleType), max(col(x)).cast(DoubleType),
      min(col(y)).cast(DoubleType), max(col(y)).cast(DoubleType)).head
    val xr = (st.getDouble(0), st.getDouble(1))
    val yr = (st.getDouble(2), st.getDouble(3))
    curveWrite(df, col(x), col(y), xr, yr, outPath, hilbert)
    (xr, yr)
  }

  private[graft] def optimize(s: SparkSession, inPath: String,
      outPath: String, x: String, y: String, statsCols: Seq[String],
      hilbert: Boolean = false)
      : ((Double, Double), (Double, Double)) = {
    val ranges = clusterInto(s, s.read.parquet(inPath), x, y, outPath,
      hilbert)
    writeStatsManifest(s, outPath, statsCols :+ "zv")
    ranges
  }

  /** Staging dirs this JVM created — deleted by one shutdown hook, so
    * appId-salted paths don't accumulate in tmp across harness runs. */
  private val stagedPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val stageCleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      stagedPaths.forEach { p =>
        try {
          val root = java.nio.file.Paths.get(p)
          if (java.nio.file.Files.exists(root)) {
            val walk = java.nio.file.Files.walk(root)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.deleteIfExists(f))
            finally walk.close()
          }
          java.nio.file.Files.deleteIfExists(ownerMarker(root))
        } catch { case _: Throwable => () }
      }
    }))
  /** The SIBLING liveness marker of staging dir `p`: `<p>.owner` holds
    * the owning JVM's pid. A sibling (not a file inside the dir) because
    * several stagePath roots are themselves parquet overwrite targets —
    * an in-dir marker would die on the first rewrite. */
  private[graft] def ownerMarker(p: java.nio.file.Path): java.nio.file.Path =
    p.resolveSibling(p.getFileName.toString + ".owner")

  /** The marker's epoch-millis start time of process `h`, or None when
    * the platform withholds it. */
  private def startMillisOf(h: ProcessHandle): Option[Long] = {
    val i = h.info().startInstant()
    if (i.isPresent) Some(i.get().toEpochMilli) else None
  }

  private val markerWriteWarned =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Marker content is `pid<TAB>startEpochMillis` (r16, advisor fix):
    * a bare pid is vulnerable to PID REUSE — an unrelated process
    * recycling a dead harness's pid would keep its staging alive
    * forever. The JVM start time disambiguates: alive means the pid is
    * live AND was started when the marker says. A failed marker write
    * is logged ONCE (a dir whose marker never landed is sweepable after
    * 7 days — silent failure would make that surprising). */
  private def writeOwnerMarker(p: String): Unit = try {
    val self = ProcessHandle.current()
    val start = startMillisOf(self).map(m => s"\t$m").getOrElse("")
    java.nio.file.Files.writeString(
      ownerMarker(java.nio.file.Paths.get(p)),
      s"${self.pid()}$start")
    ()
  } catch {
    case e: Throwable =>
      if (markerWriteWarned.compareAndSet(false, true))
        Console.err.println(s"[graft] owner-marker write failed for $p " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}) — staging " +
          "will be age-sweepable by other JVMs after 7 days")
      ()
  }

  /** The process recorded in `p`'s owner marker is alive: live pid AND
    * (when both sides expose it) matching start instant — a recycled
    * pid with a different start time reads as dead. Absent or
    * unreadable marker => not alive (legacy dirs sweep by age alone);
    * legacy pid-only markers keep the pid-liveness check. */
  private[graft] def ownerAlive(p: java.nio.file.Path): Boolean = try {
    val parts = java.nio.file.Files
      .readString(ownerMarker(p)).trim.split('\t')
    val pid = parts(0).toLong
    ProcessHandle.of(pid).map[Boolean] { h =>
      if (!h.isAlive) false
      else (parts.lift(1).map(_.toLong), startMillisOf(h)) match {
        case (Some(recorded), Some(actual)) => recorded == actual
        case _ => true // legacy pid-only marker, or no start time exposed
      }
    }.orElse(false)
  } catch { case _: Throwable => false }

  /** Belt-and-braces for SIGKILLed JVMs whose hook never ran: on first
    * staging use, sweep graft-* staging dirs from OTHER applications
    * untouched for a week — UNLESS their owner-pid marker names a
    * still-live process (r15, advisor fix: a harness alive >7 days, or
    * a dir staged once and only READ since, must not lose its staging
    * to a concurrently starting JVM — dir mtime does not update on
    * reads). Orphaned markers (dir already gone, owner dead) sweep too. */
  private lazy val staleSweep: Unit = {
    try {
      val tmp = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"))
      val cutoff = System.currentTimeMillis() - 7L * 24 * 3600 * 1000
      val ls = java.nio.file.Files.list(tmp)
      try ls.filter(p => p.getFileName.toString.startsWith("graft-")
          && java.nio.file.Files.getLastModifiedTime(p)
            .toMillis < cutoff)
        .forEach { p =>
          try {
            val name = p.getFileName.toString
            if (name.endsWith(".owner")) {
              // an old marker whose dir is gone and owner dead is litter
              val dir = p.resolveSibling(name.stripSuffix(".owner"))
              if (!java.nio.file.Files.exists(dir) && !ownerAlive(dir))
                java.nio.file.Files.deleteIfExists(p)
              ()
            } else if (!ownerAlive(p)) {
              val walk = java.nio.file.Files.walk(p)
              try walk.sorted(java.util.Comparator.reverseOrder())
                .forEach(f => java.nio.file.Files.deleteIfExists(f))
              finally walk.close()
              java.nio.file.Files.deleteIfExists(ownerMarker(p))
              ()
            }
          } catch { case _: Throwable => () }
        }
      finally ls.close()
    } catch { case _: Throwable => () }
  }

  /** Staging dir for a rewrite: keyed by the FULL md5 of the data dir
    * (32-bit hashCode can collide across distinct dirs) and salted with
    * the applicationId so two concurrent harnesses on the same testdata
    * never race each other's overwrite. Same app + same dir -> same path,
    * so within a session the rewrite stays a cheap idempotent overwrite;
    * a shutdown hook deletes this JVM's dirs (and a first-use sweep
    * reclaims week-old orphans from crashed runs), so the salt cannot
    * accumulate tmp garbage across runs. */
  /** Register an externally-created temp dir for the same shutdown-hook
    * cleanup [[stagePath]] dirs get (per-invocation streaming rigs would
    * otherwise accumulate until the week-old sweep of some later JVM). */
  private[graft] def trackTemp(p: String): Unit = {
    stageCleanupHook
    staleSweep
    stagedPaths.add(p)
    writeOwnerMarker(p)
    ()
  }

  private[graft] def stagePath(s: SparkSession, kind: String,
      d: String): String = {
    stageCleanupHook
    staleSweep
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val p = s"${System.getProperty("java.io.tmpdir")}/graft-$kind-" +
      s"${s.sparkContext.applicationId}-$digest"
    stagedPaths.add(p)
    writeOwnerMarker(p)
    p
  }

  /** Q110 compaction target. Test-scale 4 MB; production uses ~1 GB —
    * the knob, not the mechanism, changes. */
  val CompactTargetBytes: Long = 4L << 20

  /** Q110: SMALL-FILE COMPACTION — the other half of lakehouse OPTIMIZE
    * (q107 clusters, this bin-packs). Streaming ingest and per-partition
    * writers leave thousands of KB-sized files; every later scan then
    * pays per-file open/footer cost and the NameNode/listing pays the
    * metadata. The Spark-native shape needs NO shuffle at all: the scan
    * already bin-packs small files into input splits (openCostInBytes
    * accounts each file a minimum share, maxPartitionBytes caps the
    * split), so compaction is read -> coalesce(ceil(bytes/target)) ->
    * write — coalesce is a NARROW dependency gluing scan partitions
    * together, no exchange, no sort, row order within files preserved.
    * Returns (filesBefore, filesAfter, bytes). */
  private[graft] def compact(s: SparkSession, inPath: String,
      outPath: String): (Long, Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p)
      .filter(_.getPath.getName.endsWith(".parquet"))
    val bytes = parts.map(_.getLen).sum
    val target = math.max(1L,
      math.ceil(bytes.toDouble / CompactTargetBytes).toLong)
    s.read.parquet(inPath).coalesce(target.toInt)
      .write.mode("overwrite").parquet(outPath)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(_.getPath.getName.endsWith(".parquet")).toLong
    (parts.length.toLong, after, bytes)
  }

  /** The shared q107/q107b body: curve-cluster the events, write the
    * stats manifest, answer the 2-D box aggregate through manifest-
    * pruned files. Layout INVARIANCE is the contract — both curves
    * share one oracle. */
  private def curveBoxQuery(s: SparkSession, d: String, kind: String,
      hilbert: Boolean): DataFrame = {
    val (ev, ur, vr) = eventRanges(s, d)
    val path = stagePath(s, kind, d)
    curveWrite(ev, col("user_id"), col("value"), ur, vr, path, hilbert)
    writeManifest(s, path)
    // file-level skipping via the manifest, THEN row-group skipping
    // via footers, THEN the exact row filter — three nested sieves,
    // identical results at each level (the oracle hash proves it)
    boxFilter(manifestPrunedRead(s, path, ur, vr), ur, vr)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum4(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** The shared q118/q118b body: fragment the events into 150 small
    * files, OPTIMIZE (bin-pack + curve-cluster + stats manifest in one
    * read/shuffle/write — [[optimize]]), answer the 2-D box aggregate
    * reading only manifest-intersecting files. The curve is a
    * parameter; the oracle runs on the ORIGINAL table either way. */
  private def optimizeBoxQuery(s: SparkSession, d: String, kind: String,
      hilbert: Boolean): DataFrame = {
    val ev = Q.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    val base = stagePath(s, kind, d)
    ev.repartition(150)
      .write.mode("overwrite").parquet(s"$base/frag")
    val (er, vr) = optimize(s, s"$base/frag", s"$base/out",
      "event_id", "value", Seq("event_id", "value"), hilbert)
    val (bel, beh, bvl, bvh) = boxBounds(er, vr)
    boxFilterOn(statsPrunedRead(s, s"$base/out",
        Seq(("event_id", bel, beh), ("value", bvl, bvh))),
        "event_id", "value", er, vr)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum4(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  private val OptimizeBoxOracle: String =
    s"""WITH ev AS (${Q.EVENTS_SQL}),
       |st AS (SELECT CAST(MIN(event_id) AS DOUBLE) AS elo,
       |    CAST(MAX(event_id) AS DOUBLE) AS ehi,
       |    MIN(value) AS vlo, MAX(value) AS vhi FROM ev),
       |box AS (SELECT elo + 0.25 * (ehi - elo) AS bel,
       |    elo + 0.375 * (ehi - elo) AS beh,
       |    vlo + 0.25 * (vhi - vlo) AS bvl,
       |    vlo + 0.375 * (vhi - vlo) AS bvh FROM st)
       |SELECT event_type, COUNT(*) AS n_events,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  ${SUM4("value")} AS sum_value
       |FROM ev, box
       |WHERE CAST(event_id AS DOUBLE) >= bel
       |  AND CAST(event_id AS DOUBLE) < beh
       |  AND value >= bvl AND value < bvh
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  private val CurveBoxOracle: String =
    s"""WITH ev AS (${Q.EVENTS_SQL}),
       |st AS (SELECT CAST(MIN(user_id) AS DOUBLE) AS ulo,
       |    CAST(MAX(user_id) AS DOUBLE) AS uhi,
       |    MIN(value) AS vlo, MAX(value) AS vhi FROM ev),
       |box AS (SELECT ulo + 0.25 * (uhi - ulo) AS bul,
       |    ulo + 0.375 * (uhi - ulo) AS buh,
       |    vlo + 0.25 * (vhi - vlo) AS bvl,
       |    vlo + 0.375 * (vhi - vlo) AS bvh FROM st)
       |SELECT event_type, COUNT(*) AS n_events,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  ${SUM4("value")} AS sum_value
       |FROM ev, box
       |WHERE CAST(user_id AS DOUBLE) >= bul
       |  AND CAST(user_id AS DOUBLE) < buh
       |  AND value >= bvl AND value < bvh
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q107_zorder_layout",
      (s, d) => curveBoxQuery(s, d, "zorder", hilbert = false),
      Some(CurveBoxOracle)),

    // Q107b HILBERT LAYOUT (r17): the clustering family's second curve —
    // Morton has locality cliffs at quadrant boundaries (consecutive
    // z-values can jump across the space, widening a file's min/max
    // envelope); the Hilbert index's consecutive cells are always grid-
    // adjacent, so each range-partitioned file covers one connected
    // blob. Same rewrite shape (one range shuffle + in-partition sort),
    // same manifest, same three-sieve read. The oracle is q107's
    // VERBATIM: clustering must be unobservable in results — only the
    // skip profile may differ (ZOrderSpec measures both curves' pruned
    // file counts side by side, plus the bijection/adjacency laws).
    QueryDef("q107b_hilbert_layout",
      (s, d) => curveBoxQuery(s, d, "hilbert", hilbert = true),
      Some(CurveBoxOracle)),

    // The queryable contract of a compaction is INVARIANCE: the oracle
    // aggregates the ORIGINAL table while the query aggregates the
    // twice-rewritten copy (fragment into ~150 small files, then compact
    // back to a handful) — hash equality proves both rewrites lost,
    // duplicated and corrupted nothing. LakeLayoutSpec pins the physical
    // claims (file counts, no exchange in the compact plan).
    QueryDef("q110_compaction",
      (s, d) => {
        val ev = Q.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        val base = stagePath(s, "compact", d)
        ev.repartition(150)
          .write.mode("overwrite").parquet(s"$base/frag")
        compact(s, s"$base/frag", s"$base/out")
        s.read.parquet(s"$base/out")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            sum4(col("value")).as("sum_value"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (${Q.EVENTS_SQL})
             |SELECT event_type, COUNT(*) AS n_events,
             |  COUNT(DISTINCT user_id) AS n_users,
             |  ${SUM4("value")} AS sum_value
             |FROM ev
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Q118 the COMPOSED maintenance loop (r14): q110 fragments-to-few
    // and q107 cluster-plus-stats as ONE OPTIMIZE pass, exercised on a
    // SECOND column pair (event_id x value) so the manifest generality
    // is oracle-covered, not just spec-covered. The query fragments
    // events into 150 small files, optimizes (bin-pack + z-cluster +
    // stats manifest in one read/shuffle/write), then answers a 2-D box
    // aggregate reading ONLY manifest-intersecting files; the oracle
    // runs the same box aggregate on the ORIGINAL table — hash equality
    // proves the full loop (fragment, compact, cluster, prune) lost,
    // duplicated and corrupted nothing.
    QueryDef("q118_optimize_layout",
      (s, d) => optimizeBoxQuery(s, d, "optimize", hilbert = false),
      Some(OptimizeBoxOracle)),

    // Q118b OPTIMIZE THROUGH THE HILBERT CURVE (r18): the full
    // maintenance loop (fragment -> bin-pack + cluster + stats manifest
    // -> manifest-pruned box read) with the Hilbert index as the
    // clustering curve — q107b proved the curve, this proves OPTIMIZE
    // is curve-generic. Oracle = q118's VERBATIM (the curve must be
    // unobservable in results; only the skip profile may differ —
    // ZOrderSpec measures the quadrant-straddling box where Hilbert's
    // lack of locality cliffs genuinely wins).
    QueryDef("q118b_optimize_hilbert",
      (s, d) => optimizeBoxQuery(s, d, "optimizeh", hilbert = true),
      Some(OptimizeBoxOracle)),

    // Q124 METADATA-ONLY COUNT (r14): COUNT(*) under a 2-D box answered
    // from the file-stats manifest — fully-contained files contribute
    // their manifest row counts with ZERO data IO; only edge-straddling
    // files are scanned with the exact residual filter (Iceberg/Delta's
    // metadata-query pattern; the full-table count reads no data files
    // at all). Three boxes of growing size share one z-layout; the
    // oracle recomputes each count directly from the raw table, so hash
    // equality proves the containment algebra AND the manifest counts.
    // LakeLayoutSpec pins the IO claim itself (interior files metadata-
    // counted, only perimeter files scanned, full box scans nothing).
    QueryDef("q124_metadata_count",
      (s, d) => {
        val (ev, ur, vr) = eventRanges(s, d)
        val path = stagePath(s, "metacount", d)
        zOrderWrite(ev, col("user_id"), col("value"), ur, vr, path)
        writeManifest(s, path)
        val (bul, buh, bvl, bvh) = boxBounds(ur, vr)
        val boxes = Seq(
          1 -> Seq(("user_id", bul, buh), ("value", bvl, bvh)),
          2 -> Seq(("user_id", ur._1, ur._1 + 0.5 * (ur._2 - ur._1)),
            ("value", vr._1, vr._1 + 0.5 * (vr._2 - vr._1))),
          3 -> Seq(("user_id", ur._1, ur._2 + 1.0),
            ("value", vr._1, vr._2 + 1.0)))
        val sp = s
        import sp.implicits._
        boxes.map { case (id, bs) =>
          (id, metadataCount(s, path, bs)._1)
        }.toDF("box_id", "n_rows").orderBy("box_id")
      },
      Some(s"""WITH ev AS (${Q.EVENTS_SQL}),
             |st AS (SELECT CAST(MIN(user_id) AS DOUBLE) AS ulo,
             |    CAST(MAX(user_id) AS DOUBLE) AS uhi,
             |    MIN(value) AS vlo, MAX(value) AS vhi FROM ev),
             |boxes AS (
             |  SELECT 1 AS box_id, ulo + 0.25 * (uhi - ulo) AS bul,
             |    ulo + 0.375 * (uhi - ulo) AS buh,
             |    vlo + 0.25 * (vhi - vlo) AS bvl,
             |    vlo + 0.375 * (vhi - vlo) AS bvh FROM st
             |  UNION ALL SELECT 2, ulo, ulo + 0.5 * (uhi - ulo),
             |    vlo, vlo + 0.5 * (vhi - vlo) FROM st
             |  UNION ALL SELECT 3, ulo, uhi + 1, vlo, vhi + 1 FROM st)
             |SELECT CAST(b.box_id AS INT) AS box_id,
             |  COUNT(e.value) AS n_rows
             |FROM boxes b LEFT JOIN ev e
             |  ON CAST(e.user_id AS DOUBLE) >= b.bul
             |  AND CAST(e.user_id AS DOUBLE) < b.buh
             |  AND e.value >= b.bvl AND e.value < b.bvh
             |GROUP BY b.box_id ORDER BY box_id""".stripMargin)))
}
