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

  /** Cluster `df` by the Z-curve over (x, y) scaled from the given
    * ranges, writing `ZFiles` parquet files to `path`. The z column
    * rides along in the files (file-level zv min/max documents the
    * clustering; droppable). */
  private[graft] def zOrderWrite(df: DataFrame, x: Column, y: Column,
      xr: (Double, Double), yr: (Double, Double), path: String): Unit =
    df.withColumn("zv", ZOrder.interleave16(
        ZOrder.norm16(x, xr._1, xr._2), ZOrder.norm16(y, yr._1, yr._2)))
      .repartitionByRange(ZFiles, col("zv"))
      .sortWithinPartitions("zv")
      .write.mode("overwrite").parquet(path)

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

  /** The q107 box filter over a copy of events: the exact double-typed
    * box plus the widened integral pushdown guard on user_id. */
  private[graft] def boxFilter(df: DataFrame,
      ur: (Double, Double), vr: (Double, Double)): DataFrame = {
    val (bul, buh, bvl, bvh) = boxBounds(ur, vr)
    df.filter(col("user_id") >= lit(math.floor(bul).toLong) &&
        col("user_id") < lit(math.ceil(buh).toLong))   // pushable superset
      .filter(col("user_id").cast(DoubleType) >= bul &&
        col("user_id").cast(DoubleType) < buh &&
        col("value") >= bvl && col("value") < bvh)
  }

  /** FILE-skipping manifest for the z layout (r13, the Delta add-file
    * stats analogue): one row per output file with min/max of BOTH box
    * columns (plus the z-value range, documentation of the clustering).
    * Stored as parquet under `_manifest` INSIDE the layout dir — the
    * leading underscore hides it from every normal parquet read of the
    * directory. Parquet footer stats skip ROW GROUPS after the scan has
    * listed and opened every file; the manifest prunes FILES before the
    * scan ever lists them — at 100 TB that is the difference between
    * "open 100k footers" and "read one 16-row table". */
  private[graft] def writeManifest(s: SparkSession, path: String): Unit =
    s.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("user_id")).as("umin"), max(col("user_id")).as("umax"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"),
        min(col("zv")).as("zmin"), max(col("zv")).as("zmax"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")

  /** Files whose (user_id, value) ranges intersect the box, plus the
    * total file count (spec observability). A file drops out exactly
    * when its stats PROVE it holds no qualifying row, so pruning can
    * never change results — and a pruning bug would surface as an
    * oracle hash mismatch on q107. */
  private[graft] def manifestPrunedFiles(s: SparkSession, path: String,
      ur: (Double, Double), vr: (Double, Double)): (Seq[String], Long) = {
    val (bul, buh, bvl, bvh) = boxBounds(ur, vr)
    val m = s.read.parquet(s"$path/_manifest")
    val keep = m.filter(col("umax").cast(DoubleType) >= bul &&
        col("umin").cast(DoubleType) < buh &&
        col("vmax") >= bvl && col("vmin") < bvh)
      .select("file").collect().map(_.getString(0)).toSeq
    (keep, m.count())
  }

  /** Read the z layout through its manifest: only intersecting FILES are
    * handed to the scan. Empty intersection -> an empty frame with the
    * layout's schema. */
  private[graft] def manifestPrunedRead(s: SparkSession, path: String,
      ur: (Double, Double), vr: (Double, Double)): DataFrame = {
    val (keep, _) = manifestPrunedFiles(s, path, ur, vr)
    if (keep.isEmpty) s.read.parquet(path).limit(0)
    else s.read.parquet(keep: _*)
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
        } catch { case _: Throwable => () }
      }
    }))
  /** Belt-and-braces for SIGKILLed JVMs whose hook never ran: on first
    * staging use, sweep graft-* staging dirs from OTHER applications
    * untouched for a week (old enough that no live harness owns them). */
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
            val walk = java.nio.file.Files.walk(p)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.deleteIfExists(f))
            finally walk.close()
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
  private[graft] def stagePath(s: SparkSession, kind: String,
      d: String): String = {
    stageCleanupHook
    staleSweep
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val p = s"${System.getProperty("java.io.tmpdir")}/graft-$kind-" +
      s"${s.sparkContext.applicationId}-$digest"
    stagedPaths.add(p)
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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q107_zorder_layout",
      (s, d) => {
        val (ev, ur, vr) = eventRanges(s, d)
        val path = stagePath(s, "zorder", d)
        zOrderWrite(ev, col("user_id"), col("value"), ur, vr, path)
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
      },
      Some(s"""WITH ev AS (${Q.EVENTS_SQL}),
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
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

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
             |GROUP BY event_type ORDER BY event_type""".stripMargin)))
}
