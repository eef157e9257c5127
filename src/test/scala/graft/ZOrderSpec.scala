package graft

import graft.functions.ZOrder
import graft.queries.Layout
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q107 Z-order layout: the bit-interleave law against a plain-Scala
  * reference, layout invariance of the rewrite, and the point of the
  * whole exercise — MEASURED data skipping: the same 2-D box predicate
  * over the same rows reads a fraction of the data from the z-clustered
  * layout vs a hash-distributed one.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def withTempDir[A](f: String => A): A = {
    val d = java.nio.file.Files.createTempDirectory("graft-zspec").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete()
      }
      rm(d)
    }
  }

  test("interleave16 matches a plain-Scala Morton reference") {
    def spreadRef(v: Long): Long = {
      var x = v & 0xFFFFL
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      x = (x | (x << 1)) & 0x55555555L
      x
    }
    val rnd = new scala.util.Random(7)
    val pts = Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (1L, 2L)) ++
      (1 to 60).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val sp = spark
    import sp.implicits._
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave16(col("x"), col("y")).as("zv"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      val want = spreadRef(x) | (spreadRef(y) << 1)
      assert(got((x, y)) == want, s"interleave($x, $y): ${got((x, y))} != $want")
    }
  }

  test("bloom session functions: no false negatives, mostly true negatives") {
    // the registration contract behind q106, pinned without its corpus:
    // every inserted key must test positive (a bloom has no false
    // negatives); absent keys test negative except ~fpp
    graft.functions.GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    val items = (1L to 500L).toDF("v")
    val bloom = items
      .select(expr("bloom_agg(xxhash64(v), 500L, 4800L)").as("bf"))
      .head.getAs[Array[Byte]](0)
    val inserted = items
      .filter(call_function("bloom_might_contain", lit(bloom),
        xxhash64(col("v"))))
      .count()
    assert(inserted == 500, s"bloom dropped inserted keys: $inserted/500")
    val absent = (10001L to 10500L).toDF("v")
      .filter(call_function("bloom_might_contain", lit(bloom),
        xxhash64(col("v"))))
      .count()
    assert(absent < 50, s"false-positive rate far over 1%: $absent/500")
  }

  test("interleave roundtrip: z-values decode back to their coordinates") {
    def deinterleave(z: Long): (Long, Long) = {
      def compact(v: Long): Long = {
        var x = v & 0x55555555L
        x = (x | (x >> 1)) & 0x33333333L
        x = (x | (x >> 2)) & 0x0F0F0F0FL
        x = (x | (x >> 4)) & 0x00FF00FFL
        (x | (x >> 8)) & 0x0000FFFFL
      }
      (compact(z), compact(z >> 1))
    }
    val rnd = new scala.util.Random(19)
    val pts = (1 to 200).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val sp = spark
    import sp.implicits._
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave16(col("x"), col("y")).as("zv"))
      .collect()
    got.foreach { r =>
      assert(deinterleave(r.getLong(2)) == ((r.getLong(0), r.getLong(1))),
        s"roundtrip failed for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("the rewrite is layout-invariant: full read-back equals the source") {
    withTempDir { tmp =>
      val (ev, ur, vr) = Layout.eventRanges(spark, dir)
      Layout.zOrderWrite(ev, col("user_id"), col("value"), ur, vr, s"$tmp/z")
      val back = spark.read.parquet(s"$tmp/z")
        .select("event_id", "user_id", "event_type", "value")
      assert(back.count() == ev.count())
      assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty,
        "z-order rewrite changed the row multiset")
    }
  }

  test("file manifest prunes a strict subset of files; results unchanged") {
    withTempDir { tmp =>
      val (ev, ur, vr) = Layout.eventRanges(spark, dir)
      Layout.zOrderWrite(ev, col("user_id"), col("value"), ur, vr, s"$tmp/z")
      Layout.writeManifest(spark, s"$tmp/z")
      // the manifest is hidden from normal reads of the layout dir
      assert(spark.read.parquet(s"$tmp/z").columns.toSet
        .contains("event_id"), "layout read must see data, not manifest")
      val (keep, total) = Layout.manifestPrunedFiles(spark, s"$tmp/z", ur, vr)
      assert(total == Layout.ZFiles.toLong,
        s"manifest must carry one row per output file: $total")
      assert(keep.nonEmpty && keep.size < Layout.ZFiles,
        s"box must prune FILES outright on a z layout: kept ${keep.size}/$total")
      // pruning changes which files the scan LISTS, never the answer
      val full = Layout.boxFilter(spark.read.parquet(s"$tmp/z"), ur, vr)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      val pruned = Layout
        .boxFilter(Layout.manifestPrunedRead(spark, s"$tmp/z", ur, vr), ur, vr)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(pruned == full, "manifest pruning changed the box result")
    }
  }

  test("the box scan reads a fraction of the rows a hash layout reads") {
    withTempDir { tmp =>
      val (ev, ur, vr) = Layout.eventRanges(spark, dir)
      Layout.zOrderWrite(ev, col("user_id"), col("value"), ur, vr, s"$tmp/z")
      // control: identical rows, identical file count, hash-distributed —
      // every file's (user_id, value) min/max spans the full space
      ev.repartition(Layout.ZFiles).write.parquet(s"$tmp/hash")

      def scanned(path: String): (Long, Long) = {
        val df = Layout.boxFilter(spark.read.parquet(path), ur, vr)
        val result = df.count()
        val scans = PlanWalk.collectAll(PlanWalk.executedPlanOf(df))
          .collect { case f: FileSourceScanExec => f }
        assert(scans.nonEmpty, "no parquet scan in the box plan")
        (scans.map(_.metrics("numOutputRows").value).sum, result)
      }
      val (zRead, zRows) = scanned(s"$tmp/z")
      val (hRead, hRows) = scanned(s"$tmp/hash")
      val total = ev.count()
      assert(zRows == hRows, "both layouts must yield identical results")
      // the hash layout can skip nothing: its scan emits ~every row that
      // survives the pushed predicates row-group-wide; the z layout must
      // skip most row groups outright
      assert(zRead * 2 <= hRead,
        s"z-order skipped too little: z=$zRead hash=$hRead total=$total")
      assert(zRead * 2 <= total,
        s"z-order scan should read under half the table: $zRead of $total")
    }
  }

  // ---- Hilbert curve (r17, q107b) ----

  /** Plain-Scala xy2d reference (16-bit grid): mask per level, step
    * count, reflect-in-full-grid + transpose — the algorithm
    * ZOrder.hilbert16 expresses as one aggregate() fold. */
  private def hilbertRef(x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 65535L - x; y = 65535L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Reference inverse (d2xy): rotate with the LEVEL size, then offset —
    * the Wikipedia pairing of hilbertRef. */
  private def hilbertInv(d0: Long): (Long, Long) = {
    var (x, y, t) = (0L, 0L, d0)
    var s = 1L
    while (s < 65536L) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("hilbert16 matches the plain-Scala reference; the reference is a " +
    "bijection with GRID-ADJACENT consecutive indices (the locality " +
    "property Morton lacks)") {
    val rnd = new scala.util.Random(43)
    // reference self-consistency: inverse roundtrip (bijection) and
    // adjacency |dx|+|dy| == 1 for consecutive d — the Hilbert law
    (1 to 2000).foreach { _ =>
      val d = math.abs(rnd.nextLong()) % (65536L * 65536L - 1)
      val (x, y) = hilbertInv(d)
      assert(hilbertRef(x, y) == d, s"roundtrip broke at d=$d")
      val (x2, y2) = hilbertInv(d + 1)
      assert(math.abs(x2 - x) + math.abs(y2 - y) == 1,
        s"consecutive indices not grid-adjacent at d=$d: " +
          s"($x,$y) -> ($x2,$y2)")
    }
    // the Column implementation == the reference
    val pts = Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L),
      (1L, 2L)) ++ (1 to 200).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val sp = spark
    import sp.implicits._
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.hilbert16(col("x"), col("y")).as("hv"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == hilbertRef(x, y),
        s"hilbert16($x, $y): ${got((x, y))} != ${hilbertRef(x, y)}")
    }
    // NULL propagation (the norm16 contract carries through)
    val nul = Seq((Some(1L), Option.empty[Long]))
      .toDF("x", "y")
      .select(ZOrder.hilbert16(col("x"), col("y")).as("hv"))
      .collect().head
    assert(nul.isNullAt(0), "NULL coordinate must yield NULL index")
  }

  test("measured skip, Hilbert vs Morton: both curves prune most files " +
    "for the q107 box; layout invariance holds for both") {
    withTempDir { tmp =>
      val (ev, ur, vr) = Layout.eventRanges(spark, dir)
      Layout.curveWrite(ev, col("user_id"), col("value"), ur, vr,
        s"$tmp/morton", hilbert = false)
      Layout.curveWrite(ev, col("user_id"), col("value"), ur, vr,
        s"$tmp/hilbert", hilbert = true)
      Layout.writeManifest(spark, s"$tmp/morton")
      Layout.writeManifest(spark, s"$tmp/hilbert")
      val (mKeep, mTotal) =
        Layout.manifestPrunedFiles(spark, s"$tmp/morton", ur, vr)
      val (hKeep, hTotal) =
        Layout.manifestPrunedFiles(spark, s"$tmp/hilbert", ur, vr)
      info(s"q107 box file skip — morton keeps ${mKeep.size}/$mTotal, " +
        s"hilbert keeps ${hKeep.size}/$hTotal")
      // both curves must genuinely skip (the box covers 1/64 of the 2-D
      // space; a curve that keeps over half the files is not clustering)
      assert(hKeep.size * 2 <= hTotal,
        s"hilbert pruned too little: kept ${hKeep.size} of $hTotal")
      assert(mKeep.size * 2 <= mTotal,
        s"morton pruned too little: kept ${mKeep.size} of $mTotal")
      // hilbert has no quadrant cliffs: it must be at least as tight as
      // morton up to one file of slack on this box
      assert(hKeep.size <= mKeep.size + 1,
        s"hilbert (${hKeep.size}) much looser than morton " +
          s"(${mKeep.size}) — check the curve arithmetic")
      // layout invariance: identical box results from both layouts
      val mRows = Layout.boxFilter(
        spark.read.parquet(s"$tmp/morton"), ur, vr)
        .drop("zv").collect().map(_.toSeq).toSet
      val hRows = Layout.boxFilter(
        spark.read.parquet(s"$tmp/hilbert"), ur, vr)
        .drop("zv").collect().map(_.toSeq).toSet
      assert(mRows == hRows, "the two layouts disagree on box contents")
    }
  }

  test("quadrant-straddling box (r18): Morton's locality cliff — a box " +
    "crossing the x midline keeps MORE files under Morton than under " +
    "Hilbert, whose consecutive cells are always grid-adjacent") {
    withTempDir { tmp =>
      val (ev, ur, vr) = Layout.eventRanges(spark, dir)
      Layout.curveWrite(ev, col("user_id"), col("value"), ur, vr,
        s"$tmp/morton", hilbert = false)
      Layout.curveWrite(ev, col("user_id"), col("value"), ur, vr,
        s"$tmp/hilbert", hilbert = true)
      Layout.writeManifest(spark, s"$tmp/morton")
      Layout.writeManifest(spark, s"$tmp/hilbert")
      // a THIN box straddling the x midline inside the lower y half:
      // Morton's z-value jumps across half the key space at the x-mid
      // bit flip, so the box's rows land in two DISTANT z-ranges (two
      // groups of files); Hilbert crosses that seam through adjacent
      // cells. Exact-binary fractions.
      def frac(r: (Double, Double), f: Double): Double =
        r._1 + f * (r._2 - r._1)
      val boxes = Seq(
        ("user_id", frac(ur, 0.4375), frac(ur, 0.5625)),
        ("value", frac(vr, 0.25), frac(vr, 0.3125)))
      val (mKeep, mTotal) =
        Layout.statsPrunedFiles(spark, s"$tmp/morton", boxes)
      val (hKeep, hTotal) =
        Layout.statsPrunedFiles(spark, s"$tmp/hilbert", boxes)
      info(s"straddle box — morton keeps ${mKeep.size}/$mTotal, " +
        s"hilbert keeps ${hKeep.size}/$hTotal")
      assert(hKeep.size < mKeep.size,
        s"hilbert (${hKeep.size}) must beat morton (${mKeep.size}) on " +
          "the quadrant-straddling box — the curve's whole advantage")
      // both layouts agree on the box CONTENTS (invariance)
      val m = Layout.statsPrunedRead(spark, s"$tmp/morton", boxes)
      val h = Layout.statsPrunedRead(spark, s"$tmp/hilbert", boxes)
      def rows(df: org.apache.spark.sql.DataFrame) = {
        val (bul, buh) = (boxes(0)._2, boxes(0)._3)
        val (bvl, bvh) = (boxes(1)._2, boxes(1)._3)
        df.filter(col("user_id").cast("double") >= bul &&
            col("user_id").cast("double") < buh &&
            col("value") >= bvl && col("value") < bvh)
          .drop("zv").collect().map(_.toSeq).toSet
      }
      assert(rows(m) == rows(h),
        "the two layouts disagree on straddle-box contents")
    }
  }
}
