package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-lake output layout: hive-partitioned parquet writes with
  * partition pruning on read — how a 100TB training corpus is laid out so
  * per-language / per-source jobs touch only their slice.
  */
class LakeLayoutSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def withTempDir[A](f: String => A): A = {
    val d = java.nio.file.Files.createTempDirectory("graft-lake").toFile
    try f(d.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete()
      }
      rm(d)
    }
  }

  test("partitionBy(lang) writes hive layout; reads prune to one partition") {
    val spark = TestSpark.spark
    withTempDir { out =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.write.partitionBy("lang").mode("overwrite").parquet(s"$out/docs")

      // hive directory layout on disk
      val partDirs = new java.io.File(s"$out/docs").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(partDirs.forall(_.startsWith("lang=")))
      assert(partDirs.size >= 3)

      // a lang filter becomes a PartitionFilter: only that directory is read
      val en = spark.read.parquet(s"$out/docs").filter(col("lang") === "en")
      en.collect()
      val scan = en.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
      assert(scan.partitionFilters.nonEmpty, "lang filter not pushed to partitions")
      val enCount = en.count()
      val directCount = docs.filter(col("lang") === "en").count()
      assert(enCount == directCount && enCount > 0)

      // round-trip fidelity: full read-back equals the source
      val back = spark.read.parquet(s"$out/docs")
      assert(back.count() == docs.count())
      assert(back.select(sum(col("n_chars"))).collect().head.getLong(0) ==
        docs.select(sum(col("n_chars"))).collect().head.getLong(0))
    }
  }

  test("sortWithinPartitions gives run-length-friendly parquet ordering") {
    val spark = TestSpark.spark
    withTempDir { out =>
      spark.read.parquet(s"$dir/lineitem.parquet")
        .repartition(2, col("l_returnflag"))
        .sortWithinPartitions("l_returnflag", "l_orderkey")
        .write.mode("overwrite").parquet(s"$out/li")
      val back = spark.read.parquet(s"$out/li")
      assert(back.count() ==
        spark.read.parquet(s"$dir/lineitem.parquet").count())
    }
  }

  test("q110 compaction: file count collapses, rows survive, no exchange") {
    val spark = TestSpark.spark
    withTempDir { out =>
      val ev = Q.events(spark, dir)
        .select("event_id", "user_id", "event_type", "value")
      ev.repartition(80).write.parquet(s"$out/frag")
      val (before, after, bytes) =
        graft.queries.Layout.compact(spark, s"$out/frag", s"$out/compact")
      assert(before == 80, s"fragment rig wrote $before files")
      val expect = math.max(1L, math.ceil(
        bytes.toDouble / graft.queries.Layout.CompactTargetBytes).toLong)
      assert(after == expect && after < before,
        s"compaction wrote $after files (expected $expect, before $before)")
      // the row MULTISET survives both rewrites
      val back = spark.read.parquet(s"$out/compact")
      assert(back.count() == ev.count())
      assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty,
        "compaction changed the row multiset")
      // and the compact dataflow itself is shuffle-free: scan-side split
      // packing + a narrow coalesce, never an exchange
      val plan = PlanWalk.executedPlanOf(
        spark.read.parquet(s"$out/frag").coalesce(expect.toInt))
      assert(!PlanWalk.collectAll(plan).exists(
          _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
        s"compaction plan shuffles:\n$plan")
    }
  }

  test("schema evolution: mergeSchema unions corpus generations") {
    // a long-lived corpus accumulates columns (a new quality score, a new
    // provenance field); readers must see the union schema with NULLs for
    // rows written before the column existed — without rewriting 100 TB
    val spark = TestSpark.spark
    withTempDir { out =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.select("doc_id", "lang").where(col("doc_id") < 100)
        .write.parquet(s"$out/gen=0")
      docs.select("doc_id", "lang", "n_chars")
        .where(col("doc_id") >= 100 && col("doc_id") < 200)
        .write.parquet(s"$out/gen=1")
      val merged = spark.read.option("mergeSchema", "true").parquet(out)
      assert(merged.columns.toSet ==
        Set("doc_id", "lang", "n_chars", "gen"))
      assert(merged.count() == 200)
      // old generation reads the new column as NULL, new one fully set
      assert(merged.where(col("gen") === 0 &&
        col("n_chars").isNotNull).count() == 0)
      assert(merged.where(col("gen") === 1 &&
        col("n_chars").isNull).count() == 0)
      // pruning still works through the merged schema
      val one = merged.where(col("gen") === 1)
      val scans = one.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty && scans.forall(
        _.partitionFilters.nonEmpty), "gen filter must prune partitions")
    }
  }

  test("q118 optimize: one pass compacts 150 files to ZFiles, clusters, and the (event_id, value) manifest prunes losslessly") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    withTempDir { base =>
      val ev = graft.Q.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      ev.repartition(150).write.mode("overwrite").parquet(s"$base/frag")
      val frags = new java.io.File(s"$base/frag").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(frags > 100, s"fragmentation rig produced only $frags files")
      val (er, vr) = graft.queries.Layout.optimize(spark, s"$base/frag",
        s"$base/out", "event_id", "value", Seq("event_id", "value"))
      // COMPACTION: the small-file pile collapsed to the layout target
      val outFiles = new java.io.File(s"$base/out").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(outFiles <= graft.queries.Layout.ZFiles,
        s"optimize left $outFiles files")
      // INVARIANCE: full read-back equals the source multiset
      val back = spark.read.parquet(s"$base/out")
        .select("event_id", "user_id", "event_type", "value")
      assert(back.count() == ev.count())
      assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty,
        "optimize changed the row multiset")
      // PRUNING on the SECOND column pair: strict subset of files,
      // identical box answer
      val (bel, beh, bvl, bvh) = graft.queries.Layout.boxBounds(er, vr)
      val boxes = Seq(("event_id", bel, beh), ("value", bvl, bvh))
      val (keep, total) = graft.queries.Layout.statsPrunedFiles(spark,
        s"$base/out", boxes)
      assert(total == outFiles.toLong,
        s"manifest rows $total != data files $outFiles")
      assert(keep.nonEmpty && keep.size < outFiles,
        s"box must prune files on the optimized layout: ${keep.size}/$total")
      val full = graft.queries.Layout.boxFilterOn(
          spark.read.parquet(s"$base/out"), "event_id", "value", er, vr)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      val pruned = graft.queries.Layout.boxFilterOn(
          graft.queries.Layout.statsPrunedRead(spark, s"$base/out", boxes),
          "event_id", "value", er, vr)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(pruned == full, "manifest pruning changed the box result")
    }
  }

  test("q124 metadata count: interior files counted from the manifest, " +
    "only perimeter files scanned, full box touches zero data files") {
    val spark = TestSpark.spark
    withTempDir { base =>
      val (ev, ur, vr) = graft.queries.Layout.eventRanges(spark, dir)
      graft.queries.Layout.zOrderWrite(ev, col("user_id"), col("value"),
        ur, vr, s"$base/z")
      graft.queries.Layout.writeManifest(spark, s"$base/z")
      def exact(bs: Seq[(String, Double, Double)]): Long =
        bs.foldLeft(ev) { case (df, (c, lo, hi)) =>
          df.filter(col(c).cast("double") >= lo &&
            col(c).cast("double") < hi)
        }.count()
      // the half box: big enough that z-clustering yields interior files
      val half = Seq(
        ("user_id", ur._1, ur._1 + 0.5 * (ur._2 - ur._1)),
        ("value", vr._1, vr._1 + 0.5 * (vr._2 - vr._1)))
      val (n, metaFiles, scanFiles, total) =
        graft.queries.Layout.metadataCount(spark, s"$base/z", half)
      assert(n === exact(half), "metadata count != exact count")
      assert(metaFiles + scanFiles < total,
        "the box must exclude at least one file outright")
      assert(scanFiles < total,
        "scanning every file means the metadata path did nothing")
      // the full box: EVERY file fully contained — zero data IO
      val fullBox = Seq(("user_id", ur._1, ur._2 + 1.0),
        ("value", vr._1, vr._2 + 1.0))
      val (nf, mf, sf, tf) =
        graft.queries.Layout.metadataCount(spark, s"$base/z", fullBox)
      assert(nf === ev.count())
      assert(sf === 0L, s"full-table count scanned $sf files")
      assert(mf === tf, "every file must be metadata-counted")
      // law under arbitrary boxes: metadata+perimeter == exact
      val rnd = new scala.util.Random(7)
      (1 to 5).foreach { _ =>
        val f1 = rnd.nextDouble(); val f2 = rnd.nextDouble()
        val g1 = rnd.nextDouble(); val g2 = rnd.nextDouble()
        val bs = Seq(
          ("user_id", ur._1 + math.min(f1, f2) * (ur._2 - ur._1),
            ur._1 + math.max(f1, f2) * (ur._2 - ur._1)),
          ("value", vr._1 + math.min(g1, g2) * (vr._2 - vr._1),
            vr._1 + math.max(g1, g2) * (vr._2 - vr._1)))
        assert(graft.queries.Layout.metadataCount(
          spark, s"$base/z", bs)._1 === exact(bs))
      }
    }
  }

  test("owner markers record pid + JVM start time: live self is alive, " +
    "a recycled-pid marker (wrong start time) reads dead, legacy " +
    "pid-only markers keep the pid check") {
    val d = java.nio.file.Files.createTempDirectory("graft-owner")
    val marker = graft.queries.Layout.ownerMarker(d)
    val self = ProcessHandle.current()
    val start = self.info().startInstant()
    assume(start.isPresent, "platform exposes no process start time")
    // current format: pid TAB startMillis -> alive
    java.nio.file.Files.writeString(marker,
      s"${self.pid()}\t${start.get().toEpochMilli}")
    assert(graft.queries.Layout.ownerAlive(d))
    // same (live) pid but a different recorded start time = the marker's
    // owner died and the pid was recycled -> dead
    java.nio.file.Files.writeString(marker,
      s"${self.pid()}\t${start.get().toEpochMilli - 123456}")
    assert(!graft.queries.Layout.ownerAlive(d))
    // legacy pid-only marker: pid-liveness alone decides
    java.nio.file.Files.writeString(marker, self.pid().toString)
    assert(graft.queries.Layout.ownerAlive(d))
    // garbage / absent markers read dead
    java.nio.file.Files.writeString(marker, "not-a-pid")
    assert(!graft.queries.Layout.ownerAlive(d))
    java.nio.file.Files.deleteIfExists(marker)
    assert(!graft.queries.Layout.ownerAlive(d))
    java.nio.file.Files.deleteIfExists(d)
  }
}
