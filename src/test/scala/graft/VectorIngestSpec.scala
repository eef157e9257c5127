package graft

import graft.queries.{TextSearch, VectorIngest}
import graft.streaming.IngestIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q114 vector index upsert beyond oracle parity: the incremental-build
  * law (two-phase frozen-centroid build == one-shot assignment of the
  * full corpus against the same centroids, row for row), the
  * batch-proportional merge (phase B touches only ITS buckets), and
  * determinism across runs.
  */
class VectorIngestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("incremental build equals the one-shot frozen-centroid assignment row for row") {
    val sp = spark
    graft.functions.GraftFunctions.register(sp)
    // run the two-phase build (also materializes the state dir)
    VectorIngest.upsertProbe(sp, dir).collect()
    val state = graft.queries.Layout.stagePath(sp, "vecidx", dir)
    val incremental = IngestIndex.currentTable(sp, state, "vec")
      .select("vec_id", "cid", "rn")
      .collect().map(_.toSeq).toSet

    val e = TextSearch.embNonNull(sp, dir)
    val half = e.count() / 2
    val cents = graft.BroadcastBounds.bounded("ivf-centroids")(
      TextSearch.trainCents(sp, e.filter(col("vec_id") < half),
        TextSearch.ivfCells(half)))
    val oneShot = TextSearch.nearestCells(e, cents)
      .filter(col("rn") <= TextSearch.IvfProbes)
      .select("vec_id", "cid", "rn")
      .collect().map(_.toSeq).toSet
    assert(incremental == oneShot,
      "two-phase upsert index diverged from the one-shot assignment")
  }

  test("the upsert touches only the new batch's buckets; probe is deterministic") {
    val sp = spark
    val a = VectorIngest.upsertProbe(sp, dir).collect().toSeq
    val b = VectorIngest.upsertProbe(sp, dir).collect().toSeq
    assert(a == b, "q114 probe differs across runs")
    val state = graft.queries.Layout.stagePath(sp, "vecidx", dir)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    val n = IngestIndex.numBuckets(sp)
    val e = TextSearch.embNonNull(sp, dir)
    val half = e.count() / 2
    def bucketDirs(v: Int): Set[Int] = {
      val p = new org.apache.hadoop.fs.Path(s"$state/v$v/vec")
      fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("bkt=")).map(_.drop(4).toInt).toSet
    }
    val bBuckets = e.filter(col("vec_id") >= half)
      .select(IngestIndex.bucketCol("vec", n).as("bkt"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(bucketDirs(2) == bBuckets,
      s"v2 must hold exactly phase B's key buckets: ${bucketDirs(2)} vs $bBuckets")
  }

  test("q114b: the stream equals the two-phase build, and resumes across invocations") {
    val sp = spark
    val conf = sp.sparkContext.hadoopConfiguration
    val batchResult = VectorIngest.upsertProbe(sp, dir).collect().toSeq

    // the crawl lands the initial corpus first; the second wave arrives
    // after the first invocation finished — the stream must train at
    // trigger 0, freeze, and resume the upsert from the checkpoint
    val full = s"${java.nio.file.Files.createTempDirectory("graft-vecs")}/full"
    graft.streaming.VectorStream.stageReplay(sp, dir, full)
    val replay = s"${java.nio.file.Files.createTempDirectory("graft-vecr")}/replay"
    val state = s"${java.nio.file.Files.createTempDirectory("graft-vecst")}/state"
    val rdir = new org.apache.hadoop.fs.Path(replay)
    val fs = rdir.getFileSystem(conf)
    fs.mkdirs(rdir)
    def land(k: Int): Unit = {
      val name = f"batch-$k%04d.parquet"
      val dst = new org.apache.hadoop.fs.Path(rdir, name)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$full/$name"), fs, dst, false, conf)
      graft.streaming.ReplayStage.pinFile(fs, dst, k)
    }
    land(0)
    val afterA = graft.streaming.VectorStream.ingested(sp, replay, state)
      .collect()
    assert(afterA.nonEmpty, "probe over the initial corpus alone is empty")
    land(1)
    val resumed = graft.streaming.VectorStream.ingested(sp, replay, state)
      .collect().toSeq
    assert(resumed == batchResult,
      "resumed streaming ingest diverged from the two-phase build")
  }

  test("q114c delete law: upsert-then-delete == never-inserted; absent-id delete is a no-op") {
    val sp = spark
    graft.functions.GraftFunctions.register(sp)
    // the full lifecycle state: build + tombstone delete
    VectorIngest.deleteProbe(sp, dir).collect()
    val state = graft.queries.Layout.stagePath(sp, "vecdel", dir)
    def indexRows(st: String): Set[Seq[Any]] =
      IngestIndex.currentTable(sp, st, "vec")
        .select("vec_id", "cid", "rn").collect().map(_.toSeq).toSet
    val afterDelete = indexRows(state)

    // never-inserted: one-shot assignment of the SURVIVORS against the
    // same frozen (first-half-trained) centroids
    val e = TextSearch.embNonNull(sp, dir)
    val half = e.count() / 2
    val cents = graft.BroadcastBounds.bounded("ivf-centroids")(
      TextSearch.trainCents(sp, e.filter(col("vec_id") < half),
        TextSearch.ivfCells(half)))
    val neverInserted = TextSearch
      .nearestCells(e.filter(!VectorIngest.deletedCond), cents)
      .filter(col("rn") <= TextSearch.IvfProbes)
      .select("vec_id", "cid", "rn")
      .collect().map(_.toSeq).toSet
    assert(afterDelete == neverInserted,
      "upsert-then-delete diverged from the never-inserted index")
    // the tombstoned ids are genuinely gone
    assert(!afterDelete.exists(r =>
        r.head.asInstanceOf[Long] % 7 == 3),
      "a tombstoned vec_id survived the delete")

    // absent-id delete: tombstoning ids not in the index changes nothing
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    val top = IngestIndex.latestVersion(fs, state).get
    VectorIngest.deleteCommit(sp, state, fs, top,
      sp.range(5).select((col("id") + 10000000L).as("vec_id")))
    assert(indexRows(state) == afterDelete,
      "deleting absent ids must be a no-op")
  }

  test("slicing independence: the streamed index is identical for any rest-batch slicing (k in {3, 5})") {
    val sp = spark
    graft.functions.GraftFunctions.register(sp)
    // reference: the two-phase build's index
    VectorIngest.upsertProbe(sp, dir).collect()
    val ref = IngestIndex.currentTable(sp,
        graft.queries.Layout.stagePath(sp, "vecidx", dir), "vec")
      .select("vec_id", "cid", "rn").collect().map(_.toSeq).toSet
    for (k <- Seq(3, 5)) {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft-vecslice$k").toString
      graft.streaming.VectorStream.stageReplay(sp, dir,
        s"$base/replay", restSlices = k)
      graft.streaming.VectorStream.ingested(sp, s"$base/replay",
        s"$base/state").collect()
      val got = IngestIndex.currentTable(sp, s"$base/state", "vec")
        .select("vec_id", "cid", "rn").collect().map(_.toSeq).toSet
      assert(got == ref,
        s"index under $k-slice replay diverged from the two-phase build")
    }
  }

  test("q114d DV-delete law (r17): dv-delete == eager delete read for " +
    "read; the DV commit writes NO index bucket (O(tombstones) IO); " +
    "materialize converges to the eager state and clears the vector") {
    val sp = spark
    graft.functions.GraftFunctions.register(sp)
    // eager-path reference state (q114c's rig)
    VectorIngest.deleteProbe(sp, dir).collect()
    val eagerState = graft.queries.Layout.stagePath(sp, "vecdel", dir)
    def rows(st: String): Set[Seq[Any]] =
      IngestIndex.currentTable(sp, st, "vec")
        .select("vec_id", "cid", "rn").collect().map(_.toSeq).toSet
    val eager = rows(eagerState)
    // DV path on its own store
    VectorIngest.dvDeleteProbe(sp, dir).collect()
    val dvState = graft.queries.Layout.stagePath(sp, "vecdvdel", dir)
    assert(rows(dvState) == eager,
      "DV-composed read diverged from the eager delete")
    // IO claim: the DV commit's version dir holds ONLY the vec__dv side
    // table — zero base buckets rewritten
    val fs = new org.apache.hadoop.fs.Path(dvState)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    val top = IngestIndex.latestVersion(fs, dvState).get
    val children = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dvState/v$top"))
      .map(_.getPath.getName).filter(!_.startsWith(".")).toSet
    assert(children == Set("manifest", "vec__dv"),
      s"the DV commit's version dir must hold only the side table: " +
        s"$children")
    // probe plans still read through the manifest (no full-store union
    // of dead versions): the read-with-dv == eager equality above plus
    // the side-table-only dir IS the cost contract; finish the
    // lifecycle — materialize rewrites only tombstoned buckets and
    // drops the vector
    val m = IngestIndex.readManifest(fs, dvState, top)
    val nm = IngestIndex.materializeDeletes(sp, dvState, m, "vec",
      top + 1, Seq("vec_id"))
    IngestIndex.writeManifest(fs, dvState, top + 1, nm,
      op = "materialize")
    assert(!nm.contains(IngestIndex.dvTable("vec")),
      "materialize must clear the vector from the manifest")
    assert(rows(dvState) == eager,
      "post-materialize state diverged from the eager delete")
    // DESCRIBE HISTORY provenance reads the verbs back
    val ops = IngestIndex.describeHistory(fs, dvState)
      .map(h => h.version -> h.operation).toMap
    assert(ops(top) == "delete-dv" && ops(top + 1) == "materialize", ops)
  }
}
