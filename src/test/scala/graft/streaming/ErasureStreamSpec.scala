package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** q132 laws the oracle can't see from outside the stream: the
  * per-trigger IO claim (a DV commit writes NO base-table bucket — the
  * reason the stream exists), the vector accumulating across triggers,
  * every read verb hiding the erased keys BEFORE materialization, and
  * the one OPTIMIZE rewrite touching only tombstoned buckets then
  * clearing the vector.
  */
class ErasureStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q132: DV commits write only the side table; reads hide erased " +
    "keys pre-materialize; materialize rewrites only tombstoned buckets " +
    "and clears the vector") {
    val base = java.nio.file.Files.createTempDirectory("graft-erasure")
    graft.queries.Layout.trackTemp(base.toString)
    val req = s"$base/req"
    val state = s"$base/state"
    ErasureStream.stageRequests(spark, sfDir, req)
    // run WITHOUT the final materialize: the laws below inspect the
    // accumulated-vector regime first
    val top = ErasureStream.runErasure(spark, sfDir, req, state,
      materialize = false)
    assert(top === 4L, "3 request batches must commit v2..v4")
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // IO law through the stream: request versions hold ONLY the DV side
    // table — zero base-table bucket dirs rewritten by any erasure
    (2L to 4L).foreach { v =>
      val subdirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/v$v"))
        .map(_.getPath.getName).filter(!_.startsWith("_"))
        .filterNot(_ == "manifest").toSet
      assert(subdirs === Set(IngestIndex.dvTable("state")),
        s"v$v wrote beyond the DV side table: $subdirs")
    }
    val agg = ErasureStream.seedAgg(spark, sfDir)
    val erased = agg.filter(pmod(col("user_id"), lit(12)) < 3)
      .select("user_id").collect().map(_.getLong(0)).toSet
    val survivors = agg.select("user_id").collect()
      .map(_.getLong(0)).toSet -- erased
    assert(erased.nonEmpty && survivors.nonEmpty, "degenerate rig")
    // the vector accumulated the full request history
    val m = IngestIndex.readManifest(fs, state, top)
    val dvKeys = IngestIndex.readWithDv(spark, state, m,
      IngestIndex.dvTable("state"), Seq("user_id"))
      .collect().map(_.getLong(0)).toSet
    assert(dvKeys === erased, "the accumulated vector != erased set")
    // every read verb hides the erased keys while the vector is live
    val cur = IngestIndex.currentTable(spark, state, "state")
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(cur === survivors)
    val sp = spark
    import sp.implicits._
    val probe = (erased.take(2) ++ survivors.take(2)).toSeq.toDF("user_id")
    val got = IngestIndex.pointGet(spark, state, "state", probe)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(got === survivors.take(2).toSet,
      "pointGet served erased keys mid-history")
    // OPTIMIZE: materialize touches ONLY buckets holding tombstoned keys
    val gens = IngestIndex.gensOf(m, "state")
    val n = IngestIndex.numBuckets(spark)
    val tombBkts = IngestIndex.assignBucket(
      erased.toSeq.toDF("user_id"), "state", n, gens)
      .select("bkt").distinct().collect().map(_.getInt(0)).toSet
    val nm = IngestIndex.materializeDeletes(spark, state, m, "state", 5L,
      Seq("user_id"))
    IngestIndex.writeManifest(fs, state, 5L, nm)
    val written = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$state/v5/state"))
      .map(_.getPath.getName).filter(_.startsWith("bkt="))
      .map(_.drop(4).toInt).toSet
    assert(written.subsetOf(tombBkts),
      s"materialize rewrote untombstoned buckets: ${written -- tombBkts}")
    assert(!nm.contains(IngestIndex.dvTable("state")),
      "materialize left the vector in the manifest")
    // post-materialize: the RAW read equals the survivor set — the
    // deletions are physical now
    val raw = IngestIndex.currentTable(spark, state, "state", raw = true)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(raw === survivors)
    // and the payload survived intact: spot-check against the direct agg
    val want = agg.filter(!col("user_id").isInCollection(erased.toSeq))
      .select(col("user_id"), col("n_events"),
        col("sum_value").cast(DecimalType(18, 4)))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDecimal(2)))).toSet
    val gotAll = IngestIndex.currentTable(spark, state, "state")
      .select(col("user_id"), col("n_events"),
        col("sum_value").cast(DecimalType(18, 4)))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDecimal(2)))).toSet
    assert(gotAll === want)
    // RESUME (review fix): re-invoking on the completed dirs is a no-op
    // — the seed is not re-committed, the stream has nothing pending,
    // top is recovered from the STORE (not the dead in-memory counter),
    // and with the vector already materialized nothing new commits
    val top2 = ErasureStream.runErasure(spark, sfDir, req, state,
      materialize = true)
    assert(top2 === 5L, s"resume returned $top2, not the committed top")
    val after = IngestIndex.currentTable(spark, state, "state")
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(after === survivors, "resume changed the committed state")
  }

  test("q132 under splitBytes=1: the DV side table splits like any " +
    "store table and every read composes across its generations") {
    val old = spark.conf.getOption("spark.graft.ingest.splitBytes")
    spark.conf.set("spark.graft.ingest.splitBytes", "1")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft-erasplit")
      graft.queries.Layout.trackTemp(base.toString)
      val req = s"$base/req"
      val state = s"$base/state"
      ErasureStream.stageRequests(spark, sfDir, req)
      val top = ErasureStream.runErasure(spark, sfDir, req, state,
        materialize = false)
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val m = IngestIndex.readManifest(fs, state, top)
      // the stress actually engaged: the DV table advanced a generation
      // (request batches re-touch shared tombstone buckets)
      assert(IngestIndex.gensOf(m, IngestIndex.dvTable("state")).nonEmpty,
        s"splitBytes=1 never split the DV table: " +
          s"${m(IngestIndex.dvTable("state"))}")
      val agg = ErasureStream.seedAgg(spark, sfDir)
      val survivors = agg.filter(pmod(col("user_id"), lit(12)) >= 3)
        .select("user_id").collect().map(_.getLong(0)).toSet
      // the vector-applied read composes across the split generations
      val cur = IngestIndex.currentTable(spark, state, "state")
        .select("user_id").collect().map(_.getLong(0)).toSet
      assert(cur === survivors)
      // and the materialize merge prunes through the multi-gen DV cover
      val nm = IngestIndex.materializeDeletes(spark, state, m, "state",
        top + 1, Seq("user_id"))
      IngestIndex.writeManifest(fs, state, top + 1, nm)
      val raw = IngestIndex.currentTable(spark, state, "state", raw = true)
        .select("user_id").collect().map(_.getLong(0)).toSet
      assert(raw === survivors)
    } finally {
      old match {
        case Some(v) => spark.conf.set("spark.graft.ingest.splitBytes", v)
        case None => spark.conf.unset("spark.graft.ingest.splitBytes")
      }
    }
  }
}
