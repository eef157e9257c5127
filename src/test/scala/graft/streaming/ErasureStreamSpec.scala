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

  private def interleavingLaw(tag: String): Unit = {
    val sp = spark
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory(s"graft-inter-law$tag").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    // small deterministic world: 24 users, 6 slices of (user, +1) rows
    val rnd = new scala.util.Random(97)
    val slices: Seq[Seq[Long]] =
      Seq.fill(6)(Seq.fill(16)(rnd.nextInt(24).toLong))
    val deletes: Seq[Set[Long]] =
      Seq(Set(1L, 5L, 9L), Set(2L, 5L, 14L), Set(9L, 23L))
    // interleave U D U D U D U U-like: U0 U1 D0 U2 D1 U3 D2 U4 U5
    sealed trait Verb
    case class U(i: Int) extends Verb
    case class D(i: Int) extends Verb
    val seq: Seq[Verb] = Seq(U(0), U(1), D(0), U(2), D(1), U(3), D(2),
      U(4), U(5))
    var m: IngestIndex.Manifest = Map.empty
    var top = 0L
    // the pure model: per-user count, erased-set applied
    var model = Map.empty[Long, Long]
    val modelAt = scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
    val combine: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame =
      (cur, d) => cur.select(col("user_id"), col("cnt").as("c"))
        .join(d, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("c"), lit(0L)) + coalesce(col("cnt"), lit(0L)))
            .as("cnt"))
    seq.foreach {
      case U(i) =>
        val delta = slices(i).groupBy(identity).view
          .mapValues(_.size.toLong).toSeq.toDF("user_id", "cnt")
        m = IngestIndex.mergeCommitDv(sp, state, m, "state", top + 1,
          delta, combine)
        IngestIndex.writeManifest(fs, state, top + 1, m, op = "merge")
        top += 1
        slices(i).groupBy(identity).foreach { case (u, g) =>
          model += u -> (model.getOrElse(u, 0L) + g.size)
        }
        modelAt(top) = model
      case D(i) =>
        m = IngestIndex.deleteWithDv(sp, state, m, "state", top + 1,
          deletes(i).toSeq.toDF("user_id"))
        IngestIndex.writeManifest(fs, state, top + 1, m, op = "delete-dv")
        top += 1
        model = model -- deletes(i)
        modelAt(top) = model
    }
    // no gc ran: every version must time-travel to the model exactly —
    // deleted users hidden AS OF their delete, re-inserted users visible
    // with only their post-delete counts
    (1L to top).foreach { v =>
      val got = IngestIndex.tableAt(sp, state, "state", v)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == modelAt(v), s"v$v diverged:\n$got\nvs\n${modelAt(v)}")
    }
    // provenance: the verb sequence reads back from DESCRIBE HISTORY
    val ops = IngestIndex.describeHistory(fs, state)
      .sortBy(_.version).map(_.operation)
    assert(ops == seq.map {
      case U(_) => "merge"
      case D(_) => "delete-dv"
    }, ops.toString)
  }

  test("q132b interleaving law (r17): alternating merge and DV-delete " +
    "verbs on ONE store — every intermediate version time-travels to " +
    "the model state, deletes never resurface, re-inserts surface") {
    interleavingLaw("base")
  }

  test("q132b interleaving law under splitBytes=1: every touched bucket " +
    "splits every commit — DV composition, tombstone invalidation, and " +
    "time travel hold across mixed generations") {
    val old = spark.conf.getOption("spark.graft.ingest.splitBytes")
    spark.conf.set("spark.graft.ingest.splitBytes", "1")
    try interleavingLaw("split")
    finally old match {
      case Some(v) => spark.conf.set("spark.graft.ingest.splitBytes", v)
      case None => spark.conf.unset("spark.graft.ingest.splitBytes")
    }
  }
}
