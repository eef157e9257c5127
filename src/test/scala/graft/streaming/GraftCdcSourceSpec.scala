package graft.streaming

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** The `graft-cdc` streaming source (r19): store versions as streaming
  * offsets — one batch per version under the rate limit, each batch ==
  * `changesBetween` verbatim (whose per-step IO footprint ChangesSpec
  * pins on executed-plan metrics), snapshot bootstrap persisted across
  * restarts, named errors for the contract edges.
  */
class GraftCdcSourceSpec extends AnyFunSuite {

  private val dec = DecimalType(18, 4)

  private def stage(kind: String): String =
    java.nio.file.Files
      .createTempDirectory(s"graft-cdcsrc-$kind").toString + "/state"

  private def commit(state: String, m: IngestIndex.Manifest, next: Long,
      delta: DataFrame,
      combine: (DataFrame, DataFrame) => DataFrame)
      : IngestIndex.Manifest = {
    val s = TestSpark.spark
    val fs = new Path(state)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val map = IngestIndex.mergeCommit(s, state, m, "state", next, delta,
      combine)
    val nm: IngestIndex.Manifest = m + ("state" -> map)
    IngestIndex.writeManifest(fs, state, next, nm)
    nm
  }

  private def seedRows(n: Int): DataFrame = {
    val s = TestSpark.spark
    val sp = s
    import sp.implicits._
    (1 to n).map(i => (i.toLong, i * 10L, BigDecimal(i) * 2))
      .toDF("user_id", "n_events", "sum_value")
      .select(col("user_id"), col("n_events"),
        col("sum_value").cast(dec).as("sum_value"))
  }

  private def canon(df: DataFrame): Seq[String] =
    df.select(df.columns.sorted.toSeq.map(col): _*)
      .collect().map(_.toString).sorted.toSeq

  /** Run a graft-cdc stream to exhaustion, collecting each micro-batch
    * (batchId -> canonical rows). `checkpoint` empty => fresh dir. */
  private def drain(name: String, checkpoint: String,
      options: Map[String, String])
      : scala.collection.mutable.ArrayBuffer[(Long, Seq[String])] = {
    val s = TestSpark.spark
    val got =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
    var reader = s.readStream.format("graft-cdc").option("name", name)
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        got.synchronized { got += id -> canon(b.toDF()); () }
      }
      .start()
    try { q.processAllAvailable() } finally q.stop()
    got
  }

  test("startingVersion + maxVersionsPerTrigger=1: ONE micro-batch per " +
    "store version, each batch == changesBetween of exactly that step") {
    val s = TestSpark.spark
    val state = stage("tail")
    val m1 = commit(state, Map.empty, 1L, seedRows(6), (_, d) => d)
    // v2 updates one key; v3 deletes two via a deletion vector
    val m2 = commit(state, m1, 2L,
      seedRows(6).filter(col("user_id") === 2)
        .withColumn("n_events", lit(99L)),
      (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
        "left_anti").unionByName(d))
    val fs = new Path(state)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val sp = s
    import sp.implicits._
    val m3 = IngestIndex.deleteWithDv(s, state, m2, "state", 3L,
      Seq(3L, 5L).toDF("user_id"))
    IngestIndex.writeManifest(fs, state, 3L, m3)
    graft.operators.GraftSql.registerTable("cdcsrc_tail", state, "state")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("cdcsrc-ckpt").toString
      val got = drain("cdcsrc_tail", ckpt,
        Map("startingVersion" -> "1", "maxVersionsPerTrigger" -> "1"))
      assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L), got.map(_._1))
      (1 to 3).foreach { v =>
        val expect = canon(IngestIndex.changesBetween(s, state, "state",
          v - 1L, v.toLong))
        assert(got(v - 1)._2 == expect,
          s"batch ${v - 1} != changes(${v - 1}, $v)")
      }
      // nothing new: a re-drained checkpoint emits no batches
      val again = drain("cdcsrc_tail", ckpt,
        Map("startingVersion" -> "1", "maxVersionsPerTrigger" -> "1"))
      assert(again.isEmpty, again.toString)
      // endingVersion (r19): a BOUNDED backfill — fresh checkpoint,
      // range [1, 2]: exactly versions 1 and 2 arrive, v3 never does,
      // and the drained stream completes instead of idling
      val bounded = drain("cdcsrc_tail", java.nio.file.Files
        .createTempDirectory("cdcsrc-bounded").toString,
        Map("startingVersion" -> "1", "endingVersion" -> "2",
          "maxVersionsPerTrigger" -> "1"))
      assert(bounded.size == 2, bounded.map(_._1))
      (1 to 2).foreach { v =>
        assert(bounded(v - 1)._2 == canon(IngestIndex.changesBetween(
          s, state, "state", v - 1L, v.toLong)))
      }
      val eBad = intercept[Exception] {
        drain("cdcsrc_tail", java.nio.file.Files
          .createTempDirectory("cdcsrc-badend").toString,
          Map("startingVersion" -> "3", "endingVersion" -> "2"))
      }
      assert(eBad.getMessage.contains("endingVersion"), eBad.getMessage)
    } finally graft.operators.GraftSql.unregisterTable("cdcsrc_tail")
  }

  test("snapshot bootstrap: first batch is the CURRENT snapshot as " +
    "inserts (bootstrap version persisted in the checkpoint); a resumed " +
    "stream consumes exactly the commits that landed in between") {
    val s = TestSpark.spark
    val state = stage("boot")
    val m1 = commit(state, Map.empty, 1L, seedRows(5), (_, d) => d)
    val m2 = commit(state, m1, 2L,
      seedRows(5).filter(col("user_id") === 1)
        .withColumn("n_events", lit(42L)),
      (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
        "left_anti").unionByName(d))
    graft.operators.GraftSql.registerTable("cdcsrc_boot", state, "state")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("cdcsrc-boot").toString
      val phase1 = drain("cdcsrc_boot", ckpt, Map.empty)
      assert(phase1.size == 1, phase1.map(_._1))
      val snapAsInserts = canon(
        IngestIndex.tableAt(s, state, "state", 2L)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(2L)))
      assert(phase1.head._2 == snapAsInserts,
        "bootstrap batch != snapshot-as-inserts")
      // the bootstrap is a one-time event, recorded in the checkpoint
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
        s"$ckpt/sources/0/graft-cdc-bootstrap")))
      // the store advances while the consumer is down...
      commit(state, m2, 3L,
        seedRows(7).filter(col("user_id") > 5), // inserts 6, 7
        (cur, d) => cur.unionByName(d))
      // ...and the resumed stream reads exactly (2, 3]
      val phase2 = drain("cdcsrc_boot", ckpt, Map.empty)
      assert(phase2.size == 1, phase2.map(_._1))
      assert(phase2.head._2 ==
        canon(IngestIndex.changesBetween(s, state, "state", 2L, 3L)),
        "catch-up batch != changes(2, 3)")
    } finally graft.operators.GraftSql.unregisterTable("cdcsrc_boot")
  }

  /** Drain under Trigger.AvailableNow — the production backfill
    * trigger: the query must TERMINATE on its own once the pinned end
    * is reached (no processAllAvailable). */
  private def drainAvailableNow(name: String, checkpoint: String,
      options: Map[String, String])
      : scala.collection.mutable.ArrayBuffer[(Long, Seq[String])] = {
    val s = TestSpark.spark
    val got =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
    var reader = s.readStream.format("graft-cdc").option("name", name)
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        got.synchronized { got += id -> canon(b.toDF()); () }
      }
      .start()
    try assert(q.awaitTermination(180000L),
      "AvailableNow query did not terminate — the pinned end was " +
        "never reached (or the source kept offering)")
    finally q.stop()
    got
  }

  test("restart with NEW versions under startingVersion + " +
    "maxVersionsPerTrigger (q146's replication config): the resumed " +
    "stream never offers below its committed offset — batches continue " +
    "exactly where the checkpoint stopped (r19 advisor scenario)") {
    val s = TestSpark.spark
    val state = stage("restart")
    var m = commit(state, Map.empty, 1L, seedRows(4), (_, d) => d)
    (2 to 3).foreach { v =>
      m = commit(state, m, v.toLong,
        seedRows(4).filter(col("user_id") === 1)
          .withColumn("n_events", lit(v.toLong * 100)),
        (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
          "left_anti").unionByName(d))
    }
    graft.operators.GraftSql.registerTable("cdcsrc_restart", state,
      "state")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("cdcsrc-restart").toString
      val opts = Map("startingVersion" -> "1",
        "maxVersionsPerTrigger" -> "1")
      assert(drain("cdcsrc_restart", ckpt, opts).size == 3)
      // the store advances while the stream is DOWN — a fresh source
      // instance's in-memory floor is gone; only the engine contracts
      // (admission-control start offset / getBatch re-init) carry it
      (4 to 5).foreach { v =>
        m = commit(state, m, v.toLong,
          seedRows(4).filter(col("user_id") === 2)
            .withColumn("n_events", lit(v.toLong * 1000)),
          (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
            "left_anti").unionByName(d))
      }
      val resumed = drain("cdcsrc_restart", ckpt, opts)
      assert(resumed.size == 2, resumed.map(_._1))
      Seq(4L, 5L).zipWithIndex.foreach { case (v, i) =>
        assert(resumed(i)._2 == canon(IngestIndex.changesBetween(
          s, state, "state", v - 1L, v)),
          s"resumed batch $i != changes(${v - 1}, $v)")
      }
    } finally graft.operators.GraftSql.unregisterTable("cdcsrc_restart")
  }

  test("Trigger.AvailableNow: per-version batches and the rate limit " +
    "SURVIVE it (SupportsTriggerAvailableNow, r20) — mvpt=1 over a " +
    "3-version store yields 3 batches then terminates, results == " +
    "processAllAvailable's; endingVersion composes") {
    val s = TestSpark.spark
    val state = stage("avnow")
    var m = commit(state, Map.empty, 1L, seedRows(5), (_, d) => d)
    (2 to 3).foreach { v =>
      m = commit(state, m, v.toLong,
        seedRows(5).filter(col("user_id") === v)
          .withColumn("n_events", lit(v.toLong * 7)),
        (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
          "left_anti").unionByName(d))
    }
    graft.operators.GraftSql.registerTable("cdcsrc_avnow", state, "state")
    try {
      val opts = Map("startingVersion" -> "1",
        "maxVersionsPerTrigger" -> "1")
      val got = drainAvailableNow("cdcsrc_avnow", java.nio.file.Files
        .createTempDirectory("cdcsrc-avnow").toString, opts)
      // one batch PER VERSION — the generic V1 AvailableNow wrapper
      // would have collapsed these into one
      assert(got.size == 3, got.map(_._1))
      val viaPaa = drain("cdcsrc_avnow", java.nio.file.Files
        .createTempDirectory("cdcsrc-avnow-paa").toString, opts)
      assert(got.map(_._2) == viaPaa.map(_._2),
        "AvailableNow batches != processAllAvailable batches")
      // endingVersion composes: the pinned end is min(latest, bound)
      val bounded = drainAvailableNow("cdcsrc_avnow",
        java.nio.file.Files
          .createTempDirectory("cdcsrc-avnow-b").toString,
        opts + ("endingVersion" -> "2"))
      assert(bounded.size == 2, bounded.map(_._1))
      (1 to 2).foreach { v =>
        assert(bounded(v - 1)._2 == canon(IngestIndex.changesBetween(
          s, state, "state", v - 1L, v.toLong)))
      }
    } finally graft.operators.GraftSql.unregisterTable("cdcsrc_avnow")
  }

  test("offer decision laws (pure): plan-cap clamp keeps every offer " +
    "within MaxChangeSteps of the floor (r19 advisor wedge); rate " +
    "limit and floors unchanged") {
    import GraftCdcSource.decideOffer
    val cap = IngestIndex.MaxChangeSteps
    // un-rate-limited stream 600 versions behind: offers arrive in
    // plan-capped chunks, never a range changesBetween would refuse
    assert(decideOffer(600L, None, Some(1L), -1L, None) == Some(cap))
    assert(decideOffer(600L, Some(cap), Some(1L), -1L, None) ==
      Some(600L))
    // snapshot bootstrap far behind latest: first offer caps at
    // bootstrap + MaxChangeSteps (the batch is snapshot + (b, t])
    assert(decideOffer(600L, None, None, 3L, None) == Some(3L + cap))
    // rate limit still binds tighter than the cap
    assert(decideOffer(600L, Some(10L), Some(1L), -1L, Some(5L)) ==
      Some(15L))
    // rate-limited snapshot mode: bootstrap batch alone
    assert(decideOffer(600L, None, None, 3L, Some(2L)) == Some(3L))
    // nothing new
    assert(decideOffer(5L, Some(5L), Some(1L), -1L, Some(1L)).isEmpty)
    assert(decideOffer(0L, None, None, 0L, None).isEmpty)
  }

  test("latestVersionAbove: upward probe from a known committed top " +
    "matches the full listing as the store advances (the O(1)-per-" +
    "trigger poll path)") {
    val s = TestSpark.spark
    val state = stage("probe")
    val fs = new Path(state)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    var m = commit(state, Map.empty, 1L, seedRows(3), (_, d) => d)
    assert(IngestIndex.latestVersionAbove(fs, state, 1L) == 1L)
    (2 to 4).foreach { v =>
      m = commit(state, m, v.toLong,
        seedRows(3).filter(col("user_id") === 1)
          .withColumn("n_events", lit(v.toLong)),
        (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
          "left_anti").unionByName(d))
    }
    assert(IngestIndex.latestVersionAbove(fs, state, 1L) == 4L)
    assert(IngestIndex.latestVersionAbove(fs, state, 4L) == 4L)
    assert(IngestIndex.latestVersionAbove(fs, state, 4L) ==
      IngestIndex.latestVersion(fs, state).get)
  }

  test("offsets: json round-trip, SerializedOffset acceptance, named " +
    "errors for bad options and unknown names") {
    val o = GraftCdcOffset(7L, 2L)
    assert(GraftCdcOffset.parse(o.json) == o)
    assert(GraftCdcOffset.of(
      org.apache.spark.sql.execution.streaming.runtime
        .SerializedOffset(o.json)) == o)
    intercept[IllegalArgumentException] {
      GraftCdcOffset.parse("{\"nope\":1}") }
    val s = TestSpark.spark
    val e1 = intercept[Exception] {
      s.readStream.format("graft-cdc")
        .option("name", "cdcsrc_no_such").load() }
    assert(e1.getMessage.contains("not a registered graft store"),
      e1.getMessage)
    val e2 = intercept[Exception] {
      s.readStream.format("graft-cdc").load() }
    assert(e2.getMessage.contains("option"), e2.getMessage)
  }

  test("schema widening: a LIVE stream crossing it fails with the " +
    "named restart error; a RESTART (and a fresh stream) adopts the " +
    "widened schema and null-fills pre-widening steps") {
    val s = TestSpark.spark
    val state = stage("widen")
    val m1 = commit(state, Map.empty, 1L, seedRows(4), (_, d) => d)
    graft.operators.GraftSql.registerTable("cdcsrc_widen", state,
      "state")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("cdcsrc-widen").toString
      // phase 1 fixes this lineage's first batches at the 3-col shape
      drain("cdcsrc_widen", ckpt, Map("startingVersion" -> "1"))
      // v2 widens in place (q128's law: only touched buckets carry the
      // new column)
      commit(state, m1, 2L,
        seedRows(4).filter(col("user_id") === 1)
          .withColumn("tag", lit("x")),
        (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
          "left_anti").withColumn("tag", lit(null)
            .cast(org.apache.spark.sql.types.StringType))
          .unionByName(d))
      // a LIVE stream instance declared pre-widening hits the named
      // error when its next batch carries the new column (the align
      // guard — exercised directly: a running query's source instance
      // keeps its creation-time schema)
      val narrow = org.apache.spark.sql.types.StructType(
        seedRows(1).schema.fields.toSeq ++ GraftCdcSource.ChangeFields)
      val e = intercept[IllegalStateException] {
        GraftCdcSource.align("cdcsrc_widen",
          IngestIndex.changesBetween(s, state, "state", 1L, 2L),
          narrow)
      }
      assert(e.getMessage.contains("restart the stream"), e.getMessage)
      // the RESTART adopts: the resumed lineage re-declares from the
      // store's current (widened) schema and consumes (1, 2] with tag
      val resumed = drain("cdcsrc_widen", ckpt,
        Map("startingVersion" -> "1"))
      assert(resumed.size == 1, resumed.map(_._1))
      // a fresh stream replays the whole history under the widened
      // schema; the v1 step's rows null-fill `tag` (read-old-under-new)
      val fresh = drain("cdcsrc_widen", java.nio.file.Files
        .createTempDirectory("cdcsrc-widen2").toString,
        Map("startingVersion" -> "1", "maxVersionsPerTrigger" -> "1"))
      assert(fresh.size == 2, fresh.map(_._1))
      // every v1-step row carries a null (the null-filled tag; no
      // other column of the seed is nullable-null)
      assert(fresh.head._2.nonEmpty &&
        fresh.head._2.forall(_.contains("null")),
        fresh.head._2.mkString("; "))
    } finally graft.operators.GraftSql.unregisterTable("cdcsrc_widen")
  }

  test("startingTimestamp (r20): resolves through versionAt — the ONE " +
    "travel rule, so source == startingVersion(versionAt(ts)+1) == " +
    "the TVF's timestamp bound; mutual exclusion and pre-history " +
    "instants are named errors") {
    val s = TestSpark.spark
    val state = stage("ts")
    val m1 = commit(state, Map.empty, 1L, seedRows(4), (_, d) => d)
    val m2 = commit(state, m1, 2L,
      seedRows(4).filter(col("user_id") === 2)
        .withColumn("n_events", lit(77L)),
      (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
        "left_anti").unionByName(d))
    commit(state, m2, 3L,
      seedRows(4).filter(col("user_id") === 4)
        .withColumn("n_events", lit(88L)),
      (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
        "left_anti").unionByName(d))
    // pin DISTINCT manifest mtimes so versionAt's resolution is
    // deterministic (real stores commit ms apart; this test must not
    // depend on the build box's commit pacing)
    val fs = new Path(state)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val t0 = 1700000000000L
    (1L to 3L).foreach(v => fs.setTimes(
      new Path(s"$state/v$v/manifest"), t0 + v * 10000L, -1L))
    graft.operators.GraftSql.registerTable("cdcsrc_ts", state, "state")
    try {
      // an instant between v2 and v3: the snapshot you'd read is v2,
      // so the stream starts at v3's own changes
      val betw = (t0 + 25000L).toString
      val got = drain("cdcsrc_ts", java.nio.file.Files
        .createTempDirectory("cdcsrc-ts1").toString,
        Map("startingTimestamp" -> betw))
      assert(got.size == 1, got.map(_._1))
      assert(got.head._2 == canon(
        IngestIndex.changesBetween(s, state, "state", 2L, 3L)),
        "startingTimestamp batch != changes(2, 3)")
      // == the equivalent startingVersion spelling
      val viaVersion = drain("cdcsrc_ts", java.nio.file.Files
        .createTempDirectory("cdcsrc-ts2").toString,
        Map("startingVersion" -> "3"))
      assert(viaVersion.map(_._2) == got.map(_._2))
      // string-literal form (session tz is UTC) resolves identically
      val iso = java.time.Instant.ofEpochMilli(t0 + 25000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      val viaString = drain("cdcsrc_ts", java.nio.file.Files
        .createTempDirectory("cdcsrc-ts3").toString,
        Map("startingTimestamp" -> iso))
      assert(viaString.map(_._2) == got.map(_._2))
      // an instant at/after the latest commit: a tail with no batches
      // until the NEXT commit arrives
      val tail = drain("cdcsrc_ts", java.nio.file.Files
        .createTempDirectory("cdcsrc-ts4").toString,
        Map("startingTimestamp" -> (t0 + 35000L).toString))
      assert(tail.isEmpty, tail.map(_._1))
      def chain(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      // endingTimestamp (the bounded-backfill symmetry): an instant
      // between v2 and v3 bounds the tail INCLUSIVELY at v2 — the
      // TVF's ts2 semantics; the backfill COMPLETES at the bound
      val bounded = drain("cdcsrc_ts", java.nio.file.Files
        .createTempDirectory("cdcsrc-ts7").toString,
        Map("startingVersion" -> "1", "maxVersionsPerTrigger" -> "1",
          "endingTimestamp" -> betw))
      assert(bounded.size == 2, bounded.map(_._1))
      assert(bounded.map(_._2).toSeq == Seq(
        canon(IngestIndex.changesBetween(s, state, "state", 0L, 1L)),
        canon(IngestIndex.changesBetween(s, state, "state", 1L, 2L))),
        "endingTimestamp bound != (0,1],(1,2]")
      val e3 = intercept[Throwable] {
        drain("cdcsrc_ts", java.nio.file.Files
          .createTempDirectory("cdcsrc-ts8").toString,
          Map("endingVersion" -> "2", "endingTimestamp" -> betw))
      }
      assert(chain(e3).contains("mutually exclusive"), chain(e3))
      // guard rails: both spellings at once, and a pre-history instant
      val e1 = intercept[Throwable] {
        drain("cdcsrc_ts", java.nio.file.Files
          .createTempDirectory("cdcsrc-ts5").toString,
          Map("startingVersion" -> "1", "startingTimestamp" -> betw))
      }
      assert(chain(e1).contains("mutually exclusive"), chain(e1))
      val e2 = intercept[Throwable] {
        drain("cdcsrc_ts", java.nio.file.Files
          .createTempDirectory("cdcsrc-ts6").toString,
          Map("startingTimestamp" -> "1000"))
      }
      assert(chain(e2).contains("precedes every retained commit"),
        chain(e2))
    } finally graft.operators.GraftSql.unregisterTable("cdcsrc_ts")
  }
}
