package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

/** q120/q121 laws the DuckDB oracle can't see from outside the stream:
  * the feed FOLDS back to the table (applying each user's last change
  * equals the final state, which equals the one-shot batch aggregate),
  * preimages chain to the previous postimage (the CDC-consumer
  * contract), snapshots read through retained manifests equal direct
  * recomputation over their batches' slices, and eviction past the
  * retention window fails LOUDLY instead of returning a partial union.
  */
class CdfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val rig: (String, String, Long) = {
    val base = java.nio.file.Files.createTempDirectory("graft-cdfspec")
    val replay = s"$base/replay"
    CdfStream.stageModReplay(spark, sfDir, replay, nBatches = 4)
    val top = CdfStream.runUpsertCdf(spark, replay, s"$base/state",
      s"$base/cdf", retain = 8)
    (s"$base/state", s"$base/cdf", top)
  }

  private def key(df: DataFrame): Map[Long, (Long, Long, BigDecimal)] =
    df.select(col("user_id"), col("n_events"),
        unix_micros(col("last_ts")).as("us"),
        col("sum_value").cast(DecimalType(18, 4)))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        BigDecimal(r.getDecimal(3))))).toMap

  test("q120: change-feed postimages fold back to the final state, " +
    "which equals the one-shot batch aggregate") {
    val (state, cdf, top) = rig
    assert(top === 4L, "4 staged slices must replay as 4 micro-batches")
    val finalState = key(IngestIndex.tableAt(spark, state, "state", top))
    val batchTwin = key(graft.Q.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy("user_id").agg(count(lit(1)).as("n_events"),
        max(col("ts")).as("last_ts"),
        sum(col("value").cast(DecimalType(18, 4))).as("sum_value")))
    assert(finalState === batchTwin)
    // last change per user (max batch_id; insert or postimage) == final
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("batch_id").desc)
    val folded = key(CdfStream.cdfRows(spark, cdf)
      .filter(col("op") =!= "update_preimage")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1))
    assert(folded === finalState)
  }

  test("q120: every preimage equals the user's previous postimage") {
    val (_, cdf, _) = rig
    val rows = CdfStream.cdfRows(spark, cdf)
    val pre = rows.filter(col("op") === "update_preimage").as("p")
    // the previous change of (user, b) is the post/insert row at the
    // user's max batch_id < b — join and compare all payload columns
    val post = rows.filter(col("op") =!= "update_preimage").as("q")
    val joined = pre.join(post, col("p.user_id") === col("q.user_id")
        && col("q.batch_id") < col("p.batch_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("p.user_id"), col("p.batch_id"))
          .orderBy(col("q.batch_id").desc)))
      .filter(col("rn") === 1)
    assert(joined.count() ===
      rows.filter(col("op") === "update_preimage").count(),
      "every preimage must have a predecessor change")
    val bad = joined.filter(
      col("p.n_events") =!= col("q.n_events")
        || col("p.last_ts") =!= col("q.last_ts")
        || col("p.sum_value").cast(DecimalType(18, 4)) =!=
          col("q.sum_value").cast(DecimalType(18, 4)))
    assert(bad.count() === 0L)
  }

  test("q121: retained snapshots equal direct recomputation per slice " +
    "prefix") {
    val (state, _, _) = rig
    val e = graft.Q.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("b", pmod(col("event_id"), lit(4)))
    (1L to 4L).foreach { v =>
      val snap = key(IngestIndex.tableAt(spark, state, "state", v))
      val direct = key(e.filter(col("b") < v).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"),
          sum(col("value").cast(DecimalType(18, 4))).as("sum_value")))
      assert(snap === direct, s"snapshot v$v")
    }
  }

  test("q125: the CDC-consumer view is independent of trigger slicing " +
    "(4-batch replay == single-batch replay)") {
    val (_, cdf, _) = rig
    def viewOf(feedDir: String): Map[String, (Long, Long, BigDecimal)] = {
      val out = java.nio.file.Files.createTempDirectory("graft-cdfspec3")
      CdfStream.maintainView(spark, feedDir, sfDir, s"$out/view")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          BigDecimal(r.getDecimal(3))))).toMap
    }
    val sliced = viewOf(s"$cdf/b*")
    // same change rows, one file, one trigger — the delta algebra must
    // not care how the feed slices
    val one = java.nio.file.Files.createTempDirectory("graft-cdfspec4")
    CdfStream.cdfRows(spark, cdf).coalesce(1)
      .write.mode("overwrite").parquet(s"$one/ball")
    assert(viewOf(s"$one/ball") === sliced)
    assert(sliced.nonEmpty)
  }

  test("q126: point lookup reads only covered buckets and equals the " +
    "full-table filter; absent keys return nothing") {
    val (state, _, top) = rig
    val sp = spark
    import sp.implicits._
    val full = IngestIndex.tableAt(spark, state, "state", top)
    val someKeys = full.select("user_id").orderBy("user_id").limit(4)
      .collect().map(_.getLong(0)).toSeq
    val got = key(IngestIndex.pointGet(spark, state, "state",
      someKeys.toDF("user_id")))
    val want = key(full.filter(col("user_id").isInCollection(someKeys)))
    assert(got === want)
    assert(got.keySet === someKeys.toSet)
    // pruning is real: the probe's bucket cover is a strict subset of
    // the live buckets (5 keys cannot cover all 16 base buckets here)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = IngestIndex.readManifest(fs, state, top)
    val n = IngestIndex.numBuckets(spark)
    val covered = someKeys.toDF("user_id")
      .withColumn("bkt", IngestIndex.bucketCol("state", n,
        IngestIndex.gensOf(m, "state")))
      .select("bkt").distinct().count()
    assert(covered < m("state").size,
      s"probe covered $covered of ${m("state").size} buckets — no pruning")
    // a key that never existed resolves to empty, not an error
    assert(IngestIndex.pointGet(spark, state, "state",
      Seq(-1L).toDF("user_id")).count() === 0L)
  }

  test("CDF chain associativity (randomized): for random batch counts k, " +
    "the completed upsert equals the one-shot aggregate and the " +
    "feed-maintained view equals the direct recompute") {
    // q125 pins 4-batch == 1-batch; this pins the associativity claim
    // directly over random k — the feed's signed-delta algebra and the
    // merge arithmetic must be independent of how the stream slices
    val rnd = new scala.util.Random(17)
    val ks = Seq(1 + rnd.nextInt(8), 1 + rnd.nextInt(8)).distinct
    val oneShot = key(graft.Q.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy("user_id").agg(count(lit(1)).as("n_events"),
        max(col("ts")).as("last_ts"),
        sum(col("value").cast(DecimalType(18, 4))).as("sum_value")))
    val directView = {
      val dim = EventStream.userNationDim(spark, sfDir)
      graft.Q.events(spark, sfDir)
        .groupBy("user_id").agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 4))).as("sv"))
        .join(dim, "user_id").groupBy("nation")
        .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"),
          sum(col("sv")).cast(DecimalType(18, 4)).as("sum_value"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          BigDecimal(r.getDecimal(3))))).toMap
    }
    ks.foreach { k =>
      val base = java.nio.file.Files.createTempDirectory(s"graft-cdfprop$k")
      val replay = s"$base/replay"
      CdfStream.stageModReplay(spark, sfDir, replay, nBatches = k)
      val top = CdfStream.runUpsertCdf(spark, replay, s"$base/state",
        s"$base/cdf", retain = k + 2)
      assert(top === k.toLong, s"k=$k replay did not run $k micro-batches")
      assert(key(IngestIndex.tableAt(spark, s"$base/state", "state", top))
        === oneShot, s"k=$k: final state diverged from the one-shot twin")
      val view = CdfStream
        .maintainView(spark, s"$base/cdf/b*", sfDir, s"$base/view")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          BigDecimal(r.getDecimal(3))))).toMap
      assert(view === directView,
        s"k=$k: feed-maintained view diverged from the direct recompute")
    }
  }

  test("q130: the delete-bearing feed telescopes to the final state; " +
    "departed users are gone; re-inserts emit as inserts") {
    val base = java.nio.file.Files.createTempDirectory("graft-cdfspec7")
    val replay = s"$base/replay"
    CdfStream.stageModReplay(spark, sfDir, replay, nBatches = 4)
    val top = CdfStream.runUpsertCdf(spark, replay, s"$base/state",
      s"$base/cdf", retain = 8, deleteMod = Some(29))
    assert(top === 4L)
    val feed = CdfStream.cdfRows(spark, s"$base/cdf")
    assert(feed.filter(col("op") === "delete").count() > 0,
      "rig degenerate: no delete op ever fired")
    // telescoping law: per user, the signed payload sum over ALL ops
    // (insert/post +, pre/delete -) equals the final state payload — or
    // zero for departed users
    val dec = DecimalType(18, 4)
    val sgn = when(col("op") === "update_preimage"
      || col("op") === "delete", lit(-1L)).otherwise(lit(1L))
    val folded = feed.groupBy("user_id")
      .agg(sum(sgn * col("n_events")).as("n"),
        sum((sgn.cast(dec) * col("sum_value").cast(dec)).cast(dec))
          .cast(dec).as("sv"))
    val state = IngestIndex.currentTable(spark, s"$base/state", "state")
      .select(col("user_id"), col("n_events"),
        col("sum_value").cast(dec).as("state_sv"))
    val joined = folded.join(state, Seq("user_id"), "full_outer")
    val bad = joined.filter(
      // present user: fold == state; departed user: fold telescopes to 0
      when(col("n_events").isNotNull,
        col("n") =!= col("n_events") || col("sv") =!= col("state_sv"))
        .otherwise(col("n") =!= 0L))
    assert(bad.count() === 0L, "feed fold diverged from the final state")
    // departed-vs-reinserted: a user deleted at their LAST active batch
    // is absent from the state; one deleted earlier re-inserted (their
    // feed carries an insert in a LATER batch than a delete)
    val delB = feed.filter(col("op") === "delete")
      .select(col("user_id"), col("batch_id").as("db"))
    val reins = feed.filter(col("op") === "insert").as("i")
      .join(delB.as("dd"), col("i.user_id") === col("dd.user_id")
        && col("i.batch_id") > col("dd.db"))
    assert(reins.count() > 0, "rig degenerate: no user re-inserted " +
      "after a delete")
    val departed = delB.join(state, Seq("user_id"), "left_anti")
    assert(departed.count() > 0, "rig degenerate: every deleted user " +
      "re-inserted — the permanent-departure path never ran")
    // PER-COMMIT NETTING (r16): one commit emits at most one change per
    // key — a delete row never shares its (user, batch) with any other
    // op (the same-batch upsert+delete nets to the single delete)
    val mixed = feed.groupBy("user_id", "batch_id").agg(
      sum(when(col("op") === "delete", 1L).otherwise(0L)).as("nd"),
      count(lit(1)).as("n"))
      .filter(col("nd") > 0 && col("n") > col("nd"))
    assert(mixed.count() === 0L,
      "a delete shared its commit with another change row for the same key")
    // and the delete's image is the PRE-COMMIT row: it equals the user's
    // previous insert/postimage exactly (Delta's removed-row contract)
    val delRows = feed.filter(col("op") === "delete").as("d")
    val prior = feed.filter(col("op") === "insert"
      || col("op") === "update_postimage").as("q")
    val matchedPrior = delRows.join(prior,
        col("d.user_id") === col("q.user_id")
          && col("q.batch_id") < col("d.batch_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("d.user_id"), col("d.batch_id"))
          .orderBy(col("q.batch_id").desc)))
      .filter(col("rn") === 1)
    assert(matchedPrior.count() === delRows.count(),
      "every delete must trace to a stored pre-commit row")
    val imageBad = matchedPrior.filter(
      col("d.n_events") =!= col("q.n_events")
        || col("d.last_ts") =!= col("q.last_ts")
        || col("d.sum_value").cast(dec) =!= col("q.sum_value").cast(dec))
    assert(imageBad.count() === 0L,
      "a delete row's image diverged from the pre-commit row")
  }

  test("q129b: deletion vectors compose with every read verb — " +
    "pointGet == filter(readWithDv), currentTable applies the vector, " +
    "and the pre-delete snapshot still shows the rows") {
    val base = java.nio.file.Files.createTempDirectory("graft-dvverbs")
    graft.queries.Layout.trackTemp(base.toString)
    val state = s"$base/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val agg = graft.Q.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy("user_id").agg(count(lit(1)).as("n_events"),
        max(col("ts")).as("last_ts"),
        sum(col("value").cast(DecimalType(18, 4))).as("sum_value"))
    val m1: IngestIndex.Manifest = Map("state" ->
      IngestIndex.mergeCommit(spark, state, Map.empty, "state", 1L, agg,
        (_, d) => d))
    IngestIndex.writeManifest(fs, state, 1L, m1)
    val tomb = agg.filter(pmod(col("user_id"), lit(5)) === 2)
      .select("user_id")
    val m2 = IngestIndex.deleteWithDv(spark, state, m1, "state", 2L, tomb)
    IngestIndex.writeManifest(fs, state, 2L, m2)
    // currentTable applies the vector; raw mode shows the base
    val cur = key(IngestIndex.currentTable(spark, state, "state"))
    val raw = key(IngestIndex.currentTable(spark, state, "state",
      raw = true))
    val wantGone = agg.filter(pmod(col("user_id"), lit(5)) === 2)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(wantGone.nonEmpty && cur.keySet.intersect(wantGone).isEmpty,
      "currentTable served DV-deleted rows")
    assert(raw.keySet === cur.keySet ++ wantGone,
      "raw read must show exactly the tombstoned rows on top")
    // time travel: the DV is part of the snapshot — v1 (pre-delete)
    // shows the rows, v2 (post-delete) hides them
    assert(key(IngestIndex.tableAt(spark, state, "state", 1L)).keySet
      === raw.keySet)
    assert(key(IngestIndex.tableAt(spark, state, "state", 2L)).keySet
      === cur.keySet)
    // the GET law: pointGet == filter(readWithDv) over a probe mixing
    // survivors and tombstoned keys; tombstoned probes return nothing
    val sp = spark
    import sp.implicits._
    val probe = (cur.keySet.toSeq.sorted.take(3)
      ++ wantGone.toSeq.sorted.take(3)).toDF("user_id")
    val got = key(IngestIndex.pointGet(spark, state, "state", probe))
    val want = key(IngestIndex.readWithDv(spark, state, m2, "state",
      Seq("user_id"))
      .join(probe, Seq("user_id"), "left_semi"))
    assert(got === want)
    assert(got.keySet === cur.keySet.toSeq.sorted.take(3).toSet,
      "the GET must return exactly the surviving probe keys")
  }

  test("q133: catch-up consumer == full replay for EVERY start position " +
    "over the delete-bearing feed (snapshot bootstrap + tail telescopes)") {
    val base = java.nio.file.Files.createTempDirectory("graft-catchup")
    graft.queries.Layout.trackTemp(base.toString)
    val replay = s"$base/replay"
    CdfStream.stageModReplay(spark, sfDir, replay, nBatches = 4)
    val top = CdfStream.runUpsertCdf(spark, replay, s"$base/state",
      s"$base/cdf", retain = 8, deleteMod = Some(29))
    assert(top === 4L)
    def keyed(df: org.apache.spark.sql.DataFrame)
        : Map[String, (Long, Long, BigDecimal)] =
      df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        BigDecimal(r.getDecimal(3))))).toMap
    val full = keyed(CdfStream.maintainView(spark, s"$base/cdf/b*", sfDir,
      s"$base/viewfull"))
    // every legal start position: v1 (tail = everything after batch 0)
    // through v4 (tail = nothing — the view IS the final snapshot)
    (1L to 4L).foreach { v0 =>
      val got = keyed(CdfStream.maintainViewFrom(spark, s"$base/cdf/b*",
        sfDir, s"$base/state", s"$base/view$v0", fromVersion = v0))
      assert(got === full,
        s"catch-up from v$v0 diverged from the full replay")
    }
    // RESUME (review fix): re-invoking on a completed consumer is a
    // no-op — the snapshot is NOT re-read (the bootstrap is a one-time
    // event; on a real restart the upstream version may be past
    // retention) and the view is unchanged
    assert(keyed(CdfStream.maintainViewFrom(spark, s"$base/cdf/b*",
      sfDir, s"$base/state", s"$base/view2", fromVersion = 2L)) === full,
      "catch-up resume changed the committed view")
  }

  test("q121: time-based retention through the stream — the wall-clock " +
    "window keeps every young snapshot readable past the count minimum") {
    // same crash-replay-minimum count floor as the loud-eviction twin
    // below, but a 1h wall-clock window covers every manifest this run
    // writes: ALL four snapshots stay readable (retain=2 alone evicts
    // v1/v2 — the next test pins that side), each equal to its slice
    // prefix. The production "N days of VERSION AS OF" policy.
    val base = java.nio.file.Files.createTempDirectory("graft-cdfspec6")
    val replay = s"$base/replay"
    CdfStream.stageModReplay(spark, sfDir, replay, nBatches = 4)
    val top = CdfStream.runUpsertCdf(spark, replay, s"$base/state",
      s"$base/cdf", retain = 2, retainMillis = 3600L * 1000)
    assert(top === 4L)
    val e = graft.Q.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("b", pmod(col("event_id"), lit(4)))
    (1L to 4L).foreach { v =>
      val snap = key(IngestIndex.tableAt(spark, s"$base/state", "state", v))
      val direct = key(e.filter(col("b") < v).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"),
          sum(col("value").cast(DecimalType(18, 4))).as("sum_value")))
      assert(snap === direct, s"young snapshot v$v under the time window")
    }
  }

  test("q121: eviction past the retention window fails loudly") {
    // replay a twin with the crash-replay-minimum retention: old
    // manifests are GC'd, and the AS-OF read must throw a named error,
    // not silently union surviving dirs
    val base = java.nio.file.Files.createTempDirectory("graft-cdfspec2")
    val replay = s"$base/replay"
    CdfStream.stageModReplay(spark, sfDir, replay, nBatches = 4)
    val top = CdfStream.runUpsertCdf(spark, replay, s"$base/state",
      s"$base/cdf", retain = 2)
    assert(top === 4L)
    // current + prev stay readable under the minimum window
    assert(IngestIndex.tableAt(spark, s"$base/state", "state", top)
      .count() > 0)
    val ex = intercept[IllegalArgumentException] {
      IngestIndex.tableAt(spark, s"$base/state", "state", 1L)
    }
    assert(ex.getMessage.contains("retention"))
  }
}
