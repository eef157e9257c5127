package graft.streaming

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `graft-upsert` streaming sink (r19): change-row APPLY with
  * per-key chain netting, plain replace-on-key upsert, exactly-once
  * version mirroring (idempotent re-delivery), and the end-to-end
  * source→sink law q146 hash-gates at rig scale.
  */
class GraftUpsertSinkSpec extends AnyFunSuite {

  private def freshStore(kind: String): String =
    java.nio.file.Files
      .createTempDirectory(s"graft-sink-$kind").toString + "/state"

  private def sinkFor(name: String, state: String): GraftUpsertSink = {
    graft.operators.GraftSql.registerTable(name, state, "state")
    new GraftUpsertSinkProvider().createSink(
      TestSpark.spark.sqlContext, Map("name" -> name), Seq.empty,
      org.apache.spark.sql.streaming.OutputMode.Append())
      .asInstanceOf[GraftUpsertSink]
  }

  private def rows(state: String): Seq[(Long, Long)] =
    IngestIndex.currentTable(TestSpark.spark, state, "state")
      .select("user_id", "n_events").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def changes(tuples: (Long, Long, String, Long)*): DataFrame = {
    val s = TestSpark.spark
    val sp = s
    import sp.implicits._
    tuples.toSeq.toDF("user_id", "n_events", "_change_type",
      "_commit_version")
  }

  test("change-row APPLY: per-key chains net to the last version " +
    "(postimage outranks its preimage; a trailing delete removes; " +
    "a later re-insert restarts); version chain mirrors batch ids") {
    val state = freshStore("apply")
    val sink = sinkFor("sink_apply_t", state)
    try {
      // batch 0 == source versions 1-3 in ONE batch: user 1 inserts
      // then updates (pair) then deletes -> net GONE; user 2 inserts
      // then updates -> net the v3 postimage; user 3 inserts at v3
      sink.addBatch(0L, changes(
        (1L, 10L, "insert", 1L),
        (1L, 10L, "update_preimage", 2L), (1L, 15L, "update_postimage", 2L),
        (1L, 15L, "delete", 3L),
        (2L, 20L, "insert", 1L),
        (2L, 20L, "update_preimage", 3L), (2L, 25L, "update_postimage", 3L),
        (3L, 30L, "insert", 3L)))
      assert(rows(state) == Seq((2L, 25L), (3L, 30L)))
      // batch 1: user 1 re-inserts (the re-crawl chain), user 3 deletes
      sink.addBatch(1L, changes(
        (1L, 99L, "insert", 4L),
        (3L, 30L, "delete", 4L)))
      assert(rows(state) == Seq((1L, 99L), (2L, 25L)))
      // exactly-once: re-delivering batch 1 is a byte-identical replay
      // (no error, same contents, same top version)
      sink.addBatch(1L, changes(
        (1L, 99L, "insert", 4L),
        (3L, 30L, "delete", 4L)))
      assert(rows(state) == Seq((1L, 99L), (2L, 25L)))
      val fs = new Path(state)
        .getFileSystem(TestSpark.spark.sparkContext.hadoopConfiguration)
      assert(IngestIndex.latestVersion(fs, state).contains(2L))
      // provenance: sink-apply op tags
      val ops = IngestIndex.describeHistory(fs, state)
        .map(h => h.version -> h.operation).toMap
      assert(ops == Map(1L -> "sink-apply", 2L -> "sink-apply"), ops)
    } finally graft.operators.GraftSql.unregisterTable("sink_apply_t")
  }

  test("plain rows: replace-on-key upsert; an in-batch duplicate key " +
    "is a named error; Complete mode and missing keys are named errors") {
    val s = TestSpark.spark
    val sp = s
    import sp.implicits._
    val state = freshStore("plain")
    val sink = sinkFor("sink_plain_t", state)
    try {
      sink.addBatch(0L,
        Seq((1L, 10L), (2L, 20L)).toDF("user_id", "n_events"))
      sink.addBatch(1L,
        Seq((2L, 99L), (3L, 30L)).toDF("user_id", "n_events"))
      assert(rows(state) == Seq((1L, 10L), (2L, 99L), (3L, 30L)))
      val e = intercept[Exception] { sink.addBatch(2L,
        Seq((4L, 1L), (4L, 2L)).toDF("user_id", "n_events")) }
      assert(e.getMessage.contains("duplicate key"), e.getMessage)
      val e2 = intercept[Exception] {
        new GraftUpsertSinkProvider().createSink(s.sqlContext,
          Map("name" -> "sink_plain_t"), Seq.empty,
          org.apache.spark.sql.streaming.OutputMode.Complete())
      }
      assert(e2.getMessage.contains("Complete"), e2.getMessage)
      val e3 = intercept[Exception] { sink.addBatch(3L,
        Seq((1L, 1L)).toDF("not_the_key", "n_events")) }
      assert(e3.getMessage.contains("key column"), e3.getMessage)
    } finally graft.operators.GraftSql.unregisterTable("sink_plain_t")
  }

  test("replication across schema evolution (r20): the source table " +
    "WIDENS mid-replication; the restarted stream adopts the widened " +
    "schema, pre-widening replica buckets null-fill, and the replica " +
    "still equals the source's direct recompute") {
    val s = TestSpark.spark
    val sp = s
    import sp.implicits._
    val src = freshStore("evo-src")
    val dst = freshStore("evo-dst")
    val fs = new Path(src)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def commit(m: IngestIndex.Manifest, next: Long, delta: DataFrame,
        combine: (DataFrame, DataFrame) => DataFrame)
        : IngestIndex.Manifest = {
      val map = IngestIndex.mergeCommit(s, src, m, "state", next,
        delta, combine)
      val nm: IngestIndex.Manifest = m + ("state" -> map)
      IngestIndex.writeManifest(fs, src, next, nm)
      nm
    }
    def canon(df: DataFrame): Seq[String] =
      df.select(df.columns.sorted.toSeq.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    val seed = (1 to 4).map(i => (i.toLong, i * 10L))
      .toDF("user_id", "n_events")
    val m1 = commit(Map.empty, 1L, seed, (_, d) => d)
    val m2 = commit(m1, 2L,
      seed.filter(col("user_id") === 2).withColumn("n_events", lit(77L)),
      (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
        "left_anti").unionByName(d))
    graft.operators.GraftSql.registerTable("sink_evo_src", src, "state")
    graft.operators.GraftSql.registerTable("sink_evo_dst", dst, "state")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sink-evo-ckpt").toString
    def replicate(): Unit = {
      val q = s.readStream.format("graft-cdc")
        .option("name", "sink_evo_src")
        .option("startingVersion", "1")
        .option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream.format("graft-upsert")
        .option("name", "sink_evo_dst")
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      replicate() // phase 1: the 2-column shape reaches the replica
      assert(rows(dst) == Seq((1L, 10L), (2L, 77L), (3L, 30L),
        (4L, 40L)))
      // the SOURCE widens while the stream is down (q128's in-place
      // evolution: only the touched bucket carries `tag`)
      commit(m2, 3L,
        seed.filter(col("user_id") === 1)
          .withColumn("n_events", lit(11L))
          .withColumn("tag", lit("x")),
        (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
          "left_anti")
          .withColumn("tag", lit(null)
            .cast(org.apache.spark.sql.types.StringType))
          .unionByName(d))
      // the RESTART adopts: the resumed lineage re-declares from the
      // source's current (widened) schema, the sink's combine unions
      // with allowMissingColumns, and the replica's untouched buckets
      // null-fill under the widened read — replica == recompute
      replicate()
      val got = canon(IngestIndex.currentTable(s, dst, "state"))
      val want = canon(IngestIndex.currentTable(s, src, "state"))
      assert(got == want, s"replica != source after widening:\n" +
        s"got  $got\nwant $want")
      assert(got.exists(_.contains("x")), "widened column never arrived")
      // version mirroring held across the seam: 3 source versions ->
      // 3 replica commits
      assert(IngestIndex.latestVersion(fs, dst).contains(3L))
    } finally {
      graft.operators.GraftSql.unregisterTable("sink_evo_src")
      graft.operators.GraftSql.unregisterTable("sink_evo_dst")
    }
  }

  test("end-to-end: graft-cdc source piped into the graft-upsert sink " +
    "replicates a store through a delete; replica == source snapshot") {
    val s = TestSpark.spark
    val sp = s
    import sp.implicits._
    val src = freshStore("e2e-src")
    val dst = freshStore("e2e-dst")
    val fs = new Path(src)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def commit(m: IngestIndex.Manifest, next: Long, delta: DataFrame,
        combine: (DataFrame, DataFrame) => DataFrame)
        : IngestIndex.Manifest = {
      val map = IngestIndex.mergeCommit(s, src, m, "state", next,
        delta, combine)
      val nm: IngestIndex.Manifest = m + ("state" -> map)
      IngestIndex.writeManifest(fs, src, next, nm)
      nm
    }
    def seed(n: Int): DataFrame = (1 to n)
      .map(i => (i.toLong, i * 10L)).toDF("user_id", "n_events")
    val m1 = commit(Map.empty, 1L, seed(5), (_, d) => d)
    val m2 = commit(m1, 2L,
      seed(5).filter(col("user_id") === 2)
        .withColumn("n_events", lit(77L)),
      (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
        "left_anti").unionByName(d))
    val m3 = IngestIndex.deleteWithDv(s, src, m2, "state", 3L,
      Seq(4L).toDF("user_id"))
    IngestIndex.writeManifest(fs, src, 3L, m3)
    graft.operators.GraftSql.registerTable("sink_e2e_src", src, "state")
    graft.operators.GraftSql.registerTable("sink_e2e_dst", dst, "state")
    try {
      val q = s.readStream.format("graft-cdc")
        .option("name", "sink_e2e_src")
        .option("startingVersion", "1")
        .option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream.format("graft-upsert")
        .option("name", "sink_e2e_dst")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("graft-sink-e2e-ckpt").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      assert(rows(dst) ==
        Seq((1L, 10L), (2L, 77L), (3L, 30L), (5L, 50L)))
      // version mirroring: 3 source versions -> 3 replica commits
      assert(IngestIndex.latestVersion(fs, dst).contains(3L))
      // the PRODUCTION spelling (r20): the same replication under
      // Trigger.AvailableNow — the query TERMINATES on its own at the
      // pinned end (no processAllAvailable), per-version batching and
      // the rate limit survive (SupportsTriggerAvailableNow), and the
      // replica is identical with the same mirrored version chain
      val dst2 = freshStore("e2e-dst2")
      graft.operators.GraftSql.registerTable("sink_e2e_dst2", dst2,
        "state")
      try {
        val q2 = s.readStream.format("graft-cdc")
          .option("name", "sink_e2e_src")
          .option("startingVersion", "1")
          .option("maxVersionsPerTrigger", "1")
          .load()
          .writeStream.format("graft-upsert")
          .option("name", "sink_e2e_dst2")
          .option("checkpointLocation", java.nio.file.Files
            .createTempDirectory("graft-sink-e2e-ckpt2").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        assert(q2.awaitTermination(120000),
          "AvailableNow replication did not terminate")
        assert(rows(dst2) == rows(dst),
          "AvailableNow replica != processAllAvailable replica")
        assert(IngestIndex.latestVersion(fs, dst2).contains(3L),
          "AvailableNow collapsed the per-version batching")
      } finally graft.operators.GraftSql
        .unregisterTable("sink_e2e_dst2")
    } finally {
      graft.operators.GraftSql.unregisterTable("sink_e2e_src")
      graft.operators.GraftSql.unregisterTable("sink_e2e_dst")
    }
  }
}
