package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup ingest: the per-bucket anchor state must reproduce
  * the batch bucket-anchor assignment exactly when nothing expires, flag
  * exact duplicates against their anchors, and FORGET buckets once the
  * event-time horizon passes (the bounded-state contract).
  */
class DocStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streamed band anchors equal the batch twin (no expiry at test SF)") {
    val replay = s"${tmp("graft-docstream")}/replay"
    DocStream.stageDocReplay(spark, sfDir, replay, nFiles = 4)
    val run = DocStream.bandAnchorsRun(spark, replay, "docstream_sink_a")
    val streamed = run.result
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val batch = DocStream.batchBandAnchors(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
    // sanity: the corpus has near-dups, so SOME doc resolves to an earlier
    // anchor, and every anchor is <= its doc (id-ordered arrival)
    assert(streamed.exists { case ((doc, _), anchor) => anchor < doc })
    assert(streamed.forall { case ((doc, _), anchor) => anchor <= doc })
    // THE bounded-state contract, measured: the state store never holds
    // more than one row per distinct (band, bucket-value) — with nothing
    // expiring at this SF, every micro-batch's numRowsTotal is bounded by
    // the corpus-wide distinct bucket count and the final batch holds
    // exactly it
    val distinctBuckets = DocStream.batchBandAnchors(spark, sfDir)
      .select("band", "anchor_doc").distinct().count()
    assert(run.stateRowsPerBatch.nonEmpty)
    assert(run.stateRowsPerBatch.forall(_ <= distinctBuckets),
      s"state rows ${run.stateRowsPerBatch} exceed $distinctBuckets buckets")
    assert(run.stateRowsPerBatch.last == distinctBuckets,
      s"final state ${run.stateRowsPerBatch.last} != $distinctBuckets")
  }

  test("an exact duplicate arriving later resolves to the original's anchor") {
    import spark.implicits._
    val dir = tmp("graft-docstream-dup")
    val replay = s"$dir/replay"
    // doc 30 duplicates doc 10's text; 20 is unrelated
    Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (20L, "one two three four five six seven eight nine"),
      (30L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        expr("timestamp_micros(1700000000000000 + doc_id * 1000000)").as("ts"))
      .coalesce(1).write.parquet(replay)
    val out = DocStream.bandAnchors(spark, replay, "docstream_sink_b")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    (0 until 3).foreach { b =>
      assert(out((10L, b)) == 10L)  // opened its buckets
      assert(out((30L, b)) == 10L)  // identical sig -> same buckets -> anchor 10
      assert(out((20L, b)) == 20L)  // unrelated doc is its own anchor
    }
  }

  test("buckets expire past the horizon: a late duplicate re-opens them") {
    import spark.implicits._
    val dir = tmp("graft-docstream-exp")
    val replay = s"$dir/replay"
    // doc 3 duplicates doc 1 but arrives 10 minutes later; horizon 1 minute.
    // doc 2 arrives between them so the watermark actually advances past
    // doc 1's bucket timeout before doc 3's batch.
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", 0L),
      (2L, "one two three four five six seven eight nine", 300L),
      (3L, "alpha beta gamma delta epsilon zeta eta theta", 600L))
      .toDF("doc_id", "text", "offset_s")
      .select(col("doc_id"), col("text"),
        expr("timestamp_micros(1700000000000000 + offset_s * 1000000)").as("ts"))
      .repartitionByRange(3, col("doc_id"))
      .write.parquet(replay)
    // pin mtimes so the three docs replay as three ordered micro-batches
    ReplayStage.pinReplayOrder(spark, replay)
    val out = DocStream.bandAnchors(spark, replay, "docstream_sink_c",
        horizonMinutes = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    (0 until 3).foreach { b =>
      assert(out((1L, b)) == 1L)
      // doc 1's buckets expired (last seen + 1min < watermark when doc 3
      // arrived) -> doc 3 re-opens them as its own anchor
      assert(out((3L, b)) == 3L, s"band $b: expected expiry re-open")
    }
  }

  test("state store FORGETS expired buckets: numRowsTotal drops below ever-seen") {
    import spark.implicits._
    val dir = tmp("graft-docstream-state")
    val replay = s"$dir/replay"
    // three UNRELATED docs (9 distinct buckets ever), horizon 1 minute,
    // 5 minutes apart: by doc 3's micro-batch the watermark (240s, from
    // doc 2's batch) is past doc 1's bucket timeouts (60s), so its 3 state
    // rows must be REMOVED, not retained — the difference between bounded
    // state and an unbounded anchor map
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", 0L),
      (2L, "one two three four five six seven eight nine", 300L),
      (3L, "red orange yellow green blue indigo violet ultra", 600L))
      .toDF("doc_id", "text", "offset_s")
      .select(col("doc_id"), col("text"),
        expr("timestamp_micros(1700000000000000 + offset_s * 1000000)").as("ts"))
      .repartitionByRange(3, col("doc_id"))
      .write.parquet(replay)
    ReplayStage.pinReplayOrder(spark, replay)
    val run = DocStream.bandAnchorsRun(spark, replay, "docstream_sink_d",
      horizonMinutes = 1)
    // every doc is its own anchor (nothing collides)
    assert(run.result.collect().forall(r => r.getLong(0) == r.getLong(2)))
    // 9 distinct buckets existed over the stream's lifetime; the live set
    // after doc 3's batch is at most doc 2's + doc 3's (doc 1's expired)
    assert(run.stateRowsPerBatch.nonEmpty)
    assert(run.stateRowsPerBatch.max <= 9)
    assert(run.stateRowsPerBatch.last <= 6,
      s"expired buckets still in the store: ${run.stateRowsPerBatch}")
  }

  test("q53 horizon scales with corpus span (fixed 120min would expire mid-replay)") {
    val replay = s"${tmp("graft-docstream-span")}/replay"
    // 60s per doc -> the sf0.001 corpus (500 docs) spans ~8.3 HOURS of
    // event time, far past the fixed 120-minute default horizon
    DocStream.stageDocReplay(spark, sfDir, replay, nFiles = 4,
      spacingSeconds = 60L)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val horizon = DocStream.horizonMinutesFor(nDocs, spacingSeconds = 60L)
    assert(horizon >= nDocs.toInt) // 500 docs * 60s = 500 min span, + slack
    val streamed = DocStream.bandAnchors(spark, replay, "docstream_sink_e",
        horizonMinutes = horizon)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val batch = DocStream.batchBandAnchors(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // scaled horizon -> nothing expires mid-replay -> exact batch equality
    // (with the default 120min horizon early buckets would expire and
    // later near-dups would silently re-anchor — the advice's failure mode)
    assert(streamed == batch)
  }
}
