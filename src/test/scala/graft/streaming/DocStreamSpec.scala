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
    val streamed = DocStream.bandAnchors(spark, replay, "docstream_sink_a")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val batch = DocStream.batchBandAnchors(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
    // sanity: the corpus has near-dups, so SOME doc resolves to an earlier
    // anchor, and every anchor is <= its doc (id-ordered arrival)
    assert(streamed.exists { case ((doc, _), anchor) => anchor < doc })
    assert(streamed.forall { case ((doc, _), anchor) => anchor <= doc })
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
}
