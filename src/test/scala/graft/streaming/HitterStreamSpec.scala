package graft.streaming

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q111 streaming heavy hitters beyond engine parity (the DuckDB
  * hash-match already proves streamed == batch == oracle at sf0.01):
  * batch-twin equality, SLICING independence (the determinism law q99
  * pins for partitionings, extended to micro-batch boundaries), and the
  * bounded-state claim.
  */
class HitterStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def run(nBatches: Int): (Seq[String], String) = {
    val base = java.nio.file.Files.createTempDirectory("graft-hitter").toString
    val replay = s"$base/replay"
    IngestStream.stageReplay(spark, sfDir, replay, nBatches = nBatches)
    val state = s"$base/state"
    val rows = HitterStream.heavyHitters(spark, replay, state, sfDir)
      .collect().map(_.toString).toSeq
    (rows, state)
  }

  test("streamed output equals the batch q99 row for row") {
    val (streamed, _) = run(nBatches = 4)
    val batch = SparkEntry.queries("q99_heavy_hitters")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"streamed != batch: ${streamed.size} vs ${batch.size} rows")
  }

  test("an empty replay yields an empty result, and a resumed run continues the fold") {
    val base = java.nio.file.Files.createTempDirectory("graft-hitter-rs").toString
    val full = s"$base/full"
    IngestStream.stageReplay(spark, sfDir, full, nBatches = 4)
    val replay = s"$base/replay"
    val state = s"$base/state"
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(replay)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    // nothing landed yet: the stream runs zero batches and must return
    // an empty frame, not crash on the missing state versions
    assert(HitterStream.heavyHitters(spark, replay, state, sfDir)
      .collect().isEmpty)
    // land the full corpus in two waves; the second invocation resumes
    // from the checkpoint and folds only the new files into the sketch
    def land(k: Int): Unit = {
      val name = f"batch-$k%04d.parquet"
      val dst = new org.apache.hadoop.fs.Path(dir, name)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$full/$name"), fs, dst, false, conf)
      ReplayStage.pinFile(fs, dst, k)
    }
    land(0); land(1)
    HitterStream.heavyHitters(spark, replay, state, sfDir).collect()
    land(2); land(3)
    val resumed = HitterStream.heavyHitters(spark, replay, state, sfDir)
      .collect().map(_.toString).toSeq
    val batch = SparkEntry.queries("q99_heavy_hitters")(spark, sfDir)
      .collect().map(_.toString).toSeq
    // equality with batch q99 proves the resumed stream merged batches
    // 2-3 into the v2 sketch (a reset would re-fold 0-1 and still pass
    // only if the checkpoint restarted cleanly — the version count pins
    // that it did not)
    assert(resumed == batch, "resumed stream diverged from the batch twin")
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(state))
      .map(_.getPath.getName).count(_.matches("v\\d+"))
    assert(versions == 4, s"expected 4 versions after the resumed crawl: $versions")
  }

  test("output is micro-batch-slicing independent; state stays bounded") {
    val (one, _) = run(nBatches = 1)
    val (four, state4) = run(nBatches = 4)
    assert(one == four,
      "different micro-batch slicings changed the exact-rescued output")
    // the 4-batch run exercised the merge path: 4 versions, each sketch
    // within the capacity bound
    val fs = new org.apache.hadoop.fs.Path(state4)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(state4))
      .map(_.getPath.getName).filter(_.matches("v\\d+")).sorted
    assert(versions.length == 4, s"expected 4 state versions: ${versions.toSeq}")
    versions.foreach { v =>
      val n = spark.read.parquet(s"$state4/$v/sketch").count()
      assert(n <= graft.functions.HeavyHitterSketch.DefaultCapacity,
        s"version $v sketch has $n rows — over capacity")
    }
  }
}
