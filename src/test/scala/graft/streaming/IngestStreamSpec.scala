package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Q104: the streaming ingest-dedup's contract — every arriving doc is
  * classified against EXACTLY the docs of strictly earlier batches
  * (nothing from its own batch or later), and the run-to-completion
  * stream equals the one-shot batch twin row for row.
  */
class IngestStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("stream classifications equal the batch twin row for row (live corpus)") {
    val replay = s"${tempDir("graft-ingest-replay")}/replay"
    IngestStream.stageReplay(spark, sfDir, replay)
    val streamed = IngestStream
      .classified(spark, replay, s"${tempDir("graft-ingest-state")}/state")
      .collect().toSeq
    val twin = IngestStream.batchTwin(spark, sfDir).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == twin,
      s"stream vs twin diverged; first stream rows: ${streamed.take(3)}")
    // the corpus's near-dup structure must surface across arrival batches
    assert(streamed.exists(_.getString(1) == "near"),
      "live corpus has near-dups across batches; none detected")
  }

  test("in-batch duplicates stay novel; later copies anchor to the earliest") {
    val sp = spark
    import sp.implicits._
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"v$i").mkString(" ")
    // batch = doc_id % 4: docs 8 and 16 are BOTH batch 0 with the same
    // text (in-batch dup -> both novel); doc 7 (batch 3) repeats it and
    // must anchor to min(8, 16) = 8 as 'exact'; doc 5 (batch 1) is clean
    val src = tempDir("graft-ingest-fix")
    Seq((8L, words), (16L, words), (5L, other), (7L, words))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    val replay = s"${tempDir("graft-ingest-fixr")}/replay"
    IngestStream.stageReplay(sp, src, replay)
    val state = s"${tempDir("graft-ingest-fixs")}/state"
    val rows = IngestStream.classified(sp, replay, state)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(rows(8L).getString(1) == "novel" && rows(8L).isNullAt(2),
      s"in-batch dup classified against its own batch: ${rows(8L)}")
    assert(rows(16L).getString(1) == "novel" && rows(16L).isNullAt(2),
      s"in-batch dup classified against its own batch: ${rows(16L)}")
    assert(rows(5L).getString(1) == "novel")
    val r7 = rows(7L)
    assert(r7.getString(1) == "exact" && r7.getLong(2) == 8L
      && r7.getDouble(3) == 1.0,
      s"later copy should exact-anchor to the earliest ingested: $r7")

    // index law: the final fingerprint index holds one row per distinct
    // fp with the global min doc id (min-merge is slicing-independent) —
    // read through the manifest: a version dir now holds only the
    // buckets its batch touched
    val fp = IngestStream.indexTable(sp, state, "fp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp.size == 2, s"distinct fingerprints: ${fp.size}")
    // the index anchor is the min over EVERYTHING INGESTED (7 < 8), while
    // doc 7's own classification saw only earlier batches (anchor 8) —
    // the two minima are deliberately different quantities
    assert(fp.values.toSet == Set(5L, 7L),
      s"fp anchors must be global minima over ingested docs: $fp")
  }

  test("per-batch index writes touch only the batch's key buckets; GC bounds the state dir") {
    val sp = spark
    import sp.implicits._
    val conf = sp.sparkContext.hadoopConfiguration
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"v$i").mkString(" ")
    val src = tempDir("graft-ingest-bkt")
    Seq((8L, words), (16L, words), (5L, other), (7L, words))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    val replay = s"${tempDir("graft-ingest-bktr")}/replay"
    IngestStream.stageReplay(sp, src, replay)
    val state = s"${tempDir("graft-ingest-bkts")}/state"
    IngestStream.classified(sp, replay, state).collect()

    val fs = new org.apache.hadoop.fs.Path(state).getFileSystem(conf)
    val n = IngestIndex.numBuckets(sp)
    def bucketDirs(v: Int, table: String): Set[Int] = {
      val p = new org.apache.hadoop.fs.Path(s"$state/v$v/$table")
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("bkt=")).map(_.drop(4).toInt).toSet
    }
    def keyBuckets(keys: DataFrame, table: String): Set[Int] =
      keys.select(IngestIndex.bucketCol(table, n).as("bkt"))
        .distinct().collect().map(_.getInt(0)).toSet

    // WRITE LAW: each version's fp dir holds exactly the buckets of the
    // batch's fingerprints — batch 3 (doc 7, text `words`) must NOT
    // rewrite the bucket holding doc 5's fingerprint
    val wordsBkt = keyBuckets(Seq(words).toDF("text")
      .select(md5(col("text")).as("fp")), "fp")
    val otherBkt = keyBuckets(Seq(other).toDF("text")
      .select(md5(col("text")).as("fp")), "fp")
    assert(bucketDirs(1, "fp") == wordsBkt,
      s"v1 fp buckets ${bucketDirs(1, "fp")} != batch-0 key buckets $wordsBkt")
    assert(bucketDirs(2, "fp") == otherBkt,
      s"v2 fp buckets ${bucketDirs(2, "fp")} != batch-1 key buckets $otherBkt")
    assert(bucketDirs(3, "fp").isEmpty,
      "empty batch 2 must write NO index data, only a manifest")
    assert(bucketDirs(4, "fp") == wordsBkt,
      s"v4 fp buckets ${bucketDirs(4, "fp")} != batch-3 key buckets $wordsBkt")
    if (wordsBkt != otherBkt)
      assert(!bucketDirs(4, "fp").exists(otherBkt.contains),
        "batch 3 rewrote a bucket it never touched")

    // MANIFEST LAW: untouched buckets keep pointing at the version that
    // last wrote them; the final read still sees the full index
    val m4 = IngestIndex.readManifest(fs, state, 4L)
    if (wordsBkt != otherBkt) {
      assert(m4("fp")(otherBkt.head).ver == 2L,
        s"doc 5's bucket should still live in v2: ${m4("fp")}")
      assert(m4("fp")(wordsBkt.head).ver == 4L)
    }
    val fp = IngestStream.indexTable(sp, state, "fp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp == Map(
      sp.sql(s"SELECT md5('$words')").head.getString(0) -> 7L,
      sp.sql(s"SELECT md5('$other')").head.getString(0) -> 5L))

    // GC LAW: version dirs that no live bucket references are deleted —
    // the state dir is bounded by live buckets, not by stream age
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(state))
      .map(_.getPath.getName).filter(_.matches("v\\d+"))
      .map(_.drop(1).toInt).toSet
    val referenced = m4.values.flatMap(_.values).map(_.ver.toInt).toSet
    versions.filter(_ < 3).foreach(v => assert(referenced.contains(v),
      s"v$v survives GC but no manifest bucket references it"))
  }

  test("compact folds the tail into an epoch dir; contents unchanged; the stream resumes through it") {
    val sp = spark
    val conf = sp.sparkContext.hadoopConfiguration
    val full = s"${tempDir("graft-ingest-cpf")}/full"
    IngestStream.stageReplay(sp, sfDir, full)
    val replay = s"${tempDir("graft-ingest-cpr")}/replay"
    val state = s"${tempDir("graft-ingest-cps")}/state"
    val dir = new org.apache.hadoop.fs.Path(replay)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    def land(k: Int): Unit = {
      val name = f"batch-$k%04d.parquet"
      val dst = new org.apache.hadoop.fs.Path(dir, name)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$full/$name"), fs, dst, false, conf)
      ReplayStage.pinFile(fs, dst, k)
    }
    land(0); land(1)
    IngestStream.classified(sp, replay, state).collect()
    def fpRows(): Set[Seq[Any]] =
      IngestStream.indexTable(sp, state, "fp").collect().map(_.toSeq).toSet
    def versions(): Set[Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(state))
        .map(_.getPath.getName).filter(_.matches("v-?\\d+"))
        .map(_.drop(1).toLong).toSet
    val before = fpRows()
    val top = versions().max
    IngestIndex.compact(sp, state, top)
    // exactly the top version (manifest home) + the epoch dir survive;
    // the manifest points every bucket at the epoch
    // r14: compact keeps v(top-1) + its referenced tail as the
    // crash-replay fallback of the batch that committed v(top); the
    // next batch's GC reclaims it
    assert(versions() == Set(top, top - 1, -1L),
      s"compact must leave top + the replay-safety tail + one epoch dir: ${versions()}")
    assert(fpRows() == before, "compact changed the index contents")
    val m = IngestIndex.readManifest(fs, state, top)
    assert(m.values.flatMap(_.values.map(_.ver)).toSet == Set(-1L))
    // the version-numbering contract survives: later batches resume
    // against the compacted state and the final answer equals the twin
    land(2); land(3)
    val resumed = IngestStream.classified(sp, replay, state)
      .collect().toSeq
    assert(resumed == IngestStream.batchTwin(sp, sfDir).collect().toSeq,
      "resumption through a compacted index diverged from the twin")
  }

  test("a torn write (v(k+1) data present, manifest missing) is healed by trigger replay") {
    val sp = spark
    val conf = sp.sparkContext.hadoopConfiguration
    val full = s"${tempDir("graft-ingest-twf")}/full"
    IngestStream.stageReplay(sp, sfDir, full)
    val replay = s"${tempDir("graft-ingest-twr")}/replay"
    val state = s"${tempDir("graft-ingest-tws")}/state"
    val dir = new org.apache.hadoop.fs.Path(replay)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    def land(k: Int): Unit = {
      val name = f"batch-$k%04d.parquet"
      val dst = new org.apache.hadoop.fs.Path(dir, name)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$full/$name"), fs, dst, false, conf)
      ReplayStage.pinFile(fs, dst, k)
    }
    land(0); land(1)
    IngestStream.classified(sp, replay, state).collect()
    // simulate a crash mid-batch-2: v3 data partially written (garbage
    // in a bucket the batch will never touch), NO v3 manifest, stream
    // checkpoint never advanced past batch 1
    val torn = new org.apache.hadoop.fs.Path(s"$state/v3/fp/bkt=999")
    fs.mkdirs(torn)
    val g = fs.create(new org.apache.hadoop.fs.Path(torn, "garbage.parquet"), true)
    try g.write("not parquet".getBytes("UTF-8")) finally g.close()
    land(2); land(3)
    val resumed = IngestStream.classified(sp, replay, state).collect().toSeq
    assert(resumed == IngestStream.batchTwin(sp, sfDir).collect().toSeq,
      "resumption over a torn v(k+1) diverged from the twin")
    // the replayed trigger's overwrite replaced the torn table dir —
    // the garbage bucket is gone and no manifest ever references it
    assert(!fs.exists(torn), s"torn bucket survived the healing overwrite")
    val last = IngestIndex.latestVersion(fs, state).get
    val refs = IngestIndex.readManifest(fs, state, last)
      .values.flatMap(_.keys).toSet
    assert(!refs.contains(999))
  }

  test("an empty replay dir classifies nothing instead of failing on the output glob") {
    val sp = spark
    val replay = s"${tempDir("graft-ingest-empty")}/replay"
    val state = s"${tempDir("graft-ingest-empty-s")}/state"
    val dir = new org.apache.hadoop.fs.Path(replay)
    dir.getFileSystem(sp.sparkContext.hadoopConfiguration).mkdirs(dir)
    val out = IngestStream.classified(sp, replay, state)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq ==
      Seq("doc_id", "status", "anchor_doc", "est_sim"))
  }

  test("restart: a second invocation resumes from the checkpoint against the persisted index") {
    val sp = spark
    val full = s"${tempDir("graft-ingest-full")}/full"
    IngestStream.stageReplay(sp, sfDir, full)
    val replay = s"${tempDir("graft-ingest-half")}/replay"
    val state = s"${tempDir("graft-ingest-rs")}/state"
    val conf = sp.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(replay)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    // the crawl lands files over time: two before the "crash", two after
    def land(k: Int): Unit = {
      val name = f"batch-$k%04d.parquet"
      val dst = new org.apache.hadoop.fs.Path(dir, name)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$full/$name"), fs, dst, false, conf)
      ReplayStage.pinFile(fs, dst, k)
    }
    land(0); land(1)
    val first = IngestStream.classified(sp, replay, state).collect()
    val earlyIds = sp.read.parquet(s"$sfDir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(4)) < 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(first.map(_.getLong(0)).toSet == earlyIds,
      "first invocation must classify exactly the landed batches")

    land(2); land(3)
    val resumed = IngestStream.classified(sp, replay, state).collect().toSeq
    val twin = IngestStream.batchTwin(sp, sfDir).collect().toSeq
    // equality with the one-shot twin proves the resumed stream continued
    // from batchId 2 against index v2 (built on batches 0-1) — a reset to
    // version 0 would classify batch 2 as all-novel and diverge
    assert(resumed == twin,
      s"resumed crawl must equal the one-shot twin; first rows: ${resumed.take(3)}")
  }
}
