package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The storage engine under randomized use: for arbitrary keyed-batch
  * sequences (hot keys, repeated keys, empty batches), the
  * manifest read-back must equal the naive in-memory fold, every
  * surviving version dir must be reachable from the final manifest (or
  * be the replay-safety pair), and compaction must preserve contents.
  * The q104/q86/q114 fixtures pin specific rigs; this pins the
  * machinery itself — including bucket SPLITTING (r14): the same laws
  * under a tiny split threshold (every touched bucket splits every
  * batch), plus the sizing law splitting exists for (bucket byte size
  * stays bounded while the index grows >= 8x) and the auto-compaction
  * law (version-dir count stays bounded on a long replay with no
  * manual compact call).
  */
class IngestIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Replay `batches` through mergeCommit on the `state` table,
    * asserting the read-back == in-memory fold and the GC reachability
    * law after EVERY commit. Returns the final (manifest, stateDir). */
  private def replayAndCheck(state: String,
      batches: Seq[Seq[(Long, Long)]], tag: String)
      : (IngestIndex.Manifest, String) = {
    val sp = spark
    import sp.implicits._
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    val expected = scala.collection.mutable.Map.empty[Long, Long]
    batches.zipWithIndex.foreach { case (rows, k) =>
      val delta = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq
      delta.foreach { case (u, c) =>
        expected(u) = expected.getOrElse(u, 0L) + c
      }
      val m = IngestIndex.readManifest(fs, state, k.toLong)
      val stateMap = IngestIndex.mergeCommit(sp, state, m, "state",
        k + 1L,
        delta.toDF("user_id", "cnt"),
        (cur, d) => cur.unionByName(d).groupBy("user_id")
          .agg(sum(col("cnt")).as("cnt")))
      IngestIndex.writeManifest(fs, state, k + 1L,
        Map("state" -> stateMap))
      IngestIndex.gc(fs, state, k.toLong, k + 1L)

      // invariant after EVERY commit: read-back equals the fold so far
      val got =
        if (expected.isEmpty) Map.empty[Long, Long]
        else IngestIndex.currentTable(sp, state, "state")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected.toMap,
        s"$tag batch $k: read-back diverged from the fold")
      // invariant: every surviving version dir is referenced by the
      // live manifest OR the previous one (kept for the crash-replay
      // of the just-committed batch), or is the pair {k, k+1} itself,
      // or carries a manifest in either's delta CHAIN (r16)
      val live = (IngestIndex.readManifest(fs, state, k + 1L).values ++
        IngestIndex.readManifest(fs, state, k.toLong).values)
        .flatMap(_.values.map(_.ver)).toSet ++ Set(k.toLong, k + 1L) ++
        Seq(k.toLong, k + 1L)
          .flatMap(v => IngestIndex.resolveManifest(fs, state, v))
          .flatMap(_.chain)
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(state))
        .map(_.getPath.getName).filter(_.matches("v-?\\d+"))
        .map(_.drop(1).toLong).toSet
      val orphans = dirs.diff(live)
      assert(orphans.isEmpty,
        s"$tag batch $k: unreachable versions survive GC: $orphans")
    }
    if (expected.nonEmpty) {
      IngestIndex.compact(spark, state, batches.size.toLong)
      val got = IngestIndex.currentTable(spark, state, "state")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected.toMap, s"$tag: compact changed the contents")
    }
    (IngestIndex.readManifest(fs, state, batches.size.toLong), state)
  }

  test("random batch sequences: read-back == naive fold; GC leaves only reachable versions; compact preserves") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val state = java.nio.file.Files
        .createTempDirectory(s"graft-idx-prop$trial").toString + "/state"
      val keySpace = 1 + rnd.nextInt(40)
      val nBatches = 3 + rnd.nextInt(6)
      val batches = Seq.fill(nBatches)(Seq.fill(rnd.nextInt(30))(
        rnd.nextInt(keySpace).toLong -> (1 + rnd.nextInt(5)).toLong))
      replayAndCheck(state, batches, s"trial $trial")
    }
  }

  test("retention law (random): every manifest inside the newest-R window " +
    "stays fully readable as its prefix fold; older unreferenced dirs die") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(59)
    for (trial <- 1 to 2) {
      val retain = 2 + rnd.nextInt(4) // 2..5
      val state = java.nio.file.Files
        .createTempDirectory(s"graft-idx-retain$trial").toString + "/state"
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(sp.sparkContext.hadoopConfiguration)
      val keySpace = 1 + rnd.nextInt(30)
      val nBatches = retain + 3 + rnd.nextInt(4)
      val fold = scala.collection.mutable.Map.empty[Long, Long]
      // prefixFolds(v) = contents of manifest v (fold of batches 0..v-1)
      val prefixFolds =
        scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
      (0 until nBatches).foreach { k =>
        val rows = Seq.fill(1 + rnd.nextInt(20))(
          rnd.nextInt(keySpace).toLong -> (1 + rnd.nextInt(5)).toLong)
        val delta = rows.groupBy(_._1).view
          .mapValues(_.map(_._2).sum).toSeq
        delta.foreach { case (u, c) =>
          fold(u) = fold.getOrElse(u, 0L) + c
        }
        val m = IngestIndex.readManifest(fs, state, k.toLong)
        val stateMap = IngestIndex.mergeCommit(sp, state, m, "state",
          k + 1L, delta.toDF("user_id", "cnt"),
          (cur, d) => cur.unionByName(d).groupBy("user_id")
            .agg(sum(col("cnt")).as("cnt")))
        IngestIndex.writeManifest(fs, state, k + 1L,
          Map("state" -> stateMap))
        IngestIndex.gc(fs, state, k.toLong, k + 1L, retain)
        prefixFolds(k + 1L) = fold.toMap
        // EVERY retained version reads back exactly its prefix fold
        val lo = math.max(1L, k + 1L - retain + 1)
        (lo to k + 1L).foreach { v =>
          val got = IngestIndex.tableAt(sp, state, "state", v)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got == prefixFolds(v),
            s"trial $trial retain=$retain: snapshot v$v diverged " +
              s"from its prefix fold after batch $k")
        }
        // storage bound: a surviving dir is referenced by a retained
        // manifest, is a retained version itself, or carries a manifest
        // in a retained version's delta chain (r16)
        val live = (lo to k + 1L)
          .flatMap(v => IngestIndex.readManifest(fs, state, v).values)
          .flatMap(_.values.map(_.ver)).toSet ++ (lo to k + 1L) ++
          (lo to k + 1L)
            .flatMap(v => IngestIndex.resolveManifest(fs, state, v))
            .flatMap(_.chain)
        val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(state))
          .map(_.getPath.getName).filter(_.matches("v-?\\d+"))
          .map(_.drop(1).toLong).toSet
        val orphans = dirs.diff(live)
        assert(orphans.isEmpty,
          s"trial $trial retain=$retain batch $k: dirs outside the " +
            s"retention reference set survive GC: $orphans")
      }
    }
  }

  test("empty split child keeps a live sentinel entry — the reviewed " +
    "data-loss sequence (recreated base re-split orphaning its sibling) " +
    "cannot occur") {
    val sp = spark
    import sp.implicits._
    // find k1, k2 sharing a base bucket (mod 16) but landing in
    // DIFFERENT gen-1 children (mod 32): k2's lone occupancy makes the
    // other child empty on split; k1 is covered by that empty child
    val rows = (0L until 4096L).toDF("k")
      .select(col("k"),
        pmod(xxhash64(col("k")), lit(16L)).cast("int").as("b16"),
        pmod(xxhash64(col("k")), lit(32L)).cast("int").as("b32"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val (k1, k2) = rows.groupBy(_._2).valuesIterator
      .flatMap { g =>
        val byChild = g.groupBy(_._3)
        if (byChild.size >= 2) {
          val two = byChild.values.take(2).toSeq
          Some((two(0).head._1, two(1).head._1))
        } else None
      }.next()
    withConf("spark.graft.ingest.indexBuckets" -> "16",
        "spark.graft.ingest.splitBytes" -> "1") {
      val state = java.nio.file.Files
        .createTempDirectory("graft-idx-sentinel").toString + "/state"
      // batch0: k2 seeds the base bucket; batch1: re-touch splits it,
      // leaving k1's gen-1 cover EMPTY; batch2: k1 must route to that
      // child (not recreate the base at gen 0); batch3: re-touching k1
      // splits again — under the pre-fix entry-drop this sequence
      // orphaned k2's data (read-back Map(k1 -> 2), k2 gone)
      val batches = Seq(Seq(k2 -> 1L), Seq(k2 -> 1L),
        Seq(k1 -> 1L), Seq(k1 -> 1L))
      val (m, _) = replayAndCheck(state, batches, "sentinel")
      // the machinery actually exercised the sentinel path: some entry
      // must have carried EmptyVer at some point — at minimum the final
      // manifest's gens advanced past 0 on both keys' covers
      assert(m("state").values.exists(_.gen > 0))
    }
  }

  test("split stress: splitBytes=1 forces every touched bucket to split every batch; all laws hold") {
    withConf("spark.graft.ingest.splitBytes" -> "1") {
      val rnd = new scala.util.Random(47)
      val state = java.nio.file.Files
        .createTempDirectory("graft-idx-split-stress").toString + "/state"
      val batches = Seq.fill(6)(Seq.fill(10 + rnd.nextInt(20))(
        rnd.nextInt(25).toLong -> (1 + rnd.nextInt(5)).toLong))
      val (m, _) = replayAndCheck(state, batches, "split-stress")
      // the point of the stress: generations actually advanced
      assert(m("state").values.map(_.gen).max >= 2,
        s"splitBytes=1 never advanced a generation: ${m("state")}")
    }
  }

  test("sizing law: bucket byte size stays bounded while the index grows >= 8x") {
    val sp = spark
    import sp.implicits._
    // 4 base buckets, small split target; keys 0..1023 with a 512-char
    // incompressible payload arrive over 8 batches — live data grows
    // ~8x from batch 0 (payload deterministic per id so the fold check
    // and any replay see identical bytes)
    val thr = 24 * 1024L
    def payload(id: Long): String =
      new scala.util.Random(id).alphanumeric.take(512).mkString
    withConf("spark.graft.ingest.indexBuckets" -> "4",
        "spark.graft.ingest.splitBytes" -> thr.toString) {
      val state = java.nio.file.Files
        .createTempDirectory("graft-idx-sizing").toString + "/state"
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(sp.sparkContext.hadoopConfiguration)
      val expected = scala.collection.mutable.Map.empty[Long, String]
      var maxBucketBytes = 0L
      var firstLive = 0L
      (0 until 8).foreach { k =>
        val rows = (0 until 128).map { i =>
          val id = (k * 128 + i).toLong
          id -> payload(id)
        }
        rows.foreach { case (u, p) => expected(u) = p }
        val m = IngestIndex.readManifest(fs, state, k.toLong)
        val stateMap = IngestIndex.mergeCommit(sp, state, m, "state",
          k + 1L, rows.toDF("user_id", "pad"),
          (cur, d) => cur.unionByName(d).groupBy("user_id")
            .agg(max(col("pad")).as("pad")))
        IngestIndex.writeManifest(fs, state, k + 1L,
          Map("state" -> stateMap))
        IngestIndex.gc(fs, state, k.toLong, k + 1L)
        // measure every live bucket's current bytes
        val nm = IngestIndex.readManifest(fs, state, k + 1L)
        val sizes = nm("state").toSeq.map { case (b, e) =>
          val p = new org.apache.hadoop.fs.Path(
            s"$state/v${e.ver}/state/bkt=$b")
          if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
        }
        if (k == 0) firstLive = sizes.sum
        maxBucketBytes = math.max(maxBucketBytes, sizes.max)
      }
      val finalM = IngestIndex.readManifest(fs, state, 8L)
      val finalSizes = finalM("state").toSeq.map { case (b, e) =>
        val p = new org.apache.hadoop.fs.Path(
          s"$state/v${e.ver}/state/bkt=$b")
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      }
      assert(finalSizes.sum >= 8 * firstLive / 2,
        s"rig did not grow the index enough: ${finalSizes.sum} vs first $firstLive")
      // THE law: no live bucket ever exceeded threshold + one batch's
      // worth of one bucket's delta (a bucket splits on the merge AFTER
      // crossing the target, so the overshoot is bounded by one batch
      // slice plus parquet per-file overhead)
      val bound = 2 * thr
      assert(maxBucketBytes <= bound,
        s"bucket byte size unbounded under splitting: max $maxBucketBytes > $bound")
      assert(finalM("state").size > 4,
        "index grew 8x but bucket count never grew")
      assert(finalM("state").values.map(_.gen).max >= 1,
        "no split generation advanced")
      // contents survived every split
      val got = IngestIndex.currentTable(sp, state, "state")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected.toMap, "read-back diverged under splitting")
    }
  }

  test("broadcast topology: gated assignBucket == literal bucketCol row " +
    "for row; store laws hold with every assignment going through the gate") {
    val sp = spark
    import sp.implicits._
    // direct twin on a synthetic multi-generation topology (finest
    // modulus first: gen-2 ids {5, 21} under mod 32, gen-1 {3, 11}
    // under mod 16, base mod 8)
    val gens = Map(3 -> 1, 11 -> 1, 5 -> 2, 21 -> 2)
    val df = (0L until 20000L).toDF("user_id")
    val literal = IngestIndex.assignBucket(df, "state", 8, gens)
      .select("user_id", "bkt").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    withConf("spark.graft.ingest.topologyBroadcastMinIds" -> "1") {
      val gated = IngestIndex.assignBucket(df, "state", 8, gens)
      val got = gated.select("user_id", "bkt").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === literal,
        "broadcast topology assignment diverged from the literal formula")
      // the representation actually changed: ids ride as broadcast join
      // data, not plan literals
      val plan = gated.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastExchange")
        || plan.contains("BroadcastHashJoin"),
        s"gated assignBucket shows no broadcast join:\n$plan")
    }
    // the full machinery under the gate + forced splitting: every write,
    // probe and merge assignment rides the broadcast map on a REAL
    // multi-generation store, and every read-back/GC law still holds
    withConf("spark.graft.ingest.topologyBroadcastMinIds" -> "1",
        "spark.graft.ingest.splitBytes" -> "1") {
      val rnd = new scala.util.Random(61)
      val state = java.nio.file.Files
        .createTempDirectory("graft-idx-bcast").toString + "/state"
      val batches = Seq.fill(5)(Seq.fill(10 + rnd.nextInt(15))(
        rnd.nextInt(20).toLong -> (1 + rnd.nextInt(4)).toLong))
      val (m, _) = replayAndCheck(state, batches, "bcast-topology")
      assert(m("state").values.exists(_.gen > 0),
        "rig never advanced a generation — the gate was never exercised " +
          "on a split topology")
    }
  }

  test("time-based gc retention: every version younger than the window " +
    "stays readable past the count floor; dropping the window evicts loudly") {
    val sp = spark
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory("graft-idx-agegc").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    val fold = scala.collection.mutable.Map.empty[Long, Long]
    val prefixFolds =
      scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
    val hour = 3600L * 1000
    (0 until 6).foreach { k =>
      // every batch touches EVERY key: each version fully supersedes its
      // predecessor, so the wall-clock window is the ONLY thing keeping
      // history alive (a partially-superseded version would survive on
      // data references alone and never exercise the age rule)
      val rows = (0L to 9L).map(_ -> (k + 1).toLong)
      rows.foreach { case (u, c) => fold(u) = fold.getOrElse(u, 0L) + c }
      val m = IngestIndex.readManifest(fs, state, k.toLong)
      val stateMap = IngestIndex.mergeCommit(sp, state, m, "state",
        k + 1L, rows.toDF("user_id", "cnt"),
        (cur, d) => cur.unionByName(d).groupBy("user_id")
          .agg(sum(col("cnt")).as("cnt")))
      IngestIndex.writeManifest(fs, state, k + 1L,
        Map("state" -> stateMap))
      // count floor = the crash-replay minimum (2); the WALL-CLOCK
      // window is what keeps history alive
      IngestIndex.gc(fs, state, k.toLong, k + 1L, retain = 2,
        retainMillis = hour)
      prefixFolds(k + 1L) = fold.toMap
    }
    // every snapshot is younger than the window: ALL of them readable,
    // each equal to its prefix fold — count-based retain=2 alone would
    // have evicted v1..v4 (the q121 loud-eviction law pins that side)
    (1L to 6L).foreach { v =>
      val got = IngestIndex.tableAt(sp, state, "state", v)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == prefixFolds(v), s"young snapshot v$v diverged")
    }
    // compaction HONORS the window (r15 review: the half-plumbed
    // variant of the r14 advisor bug): a compact pass with the same
    // retainMillis keeps every young snapshot readable
    IngestIndex.compact(sp, state, 6L, retain = 2, retainMillis = hour)
    (1L to 6L).foreach { v =>
      val got = IngestIndex.tableAt(sp, state, "state", v)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == prefixFolds(v),
        s"compact evicted young snapshot v$v despite the window")
    }
    // drop the window: the count floor alone applies — history evicts,
    // and an AS-OF read of an evicted version fails loudly
    IngestIndex.gc(fs, state, 5L, 6L, retain = 2, retainMillis = 0L)
    val ex = intercept[IllegalArgumentException] {
      IngestIndex.tableAt(sp, state, "state", 1L)
    }
    assert(ex.getMessage.contains("retention"))
    // the replay/read law is unchanged: current == the full fold
    val cur = IngestIndex.currentTable(sp, state, "state")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cur == prefixFolds(6L))
  }

  test("deletion vectors: dv-read == eager filter; a DV commit writes no " +
    "base-table bucket; vectors accumulate; materialize applies and clears") {
    val sp = spark
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory("graft-idx-dv").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    def read(m: IngestIndex.Manifest): Map[Long, Long] =
      IngestIndex.readWithDv(sp, state, m, "state", Seq("user_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = (0L until 200L).map(u => (u, u * 3 + 1))
    val base = rows.toDF("user_id", "cnt")
    val m1: IngestIndex.Manifest = Map("state" ->
      IngestIndex.mergeCommit(sp, state, Map.empty, "state", 1L, base,
        (_, d) => d))
    IngestIndex.writeManifest(fs, state, 1L, m1)
    // v2: soft-delete keys % 3 == 0 — write IO must be the tombstones
    // alone: the version dir holds the DV table and NO base-table bucket
    val m2 = IngestIndex.deleteWithDv(sp, state, m1, "state", 2L,
      base.filter(col("user_id") % 3 === 0).select("user_id"))
    IngestIndex.writeManifest(fs, state, 2L, m2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$state/v2/state")),
      "a DV delete rewrote base-table buckets — the O(tombstones) claim " +
        "is the point of the feature")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$state/v2/state__dv")))
    val want2 = rows.filter(_._1 % 3 != 0).toMap
    assert(read(m2) == want2)
    // v3: a second vector accumulates (disjoint-predicate union)
    val m3 = IngestIndex.deleteWithDv(sp, state, m2, "state", 3L,
      base.filter(col("user_id") % 7 === 1).select("user_id"))
    IngestIndex.writeManifest(fs, state, 3L, m3)
    val want3 = rows.filter(r => r._1 % 3 != 0 && r._1 % 7 != 1).toMap
    assert(read(m3) == want3)
    // an absent-key tombstone is a no-op
    val m4 = IngestIndex.deleteWithDv(sp, state, m3, "state", 4L,
      Seq(10000L).toDF("user_id"))
    IngestIndex.writeManifest(fs, state, 4L, m4)
    assert(read(m4) == want3)
    // materialize: the vector applies through the eager touched-bucket
    // merge and clears — plain reads now see the survivors directly
    val m5 = IngestIndex.materializeDeletes(sp, state, m4, "state", 5L,
      Seq("user_id"))
    IngestIndex.writeManifest(fs, state, 5L, m5)
    assert(!m5.contains("state__dv"),
      "materialize must drop the DV from the manifest")
    val plain = IngestIndex.readTable(sp, state, m5, "state", None,
        sp.emptyDataFrame).drop("bkt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plain == want3, "materialized table diverged from the dv-read")
    assert(read(m5) == want3, "dv-read after materialize (no vector) " +
      "must equal the plain read")
    // edge (r15 review): a DV over a table with NO live base data short-
    // circuits to the plain empty read instead of failing to resolve the
    // key columns in the anti-join
    val state2 = java.nio.file.Files
      .createTempDirectory("graft-idx-dv2").toString + "/state"
    val fs2 = new org.apache.hadoop.fs.Path(state2)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    val mOnlyDv = IngestIndex.deleteWithDv(sp, state2, Map.empty, "state",
      1L, Seq(5L).toDF("user_id"))
    IngestIndex.writeManifest(fs2, state2, 1L, mOnlyDv)
    assert(IngestIndex
      .readWithDv(sp, state2, mOnlyDv, "state", Seq("user_id"))
      .count() === 0L)
  }

  test("auto-compaction keeps version-dir count bounded on a long replay with no manual call") {
    val sp = spark
    import sp.implicits._
    withConf("spark.graft.ingest.autoCompactVersions" -> "4") {
      val state = java.nio.file.Files
        .createTempDirectory("graft-idx-autocompact").toString + "/state"
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(sp.sparkContext.hadoopConfiguration)
      val expected = scala.collection.mutable.Map.empty[Long, Long]
      var maxDirs = 0
      (0 until 12).foreach { k =>
        // one hot key + one fresh key per batch: the hot bucket pins old
        // versions alive under plain GC, fresh keys spread references
        val rows = Seq(0L -> 1L, (k + 1).toLong -> 1L)
        rows.foreach { case (u, c) =>
          expected(u) = expected.getOrElse(u, 0L) + c
        }
        val m = IngestIndex.readManifest(fs, state, k.toLong)
        val stateMap = IngestIndex.mergeCommit(sp, state, m, "state",
          k + 1L, rows.toDF("user_id", "cnt"),
          (cur, d) => cur.unionByName(d).groupBy("user_id")
            .agg(sum(col("cnt")).as("cnt")))
        IngestIndex.writeManifest(fs, state, k + 1L,
          Map("state" -> stateMap))
        IngestIndex.gc(fs, state, k.toLong, k + 1L)
        IngestIndex.maybeCompact(sp, state, k + 1L)
        maxDirs = math.max(maxDirs,
          fs.listStatus(new org.apache.hadoop.fs.Path(state))
            .map(_.getPath.getName).count(_.matches("v-?\\d+")))
      }
      // threshold 4 + the post-compact replay tail: never more than
      // threshold + a small constant
      assert(maxDirs <= 7,
        s"auto-compaction failed to bound version dirs: $maxDirs")
      val got = IngestIndex.currentTable(sp, state, "state")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected.toMap,
        "auto-compaction changed the contents")
    }
  }

  test("delta manifests: every version round-trips through its chain, " +
    "deltas genuinely appear, folds reset the depth, and rewrites are " +
    "byte-identical") {
    val rnd = new scala.util.Random(211)
    val state = java.nio.file.Files
      .createTempDirectory("graft-idx-dmani").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(state))
    def manifestBytes(v: Long): String = {
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$state/v$v/manifest"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    // random manifest evolution: add/replace/remove entries per version
    var cur: IngestIndex.Manifest = Map.empty
    val written = scala.collection.mutable.Map.empty[Long,
      IngestIndex.Manifest]
    val foldEvery = 3
    (1L to 9L).foreach { v =>
      val table = if (rnd.nextBoolean()) "state" else "vec"
      val bkts = cur.getOrElse(table, Map.empty[Int, IngestIndex.Bkt])
      val upserts = Seq.fill(1 + rnd.nextInt(3))(
        rnd.nextInt(8) -> IngestIndex.Bkt(v, rnd.nextInt(2)))
      val dropped = bkts.keySet.filter(_ => rnd.nextInt(4) == 0)
      val nb = (bkts -- dropped) ++ upserts
      cur = if (nb.isEmpty) cur - table else cur + (table -> nb)
      IngestIndex.writeManifest(fs, state, v, cur, foldEvery)
      written(v) = cur
      // every prior version still resolves to exactly what was written
      (1L to v).foreach { p =>
        assert(IngestIndex.readManifest(fs, state, p) === written(p),
          s"v$p diverged after writing v$v")
      }
    }
    // chain shape: depth cycles under the fold policy — some deltas and
    // some non-trivial folds must exist
    val depths = (1L to 9L).map(v =>
      v -> IngestIndex.resolveManifest(fs, state, v).get.depth).toMap
    assert(depths.values.max === foldEvery - 1, s"depths: $depths")
    assert(depths.values.count(_ == 0) >= 2, s"no fold happened: $depths")
    // (the #op provenance header precedes the #delta header since r17)
    assert((1L to 9L).exists(v => manifestBytes(v).linesIterator
        .exists(_.startsWith("#delta"))),
      "no delta file was ever written")
    assert((1L to 9L).forall(v =>
        manifestBytes(v).startsWith("#op\t")),
      "every r17 manifest carries its operation tag header")
    // replay byte-identity: rewriting any version with the same map
    // yields the same bytes
    (1L to 9L).foreach { v =>
      val before = manifestBytes(v)
      IngestIndex.writeManifest(fs, state, v, written(v), foldEvery)
      assert(manifestBytes(v) === before, s"v$v rewrite not byte-identical")
    }
  }

  test("delta manifests: per-trigger manifest IO is O(touched), not " +
    "O(buckets) — a 100k-bucket store's delta commit writes KBs") {
    val state = java.nio.file.Files
      .createTempDirectory("graft-idx-dsize").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(state))
    // v1: a synthetic 100k-live-bucket manifest (the ~100 TB regime at
    // the 128 MB bucket target is ~10^6; 10^5 keeps the spec fast and
    // the conclusion identical)
    val big: IngestIndex.Manifest = Map("state" ->
      (0 until 100000).map(b => b -> IngestIndex.Bkt(1L, 0)).toMap)
    IngestIndex.writeManifest(fs, state, 1L, big)
    // v2: a trigger touching 12 buckets
    val touched = (0 until 12).map(b => b * 97)
    val m2: IngestIndex.Manifest = Map("state" ->
      (big("state") ++ touched.map(b => b -> IngestIndex.Bkt(2L, 0))))
    IngestIndex.writeManifest(fs, state, 2L, m2)
    def len(v: Long): Long = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$state/v$v/manifest")).getLen
    assert(len(1L) > 1000000L, s"base unexpectedly small: ${len(1L)}")
    assert(len(2L) < 4096L,
      s"delta commit wrote ${len(2L)} bytes — O(buckets), not O(touched)")
    assert(IngestIndex.readManifest(fs, state, 2L) === m2)
    // and the memoized steady state: resolving v2 again re-reads nothing
    // heavier than a stat (cannot observe IO directly — assert the memo
    // path returns the identical object)
    val r1 = IngestIndex.resolveManifest(fs, state, 2L).get
    val r2 = IngestIndex.resolveManifest(fs, state, 2L).get
    assert(r1 eq r2, "memo miss on an unchanged manifest")
  }

  test("random verb interleavings: commits, compact, and RESTORE " +
    "compose under delta manifests — read-back always equals the model") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(271)
    for (trial <- 1 to 2) {
      val state = java.nio.file.Files
        .createTempDirectory(s"graft-idx-verbs$trial").toString + "/state"
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(sp.sparkContext.hadoopConfiguration)
      // the pure model: current contents + the full per-version history
      var cur = Map.empty[Long, Long]
      val hist = scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
      var v = 0L
      (1 to 12).foreach { step =>
        val roll = rnd.nextInt(10)
        if (roll < 6 || v < 2) {
          // COMMIT a random keyed batch
          val rows = Seq.fill(1 + rnd.nextInt(12))(
            rnd.nextInt(20).toLong -> (1 + rnd.nextInt(4)).toLong)
          val delta = rows.groupBy(_._1).view
            .mapValues(_.map(_._2).sum).toSeq
          delta.foreach { case (u, c) =>
            cur = cur + (u -> (cur.getOrElse(u, 0L) + c))
          }
          val m = IngestIndex.readManifest(fs, state, v)
          val stateMap = IngestIndex.mergeCommit(sp, state, m, "state",
            v + 1, delta.toDF("user_id", "cnt"),
            (c, d) => c.unionByName(d).groupBy("user_id")
              .agg(sum(col("cnt")).as("cnt")))
          IngestIndex.writeManifest(fs, state, v + 1,
            Map("state" -> stateMap))
          v += 1
          hist(v) = cur
        } else if (roll < 8) {
          // COMPACT (retain everything: restore targets must survive)
          IngestIndex.compact(sp, state, v, retain = 50)
        } else {
          // RESTORE to a random earlier version
          val tv = 1L + rnd.nextInt(v.toInt - 1)
          IngestIndex.restore(fs, state, tv, v + 1)
          v += 1
          cur = hist(tv)
          hist(v) = cur
        }
        val got = IngestIndex.currentTable(sp, state, "state")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == cur,
          s"trial $trial step $step (v=$v): read-back diverged from model")
      }
      // and the whole retained history still time-travels correctly
      (1L to v).foreach { pv =>
        val got = IngestIndex.tableAt(sp, state, "state", pv)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == hist(pv), s"trial $trial: snapshot v$pv diverged")
      }
    }
  }

  test("describeHistory: every retained version listed newest-first " +
    "with its delta depth and live-bucket count; evicted versions absent") {
    val sp = spark
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory("graft-idx-history").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    (0 until 5).foreach { k =>
      val m = IngestIndex.readManifest(fs, state, k.toLong)
      val stateMap = IngestIndex.mergeCommit(sp, state, m, "state",
        k + 1L, Seq((k.toLong, 1L)).toDF("user_id", "cnt"),
        (cur, d) => cur.unionByName(d).groupBy("user_id")
          .agg(sum(col("cnt")).as("cnt")))
      IngestIndex.writeManifest(fs, state, k + 1L, Map("state" -> stateMap))
    }
    val h = IngestIndex.describeHistory(fs, state)
    assert(h.map(_.version) === Seq(5L, 4L, 3L, 2L, 1L),
      s"history order: $h")
    assert(h.last.deltaDepth === 0, "v1 must be a base")
    assert(h.head.deltaDepth === 4, "v5 must be the 4th delta in chain")
    // live buckets grow monotonically here (each batch adds a new key;
    // 5 distinct keys may share buckets, so compare ends only)
    assert(h.head.liveBuckets >= h.last.liveBuckets)
    assert(h.forall(_.tables === 1))
    assert(h.forall(_.manifestMtime > 0L))
    // gc evicts old versions -> history shrinks to the retained window
    IngestIndex.gc(fs, state, 4L, 5L)
    val h2 = IngestIndex.describeHistory(fs, state)
    assert(h2.map(_.version).toSet.subsetOf(Set(5L, 4L, 3L, 2L, 1L)))
    assert(h2.map(_.version).contains(5L) && h2.map(_.version).contains(4L))
  }

  test("manifest commits are conflict-checked: a different-content " +
    "commit of an existing version fails loudly; byte-identical replay " +
    "and declared repoints pass") {
    val state = java.nio.file.Files
      .createTempDirectory("graft-idx-conflict").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(state))
    val a: IngestIndex.Manifest =
      Map("state" -> Map(0 -> IngestIndex.Bkt(1L, 0)))
    val b: IngestIndex.Manifest =
      Map("state" -> Map(0 -> IngestIndex.Bkt(1L, 0),
        1 -> IngestIndex.Bkt(1L, 0)))
    IngestIndex.writeManifest(fs, state, 1L, a)
    // byte-identical rewrite (the replay path) passes
    IngestIndex.writeManifest(fs, state, 1L, a)
    // a second writer committing DIFFERENT content at the same version
    // is the silent-lost-commit race — it must fail loudly
    val err = intercept[IllegalStateException] {
      IngestIndex.writeManifest(fs, state, 1L, b)
    }
    assert(err.getMessage.contains("concurrent-writer conflict"),
      err.getMessage)
    assert(IngestIndex.readManifest(fs, state, 1L) === a,
      "the losing writer must not have clobbered the committed version")
    // a declared repoint (compaction's rewrite) is the exception
    IngestIndex.writeManifest(fs, state, 1L, b, repoint = true)
    assert(IngestIndex.readManifest(fs, state, 1L) === b)
    // and the compact-crash-replay path: overwriting a manifest whose
    // every ref is a negative epoch version (the repoint signature) with
    // the replayed original passes without the flag
    val epoch: IngestIndex.Manifest =
      Map("state" -> Map(0 -> IngestIndex.Bkt(-1L, 0)))
    IngestIndex.writeManifest(fs, state, 2L, epoch)
    IngestIndex.writeManifest(fs, state, 2L, a) // replay over repoint
    assert(IngestIndex.readManifest(fs, state, 2L) === a)
  }

  test("delta manifests: gc keeps chain parents of retained snapshots " +
    "readable and reclaims them after a fold supersedes the chain") {
    val sp = spark
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory("graft-idx-dgc").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    val expected = scala.collection.mutable.Map.empty[Long, Long]
    // default foldEvery=8: versions 2..8 are deltas chained to base v1;
    // retain=2 keeps only {k, k+1} manifests protected, yet every chain
    // parent must survive for them to RESOLVE
    (0 until 10).foreach { k =>
      val rows = Seq((k % 3).toLong -> 1L, (10 + k).toLong -> 2L)
      rows.foreach { case (u, c) =>
        expected(u) = expected.getOrElse(u, 0L) + c
      }
      val m = IngestIndex.readManifest(fs, state, k.toLong)
      val stateMap = IngestIndex.mergeCommit(sp, state, m, "state",
        k + 1L, rows.toDF("user_id", "cnt"),
        (cur, d) => cur.unionByName(d).groupBy("user_id")
          .agg(sum(col("cnt")).as("cnt")))
      IngestIndex.writeManifest(fs, state, k + 1L, Map("state" -> stateMap))
      IngestIndex.gc(fs, state, k.toLong, k + 1L)
      // the current manifest RESOLVES after every gc (chain intact) and
      // equals the fold
      val got = IngestIndex.currentTable(sp, state, "state")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected.toMap, s"batch $k: chain tore under gc")
    }
    // after the v9 fold (depth resets at 8 deltas), the pre-fold chain
    // parents that nothing references anymore must be GONE — gc did not
    // turn chain protection into keep-everything
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(state))
      .map(_.getPath.getName).filter(_.matches("v-?\\d+"))
      .map(_.drop(1).toLong).toSet
    val chainNow = Seq(9L, 10L)
      .flatMap(v => IngestIndex.resolveManifest(fs, state, v))
      .flatMap(_.chain).toSet
    val referencedNow = Seq(9L, 10L)
      .flatMap(v => IngestIndex.readManifest(fs, state, v).values)
      .flatMap(_.values.map(_.ver)).toSet
    assert(dirs.subsetOf(chainNow ++ referencedNow ++ Set(9L, 10L)),
      s"unreachable dirs survive: ${dirs -- chainNow -- referencedNow}")
  }

  test("true CAS commit (r17): two genuinely interleaved committers " +
    "racing one version — exactly one wins, the loser fails loudly, " +
    "and the committed content is the winner's") {
    (1 to 5).foreach { trial =>
      val state = java.nio.file.Files
        .createTempDirectory(s"graft-idx-cas$trial").toString + "/state"
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new org.apache.hadoop.fs.Path(state))
      val a: IngestIndex.Manifest =
        Map("state" -> Map(0 -> IngestIndex.Bkt(1L, 0)))
      val b: IngestIndex.Manifest =
        Map("state" -> Map(1 -> IngestIndex.Bkt(1L, 0)))
      val gate = new java.util.concurrent.CyclicBarrier(2)
      val outcomes =
        new java.util.concurrent.ConcurrentLinkedQueue[
          Either[Throwable, String]]()
      def committer(m: IngestIndex.Manifest, tag: String): Thread = {
        val t = new Thread(() => {
          gate.await()
          try {
            IngestIndex.writeManifest(fs, state, 1L, m)
            outcomes.add(Right(tag)); ()
          } catch { case e: Throwable => outcomes.add(Left(e)); () }
        })
        t.start(); t
      }
      val ts = Seq(committer(a, "a"), committer(b, "b"))
      ts.foreach(_.join(30000))
      val (losers, winners) = {
        import scala.jdk.CollectionConverters._
        outcomes.asScala.toSeq.partition(_.isLeft)
      }
      assert(winners.size == 1 && losers.size == 1,
        s"trial $trial: expected exactly one winner/loser, got $outcomes")
      val loserErr = losers.head.left.toOption.get
      assert(loserErr.isInstanceOf[IllegalStateException] &&
        loserErr.getMessage.contains("concurrent-writer conflict"),
        s"trial $trial: loser's error: $loserErr")
      val committed = IngestIndex.readManifest(fs, state, 1L)
      val winner = winners.head.toOption.get
      assert(committed === (if (winner == "a") a else b),
        s"trial $trial: committed content is not the winner's")
      // the winner's replay (byte-identical rewrite) still passes
      IngestIndex.writeManifest(fs, state, 1L,
        if (winner == "a") a else b)
    }
  }

  test("optimistic commit retry (r18): two threaded committers with " +
    "disjoint key sets BOTH land, serialized — content == sequential " +
    "execution in either order") {
    val sp = spark
    import sp.implicits._
    val addC = graft.queries.MergeOps.addCombine
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    def frame(rows: Seq[(Long, Long, Double)]) =
      rows.toDF("user_id", "n_events", "sum_value")
        .select(col("user_id"), col("n_events"),
          col("sum_value").cast(dec).as("sum_value"))
    val a = Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (17L, 1L, 3.0))
    val b = Seq((100L, 4L, 4.0), (101L, 5L, 5.0), (999L, 2L, 6.0))
    def contentOf(state: String): Map[Long, (Long, BigDecimal)] =
      IngestIndex.currentTable(sp, state, "state").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), BigDecimal(r.getDecimal(2))))
        .toMap
    // sequential reference, order A;B
    val ref = java.nio.file.Files
      .createTempDirectory("graft-idx-retryref").toString + "/state"
    IngestIndex.commitRetry(sp, ref, "state", frame(a), addC, op = "merge")
    IngestIndex.commitRetry(sp, ref, "state", frame(b), addC, op = "merge")
    val want = contentOf(ref)
    (1 to 3).foreach { trial =>
      val state = java.nio.file.Files
        .createTempDirectory(s"graft-idx-retry$trial").toString + "/state"
      val gate = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def committer(rows: Seq[(Long, Long, Double)]): Thread = {
        val t = new Thread(() => {
          gate.await()
          try {
            IngestIndex.commitRetry(sp, state, "state", frame(rows),
              addC, op = "merge")
            ()
          } catch { case e: Throwable => errs.add(e); () }
        })
        t.start(); t
      }
      val ts = Seq(committer(a), committer(b))
      ts.foreach(_.join(120000))
      assert(errs.isEmpty, s"trial $trial: a committer failed: " +
        s"${Option(errs.peek()).map(_.toString)}")
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(sp.sparkContext.hadoopConfiguration)
      assert(IngestIndex.latestVersion(fs, state).contains(2L),
        "both committers must land at successive versions")
      assert(contentOf(state) == want,
        s"trial $trial: threaded content != sequential reference")
    }
  }

  test("commit retry conflict path (r18): a rival landing the same " +
    "version mid-transaction triggers a rebase when footprints are " +
    "disjoint and a NAMED conflict when they overlap") {
    val sp = spark
    import sp.implicits._
    val addC = graft.queries.MergeOps.addCombine
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    def frame(rows: Seq[(Long, Long, Double)]) =
      rows.toDF("user_id", "n_events", "sum_value")
        .select(col("user_id"), col("n_events"),
          col("sum_value").cast(dec).as("sum_value"))
    val state = java.nio.file.Files
      .createTempDirectory("graft-idx-retryx").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    // v1: one row
    IngestIndex.commitRetry(sp, state, "state",
      frame(Seq((1L, 1L, 1.0))), addC, op = "merge")
    val m1 = IngestIndex.readManifest(fs, state, 1L)
    // DISJOINT rival: between the merge and the manifest write of the
    // next transaction, land a manifest-only rival at the same version
    // touching a bucket the transaction's delta does not (its entry
    // repoints an EXISTING v1 bucket — data-valid, different bytes)
    val rivalCell = m1("state").head._1
    var fired = false
    IngestIndex.commitRetryTestHook = { next =>
      if (!fired) {
        fired = true
        IngestIndex.writeManifest(fs, state, next,
          Map("state" -> (m1("state") +
            (rivalCell -> m1("state")(rivalCell)) +
            ((rivalCell + 1000) -> IngestIndex.Bkt(1L, 0)))),
          op = "rival")
      }
    }
    try {
      // the delta's key hashes to SOME bucket; the rival touched cell
      // rivalCell+1000, which no real key maps to — footprints disjoint
      val v = IngestIndex.commitRetry(sp, state, "state",
        frame(Seq((2L, 2L, 2.0))), addC, op = "merge")
      assert(v == 3L, s"the loser must rebase to v3, landed v$v")
      assert(fired)
      val got = IngestIndex.currentTable(sp, state, "state")
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L), s"rebased content wrong: $got")
    } finally IngestIndex.commitRetryTestHook = _ => ()
    // OVERLAPPING rival: same trick, but the rival rewrites exactly the
    // bucket the delta touches — named conflict, no silent rebase
    val m3 = IngestIndex.readManifest(fs, state, 3L)
    val deltaBkt = IngestIndex
      .assignBucket(frame(Seq((7L, 1L, 7.0))), "state",
        IngestIndex.numBuckets(sp), Map.empty)
      .select("bkt").head().getInt(0)
    var fired2 = false
    IngestIndex.commitRetryTestHook = { next =>
      if (!fired2) {
        fired2 = true
        // the rival's entry must DIFFER from the parent's for the cell
        // to count as its footprint: point it at a version no parent
        // entry can hold (nothing reads this manifest after the error)
        IngestIndex.writeManifest(fs, state, next,
          Map("state" -> (m3("state") +
            (deltaBkt -> IngestIndex.Bkt(-99L, 0)))), op = "rival")
      }
    }
    try {
      val e = intercept[IllegalStateException] {
        IngestIndex.commitRetry(sp, state, "state",
          frame(Seq((7L, 1L, 7.0))), addC, op = "merge")
      }
      assert(e.getMessage.contains("footprint overlaps"), e.getMessage)
    } finally IngestIndex.commitRetryTestHook = _ => ()
  }

  test("operation provenance (r17): a commit/DV-delete/restore/compact " +
    "sequence reads back with the right DESCRIBE HISTORY tags; legacy " +
    "untagged manifests read as 'commit'") {
    val sp = spark
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory("graft-idx-optags").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    def commit(v: Long, rows: Seq[(Long, Long)], op: String): Unit = {
      val m = IngestIndex.readManifest(fs, state, v - 1)
      val sm = IngestIndex.mergeCommit(sp, state, m, "state", v,
        rows.toDF("user_id", "cnt"),
        (cur, d) => cur.unionByName(d).groupBy("user_id")
          .agg(sum(col("cnt")).as("cnt")))
      IngestIndex.writeManifest(fs, state, v, Map("state" -> sm), op = op)
    }
    commit(1L, Seq(1L -> 1L, 2L -> 1L, 3L -> 1L), "merge")
    val m1 = IngestIndex.readManifest(fs, state, 1L)
    val m2 = IngestIndex.deleteWithDv(sp, state, m1, "state", 2L,
      Seq(2L).toDF("user_id"))
    IngestIndex.writeManifest(fs, state, 2L, m2, op = "delete-dv")
    IngestIndex.restore(fs, state, 1L, 3L)
    IngestIndex.compact(sp, state, 3L, retain = 50)
    val tags = IngestIndex.describeHistory(fs, state)
      .map(h => h.version -> h.operation).toMap
    assert(tags(1L) === "merge", tags.toString)
    assert(tags(2L) === "delete-dv", tags.toString)
    assert(tags(3L) === "compact",
      s"the compact repoints the TOP manifest: $tags")
    // restore provenance survives where the restore commit is not later
    // repointed: re-run restore to a fresh version
    IngestIndex.restore(fs, state, 1L, 4L)
    val tags2 = IngestIndex.describeHistory(fs, state)
      .map(h => h.version -> h.operation).toMap
    assert(tags2(4L) === "restore(v1)", tags2.toString)
    // legacy compatibility: a manifest written without the #op header
    // (pre-r17 bytes, hand-staged) reads back as "commit", and a tagged
    // replay over it passes the conflict check (op excluded from the
    // equality domain)
    val legacyDir = java.nio.file.Files
      .createTempDirectory("graft-idx-legacy").toString + "/state"
    val lfs = new org.apache.hadoop.fs.Path(legacyDir)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    lfs.mkdirs(new org.apache.hadoop.fs.Path(s"$legacyDir/v1"))
    val out = lfs.create(
      new org.apache.hadoop.fs.Path(s"$legacyDir/v1/manifest"), true)
    out.write("state\t0\t1\t0\n".getBytes("UTF-8")); out.close()
    val lh = IngestIndex.describeHistory(lfs, legacyDir)
    assert(lh.map(_.operation) === Seq("commit"), lh.toString)
    IngestIndex.writeManifest(lfs, legacyDir, 1L,
      Map("state" -> Map(0 -> IngestIndex.Bkt(1L, 0))), op = "merge")
    assert(IngestIndex.describeHistory(lfs, legacyDir)
      .map(_.operation) === Seq("merge"))
    // ... but a COMMITTED tag is never relabeled by a replay (r18,
    // advisor fix): a generic re-driver replaying the same content with
    // the default op keeps the original 'merge' provenance, and the
    // mtime still refreshes (wall-clock retention extends on replay)
    val mtBefore = lfs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"$legacyDir/v1/manifest")).getModificationTime
    Thread.sleep(5)
    IngestIndex.writeManifest(lfs, legacyDir, 1L,
      Map("state" -> Map(0 -> IngestIndex.Bkt(1L, 0))))
    assert(IngestIndex.describeHistory(lfs, legacyDir)
      .map(_.operation) === Seq("merge"),
      "a default-op replay must not relabel committed provenance")
    assert(lfs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"$legacyDir/v1/manifest")).getModificationTime >= mtBefore)
  }

  test("manifest memo is LRU (r17): a hot store's entry survives " +
    "thousands of cold-store resolutions when it keeps being touched") {
    val hot = java.nio.file.Files
      .createTempDirectory("graft-idx-lruhot").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(hot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(hot))
    val hm: IngestIndex.Manifest =
      Map("state" -> Map(0 -> IngestIndex.Bkt(1L, 0)))
    IngestIndex.writeManifest(fs, hot, 1L, hm)
    assert(IngestIndex.memoCached(hot, 1L))
    val cold = java.nio.file.Files
      .createTempDirectory("graft-idx-lrucold").toString
    // churn >4096 distinct cold entries through the memo, touching the
    // hot entry periodically — the pre-r17 global clear wiped it; LRU
    // keeps any entry that stays in the working set
    (1 to 4200).foreach { i =>
      val dir = s"$cold/s$i"
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
      IngestIndex.writeManifest(fs, dir, 1L, hm)
      if (i % 256 == 0)
        assert(IngestIndex.readManifest(fs, hot, 1L) === hm)
    }
    assert(IngestIndex.memoCached(hot, 1L),
      "the hot store's entry was evicted despite being in the LRU " +
        "working set")
    assert(IngestIndex.readManifest(fs, hot, 1L) === hm)
  }

  test("incremental bucket stats (r17, q124b): the full-range count is " +
    "metadata-only (zero buckets scanned), straddling boxes scan only " +
    "their buckets, counts equal direct filters, and a skewed commit's " +
    "stats file holds ONLY its touched buckets") {
    val sp = spark
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    val (state, m) = graft.queries.MergeOps.runStatsStore(sp, dir)
    val direct = IngestIndex.currentTable(sp, state, "state")
    val total = direct.count()
    // box 1: full range — answered entirely from stats
    val (c1, meta1, scan1, tot1) = IngestIndex.metadataCount(sp, state, m,
      "state", Seq(("n_events", 0.0, 1e15)))
    assert(c1 == total && scan1 == 0L && meta1 == tot1,
      s"full-range count must be metadata-only: ($c1, $meta1, $scan1, " +
        s"$tot1) vs $total")
    // boxes 2-3: straddling ranges — exact counts, bounded scans
    Seq((66.0, 1e15), (20.0, 50.0)).foreach { case (lo, hi) =>
      val (c, _, scanned, totB) = IngestIndex.metadataCount(sp, state, m,
        "state", Seq(("n_events", lo, hi)))
      val want = direct.filter(
        col("n_events").cast("double") >= lo &&
          col("n_events").cast("double") < hi).count()
      assert(c == want, s"box [$lo,$hi): $c != $want")
      assert(scanned <= totB)
    }
    // incremental IO: one more commit touching a single user writes a
    // stats file covering ONLY that user's bucket
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    val one = Seq((42L, 1L, BigDecimal(1.0)))
      .toDF("user_id", "n_events", "sum_value")
      .select(col("user_id"), col("n_events"),
        col("sum_value").cast(org.apache.spark.sql.types
          .DecimalType(18, 4)).as("sum_value"))
    val map5 = IngestIndex.mergeCommit(sp, state, m, "state", 5L, one,
      graft.queries.MergeOps.addCombine)
    IngestIndex.writeBucketStats(sp, state, "state", 5L,
      Seq("n_events", "sum_value"))
    val m5: IngestIndex.Manifest = Map("state" -> map5)
    IngestIndex.writeManifest(fs, state, 5L, m5, op = "merge")
    val statRows = sp.read.parquet(s"$state/v5/state.stats").count()
    assert(statRows == 1L,
      s"a one-user commit must write one bucket's stats row: $statRows")
    // and the live stats view still answers the full count exactly
    val (c5, _, scan5, _) = IngestIndex.metadataCount(sp, state, m5,
      "state", Seq(("n_events", 0.0, 1e15)))
    assert(c5 == IngestIndex.currentTable(sp, state, "state").count()
      && scan5 == 0L)
    // DELETION VECTORS COMPOSE with the metadata count (r17 review
    // fix): a live DV's covering buckets must fall out of the pure-
    // metadata fast path (their written cnt includes hidden rows) and
    // the scan must read through the vector — the count equals the
    // SURVIVOR count, not the written count
    val tomb = IngestIndex.currentTable(sp, state, "state")
      .filter(pmod(col("user_id"), lit(5)) === 2).select("user_id")
    val m6 = IngestIndex.deleteWithDv(sp, state, m5, "state", 6L, tomb)
    IngestIndex.writeManifest(fs, state, 6L, m6, op = "delete-dv")
    val survivors = IngestIndex.currentTable(sp, state, "state").count()
    assert(survivors < c5, "the DV delete must hide rows")
    val (c6, _, scan6, tot6) = IngestIndex.metadataCount(sp, state, m6,
      "state", Seq(("n_events", 0.0, 1e15)))
    assert(c6 == survivors,
      s"metadataCount served tombstoned rows: $c6 != $survivors")
    assert(scan6 > 0L && scan6 <= tot6,
      "DV-covered buckets must scan, not metadata-count")
  }

  test("metadata aggregate (r18, q124c): full-range MIN/MAX/SUM/COUNT " +
    "is metadata-only; straddling boxes compose exactly; sum-less " +
    "stats force a scan (NULL never reads as zero); DVs compose") {
    val sp = spark
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    val (state, m) = graft.queries.MergeOps.runStatsStore(sp, dir,
      "stats124c-spec", sumCols = Seq("n_events", "sum_value"))
    val direct = IngestIndex.currentTable(sp, state, "state")
    def want(df: org.apache.spark.sql.DataFrame)
        : (Long, Long, Long, java.math.BigDecimal, Long) = {
      val r = df.agg(min(col("n_events")), max(col("n_events")),
        sum(col("n_events")), sum(col("sum_value")),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDecimal(3),
        r.getLong(4))
    }
    def got(mm: IngestIndex.Manifest,
        boxes: Seq[(String, Double, Double)])
        : ((Long, Long, Long, java.math.BigDecimal, Long), Long, Long) = {
      val (df, _, scanned, tot) = IngestIndex.metadataAggregate(sp,
        state, mm, "state", boxes, Seq("n_events"),
        Seq("n_events", "sum_value"))
      val r = df.head()
      ((r.getLong(0), r.getLong(1), r.getLong(2), r.getDecimal(3),
        r.getLong(4)), scanned, tot)
    }
    // full range: pure metadata, exact values
    val (g1, scan1, _) = got(m, Nil)
    assert(g1._1 == want(direct)._1 && g1._2 == want(direct)._2 &&
      g1._3 == want(direct)._3 &&
      g1._4.compareTo(want(direct)._4) == 0 &&
      g1._5 == want(direct)._5, s"$g1 != ${want(direct)}")
    assert(scan1 == 0L, s"full-range aggregate scanned $scan1 buckets")
    // straddling box: exact composition, bounded scan
    val box = Seq(("n_events", 40.0, 70.0))
    val filt = direct.filter(col("n_events") >= 40L &&
      col("n_events") < 70L)
    val (g2, scan2, tot2) = got(m, box)
    val w2 = want(filt)
    assert(g2._1 == w2._1 && g2._2 == w2._2 && g2._3 == w2._3 &&
      g2._4.compareTo(w2._4) == 0 && g2._5 == w2._5, s"$g2 != $w2")
    assert(scan2 <= tot2)
    // a store whose stats carry NO sums: every bucket scans for a sum
    // aggregate, values still exact
    val (state0, m0) = graft.queries.MergeOps.runStatsStore(sp, dir,
      "stats124c-nosums")
    val (df0, meta0, scan0, tot0) = IngestIndex.metadataAggregate(sp,
      state0, m0, "state", Nil, Seq("n_events"),
      Seq("n_events", "sum_value"))
    assert(meta0 == 0L && scan0 == tot0,
      s"sum-less stats must scan: ($meta0, $scan0, $tot0)")
    assert(df0.head().getLong(4) ==
      IngestIndex.currentTable(sp, state0, "state").count())
    // DV composition: full-range values equal the SURVIVOR aggregate
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    val tomb = direct.filter(pmod(col("user_id"), lit(5)) === 2)
      .select("user_id")
    val m6 = IngestIndex.deleteWithDv(sp, state, m, "state", 6L, tomb)
    IngestIndex.writeManifest(fs, state, 6L, m6, op = "delete-dv")
    val (g3, scan3, _) = got(m6, Nil)
    val w3 = want(IngestIndex.currentTable(sp, state, "state"))
    assert(g3._1 == w3._1 && g3._2 == w3._2 && g3._3 == w3._3 &&
      g3._4.compareTo(w3._4) == 0 && g3._5 == w3._5,
      s"DV-composed aggregate served tombstoned rows: $g3 != $w3")
    assert(scan3 > 0L, "DV-covered buckets must scan")
  }

  test("live-DV guard (r17): a raw mergeCommit on a table with a live " +
    "deletion vector fails loudly; mergeCommitDv composes — tombstoned " +
    "rows do not feed the combine, a re-inserted tombstoned key is " +
    "VISIBLE, and untouched buckets keep their tombstones") {
    val sp = spark
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory("graft-idx-dvmerge").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    val seed = (0L until 32L).map(u => u -> 10L)
    val m1map = IngestIndex.mergeCommit(sp, state, Map.empty, "state", 1L,
      seed.toDF("user_id", "cnt"), (_, d) => d)
    IngestIndex.writeManifest(fs, state, 1L, Map("state" -> m1map))
    val m1 = IngestIndex.readManifest(fs, state, 1L)
    // DV-delete users 3 and 17
    val m2 = IngestIndex.deleteWithDv(sp, state, m1, "state", 2L,
      Seq(3L, 17L).toDF("user_id"))
    IngestIndex.writeManifest(fs, state, 2L, m2, op = "delete-dv")
    // raw mergeCommit now throws — the advisor's resurrect scenario
    val err = intercept[IllegalArgumentException] {
      IngestIndex.mergeCommit(sp, state, m2, "state", 3L,
        Seq(3L -> 1L).toDF("user_id", "cnt"),
        (cur, d) => cur.unionByName(d))
    }
    assert(err.getMessage.contains("LIVE deletion vector"), err.getMessage)
    // mergeCommitDv: batch touches key 3 (tombstoned, re-inserted) and
    // key 5 (live) — the upsert algebra adds counts
    val combine: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame =
      (cur, d) => cur.select(col("user_id"), col("cnt").as("c"))
        .join(d, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("c"), lit(0L)) + coalesce(col("cnt"), lit(0L)))
            .as("cnt"))
    val m3 = IngestIndex.mergeCommitDv(sp, state, m2, "state", 3L,
      Seq(3L -> 1L, 5L -> 1L).toDF("user_id", "cnt"), combine)
    IngestIndex.writeManifest(fs, state, 3L, m3, op = "merge")
    val got = IngestIndex.currentTable(sp, state, "state")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // key 3: tombstone invalidated by the rewrite, re-inserted FRESH
    // (the DV-filtered slice had no row 3, so 0 + 1); key 17: bucket
    // untouched unless it shares a bucket with the batch — model both
    val n = IngestIndex.numBuckets(sp)
    val touchedBkts = Seq(3L, 5L).map(u =>
      IngestIndex.assignBucket(Seq(u).toDF("user_id"), "state", n,
        Map.empty).select("bkt").head().getInt(0)).toSet
    val b17 = IngestIndex.assignBucket(Seq(17L).toDF("user_id"), "state",
      n, Map.empty).select("bkt").head().getInt(0)
    val expect = (0L until 32L).flatMap { u =>
      if (u == 3L) Some(u -> 1L) // re-inserted fresh, tombstone cleared
      else if (u == 5L) Some(u -> 11L)
      else if (u == 17L) None // still deleted (DV or physical rewrite)
      else Some(u -> 10L)
    }.toMap
    assert(got === expect, s"touched=$touchedBkts b17=$b17")
    // the 17-tombstone: dropped from the DV iff its bucket was rewritten
    // (then the row is physically gone); kept otherwise
    val dvLive = m3.get(IngestIndex.dvTable("state"))
      .exists(_.exists(_._2.ver != IngestIndex.EmptyVer))
    if (touchedBkts.contains(b17))
      assert(!dvLive, "17's tombstone should have materialized away")
    else {
      assert(dvLive, "17's tombstone must survive an unrelated rewrite")
      // ... and equals exactly {17}
      val dvKeys = IngestIndex.currentTable(sp, state,
        IngestIndex.dvTable("state"), raw = true)
        .select("user_id").collect().map(_.getLong(0)).toSet
      assert(dvKeys === Set(17L))
    }
    // a later materialize yields the identical table (composition law)
    val m4 = IngestIndex.materializeDeletes(sp, state, m3, "state", 4L,
      Seq("user_id"))
    IngestIndex.writeManifest(fs, state, 4L, m4, op = "materialize")
    val got4 = IngestIndex.currentTable(sp, state, "state")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got4 === expect)
  }
}
