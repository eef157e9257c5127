package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Q33: streaming watermarked tumbling windows == batch on closed windows;
  * a row later than the watermark is provably dropped. */
class EventStreamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def withTempDir[A](f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toFile
    try f(dir.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete()
      }
      rm(dir)
    }
  }

  test("streaming closed windows equal the batch aggregation") {
    val spark = TestSpark.spark
    withTempDir { replay =>
      EventStream.stageReplay(spark, sfDir, replay, nFiles = 4)
      val streamed = EventStream.runToCompletion(spark, replay, "s1")
      val batch = EventStream.batchHourlyCounts(spark, sfDir)

      // append mode emits only watermark-closed windows; every emitted
      // window must match batch exactly
      val joined = streamed.as("s").join(batch.as("b"),
        col("s.hour_start") === col("b.hour_start")
          && col("s.event_type") === col("b.event_type"), "left")
      val mismatches = joined.filter(
        col("b.cnt").isNull || col("s.cnt") =!= col("b.cnt")
          || abs(col("s.sum_value") - col("b.sum_value")) > 1e-6).count()
      assert(mismatches == 0)

      // emission lags the watermark by a micro-batch, so only windows
      // closed by the second-to-last batch's horizon are guaranteed out —
      // require meaningful coverage, exactness is covered above and the
      // precise closure semantics in the late-row test below
      val nStreamed = streamed.count()
      assert(nStreamed > 0, "stream emitted nothing")
      assert(nStreamed >= batch.count() / 3,
        s"watermark never advanced: streamed=$nStreamed batch=${batch.count()}")
    }
  }

  test("stream-static enrichment join matches the batch twin on closed windows") {
    val spark = TestSpark.spark
    withTempDir { replay =>
      EventStream.stageReplay(spark, sfDir, replay, nFiles = 4)
      val streamed = EventStream.enrichedHourly(spark, replay, sfDir, "s_enrich")
      val batch = EventStream.batchEnrichedHourly(spark, sfDir)

      // every emitted (hour, nation) row must match the batch join exactly
      val joined = streamed.as("s").join(batch.as("b"),
        col("s.hour_start") === col("b.hour_start")
          && col("s.nation") === col("b.nation"), "left")
      val mismatches = joined.filter(
        col("b.cnt").isNull || col("s.cnt") =!= col("b.cnt")
          || abs(col("s.sum_value") - col("b.sum_value")) > 1e-6).count()
      assert(mismatches == 0)
      assert(streamed.count() > 0, "stream emitted nothing")

      // the left join must not drop facts: per closed hour, enriched
      // counts (incl. 'unknown') re-sum to the plain per-hour counts
      val perHour = streamed.groupBy("hour_start")
        .agg(sum("cnt").as("cnt")).as("s")
      val plain = EventStream.batchHourlyCounts(spark, sfDir)
        .groupBy("hour_start").agg(sum("cnt").as("cnt")).as("b")
      val lost = perHour.join(plain, Seq("hour_start"), "left")
        .filter(col("s.cnt") =!= col("b.cnt")).count()
      assert(lost == 0, "enrichment dropped or duplicated facts")
    }
  }

  /** Both regimes of q81's MEASURED dim gate
    * (`spark.graft.stream.dimBroadcastMaxRows`), the streaming twin of
    * CurationSpec's q94 regime test — and the per-micro-batch scan check:
    * the dim must enter every batch's plan as the once-materialized RDD
    * (localCheckpoint), NEVER as a parquet re-scan of customer/nation.
    * Under the cap the batch plan is a broadcast join; with the cap
    * forced to 0 (and size-based broadcast disabled) the same stream
    * runs a real keyed shuffle join — with identical emitted rows. */
  test("q81 dim regimes: materialized once, gated broadcast vs keyed shuffle, same rows") {
    val spark = TestSpark.spark
    withTempDir { replay =>
      EventStream.stageReplay(spark, sfDir, replay, nFiles = 4)

      def scanNames(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
        graft.PlanWalk.collectAll(p).collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.mkString(",")
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.verboseString(1000)
        }

      def joinNodes(p: org.apache.spark.sql.execution.SparkPlan) =
        graft.PlanWalk.collectAll(p).filter {
          case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
          case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
          case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
          case _ => false
        }

      // regime 1 (default): measured gate hints the broadcast
      val hinted = EventStream.enrichedHourly(spark, replay, sfDir, "s_dim_h")
      val (rowsH, bcastH) = EventStream.lastDimStats.get()
      assert(rowsH > 0 && bcastH,
        s"default regime should measure and broadcast the dim ($rowsH rows)")
      val planH = graft.streaming.StreamPlans.get("q81_streaming_enrich")
        .getOrElse(fail("no executed micro-batch plan captured"))
      val dimScansH = scanNames(planH)
        .filter(s => s.contains("customer.parquet") || s.contains("nation.parquet"))
      assert(dimScansH.isEmpty,
        s"per-micro-batch plan re-scans the dim parquet: $dimScansH")
      assert(joinNodes(planH).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
        "under-cap regime should join via broadcast, plan:\n" + planH.treeString)
      // join-regime change reorders the double accumulation of sum_value
      // (broadcast keeps stream order; SMJ pre-sorts by user_id), so the
      // sums can drift a ULP — compare keys/counts exactly, sums rounded
      def dump(df: org.apache.spark.sql.DataFrame): Seq[Row] =
        df.select(col("hour_start"), col("nation"), col("cnt"),
            round(col("sum_value"), 6).as("sum_value"))
          .orderBy("hour_start", "nation").collect().toSeq
      val hintedRows = dump(hinted)

      // regime 2: cap forced to 0 -> un-hinted keyed shuffle, same rows
      graft.SpecHelpers.withConf(spark,
        "spark.graft.stream.dimBroadcastMaxRows" -> "0",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val shuffled = EventStream.enrichedHourly(spark, replay, sfDir, "s_dim_s")
        val (rowsS, bcastS) = EventStream.lastDimStats.get()
        assert(!bcastS, "over-cap regime should record broadcast=false")
        assert(rowsS == rowsH, "the measured cardinality is regime-independent")
        val planS = graft.streaming.StreamPlans.get("q81_streaming_enrich")
          .getOrElse(fail("no executed micro-batch plan captured"))
        val dimScansS = scanNames(planS)
          .filter(s => s.contains("customer.parquet") || s.contains("nation.parquet"))
        assert(dimScansS.isEmpty,
          s"over-cap per-micro-batch plan re-scans the dim parquet: $dimScansS")
        assert(joinNodes(planS).exists(j =>
          j.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]
            || j.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
          "over-cap regime should run a keyed shuffle join, plan:\n"
            + planS.treeString)

        assert(dump(shuffled) == hintedRows,
          "q81 rows differ between broadcast and shuffle dim regimes")
      }
    }
  }

  test("stream-stream interval join emits exactly the batch join's pair set") {
    val spark = TestSpark.spark
    withTempDir { replay =>
      EventStream.stageReplay(spark, sfDir, replay, nFiles = 4)
      val streamed = EventStream.attributedPairs(spark, replay, "s_ssj")
      val batch = EventStream.batchAttributedPairs(spark, sfDir)

      // inner stream-stream joins emit matches as rows arrive; the
      // watermark bounds STATE, not emission, so under complete replay the
      // pair set must equal the batch interval join exactly — both
      // directions (no lost pairs, no phantom pairs), all payload columns
      val key = Seq("p_event", "c_event")
      val sOnly = streamed.select(key.map(col): _*)
        .exceptAll(batch.select(key.map(col): _*)).count()
      val bOnly = batch.select(key.map(col): _*)
        .exceptAll(streamed.select(key.map(col): _*)).count()
      assert(sOnly == 0, s"stream emitted $sOnly pairs the batch join lacks")
      assert(bOnly == 0, s"stream lost $bOnly pairs the batch join has")

      val full = Seq("user_id", "p_event", "c_event", "c_ts", "p_ts", "p_value")
      assert(streamed.select(full.map(col): _*)
        .exceptAll(batch.select(full.map(col): _*)).count() == 0,
        "pair payloads differ between stream and batch")

      // the rig must actually exercise the join (5 pairs at sf0.001)
      assert(batch.count() > 0, "batch twin empty — rig stamps no pairs")
    }
  }

  test("foreachBatch upsert state equals the one-shot batch aggregate") {
    val spark = TestSpark.spark
    withTempDir { dir =>
      EventStream.stageReplay(spark, sfDir, s"$dir/replay", nFiles = 4)
      val streamed = EventStream.upsertedState(
        spark, s"$dir/replay", s"$dir/state")
      val batch = EventStream.batchUserState(spark, sfDir)
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      // full outer + any-null-mismatch filter: a user missing from either
      // side, or any field diverging, is a failure
      val bad = streamed.as("s").join(batch.as("b"),
          col("s.user_id") === col("b.user_id"), "full_outer")
        .filter(col("s.user_id").isNull || col("b.user_id").isNull
          || col("s.n_events") =!= col("b.n_events")
          || col("s.last_ts") =!= col("b.last_ts")
          || (col("s.sum_value").cast(dec) =!= col("b.sum_value").cast(dec)
            && !(col("s.sum_value").isNull && col("b.sum_value").isNull)))
        .count()
      assert(bad == 0, s"$bad users diverge from the batch aggregate")
      assert(streamed.count() == batch.count())
    }
  }

  test("flatMapGroupsWithState sessions match the batch gaps-and-islands twin") {
    val spark = TestSpark.spark
    withTempDir { replay =>
      EventStream.stageReplay(spark, sfDir, replay, nFiles = 4)
      val streamed = EventStream.sessionized(spark, replay, "sess1")
      val batch = EventStream.batchSessions(spark, sfDir)
      // append mode: every emitted session must exactly equal a batch
      // session (same user, same start, same event count) — the custom
      // interval-merge state must not split, merge or miscount any session
      // it closes
      val mismatches = streamed.as("s").join(batch.as("b"),
          col("s.user_id") === col("b.user_id")
            && col("s.session_start") === col("b.session_start"), "left")
        .filter(col("b.n_events").isNull
          || col("s.n_events") =!= col("b.n_events")).count()
      assert(mismatches == 0)
      // no session may be emitted twice
      val n = streamed.count()
      assert(n == streamed.select("user_id", "session_start").distinct().count())
      // the watermark must have closed a meaningful share of sessions
      assert(n > 0, "stream emitted no sessions")
      assert(n >= batch.count() / 3,
        s"watermark never advanced: streamed=$n batch=${batch.count()}")
    }
  }

  test("transformWithState sessions equal flatMapGroupsWithState and batch") {
    val spark = TestSpark.spark
    withTempDir { replay =>
      EventStream.stageReplay(spark, sfDir, replay, nFiles = 4)
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val before = spark.conf.getOption(providerKey)
      // TWS requires the RocksDB provider (its scale contract: state
      // off-heap with changelog checkpointing)
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val tws = TwsSession.sessionized(spark, replay, "s_tws")
        val fmgws = EventStream.sessionized(spark, replay, "s_fmgws_twin")
        val batch = EventStream.batchSessions(spark, sfDir)

        def keyed(df: org.apache.spark.sql.DataFrame) =
          df.select("user_id", "session_start", "n_events").collect()
            .map(r => (r.getLong(0), r.get(1).toString, r.getLong(2)))
            .sorted.toSeq

        // the two arbitrary-state APIs must emit the IDENTICAL session set
        // (same merge rule, same watermark feed, batch boundaries may
        // differ but run-to-completion closure cannot)
        assert(keyed(tws) == keyed(fmgws),
          "transformWithState and flatMapGroupsWithState disagree")
        assert(keyed(tws).nonEmpty, "TWS emitted nothing")

        // and every emitted session must be a batch gaps-and-islands
        // session (left-join containment, as in the FMGWS test)
        val missing = tws.as("s").join(batch.as("b"),
          col("s.user_id") === col("b.user_id")
            && col("s.session_start") === col("b.session_start")
            && col("s.n_events") === col("b.n_events"), "left_anti").count()
        assert(missing == 0, s"$missing TWS sessions have no batch twin")
      } finally {
        before match {
          case Some(v) => spark.conf.set(providerKey, v)
          case None => spark.conf.unset(providerKey)
        }
      }
    }
  }

  test("streaming ingest-dedup removes in-watermark duplicates") {
    val spark = TestSpark.spark
    import spark.implicits._
    withTempDir { replay =>
      val base = java.time.LocalDateTime.parse("2024-03-01T00:00:00")
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
      // 20 unique rows + 10 exact duplicates (same content, close in time)
      val uniq = (0 until 20).map(i =>
        (i.toLong, base.plusMinutes(i * 5), i.toLong % 4, "t", i * 1.0, "{}"))
      val dups = (0 until 10).map(i =>
        (100L + i, base.plusMinutes(i * 5 + 1), i.toLong % 4, "t", i * 1.0, "{}"))
      (uniq ++ dups).toDF(cols: _*).coalesce(1).write.parquet(replay + "/staged")
      val out = EventStream.dedupedEvents(spark, replay + "/staged", "dedup1")
      // duplicates carry identical (user_id, event_type, value, props) ->
      // one survivor per content hash
      assert(out.count() == 20, s"expected 20 unique rows, got ${out.count()}")
      assert(out.select("content_hash").distinct().count() == 20)
    }
  }

  test("a late row beyond the watermark is dropped (two-run checkpointed stream)") {
    val spark = TestSpark.spark
    import spark.implicits._
    withTempDir { root =>
      val staged = s"$root/staged"; new java.io.File(staged).mkdirs()
      val ckpt = s"$root/ckpt"
      val base = java.time.LocalDateTime.parse("2024-01-01T00:00:00")
      def ev(id: Long, hoursOffset: Double) =
        (id, base.plusMinutes((hoursOffset * 60).toLong), 1L, "late_test", 1.0, "{}")
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

      def stageOne(rows: Seq[(Long, java.time.LocalDateTime, Long, String, Double, String)],
          name: String): Unit = {
        val tmp = s"$root/tmp_$name"
        rows.toDF(cols: _*).coalesce(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$staged/$name.parquet"))
      }

      val sinkDir = s"$root/sink"

      // run 1: on-time events up to +24.5h -> watermark after this run
      // reaches 22.5h, but nothing is emitted yet (single batch, wm lags)
      stageOne((0 until 50).map(i => ev(i, i * 0.5)), "part-0")
      EventStream.runCheckpointed(spark, staged, sinkDir, ckpt)

      // run 2: one straggler at +10h — 12.5h behind the checkpointed
      // watermark; its window [10:00,11:00) closed long ago -> dropped
      stageOne(Seq(ev(999, 10.0)), "part-1")
      val out = EventStream.runCheckpointed(spark, staged, sinkDir, ckpt)

      val lateWindow = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val emitted = out
        .filter(col("hour_start") === lit(lateWindow)).collect()
      // the 10:00 window holds on-time events i=20 (@10.0h) and i=21
      // (@10.5h); the straggler must not have been added
      assert(emitted.nonEmpty, "10:00 window was never emitted")
      emitted.foreach { case Row(_, _, cnt: Long, _) =>
        assert(cnt == 2L, s"straggler leaked into closed window: ${emitted.toSeq}")
      }
    }
  }
}
