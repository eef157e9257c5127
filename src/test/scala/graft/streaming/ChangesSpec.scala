package graft.streaming

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Store-native CDC (r18): `changesBetween` computed from the version
  * layout — the apply-law (snapshot + changes == later snapshot),
  * cancellation (unchanged rows in rewritten buckets emit nothing),
  * deletion-vector visibility changes, schema evolution, and the
  * `table_changes` TVF == the DataFrame verb.
  */
class ChangesSpec extends AnyFunSuite {

  private val dec = DecimalType(18, 4)

  private def stage(kind: String): String = {
    val p = java.nio.file.Files
      .createTempDirectory(s"graft-changes-$kind").toString + "/state"
    p
  }

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

  test("cancellation: a merge touching ONE key emits exactly its " +
    "update pair — unchanged rows sharing the rewritten buckets cancel") {
    val s = TestSpark.spark
    val state = stage("cancel")
    val m1 = commit(state, Map.empty, 1L, seedRows(8), (_, d) => d)
    // update only user 2 (adds 5 events); every other user in user 2's
    // bucket is rewritten byte-identically and must NOT surface
    val delta = seedRows(8).filter(col("user_id") === 2)
      .withColumn("n_events", lit(5L))
    commit(state, m1, 2L, delta, (cur, d) => {
      val keys = d.select("user_id").withColumn("__hit", lit(true))
      cur.join(keys, Seq("user_id"), "left")
        .withColumn("n_events",
          when(col("__hit"), col("n_events") + lit(5L))
            .otherwise(col("n_events")))
        .drop("__hit")
    })
    val ch = IngestIndex.changesBetween(s, state, "state", 1, 2)
      .orderBy("_change_type").collect()
    assert(ch.length == 2, ch.mkString("; "))
    assert(ch.map(_.getAs[String]("_change_type")).toSeq ==
      Seq("update_postimage", "update_preimage"))
    assert(ch.forall(_.getAs[Long]("user_id") == 2L))
    val byType = ch.map(r =>
      r.getAs[String]("_change_type") -> r.getAs[Long]("n_events")).toMap
    assert(byType("update_preimage") == 20L &&
      byType("update_postimage") == 25L, byType.toString)
    // IO-FOOTPRINT LAW: the step's scans READ only the commit's own
    // bucket (both sides) — every executed FileSourceScan over the
    // store carries the bkt partition filter and selects at most ONE
    // file (the seed wrote 7+ bucket files; an unpruned scan would
    // read them all). Asserted on executed-plan METRICS, so a pruning
    // regression fails here rather than as a wall-clock drift.
    val step = IngestIndex.changesBetween(s, state, "state", 1, 2)
    step.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => scans(q.plan)
        case r: org.apache.spark.sql.execution.exchange
            .ReusedExchangeExec => scans(r.child)
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          Seq(f)
        case other => other.children.flatMap(scans) ++
          other.subqueries.flatMap(scans)
      }
    val storeScans = scans(step.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("/state")))
    assert(storeScans.nonEmpty, "no store scans found in the step plan")
    storeScans.foreach { f =>
      assert(f.partitionFilters.exists(_.toString.contains("bkt")),
        s"store scan without a bkt partition filter: ${f.simpleString(5)}")
      assert(f.metrics("numFiles").value <= 1,
        s"store scan read ${f.metrics("numFiles").value} files — the " +
          "footprint is the ONE touched bucket")
    }
  }

  test("deletion-vector commits surface as deletes (zero base buckets " +
    "written); from-v1 changes of a fresh store are all inserts") {
    val s = TestSpark.spark
    val state = stage("dv")
    val sp = s
    import sp.implicits._
    val m1 = commit(state, Map.empty, 1L, seedRows(6), (_, d) => d)
    val fs = new Path(state)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val m2 = IngestIndex.deleteWithDv(s, state, m1, "state", 2L,
      Seq(3L, 5L).toDF("user_id"))
    IngestIndex.writeManifest(fs, state, 2L, m2)
    // v0 -> v1: the seed commit is all inserts
    val step1 = IngestIndex.changesBetween(s, state, "state", 0, 1)
      .collect()
    assert(step1.length == 6 &&
      step1.forall(_.getAs[String]("_change_type") == "insert"))
    // v1 -> v2: DV-only commit — two deletes carrying the hidden values
    val step2 = IngestIndex.changesBetween(s, state, "state", 1, 2)
      .orderBy("user_id").collect()
    assert(step2.length == 2, step2.mkString("; "))
    assert(step2.forall(_.getAs[String]("_change_type") == "delete"))
    assert(step2.map(_.getAs[Long]("user_id")).toSeq == Seq(3L, 5L))
    assert(step2.map(_.getAs[Long]("n_events")).toSeq == Seq(30L, 50L))
  }

  test("apply-law across schema evolution: snapshot(v1) + " +
    "changesBetween(1,4) == snapshot(v4) on the q128 evolving fold") {
    val s = TestSpark.spark
    val state =
      graft.queries.MergeOps.runEvolvingFold(s, "/root/testdata/sf0.001")
    val finalDf = IngestIndex.tableAt(s, state, "state", 4)
    val cols = finalDf.columns.toSeq
    def rowsOf(df: DataFrame): Map[Long, Seq[Any]] =
      df.collect().map { r =>
        r.getAs[Long]("user_id") -> cols.map(c =>
          if (df.columns.contains(c)) r.getAs[Any](c) else null)
      }.toMap
    val changes = IngestIndex.changesBetween(s, state, "state", 1, 4)
    var cur = rowsOf(IngestIndex.tableAt(s, state, "state", 1))
    changes.orderBy("_commit_version").collect()
      .groupBy(_.getAs[Long]("_commit_version")).toSeq.sortBy(_._1)
      .foreach { case (_, rows) =>
        rows.foreach { r =>
          val k = r.getAs[Long]("user_id")
          r.getAs[String]("_change_type") match {
            case "delete" | "update_preimage" => cur -= k
            case _ => ()
          }
        }
        rows.foreach { r =>
          val k = r.getAs[Long]("user_id")
          r.getAs[String]("_change_type") match {
            case "insert" | "update_postimage" =>
              cur += k -> cols.map(c => r.getAs[Any](c))
            case _ => ()
          }
        }
      }
    val want = rowsOf(finalDf)
    assert(cur.keySet == want.keySet,
      s"key drift: extra=${(cur.keySet -- want.keySet).take(5)} " +
        s"missing=${(want.keySet -- cur.keySet).take(5)}")
    val bad = want.collect {
      case (k, v) if cur(k) != v => (k, cur(k), v) }.take(3)
    assert(bad.isEmpty, s"value drift: $bad")
  }

  test("truncate commits surface as deletes; an uncommitted/GC'd " +
    "range fails loudly instead of misreading as inserts (review fix)") {
    val s = TestSpark.spark
    val sp = s
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory("graft-changes-trunc").toString + "/t"
    s.sql(
      s"""CREATE TABLE changes_trunc (
         |  user_id BIGINT, n_events BIGINT, PRIMARY KEY (user_id)
         |) USING graft LOCATION '$state'""".stripMargin)
    try {
      (1L to 4L).map(i => (i, i * 10L)).toDF("u", "n")
        .createOrReplaceTempView("changes_trunc_src")
      s.sql("INSERT INTO changes_trunc SELECT * FROM changes_trunc_src")
      s.sql("DELETE FROM changes_trunc") // truncate: v2 drops the table
      val ch = IngestIndex.changesBetween(s, state, "changes_trunc",
        1, 2).orderBy("user_id").collect()
      assert(ch.length == 4 &&
        ch.forall(_.getAs[String]("_change_type") == "delete"),
        ch.mkString("; "))
      assert(ch.map(_.getAs[Long]("n_events")).toSeq ==
        Seq(10L, 20L, 30L, 40L))
      // a range past the committed top names the eviction contract —
      // readManifest's empty-map default must NOT read as "the table
      // appeared from nothing"
      val e = intercept[IllegalArgumentException] {
        IngestIndex.changesBetween(s, state, "changes_trunc", 0, 9)
          .collect()
      }
      assert(e.getMessage.contains("never committed or GC evicted"),
        e.getMessage)
    } finally graft.operators.GraftSql.unregisterTable("changes_trunc")
  }

  test("randomized verb interleaving under splitBytes=1: the apply-law " +
    "holds at every step and over the whole range — upserts and DV " +
    "deletes across bucket splits") {
    val s = TestSpark.spark
    val sp = s
    import sp.implicits._
    val old = s.conf.getOption("spark.graft.ingest.splitBytes")
    s.conf.set("spark.graft.ingest.splitBytes", "1")
    try {
      val state = stage("rand")
      val fs = new Path(state)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val rnd = new scala.util.Random(1417)
      var cur = Map.empty[Long, Long] // the pure model
      val hist = scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
      hist(0L) = Map.empty
      var v = 0L
      (1 to 8).foreach { _ =>
        val m = IngestIndex.readManifest(fs, state, v)
        if (rnd.nextInt(10) < 7 || cur.isEmpty) {
          // UPSERT: add counts for random keys (through mergeCommitDv,
          // so a live vector composes)
          val rows = Seq.fill(1 + rnd.nextInt(8))(
            rnd.nextInt(14).toLong -> (1 + rnd.nextInt(3)).toLong)
          val delta = rows.groupBy(_._1).view
            .mapValues(_.map(_._2).sum).toSeq
          delta.foreach { case (k, c) =>
            cur += k -> (cur.getOrElse(k, 0L) + c) }
          val nm = IngestIndex.mergeCommitDv(s, state, m, "state",
            v + 1, delta.toDF("user_id", "cnt"),
            (c, d) => c.unionByName(d).groupBy("user_id")
              .agg(sum(col("cnt")).as("cnt")))
          IngestIndex.writeManifest(fs, state, v + 1, nm)
        } else {
          // DV DELETE a random nonempty subset of live keys
          val doomed = cur.keys.toSeq
            .filter(_ => rnd.nextBoolean()) match {
            case Nil => Seq(cur.keys.head)
            case ks => ks
          }
          cur --= doomed
          val nm = IngestIndex.deleteWithDv(s, state, m, "state",
            v + 1, doomed.toDF("user_id"))
          IngestIndex.writeManifest(fs, state, v + 1, nm)
        }
        v += 1
        hist(v) = cur
        // per-step apply-law: hist(v-1) + changes(v-1, v) == hist(v)
        val step = IngestIndex.changesBetween(s, state, "state",
          v - 1, v).collect()
        var m2 = hist(v - 1)
        step.foreach { r =>
          r.getAs[String]("_change_type") match {
            case "delete" | "update_preimage" =>
              m2 -= r.getAs[Long]("user_id")
            case _ => ()
          }
        }
        step.foreach { r =>
          r.getAs[String]("_change_type") match {
            case "insert" | "update_postimage" =>
              m2 += r.getAs[Long]("user_id") -> r.getAs[Long]("cnt")
            case _ => ()
          }
        }
        assert(m2 == cur, s"step to v$v: applied changes diverge " +
          s"(extra=${(m2.keySet -- cur.keySet).take(5)}, " +
          s"missing=${(cur.keySet -- m2.keySet).take(5)})")
      }
      // whole-range apply-law across every split/DV interleaving
      var acc = Map.empty[Long, Long]
      IngestIndex.changesBetween(s, state, "state", 0, v)
        .orderBy("_commit_version").collect()
        .groupBy(_.getAs[Long]("_commit_version")).toSeq.sortBy(_._1)
        .foreach { case (_, rows) =>
          rows.foreach { r =>
            r.getAs[String]("_change_type") match {
              case "delete" | "update_preimage" =>
                acc -= r.getAs[Long]("user_id")
              case _ => ()
            }
          }
          rows.foreach { r =>
            r.getAs[String]("_change_type") match {
              case "insert" | "update_postimage" =>
                acc += r.getAs[Long]("user_id") -> r.getAs[Long]("cnt")
              case _ => ()
            }
          }
        }
      assert(acc == cur, "whole-range apply diverged from the model")
    } finally old match {
      case Some(x) => s.conf.set("spark.graft.ingest.splitBytes", x)
      case None => s.conf.unset("spark.graft.ingest.splitBytes")
    }
  }

  test("table_changes TVF == the DataFrame verb; literal/arity/name " +
    "guard rails") {
    val s = TestSpark.spark
    val state = stage("tvf")
    val m1 = commit(state, Map.empty, 1L, seedRows(5), (_, d) => d)
    commit(state, m1, 2L,
      seedRows(5).filter(col("user_id") <= 2)
        .withColumn("sum_value", (col("sum_value") * 3).cast(dec)),
      (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
        "left_anti").unionByName(d))
    graft.operators.GraftSql.registerTable("changes_tvf_state", state,
      "state")
    try {
      val viaSql = s.sql(
        """SELECT * FROM table_changes('changes_tvf_state', 1, 2)
          |ORDER BY user_id, _change_type""".stripMargin).collect().toSeq
      val viaDf = IngestIndex.changesBetween(s, state, "state", 1, 2)
        .orderBy("user_id", "_change_type").collect().toSeq
      assert(viaSql == viaDf)
      assert(viaSql.length == 4) // two updated keys x (pre + post)
      val e1 = intercept[Throwable] {
        s.sql("SELECT * FROM table_changes('nope_no_such', 1, 2)")
      }
      assert(e1.getMessage.contains("not a registered graft store"),
        e1.getMessage)
      val e2 = intercept[Throwable] {
        s.sql("SELECT * FROM table_changes('changes_tvf_state', 1)")
      }
      assert(e2.getMessage.contains("3 arguments"), e2.getMessage)
    } finally graft.operators.GraftSql.unregisterTable("changes_tvf_state")
  }

  test("table_changes TIMESTAMP bounds (r19): string/timestamp " +
    "literals resolve through versionAt (the one travel rule), mixed " +
    "forms compose, pre-history instants throw the named error") {
    val s = TestSpark.spark
    val state = stage("tvfts")
    val fs = new Path(state)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val m1 = commit(state, Map.empty, 1L, seedRows(5), (_, d) => d)
    commit(state, m1, 2L,
      seedRows(5).filter(col("user_id") === 1)
        .withColumn("n_events", lit(77L)),
      (cur, d) => cur.join(d.select("user_id"), Seq("user_id"),
        "left_anti").unionByName(d))
    graft.operators.GraftSql.registerTable("changes_ts_state", state,
      "state")
    try {
      val hist = IngestIndex.describeHistory(fs, state)
        .map(h => h.version -> h.manifestMtime).toMap
      def iso(ms: Long): String = java.time.Instant.ofEpochMilli(ms)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      val expect = s.sql(
        """SELECT * FROM table_changes('changes_ts_state', 1, 2)
          |ORDER BY user_id, _change_type""".stripMargin)
        .collect().toSeq
      // string bounds: an instant in [v1, v2) resolves to 1, an
      // instant at/after v2's commit resolves to 2 — the SAME rule as
      // TIMESTAMP AS OF (versionAt), so the surfaces cannot disagree
      val viaTs = s.sql(
        s"""SELECT * FROM table_changes('changes_ts_state',
           |  '${iso(hist(2L) - 1)}', '${iso(hist(2L))}')
           |ORDER BY user_id, _change_type""".stripMargin)
        .collect().toSeq
      assert(viaTs == expect, "timestamp bounds != version bounds")
      // mixed: integer from-version + timestamp to-bound
      val mixed = s.sql(
        s"""SELECT * FROM table_changes('changes_ts_state', 1,
           |  '${iso(hist(2L))}')
           |ORDER BY user_id, _change_type""".stripMargin)
        .collect().toSeq
      assert(mixed == expect, "mixed bounds != version bounds")
      // pre-history instant: versionAt's named retention error
      val e = intercept[Throwable] {
        s.sql("SELECT * FROM table_changes('changes_ts_state', " +
          "'1970-01-02 00:00:00', 2)")
      }
      assert(e.getMessage.contains("precedes every retained commit"),
        e.getMessage)
      // equal resolved bounds: the changesBetween contract error (a
      // named from<to requirement, not a silent empty result)
      val e2 = intercept[Throwable] {
        s.sql(s"SELECT * FROM table_changes('changes_ts_state', " +
          s"'${iso(hist(2L))}', '${iso(hist(2L))}')")
      }
      assert(e2.getMessage.contains("need 0 <= from < to"),
        e2.getMessage)
    } finally graft.operators.GraftSql.unregisterTable("changes_ts_state")
  }

  test("changesBetween range bound (r19): a >512-step range throws the " +
    "named chunking error instead of building a degenerate plan") {
    val s = TestSpark.spark
    val state = stage("bound")
    commit(state, Map.empty, 1L, seedRows(3), (_, d) => d)
    val e = intercept[IllegalArgumentException] {
      IngestIndex.changesBetween(s, state, "state", 0L, 600L)
    }
    assert(e.getMessage.contains("chunk the range"), e.getMessage)
  }
}
