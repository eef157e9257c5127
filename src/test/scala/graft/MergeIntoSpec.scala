package graft

import graft.operators.MergeInto
import graft.queries.MergeOps
import graft.streaming.IngestIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q127 multi-clause MERGE INTO + q128 schema evolution on the bucketed
  * persistent store: clause algebra, store-vs-direct equality, and the
  * evolution laws the oracle can't see (pre-evolution snapshots readable
  * without the new column).
  */
class MergeIntoSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("MergeInto: every clause kind fires and first-match-wins holds") {
    val spark = TestSpark.spark
    import spark.implicits._
    val target = Seq((1L, 10L, 100.0), (2L, 1L, 5.0), (3L, 7L, 70.0))
      .toDF("user_id", "n_events", "sum_value")
    val source = Seq((1L, 3L, 30.0), (2L, 5L, 50.0), (4L, 2L, 20.0),
        (5L, 1L, 1.0))
      .toDF("user_id", "n_events", "sum_value")
    val merge = MergeInto.simple(
      key = "user_id",
      payload = Seq("n_events", "sum_value"),
      // user 2: source outran target -> DELETE (clause 1 beats clause 2)
      matchedDeleteWhen = Some(col("s_n_events") > col("t_n_events")),
      updateSet = Map(
        "n_events" -> (col("t_n_events") + col("s_n_events")),
        "sum_value" -> (col("t_sum_value") + col("s_sum_value"))),
      // user 5 (n=1): unmatched but below the insert gate -> dropped
      insertWhen = col("s_n_events") >= 2)
    val got = merge(target, source).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set(
      (1L, 13L, 130.0), // matched -> UPDATE
      (3L, 7L, 70.0), // target-only -> kept
      (4L, 2L, 20.0))) // unmatched + gate passes -> INSERT
  }

  test("MergeInto: NOT MATCHED BY SOURCE clause family (delete beats update; matched/source-only untouched)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val target = Seq((1L, 10L, 100.0), (2L, 2L, 20.0), (3L, 9L, 90.0))
      .toDF("user_id", "n_events", "sum_value")
    val source = Seq((1L, 4L, 40.0), (5L, 6L, 60.0))
      .toDF("user_id", "n_events", "sum_value")
    val merge = MergeInto.simple(
      key = "user_id",
      payload = Seq("n_events", "sum_value"),
      updateSet = Map("n_events" -> col("s_n_events"),
        "sum_value" -> col("s_sum_value")),
      // user 2 (n=2): absent from source, below floor -> DELETE
      notMatchedBySourceDeleteWhen = Some(col("t_n_events") < 5),
      // user 3 (n=9): absent from source, above floor -> zeroed
      notMatchedBySourceSet = Map("sum_value" -> lit(0.0)))
    val got = merge(target, source).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set(
      (1L, 4L, 40.0), // matched -> overwritten with source
      (3L, 9L, 0.0), // not matched by source -> UPDATE arm (delete lost)
      (5L, 6L, 60.0))) // source-only -> INSERT, BY SOURCE clauses silent
  }

  test("MergeInto: default (no BY SOURCE clauses) keeps target-only rows verbatim") {
    val spark = TestSpark.spark
    import spark.implicits._
    val target = Seq((1L, 10L, 100.0), (2L, 2L, 20.0))
      .toDF("user_id", "n_events", "sum_value")
    val source = Seq((1L, 4L, 40.0)).toDF("user_id", "n_events", "sum_value")
    val merge = MergeInto.simple(key = "user_id",
      payload = Seq("n_events", "sum_value"),
      updateSet = Map("n_events" -> col("s_n_events"),
        "sum_value" -> col("s_sum_value")))
    val got = merge(target, source).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 4L, 40.0), (2L, 2L, 20.0)))
  }

  test("MergeInto clause algebra (randomized): DataFrame form == pure reference model") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    for (trial <- 1 to 5) {
      def rows(): Seq[(Long, Long, Double)] =
        (0L to 20L).filter(_ => rnd.nextBoolean())
          .map(k => (k, rnd.nextInt(10).toLong, rnd.nextInt(100) / 10.0))
      val target = rows()
      val source = rows()
      val delThr = rnd.nextInt(8).toLong
      val insThr = rnd.nextInt(8).toLong
      val bsDelThr = rnd.nextInt(8).toLong
      val useBsDel = rnd.nextBoolean()
      val useBsSet = rnd.nextBoolean()
      val merge = MergeInto.simple(
        key = "k",
        payload = Seq("n", "v"),
        matchedDeleteWhen =
          Some(col("s_n") - col("t_n") > delThr),
        updateSet = Map("n" -> (col("t_n") + col("s_n")),
          "v" -> greatest(col("t_v"), col("s_v"))),
        insertWhen = col("s_n") >= insThr,
        notMatchedBySourceDeleteWhen =
          if (useBsDel) Some(col("t_n") < bsDelThr) else None,
        notMatchedBySourceSet =
          if (useBsSet) Map("v" -> lit(0.0)) else Map.empty)
      val got = merge(target.toDF("k", "n", "v"),
          source.toDF("k", "n", "v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // the reference model: the SQL MERGE contract evaluated row by row
      val tm = target.map(r => r._1 -> r).toMap
      val sm = source.map(r => r._1 -> r).toMap
      val want = (tm.keySet ++ sm.keySet).flatMap { k =>
        (tm.get(k), sm.get(k)) match {
          case (Some(t), Some(s)) =>
            if (s._2 - t._2 > delThr) None
            else Some((k, t._2 + s._2, math.max(t._3, s._3)))
          case (None, Some(s)) =>
            if (s._2 >= insThr) Some(s) else None
          case (Some(t), None) =>
            if (useBsDel && t._2 < bsDelThr) None
            else if (useBsSet) Some((k, t._2, 0.0))
            else Some(t)
          case _ => None
        }
      }
      assert(got === want,
        s"trial $trial (delThr=$delThr insThr=$insThr bsDelThr=$bsDelThr " +
          s"useBsDel=$useBsDel useBsSet=$useBsSet)")
    }
  }

  test("MergeInto: ordered N-clause families — first match wins across " +
    "mixed conditional UPDATE/DELETE clauses") {
    val spark = TestSpark.spark
    import spark.implicits._
    val target = Seq((1L, 10L, 100.0), (2L, 3L, 30.0), (3L, 7L, 70.0),
        (4L, 1L, 10.0))
      .toDF("user_id", "n_events", "sum_value")
    val source = Seq((1L, 20L, 1.0), (2L, 9L, 2.0), (3L, 7L, 3.0),
        (4L, 0L, 4.0), (9L, 5L, 9.0), (10L, 1L, 8.0))
      .toDF("user_id", "n_events", "sum_value")
    val merge = graft.operators.MergeInto(
      keys = Seq("user_id"),
      payload = Seq("n_events", "sum_value"),
      matched = Seq(
        // clause 1: source doubled the count -> take the source verbatim
        graft.operators.MergeClause.update(
          Map("n_events" -> col("s_n_events"),
            "sum_value" -> col("s_sum_value")),
          when = Some(col("s_n_events") >= col("t_n_events") * 2)),
        // clause 2: source fell to zero -> DELETE (user 4; user 1 hit
        // clause 1 first even though it also fails this gate's negation)
        graft.operators.MergeClause.delete(
          when = Some(col("s_n_events") === 0)),
        // clause 3: everything else -> additive update
        graft.operators.MergeClause.update(
          Map("n_events" -> (col("t_n_events") + col("s_n_events"))))),
      notMatched = Seq(
        // insert gate list: big newcomers verbatim, small ones floored
        graft.operators.MergeClause.insert(
          when = Some(col("s_n_events") >= 5)),
        graft.operators.MergeClause.insert(
          when = Some(col("s_sum_value") > 5.0),
          set = Map("n_events" -> lit(1L), "sum_value" -> lit(0.0)))))
    val got = merge(target, source).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set(
      (1L, 20L, 1.0), // matched, clause 1 (20 >= 2*10) — clause 3 shadowed
      (2L, 9L, 2.0), // matched, clause 1 (9 >= 2*3) — clause 3 shadowed
      (3L, 14L, 70.0), // matched, clause 3 additive (sum kept: not set)
      // user 4 (s_n=0): clause 1 misses, clause 2 DELETEs
      (9L, 5L, 9.0), // not matched, insert clause 1
      (10L, 1L, 0.0))) // not matched, insert clause 2 (floored)
  }

  test("MergeInto ordered-clause algebra (randomized): DataFrame form == " +
    "reference model over random clause lists") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.{MergeClause, MergeInto => MI}
    val rnd = new scala.util.Random(163)
    // one clause shape per family, parameterized: matched gates compare
    // the source/target counts, BY SOURCE gates see only the target,
    // insert gates only the source — random thresholds + random order
    // + random delete bits exercise first-match-wins across shapes
    case class MC(thr: Option[Long], delete: Boolean, takeSrc: Boolean)
    for (trial <- 1 to 8) {
      def rows(): Seq[(Long, Long, Double)] =
        (0L to 24L).filter(_ => rnd.nextBoolean())
          .map(k => (k, rnd.nextInt(10).toLong, rnd.nextInt(100) / 10.0))
      val target = rows()
      val source = rows()
      def clauses(n: Int): Seq[MC] =
        (1 to n).map(i => MC(
          if (i == n && rnd.nextBoolean()) None
          else Some(rnd.nextInt(9).toLong - 4),
          rnd.nextBoolean(), rnd.nextBoolean()))
      val mcs = clauses(rnd.nextInt(4))
      val bcs = clauses(rnd.nextInt(3))
      val ics = clauses(rnd.nextInt(3)).map(_.copy(delete = false))
      val merge = MI(
        keys = Seq("k"), payload = Seq("n", "v"),
        matched = mcs.map(c => MergeClause(
          c.thr.map(th => col("s_n") - col("t_n") > th), c.delete,
          if (c.delete) Map.empty
          else if (c.takeSrc) Map("n" -> col("s_n"), "v" -> col("s_v"))
          else Map("n" -> (col("t_n") + col("s_n"))))),
        notMatchedBySource = bcs.map(c => MergeClause(
          c.thr.map(th => col("t_n") > th + 4), c.delete,
          if (c.delete) Map.empty
          else if (c.takeSrc) Map("v" -> lit(0.0))
          else Map("n" -> lit(0L)))),
        notMatched = ics.map(c => MergeClause(
          c.thr.map(th => col("s_n") >= th + 4), delete = false,
          if (c.takeSrc) Map.empty
          else Map("v" -> (col("s_v") + 1.0)))))
      val got = merge(target.toDF("k", "n", "v"), source.toDF("k", "n", "v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // reference model: first firing clause acts, none firing keeps
      // (matched / by-source) or drops (insert)
      val tm = target.map(r => r._1 -> r).toMap
      val sm = source.map(r => r._1 -> r).toMap
      val want = (tm.keySet ++ sm.keySet).flatMap { k =>
        (tm.get(k), sm.get(k)) match {
          case (Some(t), Some(s)) =>
            mcs.find(_.thr.forall(th => s._2 - t._2 > th)) match {
              case Some(c) if c.delete => None
              case Some(c) if c.takeSrc => Some((k, s._2, s._3))
              case Some(_) => Some((k, t._2 + s._2, t._3))
              case None => Some(t)
            }
          case (Some(t), None) =>
            bcs.find(_.thr.forall(th => t._2 > th + 4)) match {
              case Some(c) if c.delete => None
              case Some(c) if c.takeSrc => Some((k, t._2, 0.0))
              case Some(_) => Some((k, 0L, t._3))
              case None => Some(t)
            }
          case (None, Some(s)) =>
            ics.find(_.thr.forall(th => s._2 >= th + 4)) match {
              case Some(c) if c.takeSrc => Some(s)
              case Some(_) => Some((k, s._2, s._3 + 1.0))
              case None => None
            }
          case _ => None
        }
      }
      assert(got === want, s"trial $trial: mcs=$mcs bcs=$bcs ics=$ics")
    }
  }

  test("MergeInto cardinality: duplicate source rows matching one target " +
    "key fail loudly; unmatched duplicates and opted-out merges pass") {
    val spark = TestSpark.spark
    import spark.implicits._
    val target = Seq((1L, 10L, 100.0), (2L, 3L, 30.0))
      .toDF("user_id", "n_events", "sum_value")
    val dupMatched = Seq((1L, 4L, 40.0), (1L, 5L, 50.0))
      .toDF("user_id", "n_events", "sum_value")
    val merge = MergeInto.simple(
      key = "user_id", payload = Seq("n_events", "sum_value"),
      updateSet = Map("n_events" -> (col("t_n_events") + col("s_n_events"))))
    val err = intercept[Exception] {
      merge(target, dupMatched).collect()
    }
    assert(err.getMessage.contains("cardinality violation")
      && err.getMessage.contains("1"), err.getMessage)
    // duplicates on an UNMATCHED key are not a MERGE error (no target row
    // is modified twice) — both rows insert
    val dupUnmatched = Seq((9L, 4L, 40.0), (9L, 5L, 50.0))
      .toDF("user_id", "n_events", "sum_value")
    assert(merge(target, dupUnmatched).count() === 4L)
    // explicit opt-out: sources unique-by-construction skip the window
    val optOut = merge.copy(checkCardinality = false)
    assert(optOut(target, dupMatched).count() === 3L)
  }

  test("q131: store == direct, and every ordered clause arm fires on " +
    "real rows") {
    val spark = TestSpark.spark
    val viaStore = SparkEntry.queries("q131_merge_ordered_clauses")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val (target, source) = MergeOps.q131Inputs(spark, dir)
    val direct = MergeOps.q131Merge(target, source)
      .select(col("user_id"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaStore === direct)
    val j = target.select(col("user_id"), col("n_events").as("tn"),
        col("sum_value").as("tv"))
      .join(source.select(col("user_id"), col("n_events").as("sn"),
        col("sum_value").as("sv")), Seq("user_id"), "full_outer")
    def n(c: org.apache.spark.sql.Column): Long = j.filter(c).count()
    val arms = Map(
      "matched overwrite (sv > tv)" ->
        n(col("tn").isNotNull && col("sv") > col("tv")),
      "matched DELETE (sn < tn - 4)" ->
        n(col("tn").isNotNull && !(col("sv") > col("tv"))
          && col("sn") < col("tn") - 4),
      "matched accumulate" -> n(col("tn").isNotNull && col("sn").isNotNull
        && !(col("sv") > col("tv")) && !(col("sn") < col("tn") - 4)),
      "insert verbatim (even)" ->
        n(col("tn").isNull && col("sn").isNotNull
          && pmod(col("user_id"), lit(2)) === 0),
      "insert floored (odd)" -> n(col("tn").isNull && col("sn").isNotNull
        && pmod(col("user_id"), lit(2)) === 1),
      "target-only kept" -> n(col("sn").isNull && col("tn").isNotNull))
    arms.foreach { case (name, c) =>
      assert(c > 0, s"degenerate rig: arm '$name' never fires at $dir")
    }
  }

  test("mergeCommit refuses a BY SOURCE merge without a full-target " +
    "touched set (partial-sync guard)") {
    val spark = TestSpark.spark
    val (target, source) = MergeOps.q127bInputs(spark, dir)
    val state = s"${java.nio.file.Files.createTempDirectory("graft-bsrc")}/state"
    graft.queries.Layout.trackTemp(new java.io.File(state).getParent)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1: IngestIndex.Manifest = Map("state" ->
      IngestIndex.mergeCommit(spark, state, Map.empty, "state", 1L, target,
        (_, d) => d))
    IngestIndex.writeManifest(fs, state, 1L, m1)
    // a source sliced to ONE user touches one bucket — the BY SOURCE arms
    // would silently skip every other bucket's rows
    val oneKey = source.limit(1)
    val err = intercept[IllegalArgumentException] {
      IngestIndex.mergeCommit(spark, state, m1, "state", 2L, oneKey,
        MergeOps.q127bMerge)
    }
    assert(err.getMessage.contains("NOT MATCHED BY SOURCE"), err.getMessage)
    assert(err.getMessage.contains("commitFullSync"), err.getMessage)
  }

  test("q127b: full-sync MERGE through the store == direct; both BY SOURCE arms fire") {
    val spark = TestSpark.spark
    val viaStore = SparkEntry.queries("q127b_merge_full_sync")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val (target, source) = MergeOps.q127bInputs(spark, dir)
    val direct = MergeOps.q127bMerge(target, source)
      .select(col("user_id"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaStore === direct)
    val targetUsers = target.select("user_id").collect()
      .map(_.getLong(0)).toSet
    assert((targetUsers -- viaStore.map(_._1)).nonEmpty,
      "degenerate rig: no user hit the BY SOURCE DELETE arm")
    assert(viaStore.exists(r => r._3 == 0.0 && r._2 >= MergeOps.SyncStaleFloor),
      "degenerate rig: no user hit the BY SOURCE UPDATE (tombstone) arm")
  }

  test("q134 RESTORE: rollback == pre-damage snapshot; the damaged " +
    "version stays readable; restoring an uncommitted version fails " +
    "loudly; zero data copied") {
    val spark = TestSpark.spark
    val viaRestore = SparkEntry.queries("q134_restore_version")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = SparkEntry.queries("q127_merge_into")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaRestore === direct,
      "the restored table diverged from the pre-damage state")
    val state = MergeOps.stateDirFor(spark, "restore134", dir)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // history preserved: the damaged v3 is still readable and shows the
    // damage (only odd users survive there)
    val damaged = IngestIndex.tableAt(spark, state, "state", 3L)
      .select("user_id").collect().map(_.getLong(0))
    assert(damaged.nonEmpty && damaged.forall(_ % 2 == 1),
      "v3 should hold exactly the damaged (odd-user) state")
    assert(damaged.length < viaRestore.size)
    // zero-copy: the restore commit's version dir holds ONLY the
    // manifest — no data was rewritten
    val v4Contents = fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/v4"))
      .map(_.getPath.getName).filterNot(_.startsWith(".")).toSet
    assert(v4Contents === Set("manifest"),
      s"RESTORE materialized data: $v4Contents")
    // restoring a version that never committed fails loudly
    val err = intercept[IllegalArgumentException] {
      IngestIndex.restore(fs, state, 99L, 5L)
    }
    assert(err.getMessage.contains("RESTORE"), err.getMessage)
  }

  test("type widening across live versions fails loudly with the column and types named") {
    val spark = TestSpark.spark
    import spark.implicits._
    val state = s"${java.nio.file.Files.createTempDirectory("graft-widen")}/state"
    graft.queries.Layout.trackTemp(new java.io.File(state).getParent)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // v1: cnt as INT over many keys (several buckets live)
    val v1 = (1L to 64L).map(u => (u, u.toInt)).toDF("user_id", "cnt")
    val m1: IngestIndex.Manifest = Map("state" ->
      IngestIndex.mergeCommit(spark, state, Map.empty, "state", 1L, v1,
        (_, d) => d))
    IngestIndex.writeManifest(fs, state, 1L, m1)
    // v2: one key's bucket rewritten with cnt WIDENED to LONG — the other
    // buckets stay live at v1 under the old type
    val v2 = Seq((1L, 100L)).toDF("user_id", "cnt")
    val m2: IngestIndex.Manifest = Map("state" ->
      IngestIndex.mergeCommit(spark, state, m1, "state", 2L, v2,
        (_, d) => d))
    IngestIndex.writeManifest(fs, state, 2L, m2)
    val err = intercept[IllegalStateException] {
      IngestIndex.currentTable(spark, state, "state").collect()
    }
    assert(err.getMessage.contains("cnt"), err.getMessage)
    assert(err.getMessage.contains("ADDITION only"), err.getMessage)
    assert(err.getMessage.toLowerCase.contains("integer")
      && err.getMessage.toLowerCase.contains("long"), err.getMessage)
  }

  test("the declared widening migration works: cast-in-combine + compact " +
    "rewrites every live bucket under the new type, then widened batches merge") {
    val spark = TestSpark.spark
    import spark.implicits._
    val state = s"${java.nio.file.Files.createTempDirectory("graft-widen2")}/state"
    graft.queries.Layout.trackTemp(new java.io.File(state).getParent)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // v1: INT counters over many buckets
    val v1 = (1L to 64L).map(u => (u, u.toInt)).toDF("user_id", "cnt")
    val m1: IngestIndex.Manifest = Map("state" ->
      IngestIndex.mergeCommit(spark, state, Map.empty, "state", 1L, v1,
        (_, d) => d))
    IngestIndex.writeManifest(fs, state, 1L, m1)
    // migration step (what the loud error recommends): a commit whose
    // combine CASTS every touched row — here touching ALL buckets via a
    // full-sync-shaped commit — then compact folds the store so every
    // live bucket carries the widened schema
    val allKeys = (1L to 64L).map(u => (u, 0L)).toDF("user_id", "delta")
    val live = m1("state").keySet
    val m2: IngestIndex.Manifest = Map("state" ->
      IngestIndex.mergeCommit(spark, state, m1, "state", 2L, allKeys,
        (cur, _) => cur.select(col("user_id"),
          col("cnt").cast("long").as("cnt")),
        touchedKnown = Some(live)))
    IngestIndex.writeManifest(fs, state, 2L, m2)
    IngestIndex.compact(spark, state, 2L)
    // post-migration: a LONG batch merges cleanly and reads back
    val v3 = Seq((1L, 1000000000000L), (65L, 7L)).toDF("user_id", "cnt")
    val m2c = IngestIndex.readManifest(fs, state, 2L)
    val m3: IngestIndex.Manifest = Map("state" ->
      IngestIndex.mergeCommit(spark, state, m2c, "state", 3L, v3,
        (cur, d) => cur.unionByName(d).groupBy("user_id")
          .agg(sum(col("cnt")).as("cnt"))))
    IngestIndex.writeManifest(fs, state, 3L, m3)
    val got = IngestIndex.currentTable(spark, state, "state")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 1000000000001L, "widened merge lost the long range")
    assert(got(65L) === 7L)
    assert(got.size === 65)
  }

  test("q127: MERGE through the bucketed store == MergeInto applied directly") {
    val spark = TestSpark.spark
    val viaStore = SparkEntry.queries("q127_merge_into")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val (target, source) = MergeOps.q127Inputs(spark, dir)
    val direct = MergeOps.q127Merge(target, source)
      .select(col("user_id"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaStore === direct)
    assert(viaStore.nonEmpty)
    // the DELETE clause genuinely removed matched rows: some target user
    // must be absent from the result
    val targetUsers = target.select("user_id").collect()
      .map(_.getLong(0)).toSet
    assert((targetUsers -- viaStore.map(_._1)).nonEmpty,
      "degenerate rig: no user hit the DELETE clause")
  }

  test("q128: evolved fold == direct recompute; pre-evolution snapshot lacks the column") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("q128_schema_evolution")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    val direct = Q.events(spark, dir).groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(18,4)")
          .cast("double").as("sum_value"),
        max(when(pmod(col("event_id"), lit(4)) >= 2, col("value")))
          .as("max_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(rows === direct)
    assert(rows.exists(_._4.isDefined),
      "degenerate rig: no user saw a post-evolution batch")
    // the evolved column is genuinely NEW: the batch-2 snapshot (v2,
    // committed before evolution) reads back WITHOUT it
    val state = MergeOps.stateDirFor(spark, "evolve", dir)
    val preEvo = IngestIndex.tableAt(spark, state, "state", 2L)
    assert(!preEvo.columns.contains("max_value"),
      s"v2 snapshot should predate max_value: ${preEvo.columns.mkString(",")}")
    assert(preEvo.count() > 0)
    val postEvo = IngestIndex.tableAt(spark, state, "state", 4L)
    assert(postEvo.columns.contains("max_value"))
  }
}
