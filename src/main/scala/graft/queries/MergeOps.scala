package graft.queries

import graft.{Q, QueryDef}
import graft.operators.MergeInto
import graft.streaming.IngestIndex
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Q127/Q128: the two table-maintenance surfaces the bucketed persistent
  * store ([[IngestIndex]]) was still missing after r14's CDF family —
  * the declarative multi-clause MERGE statement and in-place schema
  * evolution. Both run THROUGH the store (touched-bucket reads/writes,
  * manifest commits), so their cost geometry is the store's: O(batch +
  * touched buckets) per commit, never O(table).
  */
object MergeOps {

  private val dec = DecimalType(18, 4)

  /** Per-user (n_events, sum_value) over `df` — the shared target/source
    * aggregate (q86's state shape minus the timestamp). The sum is
    * re-cast to DECIMAL(18,4) so the STORED schema is version-stable
    * (EventStream's documented treatment). */
  private def userAgg(df: DataFrame): DataFrame =
    df.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      sum(col("value").cast(dec)).cast(dec).as("sum_value"))

  /** Commit `delta` into the `state` table under version `next` with
    * `combine`, writing the manifest — one store transaction. `touched`
    * overrides the touched-bucket set (the full-sync path passes all
    * live buckets). Returns the manifest. */
  private def commit(s: SparkSession, state: String,
      m: IngestIndex.Manifest, next: Long, delta: DataFrame,
      combine: (DataFrame, DataFrame) => DataFrame,
      touched: Option[Set[Int]] = None): IngestIndex.Manifest = {
    val fs = new Path(state)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val map = IngestIndex.mergeCommit(s, state, m, "state", next, delta,
      combine, touchedKnown = touched)
    val nm: IngestIndex.Manifest = Map("state" -> map)
    IngestIndex.writeManifest(fs, state, next, nm, op = "merge")
    nm
  }

  /** The q127 MERGE statement — all three clause kinds fire on real
    * data: source users more active than their target row are DELETED,
    * other matched users UPDATED (adds are associative + exact), users
    * new to the source INSERTED. */
  private[graft] val q127Merge = MergeInto.simple(
    key = "user_id",
    payload = Seq("n_events", "sum_value"),
    matchedDeleteWhen = Some(col("s_n_events") > col("t_n_events")),
    updateSet = Map(
      "n_events" -> (col("t_n_events") + col("s_n_events")),
      "sum_value" ->
        (col("t_sum_value") + col("s_sum_value")).cast(dec)))

  /** q127's two input halves: target = even event_ids, source = odd. */
  private[graft] def q127Inputs(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val ev = Q.events(s, d)
    (userAgg(ev.filter(pmod(col("event_id"), lit(2)) === 0)),
      userAgg(ev.filter(pmod(col("event_id"), lit(2)) === 1)))
  }

  /** q127b NOT-MATCHED-BY-SOURCE floor: a target row absent from the sync
    * snapshot with fewer events than this is pruned (DELETE); the rest are
    * tombstone-zeroed (UPDATE). 66 splits the per-user event counts so
    * BOTH arms fire on real rows at sf0.001 and sf0.01 (measured 3/2 and
    * 21/29). Shared with the oracle SQL. */
  private[graft] val SyncStaleFloor = 66L

  /** The q127b FULL-SYNC merge — the SQL:2023 third clause family on real
    * rows: matched rows are OVERWRITTEN with the snapshot's values (not
    * added — the sync semantics), target rows the snapshot no longer
    * carries are DELETED below [[SyncStaleFloor]] events and
    * tombstone-zeroed above it. */
  private[graft] val q127bMerge = MergeInto.simple(
    key = "user_id",
    payload = Seq("n_events", "sum_value"),
    updateSet = Map(
      "n_events" -> col("s_n_events"),
      "sum_value" -> col("s_sum_value")),
    notMatchedBySourceDeleteWhen =
      Some(col("t_n_events") < SyncStaleFloor),
    notMatchedBySourceSet = Map("sum_value" -> lit(0).cast(dec)))

  /** q127b's halves: target = every user's full aggregate; source = the
    * "fresh sync snapshot" — even event_ids of users with user_id % 3 <> 0
    * (a deterministic, SQL-expressible strict subset of the target's
    * keys, so the BY SOURCE clauses genuinely fire). */
  private[graft] def q127bInputs(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val ev = Q.events(s, d)
    (userAgg(ev),
      userAgg(ev.filter(pmod(col("user_id"), lit(3)) =!= 0
        && pmod(col("event_id"), lit(2)) === 0)))
  }

  /** Commit a FULL-SYNC merge: unlike the touched-bucket commit, a merge
    * with NOT MATCHED BY SOURCE clauses must see EVERY target row (a key
    * can be acted on precisely because the batch does NOT carry it), so
    * the touched set is all live buckets plus the delta's own — the same
    * full-target-scan cost Delta documents for this clause family. The
    * manifest/version/replay contract is unchanged (one [[commit]] with
    * an overridden touched set — r15 review fold). */
  private[graft] def commitFullSync(s: SparkSession, state: String,
      m: IngestIndex.Manifest, next: Long, delta: DataFrame,
      combine: (DataFrame, DataFrame) => DataFrame): IngestIndex.Manifest = {
    val n = IngestIndex.numBuckets(s)
    val gens = IngestIndex.gensOf(m, "state")
    val deltaBkts = IngestIndex.assignBucket(delta, "state", n, gens)
      .select("bkt").distinct().collect().map(_.getInt(0)).toSet
    val live = m.getOrElse("state", Map.empty[Int, IngestIndex.Bkt]).keySet
    commit(s, state, m, next, delta, combine,
      touched = Some(live ++ deltaBkts))
  }

  /** The staging state dir of query `kind` (spec access). */
  private[graft] def stateDirFor(s: SparkSession, kind: String,
      d: String): String = s"${Layout.stagePath(s, kind, d)}/state"

  /** Run q128's 4-batch evolving fold, returning the state dir (batches
    * 0-1 write the 2-column payload, batches 2-3 bring `max_value` —
    * the store evolves in place; no GC, so every snapshot stays
    * readable for the spec's pre-evolution time-travel check). */
  private[graft] def runEvolvingFold(s: SparkSession, d: String): String = {
    val ev = Q.events(s, d)
    def slice(i: Int): DataFrame =
      ev.filter(pmod(col("event_id"), lit(4)) === i)
    // pre-evolution combine: q86's add/add algebra on the 2-col payload
    val baseCombine: (DataFrame, DataFrame) => DataFrame = (cur, dl) =>
      cur.select(col("user_id"), col("n_events").as("c_n"),
          col("sum_value").as("c_s"))
        .join(dl, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("c_n"), lit(0L))
            + coalesce(col("n_events"), lit(0L))).as("n_events"),
          (coalesce(col("c_s"), lit(0).cast(dec))
            + coalesce(col("sum_value"), lit(0).cast(dec)))
            .cast(dec).as("sum_value"))
    // post-evolution combine: the delta brings `max_value`; the current
    // slice may predate it (readTable null-fills buckets last written
    // under the old schema, and this normalization covers the slice
    // whose every live bucket is still pre-evolution)
    val evoCombine: (DataFrame, DataFrame) => DataFrame = (cur, dl) => {
      val c0 = if (cur.columns.contains("max_value")) cur
        else cur.withColumn("max_value", lit(null).cast(DoubleType))
      c0.select(col("user_id"), col("n_events").as("c_n"),
          col("sum_value").as("c_s"), col("max_value").as("c_m"))
        .join(dl, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("c_n"), lit(0L))
            + coalesce(col("n_events"), lit(0L))).as("n_events"),
          (coalesce(col("c_s"), lit(0).cast(dec))
            + coalesce(col("sum_value"), lit(0).cast(dec)))
            .cast(dec).as("sum_value"),
          // greatest skips NULLs: keys untouched by evolved batches
          // keep NULL — exactly "no post-evolution observation"
          greatest(col("c_m"), col("max_value")).as("max_value"))
    }
    val state = stateDirFor(s, "evolve", d)
    var m: IngestIndex.Manifest = Map.empty
    for (i <- 0 until 4) {
      val delta =
        if (i < 2) userAgg(slice(i))
        else slice(i).groupBy("user_id").agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(dec)).cast(dec).as("sum_value"),
          max(col("value")).as("max_value"))
      m = commit(s, state, m, i + 1L, delta,
        if (i < 2) baseCombine else evoCombine)
    }
    state
  }

  /** The q127-shaped ADD combine shared by the interleaved rig: per-key
    * full-outer add of (n_events, sum_value) — associative and exact,
    * so any slicing of the event stream folds to the one-shot
    * aggregate. */
  private[graft] val addCombine: (DataFrame, DataFrame) => DataFrame =
    (cur, dl) => cur
      .select(col("user_id"), col("n_events").as("c_n"),
        col("sum_value").as("c_s"))
      .join(dl, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("c_n"), lit(0L))
          + coalesce(col("n_events"), lit(0L))).as("n_events"),
        (coalesce(col("c_s"), lit(0).cast(dec))
          + coalesce(col("sum_value"), lit(0).cast(dec)))
          .cast(dec).as("sum_value"))

  /** Q132b INTERLEAVED UPSERT + ERASURE (r17): the production topology
    * q132 stopped short of — ONE sequential committer alternating merge
    * triggers and right-to-be-forgotten DV deletes on the SAME table.
    * Version arithmetic is latestVersion-based (each verb commits
    * top+1), upserts go through [[IngestIndex.mergeCommitDv]] so a
    * merge against a live vector composes: the combine sees the
    * post-delete slice, and a tombstoned user whose later activity
    * re-inserts them becomes VISIBLE again with only their post-delete
    * aggregate (the tombstone for a rewritten bucket is invalidated —
    * the r16 advisor's resurrect/suppress hole, now closed and
    * oracle-gated). Sequence: U(slice0), U(slice1), D(u%12==1),
    * U(slice2), D(u%12==2), U(slice3) — a user's final row is the
    * aggregate of their events in slices strictly after their delete
    * point, which the DuckDB oracle states directly. Returns the state
    * dir. */
  private[graft] def runInterleaved(s: SparkSession, d: String): String = {
    val ev = Q.events(s, d)
    val state = stateDirFor(s, "inter132b", d)
    val fs = new Path(state)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(state), true)
    var m: IngestIndex.Manifest = Map.empty
    var top = 0L
    def upsert(i: Int): Unit = {
      val delta = userAgg(ev.filter(pmod(col("event_id"), lit(4)) === i))
      m = IngestIndex.mergeCommitDv(s, state, m, "state", top + 1, delta,
        addCombine)
      IngestIndex.writeManifest(fs, state, top + 1, m, op = "merge")
      top += 1
    }
    def erase(k: Int): Unit = {
      val t = ev.filter(pmod(col("user_id"), lit(12)) === k)
        .select("user_id").distinct()
      m = IngestIndex.deleteWithDv(s, state, m, "state", top + 1, t)
      IngestIndex.writeManifest(fs, state, top + 1, m, op = "delete-dv")
      top += 1
    }
    upsert(0); upsert(1); erase(1); upsert(2); erase(2); upsert(3)
    state
  }

  /** Q124b's live stats store: the q86-shaped per-user aggregate built
    * by 4 incremental commits (event_id mod 4 slices, add algebra), each
    * commit also recording its WRITTEN buckets' stats rows
    * ([[IngestIndex.writeBucketStats]] — stats IO O(touched), the
    * incremental maintenance q118/q124's OPTIMIZE-built manifest lacked).
    * Returns (stateDir, final manifest). */
  private[graft] def runStatsStore(s: SparkSession, d: String,
      kind: String = "stats124b", sumCols: Seq[String] = Nil)
      : (String, IngestIndex.Manifest) = {
    val ev = Q.events(s, d)
    val state = stateDirFor(s, kind, d)
    val fs = new Path(state)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(state), true)
    var m: IngestIndex.Manifest = Map.empty
    for (i <- 0 until 4) {
      val delta = userAgg(ev.filter(pmod(col("event_id"), lit(4)) === i))
      val map = IngestIndex.mergeCommit(s, state, m, "state", i + 1L,
        delta, addCombine)
      m = Map("state" -> map)
      IngestIndex.writeBucketStats(s, state, "state", i + 1L,
        Seq("n_events", "sum_value"), sumCols)
      IngestIndex.writeManifest(fs, state, i + 1L, m, op = "merge")
      IngestIndex.gc(fs, state, i.toLong, i + 1L)
    }
    (state, m)
  }

  /** The q131 ordered-clause MERGE (r16): SQL:2023 allows an ordered
    * LIST of conditional clauses per family, first match wins — the r15
    * verdict's generality gap. Gates chosen so EVERY arm fires on real
    * rows at sf0.001 AND sf0.01 (measured 5/3/2/1/1/2 and
    * 59/22/22/8/9/25): matched users whose source sum outran the target
    * are OVERWRITTEN, else those whose source count fell >4 behind are
    * DELETED, the rest accumulate; unmatched even users insert
    * verbatim, odd ones insert with the sum ZEROED (the second,
    * conditional INSERT clause). */
  private[graft] val q131Merge = MergeInto(
    keys = Seq("user_id"),
    payload = Seq("n_events", "sum_value"),
    matched = Seq(
      graft.operators.MergeClause.update(
        Map("n_events" -> col("s_n_events"),
          "sum_value" -> col("s_sum_value")),
        when = Some(col("s_sum_value") > col("t_sum_value"))),
      graft.operators.MergeClause.delete(
        when = Some(col("s_n_events") < col("t_n_events") - 4)),
      graft.operators.MergeClause.update(
        Map("n_events" -> (col("t_n_events") + col("s_n_events")),
          "sum_value" ->
            (col("t_sum_value") + col("s_sum_value")).cast(dec)))),
    notMatched = Seq(
      graft.operators.MergeClause.insert(
        when = Some(pmod(col("user_id"), lit(2)) === 0)),
      graft.operators.MergeClause.insert(
        set = Map("sum_value" -> lit(0).cast(dec)))))

  /** q131's halves: target = even events of users outside the mod-7
    * stripe, source = odd events of users outside the mod-5 stripe —
    * the stripes create genuine target-only and source-only keys, the
    * even/odd split keeps matched counts close enough that both the
    * overwrite and the delete gate find rows. */
  private[graft] def q131Inputs(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val ev = Q.events(s, d)
    (userAgg(ev.filter(pmod(col("event_id"), lit(2)) === 0
        && pmod(col("user_id"), lit(7)) =!= 0)),
      userAgg(ev.filter(pmod(col("event_id"), lit(2)) === 1
        && pmod(col("user_id"), lit(5)) =!= 0)))
  }

  val defs: Seq[QueryDef] = Seq(
    // Q132b INTERLEAVED UPSERT + ERASURE (r17): see runInterleaved — the
    // one-committer alternating-verb topology. The oracle recomputes
    // every user's post-delete aggregate directly (u%12==1 counts only
    // slices 2-3, u%12==2 only slice 3, everyone else everything): hash
    // equality proves the DV composed with the merges (no resurrection,
    // no suppression of re-inserts) across the whole interleaving.
    QueryDef("q132b_interleaved_upsert_erasure",
      (s, d) => {
        val state = runInterleaved(s, d)
        IngestIndex.currentTable(s, state, "state")
          .select(col("user_id"), col("n_events"),
            col("sum_value").cast(DoubleType).as("sum_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL})
             |SELECT user_id, COUNT(*) AS n_events,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM e
             |WHERE (event_id % 4) >= (CASE user_id % 12
             |  WHEN 1 THEN 2 WHEN 2 THEN 3 ELSE 0 END)
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q124b METADATA-ONLY COUNT ON THE LIVE STORE (r17): q124 answers
    // box counts from an OPTIMIZE-built file manifest; this answers them
    // from the streaming store's own per-bucket stats, maintained
    // incrementally commit by commit (stats IO O(touched buckets) per
    // commit — IngestIndex.writeBucketStats). Box 1 is the full range:
    // every bucket's stats prove containment, COUNT(*) costs ZERO data
    // IO on the live table (Delta's numRecords fast path; the spec pins
    // bucketsScanned == 0). Boxes 2-3 are n_events ranges: hash buckets
    // rarely prove containment for those (per-bucket min/max spans the
    // global range — the honest hash-layout story; range-heavy
    // workloads cluster with q107/q118), so straddling buckets scan
    // with the exact residual filter. The oracle recomputes all three
    // counts from raw events.
    QueryDef("q124b_metadata_count_live_store",
      (s, d) => {
        val (state, m) = runStatsStore(s, d)
        val boxes = Seq(
          1 -> Seq(("n_events", 0.0, 1e15)),
          2 -> Seq(("n_events", 66.0, 1e15)),
          3 -> Seq(("n_events", 20.0, 50.0)))
        val sp = s
        import sp.implicits._
        boxes.map { case (id, bs) =>
          (id, IngestIndex.metadataCount(s, state, m, "state", bs)._1)
        }.toDF("box_id", "n_rows").orderBy("box_id")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |agg AS (SELECT user_id, COUNT(*) AS n FROM e
             |  GROUP BY user_id)
             |SELECT CAST(1 AS INT) AS box_id, COUNT(*) AS n_rows FROM agg
             |UNION ALL
             |SELECT CAST(2 AS INT), COUNT(*) FROM agg WHERE n >= 66
             |UNION ALL
             |SELECT CAST(3 AS INT), COUNT(*) FROM agg
             |  WHERE n >= 20 AND n < 50
             |ORDER BY box_id""".stripMargin)),

    // Q124c METADATA-ONLY MIN/MAX/SUM (r18): Delta's stats path beyond
    // COUNT — with per-bucket sums recorded commit-by-commit
    // (writeBucketStats sumCols, stats IO still O(touched)), full-range
    // MIN/MAX/SUM/COUNT answers from stats alone with ZERO data buckets
    // scanned (the spec pins bucketsScanned == 0 for box 1), and
    // interval boxes compose exactly: contained buckets contribute
    // stats, straddlers contribute one residual-filtered scan row.
    // Decimal sums ride the stats in Spark's exact SUM type, so the
    // composition is bit-exact against the oracle's one-shot aggregate.
    QueryDef("q124c_metadata_aggregate",
      (s, d) => {
        val (state, m) = runStatsStore(s, d, "stats124c",
          sumCols = Seq("n_events", "sum_value"))
        val boxSets: Seq[(Int, Seq[(String, Double, Double)])] = Seq(
          1 -> Nil, // full range: pure metadata
          2 -> Seq(("n_events", 40.0, 70.0)), // straddles: composes
          3 -> Seq(("n_events", 66.0, 1e15)))
        val sp = s
        import sp.implicits._
        boxSets.map { case (id, bs) =>
          val (df, _, _, _) = IngestIndex.metadataAggregate(s, state, m,
            "state", bs, Seq("n_events"), Seq("n_events", "sum_value"))
          val r = df.head()
          (id, r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(2),
            r.getDecimal(3).doubleValue)
        }.toDF("box_id", "min_n", "max_n", "n_rows", "sum_n",
          "sum_value").orderBy("box_id")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |agg AS (SELECT user_id, COUNT(*) AS n,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |      AS DECIMAL(18,4)) AS sv
             |  FROM e GROUP BY user_id),
             |b AS (
             |  SELECT 1 AS box_id, MIN(n) AS mn, MAX(n) AS mx,
             |    COUNT(*) AS c, SUM(n) AS sn, SUM(sv) AS sval FROM agg
             |  UNION ALL SELECT 2, MIN(n), MAX(n), COUNT(*), SUM(n),
             |    SUM(sv) FROM agg WHERE n >= 40 AND n < 70
             |  UNION ALL SELECT 3, MIN(n), MAX(n), COUNT(*), SUM(n),
             |    SUM(sv) FROM agg WHERE n >= 66)
             |SELECT CAST(box_id AS INT) AS box_id,
             |  CAST(mn AS BIGINT) AS min_n, CAST(mx AS BIGINT) AS max_n,
             |  CAST(c AS BIGINT) AS n_rows, CAST(sn AS BIGINT) AS sum_n,
             |  CAST(sval AS DOUBLE) AS sum_value
             |FROM b ORDER BY box_id""".stripMargin)),

    // Q135 SQL MERGE INTO (r17, carried r15 task #5): q127's statement
    // as the TEXT every lakehouse user types — `spark.sql("MERGE INTO
    // ...")` parsed by Spark's own grammar, routed by the GraftSql
    // surface to the same MergeInto algebra over the same store. The
    // oracle is q127's SQL verbatim: the entry point must be
    // unobservable in the result (SqlSurfaceSpec additionally pins SQL
    // == DataFrame row-for-row and the guard rails).
    QueryDef("q135_merge_sql_entry",
      (s, d) => {
        val (target, source) = q127Inputs(s, d)
        val state = stateDirFor(s, "merge135", d)
        val fs = new Path(state)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(state), true)
        commit(s, state, Map.empty, 1L, target, (_, dl) => dl)
        graft.operators.GraftSql.registerTable("graft_q135_state", state,
          "state")
        source.createOrReplaceTempView("graft_q135_src")
        // try/finally (review fix): a failed statement must not leak the
        // process-global registration for the JVM lifetime
        try graft.operators.GraftSql.sql(s,
          """MERGE INTO graft_q135_state AS t USING graft_q135_src AS s
            |ON t.user_id = s.user_id
            |WHEN MATCHED AND s.n_events > t.n_events THEN DELETE
            |WHEN MATCHED THEN UPDATE SET
            |  n_events = t.n_events + s.n_events,
            |  sum_value = CAST(t.sum_value + s.sum_value
            |    AS DECIMAL(18,4))
            |WHEN NOT MATCHED THEN INSERT (user_id, n_events, sum_value)
            |  VALUES (s.user_id, s.n_events, s.sum_value)
            |""".stripMargin)
        finally graft.operators.GraftSql.unregisterTable("graft_q135_state")
        IngestIndex.currentTable(s, state, "state")
          .select(col("user_id"), col("n_events"),
            col("sum_value").cast(DoubleType).as("sum_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |t AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE event_id % 2 = 0 GROUP BY user_id),
             |s AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE event_id % 2 = 1 GROUP BY user_id),
             |m AS (SELECT COALESCE(t.user_id, s.user_id) AS user_id,
             |    t.n_events AS tn, t.sum_value AS tv,
             |    s.n_events AS sn, s.sum_value AS sv
             |  FROM t FULL JOIN s ON t.user_id = s.user_id)
             |SELECT user_id,
             |  CASE WHEN tn IS NOT NULL AND sn IS NOT NULL THEN tn + sn
             |       WHEN tn IS NOT NULL THEN tn ELSE sn END AS n_events,
             |  CAST(CASE WHEN tn IS NOT NULL AND sn IS NOT NULL
             |       THEN CAST(tv + sv AS DECIMAL(18,4))
             |       WHEN tn IS NOT NULL THEN tv ELSE sv END
             |    AS DOUBLE) AS sum_value
             |FROM m
             |WHERE NOT (tn IS NOT NULL AND sn IS NOT NULL AND sn > tn)
             |ORDER BY user_id""".stripMargin)),

    // Q136 SQL MERGE INTO, ORDERED CLAUSES (r17): q131's six-arm
    // statement through the SQL parser — the ordered WHEN lists
    // (overwrite-beats-delete-beats-accumulate, two INSERT arms
    // including `INSERT *`) must round-trip through Spark's grammar
    // into the same first-match-wins algebra. Oracle = q131's ordered
    // CASE chain verbatim.
    QueryDef("q136_merge_sql_ordered",
      (s, d) => {
        val (target, source) = q131Inputs(s, d)
        val state = stateDirFor(s, "merge136", d)
        val fs = new Path(state)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(state), true)
        commit(s, state, Map.empty, 1L, target, (_, dl) => dl)
        graft.operators.GraftSql.registerTable("graft_q136_state", state,
          "state")
        source.createOrReplaceTempView("graft_q136_src")
        try graft.operators.GraftSql.sql(s,
          """MERGE INTO graft_q136_state AS t USING graft_q136_src AS s
            |ON t.user_id = s.user_id
            |WHEN MATCHED AND s.sum_value > t.sum_value THEN UPDATE SET
            |  n_events = s.n_events, sum_value = s.sum_value
            |WHEN MATCHED AND s.n_events < t.n_events - 4 THEN DELETE
            |WHEN MATCHED THEN UPDATE SET
            |  n_events = t.n_events + s.n_events,
            |  sum_value = CAST(t.sum_value + s.sum_value
            |    AS DECIMAL(18,4))
            |WHEN NOT MATCHED AND s.user_id % 2 = 0 THEN INSERT *
            |WHEN NOT MATCHED THEN INSERT (user_id, n_events, sum_value)
            |  VALUES (s.user_id, s.n_events, CAST(0 AS DECIMAL(18,4)))
            |""".stripMargin)
        finally graft.operators.GraftSql.unregisterTable("graft_q136_state")
        IngestIndex.currentTable(s, state, "state")
          .select(col("user_id"), col("n_events"),
            col("sum_value").cast(DoubleType).as("sum_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |t AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE event_id % 2 = 0 AND user_id % 7 <> 0
             |  GROUP BY user_id),
             |s AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE event_id % 2 = 1 AND user_id % 5 <> 0
             |  GROUP BY user_id),
             |m AS (SELECT COALESCE(t.user_id, s.user_id) AS user_id,
             |    t.n_events AS tn, t.sum_value AS tv,
             |    s.n_events AS sn, s.sum_value AS sv
             |  FROM t FULL JOIN s ON t.user_id = s.user_id)
             |SELECT user_id,
             |  CASE WHEN tn IS NOT NULL AND sn IS NOT NULL THEN
             |         CASE WHEN sv > tv THEN sn ELSE tn + sn END
             |       WHEN tn IS NOT NULL THEN tn
             |       ELSE sn END AS n_events,
             |  CAST(CASE WHEN tn IS NOT NULL AND sn IS NOT NULL THEN
             |         CASE WHEN sv > tv THEN sv
             |              ELSE CAST(tv + sv AS DECIMAL(18,4)) END
             |       WHEN tn IS NOT NULL THEN tv
             |       WHEN user_id % 2 = 0 THEN sv
             |       ELSE CAST(0 AS DECIMAL(18,4)) END
             |    AS DOUBLE) AS sum_value
             |FROM m
             |WHERE NOT (tn IS NOT NULL AND sn IS NOT NULL
             |           AND NOT sv > tv AND sn < tn - 4)
             |ORDER BY user_id""".stripMargin)),

    // Q137 SQL TIME-TRAVEL READ (r17): the READ half of the SQL surface
    // — `SELECT ... FROM <registered store> VERSION AS OF 1` through
    // spark.sql (Spark parses the clause natively; the injected
    // GraftStoreReadRule resolves it to IngestIndex.tableAt). The store
    // reaches q127's post-merge state at v2, then the query reads the
    // PRE-MERGE snapshot v1 — the oracle recomputes v1's contents (the
    // even-event aggregate) directly, so hash equality proves the SQL
    // read is the snapshot, not the current table.
    QueryDef("q137_sql_time_travel_read",
      (s, d) => {
        val (target, source) = q127Inputs(s, d)
        val state = stateDirFor(s, "read137", d)
        val fs = new Path(state)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(state), true)
        val m1 = commit(s, state, Map.empty, 1L, target, (_, dl) => dl)
        commit(s, state, m1, 2L, source, q127Merge)
        graft.operators.GraftSql.registerTable("graft_q137_state", state,
          "state")
        try s.sql(
          """SELECT user_id, n_events,
            |  CAST(sum_value AS DOUBLE) AS sum_value
            |FROM graft_q137_state VERSION AS OF 1
            |ORDER BY user_id""".stripMargin)
        finally graft.operators.GraftSql.unregisterTable("graft_q137_state")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL})
             |SELECT user_id, COUNT(*) AS n_events,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM e WHERE event_id % 2 = 0
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q137b SQL TIMESTAMP TRAVEL (r18): the wall-clock half of the SQL
    // time-travel surface — `FROM <store> TIMESTAMP AS OF <instant>`
    // resolves through the manifest mtimes (IngestIndex.versionAt:
    // newest version at or before the instant, Delta's rule, with the
    // mtime as the commit timestamp — the same input DESCRIBE HISTORY
    // and the wall-clock gc window already use). The rig commits v1
    // (pre-merge) then v2 (the q127 merge) and asks for the instant
    // JUST BEFORE v2's commit: the read must be the v1 snapshot, which
    // the oracle recomputes directly (q137's oracle verbatim — version
    // and timestamp travel to the same snapshot must agree).
    QueryDef("q137b_sql_timestamp_travel",
      (s, d) => {
        val (target, source) = q127Inputs(s, d)
        val state = stateDirFor(s, "read137b", d)
        val fs = new Path(state)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(state), true)
        val m1 = commit(s, state, Map.empty, 1L, target, (_, dl) => dl)
        commit(s, state, m1, 2L, source, q127Merge)
        val mt2 = IngestIndex.describeHistory(fs, state)
          .find(_.version == 2L).map(_.manifestMtime).get
        graft.operators.GraftSql.registerTable("graft_q137b_state", state,
          "state")
        // epoch-millis literal: commits are Spark jobs apart, so
        // (v2 mtime - 1) is always >= v1's mtime and < v2's
        try s.sql(
          s"""SELECT user_id, n_events,
             |  CAST(sum_value AS DOUBLE) AS sum_value
             |FROM graft_q137b_state TIMESTAMP AS OF ${mt2 - 1}
             |ORDER BY user_id""".stripMargin)
        finally graft.operators.GraftSql.unregisterTable(
          "graft_q137b_state")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL})
             |SELECT user_id, COUNT(*) AS n_events,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM e WHERE event_id % 2 = 0
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q138 SQL CREATE TABLE + INSERT INTO (r18): the DDL/bulk-load half
    // of the SQL surface — a user CREATEs a keyed store table and loads
    // it with two INSERT commits entirely through spark.sql (no Scala
    // seeding), then reads it back through the same SQL surface. The
    // two inserts partition the users (even/odd), so the PRIMARY KEY
    // append law holds and the final table is every user's aggregate —
    // which the oracle recomputes directly from raw events. One INSERT
    // is positional, the other lists its columns (both mapping paths
    // oracle-gated); SqlSurfaceSpec pins the guard rails (duplicate-key
    // errors, IF NOT EXISTS, empty-table reads, OVERWRITE, meta
    // durability).
    QueryDef("q138_sql_create_insert",
      (s, d) => {
        val ev = Q.events(s, d)
        val state = stateDirFor(s, "create138", d)
        val fs = new Path(state)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(state), true)
        userAgg(ev.filter(pmod(col("user_id"), lit(2)) === 0))
          .createOrReplaceTempView("graft_q138_even")
        userAgg(ev.filter(pmod(col("user_id"), lit(2)) === 1))
          .createOrReplaceTempView("graft_q138_odd")
        try {
          s.sql(
            s"""CREATE TABLE graft_q138_users (
               |  user_id BIGINT, n_events BIGINT,
               |  sum_value DECIMAL(18,4),
               |  PRIMARY KEY (user_id)
               |) USING graft LOCATION '$state'""".stripMargin)
          s.sql("INSERT INTO graft_q138_users " +
            "SELECT user_id, n_events, sum_value FROM graft_q138_even")
          s.sql("INSERT INTO graft_q138_users " +
            "(user_id, n_events, sum_value) " +
            "SELECT user_id, n_events, sum_value FROM graft_q138_odd")
          s.sql(
            """SELECT user_id, n_events,
              |  CAST(sum_value AS DOUBLE) AS sum_value
              |FROM graft_q138_users ORDER BY user_id""".stripMargin)
        } finally graft.operators.GraftSql.unregisterTable(
          "graft_q138_users")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL})
             |SELECT user_id, COUNT(*) AS n_events,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q145 CTAS (r19): `CREATE TABLE ... USING graft ... AS SELECT` —
    // the one DDL form r18 left out. The law this rig hash-gates:
    //   (a) CTAS == CREATE + INSERT, row for row (both variants read
    //       back against ONE recompute, tagged);
    //   (b) IF NOT EXISTS CTAS is a WHOLE-STATEMENT no-op — the rig
    //       re-runs the CTAS with +1000000-shifted keys, and the
    //       read-back proving the table untouched IS the gated result;
    //   (c) the seed commit's provenance is pinned OBSERVABLY: each
    //       variant's row carries its v1 operation tag from DESCRIBE
    //       HISTORY ('create-as-select' vs 'insert'), which the oracle
    //       hardcodes.
    QueryDef("q145_sql_ctas",
      (s, d) => {
        val ev = Q.events(s, d)
        val dirA = stateDirFor(s, "ctas145a", d)
        val dirB = stateDirFor(s, "ctas145b", d)
        val fs = new Path(dirA)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(dirA), true)
        fs.delete(new Path(dirB), true)
        userAgg(ev).createOrReplaceTempView("graft_q145_src")
        try {
          s.sql(
            s"""CREATE TABLE graft_q145_ctas (PRIMARY KEY (user_id))
               |USING graft LOCATION '$dirA' AS
               |SELECT user_id, n_events, sum_value
               |FROM graft_q145_src""".stripMargin)
          // IF NOT EXISTS on a live table: the query must NOT run —
          // shifted keys appearing in the read-back would hash-fail
          s.sql(
            s"""CREATE TABLE IF NOT EXISTS graft_q145_ctas
               |(PRIMARY KEY (user_id))
               |USING graft LOCATION '$dirA' AS
               |SELECT user_id + 1000000 AS user_id, n_events,
               |  sum_value
               |FROM graft_q145_src""".stripMargin)
          // the CREATE + INSERT twin
          s.sql(
            s"""CREATE TABLE graft_q145_ci (
               |  user_id BIGINT, n_events BIGINT,
               |  sum_value DECIMAL(18,4),
               |  PRIMARY KEY (user_id)
               |) USING graft LOCATION '$dirB'""".stripMargin)
          s.sql("INSERT INTO graft_q145_ci " +
            "SELECT user_id, n_events, sum_value FROM graft_q145_src")
          def shaped(name: String, tag: String) = {
            val op = s.sql(s"DESCRIBE HISTORY $name")
              .filter(col("version") === 1L)
              .select("operation").collect().head.getString(0)
            s.sql(s"SELECT user_id, n_events, sum_value FROM $name")
              .select(lit(tag).as("variant"), lit(op).as("v1_op"),
                col("user_id"), col("n_events"),
                col("sum_value")
                  .cast(org.apache.spark.sql.types.DoubleType)
                  .as("sum_value"))
          }
          shaped("graft_q145_ctas", "ctas")
            .unionByName(shaped("graft_q145_ci", "create-insert"))
            .orderBy("variant", "user_id")
        } finally {
          graft.operators.GraftSql.unregisterTable("graft_q145_ctas")
          graft.operators.GraftSql.unregisterTable("graft_q145_ci")
        }
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |a AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |      AS DECIMAL(18,4)) AS sum_value
             |  FROM e GROUP BY user_id)
             |SELECT t.variant, t.v1_op, a.user_id, a.n_events,
             |  CAST(a.sum_value AS DOUBLE) AS sum_value
             |FROM a CROSS JOIN (VALUES
             |    ('create-insert', 'insert'),
             |    ('ctas', 'create-as-select'))
             |  AS t(variant, v1_op)
             |ORDER BY variant, user_id""".stripMargin)),

    // Q139 SQL DELETE FROM (r18): the row-level delete verb as SQL,
    // riding the deletion-vector machinery — each statement is ONE
    // predicate-pushed snapshot scan plus an O(matched keys) tombstone
    // commit, zero base buckets rewritten (q114d's cost point; OPTIMIZE
    // materializes later). TWO statements compose (their vectors union
    // distinct), one keyed on the merge key, one on a payload column —
    // the oracle states the surviving rows' aggregates directly from
    // raw events. SqlSurfaceSpec pins the guard rails (truncate form,
    // foreign-qualifier and subquery named errors, empty-table no-op,
    // unregistered fall-through).
    QueryDef("q139_sql_delete",
      (s, d) => {
        val ev = Q.events(s, d)
        val state = stateDirFor(s, "delete139", d)
        val fs = new Path(state)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(state), true)
        commit(s, state, Map.empty, 1L, userAgg(ev), (_, dl) => dl)
        graft.operators.GraftSql.registerTable("graft_q139_state", state,
          "state")
        try {
          s.sql("DELETE FROM graft_q139_state " +
            s"WHERE user_id % 3 = 0 OR n_events > ${SyncStaleFloor}")
          s.sql("DELETE FROM graft_q139_state WHERE user_id % 5 = 1")
          s.sql(
            """SELECT user_id, n_events,
              |  CAST(sum_value AS DOUBLE) AS sum_value
              |FROM graft_q139_state ORDER BY user_id""".stripMargin)
        } finally graft.operators.GraftSql.unregisterTable(
          "graft_q139_state")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |a AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e GROUP BY user_id)
             |SELECT user_id, n_events, CAST(sum_value AS DOUBLE)
             |    AS sum_value
             |FROM a
             |WHERE NOT (user_id % 3 = 0 OR n_events > $SyncStaleFloor)
             |  AND NOT user_id % 5 = 1
             |ORDER BY user_id""".stripMargin)),

    // Q140 SQL UPDATE (r18): the row-level update verb as SQL — Delta's
    // copy-on-write shape (one predicate-pushed scan finds the matched
    // rows; ONLY the buckets holding them rewrite), COMPOSED with a live
    // deletion vector: a prior DELETE hides the user_id % 4 = 2 rows,
    // then the UPDATE doubles every remaining EVEN user's sum (its
    // predicate overlaps the deleted keys — they must neither match nor
    // resurrect, mergeCommitDv's law). The oracle applies the CASE
    // arithmetic to the surviving aggregates directly.
    QueryDef("q140_sql_update",
      (s, d) => {
        val ev = Q.events(s, d)
        val state = stateDirFor(s, "update140", d)
        val fs = new Path(state)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(state), true)
        commit(s, state, Map.empty, 1L, userAgg(ev), (_, dl) => dl)
        graft.operators.GraftSql.registerTable("graft_q140_state", state,
          "state")
        try {
          s.sql("DELETE FROM graft_q140_state WHERE user_id % 4 = 2")
          s.sql("UPDATE graft_q140_state SET n_events = n_events + 10, " +
            "sum_value = CAST(sum_value * 2 AS DECIMAL(18,4)) " +
            "WHERE user_id % 2 = 0")
          s.sql(
            """SELECT user_id, n_events,
              |  CAST(sum_value AS DOUBLE) AS sum_value
              |FROM graft_q140_state ORDER BY user_id""".stripMargin)
        } finally graft.operators.GraftSql.unregisterTable(
          "graft_q140_state")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |a AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e GROUP BY user_id)
             |SELECT user_id,
             |  CASE WHEN user_id % 2 = 0 THEN n_events + 10
             |       ELSE n_events END AS n_events,
             |  CAST(CASE WHEN user_id % 2 = 0
             |         THEN CAST(sum_value * 2 AS DECIMAL(18,4))
             |         ELSE sum_value END AS DOUBLE) AS sum_value
             |FROM a
             |WHERE NOT user_id % 4 = 2
             |ORDER BY user_id""".stripMargin)),

    // Q141 DSv2 CATALOG LIFECYCLE (r18): graft store tables as
    // Spark-native catalog objects — `spark.sql.catalog.<name> =
    // GraftCatalog` makes every standard statement work over THREE-PART
    // names with no registration calls at all: CREATE TABLE with
    // Spark 4's native PRIMARY KEY constraint grammar, two INSERT
    // commits through the DSv2 V1-write fallback, a DELETE (DV
    // tombstones) and an UPDATE (copy-on-write, DV-composed) through
    // the parse-time DML rewrite, and a read whose plan is IDENTICAL to
    // the DataFrame verbs (the read rule substitutes the analyzed
    // snapshot re-aliased to the relation's exprIds). The oracle
    // recomputes the four-verb pipeline directly from raw events.
    QueryDef("q141_catalog_sql_lifecycle",
      (s, d) => {
        val ev = Q.events(s, d)
        val wh = s"${Layout.stagePath(s, "catalog141", d)}/warehouse"
        val fs = new Path(wh)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(wh), true)
        // one catalog name per input dir: the catalog manager caches
        // the plugin WITH its options at first use, so the location
        // must never change under a cached name. The conf itself is
        // finally-unset below (r18 verdict hygiene note) — re-setting
        // the SAME values next invocation re-resolves the same cached
        // plugin, and a long-lived session no longer accumulates one
        // conf pair per input dir.
        val cat = "gq141_" + Integer.toHexString(d.hashCode & 0x7fffffff)
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.operators.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.location", wh)
        try {
          s.sql(
            s"""CREATE TABLE $cat.llm.users (
               |  user_id BIGINT, n_events BIGINT,
               |  sum_value DECIMAL(18,4),
               |  PRIMARY KEY (user_id)
               |)""".stripMargin)
          userAgg(ev.filter(pmod(col("user_id"), lit(2)) === 0))
            .createOrReplaceTempView("graft_q141_even")
          userAgg(ev.filter(pmod(col("user_id"), lit(2)) === 1))
            .createOrReplaceTempView("graft_q141_odd")
          s.sql(s"INSERT INTO $cat.llm.users " +
            "SELECT user_id, n_events, sum_value FROM graft_q141_even")
          s.sql(s"INSERT INTO $cat.llm.users " +
            "SELECT user_id, n_events, sum_value FROM graft_q141_odd")
          s.sql(s"DELETE FROM $cat.llm.users WHERE user_id % 5 = 3")
          s.sql(s"UPDATE $cat.llm.users " +
            "SET sum_value = CAST(sum_value * 2 AS DECIMAL(18,4)) " +
            "WHERE user_id % 2 = 0")
          // the SELECT analyzes HERE (the read rule substitutes the
          // snapshot plan at analysis), so unsetting the conf after
          // this point cannot affect the returned frame's execution
          s.sql(
            s"""SELECT user_id, n_events,
               |  CAST(sum_value AS DOUBLE) AS sum_value
               |FROM $cat.llm.users ORDER BY user_id""".stripMargin)
        } finally {
          s.conf.unset(s"spark.sql.catalog.$cat")
          s.conf.unset(s"spark.sql.catalog.$cat.location")
        }
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |a AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e GROUP BY user_id)
             |SELECT user_id, n_events,
             |  CAST(CASE WHEN user_id % 2 = 0
             |         THEN CAST(sum_value * 2 AS DECIMAL(18,4))
             |         ELSE sum_value END AS DOUBLE) AS sum_value
             |FROM a
             |WHERE NOT user_id % 5 = 3
             |ORDER BY user_id""".stripMargin)),

    // Q142 STORE-NATIVE CDC: table_changes TVF (r18): Delta's
    // `table_changes` computed retroactively from the store's OWN
    // version layout — no feed artifact (the q120/q130 CDF family is a
    // sink the WRITER maintains; this answers "what changed in (v1,v2]"
    // for any retained range, reading only the buckets each commit
    // touched). The rig drives all three change sources through one
    // store: v2 is the q127 MERGE (deletes + updates + inserts in one
    // commit), v3 is a DELETION-VECTOR delete (zero base buckets
    // written — visibility changes must still surface as deletes). The
    // oracle restates every change row from the merge algebra directly;
    // ChangesSpec pins the apply-law (v1 + changes == v2 snapshot),
    // cancellation (unchanged rows in rewritten buckets emit nothing)
    // and TVF == DataFrame.
    QueryDef("q142_table_changes",
      (s, d) => {
        val (target, source) = q127Inputs(s, d)
        val ev = Q.events(s, d)
        val state = stateDirFor(s, "cdc142", d)
        val fs = new Path(state)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(state), true)
        val m1 = commit(s, state, Map.empty, 1L, target, (_, dl) => dl)
        val m2 = commit(s, state, m1, 2L, source, q127Merge)
        val t3 = ev.filter(pmod(col("user_id"), lit(7)) === 1)
          .select("user_id").distinct()
        val m3 = IngestIndex.deleteWithDv(s, state, m2, "state", 3L, t3)
        IngestIndex.writeManifest(fs, state, 3L, m3, op = "delete-dv")
        graft.operators.GraftSql.registerTable("graft_q142_state", state,
          "state")
        try s.sql(
          """SELECT user_id, n_events,
            |  CAST(sum_value AS DOUBLE) AS sum_value,
            |  _change_type, _commit_version
            |FROM table_changes('graft_q142_state', 1, 3)
            |ORDER BY _commit_version, user_id, _change_type""".stripMargin)
        finally graft.operators.GraftSql.unregisterTable(
          "graft_q142_state")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |t AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE event_id % 2 = 0 GROUP BY user_id),
             |s AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE event_id % 2 = 1 GROUP BY user_id),
             |m AS (SELECT COALESCE(t.user_id, s.user_id) AS user_id,
             |    t.n_events AS tn, t.sum_value AS tv,
             |    s.n_events AS sn, s.sum_value AS sv
             |  FROM t FULL JOIN s ON t.user_id = s.user_id),
             |v2 AS (
             |  SELECT user_id, tn AS n_events, tv AS sum_value,
             |      'delete' AS _change_type, 2 AS _commit_version
             |  FROM m WHERE tn IS NOT NULL AND sn IS NOT NULL AND sn > tn
             |  UNION ALL
             |  SELECT user_id, tn, tv, 'update_preimage', 2
             |  FROM m WHERE tn IS NOT NULL AND sn IS NOT NULL
             |    AND NOT sn > tn
             |  UNION ALL
             |  SELECT user_id, tn + sn,
             |    CAST(tv + sv AS DECIMAL(18,4)), 'update_postimage', 2
             |  FROM m WHERE tn IS NOT NULL AND sn IS NOT NULL
             |    AND NOT sn > tn
             |  UNION ALL
             |  SELECT user_id, sn, sv, 'insert', 2
             |  FROM m WHERE tn IS NULL),
             |live2 AS (
             |  SELECT user_id, tn AS n_events, tv AS sum_value
             |  FROM m WHERE sn IS NULL
             |  UNION ALL
             |  SELECT user_id, tn + sn, CAST(tv + sv AS DECIMAL(18,4))
             |  FROM m WHERE tn IS NOT NULL AND sn IS NOT NULL
             |    AND NOT sn > tn
             |  UNION ALL
             |  SELECT user_id, sn, sv FROM m WHERE tn IS NULL),
             |v3 AS (
             |  SELECT user_id, n_events, sum_value,
             |      'delete' AS _change_type, 3 AS _commit_version
             |  FROM live2 WHERE user_id % 7 = 1)
             |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
             |  CAST(sum_value AS DOUBLE) AS sum_value, _change_type,
             |  CAST(_commit_version AS BIGINT) AS _commit_version
             |FROM (SELECT * FROM v2 UNION ALL SELECT * FROM v3)
             |ORDER BY _commit_version, user_id, _change_type"""
        .stripMargin)),

    // Q143 ALTER TABLE ADD COLUMNS (r18): the widening half of the
    // schema-evolution contract as DDL — a metadata-only append to the
    // declared schema (ZERO committed files rewrite). The rig proves
    // the whole composition: a 2-column INSERT commits, the ALTER adds
    // `sum_value`, an UPDATE then WRITES the new column for a subset
    // (only their buckets rewrite — widened; untouched buckets keep
    // their 2-column files and read NULL), and a post-ALTER INSERT
    // carries all three columns positionally. The oracle restates the
    // final three-way value rule directly.
    QueryDef("q143_alter_add_column",
      (s, d) => {
        val ev = Q.events(s, d)
        val dir = s"${Layout.stagePath(s, "alter143", d)}/users"
        val fs = new Path(dir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(dir), true)
        userAgg(ev.filter(pmod(col("user_id"), lit(2)) === 0))
          .select("user_id", "n_events")
          .createOrReplaceTempView("graft_q143_even")
        userAgg(ev.filter(pmod(col("user_id"), lit(2)) === 1))
          .createOrReplaceTempView("graft_q143_odd")
        try {
          s.sql(
            s"""CREATE TABLE graft_q143_users (
               |  user_id BIGINT, n_events BIGINT,
               |  PRIMARY KEY (user_id)
               |) USING graft LOCATION '$dir'""".stripMargin)
          s.sql("INSERT INTO graft_q143_users " +
            "SELECT user_id, n_events FROM graft_q143_even")
          s.sql("ALTER TABLE graft_q143_users " +
            "ADD COLUMNS (sum_value DECIMAL(18,4))")
          s.sql("UPDATE graft_q143_users " +
            "SET sum_value = CAST(n_events AS DECIMAL(18,4)) " +
            "WHERE user_id % 3 = 0")
          s.sql("INSERT INTO graft_q143_users " +
            "SELECT user_id, n_events, sum_value FROM graft_q143_odd")
          s.sql(
            """SELECT user_id, n_events,
              |  CAST(sum_value AS DOUBLE) AS sum_value
              |FROM graft_q143_users ORDER BY user_id""".stripMargin)
        } finally graft.operators.GraftSql.unregisterTable(
          "graft_q143_users")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |a AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e GROUP BY user_id)
             |SELECT user_id, n_events,
             |  CAST(CASE WHEN user_id % 2 = 0 AND user_id % 3 = 0
             |         THEN CAST(n_events AS DECIMAL(18,4))
             |       WHEN user_id % 2 = 1 THEN sum_value
             |       ELSE NULL END AS DOUBLE) AS sum_value
             |FROM a ORDER BY user_id""".stripMargin)),

    // Q147 ALTER COLUMN TYPE safe widening (r20): the OTHER half of the
    // schema-evolution contract — where ADD COLUMNS is metadata-only
    // (q143/q128), a retype is an explicit COPY-ON-WRITE rewrite: one
    // commit (`op = retype`) re-casts every live bucket, so the current
    // snapshot carries the new type in every file while old snapshots
    // keep theirs (time travel reads each version's own type — the spec
    // pins that; the oracle here pins the VALUES). The rig crosses the
    // two hard seams on purpose: a LIVE deletion vector at retype time
    // (materializes first, the OPTIMIZE shape) and post-widening rows
    // that EXCEED the old type's range — only a genuinely widened
    // column holds them, so a silently-skipped rewrite cannot pass.
    QueryDef("q147_alter_retype",
      (s, d) => {
        val ev = Q.events(s, d)
        val dir = s"${Layout.stagePath(s, "retype147", d)}/users"
        val fs = new Path(dir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(dir), true)
        userAgg(ev.filter(pmod(col("user_id"), lit(2)) === 0))
          .select(col("user_id"),
            col("n_events").cast("int").as("n_events"))
          .createOrReplaceTempView("graft_q147_even")
        userAgg(ev.filter(pmod(col("user_id"), lit(2)) === 1))
          .select("user_id", "n_events")
          .createOrReplaceTempView("graft_q147_odd")
        try {
          s.sql(
            s"""CREATE TABLE graft_q147_users (
               |  user_id BIGINT, n_events INT,
               |  PRIMARY KEY (user_id)
               |) USING graft LOCATION '$dir'""".stripMargin)
          s.sql("INSERT INTO graft_q147_users " +
            "SELECT user_id, n_events FROM graft_q147_even")
          // a LIVE deletion vector crosses the retype: it materializes
          // into the rewrite (v3 = materialize, v4 = retype)
          s.sql("DELETE FROM graft_q147_users WHERE user_id % 5 = 0")
          s.sql("ALTER TABLE graft_q147_users " +
            "ALTER COLUMN n_events TYPE BIGINT")
          s.sql("INSERT INTO graft_q147_users " +
            "SELECT user_id, n_events + 4000000000 FROM graft_q147_odd")
          s.sql("SELECT user_id, n_events FROM graft_q147_users " +
            "ORDER BY user_id")
        } finally graft.operators.GraftSql.unregisterTable(
          "graft_q147_users")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |a AS (SELECT user_id, COUNT(*) AS n_events
             |  FROM e GROUP BY user_id)
             |SELECT user_id,
             |  CASE WHEN user_id % 2 = 0 THEN n_events
             |       ELSE n_events + 4000000000 END AS n_events
             |FROM a
             |WHERE NOT (user_id % 2 = 0 AND user_id % 5 = 0)
             |ORDER BY user_id""".stripMargin)),

    // Q148 MULTI-STATEMENT TRANSACTION (r20): `BEGIN; <dml>; ...;
    // COMMIT` batches several row-level DML statements into ONE store
    // commit — one version, one footprint, read-your-writes between the
    // statements (GraftTransactionCommand's contract). The rig seeds
    // even users as v1, then runs INSERT(odd) + UPDATE(%3 +1000) +
    // DELETE(%7) + INSERT(two synthetic rows) in one transaction — the
    // store lands at exactly v2 (the spec pins the version count; this
    // oracle pins the VALUES: hash-equal to DuckDB replaying the four
    // statements sequentially — batched == sequential, the transaction
    // is semantically unobservable).
    QueryDef("q148_sql_transaction",
      (s, d) => {
        val ev = Q.events(s, d)
        val dir = s"${Layout.stagePath(s, "txn148", d)}/users"
        val fs = new Path(dir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(dir), true)
        userAgg(ev.filter(pmod(col("user_id"), lit(2)) === 0))
          .select("user_id", "n_events")
          .createOrReplaceTempView("graft_q148_even")
        userAgg(ev.filter(pmod(col("user_id"), lit(2)) === 1))
          .select("user_id", "n_events")
          .createOrReplaceTempView("graft_q148_odd")
        try {
          s.sql(
            s"""CREATE TABLE graft_q148_users (
               |  user_id BIGINT, n_events BIGINT,
               |  PRIMARY KEY (user_id)
               |) USING graft LOCATION '$dir'""".stripMargin)
          s.sql("INSERT INTO graft_q148_users " +
            "SELECT user_id, n_events FROM graft_q148_even")
          s.sql(
            """BEGIN;
              |INSERT INTO graft_q148_users
              |  SELECT user_id, n_events FROM graft_q148_odd;
              |UPDATE graft_q148_users SET n_events = n_events + 1000
              |  WHERE user_id % 3 = 0;
              |DELETE FROM graft_q148_users WHERE user_id % 7 = 0;
              |INSERT INTO graft_q148_users VALUES
              |  (900000001, 1), (900000002, 2);
              |COMMIT""".stripMargin)
          s.sql("SELECT user_id, n_events FROM graft_q148_users " +
            "ORDER BY user_id")
        } finally graft.operators.GraftSql.unregisterTable(
          "graft_q148_users")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |a AS (SELECT user_id, COUNT(*) AS n_events
             |  FROM e GROUP BY user_id),
             |s1 AS (SELECT user_id,
             |    CASE WHEN user_id % 3 = 0 THEN n_events + 1000
             |         ELSE n_events END AS n_events
             |  FROM a WHERE user_id % 7 <> 0)
             |SELECT user_id, CAST(n_events AS BIGINT) AS n_events
             |FROM (SELECT * FROM s1
             |      UNION ALL SELECT 900000001, 1
             |      UNION ALL SELECT 900000002, 2)
             |ORDER BY user_id""".stripMargin)),

    // Q149 DROP COLUMN + RENAME COLUMN (r20): the remaining two
    // schema-evolution verbs, each a COPY-ON-WRITE rewrite commit
    // (GraftSql.dropColumn/renameColumn via copyOnWriteRewrite — no
    // column mapping, so the honest drop physically removes the bytes
    // and a rename physically renames them in every live bucket; old
    // snapshots keep their own shape). The rig crosses the hard seams
    // on purpose: a LIVE deletion vector at rewrite time (materializes
    // first), a RENAME then a DROP stacked on one table, and a
    // post-rewrite INSERT whose positional alignment must follow the
    // NEW declared shape — a skipped rewrite or a stale meta cannot
    // hash. The spec pins time travel (old versions read the old
    // shape), provenance tags, the key/collision guards and the CDF
    // seam; this oracle pins the VALUES.
    QueryDef("q149_alter_drop_rename",
      (s, d) => {
        val ev = Q.events(s, d)
        val dir = s"${Layout.stagePath(s, "colalter149", d)}/users"
        val fs = new Path(dir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(dir), true)
        userAgg(ev.filter(pmod(col("user_id"), lit(2)) === 0))
          .select("user_id", "n_events")
          .createOrReplaceTempView("graft_q149_even")
        userAgg(ev.filter(pmod(col("user_id"), lit(2)) === 1))
          .select("user_id", "n_events")
          .createOrReplaceTempView("graft_q149_odd")
        try {
          s.sql(
            s"""CREATE TABLE graft_q149_users (
               |  user_id BIGINT, n_events BIGINT,
               |  tag STRING, note DOUBLE,
               |  PRIMARY KEY (user_id)
               |) USING graft LOCATION '$dir'""".stripMargin)
          s.sql("INSERT INTO graft_q149_users " +
            "SELECT user_id, n_events, " +
            "concat('u', CAST(user_id % 10 AS STRING)) AS tag, " +
            "n_events * 0.5 AS note FROM graft_q149_even")
          // a LIVE deletion vector crosses BOTH rewrites: it
          // materializes before the first (v3 = materialize,
          // v4 = rename-column, v5 = drop-column)
          s.sql("DELETE FROM graft_q149_users WHERE user_id % 5 = 0")
          s.sql("ALTER TABLE graft_q149_users RENAME COLUMN tag TO label")
          s.sql("ALTER TABLE graft_q149_users DROP COLUMN note")
          // the post-rewrite INSERT aligns positionally against the
          // NEW declared shape (user_id, n_events, label)
          s.sql("INSERT INTO graft_q149_users " +
            "SELECT user_id, n_events, " +
            "concat('v', CAST(user_id % 10 AS STRING)) AS label " +
            "FROM graft_q149_odd")
          s.sql("SELECT user_id, n_events, label " +
            "FROM graft_q149_users ORDER BY user_id")
        } finally graft.operators.GraftSql.unregisterTable(
          "graft_q149_users")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |a AS (SELECT user_id, COUNT(*) AS n_events
             |  FROM e GROUP BY user_id)
             |SELECT user_id, n_events,
             |  CASE WHEN user_id % 2 = 0
             |       THEN 'u' || CAST(user_id % 10 AS VARCHAR)
             |       ELSE 'v' || CAST(user_id % 10 AS VARCHAR)
             |  END AS label
             |FROM a
             |WHERE NOT (user_id % 2 = 0 AND user_id % 5 = 0)
             |ORDER BY user_id""".stripMargin)),

    // Q131 ORDERED MULTI-CLAUSE MERGE (r16): the full SQL:2023 clause
    // algebra — N conditional clauses per family, first match wins —
    // through the bucketed store. The oracle replays the ordered CASE
    // chain in DuckDB; hash equality proves clause ORDER (overwrite
    // beats delete beats accumulate), both insert arms, and the
    // arithmetic of every surviving row at once.
    QueryDef("q131_merge_ordered_clauses",
      (s, d) => {
        val (target, source) = q131Inputs(s, d)
        val state = stateDirFor(s, "merge131", d)
        val m1 = commit(s, state, Map.empty, 1L, target, (_, dl) => dl)
        commit(s, state, m1, 2L, source, q131Merge)
        IngestIndex.currentTable(s, state, "state")
          .select(col("user_id"), col("n_events"),
            col("sum_value").cast(DoubleType).as("sum_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |t AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE event_id % 2 = 0 AND user_id % 7 <> 0
             |  GROUP BY user_id),
             |s AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE event_id % 2 = 1 AND user_id % 5 <> 0
             |  GROUP BY user_id),
             |m AS (SELECT COALESCE(t.user_id, s.user_id) AS user_id,
             |    t.n_events AS tn, t.sum_value AS tv,
             |    s.n_events AS sn, s.sum_value AS sv
             |  FROM t FULL JOIN s ON t.user_id = s.user_id)
             |SELECT user_id,
             |  CASE WHEN tn IS NOT NULL AND sn IS NOT NULL THEN
             |         CASE WHEN sv > tv THEN sn ELSE tn + sn END
             |       WHEN tn IS NOT NULL THEN tn
             |       ELSE sn END AS n_events,
             |  CAST(CASE WHEN tn IS NOT NULL AND sn IS NOT NULL THEN
             |         CASE WHEN sv > tv THEN sv
             |              ELSE CAST(tv + sv AS DECIMAL(18,4)) END
             |       WHEN tn IS NOT NULL THEN tv
             |       WHEN user_id % 2 = 0 THEN sv
             |       ELSE CAST(0 AS DECIMAL(18,4)) END
             |    AS DOUBLE) AS sum_value
             |FROM m
             |WHERE NOT (tn IS NOT NULL AND sn IS NOT NULL
             |           AND NOT sv > tv AND sn < tn - 4)
             |ORDER BY user_id""".stripMargin)),

    // Q129b DV × POINT-GET COMPOSITION (r16): the r15 verdict's one
    // store finding — deletion vectors must compose with EVERY read
    // verb, not just readWithDv. A DV delete commits, then the O(keys)
    // point lookup probes the 8 smallest users: tombstoned probes
    // return NOTHING (the GET applies the vector, bucket-pruned to the
    // probe's own covering DV buckets), survivors return their exact
    // rows. The oracle recomputes the surviving probe rows directly;
    // CdfSpec pins the law pointGet == filter(readWithDv) and the
    // time-travel side (the pre-delete snapshot still shows the rows).
    QueryDef("q129b_dv_point_get",
      (s, d) => {
        val sp = s
        import sp.implicits._
        val ev = Q.events(s, d)
        val state = stateDirFor(s, "dv129b", d)
        val fs = new Path(state)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val m1 = commit(s, state, Map.empty, 1L, userAgg(ev), (_, dl) => dl)
        val t1 = ev.filter(pmod(col("user_id"), lit(5)) === 2)
          .select("user_id").distinct()
        val m2 = IngestIndex.deleteWithDv(s, state, m1, "state", 2L, t1)
        IngestIndex.writeManifest(fs, state, 2L, m2)
        val keys = ev.select("user_id").distinct()
          .orderBy("user_id").limit(8)
          .collect().map(_.getLong(0)).toSeq
        IngestIndex.pointGet(s, state, "state", keys.toDF("user_id"))
          .select(col("user_id"), col("n_events"),
            col("sum_value").cast(DoubleType).as("sum_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |k AS (SELECT DISTINCT user_id FROM e
             |  ORDER BY user_id LIMIT 8)
             |SELECT user_id, COUNT(*) AS n_events,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM e
             |WHERE user_id IN (SELECT user_id FROM k)
             |  AND user_id % 5 <> 2
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q134 RESTORE (r16): Delta's `RESTORE TABLE ... VERSION AS OF` on
    // the bucketed store — the store reaches q127's post-merge state at
    // v2, a DAMAGING commit at v3 drops every even user (the bad-job
    // scenario RESTORE exists for), and the restore commits v4 whose
    // manifest IS v2's: zero data copied (a one-file metadata write at
    // any store size — the bucketed layout makes table-wide rollback
    // O(manifest)), history preserved (the damaged v3 stays readable
    // inside retention; MergeIntoSpec pins it). The oracle is q127's
    // SQL verbatim: the read-back after the rollback must be exactly
    // the pre-damage state, with the restore path unobservable.
    QueryDef("q134_restore_version",
      (s, d) => {
        val (target, source) = q127Inputs(s, d)
        val state = stateDirFor(s, "restore134", d)
        val fs = new Path(state)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val m1 = commit(s, state, Map.empty, 1L, target, (_, dl) => dl)
        val m2 = commit(s, state, m1, 2L, source, q127Merge)
        // the damaging commit: a "bad job" drops every even user — a
        // full-target rewrite (touched = all live buckets)
        val live = m2("state").keySet
        commit(s, state, m2, 3L, target.limit(1),
          (cur, _) => cur.filter(pmod(col("user_id"), lit(2)) === 1),
          touched = Some(live))
        IngestIndex.restore(fs, state, 2L, 4L)
        IngestIndex.currentTable(s, state, "state")
          .select(col("user_id"), col("n_events"),
            col("sum_value").cast(DoubleType).as("sum_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |t AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE event_id % 2 = 0 GROUP BY user_id),
             |s AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE event_id % 2 = 1 GROUP BY user_id),
             |m AS (SELECT COALESCE(t.user_id, s.user_id) AS user_id,
             |    t.n_events AS tn, t.sum_value AS tv,
             |    s.n_events AS sn, s.sum_value AS sv
             |  FROM t FULL JOIN s ON t.user_id = s.user_id)
             |SELECT user_id,
             |  CASE WHEN tn IS NOT NULL AND sn IS NOT NULL THEN tn + sn
             |       WHEN tn IS NOT NULL THEN tn ELSE sn END AS n_events,
             |  CAST(CASE WHEN tn IS NOT NULL AND sn IS NOT NULL
             |       THEN CAST(tv + sv AS DECIMAL(18,4))
             |       WHEN tn IS NOT NULL THEN tv ELSE sv END
             |    AS DOUBLE) AS sum_value
             |FROM m
             |WHERE NOT (tn IS NOT NULL AND sn IS NOT NULL AND sn > tn)
             |ORDER BY user_id""".stripMargin)),

    // Q127 MERGE INTO (r14): the declarative multi-clause merge —
    // `MERGE INTO state USING source ON user_id WHEN MATCHED AND
    // s.n_events > t.n_events THEN DELETE WHEN MATCHED THEN UPDATE SET
    // n_events = t+s, sum_value = t+s WHEN NOT MATCHED THEN INSERT` —
    // executed through the bucketed persistent store: commit 1 stages
    // the target (even event_ids' per-user aggregate), commit 2 applies
    // the MERGE batch (odd event_ids') touching only its key buckets.
    // The oracle replays the clause algebra as a full-outer join + CASE
    // in DuckDB; hash equality proves clause precedence, the delete
    // gate, the update arithmetic and the insert path all at once.
    QueryDef("q127_merge_into",
      (s, d) => {
        val (target, source) = q127Inputs(s, d)
        val state = stateDirFor(s, "merge127", d)
        val m1 = commit(s, state, Map.empty, 1L, target, (_, dl) => dl)
        commit(s, state, m1, 2L, source, q127Merge)
        IngestIndex.currentTable(s, state, "state")
          .select(col("user_id"), col("n_events"),
            col("sum_value").cast(DoubleType).as("sum_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |t AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE event_id % 2 = 0 GROUP BY user_id),
             |s AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE event_id % 2 = 1 GROUP BY user_id),
             |m AS (SELECT COALESCE(t.user_id, s.user_id) AS user_id,
             |    t.n_events AS tn, t.sum_value AS tv,
             |    s.n_events AS sn, s.sum_value AS sv
             |  FROM t FULL JOIN s ON t.user_id = s.user_id)
             |SELECT user_id,
             |  CASE WHEN tn IS NOT NULL AND sn IS NOT NULL THEN tn + sn
             |       WHEN tn IS NOT NULL THEN tn ELSE sn END AS n_events,
             |  CAST(CASE WHEN tn IS NOT NULL AND sn IS NOT NULL
             |       THEN CAST(tv + sv AS DECIMAL(18,4))
             |       WHEN tn IS NOT NULL THEN tv ELSE sv END
             |    AS DOUBLE) AS sum_value
             |FROM m
             |WHERE NOT (tn IS NOT NULL AND sn IS NOT NULL AND sn > tn)
             |ORDER BY user_id""".stripMargin)),

    // Q127b FULL-SYNC MERGE (r15): completes the MERGE contract with
    // SQL:2023's third clause family — `WHEN NOT MATCHED BY SOURCE` —
    // on rows where it genuinely fires: the target (every user's full
    // aggregate) syncs against a snapshot carrying only a strict subset
    // of its keys; matched rows are OVERWRITTEN with snapshot values,
    // absent rows DELETE below the stale floor and tombstone-zero above
    // it. Runs through the store via commitFullSync (the clause family
    // requires the full target scan — Delta's documented cost for it).
    // The oracle replays all four clause arms as full-outer + CASE.
    QueryDef("q127b_merge_full_sync",
      (s, d) => {
        val (target, source) = q127bInputs(s, d)
        val state = stateDirFor(s, "merge127b", d)
        val m1 = commit(s, state, Map.empty, 1L, target, (_, dl) => dl)
        commitFullSync(s, state, m1, 2L, source, q127bMerge)
        IngestIndex.currentTable(s, state, "state")
          .select(col("user_id"), col("n_events"),
            col("sum_value").cast(DoubleType).as("sum_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL}),
             |t AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e GROUP BY user_id),
             |s AS (SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |      AS sum_value
             |  FROM e WHERE user_id % 3 <> 0 AND event_id % 2 = 0
             |  GROUP BY user_id),
             |m AS (SELECT COALESCE(t.user_id, s.user_id) AS user_id,
             |    t.n_events AS tn, t.sum_value AS tv,
             |    s.n_events AS sn, s.sum_value AS sv
             |  FROM t FULL JOIN s ON t.user_id = s.user_id)
             |SELECT user_id,
             |  CASE WHEN tn IS NOT NULL AND sn IS NOT NULL THEN sn
             |       WHEN tn IS NOT NULL THEN tn ELSE sn END AS n_events,
             |  CAST(CASE WHEN tn IS NOT NULL AND sn IS NOT NULL THEN sv
             |       WHEN tn IS NOT NULL THEN CAST(0 AS DECIMAL(18,4))
             |       ELSE sv END AS DOUBLE) AS sum_value
             |FROM m
             |WHERE NOT (tn IS NOT NULL AND sn IS NULL
             |           AND tn < $SyncStaleFloor)
             |ORDER BY user_id""".stripMargin)),

    // Q82b SCD2 THROUGH MERGE INTO (r15): q82's slowly-changing-dimension
    // semantics re-expressed as ONE MergeInto commit against the bucketed
    // store — the operator generalizes beyond q127's add/delete algebra.
    // SCD2 needs TWO output rows per changed key (close the old version,
    // open the new), which a one-row-per-key MERGE emits via the classic
    // union-trick source (the Databricks SCD2 MERGE recipe): each change
    // contributes a CLOSE row whose merge key mk equals the stored row's
    // (matched -> UPDATE SET is_current = false) and an OPEN row under a
    // fresh non-colliding mk (not matched -> INSERT version 2); brand-new
    // business keys ride as plain INSERT rows. mk ranges are disjoint by
    // construction: target mk = key <= mx, insert mk = key + (mx+1),
    // open mk = key + 2(mx+1) — the +1 matters because keys start at 0
    // (key 0's insert under a bare +mx offset collided with the REAL key
    // mx and closed it; caught by the oracle hash en route). The oracle
    // is q82's SQL shape verbatim — hash equality proves the MERGE
    // formulation computes exactly the declarative union form.
    QueryDef("q82b_scd2_merge_into",
      (s, d) => {
        val base = Q.t(s, d, "customer")
          .select(col("c_custkey").as("key"),
            col("c_mktsegment").as("mktsegment"))
        val mx = base.agg(max(col("key"))).head().getLong(0)
        val v = (n: Int) => lit(n).cast(
          org.apache.spark.sql.types.IntegerType).as("version")
        val cur = (b: Boolean) => lit(b).as("is_current")
        val target = base.select(col("key").as("mk"), col("key"),
          col("mktsegment"), v(1), cur(true))
        val changes = base.filter(col("key") % 7 === 0)
        val closeRows = changes.select(col("key").as("mk"), col("key"),
          col("mktsegment"), v(1), cur(false))
        val openRows = changes.select(
          (col("key") + 2 * (mx + 1)).as("mk"),
          col("key"), lit("PROMO").as("mktsegment"), v(2), cur(true))
        val insertRows = base.filter(col("key") % 11 === 0)
          .select((col("key") + (mx + 1)).as("mk"),
            (col("key") + mx + 1).as("key"),
            lit("NEWSEG").as("mktsegment"), v(1), cur(true))
        val source = closeRows.unionByName(openRows)
          .unionByName(insertRows)
        val merge = MergeInto.simple(
          key = "mk",
          payload = Seq("key", "mktsegment", "version", "is_current"),
          updateSet = Map("is_current" -> lit(false)))
        val state = stateDirFor(s, "scd2b", d)
        val fs = new Path(state)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val m1: IngestIndex.Manifest = Map("dim" ->
          IngestIndex.mergeCommit(s, state, Map.empty, "dim", 1L, target,
            (_, dl) => dl))
        IngestIndex.writeManifest(fs, state, 1L, m1)
        val m2: IngestIndex.Manifest = Map("dim" ->
          IngestIndex.mergeCommit(s, state, m1, "dim", 2L, source,
            merge))
        IngestIndex.writeManifest(fs, state, 2L, m2)
        IngestIndex.currentTable(s, state, "dim")
          .select(col("key"), col("mktsegment"), col("version"),
            col("is_current"))
          .orderBy("key", "version", "is_current")
      },
      Some("""WITH base AS (SELECT c_custkey AS key, c_mktsegment AS mktsegment
             |    FROM customer),
             |changes AS (SELECT key, 'PROMO' AS new_seg FROM base
             |    WHERE key % 7 = 0)
             |SELECT key, mktsegment, CAST(1 AS INT) AS version,
             |    TRUE AS is_current
             |  FROM base WHERE key NOT IN (SELECT key FROM changes)
             |UNION ALL
             |SELECT b.key, b.mktsegment, CAST(1 AS INT), FALSE
             |  FROM base b JOIN changes c ON b.key = c.key
             |UNION ALL
             |SELECT b.key, c.new_seg, CAST(2 AS INT), TRUE
             |  FROM base b JOIN changes c ON b.key = c.key
             |UNION ALL
             |SELECT key + (SELECT MAX(key) FROM base) + 1, 'NEWSEG',
             |    CAST(1 AS INT), TRUE
             |  FROM base WHERE key % 11 = 0
             |ORDER BY key, version, is_current""".stripMargin)),

    // Q129 DELETION VECTORS (r15): the Delta/Iceberg soft-delete surface
    // completing the store's delete cost spectrum — q114c rewrites every
    // touched bucket eagerly; a DV delete commits ONLY the tombstone keys
    // (write IO O(tombstones), base table untouched) and readers apply
    // the vector as a broadcast anti-join. Two successive DV deletes on
    // disjoint predicates pin accumulation; the spec additionally pins
    // the IO claim (DV commits write no base-table bucket) and the
    // materialize step (apply + clear == the dv-read, then plain reads).
    // The oracle recomputes the visible rows directly with the two
    // predicates excluded.
    QueryDef("q129_deletion_vectors",
      (s, d) => {
        val ev = Q.events(s, d)
        val state = stateDirFor(s, "dv129", d)
        val fs = new Path(state)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val m1 = commit(s, state, Map.empty, 1L, userAgg(ev), (_, dl) => dl)
        val t1 = ev.filter(pmod(col("user_id"), lit(5)) === 2)
          .select("user_id").distinct()
        val m2 = IngestIndex.deleteWithDv(s, state, m1, "state", 2L, t1)
        IngestIndex.writeManifest(fs, state, 2L, m2)
        val t2 = ev.filter(pmod(col("user_id"), lit(7)) === 3)
          .select("user_id").distinct()
        val m3 = IngestIndex.deleteWithDv(s, state, m2, "state", 3L, t2)
        IngestIndex.writeManifest(fs, state, 3L, m3)
        IngestIndex.readWithDv(s, state, m3, "state", Seq("user_id"))
          .select(col("user_id"), col("n_events"),
            col("sum_value").cast(DoubleType).as("sum_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL})
             |SELECT user_id, COUNT(*) AS n_events,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM e
             |WHERE NOT (user_id % 5 = 2 OR user_id % 7 = 3)
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q128 SCHEMA EVOLUTION (r14): the store gains a payload column
    // MID-STREAM — a 4-batch fold (event_id mod 4) where batches 2-3
    // add `max_value` to the per-user state. Only the evolved batches'
    // touched buckets are rewritten under the new schema; every other
    // bucket reads back with NULL, which is semantically exact (those
    // keys have no post-evolution observation), and pre-evolution
    // snapshots stay readable WITHOUT the column (MergeIntoSpec pins
    // that). The oracle recomputes the final state directly: totals
    // over all events, max_value over batches 2-3 only — merge
    // associativity makes fold == recompute.
    QueryDef("q128_schema_evolution",
      (s, d) => {
        val state = runEvolvingFold(s, d)
        IngestIndex.currentTable(s, state, "state")
          .select(col("user_id"), col("n_events"),
            col("sum_value").cast(DoubleType).as("sum_value"),
            col("max_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${Q.EVENTS_SQL})
             |SELECT user_id, COUNT(*) AS n_events,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_value,
             |  MAX(CASE WHEN event_id % 4 >= 2 THEN value END) AS max_value
             |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin)))
}
