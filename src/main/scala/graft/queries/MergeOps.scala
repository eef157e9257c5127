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
    IngestIndex.writeManifest(fs, state, next, nm)
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
    key = "user_id",
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
