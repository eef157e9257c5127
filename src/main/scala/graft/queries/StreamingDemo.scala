package graft.queries

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Q33 (SURVEY §2B): Structured Streaming capability demo — file-replay of
  * the events table through a watermarked tumbling-window aggregation,
  * validated in-flight against batch Spark (the no-streaming-in-DuckDB
  * query; rows-only driver check; the hard assertions live in
  * EventStreamSpec). Emits the closed windows joined with their batch twins
  * plus a match flag.
  */
object StreamingDemo {

  /** Staging (a full re-write of events.parquet as N replay files) is test
    * rig, not engine work — the r3 bench billed it (plus its teardown) to
    * q33 on every run, ~1/3 of the reported 12 s. Memoized per sfDir: only
    * the first q33 invocation in a JVM stages; Bench's min-of-N then times
    * the stream itself. The temp dir lives for the JVM (deleting it
    * in-query is what timed the teardown); the OS reclaims it with the
    * process.
    */
  private val stagedReplay =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def replayDirFor(s: org.apache.spark.sql.SparkSession, sfDir: String): String =
    stagedReplay.computeIfAbsent(sfDir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-q33")
      Layout.trackTemp(base.toString)
      val replay = s"$base/replay"
      graft.streaming.EventStream.stageReplay(s, sfDir, replay, nFiles = 4)
      replay
    })

  /** (replayDir, horizonMinutes): the horizon is sized to the staged
    * corpus span (DocStream.horizonMinutesFor) — a fixed 120-minute horizon
    * starts expiring buckets mid-replay past ~7200 staged docs, silently
    * flipping q53's matches_batch flags. Memoized with the dir so the count
    * job runs once per sfDir. */
  private val stagedDocReplay =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Int)]()

  private def docReplayDirFor(s: org.apache.spark.sql.SparkSession,
      sfDir: String): (String, Int) =
    stagedDocReplay.computeIfAbsent(sfDir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-q53")
      Layout.trackTemp(base.toString)
      val replay = s"$base/replay"
      graft.streaming.DocStream.stageDocReplay(s, sfDir, replay, nFiles = 4)
      val nDocs = s.read.parquet(s"$sfDir/documents.parquet").count()
      (replay, graft.streaming.DocStream.horizonMinutesFor(nDocs))
    })

  /** q104's replay staging, memoized like the others (4 mod-4 batch files,
    * IngestStream.stageReplay). */
  private val stagedIngestReplay =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ingestReplayDirFor(s: org.apache.spark.sql.SparkSession,
      sfDir: String): String =
    stagedIngestReplay.computeIfAbsent(sfDir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-q104")
      Layout.trackTemp(base.toString)
      val replay = s"$base/replay"
      graft.streaming.IngestStream.stageReplay(s, sfDir, replay,
        nBatches = graft.streaming.IngestStream.ReplayBatches)
      replay
    })

  /** The mod-4 events replay staging for the CDF family (staging is rig
    * work, memoized like the other replay dirs). */
  private val stagedCdfReplay =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cdfReplayFor(s: org.apache.spark.sql.SparkSession,
      sfDir: String): String =
    stagedCdfReplay.computeIfAbsent(sfDir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-q120")
      Layout.trackTemp(base.toString)
      val replay = s"$base/replay"
      graft.streaming.CdfStream.stageModReplay(s, sfDir, replay, nBatches = 4)
      replay
    })

  /** q121/q123's PRODUCER rig: one completed upsert-with-change-feed run
    * per sfDir — (stateDir, cdfDir, top version). Those two queries'
    * operators are READS of committed artifacts (AS-OF snapshots, the
    * feed fold), so the producing stream is rig work for them and runs
    * once; q120 — whose operator IS the emitting stream — pays a fresh
    * run every invocation instead (the q86/q104 billing convention).
    * retain=8 keeps every manifest of the 4-batch replay readable for
    * q121's AS-OF reads (production sets retention to the time-travel
    * SLA). */
  private val cdfRig = new java.util.concurrent.ConcurrentHashMap[
    String, (String, String, Long)]()

  private def cdfRigFor(s: org.apache.spark.sql.SparkSession,
      sfDir: String): (String, String, Long) =
    cdfRig.computeIfAbsent(sfDir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-q120rig")
      Layout.trackTemp(base.toString)
      val state = s"$base/state"
      val cdf = s"$base/cdf"
      val top = graft.streaming.CdfStream.runUpsertCdf(
        streamSession(s), cdfReplayFor(s, sfDir), state, cdf, retain = 8)
      (state, cdf, top)
    })

  /** q130b's PRODUCER rig: one completed upsert-with-DELETES run per
    * sfDir (the q120 rig's shape with deleteMod = 29) — q130b's operator
    * is a READ of the feed, so the producing stream is rig work for it;
    * q130 — whose operator IS the deleting stream — pays a fresh run
    * every invocation (the q120 convention). */
  private val cdfDelRig = new java.util.concurrent.ConcurrentHashMap[
    String, (String, String, Long)]()

  private[graft] val CdcDeleteMod = 29

  private def cdfDelRigFor(s: org.apache.spark.sql.SparkSession,
      sfDir: String): (String, String, Long) =
    cdfDelRig.computeIfAbsent(sfDir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-q130rig")
      Layout.trackTemp(base.toString)
      val state = s"$base/state"
      val cdf = s"$base/cdf"
      val top = graft.streaming.CdfStream.runUpsertCdf(
        streamSession(s), cdfReplayFor(s, sfDir), state, cdf, retain = 8,
        deleteMod = Some(CdcDeleteMod))
      (state, cdf, top)
    })

  /** Eagerly stages the replay rigs (idempotent). Bench calls this from its
    * warmup so even a single-run harness times only the streams — lazy
    * staging inside the first q33/q50/q53 invocation billed ~10 s of rig to
    * whichever ran first. */
  def ensureStaged(s: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    replayDirFor(s, sfDir)
    docReplayDirFor(s, sfDir)
    ingestReplayDirFor(s, sfDir)
    cdfReplayFor(s, sfDir)
    cdfRigFor(s, sfDir) // q121/q123's producer run (rig work for READ ops)
    cdfDelRigFor(s, sfDir) // q130b's producer run (rig work for the READ)
    ()
  }

  /** Session clone sized for streaming state, not batch shuffle.
    *
    * Stateful streaming cost has a term batch queries don't: every state
    * partition commits a state-store delta EVERY micro-batch, whatever its
    * size, so trigger latency grows with the partition count itself
    * (measured here: the five replay queries spent ~2 s/trigger in state
    * commits at 32 partitions — 65 s of summed commit time per q98 batch —
    * and drop 3-4x at 8). Batch shuffle width is sized to total data
    * volume; state width must be sized to PER-TRIGGER state volume and key
    * cardinality. The knob (`spark.graft.streaming.statePartitions`,
    * default 8) is deliberately independent of `spark.sql.shuffle.partitions`:
    * at production rates (10^8 live keys, seconds-wide triggers) it goes UP,
    * for a replay rig or low-rate topic it stays small. Implemented as a
    * `newSession()` clone so the setting cannot leak into whatever batch
    * queries share this JVM (Verify runs four concurrently); the whole
    * QueryDef — stream, batch twin, match join — builds on the clone, so no
    * plan ever mixes sessions. State-partition count is pinned at first
    * checkpoint by Spark, which is exactly why it must be chosen per-query
    * rather than inherited ambiently.
    */
  private def streamSession(
      s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession = {
    val parts = s.conf.get("spark.graft.streaming.statePartitions", "8")
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", parts)
    s2
  }

  /** The closed-window oracle predicate shared by q33/q81: append mode
    * emits a window when the FINAL watermark passes its end. Spark's
    * eviction predicate is `window.end <= watermark` (LessThanOrEqual in
    * WatermarkSupport) with the watermark tracked in MILLISECONDS
    * (event-time stats floor micros -> ms) and compared in micros
    * (wm_ms * 1000) — mirrored here digit for digit so an hour-aligned
    * max timestamp cannot flip the boundary between engines. */
  private val ClosedWindowWm =
    "((epoch_us(MAX(ts)) // 1000) - 7200000) * 1000"

  val defs: Seq[QueryDef] = Seq(
    // PROMOTED to a full hash oracle (r14): the completed stream's
    // emitted set is DETERMINISTIC — every window whose end the final
    // watermark (global max event time - 2h) passed, with exact counts —
    // so DuckDB recomputes it directly; only the float sum stays inside
    // the in-flight tolerance flag (pinned TRUE).
    QueryDef("q33_streaming_tumbling",
      (s, d) => {
        val s2 = streamSession(s)
        val replay = replayDirFor(s, d)
        val sinkTable = s"q33_sink_${System.nanoTime()}"
        val streamed =
          graft.streaming.EventStream.runToCompletion(s2, replay, sinkTable)
        val batch = graft.streaming.EventStream.batchHourlyCounts(s2, d)
        // LEFT join from the streamed side + cnt AND sum comparison: a
        // missing batch twin or a value mismatch shows as matches_batch =
        // false instead of silently vanishing from an inner join
        streamed.as("s").join(batch.as("b"),
            col("s.hour_start") === col("b.hour_start")
              && col("s.event_type") === col("b.event_type"), "left")
          .select(unix_micros(col("s.hour_start")).as("hour_start_us"),
            col("s.event_type").as("event_type"),
            col("s.cnt").as("cnt"),
            (col("b.cnt").isNotNull && col("s.cnt") === col("b.cnt")
              && abs(col("s.sum_value") - col("b.sum_value")) < lit(1e-6))
              .as("matches_batch"))
          .orderBy("hour_start_us", "event_type")
      },
      Some(s"""WITH e AS (${graft.Q.EVENTS_SQL}),
             |mx AS (SELECT $ClosedWindowWm AS wm_us FROM e),
             |w AS (SELECT date_trunc('hour', ts) AS hs, event_type,
             |    COUNT(*) AS cnt
             |  FROM e GROUP BY hs, event_type)
             |SELECT epoch_us(hs) AS hour_start_us, event_type, cnt,
             |  TRUE AS matches_batch
             |FROM w, mx
             |WHERE epoch_us(hs + INTERVAL 1 HOUR) <= wm_us
             |ORDER BY hour_start_us, event_type""".stripMargin)),

    // Q81: stream-static enrichment join — the remaining Structured
    // Streaming topology beside windowed agg (q33), custom state
    // (q50/q53) and stream dedup: facts enrich against a broadcast
    // static dimension at ingest, stateless on the dim side. PROMOTED to
    // a full hash oracle (r14): same closed-window determinism as q33,
    // with the dim join recomputed in SQL; the float sum stays inside
    // the in-flight tolerance flag (pinned TRUE).
    QueryDef("q81_streaming_enrich",
      (s, d) => {
        val s2 = streamSession(s)
        val replay = replayDirFor(s, d)
        val sinkTable = s"q81_sink_${System.nanoTime()}"
        val streamed = graft.streaming.EventStream
          .enrichedHourly(s2, replay, d, sinkTable)
        val batch = graft.streaming.EventStream.batchEnrichedHourly(s2, d)
        streamed.as("s").join(batch.as("b"),
            col("s.hour_start") === col("b.hour_start")
              && col("s.nation") === col("b.nation"), "left")
          .select(unix_micros(col("s.hour_start")).as("hour_start_us"),
            col("s.nation").as("nation"), col("s.cnt").as("cnt"),
            (col("b.cnt").isNotNull && col("s.cnt") === col("b.cnt")
              && abs(col("s.sum_value") - col("b.sum_value")) < lit(1e-6))
              .as("matches_batch"))
          .orderBy("hour_start_us", "nation")
      },
      Some(s"""WITH e AS (${graft.Q.EVENTS_SQL}),
             |mx AS (SELECT $ClosedWindowWm AS wm_us FROM e),
             |dim AS (SELECT c_custkey AS user_id, n_name AS nation
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
             |w AS (SELECT date_trunc('hour', e.ts) AS hs,
             |    COALESCE(dim.nation, 'unknown') AS nation,
             |    COUNT(*) AS cnt
             |  FROM e LEFT JOIN dim USING (user_id)
             |  GROUP BY hs, nation)
             |SELECT epoch_us(hs) AS hour_start_us, nation, cnt,
             |  TRUE AS matches_batch
             |FROM w, mx
             |WHERE epoch_us(hs + INTERVAL 1 HOUR) <= wm_us
             |ORDER BY hour_start_us, nation""".stripMargin)),

    // Q86: streaming keyed upsert via foreachBatch — the arbitrary-sink
    // surface: each micro-batch full-outer-MERGEs its per-user aggregate
    // into a versioned parquet state table (the CDC-ingest/lakehouse-MERGE
    // topology; state outside the state store: restart-safe, queryable,
    // unbounded keys). PROMOTED to a full hash oracle (r14, the q120
    // argument): the merge arithmetic is associative and exact, so the
    // final state equals the one-shot aggregate under ANY slicing — even
    // this rig's sampled range boundaries, which SQL cannot reconstruct,
    // don't matter. DuckDB recomputes the aggregate directly; the
    // in-flight batch-twin flags ride along, pinned TRUE.
    QueryDef("q86_streaming_upsert",
      (s, d) => {
        val s2 = streamSession(s)
        val replay = replayDirFor(s, d)
        val stateBase = java.nio.file.Files.createTempDirectory("graft-q86")
        Layout.trackTemp(stateBase.toString)
        val stateDir = s"$stateBase/state"
        val streamed = graft.streaming.EventStream
          .upsertedState(s2, replay, stateDir)
        val batch = graft.streaming.EventStream.batchUserState(s2, d)
        val dec = org.apache.spark.sql.types.DecimalType(18, 4)
        streamed.as("s").join(batch.as("b"),
            col("s.user_id") === col("b.user_id"), "full_outer")
          .select(
            coalesce(col("s.user_id"), col("b.user_id")).as("user_id"),
            col("s.n_events").as("n_events"),
            unix_micros(col("s.last_ts")).as("last_ts_us"),
            // exact decimal internally, DOUBLE in the OUTPUT schema:
            // oracle-checkable outputs carry only types with one canonical
            // cross-engine rendering (DECIMAL kept q55 driver-red for three
            // rounds)
            col("s.sum_value").cast(dec)
              .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"),
            (col("s.n_events") === col("b.n_events")
              && col("s.last_ts") === col("b.last_ts")
              && (col("s.sum_value").cast(dec) === col("b.sum_value").cast(dec)
                || (col("s.sum_value").isNull && col("b.sum_value").isNull)))
              .as("matches_batch"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${graft.Q.EVENTS_SQL})
             |SELECT user_id, COUNT(*) AS n_events,
             |  epoch_us(MAX(ts)) AS last_ts_us,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_value,
             |  TRUE AS matches_batch
             |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q50: streaming sessionization via flatMapGroupsWithState — the
    // custom-state surface (bounded open-session state per user, event-time
    // timeouts). No SQL oracle (DuckDB has no streaming); every emitted
    // session is asserted against batch q29's gaps-and-islands twin in
    // EventStreamSpec; here the emitted sessions are re-joined to the batch
    // twin so the driver's rows-only check sees the match flags.
    // PROMOTED to a full hash oracle (r14): the emitted set is sessions
    // whose close (last event + gap) the FINAL watermark passed — both
    // the gaps-and-islands session structure and the closure cut are
    // deterministic, so DuckDB recomputes them (windowed island
    // detection + the same ms-floored watermark arithmetic as q33).
    QueryDef("q50_streaming_sessions",
      (s, d) => {
        val s2 = streamSession(s)
        val replay = replayDirFor(s, d)
        val sinkTable = s"q50_sink_${System.nanoTime()}"
        val streamed = graft.streaming.EventStream.sessionized(s2, replay, sinkTable)
        val batch = graft.streaming.EventStream.batchSessions(s2, d)
        streamed.as("s").join(batch.as("b"),
            col("s.user_id") === col("b.user_id")
              && col("s.session_start") === col("b.session_start"), "left")
          .select(col("s.user_id").as("user_id"),
            unix_micros(col("s.session_start")).as("session_start_us"),
            col("s.n_events").as("n_events"),
            (col("b.n_events").isNotNull
              && col("s.n_events") === col("b.n_events")).as("matches_batch"))
          .orderBy("user_id", "session_start_us")
      },
      Some(s"""WITH e AS (${graft.Q.EVENTS_SQL}),
             |mx AS (SELECT $ClosedWindowWm AS wm_us FROM e),
             |o AS (SELECT user_id, ts, event_id,
             |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      AS prev_ts
             |  FROM e),
             |m AS (SELECT user_id, ts, event_id,
             |    CASE WHEN prev_ts IS NULL
             |      OR ts >= prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END
             |      AS new_s
             |  FROM o),
             |sx AS (SELECT user_id, ts,
             |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM m),
             |g AS (SELECT user_id, sid, MIN(ts) AS session_start,
             |    MAX(ts) AS last_ts, COUNT(*) AS n_events
             |  FROM sx GROUP BY user_id, sid)
             |SELECT user_id, epoch_us(session_start) AS session_start_us,
             |  n_events, TRUE AS matches_batch
             |FROM g, mx
             |WHERE epoch_us(last_ts) + 1800000000 <= wm_us
             |ORDER BY user_id, session_start_us""".stripMargin)),

    // Q98: stream-STREAM interval join — the remaining streaming join
    // topology (q81 is stream-static): per-user click→purchase attribution
    // with both sides unbounded, watermarked streams; the user equi-key +
    // event-time interval is what bounds the two-sided join state. No SQL
    // oracle (DuckDB has no streaming); EventStreamSpec asserts pair-set
    // equality with the batch interval-join twin; here each emitted pair
    // re-joins the twin so the driver's rows-only check sees match flags.
    // PROMOTED to a full hash oracle (r14): inner stream-stream join
    // emission is NOT watermark-gated — a pair emits as soon as both rows
    // have arrived; the watermark only bounds STATE — so the completed
    // stream's output is exactly the batch interval join, which DuckDB
    // computes directly. The in-flight batch-twin flags ride along,
    // pinned TRUE.
    QueryDef("q98_stream_stream_join",
      (s, d) => {
        val s2 = streamSession(s)
        val replay = replayDirFor(s, d)
        val sinkTable = s"q98_sink_${System.nanoTime()}"
        val streamed = graft.streaming.EventStream
          .attributedPairs(s2, replay, sinkTable)
        val batch = graft.streaming.EventStream.batchAttributedPairs(s2, d)
        streamed.as("s").join(batch.as("b"),
            col("s.p_event") === col("b.p_event")
              && col("s.c_event") === col("b.c_event"), "left")
          .select(col("s.user_id").as("user_id"),
            col("s.p_event").as("p_event"), col("s.c_event").as("c_event"),
            unix_micros(col("s.p_ts")).as("p_ts_us"),
            (col("b.user_id").isNotNull
              && col("s.c_ts") === col("b.c_ts")
              && col("s.p_ts") === col("b.p_ts")
              && col("s.p_value") === col("b.p_value")).as("matches_batch"))
          .orderBy("p_event", "c_event")
      },
      Some(s"""WITH e AS (${graft.Q.EVENTS_SQL}),
             |c AS (SELECT user_id AS cu, ts AS cts, event_id AS ce
             |  FROM e WHERE event_type = 'click'),
             |p AS (SELECT user_id AS pu, ts AS pts, event_id AS pe
             |  FROM e WHERE event_type = 'purchase')
             |SELECT pu AS user_id, pe AS p_event, ce AS c_event,
             |  epoch_us(pts) AS p_ts_us, TRUE AS matches_batch
             |FROM p JOIN c ON pu = cu AND pts > cts
             |  AND pts <= cts + INTERVAL 1 HOUR
             |ORDER BY p_event, c_event""".stripMargin)),

    // Q104: streaming ingest-dedup against a PERSISTENT index (r12) — the
    // continuous-crawl topology: each micro-batch classifies against the
    // index of everything ingested before it (exact/near/novel + anchor +
    // est_sim, q102's formula via the shared classifyAgainstIndex), then
    // MERGEs itself in (versioned parquet state, the q86 pattern).
    // PROMOTED to a full hash oracle (r15, the q120 recipe): the replay
    // slices by doc_id % 4 — a deterministic membership SQL can
    // reconstruct — and a doc's anchors are MINIMA over strictly-earlier-
    // batch docs (associative, slicing-independent), so the whole
    // classification chain replays in DuckDB as fp/band self-joins with
    // an earlier-batch predicate + q102's est_sim tail. IngestStreamSpec
    // still pins streamed == batchTwin; the in-flight match flags ride
    // along, pinned TRUE.
    QueryDef("q104_streaming_ingest_dedup",
      (s, d) => {
        val s2 = streamSession(s)
        val replay = ingestReplayDirFor(s2, d)
        val stateBase = java.nio.file.Files.createTempDirectory("graft-q104")
        Layout.trackTemp(stateBase.toString)
        val state = s"$stateBase/state"
        val streamed = graft.streaming.IngestStream.classified(s2, replay, state)
        val twin = graft.streaming.IngestStream.batchTwin(s2, d)
        streamed.as("s").join(twin.as("b"),
            col("s.doc_id") === col("b.doc_id"), "left")
          .select(col("s.doc_id").as("doc_id"), col("s.status").as("status"),
            col("s.anchor_doc").as("anchor_doc"),
            col("s.est_sim").as("est_sim"),
            (col("b.doc_id").isNotNull
              && col("s.status") === col("b.status")
              && col("s.anchor_doc") <=> col("b.anchor_doc")
              && col("s.est_sim") <=> col("b.est_sim")).as("matches_batch"))
          .orderBy("doc_id")
      },
      Some {
        val n = graft.streaming.IngestStream.ReplayBatches
        s"""WITH ${graft.queries.LlmOps.INGEST_SIG_SQL},
           |ex AS (SELECT f2.doc_id, MIN(f1.doc_id) AS exact_anchor
           |  FROM fps f2 JOIN fps f1 ON f1.fp = f2.fp
           |    AND f1.doc_id % $n < f2.doc_id % $n
           |  GROUP BY f2.doc_id),
           |nr AS (SELECT b2.doc_id, MIN(b1.doc_id) AS near_anchor
           |  FROM bands b2 JOIN bands b1 ON b1.b = b2.b AND b1.bv = b2.bv
           |    AND b1.doc_id % $n < b2.doc_id % $n
           |  GROUP BY b2.doc_id),
           |cls AS (SELECT d.doc_id, ex.exact_anchor, nr.near_anchor,
           |    CASE WHEN ex.exact_anchor IS NOT NULL THEN 'exact'
           |         WHEN nr.near_anchor IS NOT NULL THEN 'near'
           |         ELSE 'novel' END AS status,
           |    COALESCE(ex.exact_anchor, nr.near_anchor) AS anchor_doc
           |  FROM documents d
           |  LEFT JOIN ex ON ex.doc_id = d.doc_id
           |  LEFT JOIN nr ON nr.doc_id = d.doc_id)
           |SELECT c.doc_id AS doc_id, c.status AS status,
           |  c.anchor_doc AS anchor_doc,
           |  CAST(ROUND(CASE WHEN c.anchor_doc IS NOT NULL THEN
           |    CAST(list_sum(list_transform(generate_series(1, 12),
           |      i -> CASE WHEN sa.sigl[i] = sb.sigl[i] THEN 1 ELSE 0 END))
           |      AS DOUBLE) / 12 END, 4) AS DOUBLE) AS est_sim,
           |  TRUE AS matches_batch
           |FROM cls c
           |LEFT JOIN sig sa ON sa.doc_id = c.anchor_doc
           |LEFT JOIN sig sb ON sb.doc_id = c.doc_id
           |ORDER BY c.doc_id""".stripMargin
      }),

    // Q111: STREAMING heavy hitters (r12) — micro-batch Misra-Gries
    // sketches folded into a versioned persistent sketch with the
    // PODS-2012 merge (the same rule the batch aggregate uses, so the MG
    // survival guarantee transfers to ANY slicing), then q99's exact
    // rescue. The one streaming query WITH a DuckDB oracle: the rescue
    // discards every order- and slicing-dependent artifact of the
    // sketch, so the streamed output hash-equals the batch q99 — whose
    // oracle SQL this query reuses verbatim.
    QueryDef("q111_streaming_heavy_hitters",
      (s, d) => {
        val s2 = streamSession(s)
        val replay = ingestReplayDirFor(s2, d)
        val stateBase = java.nio.file.Files.createTempDirectory("graft-q111")
        Layout.trackTemp(stateBase.toString)
        val state = s"$stateBase/state"
        graft.streaming.HitterStream.heavyHitters(s2, replay, state, d)
      },
      Some("""WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS token
             |              FROM documents),
             |tot AS (SELECT COUNT(*) AS n FROM toks)
             |SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
             |HAVING COUNT(*) >= GREATEST((SELECT n FROM tot) // 1000, 5)
             |ORDER BY cnt DESC, token""".stripMargin)),

    // Q53: streaming NEAR-dup ingest (r5) — MinHash band buckets resolved
    // to anchors through bounded per-bucket flatMapGroupsWithState state
    // with event-time expiry (see DocStream). PROMOTED to a full hash
    // oracle (r15): the replay arrives in doc_id order with the horizon
    // sized past the staged span (horizonMinutesFor — no bucket can
    // expire mid-replay), so every bucket's streamed anchor is the
    // corpus-wide MIN(doc_id) — exactly the batch twin, which DuckDB
    // recomputes with q35's validated signature/banding CTEs. The expiry
    // path stays spec-pinned (DocStreamSpec runs a short-horizon rig);
    // the in-flight match flags ride along, pinned TRUE.
    QueryDef("q53_streaming_neardup",
      (s, d) => {
        val s2 = streamSession(s)
        val (replay, horizon) = docReplayDirFor(s, d)
        val sinkTable = s"q53_sink_${System.nanoTime()}"
        val streamed =
          graft.streaming.DocStream.bandAnchors(s2, replay, sinkTable, horizon)
        val batch = graft.streaming.DocStream.batchBandAnchors(s2, d)
        streamed.as("s").join(batch.as("b"),
            col("s.doc_id") === col("b.doc_id") && col("s.band") === col("b.band"),
            "left")
          .select(col("s.doc_id").as("doc_id"), col("s.band").as("band"),
            col("s.anchor_doc").as("anchor_doc"),
            (col("b.anchor_doc").isNotNull
              && col("s.anchor_doc") === col("b.anchor_doc")).as("matches_batch"))
          .orderBy("doc_id", "band")
      },
      Some(s"""WITH ${graft.queries.LlmOps.MINHASH_BANDS_SQL},
             |anchors AS (SELECT b, bv, MIN(doc_id) AS anchor_doc
             |  FROM bands GROUP BY b, bv)
             |SELECT bd.doc_id AS doc_id, bd.b AS band, a.anchor_doc,
             |  TRUE AS matches_batch
             |FROM bands bd JOIN anchors a ON a.b = bd.b AND a.bv = bd.bv
             |ORDER BY doc_id, band""".stripMargin)),

    // Q120 CHANGE DATA FEED (r14): the q86 upsert topology, with the merge
    // also emitting the Delta-style row-level change log (insert /
    // update_preimage / update_postimage per key per micro-batch) from the
    // SAME touched-bucket join the merge already runs — see CdfStream.
    // The first streaming-machinery query with a full DuckDB oracle: the
    // replay slices by event_id % 4, so the feed equals a batch
    // cumulative-window computation over raw events, hash-checked end to
    // end (every earlier streaming rig could only pin batch-twin flags).
    QueryDef("q120_change_data_feed",
      (s, d) => {
        val base = java.nio.file.Files.createTempDirectory("graft-q120run")
        Layout.trackTemp(base.toString)
        val cdf = s"$base/cdf"
        graft.streaming.CdfStream.runUpsertCdf(streamSession(s),
          cdfReplayFor(s, d), s"$base/state", cdf, retain = 8)
        graft.streaming.CdfStream.cdfRows(s, cdf)
          .select(col("user_id"), col("batch_id"), col("op"),
            col("n_events"), unix_micros(col("last_ts")).as("last_ts_us"),
            col("sum_value")
              .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
          .orderBy("user_id", "batch_id", "op")
      },
      Some(s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             |    event_id % 4 AS b FROM events),
             |per AS (SELECT user_id, b, COUNT(*) AS n, MAX(ts) AS mts,
             |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
             |  FROM e GROUP BY user_id, b),
             |cum AS (SELECT user_id, b,
             |    CAST(SUM(n) OVER w AS BIGINT) AS cn,
             |    MAX(mts) OVER w AS cts,
             |    CAST(SUM(sv) OVER w AS DECIMAL(18,4)) AS csv
             |  FROM per WINDOW w AS (PARTITION BY user_id ORDER BY b)),
             |lg AS (SELECT user_id, b, cn, cts, csv,
             |    LAG(cn) OVER p AS pn, LAG(cts) OVER p AS pts,
             |    LAG(csv) OVER p AS psv
             |  FROM cum WINDOW p AS (PARTITION BY user_id ORDER BY b))
             |SELECT user_id, b AS batch_id,
             |  CASE WHEN pn IS NULL THEN 'insert'
             |       ELSE 'update_postimage' END AS op,
             |  cn AS n_events, epoch_us(cts) AS last_ts_us,
             |  CAST(csv AS DOUBLE) AS sum_value
             |FROM lg
             |UNION ALL
             |SELECT user_id, b AS batch_id, 'update_preimage' AS op,
             |  pn AS n_events, epoch_us(pts) AS last_ts_us,
             |  CAST(psv AS DOUBLE) AS sum_value
             |FROM lg WHERE pn IS NOT NULL
             |ORDER BY user_id, batch_id, op""".stripMargin)),

    // Q121 TIME TRAVEL (r14): VERSION-AS-OF reads over the same run's
    // retained manifests — the Delta/Iceberg snapshot surface on the
    // bucketed layout (IngestIndex.tableAt; gc keeps the newest `retain`
    // manifests replayable). Snapshot v2 = the state after batches {0,1}
    // = events with event_id % 4 <= 1, which the oracle recomputes
    // directly; the final version rides along so one hash pins both an
    // historical and the current snapshot.
    QueryDef("q121_time_travel",
      (s, d) => {
        val (state, _, top) = cdfRigFor(s, d)
        def asOf(v: Long) = graft.streaming.IngestIndex
          .tableAt(s, state, "state", v)
          .select(lit(v).as("as_of_version"), col("user_id"),
            col("n_events"), unix_micros(col("last_ts")).as("last_ts_us"),
            col("sum_value")
              .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
        asOf(2L).unionByName(asOf(top))
          .orderBy("as_of_version", "user_id")
      },
      Some(s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             |    event_id % 4 AS b FROM events),
             |snap AS (SELECT CAST(v.v AS BIGINT) AS as_of_version, user_id,
             |    COUNT(*) AS n_events,
             |    epoch_us(MAX(ts)) AS last_ts_us,
             |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |      AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |  FROM e, (VALUES (2), (4)) AS v(v)
             |  WHERE e.b < v.v GROUP BY v.v, user_id)
             |SELECT * FROM snap ORDER BY as_of_version, user_id""".stripMargin)),

    // Q123 INCREMENTAL VIEW MAINTENANCE (r14): the CONSUMER side of the
    // q120 change feed — a per-nation rollup maintained from change rows
    // alone (each change contributes postimage - preimage; the signed
    // deltas telescope to the final per-user state, then roll up through
    // the broadcast-gated user->nation dim), never touching the raw
    // events or the state table. This is the Delta-CDF materialized-view
    // pattern: at crawl scale the view update reads O(changed keys) per
    // refresh instead of rescanning an unbounded fact table; here the
    // full feed replays in one pass and the oracle recomputes the view
    // directly from raw events, so the hash proves the delta algebra.
    QueryDef("q123_incremental_view",
      (s, d) => {
        val (_, cdf, _) = cdfRigFor(s, d)
        val dec = org.apache.spark.sql.types.DecimalType(18, 4)
        val sign = when(col("op") === "update_preimage", lit(-1L))
          .otherwise(lit(1L))
        val perUser = graft.streaming.CdfStream.cdfRows(s, cdf)
          .groupBy("user_id")
          .agg(sum(sign * col("n_events")).as("n"),
            sum((sign.cast(dec) * col("sum_value").cast(dec)).cast(dec))
              .as("sv"))
        val dim = graft.streaming.EventStream.userNationDim(s, d)
        perUser.join(dim, "user_id")
          .groupBy("nation")
          .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"),
            sum(col("sv")).cast(dec)
              .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
          .orderBy("nation")
      },
      Some(s"""WITH per AS (SELECT user_id, COUNT(*) AS n,
             |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
             |  FROM events GROUP BY user_id),
             |dim AS (SELECT c_custkey AS user_id, n_name AS nation
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
             |SELECT nation, COUNT(*) AS n_users,
             |  CAST(SUM(n) AS BIGINT) AS n_events,
             |  CAST(CAST(SUM(sv) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM per JOIN dim USING (user_id)
             |GROUP BY nation ORDER BY nation""".stripMargin)),

    // Q126 POINT LOOKUP / GET (r14): the O(keys) read path of the
    // key-value store the streams maintain — the 5 smallest user ids are
    // probed through IngestIndex.pointGet, which maps key -> bucket ->
    // (version dir, partition filter) via the manifest and SCANS ONLY
    // the covered bucket directories: at any store size the GET lists a
    // bounded set of dirs (the manifest is the index; CdfSpec pins the
    // pruning observably). The probe-key rule ("5 smallest distinct
    // users") is SQL-expressible, so the oracle recomputes the same rows
    // from raw events directly.
    QueryDef("q126_point_lookup",
      (s, d) => {
        val (state, _, _) = cdfRigFor(s, d)
        val sp = s
        import sp.implicits._
        val keys = graft.Q.events(s, d).select("user_id").distinct()
          .orderBy("user_id").limit(5)
          .collect().map(_.getLong(0)).toSeq
        val got = graft.streaming.IngestIndex.pointGet(s, state, "state",
          keys.toDF("user_id"))
        got.select(col("user_id"), col("n_events"),
            unix_micros(col("last_ts")).as("last_ts_us"),
            col("sum_value")
              .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${graft.Q.EVENTS_SQL}),
             |k AS (SELECT DISTINCT user_id FROM e
             |  ORDER BY user_id LIMIT 5)
             |SELECT user_id, COUNT(*) AS n_events,
             |  epoch_us(MAX(ts)) AS last_ts_us,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM e WHERE user_id IN (SELECT user_id FROM k)
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q130 CDC WITH DELETES (r15): the missing Delta-CDF op type — each
    // micro-batch's merge also REMOVES batch-active users whose id lands
    // on the batch under mod-29 (post-upsert), emitting `delete` rows
    // with the removed row's pre-commit image — the feed is NETTED per
    // commit (r16): at most one change per key per batch, Delta's
    // contract; removed users re-INSERT on their next
    // activity (the re-crawl topology), and users deleted at the last
    // batch they ever appear in stay gone. The rule is batch-membership-
    // gated precisely so the chain stays SQL-reconstructible: a user's
    // final state aggregates their events in batches STRICTLY AFTER
    // their delete batch — the oracle computes that cutoff per user
    // (EXISTS gates the membership) and recomputes the state directly.
    QueryDef("q130_cdc_deletes",
      (s, d) => {
        val base = java.nio.file.Files.createTempDirectory("graft-q130run")
        Layout.trackTemp(base.toString)
        graft.streaming.CdfStream.runUpsertCdf(streamSession(s),
          cdfReplayFor(s, d), s"$base/state", s"$base/cdf", retain = 8,
          deleteMod = Some(CdcDeleteMod))
        graft.streaming.IngestIndex.currentTable(s, s"$base/state", "state")
          .select(col("user_id"), col("n_events"),
            unix_micros(col("last_ts")).as("last_ts_us"),
            col("sum_value")
              .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |    value, event_id % 4 AS b FROM events),
             |d AS (SELECT du.user_id,
             |    CASE WHEN du.user_id % $CdcDeleteMod <= 3 AND EXISTS (
             |        SELECT 1 FROM e e2 WHERE e2.user_id = du.user_id
             |          AND e2.b = du.user_id % $CdcDeleteMod)
             |      THEN du.user_id % $CdcDeleteMod ELSE -1 END AS dk
             |  FROM (SELECT DISTINCT user_id FROM e) du)
             |SELECT e.user_id, COUNT(*) AS n_events,
             |  epoch_us(MAX(e.ts)) AS last_ts_us,
             |  CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,4)))
             |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM e JOIN d ON d.user_id = e.user_id
             |WHERE e.b > d.dk
             |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin)),

    // Q130b CDC-DELETE VIEW CONSUMER (r15): q125's topology over the
    // delete-bearing feed — the consumer's signed-delta algebra gains
    // the `delete` term (subtract the removed image; n_users -1), and
    // the per-user contributions still telescope: insert ... delete
    // cancels to zero, a re-insert restarts the chain, so the final view
    // equals the direct recompute over each user's SURVIVING events.
    // Nations whose every user fully departed drop from the output
    // (n_users telescopes to 0 — the declared view semantics).
    QueryDef("q130b_cdc_delete_view",
      (s, d) => {
        val s2 = streamSession(s)
        val (_, cdf, _) = cdfDelRigFor(s, d)
        val viewBase = java.nio.file.Files.createTempDirectory("graft-q130b")
        Layout.trackTemp(viewBase.toString)
        graft.streaming.CdfStream
          .maintainView(s2, s"$cdf/b*", d, s"$viewBase/view")
          .filter(col("n_users") > 0)
          .select(col("nation"), col("n_users"), col("n_events"),
            col("sum_value")
              .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
          .orderBy("nation")
      },
      Some(s"""WITH e AS (SELECT user_id, value, event_id % 4 AS b
             |  FROM events),
             |d AS (SELECT du.user_id,
             |    CASE WHEN du.user_id % $CdcDeleteMod <= 3 AND EXISTS (
             |        SELECT 1 FROM e e2 WHERE e2.user_id = du.user_id
             |          AND e2.b = du.user_id % $CdcDeleteMod)
             |      THEN du.user_id % $CdcDeleteMod ELSE -1 END AS dk
             |  FROM (SELECT DISTINCT user_id FROM e) du),
             |per AS (SELECT e.user_id, COUNT(*) AS n,
             |    SUM(CAST(e.value AS DECIMAL(18,4))) AS sv
             |  FROM e JOIN d ON d.user_id = e.user_id
             |  WHERE e.b > d.dk GROUP BY e.user_id),
             |dim AS (SELECT c_custkey AS user_id, n_name AS nation
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
             |SELECT nation, COUNT(*) AS n_users,
             |  CAST(SUM(n) AS BIGINT) AS n_events,
             |  CAST(CAST(SUM(sv) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM per JOIN dim USING (user_id)
             |GROUP BY nation ORDER BY nation""".stripMargin)),

    // Q132 STREAMING ERASURE OVER DELETION VECTORS (r16): the workload
    // DVs exist for — right-to-be-forgotten requests trickling in
    // against a store nothing else is touching. Each request batch
    // commits ONLY its tombstone keys (write IO O(requests), zero base
    // buckets rewritten — the eager path would pay full bucket rewrites
    // per request); one materializeDeletes at the end is the OPTIMIZE
    // rewrite amortizing the whole history. Mod-sliced requests (batch k
    // erases users with user_id % 12 == k, 3 batches) keep the chain
    // SQL-reconstructible: survivors are user_id % 12 >= 3.
    QueryDef("q132_erasure_stream_dv",
      (s, d) => {
        val base = java.nio.file.Files.createTempDirectory("graft-q132run")
        Layout.trackTemp(base.toString)
        val s2 = streamSession(s)
        graft.streaming.ErasureStream.stageRequests(s, d, s"$base/req")
        graft.streaming.ErasureStream.runErasure(s2, d, s"$base/req",
          s"$base/state")
        graft.streaming.IngestIndex.currentTable(s, s"$base/state", "state")
          .select(col("user_id"), col("n_events"),
            col("sum_value")
              .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (${graft.Q.EVENTS_SQL})
             |SELECT user_id, COUNT(*) AS n_events,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM e
             |WHERE user_id % 12 >= 3
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q133 CDC CATCH-UP CONSUMER (r16): Delta's startingVersion pattern
    // — a consumer arriving mid-stream bootstraps from ONE snapshot read
    // (tableAt at v0 = 2, the initial-snapshot half of readChangeFeed),
    // then consumes only feed batches >= v0. The delta algebra is
    // associative and the snapshot IS the fold of batches < v0, so
    // bootstrap + tail telescopes to the full replay — across a boundary
    // that splits DELETE chains (the rig is the q130 delete-bearing
    // feed): users deleted before v0 are absent from the snapshot,
    // deletes at >= v0 subtract images the bootstrap counted. The oracle
    // is q130b's verbatim — the consumer's start position must not be
    // observable in the result. At scale this is the only viable start:
    // one pruned scan of the current table, not months of feed replay.
    QueryDef("q133_cdc_catchup_view",
      (s, d) => {
        val s2 = streamSession(s)
        val (state, cdf, _) = cdfDelRigFor(s, d)
        val viewBase = java.nio.file.Files.createTempDirectory("graft-q133")
        Layout.trackTemp(viewBase.toString)
        graft.streaming.CdfStream
          .maintainViewFrom(s2, s"$cdf/b*", d, state, s"$viewBase/view",
            fromVersion = 2L)
          .filter(col("n_users") > 0)
          .select(col("nation"), col("n_users"), col("n_events"),
            col("sum_value")
              .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
          .orderBy("nation")
      },
      Some(s"""WITH e AS (SELECT user_id, value, event_id % 4 AS b
             |  FROM events),
             |d AS (SELECT du.user_id,
             |    CASE WHEN du.user_id % $CdcDeleteMod <= 3 AND EXISTS (
             |        SELECT 1 FROM e e2 WHERE e2.user_id = du.user_id
             |          AND e2.b = du.user_id % $CdcDeleteMod)
             |      THEN du.user_id % $CdcDeleteMod ELSE -1 END AS dk
             |  FROM (SELECT DISTINCT user_id FROM e) du),
             |per AS (SELECT e.user_id, COUNT(*) AS n,
             |    SUM(CAST(e.value AS DECIMAL(18,4))) AS sv
             |  FROM e JOIN d ON d.user_id = e.user_id
             |  WHERE e.b > d.dk GROUP BY e.user_id),
             |dim AS (SELECT c_custkey AS user_id, n_name AS nation
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
             |SELECT nation, COUNT(*) AS n_users,
             |  CAST(SUM(n) AS BIGINT) AS n_events,
             |  CAST(CAST(SUM(sv) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM per JOIN dim USING (user_id)
             |GROUP BY nation ORDER BY nation""".stripMargin)),

    // Q144 STREAMING SOURCE OVER THE STORE (r19): the `graft-cdc`
    // readStream surface — Delta's readChangeFeed-streaming equivalent
    // with NO feed artifact anywhere: the producer only commits store
    // versions; each consumer micro-batch IS the store's retroactive
    // change computation (changesBetween — per-step reads restricted to
    // each commit's bucket footprint). The rig builds the q130
    // delete-bearing store in TWO stages to pin the mid-stream seam:
    //   1. replay batches 0-1 commit v1-v2;
    //   2. consumer "catchup" STARTS here — snapshot bootstrap at v2
    //      (the source emits the v2 snapshot as its first batch's
    //      inserts: q133's rule, now inside the source);
    //   3. replay batches 2-3 commit v3-v4;
    //   4. consumer "tail" reads startingVersion=1 (the full history
    //      as changes), and "catchup" RESUMES on its checkpoint,
    //      consuming exactly (v2, v4] — across delete chains the
    //      boundary splits.
    // Both consumers' views must hash-equal the direct recompute
    // (q130b's oracle, duplicated per consumer tag) — the consumer's
    // start position and the snapshot/tail seam are unobservable.
    QueryDef("q144_cdc_source_stream",
      (s, d) => {
        val s2 = streamSession(s)
        val base = java.nio.file.Files.createTempDirectory("graft-q144")
        Layout.trackTemp(base.toString)
        val replay = s"$base/replay"
        val state = s"$base/state"
        val fs = new org.apache.hadoop.fs.Path(replay)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.mkdirs(new org.apache.hadoop.fs.Path(replay))
        // the SLICES are memoized rig staging (one events scan per
        // sfDir, like cdfReplayFor); the per-invocation two-STAGE
        // arrival is a byte copy of the staged files — the seam the
        // query pins is WHEN each slice becomes visible, not how its
        // bytes were produced
        val staged = cdfReplayFor(s, d)
        def stage(k: Int): Unit = {
          val src = new org.apache.hadoop.fs.Path(
            staged, f"batch-$k%04d.parquet")
          val dst = new org.apache.hadoop.fs.Path(
            replay, f"batch-$k%04d.parquet")
          org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false,
            s.sparkContext.hadoopConfiguration)
          graft.streaming.ReplayStage.pinFile(fs, dst, k)
        }
        stage(0); stage(1)
        graft.streaming.CdfStream.runUpsertCdf(s2, replay, state,
          s"$base/cdf", retain = 8, deleteMod = Some(CdcDeleteMod))
        graft.operators.GraftSql.registerTable("graft_q144_state",
          state, "state")
        try {
          // catch-up consumer, phase 1: snapshot bootstrap at v2
          graft.streaming.CdfStream.maintainViewFromCdc(s2,
            "graft_q144_state", d, s"$base/viewB",
            startingVersion = None)
          // the store advances AFTER that consumer's first run
          stage(2); stage(3)
          graft.streaming.CdfStream.runUpsertCdf(s2, replay, state,
            s"$base/cdf", retain = 8, deleteMod = Some(CdcDeleteMod))
          // full-history tail consumer: version 1's own changes first
          val tail = graft.streaming.CdfStream.maintainViewFromCdc(s2,
            "graft_q144_state", d, s"$base/viewA",
            startingVersion = Some(1L))
          // catch-up consumer, phase 2: resumes its checkpoint, reads
          // exactly the commits that landed in between
          val catchup = graft.streaming.CdfStream.maintainViewFromCdc(
            s2, "graft_q144_state", d, s"$base/viewB",
            startingVersion = None)
          def shaped(v: org.apache.spark.sql.DataFrame, tag: String) =
            v.filter(col("n_users") > 0)
              .select(lit(tag).as("consumer"), col("nation"),
                col("n_users"), col("n_events"),
                col("sum_value")
                  .cast(org.apache.spark.sql.types.DoubleType)
                  .as("sum_value"))
          shaped(tail, "tail").unionByName(shaped(catchup, "catchup"))
            .orderBy("consumer", "nation")
        } finally graft.operators.GraftSql.unregisterTable(
          "graft_q144_state")
      },
      Some(s"""WITH e AS (SELECT user_id, value, event_id % 4 AS b
             |  FROM events),
             |d AS (SELECT du.user_id,
             |    CASE WHEN du.user_id % $CdcDeleteMod <= 3 AND EXISTS (
             |        SELECT 1 FROM e e2 WHERE e2.user_id = du.user_id
             |          AND e2.b = du.user_id % $CdcDeleteMod)
             |      THEN du.user_id % $CdcDeleteMod ELSE -1 END AS dk
             |  FROM (SELECT DISTINCT user_id FROM e) du),
             |per AS (SELECT e.user_id, COUNT(*) AS n,
             |    SUM(CAST(e.value AS DECIMAL(18,4))) AS sv
             |  FROM e JOIN d ON d.user_id = e.user_id
             |  WHERE e.b > d.dk GROUP BY e.user_id),
             |dim AS (SELECT c_custkey AS user_id, n_name AS nation
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
             |v AS (SELECT nation, COUNT(*) AS n_users,
             |    CAST(SUM(n) AS BIGINT) AS n_events,
             |    CAST(CAST(SUM(sv) AS DECIMAL(18,4)) AS DOUBLE)
             |      AS sum_value
             |  FROM per JOIN dim USING (user_id)
             |  GROUP BY nation)
             |SELECT c.consumer, v.nation, v.n_users, v.n_events,
             |  v.sum_value
             |FROM v CROSS JOIN (VALUES ('catchup'), ('tail'))
             |  AS c(consumer)
             |ORDER BY consumer, nation""".stripMargin)),

    // Q146 STORE-TO-STORE CDC REPLICATION (r19): the q144 source piped
    // into the q146 sink with NO user code and no feed artifact on
    // either side — readStream.format("graft-cdc") over the
    // delete-bearing source store, writeStream.format("graft-upsert")
    // into a fresh replica store, one statement. maxVersionsPerTrigger
    // = 1 makes the replica's version chain MIRROR the source's (batch
    // k applies source version k+1 as replica version k+1 — the sink's
    // exactly-once law), across inserts, update chains and deletes
    // (removed users re-insert on later activity; the apply order is
    // the version order). The gated result is the REPLICA's final
    // contents — which must hash-equal the source's direct recompute
    // (q130's oracle verbatim): replication is unobservable.
    QueryDef("q146_cdc_replication",
      (s, d) => {
        val s2 = streamSession(s)
        val (srcState, _, _) = cdfDelRigFor(s, d)
        val base = java.nio.file.Files.createTempDirectory("graft-q146")
        Layout.trackTemp(base.toString)
        val replica = s"$base/replica"
        graft.operators.GraftSql.registerTable("graft_q146_src",
          srcState, "state")
        graft.operators.GraftSql.registerTable("graft_q146_replica",
          replica, "state")
        try {
          val q = s2.readStream.format("graft-cdc")
            .option("name", "graft_q146_src")
            .option("startingVersion", "1")
            .option("maxVersionsPerTrigger", "1")
            .load()
            .writeStream.format("graft-upsert")
            .option("name", "graft_q146_replica")
            .option("checkpointLocation", s"$base/ckpt")
            .start()
          q.processAllAvailable()
          q.stop()
          graft.streaming.IngestIndex
            .currentTable(s, replica, "state")
            .select(col("user_id"), col("n_events"),
              unix_micros(col("last_ts")).as("last_ts_us"),
              col("sum_value")
                .cast(org.apache.spark.sql.types.DoubleType)
                .as("sum_value"))
            .orderBy("user_id")
        } finally {
          graft.operators.GraftSql.unregisterTable("graft_q146_src")
          graft.operators.GraftSql.unregisterTable("graft_q146_replica")
        }
      },
      Some(s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |    value, event_id % 4 AS b FROM events),
             |d AS (SELECT du.user_id,
             |    CASE WHEN du.user_id % $CdcDeleteMod <= 3 AND EXISTS (
             |        SELECT 1 FROM e e2 WHERE e2.user_id = du.user_id
             |          AND e2.b = du.user_id % $CdcDeleteMod)
             |      THEN du.user_id % $CdcDeleteMod ELSE -1 END AS dk
             |  FROM (SELECT DISTINCT user_id FROM e) du)
             |SELECT e.user_id, COUNT(*) AS n_events,
             |  epoch_us(MAX(e.ts)) AS last_ts_us,
             |  CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,4)))
             |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM e JOIN d ON d.user_id = e.user_id
             |WHERE e.b > d.dk
             |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin)),

    // Q125 STREAMING CDC CONSUMER (r14): q123's view maintained by a
    // SECOND STREAM reading the q120 feed as a file source — the
    // downstream half of a chained CDC pipeline (table -> change feed ->
    // derived view, Delta's readChangeFeed topology). Each trigger
    // reduces its change slice to signed per-nation deltas and merges
    // them into a versioned 25-key view table; the upstream state table
    // is never read. The delta algebra is associative, so the final view
    // is independent of trigger slicing (no replay-order pinning — the
    // one rig where order genuinely cannot matter). Shares q123's oracle
    // verbatim: stream-maintained == fold == direct recompute.
    QueryDef("q125_streaming_cdc_view",
      (s, d) => {
        val s2 = streamSession(s)
        val (_, cdf, _) = cdfRigFor(s, d)
        val viewBase = java.nio.file.Files.createTempDirectory("graft-q125")
        Layout.trackTemp(viewBase.toString)
        val viewDir = s"$viewBase/view"
        graft.streaming.CdfStream.maintainView(s2, s"$cdf/b*", d, viewDir)
          .select(col("nation"), col("n_users"), col("n_events"),
            col("sum_value")
              .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
          .orderBy("nation")
      },
      Some(s"""WITH per AS (SELECT user_id, COUNT(*) AS n,
             |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
             |  FROM events GROUP BY user_id),
             |dim AS (SELECT c_custkey AS user_id, n_name AS nation
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
             |SELECT nation, COUNT(*) AS n_users,
             |  CAST(SUM(n) AS BIGINT) AS n_events,
             |  CAST(CAST(SUM(sv) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
             |FROM per JOIN dim USING (user_id)
             |GROUP BY nation ORDER BY nation""".stripMargin)))
}
