package graft.queries

import graft.QueryDef
import graft.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators (round 7): PII scrubbing, inverted-index
  * construction, and exact-span duplication coverage — the remaining
  * standard passes of an LLM training-data pipeline beside the dedup
  * (q30/q34-q37/q51/q59), quality (q38/q45/q52/q58), sampling
  * (q55/q60/q65) and retrieval (q63/q64) families.
  *
  * The synthetic `documents` text is clean word-salad, so the PII pass
  * first STAMPS deterministic PII spans into a subset of docs (same
  * arithmetic in both engines) and then detects/redacts them — the regex
  * machinery is exercised against real matches instead of vacuous zeros.
  */
object Curation {

  /** PII patterns, shared verbatim by Spark (Java regex) and the DuckDB
    * oracle (RE2): both dialects agree on character classes, bounded
    * quantifiers and `\b` word boundaries; nothing fancier is used.
    */
  private val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val PhoneRe = """\+\d{1,2}-\d{3}-\d{4}"""
  private val Ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** Q72 in-domain target slice and selection size. src0 is 5% of every
    * SF's corpus (20 uniform sources) — a realistic target/raw ratio. */
  val DsirTarget = "src0"
  val DsirK = 100

  /** q94 dup-set broadcast gate: the hint is applied only while the
    * MEASURED duplicated-line cardinality stays under this many rows
    * (~64 B/row of md5-hex + flag -> default 2^21 rows ~ 128 MB build).
    * Beyond it, the mark join ships un-hinted and shuffles on the narrow
    * lh key. Session-overridable so CurationSpec can pin both regimes. */
  val DupBroadcastMaxRows: Long = 1L << 21

  private def dupBroadcastMaxRows(s: org.apache.spark.sql.SparkSession): Long =
    s.conf.get("spark.graft.dedup.dupBroadcastMaxRows",
      DupBroadcastMaxRows.toString).toLong

  /** (rows, estBytes, broadcast) of the last dup set q94 built in this
    * JVM — the operator's observability surface (r8 verdict: report,
    * don't OOM, when a corpus's boilerplate set explodes). */
  val lastDupSetStats =
    new java.util.concurrent.atomic.AtomicReference[(Long, Long, Boolean)]

  /** q94's pseudo-line stream (10-word lines, deterministic boilerplate
    * stamped into subsets so the dedup pass has real duplicates). */
  private[graft] def q94Lines(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val lineA = "please accept all cookies to continue reading this site"
    val lineB = "subscribe to our newsletter for daily updates and offers"
    t(s, d, "documents")
      .withColumn("stamped", concat(
        when(col("doc_id") % 4 === 0, lit(lineA + " ")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(lineB + " ")).otherwise(lit("")),
        col("text")))
      .withColumn("words", split(col("stamped"), " "))
      .withColumn("li",
        explode(sequence(lit(0), expr("(size(words) - 1) div 10"))))
      .withColumn("line",
        concat_ws(" ", slice(col("words"), col("li") * 10 + 1, lit(10))))
      .select(col("doc_id"), col("li"), md5(col("line")).as("lh"),
        col("line"))
  }

  /** The df >= 3 duplicated-line set, MATERIALIZED (checkpoint) so the
    * one line-frequency shuffle is paid once and the gate's count job
    * reads checkpointed blocks instead of recomputing the aggregate.
    * Returns (dupSet, rows, estBytes). NOTE: this runs the checkpoint +
    * count JOBS eagerly — q94's gate needs the measured cardinality
    * before it can choose a join strategy, so even plan-only consumers
    * of q94 pay the dup aggregate once per call. That is the price of a
    * measured (not estimated) gate on a corpus-dependent set. */
  private[graft] def dupSetWithStats(lines: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, Long, Long) = {
    val dup = org.apache.spark.sql.execution.GraftCheckpoint
      .localCheckpointFlatStats(
        lines.groupBy("lh").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 3).select(col("lh"), lit(true).as("is_dup")))
    val rows = dup.count()
    val estBytes = rows * 64L // 32-char md5 hex + flag + row overhead
    (dup, rows, estBytes)
  }

  val defs: Seq[QueryDef] = Seq(

    // Q67 PII detection + redaction ---------------------------------------
    // Per-doc regex scrub: counts per PII class and the md5 of the
    // redacted text (pins the exact replacement semantics across
    // engines). Redaction order email -> phone -> ip is fixed on both
    // sides. Pure per-row projection: no shuffle, no UDF — Spark's
    // regexp_count/regexp_replace are codegen'd expressions, so the scrub
    // runs at scan speed and scales linearly with the corpus; at 100 TB
    // this is the canonical "embarrassingly parallel single pass".
    QueryDef("q67_pii_scrub",
      (s, d) => {
        val docs = t(s, d, "documents")
        val raw = concat(
          col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact user"), col("doc_id").cast(StringType),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" tel +1-555-"),
              lpad((col("doc_id") % 10000).cast(StringType), 4, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" host 10."), (col("doc_id") % 256).cast(StringType),
              lit("."), ((col("doc_id") * 7) % 256).cast(StringType),
              lit("."), ((col("doc_id") * 13) % 256).cast(StringType)))
            .otherwise(lit("")))
        docs.withColumn("raw", raw)
          .select(
            col("doc_id"),
            regexp_count(col("raw"), lit(EmailRe)).cast(IntegerType)
              .as("n_emails"),
            regexp_count(col("raw"), lit(PhoneRe)).cast(IntegerType)
              .as("n_phones"),
            regexp_count(col("raw"), lit(Ipv4Re)).cast(IntegerType)
              .as("n_ips"),
            md5(regexp_replace(
              regexp_replace(
                regexp_replace(col("raw"), EmailRe, "[EMAIL]"),
                PhoneRe, "[PHONE]"),
              Ipv4Re, "[IP]")).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH raw AS (SELECT doc_id, text
             |    || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
             |         || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
             |    || CASE WHEN doc_id % 5 = 0 THEN ' tel +1-555-'
             |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
             |    || CASE WHEN doc_id % 7 = 0 THEN ' host 10.'
             |         || CAST(doc_id % 256 AS VARCHAR) || '.'
             |         || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
             |         || CAST((doc_id * 13) % 256 AS VARCHAR) ELSE '' END AS raw
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(raw, '$EmailRe')) AS INT) AS n_emails,
             |  CAST(len(regexp_extract_all(raw, '$PhoneRe')) AS INT) AS n_phones,
             |  CAST(len(regexp_extract_all(raw, '$Ipv4Re')) AS INT) AS n_ips,
             |  md5(regexp_replace(regexp_replace(regexp_replace(raw,
             |    '$EmailRe', '[EMAIL]', 'g'),
             |    '$PhoneRe', '[PHONE]', 'g'),
             |    '$Ipv4Re', '[IP]', 'g')) AS redacted_md5
             |FROM raw ORDER BY doc_id""".stripMargin)),

    // Q69 inverted index with doc-range posting blocks ---------------------
    // The retrieval-side index build (q63 scores with corpus stats; this
    // materializes the postings themselves). Two-level shape chosen for
    // the 100 TB case: (1) term frequencies pre-aggregate per (doc, term)
    // — the classic map-side combine, output bounded by corpus vocab x
    // docs actually containing the term; (2) posting lists are blocked by
    // FIXED DOC-ID RANGE (block = doc_id div 128), not by global rank —
    // block assignment is pure per-row arithmetic, so there is NO
    // per-term window and no hot-key single partition even for a stopword
    // whose posting spans the whole corpus (the index shards by doc range
    // exactly like a distributed search engine's document-partitioned
    // index). md5 of the in-block doc list pins exact posting content.
    QueryDef("q69_inverted_index",
      (s, d) => {
        val tf = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .filter(col("term") =!= "")
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        tf.withColumn("block_id", expr("doc_id div 128").cast(IntegerType))
          .groupBy("term", "block_id")
          .agg(
            count(lit(1)).cast(IntegerType).as("n_docs"),
            sum(col("tf")).as("cf_block"),
            md5(concat_ws(",",
              transform(array_sort(collect_list(col("doc_id"))),
                _.cast(StringType)))).as("posting_md5"))
          .orderBy("term", "block_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
             |  WHERE term <> '' GROUP BY doc_id, term)
             |SELECT term, CAST(doc_id // 128 AS INT) AS block_id,
             |  CAST(COUNT(*) AS INT) AS n_docs,
             |  CAST(SUM(tf) AS BIGINT) AS cf_block,
             |  md5(array_to_string(
             |    list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ',')) AS posting_md5
             |FROM tf GROUP BY term, block_id
             |ORDER BY term, block_id""".stripMargin)),

    // Q70 exact-span duplication coverage ----------------------------------
    // The Lee-et-al-style substring-dedup audit, train-vs-train (q56 is
    // the train-vs-benchmark twin): what fraction of each document's
    // word-8-gram positions is covered by a span that also occurs in some
    // OTHER document. Pipeline: per-doc span positions pre-aggregate to
    // (doc, span, n_pos) — bounded by the doc's own length; the one
    // corpus-sized shuffle is the span-frequency groupBy (partial-agg,
    // keyed on span content — no single hot key unless the corpus IS the
    // duplicate); docs then re-join the span table on the same key. At
    // 100 TB the span table is the dedup index a suffix-array pipeline
    // would shard by span hash — this is that exact layout.
    QueryDef("q70_span_coverage",
      (s, d) => {
        val n = 8
        val toks = t(s, d, "documents")
          .withColumn("toks", split(col("text"), " "))
        val len = greatest(size(col("toks")) - (n - 1), lit(0))
        val sliced = (1 to n).foldLeft(toks)((acc, k) =>
          acc.withColumn(s"s$k", slice(col("toks"), lit(k), len)))
        // materialized ONCE (flat-stats checkpoint): both consumers — the
        // span-frequency groupBy and the coverage join — scan this, instead
        // of each re-deriving the corpus-sized shingle explode (Catalyst
        // cannot reuse the subtree: column pruning makes the two branches'
        // aggregates structurally different, so ReuseExchange never fires
        // and the explode would run twice)
        val spans = org.apache.spark.sql.execution.GraftCheckpoint
          .localCheckpointFlatStats(sliced
            .select(col("doc_id"),
              explode(arrays_zip((1 to n).map(k => col(s"s$k")): _*)).as("z"))
            .select(col("doc_id"),
              concat_ws(" ", (1 to n).map(k => col(s"z.s$k")): _*).as("span"))
            .groupBy("doc_id", "span").agg(count(lit(1)).as("n_pos")))
        // span -> number of DISTINCT docs containing it (input is already
        // one row per (doc, span), so a plain count is the distinct count)
        val freq = spans.groupBy("span")
          .agg(count(lit(1)).as("span_df"))
        spans.join(freq, "span")
          .groupBy("doc_id")
          .agg(
            sum(col("n_pos")).as("n_spans"),
            sum(when(col("span_df") >= 2, col("n_pos")).otherwise(lit(0L)))
              .as("n_dup_spans"))
          .withColumn("dup_coverage",
            r4(col("n_dup_spans").cast(DoubleType) / col("n_spans")))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (SELECT doc_id, w,
             |    unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i
             |  FROM tk),
             |sp AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS span,
             |    COUNT(*) AS n_pos
             |  FROM idx GROUP BY doc_id, span),
             |freq AS (SELECT span, COUNT(*) AS span_df FROM sp GROUP BY span)
             |SELECT s.doc_id,
             |  CAST(SUM(s.n_pos) AS BIGINT) AS n_spans,
             |  CAST(SUM(CASE WHEN f.span_df >= 2 THEN s.n_pos ELSE 0 END)
             |    AS BIGINT) AS n_dup_spans,
             |  CAST(ROUND(CAST(SUM(CASE WHEN f.span_df >= 2 THEN s.n_pos
             |      ELSE 0 END) AS DOUBLE) / SUM(s.n_pos), 4) AS DOUBLE)
             |    AS dup_coverage
             |FROM sp s JOIN freq f ON s.span = f.span
             |GROUP BY s.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // Q112 exact-span dedup REMOVAL (r12) ----------------------------------
    // q70 AUDITS duplicated-substring coverage; this executes the Lee et
    // al. remover: every token position covered by a word-8-gram that
    // also occurs in a LOWER-id document is dropped, the span's minimum
    // owner keeps its copy (one surviving occurrence per duplicated span
    // chain — canonical-keeper, cross-doc only; within-doc repeats are
    // q58's subject). Output pins the rewrite exactly: token counts plus
    // the md5 of the reconstructed text.
    //
    // Scale shape: the positioned gram stream materializes once
    // (flat-stats checkpoint, q70's lesson); span ownership is ONE
    // content-keyed partial-agg shuffle (q94's shape — min + count over
    // distinct (doc, span) pairs); the mark join is keyed on the span
    // (a boilerplate span shared by 10^6 docs is one stats row joined
    // against many gram rows — AQE's skew split handles the fat
    // partition, and no pair stream exists anywhere); the removal
    // positions explode 8x from marked grams only; reconstruction is
    // q94's per-doc sorted collect_list. Every exchange is keyed on
    // doc_id or span content — nothing quadratic, nothing all-pairs.
    QueryDef("q112_span_dedup",
      (s, d) => {
        val n = 8
        val toks = t(s, d, "documents")
          .withColumn("toks", split(col("text"), " "))
        val len = greatest(size(col("toks")) - (n - 1), lit(0))
        val sliced = (1 to n).foldLeft(toks)((acc, k) =>
          acc.withColumn(s"s$k", slice(col("toks"), lit(k), len)))
        val grams = org.apache.spark.sql.execution.GraftCheckpoint
          .localCheckpointFlatStats(sliced
            .select(col("doc_id"), posexplode(
              arrays_zip((1 to n).map(k => col(s"s$k")): _*)).as(Seq("p0", "z")))
            .select(col("doc_id"), (col("p0") + 1).as("i"),
              concat_ws(" ", (1 to n).map(k => col(s"z.s$k")): _*).as("span")))
        val owners = grams.select("doc_id", "span").distinct()
          .groupBy("span")
          .agg(min(col("doc_id")).as("owner"), count(lit(1)).as("n_docs"))
        val removed = grams.join(owners, "span")
          .filter(col("n_docs") >= 2 && col("doc_id") > col("owner"))
          .select(col("doc_id"),
            explode(sequence(col("i"), col("i") + (n - 1))).as("pos"))
          .distinct()
        val positions = toks
          .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "w")))
          .select(col("doc_id"), (col("p0") + 1).as("pos"), col("w"))
        val rebuilt = positions
          .join(removed, Seq("doc_id", "pos"), "left_anti")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
            array_join(transform(
              array_sort(collect_list(struct(col("pos"), col("w")))),
              x => x.getField("w")), " ").as("clean"))
        toks.select(col("doc_id"),
            size(col("toks")).cast(LongType).as("n_tokens"))
          .join(rebuilt, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
              .as("n_removed"),
            md5(coalesce(col("clean"), lit(""))).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (SELECT doc_id, w,
             |    unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i
             |  FROM tk),
             |g AS (SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS span
             |  FROM idx),
             |own AS (SELECT span, MIN(doc_id) AS owner,
             |    COUNT(DISTINCT doc_id) AS n_docs FROM g GROUP BY span),
             |rm0 AS (SELECT g.doc_id,
             |    unnest(generate_series(g.i, g.i + 7)) AS pos
             |  FROM g JOIN own ON own.span = g.span
             |  WHERE own.n_docs >= 2 AND g.doc_id > own.owner),
             |rm AS (SELECT DISTINCT doc_id, pos FROM rm0),
             |pos_tab AS (SELECT doc_id,
             |    unnest(generate_series(1, len(w))) AS pos, unnest(w) AS tok
             |  FROM tk),
             |kept AS (SELECT p.doc_id, p.pos, p.tok FROM pos_tab p
             |  WHERE NOT EXISTS (SELECT 1 FROM rm
             |    WHERE rm.doc_id = p.doc_id AND rm.pos = p.pos)),
             |rebuilt AS (SELECT doc_id, COUNT(*) AS n_kept,
             |    string_agg(tok, ' ' ORDER BY pos) AS clean
             |  FROM kept GROUP BY doc_id)
             |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
             |  CAST(len(t.w) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
             |  md5(COALESCE(r.clean, '')) AS clean_md5
             |FROM tk t LEFT JOIN rebuilt r USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Q83 vocabulary KL-divergence drift audit ------------------------------
    // Distribution-shift monitoring between a corpus slice and the rest
    // (the check a curation pipeline runs when a new crawl lands, and the
    // corpus-level dual of q72's per-document DSIR score): add-1-smoothed
    // unigram distributions for src0 vs the remainder, per-token KL
    // contribution p*ln(p/q), top-20 drivers reported in micro-nats
    // (ROUND(4) on raw nats would flatten ~1e-3 contributions into ties).
    // Shape at 100 TB: ONE corpus-sized shuffle (the token groupBy, with
    // both slice counts partial-aggregated in the same pass), scalar
    // totals as a one-row broadcast, TakeOrderedAndProject for the top-k
    // — never a global sort. Ordering is on the ROUNDED value (+ token
    // tie-break) so both engines rank identical doubles.
    QueryDef("q83_vocab_kl",
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
        val counts = toks.groupBy("token").agg(
          count(lit(1)).as("c_all"),
          sum(when(col("source") === DsirTarget, 1L).otherwise(0L))
            .as("c_tgt"))
          .withColumn("c_rest", col("c_all") - col("c_tgt"))
        val totals = counts.agg(
          sum(col("c_tgt")).as("t_total"),
          sum(col("c_rest")).as("r_total"),
          count(lit(1)).as("v"))
        counts.crossJoin(graft.BroadcastBounds.bounded("scalar-agg")(totals))
          .withColumn("p", (col("c_tgt") + 1).cast(DoubleType)
            / (col("t_total") + col("v")).cast(DoubleType))
          .withColumn("q", (col("c_rest") + 1).cast(DoubleType)
            / (col("r_total") + col("v")).cast(DoubleType))
          .select(col("token"), col("c_tgt"), col("c_rest"),
            r4(lit(1e6) * col("p") * log(col("p") / col("q")))
              .as("kl_unats"))
          .orderBy(col("kl_unats").desc, col("token"))
          .limit(20)
      },
      Some(s"""WITH tok AS (SELECT source,
             |    unnest(string_split(text, ' ')) AS token FROM documents),
             |counts AS (SELECT token, COUNT(*) AS c_all,
             |    CAST(SUM(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c_tgt
             |  FROM tok WHERE token <> '' GROUP BY token),
             |c2 AS (SELECT token, c_tgt, c_all - c_tgt AS c_rest FROM counts),
             |tot AS (SELECT CAST(SUM(c_tgt) AS BIGINT) AS t_total,
             |    CAST(SUM(c_rest) AS BIGINT) AS r_total,
             |    COUNT(*) AS v FROM c2),
             |sc AS (SELECT token, c_tgt, c_rest,
             |    CAST(c_tgt + 1 AS DOUBLE) / (t_total + v) AS p,
             |    CAST(c_rest + 1 AS DOUBLE) / (r_total + v) AS q
             |  FROM c2 CROSS JOIN tot)
             |SELECT token, c_tgt, c_rest,
             |  CAST(ROUND(1e6 * p * ln(p / q), 4) AS DOUBLE) AS kl_unats
             |FROM sc ORDER BY kl_unats DESC, token LIMIT 20""".stripMargin)),

    // Q72 DSIR importance-based data selection ----------------------------
    // Data Selection via Importance Resampling (Xie et al. 2023): score
    // every document by the log likelihood ratio of an in-domain target
    // model over the raw-corpus model on hashed n-gram features, keep the
    // top-scoring docs. Here features are word bigrams (q52's lambda-free
    // slice+arrays_zip stream), the target is the src0 slice (the
    // in-domain proxy), and both models are add-1-smoothed bigram
    // frequencies. Shape at 100 TB: two feature-table groupBys (partial
    // agg, vocab^2-bounded output), scalar totals attached as one-row
    // broadcast aggregates (q63's pattern), ONE join of the per-position
    // stream to the broadcast-able feature table, per-doc partial-agg sum,
    // and TakeOrderedAndProject for the top-k — never a global sort.
    // Determinism: each position's log-ratio routes through DECIMAL(18,4)
    // before the exact cross-position sum (the q52 ln-ULP pattern).
    // Docs with no bigram (single-token) carry no evidence and are not
    // ranked — the inner join drops them, matching the oracle.
    QueryDef("q72_dsir_selection",
      (s, d) => {
        val bg = t(s, d, "documents")
          .withColumn("toks", split(col("text"), " "))
          .withColumn("h", slice(col("toks"), lit(1), size(col("toks")) - 1))
          .withColumn("t2", slice(col("toks"), lit(2), size(col("toks")) - 1))
          .select(col("doc_id"), col("source"),
            explode(arrays_zip(col("h"), col("t2"))).as("z"))
          .select(col("doc_id"), col("source"),
            col("z.h").as("w1"), col("z.t2").as("w2"))
        val allC = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_all"))
        val tgtC = bg.filter(col("source") === DsirTarget)
          .groupBy("w1", "w2").agg(count(lit(1)).as("c_tgt"))
        val feats = allC.join(tgtC, Seq("w1", "w2"), "left")
          .withColumn("c_tgt", coalesce(col("c_tgt"), lit(0L)))
        val totals = feats.agg(
          sum(col("c_tgt")).as("t_total"),
          sum(col("c_all")).as("r_total"),
          count(lit(1)).as("v_feats"))
        val scored = feats.crossJoin(
          graft.BroadcastBounds.bounded("scalar-agg")(totals))
          .withColumn("lr", dec18(
            log((col("c_tgt") + 1).cast(DoubleType)
              / (col("t_total") + col("v_feats")).cast(DoubleType))
              - log((col("c_all") + 1).cast(DoubleType)
                / (col("r_total") + col("v_feats")).cast(DoubleType))))
          .select(col("w1"), col("w2"), col("lr"))
        bg.join(scored, Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast(IntegerType).as("n_features"),
            r4(sum(col("lr"))).as("dsir_score"))
          .orderBy(col("dsir_score").desc, col("doc_id"))
          .limit(DsirK)
      },
      Some(s"""WITH tk AS (SELECT doc_id, source,
             |    string_split(text, ' ') AS w FROM documents),
             |bg AS (SELECT doc_id, source, UNNEST(list_transform(
             |    generate_series(1, greatest(len(w) - 1, 0)),
             |    i -> w[i] || chr(1) || w[i+1])) AS f
             |  FROM tk),
             |ac AS (SELECT f, COUNT(*) AS c_all FROM bg GROUP BY f),
             |tc AS (SELECT f, COUNT(*) AS c_tgt FROM bg
             |       WHERE source = '$DsirTarget' GROUP BY f),
             |feats AS (SELECT ac.f, ac.c_all, COALESCE(tc.c_tgt, 0) AS c_tgt
             |  FROM ac LEFT JOIN tc ON ac.f = tc.f),
             |tot AS (SELECT SUM(c_tgt) AS t_total, SUM(c_all) AS r_total,
             |    COUNT(*) AS v_feats FROM feats),
             |lr AS (SELECT f, CAST(
             |    ln(CAST(c_tgt + 1 AS DOUBLE) / (t_total + v_feats))
             |    - ln(CAST(c_all + 1 AS DOUBLE) / (r_total + v_feats))
             |    AS DECIMAL(18,4)) AS lr
             |  FROM feats CROSS JOIN tot)
             |SELECT b.doc_id,
             |  CAST(COUNT(*) AS INT) AS n_features,
             |  CAST(ROUND(SUM(l.lr), 4) AS DOUBLE) AS dsir_score
             |FROM bg b JOIN lr l ON b.f = l.f
             |GROUP BY b.doc_id
             |ORDER BY dsir_score DESC, doc_id LIMIT $DsirK""".stripMargin)),

    // Q91 model-based quality classifier -----------------------------------
    // The "trained-classifier filter" stage of an LLM pipeline (fastText /
    // logistic quality models): a linear model over per-doc features with
    // the WEIGHTS AS PLAN LITERALS — the expression equivalent of a
    // broadcast model, same pattern as q71's merge table and q80's
    // centroids. Two determinism choices make it oracle-hashable:
    // (a) the sigmoid is the ALGEBRAIC form 0.5*(1 + z/(1+|z|)) — pure
    // +,-,*,/,abs, bit-identical across engines, where exp-based
    // logistic drifts by libm ulps; (b) the linear term is written in
    // the identical left-associated order on both sides (double + is not
    // associative). Per-row arithmetic only — no shuffle before the
    // output sort; the 100 TB shape is scan-bandwidth-bound like q67,
    // and swapping in real trained weights changes literals, not shape.
    QueryDef("q91_quality_classifier",
      (s, d) => {
        val stop = Seq("a", "the", "of", "to", "in", "is", "on", "and")
        val base = t(s, d, "documents")
          .withColumn("toks", split(col("text"), " "))
          .withColumn("ntoks", size(col("toks")).cast(DoubleType))
          .withColumn("uniq",
            size(array_distinct(col("toks"))).cast(DoubleType) / col("ntoks"))
          .withColumn("stp",
            size(filter(col("toks"), x => x.isin(stop: _*)))
              .cast(DoubleType) / col("ntoks"))
          .withColumn("mlen",
            col("n_chars").cast(DoubleType) / col("ntoks"))
        base
          .withColumn("z",
            lit(-0.5) + lit(0.02) * col("ntoks") + lit(2.0) * col("uniq")
              + lit(3.0) * col("stp") - lit(0.35) * col("mlen"))
          .select(col("doc_id"),
            f4(lit(0.5) * (lit(1.0) + col("z") / (lit(1.0) + abs(col("z")))))
              .as("quality"))
          .withColumn("kept", col("quality") >= 0.55)
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, n_chars,
             |    string_split(text, ' ') AS toks FROM documents),
             |f AS (SELECT doc_id,
             |    CAST(len(toks) AS DOUBLE) AS ntoks,
             |    CAST(len(list_distinct(toks)) AS DOUBLE)
             |      / CAST(len(toks) AS DOUBLE) AS uniq,
             |    CAST(len(list_filter(toks, x ->
             |        x IN ('a','the','of','to','in','is','on','and')))
             |      AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stp,
             |    CAST(n_chars AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mlen
             |  FROM tk),
             |z AS (SELECT doc_id,
             |    ((((-0.5 + 0.02 * ntoks) + 2.0 * uniq) + 3.0 * stp)
             |      - 0.35 * mlen) AS z FROM f),
             |s AS (SELECT doc_id,
             |    ${F4("0.5 * (1.0 + z / (1.0 + ABS(z)))")} AS quality FROM z)
             |SELECT doc_id, quality, quality >= 0.55 AS kept
             |FROM s ORDER BY doc_id""".stripMargin)),

    // Q94 C4-style line-level dedup ---------------------------------------
    // The boilerplate-removal pass of C4/RefinedWeb/Dolma: any LINE whose
    // corpus-wide frequency reaches 3 is dropped from every document, and
    // the document is reconstructed from its surviving lines. The corpus
    // has no newlines, so a "line" is a 10-word pseudo-line (same slicing
    // idiom as q64), and — as with q67's PII stamps — deterministic
    // boilerplate (a cookie banner, a newsletter plug; both exactly 10
    // words so chunk boundaries stay aligned) is stamped into subsets of
    // docs first, so the dedup pass has real duplicates to find.
    //
    // Scale shape (the 100 TB story): ONE content shuffle — the line-
    // frequency groupBy on a 16-byte md5 key (identical to exact dedup's
    // q30 shuffle) — materialized once (checkpoint), then the duplicated-
    // line set (df >= 3) is MEASURED and broadcast back only while its
    // cardinality fits the gate; the corpus side is never reshuffled. At
    // web scale the boilerplate set is tiny relative to the line set
    // (that's what makes it boilerplate), but its cardinality is corpus-
    // dependent and unbounded adversarially (r8 verdict), so the hint is
    // applied off a MEASURED count, the measurement is reported (spec-
    // pinned via dupSetWithStats; q94's own row count is the oracle-side
    // audit), and past the cap the same plan degrades to a shuffle join
    // on the already-narrow lh key by dropping the hint.
    QueryDef("q94_line_dedup",
      (s, d) => {
        val lines = q94Lines(s, d)
        val (dup, dupRows, estBytes) = dupSetWithStats(lines)
        val useBroadcast = dupRows <= dupBroadcastMaxRows(s)
        lastDupSetStats.set((dupRows, estBytes, useBroadcast))
        if (!useBroadcast)
          System.err.println(s"[graft] q94 dup set over broadcast gate " +
            s"($dupRows rows ~ $estBytes B): falling back to lh-key shuffle")
        val dupHinted =
          if (useBroadcast) graft.BroadcastBounds.bounded("dup-set-gated")(dup)
          else dup
        lines.join(dupHinted, Seq("lh"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dropped"),
            expr("""md5(concat_ws(' ', transform(array_sort(
                   |  collect_list(CASE WHEN is_dup IS NULL
                   |               THEN struct(li, line) END)),
                   |  x -> x.line)))""".stripMargin).as("kept_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH st AS (SELECT doc_id,
             |    (CASE WHEN doc_id % 4 = 0 THEN
             |      'please accept all cookies to continue reading this site '
             |      ELSE '' END) ||
             |    (CASE WHEN doc_id % 7 = 0 THEN
             |      'subscribe to our newsletter for daily updates and offers '
             |      ELSE '' END) || text AS stamped
             |  FROM documents),
             |w AS (SELECT doc_id, string_split(stamped, ' ') AS words,
             |    len(string_split(stamped, ' ')) AS nw FROM st),
             |ix AS (SELECT doc_id, words,
             |    unnest(generate_series(0, (nw - 1) // 10)) AS li FROM w),
             |ln AS (SELECT doc_id, li,
             |    array_to_string(words[li * 10 + 1 : li * 10 + 10], ' ')
             |      AS line FROM ix),
             |f AS (SELECT md5(line) AS lh, COUNT(*) AS df FROM ln GROUP BY 1),
             |dup AS (SELECT lh FROM f WHERE df >= 3),
             |j AS (SELECT ln.doc_id, ln.li, ln.line,
             |    dup.lh IS NOT NULL AS is_dup
             |  FROM ln LEFT JOIN dup ON md5(ln.line) = dup.lh)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
             |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_dropped,
             |  MD5(COALESCE(string_agg(CASE WHEN NOT is_dup THEN line END,
             |    ' ' ORDER BY li), '')) AS kept_md5
             |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )
}
