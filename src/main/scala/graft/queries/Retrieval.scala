package graft.queries

import graft.{Q, QueryDef}
import graft.Q._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Retrieval / tokenizer-training side of the LLM-pipeline surface: BM25
  * ranking, RAG chunking, temperature mixing weights, BPE pair counting.
  *
  * Determinism rules follow the repo conventions: integer arithmetic and
  * md5 wherever possible; each floating term routed through DECIMAL(18,4)
  * before any cross-row sum (the q52 pattern — absorbs ln/× ULP drift
  * between engines); sqrt (IEEE-exact in both engines) preferred over pow.
  */
object Retrieval {

  /** BM25 query terms: one rare discriminator ("dup", df≈5% of docs) and
    * two common terms — exercises the idf spread on the synthetic vocab. */
  val Bm25Terms: Seq[String] = Seq("dup", "join", "spark")
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** RAG chunk geometry: 32-token chunks, stride 24 (8-token overlap). */
  val ChunkLen = 32
  val ChunkStride = 24

  /** Q71 merge-table size. Small on purpose: the synthetic vocabulary is
    * ~31 words, so 20 merges already produce multi-char subwords without
    * collapsing every word to a single token (which would make the
    * encoding path trivially word-identity). */
  val BpeMerges = 20

  /** Cap on the word->count vocabulary the BPE trainer pulls to the driver.
    * Web-scale text has a heavy-tailed unicode word distribution — the
    * distinct-"word" set grows to 10^8-10^9 at 100 TB, so an unbounded
    * collect is a driver OOM. Production trainers bound the training
    * vocabulary the same way (GPT-2's BPE trains on ~most-frequent words;
    * tail hapaxes contribute ~nothing to pair counts). 2^18 words x ~30
    * bytes is ~8 MB on the driver — safe — while at the test SFs the
    * distinct-word count is far below the cap, so training is unchanged.
    */
  val BpeTrainVocabCap = 262144

  private def toks(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    t(s, d, "documents").withColumn("toks", split(col("text"), " "))

  /** DuckDB twin of [[bm25Scores]] as a CTE chain ending in `sc` =
    * (doc_id, score) — shared by the q63 and q119 oracles. */
  private val BM25_SQL_CTES: String = {
    val tfDefs = Bm25Terms.map(t0 =>
      s"CAST(len(list_filter(toks, x -> x = '$t0')) AS DOUBLE) AS tf_$t0")
      .mkString(",\n  ")
    val dfDefs = Bm25Terms.map(t0 =>
      s"CAST(SUM(CASE WHEN tf_$t0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t0")
      .mkString(",\n  ")
    val contribs = Bm25Terms.map(t0 =>
      s"""CAST(ln(CAST(1.0 AS DOUBLE) + (n_docs - df_$t0 + CAST(0.5 AS DOUBLE))
         |      / (df_$t0 + CAST(0.5 AS DOUBLE)))
         |    * (tf_$t0 * CAST(${Bm25K1 + 1.0} AS DOUBLE)
         |      / (tf_$t0 + CAST($Bm25K1 AS DOUBLE) * (CAST(${1.0 - Bm25B} AS DOUBLE)
         |        + CAST($Bm25B AS DOUBLE) * CAST(dl AS DOUBLE) / avgdl)))
         |    AS DECIMAL(18,4))""".stripMargin)
      .mkString("\n  + ")
    s"""tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |dd AS (SELECT doc_id, len(toks) AS dl,
       |  $tfDefs
       |  FROM tk),
       |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
       |  CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) / COUNT(*) AS avgdl FROM dd),
       |df AS (SELECT
       |  $dfDefs
       |  FROM dd),
       |sc AS (SELECT doc_id, CAST(ROUND(
       |  $contribs, 4) AS DOUBLE) AS score
       |  FROM dd CROSS JOIN st CROSS JOIN df)""".stripMargin
  }

  /** The Okapi BM25 scorer over the fixed query terms: (doc_id, score)
    * for every doc with a positive score — q63's body, shared with the
    * q119 hybrid fusion. Corpus stats are two tiny broadcast
    * aggregates; scoring is a pure per-doc map. */
  private def bm25Scores(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val base = toks(s, d).withColumn("dl", size(col("toks")))
    val withTf = Bm25Terms.foldLeft(base) { (df, t0) =>
      df.withColumn(s"tf_$t0",
        size(filter(col("toks"), x => x === t0)).cast(DoubleType))
    }
    val stats = graft.BroadcastBounds.bounded("scalar-agg")(withTf.agg(
      count(lit(1)).cast(DoubleType).as("n_docs"),
      (sum(col("dl").cast(LongType)).cast(DoubleType)
        / count(lit(1))).as("avgdl")))
    val dfs = graft.BroadcastBounds.bounded("scalar-agg")(withTf.agg(
      Bm25Terms.map(t0 => sum(when(col(s"tf_$t0") > 0, 1L).otherwise(0L))
        .cast(DoubleType).as(s"df_$t0")).head,
      Bm25Terms.map(t0 => sum(when(col(s"tf_$t0") > 0, 1L).otherwise(0L))
        .cast(DoubleType).as(s"df_$t0")).tail: _*))
    val contrib: String => Column = t0 => dec18(
      log(lit(1.0) + (col("n_docs") - col(s"df_$t0") + lit(0.5))
        / (col(s"df_$t0") + lit(0.5)))
        * (col(s"tf_$t0") * lit(Bm25K1 + 1.0)
          / (col(s"tf_$t0") + lit(Bm25K1) * (lit(1.0 - Bm25B)
            + lit(Bm25B) * col("dl").cast(DoubleType) / col("avgdl")))))
    withTf.crossJoin(stats).crossJoin(dfs)
      .withColumn("score",
        r4(Bm25Terms.map(contrib).reduce(_ + _)))
      .filter(col("score") > 0)
      .select(col("doc_id"), col("score"))
  }

  /** q119's fused hybrid candidates (top-10 by RRF over the BM25 +
    * dense-cosine arms), shared with q122's reranker. Each arm computes
    * its top-20 distributedly (TakeOrderedAndProject — no global window
    * over the corpus; the rank window runs on the 20 surviving rows);
    * the fusion is a 20x20 full-outer join of two driver-scale frames.
    * Doc ids double as vec ids (the corpus contract); id 0 is the query
    * and is excluded from both arms. */
  private def hybridFused(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    val lex = bm25Scores(s, d).filter(col("doc_id") =!= 0)
      .orderBy(col("score").desc, col("doc_id")).limit(20)
      .withColumn("lex_rank", row_number().over(rankW))
      .select(col("doc_id"), col("lex_rank"))
    val e = t(s, d, "embeddings").filter(col("embedding").isNotNull)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    val dense = e.filter(col("vec_id") =!= 0)
      .crossJoin(graft.BroadcastBounds.bounded("single-query-probe")(q))
      .select(col("vec_id").as("doc_id"),
        r4(expr("cosine_sim(embedding, qe)")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(20)
      .withColumn("dense_rank", row_number().over(rankW))
      .select(col("doc_id"), col("dense_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf", r4(
        coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + col("dense_rank")),
            lit(0.0))))
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
  }

  /** DuckDB twin of [[hybridFused]]: a CTE chain ending in `fused` =
    * (doc_id, lex_rank, dense_rank, rrf), top-10 — shared by the q119
    * and q122 oracles. */
  private val HYBRID_SQL_CTES: String =
    s"""$BM25_SQL_CTES,
       |lex AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
       |      ORDER BY score DESC, doc_id) AS INT) AS lex_rank
       |  FROM sc WHERE score > 0 AND doc_id <> 0
       |  ORDER BY score DESC, doc_id LIMIT 20),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |dsc AS (SELECT c.vec_id AS doc_id,
       |    CAST(ROUND(list_cosine_similarity(
       |      CAST(c.embedding AS DOUBLE[]),
       |      CAST(q.qe AS DOUBLE[])), 4) AS DOUBLE) AS score
       |  FROM embeddings c, q
       |  WHERE c.vec_id <> 0 AND c.embedding IS NOT NULL),
       |den AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
       |      ORDER BY score DESC, doc_id) AS INT) AS dense_rank
       |  FROM dsc ORDER BY score DESC, doc_id LIMIT 20),
       |fused AS (SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id,
       |  l.lex_rank, r.dense_rank,
       |  CAST(ROUND(COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.lex_rank), 0)
       |    + COALESCE(CAST(1.0 AS DOUBLE) / (60 + r.dense_rank), 0), 4)
       |    AS DOUBLE)
       |    AS rrf
       |FROM lex l FULL OUTER JOIN den r ON l.doc_id = r.doc_id
       |ORDER BY rrf DESC, doc_id LIMIT 10)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Q63 BM25 scoring (Okapi, k1=1.2 b=0.75) ------------------------------
    // The retrieval scorer of a RAG / data-curation stack. Corpus stats
    // (N, avgdl, per-term df) are two tiny aggregates broadcast back —
    // at 100 TB the only shuffle is the partial-agg of 1+|terms| counters;
    // scoring is then a pure per-doc map. Each term's contribution
    // idf*tf_norm goes through DECIMAL(18,4) before the (exact, decimal)
    // cross-term sum, so ln()'s 1-ulp library drift cannot flip the hash.
    QueryDef("q63_bm25",
      (s, d) => bm25Scores(s, d)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20),
      Some(s"""WITH $BM25_SQL_CTES
           |SELECT doc_id, score FROM sc WHERE score > 0
           |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // Q64 RAG chunking (overlapping token windows) -------------------------
    // Splits every document into ChunkLen-token chunks at ChunkStride
    // spacing (the standard retrieval-index prep). Pure per-doc explode —
    // embarrassingly parallel, output ~nt/stride rows per doc. The chunk
    // md5 pins the exact text reassembly (joins, slicing, 1-based offsets)
    // across engines, not just the counts.
    QueryDef("q64_rag_chunking",
      (s, d) => {
        val nChunks = expr(s"(nt - 1) div $ChunkStride") // starts: 0..nChunks
        toks(s, d).withColumn("nt", size(col("toks")))
          .withColumn("ci", explode(sequence(lit(0), nChunks)))
          .withColumn("chunk",
            slice(col("toks"), col("ci") * ChunkStride + 1, lit(ChunkLen)))
          .select(col("doc_id"), col("ci").cast(IntegerType).as("chunk_idx"),
            size(col("chunk")).cast(IntegerType).as("chunk_toks"),
            md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks,
             |    len(string_split(text, ' ')) AS nt FROM documents),
             |c AS (SELECT doc_id, toks,
             |    unnest(generate_series(0, (nt - 1) // $ChunkStride)) AS ci
             |  FROM tk)
             |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
             |  CAST(len(toks[ci * $ChunkStride + 1 : ci * $ChunkStride + $ChunkLen])
             |    AS INT) AS chunk_toks,
             |  MD5(array_to_string(
             |    toks[ci * $ChunkStride + 1 : ci * $ChunkStride + $ChunkLen], ' '))
             |    AS chunk_md5
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Q65 temperature mixing weights --------------------------------------
    // Per-(source, lang) sampling weights w_i ∝ tokens_i^0.5 — the standard
    // temperature-flattened mixture (alpha = 1/2 chosen because sqrt is
    // correctly rounded in BOTH engines; pow() is not and its ULP drift
    // would sit one ROUND knife-edge away from the hash). One partial-agg
    // groupBy + a broadcast scalar total; sqrt values rounded to 4 BEFORE
    // the (exact decimal) normalizing sum.
    QueryDef("q65_mixing_weights",
      (s, d) => {
        val g = toks(s, d)
          .groupBy("source", "lang")
          .agg(sum(size(col("toks")).cast(LongType)).as("toks"))
          .withColumn("sq", r4(sqrt(col("toks").cast(DoubleType))))
        val tot = graft.BroadcastBounds.bounded("scalar-agg")(
          g.agg(sum(dec18(col("sq"))).as("tot")))
        g.crossJoin(tot)
          .select(col("source"), col("lang"), col("toks"),
            r4(col("sq") / col("tot").cast(DoubleType)).as("weight"))
          .orderBy("source", "lang")
      },
      Some("""WITH g AS (SELECT source, lang,
             |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
             |  FROM documents GROUP BY source, lang),
             |sq AS (SELECT source, lang, toks,
             |    CAST(ROUND(sqrt(CAST(toks AS DOUBLE)), 4) AS DOUBLE) AS sq
             |  FROM g),
             |tt AS (SELECT SUM(CAST(sq AS DECIMAL(18,4))) AS tot FROM sq)
             |SELECT source, lang, toks,
             |  CAST(ROUND(sq / CAST(tot AS DOUBLE), 4) AS DOUBLE) AS weight
             |FROM sq CROSS JOIN tt ORDER BY source, lang""".stripMargin)),

    // Q66 BPE pair counting (one merge round) ------------------------------
    // The inner loop of tokenizer training: frequency of every adjacent
    // character pair across the corpus. Scale-smart shape: aggregate to
    // the VOCABULARY first (word -> count, the only corpus-sized shuffle),
    // then expand each distinct word's pairs weighted by its count — the
    // pair explode runs over vocab-sized data, not the corpus, which is
    // the difference between 31 rows and 10^9 at 100 TB.
    QueryDef("q66_bpe_pairs",
      (s, d) => {
        val words = toks(s, d)
          .select(explode(col("toks")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("wn"))
        val pairs = when(length(col("w")) < 2,
          expr("CAST(array() AS ARRAY<STRING>)"))
          .otherwise(transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2))))
        words
          .withColumn("pair", explode(pairs))
          .groupBy("pair").agg(sum(col("wn")).as("n_pairs"))
          .orderBy(col("n_pairs").desc, col("pair"))
          .limit(30)
      },
      Some("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
             |wc AS (SELECT w, COUNT(*) AS wn FROM w GROUP BY w),
             |p AS (SELECT unnest(list_transform(
             |      generate_series(1, length(w) - 1),
             |      i -> substring(w, CAST(i AS INT), 2))) AS pair, wn
             |  FROM wc WHERE length(w) >= 2)
             |SELECT pair, CAST(SUM(wn) AS BIGINT) AS n_pairs
             |FROM p GROUP BY pair
             |ORDER BY n_pairs DESC, pair LIMIT 30""".stripMargin)),

    // Q71 BPE tokenizer: train + distributed encode (r7) -------------------
    // Completes the tokenizer loop q66 opens. Phase 1 (training) reduces
    // the corpus to its word->count vocabulary (the ONE corpus-sized
    // shuffle, partial-agg) and collects THAT — capped at BpeTrainVocabCap
    // rows by a TakeOrdered top-V (see the cap's scaladoc), the same
    // driver-side boundary every production BPE trainer draws — then runs
    // BpeMerges deterministic merge steps (ties -> lexicographically
    // smallest pair). Phase 2 (encoding) is the 100 TB hot path: the
    // trained table travels as a plan-time literal into the native codegen
    // `bpe_encode` expression (graft.functions.BpeEncode) and every doc
    // encodes at scan speed — per-doc arithmetic, no shuffle, no UDF
    // boxing. Output pins the full encoding (subword stream md5) per doc.
    // PROMOTED to a full hash oracle (r15): training's 20 merge steps
    // unroll as chained CTEs over a WRAPPED-STRING word representation
    // (''+sym+'' per symbol) where SQL replace() IS mergeAll
    // — left-to-right non-overlapping with symbol-boundary alignment and
    // correct adjacent-run semantics ("aaaa" -> aa,aa); encoding applies
    // the trained merges IN RANK ORDER as 20 nested replaces, which
    // equals the lowest-rank-present loop for a consistently-trained
    // table (each pair's constituents are products of strictly earlier
    // merges, so an exhausted pair can never rearise — the Sennrich
    // apply-in-order equivalence; BpeSpec pins expression == driver
    // encoder independently). Corpus is ASCII, so Scala's UTF-16 chars
    // == DuckDB's substr code points.
    QueryDef("q71_bpe_encode",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val vocab = toks(s, d)
          .select(explode(col("toks")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("wn"))
          // top-V cap (TakeOrderedAndProject: each partition ships at most
          // V rows, the driver merges V) bounds the collect at any corpus
          // size; deterministic tie-break on the word itself
          .orderBy(col("wn").desc, col("w"))
          .limit(BpeTrainVocabCap)
          .collect()
          .map(r => (r.getString(0), r.getLong(1)))
          .sortBy { case (w, n) => (-n, w) }
        val merges = graft.functions.BpeCodec.train(vocab.toSeq, BpeMerges)
        val mergesLit = graft.functions.BpeCodec.formatMerges(merges)
        toks(s, d)
          .withColumn("sub", expr(s"bpe_encode(toks, '$mergesLit')"))
          .select(col("doc_id"),
            size(filter(col("toks"), w => w =!= "")).cast(IntegerType)
              .as("n_words"),
            size(col("sub")).cast(IntegerType).as("n_subwords"),
            md5(concat_ws(" ", col("sub"))).as("subword_md5"))
          .orderBy("doc_id")
      },
      Some {
        val SEP = "\u001f" // US (unit separator): symbol-boundary marker, never in ASCII text
        def wrap(c: String) =
          s"""'$SEP' || array_to_string(list_transform(
             |      generate_series(1, length($c)), i -> substr($c, i, 1)),
             |      '$SEP$SEP') || '$SEP'""".stripMargin
        def step(k: Int) =
          s"""p$k AS MATERIALIZED (SELECT s.l[i.i] AS a, s.l[i.i+1] AS b,
             |    SUM(s.c) AS n
             |  FROM (SELECT str_split(trim(ws, '$SEP'), '$SEP$SEP') AS l, c
             |    FROM v${k - 1}) s
             |  CROSS JOIN UNNEST(generate_series(1, len(s.l) - 1)) AS i(i)
             |  GROUP BY 1, 2),
             |b$k AS MATERIALIZED (SELECT a, b,
             |    '$SEP' || a || '$SEP$SEP' || b || '$SEP' AS pat,
             |    '$SEP' || a || b || '$SEP' AS rep
             |  FROM p$k ORDER BY n DESC, a, b LIMIT 1),
             |v$k AS MATERIALIZED (SELECT replace(v.ws, b.pat, b.rep) AS ws,
             |    v.c
             |  FROM v${k - 1} v CROSS JOIN b$k b)""".stripMargin
        val steps = (1 to BpeMerges).map(step).mkString(",\n")
        val encExpr = (1 to BpeMerges).foldLeft("tw.ws0") { (e, k) =>
          s"replace($e, b$k.pat, b$k.rep)"
        }
        val crossB = (1 to BpeMerges).map(k => s"CROSS JOIN b$k")
          .mkString(" ")
        s"""WITH v0 AS MATERIALIZED (
           |  SELECT ${wrap("w")} AS ws, c FROM (
           |    SELECT w, COUNT(*) AS c FROM (
           |      SELECT UNNEST(string_split(text, ' ')) AS w
           |      FROM documents) t
           |    WHERE w <> '' GROUP BY w
           |    ORDER BY c DESC, w LIMIT $BpeTrainVocabCap) q),
           |$steps,
           |dw AS MATERIALIZED (SELECT d.doc_id, g.i AS widx,
           |    d.words[g.i] AS w, len(d.words) AS n_words
           |  FROM (SELECT doc_id,
           |      list_filter(string_split(text, ' '), w -> w <> '') AS words
           |    FROM documents) d
           |  CROSS JOIN UNNEST(generate_series(1, len(d.words))) AS g(i)),
           |ew AS MATERIALIZED (SELECT tw.doc_id, tw.widx, tw.n_words,
           |    str_split(trim($encExpr, '$SEP'), '$SEP$SEP') AS subs
           |  FROM (SELECT doc_id, widx, n_words, ${wrap("w")} AS ws0
           |    FROM dw) tw
           |  $crossB),
           |agg AS (SELECT doc_id, MAX(n_words) AS n_words,
           |    flatten(array_agg(subs ORDER BY widx)) AS subs
           |  FROM ew GROUP BY doc_id)
           |SELECT d.doc_id, CAST(COALESCE(a.n_words, 0) AS INT) AS n_words,
           |  CAST(COALESCE(len(a.subs), 0) AS INT) AS n_subwords,
           |  md5(COALESCE(array_to_string(a.subs, ' '), '')) AS subword_md5
           |FROM documents d LEFT JOIN agg a USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      }),

    // Q74 mixture draw: execute the temperature weights (r7) ---------------
    // Closes the mixing loop: q65 computes per-(source,lang) temperature
    // weights, q55 owns the deterministic salted-md5 gate — this operator
    // composes them into the actual corpus draw. Budget = corpus/5 docs;
    // stratum rate = min(1, budget * weight / stratum_docs), floored into
    // the same 10^4 gate domain q55 uses (floor, not cast: Spark truncates
    // double->long where DuckDB rounds — q55 dodged the knife edge with
    // exact products, a general rate cannot). The SAME gate salt as q55
    // is deliberate: every sampling operator draws nested subsets of one
    // reproducible permutation, so mixture draws compose with stratified
    // sampling instead of fighting it. Scale shape: weights/rates are a
    // stratum-sized broadcast; the gate is per-row arithmetic; the audit
    // partial-aggregates on (source, lang). Zero corpus shuffle before
    // the audit.
    QueryDef("q74_mixture_draw",
      (s, d) => {
        val docs = toks(s, d)
        val g = docs.groupBy("source", "lang")
          .agg(sum(size(col("toks")).cast(LongType)).as("tk"),
            count(lit(1)).as("n_docs"))
          .withColumn("sq", r4(sqrt(col("tk").cast(DoubleType))))
        val tot = graft.BroadcastBounds.bounded("scalar-agg")(
          g.agg(sum(dec18(col("sq"))).as("tot"),
          sum(col("n_docs")).as("nn")))
        val strata = g.crossJoin(tot)
          .withColumn("weight", r4(col("sq") / col("tot").cast(DoubleType)))
          .withColumn("target_rate", least(lit(1.0),
            expr("nn div 5").cast(DoubleType) * col("weight")
              / col("n_docs").cast(DoubleType)))
          .withColumn("thr",
            floor(col("target_rate") * 10000).cast(LongType))
          .select(col("source"), col("lang"), col("weight"),
            col("target_rate"), col("thr"))
        docs.join(graft.BroadcastBounds.bounded("strata-table")(strata),
            Seq("source", "lang"))
          .withColumn("keep", LlmOps.sampleGate < col("thr"))
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"),
            max(col("weight")).as("weight"),
            // f4, not r4: at sf0.001 the (src3, en) stratum's rate lands
            // exactly on 0.17375 — ROUND's decimal-vs-binary halfway
            // split (see Q.f4 scaladoc)
            f4(max(col("target_rate"))).as("target_rate"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            // plain BIGINT sum, not DECIMAL(38,0): one canonical rendering
            // in every engine (see q55's scaladoc in LlmOps)
            sum(when(col("keep"), col("doc_id")).otherwise(0L))
              .as("kept_id_checksum"))
          .orderBy("source", "lang")
      },
      Some("""WITH g AS (SELECT source, lang,
             |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tk,
             |    COUNT(*) AS n_docs
             |  FROM documents GROUP BY source, lang),
             |sq AS (SELECT source, lang, tk, n_docs,
             |    CAST(ROUND(sqrt(CAST(tk AS DOUBLE)), 4) AS DOUBLE) AS sq
             |  FROM g),
             |tt AS (SELECT SUM(CAST(sq AS DECIMAL(18,4))) AS tot,
             |    CAST(SUM(n_docs) AS BIGINT) AS nn FROM sq),
             |w AS (SELECT source, lang, n_docs,
             |    CAST(ROUND(sq / CAST(tot AS DOUBLE), 4) AS DOUBLE) AS weight,
             |    LEAST(1.0, CAST(nn // 5 AS DOUBLE)
             |      * CAST(ROUND(sq / CAST(tot AS DOUBLE), 4) AS DOUBLE)
             |      / n_docs) AS target_rate
             |  FROM sq CROSS JOIN tt),
             |thr AS (SELECT source, lang, weight, target_rate,
             |    CAST(floor(target_rate * 10000) AS BIGINT) AS thr FROM w),
             |k AS (SELECT d.source, d.lang, d.doc_id, t.weight,
             |    t.target_rate,
             |    CAST(list_sum(list_transform(generate_series(1, 8), i ->
             |      (strpos('0123456789abcdef',
             |         substr(md5('mix1|' || CAST(d.doc_id AS VARCHAR)), i, 1)) - 1)
             |        * CAST(16 ** (8 - i) AS BIGINT))) AS BIGINT) % 10000
             |      < t.thr AS keep
             |  FROM documents d JOIN thr t
             |    ON d.source = t.source AND d.lang = t.lang)
             |SELECT source, lang,
             |  COUNT(*) AS n_docs,
             |  MAX(weight) AS weight,
             |  CAST(FLOOR((MAX(target_rate)) * 10000 + 0.5) / 10000.0 AS DOUBLE) AS target_rate,
             |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(SUM(CASE WHEN keep THEN doc_id ELSE 0 END)
             |    AS BIGINT) AS kept_id_checksum
             |FROM k GROUP BY source, lang ORDER BY source, lang""".stripMargin)),

    // Q92 TF-IDF top terms per document ------------------------------------
    // Per-document sparse feature extraction (the representation BM25
    // scores against a query; this materializes it corpus-wide): tf from
    // one (doc, term) partial-agg groupBy, df from a second vocab-sized
    // groupBy over those DISTINCT (doc, term) rows (never re-scanning the
    // corpus), N as a one-row broadcast. Each score routes through
    // DECIMAL(18,4) before ranking (q63's ln-ulp absorption). Top-3 per
    // doc is a doc-partitioned ranked window — WindowGroupLimit bounds
    // each map task to 3 rows per doc before the exchange, so the rank
    // shuffle carries O(3*docs), not the full (doc, term) matrix.
    QueryDef("q92_tfidf_topterms",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tf = toks(s, d)
          .select(col("doc_id"), explode(col("toks")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = graft.BroadcastBounds.bounded("scalar-agg")(
          t(s, d, "documents").agg(count(lit(1)).as("n_docs")))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("s").desc, col("term"))
        tf.join(dfc, "term").crossJoin(n)
          .withColumn("s", dec18(col("tf").cast(DoubleType)
            * log(col("n_docs").cast(DoubleType) / col("df").cast(DoubleType))))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("term"),
            r4(col("s")).as("tfidf"), col("rk"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH tk AS (SELECT doc_id,
             |    string_split(text, ' ') AS toks FROM documents),
             |ex AS (SELECT doc_id, UNNEST(toks) AS term FROM tk),
             |tfc AS (SELECT doc_id, term, COUNT(*) AS tf
             |  FROM ex GROUP BY doc_id, term),
             |dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY term),
             |n AS (SELECT COUNT(*) AS n_docs FROM documents),
             |sc AS (SELECT doc_id, term,
             |    CAST(CAST(tf AS DOUBLE)
             |      * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
             |      AS DECIMAL(18,4)) AS s
             |  FROM tfc JOIN dfc USING (term) CROSS JOIN n),
             |rk AS (SELECT doc_id, term, s,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
             |      ORDER BY s DESC, term) AS INT) AS rk FROM sc)
             |SELECT doc_id, term, CAST(ROUND(s, 4) AS DOUBLE) AS tfidf, rk
             |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // Q119 HYBRID RETRIEVAL FUSION (r14): reciprocal rank fusion
    // (Cormack/Clarke/Buettcher RRF, k=60) of the stack's two retrieval
    // arms — the production RAG "hybrid search" pattern (lexical BM25 +
    // dense cosine, fused on RANK so neither arm's score scale needs
    // calibration). Each arm computes its top-20 DISTRIBUTEDLY
    // (TakeOrderedAndProject — no global window over the corpus; the
    // rank window runs on the 20 surviving rows), the fusion is a
    // 20x20 full-outer join of two driver-scale frames, and
    // rrf = sum over arms of 1/(60 + rank). Doc ids double as vec ids
    // (the corpus contract); id 0 is the query (its embedding is the
    // dense query) and is excluded from both arms. Integer-reciprocal
    // arithmetic summed in a fixed order is bit-identical across
    // engines; order + output both use the r4-rounded value so a
    // rounding collision cannot reorder rows differently per engine.
    QueryDef("q119_hybrid_rrf",
      (s, d) => hybridFused(s, d)
        .orderBy(col("rrf").desc, col("doc_id")),
      Some(s"""WITH $HYBRID_SQL_CTES
             |SELECT doc_id, lex_rank, dense_rank, rrf FROM fused
             |ORDER BY rrf DESC, doc_id""".stripMargin)),

    // Q122 CROSS-ENCODER RERANK (r14): the third stage of the production
    // retrieval pipeline (retrieve -> fuse -> rerank): q119's fused
    // candidates are re-scored by a query-document INTERACTION model —
    // features only computable with both sides in hand (query-term
    // coverage, earliest-match position, in-order adjacent-bigram hit,
    // dense similarity), combined under fixed literal weights (q91's
    // literal-model pattern standing in for learned cross-encoder
    // weights; the plumbing — candidate-bounded scoring, feature
    // extraction, rank diff — is the real thing). At 100 TB the cost
    // shape is the point: the interaction scoring touches ONLY the
    // candidate set (10 rows joined back to their documents/embeddings
    // through a broadcast), never the corpus — reranking cost is
    // O(candidates), independent of corpus size, which is why real
    // stacks afford an expensive model there. All feature arithmetic is
    // integer-derived or pre-rounded doubles, so both engines combine
    // identical IEEE values; the final mix goes through f4.
    QueryDef("q122_cross_encoder_rerank",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val fusedW = org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf").desc, col("doc_id"))
        val cand = graft.BroadcastBounds.bounded("rerank-candidates")(
          hybridFused(s, d)
            .withColumn("fused_rank",
              row_number().over(fusedW).cast(IntegerType))
            .select(col("doc_id"), col("rrf"), col("fused_rank")))
        val docs = toks(s, d).select(col("doc_id"), col("text"), col("toks"))
        val e = t(s, d, "embeddings").filter(col("embedding").isNotNull)
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        val Sentinel = 1000000L
        val cov = Bm25Terms.map(t0 =>
            when(array_contains(col("toks"), t0), 1).otherwise(0))
          .reduce(_ + _).cast(DoubleType) / lit(Bm25Terms.size.toDouble)
        val fp = least(Bm25Terms.map(t0 => coalesce(
          nullif(array_position(col("toks"), lit(t0)), lit(0L)),
          lit(Sentinel))): _*)
        val early = when(fp >= Sentinel, lit(0.0))
          .otherwise(lit(1.0) / (lit(1.0) + fp.cast(DoubleType)))
        val pad = concat(lit(" "), col("text"), lit(" "))
        val big = when(Bm25Terms.sliding(2).map(p =>
            locate(s" ${p.head} ${p.last} ", pad) > 0)
          .reduce(_ || _), lit(1.0)).otherwise(lit(0.0))
        val cosd = coalesce(r4(expr("cosine_sim(embedding, qe)")), lit(0.0))
        val scored = docs.join(cand, "doc_id")
          .join(e.select(col("vec_id").as("doc_id"), col("embedding")),
            Seq("doc_id"), "left")
          .crossJoin(graft.BroadcastBounds.bounded("single-query-probe")(q))
          .withColumn("cov", cov).withColumn("early", early)
          .withColumn("bigram", big).withColumn("cosd", cosd)
          .withColumn("ce_score", f4(lit(0.4) * col("cov")
            + lit(0.2) * col("early") + lit(0.15) * col("bigram")
            + lit(0.25) * col("cosd")))
        val ceW = org.apache.spark.sql.expressions.Window
          .orderBy(col("ce_score").desc, col("doc_id"))
        scored
          .withColumn("ce_rank", row_number().over(ceW).cast(IntegerType))
          .select(col("doc_id"), col("rrf"), col("fused_rank"),
            col("ce_score"), col("ce_rank"),
            (col("fused_rank") - col("ce_rank")).as("rank_delta"))
          .orderBy("ce_rank")
      },
      Some(s"""WITH $HYBRID_SQL_CTES,
             |cand AS (SELECT doc_id, rrf, CAST(ROW_NUMBER() OVER (
             |      ORDER BY rrf DESC, doc_id) AS INT) AS fused_rank
             |  FROM fused),
             |emb AS (SELECT vec_id, embedding FROM embeddings
             |  WHERE embedding IS NOT NULL),
             |qv AS (SELECT embedding AS qe FROM emb WHERE vec_id = 0),
             |ft AS (SELECT c.doc_id, c.rrf, c.fused_rank, d.text,
             |    string_split(d.text, ' ') AS toks
             |  FROM cand c JOIN documents d ON d.doc_id = c.doc_id),
             |fe AS (SELECT doc_id, rrf, fused_rank,
             |    CAST(${Bm25Terms.map(t0 =>
                    s"(CASE WHEN list_contains(toks, '$t0') THEN 1 ELSE 0 END)")
                    .mkString(" + ")} AS DOUBLE) / CAST(${Bm25Terms.size}.0 AS DOUBLE) AS cov,
             |    LEAST(${Bm25Terms.map(t0 =>
                    s"COALESCE(NULLIF(list_position(toks, '$t0'), 0), 1000000)")
                    .mkString(", ")}) AS fp,
             |    CASE WHEN ${Bm25Terms.sliding(2).map(p =>
                    s"position(' ${p.head} ${p.last} ' IN ' ' || text || ' ') > 0")
                    .mkString(" OR ")}
             |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
             |      AS bigram
             |  FROM ft),
             |sc2 AS (SELECT fe.doc_id, fe.rrf, fe.fused_rank,
             |    fe.cov,
             |    CASE WHEN fe.fp >= 1000000 THEN CAST(0.0 AS DOUBLE)
             |      ELSE CAST(1.0 AS DOUBLE)
             |        / (CAST(1.0 AS DOUBLE) + CAST(fe.fp AS DOUBLE)) END
             |      AS early,
             |    fe.bigram,
             |    COALESCE(CAST(ROUND(list_cosine_similarity(
             |        CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])),
             |      4) AS DOUBLE), CAST(0.0 AS DOUBLE)) AS cosd
             |  FROM fe LEFT JOIN emb e ON e.vec_id = fe.doc_id CROSS JOIN qv q),
             |fin AS (SELECT doc_id, rrf, fused_rank,
             |    ${F4("0.4 * cov + 0.2 * early + 0.15 * bigram + 0.25 * cosd")}
             |      AS ce_score
             |  FROM sc2)
             |SELECT doc_id, rrf, fused_rank, ce_score,
             |  CAST(ROW_NUMBER() OVER (ORDER BY ce_score DESC, doc_id) AS INT)
             |    AS ce_rank,
             |  fused_rank - CAST(ROW_NUMBER() OVER (
             |    ORDER BY ce_score DESC, doc_id) AS INT) AS rank_delta
             |FROM fin ORDER BY ce_rank""".stripMargin)))
}
