package graft.queries

import graft.{Q, QueryDef}
import graft.Q._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM-training-data pipeline operators over `documents` / `embeddings`:
  * exact + near dedup (MinHash-LSH, SimHash, n-gram Jaccard, embedding
  * cosine), similarity search, text profiling, fingerprinting.
  *
  * Spark-first: everything below is built-in `functions._` (codegen'd
  * higher-order array functions — no UDFs) except cosine similarity, which
  * is a custom codegen Catalyst Expression (graft.functions.CosineSimilarity)
  * because it is the 100TB-scale hot loop.
  */
object LlmOps {

  private def docsWithTokens(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").withColumn("toks", split(col("text"), " "))

  /** Q35/Q36 bucket-size cap: an LSH band bucket with k members naively
    * emits k(k-1)/2 candidate pairs — unbounded on a hot bucket (a near-dup
    * cluster that is half the corpus makes the band join quadratic in the
    * corpus). Buckets with more than this many members instead emit
    * anchor→member star edges (the bucket's MIN(doc_id) paired with every
    * other member): k-1 pairs. Total pair output is then bounded by
    * `bands × max(CAP, 2)/2` pairs per input row at ANY scale.
    *
    * Recall caveat: star edges preserve bucket connectivity only for
    * UNthresholded clustering (union-find over raw candidates yields the
    * same components as all-pairs). A consumer that filters pairs by
    * est_sim/hamming before clustering — the standard near-dup pipeline —
    * loses member↔member edges inside oversized buckets: in a bucket
    * {a, b, c} where b≈c but neither resembles anchor a, only the low-sim
    * (a,b),(a,c) edges are emitted and the high-sim (b,c) is dropped.
    * Oversized buckets are observable (with exact drop counts) via
    * q35b_lsh_bucket_stats; raise the cap or add bands where that recall
    * loss matters.
    */
  val LshBucketCap = 64

  /** Per-row 12-hash MinHash signature (see q35 notes): one md5 per distinct
    * token, hash family = 16-char rotations of the digest. Zero shuffle.
    * r5: the `minhash_sig` codegen expression
    * ([[graft.functions.TextSketch]]) computes all 12 minima in one pass
    * with no intermediate rotation strings — the Column-composed fold
    * (array_distinct -> md5 -> 12 substr windows -> zip_with least per
    * token) allocated ~13 strings per token on the corpus-scan hot path.
    * Arithmetic is declared bit-identical (TextSketchSpec pins it against
    * the old fold and the oracle's list_transform twin).
    */
  /** The 12-hash signature over a `toks` column — shared with the
    * streaming near-dup ingest (DocStream), which must compute the SAME
    * signature at stream time. Caller registers GraftFunctions. */
  private[graft] def minhashSigCol: Column = expr("minhash_sig(toks, 12)")

  /** q55's salted hash gate over `doc_id` (0..9999) — shared with
    * MixingSpec so the nested-sample contract test pins the PRODUCTION
    * gate, not a private copy that could drift. */
  private[graft] def sampleGate: Column = saltedGate("mix1|")

  /** The salted 32-bit doc hash underneath the whole sampling family
    * (q55/q60/q74/q88 gates + q113's rank key) — ONE formula, so the
    * specs pin the production arithmetic and a tweak (e.g. widening the
    * hex window) cannot drift one consumer away from the others. */
  private[graft] def saltedHash(salt: String): Column =
    conv(substring(md5(concat(lit(salt), col("doc_id"))), 1, 8), 16, 10)
      .cast(LongType)

  /** The same gate under any salt: independent salts give INDEPENDENT
    * reproducible draws (q88's split must not correlate with q55/q74's
    * sampling — a doc's chance of landing in `val` cannot depend on
    * whether the mixture draw kept it). */
  private[graft] def saltedGate(salt: String): Column =
    pmod(saltedHash(salt), lit(10000L))

  /** Releases a localCheckpoint'ed generation's blocks NOW — at corpus
    * scale, retained generations would otherwise sit in executor storage
    * until the async cleaner got to them. Dataset.unpersist is a NO-OP here
    * (it only reaches CacheManager entries, and localCheckpoint persists
    * its RDD directly), so unpersist the underlying checkpointed RDD off
    * the analyzed plan. Only safe once nothing references the generation.
    */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** q51's iterative connected components: min-label propagation with
    * POINTER DOUBLING and DELTA ITERATION (frontier propagation, r6
    * verdict item 7).
    *
    * Each round has two phases. One-hop: every node adopts the minimum of
    * (its label, its neighbors' labels). Doubling: it then adopts the label
    * of that just-updated label (comp-of-comp), so label chains collapse
    * geometrically — covered distance follows d -> 2(d+1), convergence is
    * O(log diameter) instead of O(diameter) on an adversarially CHAINED
    * near-dup corpus (r5 ADVICE). Star-anchored hot clusters (the q35
    * bucket cap's output shape) still converge in 2-3 rounds.
    *
    * Delta iteration bounds the per-round work by the FRONTIER — the rows
    * whose label changed last round — instead of by the full graph:
    * only edges leaving a changed node can carry new information (one-hop
    * candidates are `edges JOIN frontier`, not `edges JOIN labels`), and
    * the pointer lookups are probed by the frontier only. Once a region of
    * the graph has converged it contributes ZERO probe rows to any join;
    * the per-round shuffle shrinks with the frontier, which the chain test
    * shows collapsing geometrically. The full tables only ever appear as
    * pre-partitioned lookup sides (edges by `src` — q51 pre-partitions it
    * — and labels by `doc_id` from its own update join), so neither
    * re-shuffles per round. Correctness is the standard delta argument:
    * every change enters the next frontier and is pushed to its neighbors,
    * so an un-relaxed edge cannot survive to the empty-frontier fixpoint.
    *
    * All candidate streams read LAST round's materialized labels, so a
    * round is ONE update join + ONE localCheckpoint + ONE frontier count —
    * no mid-round barrier. (An earlier two-phase shape checkpointed an
    * intermediate "half" generation per round; the extra job gave each
    * round a fixed-cost floor that dominated wall time at bench SF.) The
    * doubling lookup is CHAINED twice — frontier row -> its pointee's
    * label v1 -> v1's label v2 — so covered distance triples per round
    * (c -> 3c on a pure chain): ~log3 rounds, and the second hop reuses
    * the same partitioned labels lookup for a frontier-sized probe.
    *
    * localCheckpoint() truncates lineage per round (SURVEY §2A op 21's
    * barrier pattern applied to iteration) and every generation except the
    * returned one is released eagerly. Convergence = empty frontier — an
    * exact integer count, monotone-safe at any corpus size. `nodes` must
    * expose `doc_id`; `edges` must expose (src, dst) and be cheap to
    * re-read (checkpoint it). Returns the converged (doc_id, comp) labels
    * — the caller owns that final checkpoint — the round count, and the
    * per-round frontier sizes (the delta-volume observability the
    * BENCH_NOTES scale runs record).
    */
  private[graft] def propagateComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 50): (DataFrame, Int, Seq[Long]) = {
    // flat-stats checkpoints: the stock localCheckpoint carries the origin
    // plan's Statistics onto its LogicalRDD, and per-round re-checkpointing
    // COMPOUNDS those through every join's size product — by ~round 10 the
    // optimizer is multiplying million-digit BigInts and the driver hangs
    // in stats estimation (see GraftCheckpoint's scaladoc). Resetting to
    // the flat leaf estimate each round keeps plan-time O(plan), which is
    // what an iterative operator needs.
    val ckpt = org.apache.spark.sql.execution.GraftCheckpoint
      .localCheckpointFlatStats _
    var labels = ckpt(nodes.select(col("doc_id"), col("doc_id").as("comp")))
    // round-0 frontier: every node (its initial self-label is new)
    var frontier = labels
    val frontierSizes = Seq.newBuilder[Long]
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val prevLabels = labels
      // one-hop candidates, frontier-sourced: labels that did NOT change
      // last round were already pushed to their neighbors when they last
      // did
      val nbrCand = edges.join(frontier, col("src") === col("doc_id"))
        .select(col("dst").as("doc_id"), col("comp").as("cand"))
      // doubling candidates, frontier-probed: a changed row chases its
      // pointer chain two hops through LAST round's labels (v1 = label of
      // my label; v2 = label of v1). Probing only from the frontier stalls
      // nothing (a converged region needs no lookups) and both hops are
      // frontier-sized probes into the same doc_id-partitioned lookup.
      val look1 = frontier
        .select(col("doc_id").as("p_doc"), col("comp").as("k1"))
        .join(labels.select(col("doc_id").as("l1"), col("comp").as("v1")),
          col("k1") === col("l1"))
        .select(col("p_doc"), col("v1"))
      val look2 = look1
        .join(labels.select(col("doc_id").as("l2"), col("comp").as("v2")),
          col("v1") === col("l2"))
        .select(col("p_doc"), col("v2"))
      val cand = nbrCand
        .union(look1.select(col("p_doc").as("doc_id"), col("v1").as("cand")))
        .union(look2.select(col("p_doc").as("doc_id"), col("v2").as("cand")))
        .groupBy("doc_id").agg(min("cand").as("cand"))
      // cand is null for nodes nothing reached this round; carry the
      // change flag instead of re-deriving it
      labels = ckpt(labels.join(cand, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("comp"), col("cand")).as("comp"),
          coalesce(col("cand") < col("comp"), lit(false)).as("chg"))
      ) // eager: the round's ONLY materialization
      frontier = labels.filter(col("chg")).select(col("doc_id"), col("comp"))
      val nChanged = frontier.count()
      frontierSizes += nChanged
      releaseCheckpoint(prevLabels)
      converged = nChanged == 0
      rounds += 1
    }
    require(converged, s"label propagation did not converge in $rounds rounds")
    (labels.select(col("doc_id"), col("comp")), rounds, frontierSizes.result())
  }

  private def minhashSig(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    docsWithTokens(s, d)
      .select(col("doc_id"), minhashSigCol.as("sigl"))
  }

  /** The converged near-dup component labels (doc_id, comp) shared by q51
    * and q59: q35's bounded candidate pairs become bidirectional edges
    * (pre-partitioned on `src` so each propagation round shuffles only the
    * frontier side), then frontier-bounded label propagation converges to
    * MIN(doc_id) per connected component. The caller owns the returned
    * checkpoint; the edge blocks are released here.
    */
  private def neardupLabels(s: SparkSession, d: String): DataFrame = {
    val pairs = minhashCandidatePairs(minhashSig(s, d))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("src"))
      .localCheckpoint() // materialized once; every round re-reads it
    val (labels, _, _) =
      propagateComponents(t(s, d, "documents").select(col("doc_id")), edges)
    // the result derives from the FINAL labels generation only — the edge
    // blocks can go now (the final labels checkpoint must stay: the caller
    // has not materialized the result yet)
    releaseCheckpoint(edges)
    labels
  }

  /** Scale-rig observability hook (tools.ComponentsScale): q51's exact
    * edge build + propagation on `d`, returning (rounds, per-round
    * frontier sizes) — the delta-volume trace the BENCH_NOTES scale runs
    * record. Not a query: results are discarded, the trace is the point. */
  private[graft] def componentsScaleRun(s: SparkSession, d: String)
      : (Int, Seq[Long]) = {
    val pairs = minhashCandidatePairs(minhashSig(s, d))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("src"))
      .localCheckpoint()
    val (labels, rounds, frontier) =
      propagateComponents(t(s, d, "documents").select(col("doc_id")), edges)
    releaseCheckpoint(edges)
    releaseCheckpoint(labels)
    (rounds, frontier)
  }

  /** Bench warmup hook: the full q35 candidate-pair pipeline (banding,
    * bucket sizing, band self-join, star rewrite, distinct) over a bounded
    * sample. The kernel-only warmup JITs the sketch expressions but not the
    * join/exchange/distinct codegen stages that dominate q35's first run —
    * r6 billed q35 at 6.6 s against a 1.7-2.4 s steady state because of
    * exactly that gap. limit() bounds the warmup cost at any SF. */
  private[graft] def warmupCandidatePairs(s: SparkSession, d: String,
      n: Int = 20000): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val sig = docsWithTokens(s, d).limit(n)
      .select(col("doc_id"), minhashSigCol.as("sigl"))
    minhashCandidatePairs(sig)
  }

  /** 3 bands x 4 rows over the minhash signature: adds (b, bv), drops
    * `sigl`, and PRESERVES every other input column (the streaming caller
    * carries its watermark timestamp through). Shared with DocStream so
    * q35 and q53 cannot drift on the banding formula. */
  private[graft] def minhashBands(sig: DataFrame): DataFrame =
    sig
      .withColumn("b", explode(sequence(lit(0), lit(2))))
      .withColumn("bv",
        md5(concat_ws("|", slice(col("sigl"), col("b") * 4 + 1, lit(4)))))
      .drop("sigl")

  /** The bounded LSH candidate-pair stream shared by q35 (est_sim attach)
    * and q51 (connected components): band join with the partial-aggregatable
    * bucket sizing and the star-edge cap — see the q35 scaladoc for the
    * full scale rationale. Narrow (doc_a, doc_b) distinct pairs. */
  private def minhashCandidatePairs(sig: DataFrame): DataFrame = {
    val bands = minhashBands(sig)
    val oversized = bands.groupBy(col("b"), col("bv"))
      .agg(count(lit(1)).as("bkt_n"), min(col("doc_id")).as("anchor"))
      .filter(col("bkt_n") > LshBucketCap)
      .select(col("b"), col("bv"), col("anchor"))
    val sized = bands.join(oversized, Seq("b", "bv"), "left")
    val small = sized.filter(col("anchor").isNull)
      .select(col("doc_id"), col("b"), col("bv"))
    val smallPairs = small.as("x").join(small.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val starPairs = sized
      .filter(col("anchor").isNotNull && col("doc_id") =!= col("anchor"))
      .select(col("anchor").as("doc_a"), col("doc_id").as("doc_b"))
    smallPairs.union(starPairs).distinct()
  }

  /** Q37 label-block cap: labels with more members than this stop doing
    * exact all-pairs cosine (O(k²) per block — quadratic on a dominant
    * label) and instead require hyperplane-bucket equality in addition to
    * the label, i.e. the join key becomes (label, bucket). Standard LSH
    * recall trade, declared in the oracle SQL too, so both engines agree.
    */
  val EmbedBlockCap = 128

  /** Hyperplane count for q37's oversized-label blocking: within one label
    * block the composed key (label, bucket) only has to break up a dominant
    * label, so a coarse 2^8 split suffices (and keeps recall high — finer
    * buckets drop more same-label near-dup pairs).
    */
  val EmbedBucketBits = 8

  /** Hyperplane count for q41's ANN buckets. Production sizing is
    * nBits ≈ log2(corpus / target_bucket): 2^16 buckets keep the exact
    * re-rank set ~n/65536 (a few thousand vectors per bucket even at 100TB's
    * billions of embeddings; raise toward 20-24 there). The recall cost of
    * finer buckets is paid back by multi-probe (below) instead of by
    * scanning n/256 of the corpus per query, which is what the old
    * hard-coded 8 planes did.
    */
  val AnnBits = 16

  /** Multi-probe width for q41: the query probes every sign-flip subset of
    * its `AnnProbePlanes` lowest-|projection| hyperplanes — the planes the
    * query is closest to, i.e. where a true neighbor most plausibly landed
    * on the other side — so 2^AnnProbePlanes buckets are searched in one
    * hash-equality join instead of one.
    */
  val AnnProbePlanes = 3

  /** Signed projections onto `nBits` deterministic pseudo-random ±1
    * hyperplanes, and their packed sign-bit bucket, live in the codegen
    * expressions `hyperplane_projs` / `hyperplane_bucket`
    * ([[graft.functions.Hyperplane]]): ONE pass over the embedding for all
    * planes — the r3/r4 Column-function version folded the array once per
    * plane, nBits sequential traversals in the 100TB hot loop. Signs come
    * from a pure integer mixing formula so the DuckDB twin is exact.
    */

  /** Sign bits of a `hyperplane_projs` array packed into a BIGINT bucket
    * (query-side use, where the projection array is also needed for
    * multi-probe plane ranking; corpus rows use `hyperplane_bucket`). */
  private[queries] def bucketFromProjs(projs: Column, nBits: Int): Column =
    (0 until nBits).map { p =>
      when(element_at(projs, p + 1) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Oracle twin of the `hyperplane_bucket` expression
    * ([[graft.functions.Hyperplane]]) over a column named `embedding`. */
  private def hyperplaneBucketSql(nBits: Int): String =
    s"""CAST(list_sum(list_transform(generate_series(0, ${nBits - 1}), p ->
      |      CASE WHEN list_sum(list_transform(
      |          generate_series(0, len(embedding) - 1), i ->
      |        CAST(embedding[i + 1] AS DOUBLE) *
      |          (CASE WHEN (i * 2654435761 + p * 40503) % 97 < 48
      |           THEN 1.0 ELSE -1.0 END))) > 0
      |      THEN CAST(2 ** p AS BIGINT) ELSE 0 END)) AS BIGINT)""".stripMargin

  private val HYPERPLANE_BUCKET_SQL: String = hyperplaneBucketSql(EmbedBucketBits)

  /** Oracle-side twin of [[minhashSig]]+[[minhashBands]] as DuckDB CTEs. */
  private[graft] val MINHASH_BANDS_SQL: String =
    """hsrc AS (SELECT doc_id,
      |    list_transform(list_distinct(string_split(text, ' ')), t -> md5(t)) AS hs
      |  FROM documents),
      |sig AS (SELECT doc_id,
      |    list_transform(generate_series(0, 11), j ->
      |      list_min(list_transform(hs, h -> substr(h || h, j + 1, 16)))) AS sigl
      |  FROM hsrc),
      |bands AS (SELECT doc_id, b,
      |    md5(array_to_string(sigl[4*b+1:4*b+4], '|')) AS bv
      |  FROM sig CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS b) bs)""".stripMargin

  /** Oracle twin of [[minhashCandidatePairs]] (CTEs `sized` + `pairs`),
    * appended after [[MINHASH_BANDS_SQL]]. */
  private val MINHASH_PAIRS_SQL: String =
    s"""sized AS (SELECT doc_id, b, bv,
      |    COUNT(*) OVER (PARTITION BY b, bv) AS bkt_n,
      |    MIN(doc_id) OVER (PARTITION BY b, bv) AS anchor
      |  FROM bands),
      |pairs AS (SELECT DISTINCT doc_a, doc_b FROM (
      |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
      |    FROM sized x JOIN sized y
      |      ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
      |    WHERE x.bkt_n <= $LshBucketCap AND y.bkt_n <= $LshBucketCap
      |    UNION ALL
      |    SELECT anchor AS doc_a, doc_id AS doc_b
      |    FROM sized WHERE bkt_n > $LshBucketCap AND doc_id <> anchor) u)""".stripMargin

  /** Word-8-gram overlap unit of the decontamination family (q56/q101; 8
    * is the GPT-3 convention): DISTINCT shingles per doc, built LAMBDA-FREE
    * as 8 shifted slices + arrays_zip (the q52 lesson — a transform lambda
    * inlined into Catalyst's inferred explode filter re-evaluates split
    * per element). Expects a `toks` column; returns (doc_id, sh). */
  private val ShingleN = 8
  private def wordShingles(df: DataFrame): DataFrame = {
    val n = ShingleN
    val len = greatest(size(col("toks")) - (n - 1), lit(0))
    val sliced = (1 to n).foldLeft(df)((acc, k) =>
      acc.withColumn(s"s$k", slice(col("toks"), lit(k), len)))
    sliced
      .select(col("doc_id"),
        explode(arrays_zip((1 to n).map(k => col(s"s$k")): _*)).as("z"))
      .select(col("doc_id"),
        concat_ws(" ", (1 to n).map(k => col(s"z.s$k")): _*).as("sh"))
      .dropDuplicates("doc_id", "sh")
  }

  /** Q101 bench-side shingle document-frequency cap: a shingle present in
    * more than this many BENCHMARK docs is boilerplate, carries no
    * contamination signal, and — because Jaccard needs per-(train, bench)
    * PAIR intersections, unlike q56's per-shingle collapse — would
    * multiply train_df x bench_df rows through the join. Capped shingles
    * are excluded from scoring on BOTH engines (a declared estimator
    * choice, the SlimPajama/top-df drop); the cap is observable as a
    * smaller intersection, never a wrong pair. */
  val FuzzyShingleDfCap = 32

  /** Q101 contamination bar: max-Jaccard >= this flags the train doc.
    * 0.5 flags "mostly the same document" (an exact or trivially-edited
    * benchmark copy); the report carries the full top-50 either way, so
    * operators can tune the bar without rerunning. */
  val FuzzyTau = 0.5

  /** Q102 near-dup shingle width: 5-gram shingle sets are the standard
    * MinHash dedup unit (RefinedWeb); see the q102 notes for why token
    * sets (q35's unit) don't discriminate here. */
  val IngestShingleN = 5

  /** (doc_id, fp, sigl) of the ingest-dedup family (q102 one-shot, q104
    * streaming): md5 fingerprint + 12-hash MinHash over word-5-gram
    * shingle sets (docs under 5 tokens fall back to their raw token set —
    * mirrored in the oracle). One formula for both topologies, the
    * q35/q53 sharing pattern. The shingle array is materialized via
    * withColumn so minhash_sig references a bound column, not the
    * transform expression (HOF collapse-inlining would re-expand the
    * array per access — the q49 lesson). Caller registers GraftFunctions.
    */
  private[graft] def ingestSig(docs: DataFrame): DataFrame = {
    val n = IngestShingleN
    val shArr = when(size(col("toks")) < n, col("toks"))
      .otherwise(transform(sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ",
          (0 until n).map(k => element_at(col("toks"), i + k + 1)): _*)))
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("fp", md5(col("text")))
      .withColumn("toks", shArr)
      .withColumn("sigl", minhashSigCol)
      .select(col("doc_id"), col("fp"), col("sigl"))
  }

  /** Oracle-side twin of [[ingestSig]] + [[minhashBands]] + the md5
    * fingerprint as DuckDB CTEs (tk/shl/hsrc/sig/bands/fps) — shared by
    * q102's one-shot oracle and q104's streaming-replay oracle so the
    * two cannot drift on the signature formula. */
  private[graft] val INGEST_SIG_SQL: String =
    s"""tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |shl AS (SELECT doc_id,
       |    CASE WHEN len(w) < $IngestShingleN THEN w
       |         ELSE list_transform(
       |           generate_series(1, len(w) - ${IngestShingleN - 1}),
       |           i -> array_to_string(w[i:i+${IngestShingleN - 1}], ' '))
       |    END AS sl FROM tk),
       |hsrc AS (SELECT doc_id, list_transform(sl, t -> md5(t)) AS hs
       |  FROM shl),
       |sig AS (SELECT doc_id,
       |    list_transform(generate_series(0, 11), j ->
       |      list_min(list_transform(hs, h -> substr(h || h, j + 1, 16))))
       |      AS sigl
       |  FROM hsrc),
       |bands AS (SELECT doc_id, b,
       |    md5(array_to_string(sigl[4*b+1:4*b+4], '|')) AS bv
       |  FROM sig CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS b) bs),
       |fps AS (SELECT doc_id, md5(text) AS fp FROM documents)""".stripMargin

  /** Oracle-side twin of [[graft.operators.Multimodal.mediaTable]] as
    * DuckDB CTEs (m/g/mm): the text-derived media payload — P5 geometry,
    * header, zero-padded samples — shared by the q42 and q42b oracles so
    * the two cannot drift on the media formula (q96 derives the same
    * geometry for PIXEL INDEX arithmetic rather than a media string, so
    * it stays separate by shape). */
  private[graft] val MEDIA_SQL_CTES: String =
    """m AS MATERIALIZED (
      |  SELECT doc_id AS id, CAST(doc_id % 3 AS VARCHAR) AS kind,
      |    text, length(text) AS l
      |  FROM documents),
      |g AS MATERIALIZED (
      |  SELECT *, LEAST(GREATEST(l, 1), 64) AS w,
      |    (GREATEST(l, 1) + LEAST(GREATEST(l, 1), 64) - 1)
      |      // LEAST(GREATEST(l, 1), 64) AS h
      |  FROM m),
      |mm AS MATERIALIZED (
      |  SELECT id, kind, l, w, h,
      |    CASE WHEN kind = '1'
      |      THEN 'P5' || chr(10) || CAST(w AS VARCHAR) || ' ' ||
      |        CAST(h AS VARCHAR) || chr(10) || '255' || chr(10) ||
      |        text || repeat(chr(0), w * h - l)
      |      ELSE text END AS media,
      |    CASE WHEN kind = '1' THEN text || repeat(chr(0), w * h - l)
      |      ELSE text END AS samples
      |  FROM g)""".stripMargin

  /** The two pre-aggregated ingest indexes: one row per fingerprint and
    * ONE ROW PER BAND BUCKET (min member doc id each) — the only shape
    * the stored corpus ever takes in the probe joins. */
  private[graft] def fpIndexOf(sig: DataFrame): DataFrame =
    sig.groupBy("fp").agg(min(col("doc_id")).as("exact_anchor"))
  private[graft] def bandIndexOf(sig: DataFrame): DataFrame =
    minhashBands(sig.select(col("doc_id"), col("sigl")))
      .groupBy("b", "bv").agg(min(col("doc_id")).as("band_anchor"))

  /** [[classifyAgainstIndex]]'s output schema, named once so consumers
    * that must synthesize an empty classification (IngestStream's
    * zero-batch path) cannot drift from the real output shape. */
  private[graft] val ClassificationSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("anchor_doc", LongType),
    StructField("est_sim", DoubleType)))

  /** Anchor half of [[classifyAgainstIndex]]: 'exact' on a fingerprint
    * hit, 'near' on a shared MinHash band bucket, 'novel' otherwise —
    * stored anchor named, the batch's own `sigl` carried through for the
    * est_sim attach. Split out so a bucketed index (IngestStream) can
    * materialize the batch-sized anchor set FIRST and prune the sig-store
    * read to just the anchors' buckets before [[attachEstSim]]. All probe
    * joins are keyed and batch-sized on the probe side. */
  private[graft] def anchorsAgainstIndex(batchSig: DataFrame,
      fpIndex: DataFrame, bandIndex: DataFrame): DataFrame = {
    val nearAnchor = minhashBands(batchSig.select(col("doc_id"), col("sigl")))
      .join(bandIndex, Seq("b", "bv"))
      .groupBy("doc_id").agg(min(col("band_anchor")).as("near_anchor"))
    batchSig
      .join(fpIndex, Seq("fp"), "left")
      .join(nearAnchor, Seq("doc_id"), "left")
      .withColumn("status",
        when(col("exact_anchor").isNotNull, "exact")
          .when(col("near_anchor").isNotNull, "near")
          .otherwise("novel"))
      .withColumn("anchor_doc",
        coalesce(col("exact_anchor"), col("near_anchor")))
      .select(col("doc_id"), col("sigl"), col("status"), col("anchor_doc"))
  }

  /** est_sim half of [[classifyAgainstIndex]]: look up each anchor's
    * stored signature in `sigStore` (doc_id, sigl) and attach the
    * 12-hash agreement fraction. */
  private[graft] def attachEstSim(anchored: DataFrame,
      sigStore: DataFrame): DataFrame =
    anchored
      .join(sigStore.select(col("doc_id").as("anchor_doc"),
        col("sigl").as("asig")), Seq("anchor_doc"), "left")
      .select(col("doc_id"), col("status"), col("anchor_doc"),
        r4(when(col("asig").isNotNull,
          aggregate(zip_with(col("sigl"), col("asig"),
            (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast(DoubleType) / 12))
          .as("est_sim"))

  /** Classify `batchSig` rows against an ingest index (see q102 notes) —
    * the one-shot composition of [[anchorsAgainstIndex]] and
    * [[attachEstSim]]. */
  private[graft] def classifyAgainstIndex(batchSig: DataFrame,
      fpIndex: DataFrame, bandIndex: DataFrame,
      sigStore: DataFrame): DataFrame =
    attachEstSim(anchorsAgainstIndex(batchSig, fpIndex, bandIndex), sigStore)

  /** Q113 per-language carve size — exact, not a rate (see the QueryDef
    * notes). */
  val QuotaPerStratum = 30

  /** Q113's dataflow at any quota — exposed so MixingSpec can pin the
    * rank-nesting law (quota 15 prefix-of quota 30) against the
    * PRODUCTION pipeline. */
  private[graft] def quotaSample(s: SparkSession, d: String,
      quota: Int): DataFrame = {
    val hk = saltedHash("quota1|")
    t(s, d, "documents")
      .withColumn("hk", hk)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("hk"), col("doc_id"))))
      .filter(col("rk") <= quota)
      .select(col("lang"), col("rk").cast(IntegerType).as("rk"),
        col("doc_id"))
      .orderBy("lang", "rk")
  }

  /** Q106 bloom false-positive rate: 1% keeps the sketch at
    * ~1.2 MB per million bench shingles while cutting the confirm join's
    * probe side to ~1% of the corpus shingle stream. */
  val BloomDecontamFpp = 0.01

  /** Q106 shared dataflow, split for spec observability: (train shingle
    * stream, bloom-surviving train shingles, pre-aggregated bench side).
    * The bloom is built by ONE aggregate over the bench shingles (sized
    * from a measured count — the Curation gate pattern) and shipped as a
    * plan literal; merge is bitmap OR, so the sketch bytes are
    * partition-order-independent. Caller-visible semantics are exactly
    * q56's. */
  private[graft] def bloomDecontamParts(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    val toks = docsWithTokens(s, d)
    // materialized once (flat-stats checkpoint): the measuring count, the
    // bloom build and the confirm join all scan this — left lazy, each
    // re-runs the bench split's tokenize + 8-gram explode + two aggs
    val bench = org.apache.spark.sql.execution.GraftCheckpoint
      .localCheckpointFlatStats(
        wordShingles(toks.filter(col("doc_id") % 19 === 0))
          .groupBy("sh").agg(count(lit(1)).as("n_bench_docs_sh")))
    val benchN = math.max(bench.count(), 1L)
    val nBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(benchN, BloomDecontamFpp)
    // BloomFilterAggregate silently CLAMPS numBits/numItems to the
    // runtime-filter session caps (8 MB default) — a very large holdout
    // would quietly degrade the fpp the ~1% design claim rests on and
    // inflate the confirm-join probe side. Raise the caps to the measured
    // size so the build is never clamped; exactness never depended on the
    // bloom (the confirm join re-checks), this keeps the SCALE claim true.
    Seq("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems")
      .zip(Seq(nBits, benchN)).foreach { case (k, need) =>
        val cap = s.conf.get(k).toLong
        if (need > cap) {
          s.conf.set(k, need.toString)
          org.slf4j.LoggerFactory.getLogger(getClass).info(
            s"q106: raising $k $cap -> $need (holdout ${benchN} shingles)")
        }
      }
    val bloomBytes = bench
      .select(call_function("bloom_agg", xxhash64(col("sh")),
        lit(benchN), lit(nBits)).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val train = wordShingles(toks.filter(col("doc_id") % 19 =!= 0))
    val survivors =
      if (bloomBytes == null) train.filter(lit(false))
      else train.filter(call_function("bloom_might_contain",
        lit(bloomBytes), xxhash64(col("sh"))))
    (train, survivors, bench)
  }

  val defs: Seq[QueryDef] = Seq(

    // Q30 exact dedup: MD5 group, survivor = MIN(doc_id) -------------------
    QueryDef("q30_dedup_exact",
      (s, d) => {
        val docs = t(s, d, "documents")
        val survivors = docs
          .groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("keep_id"))
        survivors.join(docs, col("keep_id") === col("doc_id"))
          .groupBy("lang")
          .agg(count(lit(1)).as("distinct_docs"))
          .orderBy("lang")
      },
      Some("""WITH g AS (SELECT MD5(text) AS h, MIN(doc_id) AS keep_id
             |          FROM documents GROUP BY MD5(text))
             |SELECT lang, COUNT(*) AS distinct_docs
             |FROM g JOIN documents ON keep_id = doc_id
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // Q31 token frequency top-k -------------------------------------------
    QueryDef("q31_token_topk",
      (s, d) =>
        docsWithTokens(s, d)
          .select(explode(col("toks")).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("token"))
          .limit(20),
      Some("""WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
             |SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
             |ORDER BY cnt DESC, token LIMIT 20""".stripMargin)),

    // Q32 brute-force cosine top-k (custom codegen Expression) -------------
    QueryDef("q32_cosine_topk",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(graft.BroadcastBounds.bounded("single-query-probe")(q))
          .select(col("vec_id"),
            r4(expr("cosine_sim(embedding, qe)")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(5)
      },
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
             |SELECT c.vec_id AS vec_id,
             | CAST(ROUND(list_cosine_similarity(
             |   CAST(c.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])), 4) AS DOUBLE) AS sim
             |FROM embeddings c, q WHERE c.vec_id <> 0
             |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin)),

    // Q34 word-3-gram Jaccard between adjacent doc ids ---------------------
    QueryDef("q34_ngram_jaccard",
      (s, d) => {
        // short docs guarded explicitly: Spark sequence(0,-1) DESCENDS
        // (unlike DuckDB generate_series, which is empty) and would index
        // toks at 0 -> runtime error
        val sh = docsWithTokens(s, d).select(col("doc_id"),
          array_distinct(
            when(size(col("toks")) < 3, expr("CAST(array() AS ARRAY<STRING>)"))
              .otherwise(transform(
                sequence(lit(0), size(col("toks")) - 3),
                i => concat_ws(" ",
                  element_at(col("toks"), i + 1),
                  element_at(col("toks"), i + 2),
                  element_at(col("toks"), i + 3))))).as("sh"))
        val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
        val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sb"))
        a.join(b, col("doc_b") === col("doc_a") + 1)
          .select(col("doc_a"), col("doc_b"),
            r4(size(array_intersect(col("sa"), col("sb"))).cast(DoubleType) /
              nullif(size(array_union(col("sa"), col("sb"))), lit(0)).cast(DoubleType))
              .as("jaccard"))
          .orderBy("doc_a")
      },
      Some("""WITH dd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT doc_id,
             |  list_distinct(list_transform(generate_series(1, len(w) - 2),
             |    i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s
             |  FROM dd)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             | CAST(ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |   / NULLIF(len(list_distinct(list_concat(a.s, b.s))), 0), 4) AS DOUBLE) AS jaccard
             |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
             |ORDER BY doc_a""".stripMargin)),

    // Q35 MinHash + LSH near-dup candidates --------------------------------
    // K=12 portable minhashes: each token is md5-hashed ONCE; hash family
    // h_j = 16-char rotation j of the hex digest (substr(h||h, j+1, 16)),
    // minhash_j(doc) = lexicographic MIN over distinct tokens; 3 bands x 4
    // rows; candidate pairs share a band; est_sim = fraction of equal
    // minhashes.
    //
    // Scale design: the whole signature is computed per-row with codegen'd
    // higher-order array functions — zero shuffle until the band join. The
    // naive formulation (explode tokens x 12 hashes -> groupBy doc) shuffles
    // 12x the token count; at 100TB that shuffle IS the job, here it does
    // not exist. One md5 per token (rotations are free) instead of 12 makes
    // signature build CPU ~10x cheaper.
    QueryDef("q35_minhash_lsh",
      (s, d) => {
        // Signature build: single fold over the token hashes — the 12
        // running minima update in one pass, so each token is md5'd exactly
        // once per row, zero shuffle. Init "g" > any hex char.
        val sig = minhashSig(s, d)
        // Pair generation is BOUNDED (r3; sizing reworked in r4): buckets
        // are sized by a partial-aggregatable groupBy — a window over
        // (b, bv) would route an entire hot bucket into ONE window-partition
        // task that must buffer k rows (half the corpus in the adversarial
        // case); the groupBy map-side-combines so no task ever holds a
        // bucket. Only the OVERSIZED keys (a set bounded by
        // n_rows/LshBucketCap, tiny in practice) come back, and the band
        // rows re-acquire their bucket class by a left join on (b, bv) —
        // AQE broadcasts it when small, falls back to a shuffle join when an
        // adversarial corpus makes it big.
        //
        // Buckets <= LshBucketCap join all-pairs (exact candidates, at most
        // CAP(CAP-1)/2 pairs each); oversized buckets — the hot-bucket
        // blowup that made this query quadratic and 33% of the r2 bench —
        // emit anchor(min doc_id)→member star edges: k-1 pairs (see the
        // LshBucketCap scaladoc for the recall trade). Dropped-pair counts
        // are observable via q35b_lsh_bucket_stats.
        //
        // Candidate pairs stay NARROW (two longs) through the join; the
        // 12-hash signatures are re-attached by doc_id joins afterwards
        // (broadcast at small SF, shuffle joins at scale) — carrying the
        // signature arrays through the pair stream is what made the naive
        // plan O(pairs x signature) instead of O(pairs). The distinct
        // doubles as the rebalancing exchange.
        val pairs = minhashCandidatePairs(sig)
        pairs
          .join(sig.select(col("doc_id").as("doc_a"), col("sigl").as("siga")), "doc_a")
          .join(sig.select(col("doc_id").as("doc_b"), col("sigl").as("sigb")), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            r4(aggregate(zip_with(col("siga"), col("sigb"),
              (x, y) => when(x === y, 1).otherwise(0)),
              lit(0), (acc, v) => acc + v).cast(DoubleType) / 12).as("est_sim"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH $MINHASH_BANDS_SQL,
             |$MINHASH_PAIRS_SQL
             |SELECT p.doc_a, p.doc_b,
             |  CAST(ROUND(CAST(list_sum(list_transform(generate_series(1, 12),
             |      i -> CASE WHEN a.sigl[i] = b.sigl[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 12,
             |    4) AS DOUBLE) AS est_sim
             |FROM pairs p JOIN sig a ON a.doc_id = p.doc_a
             |             JOIN sig b ON b.doc_id = p.doc_b
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Q35b LSH bucket-size stats: makes the q35 cap observable — per band,
    // how many buckets, the largest, how many exceeded LshBucketCap, and
    // exactly how many all-pairs candidates the star-edge rewrite dropped
    // (k(k-1)/2 - (k-1) per oversized bucket). At 100TB this is the query an
    // operator runs to validate the cap before a dedup campaign.
    QueryDef("q35b_lsh_bucket_stats",
      (s, d) => {
        val buckets = minhashBands(minhashSig(s, d))
          .groupBy(col("b"), col("bv"))
          .agg(count(lit(1)).as("k"))
        buckets.groupBy(col("b").cast(IntegerType).as("band"))
          .agg(
            count(lit(1)).as("n_buckets"),
            max(col("k")).as("max_bucket"),
            sum(when(col("k") > LshBucketCap, 1L).otherwise(0L)).as("oversized_buckets"),
            // k(k-1)/2 - (k-1) dividing BEFORE multiplying (parity branch):
            // k*(k-1) on BIGINT silently wraps in non-ANSI Spark beyond
            // k~4.3e9 while DuckDB raises — the parity form is exact and
            // overflow-free in both dialects at any realistic bucket size
            sum(when(col("k") > LshBucketCap,
              expr("""CASE WHEN k % 2 = 0 THEN (k div 2) * (k - 1) - (k - 1)
                     |     ELSE k * ((k - 1) div 2) - (k - 1) END""".stripMargin))
              .otherwise(0L)).as("dropped_pairs"))
          .orderBy("band")
      },
      Some(s"""WITH $MINHASH_BANDS_SQL,
             |buckets AS (SELECT b, bv, COUNT(*) AS k FROM bands GROUP BY b, bv)
             |SELECT CAST(b AS INT) AS band,
             |  COUNT(*) AS n_buckets,
             |  CAST(MAX(k) AS BIGINT) AS max_bucket,
             |  CAST(SUM(CASE WHEN k > $LshBucketCap THEN 1 ELSE 0 END) AS BIGINT)
             |    AS oversized_buckets,
             |  CAST(SUM(CASE WHEN k > $LshBucketCap THEN
             |    CASE WHEN k % 2 = 0 THEN (k // 2) * (k - 1) - (k - 1)
             |         ELSE k * ((k - 1) // 2) - (k - 1) END
             |    ELSE 0 END) AS BIGINT) AS dropped_pairs
             |FROM buckets GROUP BY b ORDER BY band""".stripMargin)),

    // Q36 SimHash near-dup -------------------------------------------------
    // 32-bit simhash from token md5 prefixes; blocked by byte-bands so only
    // hamming<=3-candidate pairs are compared (any 4-split shares a byte).
    //
    // Scale design (r4): the q35 star-edge cap applied verbatim to the
    // byte-band blocking. The key space here is only 4 bands x 256 values =
    // 1024 buckets, so WITHOUT a cap every bucket holds ~n/256 docs at
    // corpus scale and the self-join is quadratic — the exact disease q35
    // cured in r3. Buckets <= LshBucketCap join all-pairs; oversized buckets
    // emit anchor(min doc_id)→member star edges (bounded k-1 pairs; recall
    // caveat in the LshBucketCap scaladoc). Unlike q35 — whose signature is
    // a ~200-byte array that must be re-attached by key join after the
    // distinct — a simhash is ONE long, so pairs carry both hashes through
    // the distinct (16 extra bytes/row) and no re-attach join or signature
    // recompute exists at all. Bucket sizing is the same
    // partial-aggregatable groupBy + oversized-keys left join as q35 (the
    // aggregate also carries the anchor's simhash via min_by) — no window,
    // no single-task hot-bucket buffer.
    QueryDef("q36_simhash",
      (s, d) => {
        // Per-row signature, no shuffle (same rationale as q35): each
        // distinct token md5'd once, all 32 bit-counts accumulated in one
        // codegen pass (r5 `simhash32` expression; the 32 sequential
        // bit-fold passes it replaced are pinned bit-identical in
        // TextSketchSpec).
        graft.functions.GraftFunctions.register(s)
        val sh = docsWithTokens(s, d)
          .select(col("doc_id"), expr("simhash32(toks)").as("simhash"))
        val banded = sh.select(col("doc_id"),
            explode(sequence(lit(0), lit(3))).as("byte_idx"),
            col("simhash"))
          .select(col("doc_id"), col("simhash"), col("byte_idx"),
            expr("(simhash >> (byte_idx * 8)) & 255").as("byte_val"))
        val oversized = banded.groupBy(col("byte_idx"), col("byte_val"))
          .agg(count(lit(1)).as("bkt_n"), min(col("doc_id")).as("anchor"),
            min_by(col("simhash"), col("doc_id")).as("anchor_sh"))
          .filter(col("bkt_n") > LshBucketCap)
          .select(col("byte_idx"), col("byte_val"), col("anchor"), col("anchor_sh"))
        val sized = banded.join(oversized, Seq("byte_idx", "byte_val"), "left")
        val small = sized.filter(col("anchor").isNull)
          .select(col("doc_id"), col("simhash"), col("byte_idx"), col("byte_val"))
        val smallPairs = small.as("x").join(small.as("y"),
            col("x.byte_idx") === col("y.byte_idx")
              && col("x.byte_val") === col("y.byte_val")
              && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
            col("x.simhash").as("ha"), col("y.simhash").as("hb"))
        val starPairs = sized
          .filter(col("anchor").isNotNull && col("doc_id") =!= col("anchor"))
          .select(col("anchor").as("doc_a"), col("doc_id").as("doc_b"),
            col("anchor_sh").as("ha"), col("simhash").as("hb"))
        smallPairs.union(starPairs).distinct()
          .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
          .filter(col("hamming") <= 3)
          .select(col("doc_a"), col("doc_b"), col("hamming").cast(IntegerType).as("hamming"))
          .orderBy("doc_a", "doc_b")
      },
      // hex->int via positional char arithmetic and bit ops via integer
      // division make the whole simhash portable to DuckDB
      Some(s"""WITH hsrc AS (SELECT doc_id,
             |    list_transform(list_distinct(string_split(text, ' ')), t ->
             |      CAST(list_sum(list_transform(generate_series(1, 8), i ->
             |        (strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1)
             |          * CAST(16 ** (8 - i) AS BIGINT))) AS BIGINT)) AS hs
             |  FROM documents),
             |sh AS (SELECT doc_id,
             |    CAST(list_sum(list_transform(generate_series(0, 31), b ->
             |      CASE WHEN list_sum(list_transform(hs, h ->
             |        CASE WHEN CAST(h // CAST(2 ** b AS BIGINT) AS BIGINT) % 2 = 1
             |          THEN 1 ELSE -1 END)) > 0
             |      THEN CAST(2 ** b AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
             |  FROM hsrc),
             |banded AS (SELECT doc_id, simhash, b AS byte_idx,
             |    CAST(simhash // CAST(2 ** (8 * b) AS BIGINT) AS BIGINT) % 256 AS byte_val
             |  FROM sh CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS b) bs),
             |osz AS (SELECT byte_idx, byte_val, MIN(doc_id) AS anchor,
             |    arg_min(simhash, doc_id) AS anchor_sh
             |  FROM banded GROUP BY byte_idx, byte_val
             |  HAVING COUNT(*) > $LshBucketCap),
             |sized AS (SELECT n.doc_id, n.simhash, n.byte_idx, n.byte_val,
             |    o.anchor, o.anchor_sh
             |  FROM banded n LEFT JOIN osz o
             |    ON n.byte_idx = o.byte_idx AND n.byte_val = o.byte_val),
             |pairs AS (SELECT DISTINCT doc_a, doc_b, ha, hb FROM (
             |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
             |      x.simhash AS ha, y.simhash AS hb
             |    FROM sized x JOIN sized y
             |      ON x.byte_idx = y.byte_idx AND x.byte_val = y.byte_val
             |        AND x.doc_id < y.doc_id
             |    WHERE x.anchor IS NULL AND y.anchor IS NULL
             |    UNION ALL
             |    SELECT anchor AS doc_a, doc_id AS doc_b,
             |      anchor_sh AS ha, simhash AS hb
             |    FROM sized WHERE anchor IS NOT NULL AND doc_id <> anchor) u)
             |SELECT doc_a, doc_b,
             |  CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
             |FROM pairs
             |WHERE bit_count(xor(ha, hb)) <= 3
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Q37 embedding near-dup, blocked on label -----------------------------
    // Scale path (new in r3): a window count sizes every label block; blocks
    // <= EmbedBlockCap keep the exact all-pairs cosine, oversized blocks
    // compose the label with an EmbedBucketBits-hyperplane bucket so the
    // join key is (label, bucket) — a dominant label at 100TB no longer goes
    // quadratic. (The label count fits a window here: labels are a bounded
    // categorical domain, so a "hot" window partition is the whole corpus
    // only if one label is — which is exactly what the bucket split fixes.)
    // The bucket is computed on the oversized branch ONLY (r5): hashing
    // every row paid nBits of per-row work that the common all-small case
    // never used.
    QueryDef("q37_embedding_neardup",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"), col("embedding"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("label"))))
        val small = e.filter(col("n") <= EmbedBlockCap)
        val big = e.filter(col("n") > EmbedBlockCap)
          .withColumn("bucket",
            expr(s"hyperplane_bucket(embedding, $EmbedBucketBits)"))
        val proj = (j: DataFrame) => j.select(
          col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          col("a.embedding").as("ea"), col("b.embedding").as("eb"))
        val cand = proj(small.as("a").join(small.as("b"),
            col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id")))
          .unionByName(proj(big.as("a").join(big.as("b"),
            col("a.label") === col("b.label") && col("a.bucket") === col("b.bucket")
              && col("a.vec_id") < col("b.vec_id"))))
        cand
          .select(col("vec_a"), col("vec_b"),
            r4(expr("cosine_sim(ea, eb)")).as("sim"))
          .filter(col("sim") >= 0.95)
          .orderBy("vec_a", "vec_b")
      },
      Some(s"""WITH e AS (SELECT vec_id, label, embedding,
             |    COUNT(*) OVER (PARTITION BY label) AS n
             |  FROM embeddings),
             |big AS (SELECT vec_id, label, embedding,
             |    $HYPERPLANE_BUCKET_SQL AS bucket
             |  FROM e WHERE n > $EmbedBlockCap),
             |cand AS (
             |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |    a.embedding AS ea, b.embedding AS eb
             |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
             |  WHERE a.n <= $EmbedBlockCap AND b.n <= $EmbedBlockCap
             |  UNION ALL
             |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |    a.embedding AS ea, b.embedding AS eb
             |  FROM big a JOIN big b ON a.label = b.label AND a.bucket = b.bucket
             |    AND a.vec_id < b.vec_id)
             |SELECT vec_a, vec_b,
             | CAST(ROUND(list_cosine_similarity(
             |   CAST(ea AS DOUBLE[]), CAST(eb AS DOUBLE[])), 4) AS DOUBLE) AS sim
             |FROM cand
             |WHERE CAST(ROUND(list_cosine_similarity(
             |   CAST(ea AS DOUBLE[]), CAST(eb AS DOUBLE[])), 4) AS DOUBLE) >= 0.95
             |ORDER BY vec_a, vec_b""".stripMargin)),

    // Q38 text profile: token stats, quality ratios, naive lang flag -------
    QueryDef("q38_text_profile",
      (s, d) => {
        val stops = array(Seq("the", "a", "of", "and", "in", "to", "is").map(lit): _*)
        docsWithTokens(s, d).select(
          col("doc_id"),
          size(col("toks")).cast(IntegerType).as("n_tokens"),
          size(array_distinct(col("toks"))).cast(IntegerType).as("n_distinct"),
          r4(aggregate(col("toks"), lit(0), (acc, x) => acc + length(x)).cast(DoubleType)
            / nullif(size(col("toks")), lit(0))).as("avg_token_len"),
          r4(size(filter(col("toks"), x => array_contains(stops, x))).cast(DoubleType)
            / nullif(size(col("toks")), lit(0))).as("stopword_ratio"),
          r4(size(array_distinct(col("toks"))).cast(DoubleType)
            / nullif(size(col("toks")), lit(0))).as("ttr"))
          .orderBy("doc_id")
      },
      Some("""WITH dd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
             |SELECT doc_id,
             | CAST(len(w) AS INT) AS n_tokens,
             | CAST(len(list_distinct(w)) AS INT) AS n_distinct,
             | CAST(ROUND(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
             |   / NULLIF(len(w), 0), 4) AS DOUBLE) AS avg_token_len,
             | CAST(ROUND(CAST(len(list_filter(w,
             |     x -> list_contains(['the','a','of','and','in','to','is'], x))) AS DOUBLE)
             |   / NULLIF(len(w), 0), 4) AS DOUBLE) AS stopword_ratio,
             | CAST(ROUND(CAST(len(list_distinct(w)) AS DOUBLE)
             |   / NULLIF(len(w), 0), 4) AS DOUBLE) AS ttr
             |FROM dd ORDER BY doc_id""".stripMargin)),

    // Q39 normalized token-set fingerprint dedup ---------------------------
    QueryDef("q39_fingerprint",
      (s, d) =>
        docsWithTokens(s, d)
          .select(col("doc_id"),
            md5(concat_ws(" ", array_sort(array_distinct(col("toks"))))).as("fp"))
          .groupBy("fp")
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
          .filter(col("n_docs") > 1)
          .orderBy("fp"),
      Some("""WITH f AS (SELECT doc_id,
             |   md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
             |  FROM documents)
             |SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
             |FROM f GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp""".stripMargin)),

    // Q40 token counting: whitespace + BPE-ish regex + chars ---------------
    QueryDef("q40_token_stats",
      (s, d) =>
        t(s, d, "documents").select(
          col("doc_id"),
          size(split(col("text"), " ")).cast(IntegerType).as("ws_tokens"),
          size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).cast(IntegerType)
            .as("word_tokens"),
          length(col("text")).cast(IntegerType).as("n_chars_calc"),
          ceil(length(col("text")) / 4.0).cast(IntegerType).as("approx_bpe_tokens"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             | CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
             | CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS word_tokens,
             | CAST(LENGTH(text) AS INT) AS n_chars_calc,
             | CAST(CEIL(LENGTH(text) / 4.0) AS INT) AS approx_bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Q41 ANN via random-hyperplane LSH buckets + multi-probe --------------
    // AnnBits deterministic +-1 hyperplanes (2^16 buckets; see the AnnBits
    // scaladoc for production sizing toward 20-24 bits), then exact cosine
    // re-rank over the probed buckets. Multi-probe (r4): the query searches
    // its own bucket plus every sign-flip subset of its AnnProbePlanes
    // lowest-|projection| planes — 2^AnnProbePlanes buckets per query, still
    // one hash-equality join, instead of the old 8-bit design whose re-rank
    // set was n/256 of the corpus forever. The probe set is computed on the
    // (broadcast) query side only; the corpus is hashed once.
    QueryDef("q41_ann_lsh",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val nb = AnnBits
        val nProbe = 1 << AnnProbePlanes
        // corpus hashing is the scan-dominant cost: one codegen pass
        // computes all nb projections + the packed bucket per row
        val bucketed = t(s, d, "embeddings")
          .withColumn("bucket", expr(s"hyperplane_bucket(embedding, $nb)"))
        // lowest-|projection| plane indices, rank-ordered: sort (|proj|, p)
        // structs lexicographically — deterministic, identical in DuckDB
        val ranked = array_sort(transform(sequence(lit(0), lit(nb - 1)),
          p => struct(abs(element_at(col("projs"), p + 1)).as("a"), p.as("i"))))
        val probeMask = (1 to AnnProbePlanes).map { j =>
          when(expr(s"(m div ${1 << (j - 1)}) % 2") === 1,
            expr(s"shiftleft(CAST(1 AS BIGINT), element_at(flips, $j))"))
            .otherwise(lit(0L))
        }.reduce(_ + _)
        val probes = t(s, d, "embeddings").filter(col("vec_id") === 0)
          .withColumn("projs", expr(s"hyperplane_projs(embedding, $nb)"))
          .withColumn("qb", bucketFromProjs(col("projs"), nb))
          .withColumn("flips",
            slice(transform(ranked, x => x.getField("i")), 1, AnnProbePlanes))
          .select(col("embedding").as("qe"), col("qb"), col("flips"),
            explode(sequence(lit(0), lit(nProbe - 1))).as("m"))
          // flips are distinct planes, so adding the selected powers of two
          // equals XOR-ing them in; 2^AnnProbePlanes distinct probe values
          .select(col("qe"), col("qb").bitwiseXOR(probeMask).as("probe"))
        bucketed.filter(col("vec_id") =!= 0)
          .join(graft.BroadcastBounds.bounded("single-query-probe")(probes),
            col("bucket") === col("probe"))
          .select(col("vec_id"), r4(expr("cosine_sim(embedding, qe)")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(5)
      },
      // the hyperplane signs are pure integer arithmetic -> portable; the
      // probe-subset expansion is the same m-bit-decode in both dialects
      Some(s"""WITH pr AS (SELECT vec_id, embedding,
             |    list_transform(generate_series(0, ${AnnBits - 1}), p ->
             |      list_sum(list_transform(generate_series(0, len(embedding) - 1), i ->
             |        CAST(embedding[i + 1] AS DOUBLE) *
             |        (CASE WHEN (i * 2654435761 + p * 40503) % 97 < 48
             |         THEN 1.0 ELSE -1.0 END)))) AS projs
             |  FROM embeddings),
             |b AS (SELECT vec_id, embedding, projs,
             |    CAST(list_sum(list_transform(generate_series(0, ${AnnBits - 1}), p ->
             |      CASE WHEN projs[p + 1] > 0 THEN CAST(2 ** p AS BIGINT)
             |        ELSE 0 END)) AS BIGINT) AS bucket
             |  FROM pr),
             |q AS (SELECT embedding AS qe, bucket AS qb,
             |    list_transform(list_sort(list_transform(
             |        generate_series(0, ${AnnBits - 1}), p ->
             |      [abs(projs[p + 1]), CAST(p AS DOUBLE)])), x ->
             |      CAST(x[2] AS INT))[1:$AnnProbePlanes] AS flips
             |  FROM b WHERE vec_id = 0),
             |probes AS (SELECT qe, xor(qb,
             |    CAST(list_sum(list_transform(generate_series(1, $AnnProbePlanes), j ->
             |      CASE WHEN (m // CAST(2 ** (j - 1) AS BIGINT)) % 2 = 1
             |        THEN CAST(2 ** flips[j] AS BIGINT) ELSE 0 END)) AS BIGINT)) AS probe
             |  FROM q CROSS JOIN (SELECT UNNEST(generate_series(0,
             |    ${(1 << AnnProbePlanes) - 1})) AS m) ms)
             |SELECT v.vec_id,
             |  CAST(ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
             |    CAST(p.qe AS DOUBLE[])), 4) AS DOUBLE) AS sim
             |FROM b v JOIN probes p ON v.bucket = p.probe
             |WHERE v.vec_id <> 0
             |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin)),

    // Q42 multimodal plumbing: opaque binary media + stubbed decode --------
    // PROMOTED to a full hash oracle (r15, the q96 argument): the media
    // column is BUILT from documents.text, so the P5 wrap, the real
    // decode's byte stats (mean + entropy over the zero-padded samples,
    // entropy folded in byte-histogram order via list_reduce so float
    // order matches the driver loop; math.rint == round_even, NOT
    // ROUND), the stub decoder's fake dims, and the sha256-over-media
    // prefix all reconstruct in SQL (DuckDB sha256 hashes VARCHAR bytes,
    // NUL-safe — verified against byte-level hashing).
    QueryDef("q42_multimodal_features",
      (s, d) => graft.operators.Multimodal.features(s, d),
      Some(s"""WITH $MEDIA_SQL_CTES,
             |st AS MATERIALIZED (
             |  SELECT id, SUM(c) AS total, SUM(b * c) AS bytesum,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      array_agg(-(c / CAST(tot AS DOUBLE))
             |        * ln(c / CAST(tot AS DOUBLE)) / ln(CAST(2 AS DOUBLE))
             |        ORDER BY b)), (acc, e) -> acc + e) AS ent
             |  FROM (SELECT id, b, c,
             |      SUM(c) OVER (PARTITION BY id) AS tot FROM (
             |    SELECT mm.id, ascii(substr(mm.samples, p.p, 1)) AS b,
             |      COUNT(*) AS c
             |    FROM mm CROSS JOIN
             |      UNNEST(generate_series(1, length(mm.samples))) AS p(p)
             |    GROUP BY 1, 2)) q
             |  GROUP BY id)
             |SELECT mm.id, mm.kind,
             |  CAST(length(mm.media) AS INT) AS n_bytes,
             |  CAST(CASE WHEN mm.kind = '1' THEN mm.w
             |    ELSE 16 + GREATEST(length(mm.media), 1) % 640 END AS INT)
             |    AS width,
             |  CAST(CASE WHEN mm.kind = '1' THEN mm.h
             |    ELSE 16 + (GREATEST(length(mm.media), 1) // 7) % 480 END
             |    AS INT) AS height,
             |  round_even(COALESCE(st.bytesum, 0)
             |    / CAST(GREATEST(COALESCE(st.total, 0), 1) AS DOUBLE)
             |    * 10000, 0) / 10000 AS mean_byte,
             |  round_even(COALESCE(st.ent, 0.0) * 10000, 0) / 10000
             |    AS entropy_bits,
             |  substr(sha256(mm.media), 1, 16) AS sha,
             |  CASE WHEN mm.kind = '1' THEN 'pnm' ELSE 'stub' END
             |    AS decoder
             |FROM mm LEFT JOIN st USING (id)
             |ORDER BY id""".stripMargin)),

    // Q42b resize + frame-sample. Deterministic per-doc summary of both
    // operators: source/target dims and a thumb digest from resize,
    // sampled-frame count and total frame bytes from the frame sampler.
    // The thumb/frame payloads themselves stay out of the result — they
    // ride prunable binary columns and this summary only forces the
    // digests/lengths. PROMOTED to a full hash oracle (r15, the q96/q42
    // argument): the 16x16 nearest-neighbor resample (kind-1 P5), the
    // stub sampled-byte grid (the 2654435761 Knuth-hash index walk, via
    // HUGEINT so the multiply never wraps), and the frame slicing
    // arithmetic all reconstruct in SQL from the text-derived media;
    // thumb bytes rebuild as chr() strings (ASCII + NUL padding, so the
    // sha256-over-VARCHAR equals the byte hash). MultimodalSpec keeps
    // the pixel-semantics laws.
    QueryDef("q42b_multimodal_resize",
      (s, d) => {
        val resized = graft.operators.Multimodal.resize(s, d, 16, 16)
          .select(col("id"), col("kind"), col("width"), col("height"),
            col("out_width"), col("out_height"),
            substring(sha2(col("thumb"), 256), 1, 16).as("thumb_sha"))
        val frames = graft.operators.Multimodal.sampleFrames(s, d)
          .groupBy(col("id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(length(col("frame"))).as("frame_bytes"))
        resized.join(frames, Seq("id"), "left")
          .na.fill(0L, Seq("n_frames", "frame_bytes"))
          .orderBy("id")
      },
      Some(s"""WITH $MEDIA_SQL_CTES,
             |th AS MATERIALIZED (
             |  SELECT id,
             |    CASE WHEN kind = '1' THEN
             |      array_to_string(list_transform(generate_series(0, 255),
             |        i -> substr(samples,
             |          LEAST((i // 16) * h // 16, h - 1) * w
             |            + LEAST((i % 16) * w // 16, w - 1) + 1, 1)), '')
             |    WHEN length(media) = 0 THEN repeat(chr(0), 256)
             |    ELSE array_to_string(list_transform(generate_series(0, 255),
             |      i -> substr(media,
             |        CAST((CAST(i AS HUGEINT) * 2654435761)
             |          % length(media) AS BIGINT) + 1, 1)), '')
             |    END AS thumb,
             |    CASE WHEN kind = '1' THEN w
             |      ELSE 16 + GREATEST(length(media), 1) % 640 END AS width,
             |    CASE WHEN kind = '1' THEN h
             |      ELSE 16 + (GREATEST(length(media), 1) // 7) % 480 END
             |      AS height
             |  FROM mm),
             |fr AS MATERIALIZED (
             |  SELECT mm.id, COUNT(*) AS n_frames,
             |    SUM(LEAST(st + flen, n) - st) AS frame_bytes
             |  FROM (SELECT id, length(media) AS n,
             |      GREATEST(length(media) // 16, 1) AS flen FROM mm) mm
             |  CROSS JOIN (SELECT UNNEST([0, 4, 8, 12]) AS f) f
             |  CROSS JOIN LATERAL
             |    (SELECT LEAST(f.f * mm.flen, mm.n - 1) AS st) s
             |  WHERE mm.n > 0
             |  GROUP BY mm.id)
             |SELECT t.id, m2.kind,
             |  CAST(t.width AS INT) AS width,
             |  CAST(t.height AS INT) AS height,
             |  16 AS out_width, 16 AS out_height,
             |  substr(sha256(t.thumb), 1, 16) AS thumb_sha,
             |  COALESCE(fr.n_frames, 0) AS n_frames,
             |  CAST(COALESCE(fr.frame_bytes, 0) AS BIGINT) AS frame_bytes
             |FROM th t JOIN mm m2 USING (id) LEFT JOIN fr USING (id)
             |ORDER BY t.id""".stripMargin)),

    // Q96 image near-dup via perceptual hash (r8) --------------------------
    // The image-side twin of q36's simhash: byte-DISTINCT but pixel-CLOSE
    // images (re-crawls, re-encodes — Multimodal.phashes stamps noisy
    // copies so real pairs exist) collapse onto 64-bit aHashes within small
    // hamming distance, which exact-sha dedup (q30/q42's sha256) cannot
    // see. Blocking: 8 bands x 8 bits — by pigeonhole ANY pair with
    // hamming <= 7 shares at least one untouched band, so recall at the
    // <= 6 threshold is exact, never probabilistic (MultimodalSpec pins
    // pair-set equality vs a brute-force rescan). Scale shape: decode +
    // hash is one partition-wise scan pass; the self-join runs per
    // (band_idx, band_value) bucket — never all-pairs; at corpus scale the
    // band width grows with log n exactly as q36's scaladoc prescribes.
    QueryDef("q96_image_phash_neardup",
      (s, d) => {
        val p = graft.operators.Multimodal.phashes(s, d).toDF()
        val bands = p.select(col("id"), col("phash"),
          explode(array((0 until 8).map(b =>
            struct(lit(b).as("bi"),
              shiftrightunsigned(col("phash"), b * 8)
                .bitwiseAND(lit(0xFFL)).as("bv"))): _*)).as("band"))
          .select(col("id"), col("phash"),
            col("band.bi").as("bi"), col("band.bv").as("bv"))
        bands.alias("a").join(bands.alias("b"),
            col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
              col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            bit_count(col("a.phash").bitwiseXOR(col("b.phash")))
              .as("hamming"))
          .filter(col("hamming") <= 6)
          .distinct()
          .orderBy("id_a", "id_b")
      },
      // PROMOTED to a full hash oracle (r15): the media column is BUILT
      // from documents.text (Multimodal.mediaTable wraps kind-1 texts as
      // netpbm P5), so the whole decode -> noisy-stamp -> 8x8 nearest-
      // neighbor thumb -> aHash -> band self-join chain reconstructs in
      // SQL from first principles: P5 geometry w=min(len,64),
      // h=ceil(len/w), header "P5\n{w} {h}\n255\n" (its length decides
      // which PIXEL each 16-byte noisy stamp lands on), pixel j = the
      // text byte's ASCII code (zero-padded), and the 64-bit hash
      // accumulates via HUGEINT SHIFTS — DuckDB's ** returns DOUBLE,
      // whose 53-bit mantissa silently zeroes the low hash bits (caught
      // by this oracle's own hash en route). MultimodalSpec keeps the
      // brute-force pair-set law.
      Some("""WITH base AS MATERIALIZED (
             |  SELECT doc_id AS id, text, length(text) AS l,
             |    GREATEST(length(text), 1) AS n
             |  FROM documents WHERE doc_id % 3 = 1),
             |geom AS MATERIALIZED (
             |  SELECT id, text, l, LEAST(n, 64) AS w,
             |    (n + LEAST(n, 64) - 1) // LEAST(n, 64) AS h
             |  FROM base),
             |hdr AS MATERIALIZED (
             |  SELECT *, 9 + length(CAST(w AS VARCHAR))
             |      + length(CAST(h AS VARCHAR)) AS hl
             |  FROM geom),
             |imgs AS MATERIALIZED (
             |  SELECT id, text, l, w, h, hl, FALSE AS noisy FROM hdr
             |  UNION ALL
             |  SELECT id + 1000000, text, l, w, h, hl, TRUE
             |  FROM hdr WHERE id % 10 = 1),
             |thumb AS MATERIALIZED (
             |  SELECT i.id, t.ti,
             |    CASE WHEN pj < i.l THEN ascii(substr(i.text, pj + 1, 1))
             |      ELSE 0 END
             |      + CASE WHEN i.noisy AND (i.hl + pj) % 16 = 0
             |          AND i.hl + pj >= 16 THEN 1 ELSE 0 END AS px
             |  FROM imgs i
             |  CROSS JOIN (SELECT UNNEST(generate_series(0, 63)) AS ti) t
             |  CROSS JOIN LATERAL (SELECT
             |      LEAST((t.ti // 8) * i.h // 8, i.h - 1) * i.w
             |        + LEAST((t.ti % 8) * i.w // 8, i.w - 1) AS pj) s),
             |ph AS MATERIALIZED (
             |  SELECT id,
             |    SUM(CASE WHEN px > mean THEN CAST(1 AS HUGEINT) << ti
             |        ELSE CAST(0 AS HUGEINT) END) AS uph
             |  FROM (SELECT id, ti, px,
             |      SUM(px) OVER (PARTITION BY id) / 64.0 AS mean
             |    FROM thumb) q
             |  GROUP BY id),
             |bands AS MATERIALIZED (
             |  SELECT id, uph, b.bi,
             |    CAST((uph >> (8 * b.bi)) % 256 AS BIGINT) AS bv
             |  FROM ph CROSS JOIN
             |    (SELECT UNNEST(generate_series(0, 7)) AS bi) b),
             |pairs AS (
             |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             |    CAST(bit_count(xor(
             |      CAST(CASE WHEN a.uph >= CAST(1 AS HUGEINT) << 63
             |        THEN a.uph - (CAST(1 AS HUGEINT) << 64)
             |        ELSE a.uph END AS BIGINT),
             |      CAST(CASE WHEN b.uph >= CAST(1 AS HUGEINT) << 63
             |        THEN b.uph - (CAST(1 AS HUGEINT) << 64)
             |        ELSE b.uph END AS BIGINT))) AS INT) AS hamming
             |  FROM bands a JOIN bands b
             |    ON a.bi = b.bi AND a.bv = b.bv AND a.id < b.id)
             |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 6
             |ORDER BY id_a, id_b""".stripMargin)),

    // Q51 near-dup connected components (r5; delta iteration r7) -----------
    // The step every dedup campaign ends with: candidate pairs -> connected
    // components -> canonical doc (MIN id) per component. Components are
    // computed over the UNthresholded q35 candidate stream — exactly the
    // case where the star-edge cap provably preserves connectivity (see the
    // LshBucketCap scaladoc).
    //
    // Spark-first shape: frontier-bounded min-label propagation with
    // chained pointer doubling — see propagateComponents' scaladoc for the
    // full scale rationale (per-round probe volume shrinks with the
    // unconverged frontier; rounds ~ log3(diameter), which the star-edge
    // rewrite keeps tiny for hot clusters). The DuckDB oracle computes the
    // same fixpoint as a recursive-CTE transitive closure (fine at oracle
    // SF; the iterative form is the one that scales).
    QueryDef("q51_neardup_components",
      (s, d) => {
        val labels = neardupLabels(s, d)
        labels
          .select(col("doc_id"), col("comp"),
            (col("doc_id") === col("comp")).as("is_canonical"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $MINHASH_BANDS_SQL,
             |$MINHASH_PAIRS_SQL,
             |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
             |          UNION ALL SELECT doc_b, doc_a FROM pairs),
             |reach AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
             |comp AS (SELECT src AS doc_id, MIN(dst) AS mincomp
             |         FROM reach GROUP BY src)
             |SELECT d.doc_id AS doc_id,
             |  LEAST(d.doc_id, COALESCE(c.mincomp, d.doc_id)) AS comp,
             |  d.doc_id = LEAST(d.doc_id, COALESCE(c.mincomp, d.doc_id))
             |    AS is_canonical
             |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Q55 deterministic stratified sampling (r5) ---------------------------
    // Corpus MIXING: down-sample each language stratum to a declared target
    // rate with a salted-hash gate — pmod of the doc's md5 prefix against
    // the rate — instead of rand(): the kept SET is a pure function of
    // (salt, doc_id), so mixtures are reproducible across runs, engines
    // and cluster layouts, and re-running with a larger rate keeps every
    // previously kept doc (nested samples, the property curriculum
    // schedules rely on). Zero shuffle until the per-stratum audit
    // aggregate; the kept-id checksum pins the exact selected set, not just
    // its size. The checksum is a plain BIGINT sum: DECIMAL(38,0) has more
    // than one cross-engine rendering (it kept this row hash-red for three
    // driver rounds on value-identical output), while BIGINT has exactly
    // one. Id sums fit a long at any plausible SF (sum of n ids ~ n^2/2;
    // overflow would need ~4e9 docs in ONE stratum, and both engines wrap
    // identically past it).
    QueryDef("q55_stratified_sample",
      (s, d) => {
        val rates = Seq("de" -> 0.50, "en" -> 1.00, "es" -> 0.25,
          "fr" -> 0.25, "zh" -> 0.10)
        val rate = rates.foldRight(lit(0.10)) { case ((lang, r), els) =>
          when(col("lang") === lang, lit(r)).otherwise(els)
        }
        t(s, d, "documents")
          .withColumn("keep", sampleGate < (rate * 10000).cast(LongType))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_total"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            r4(sum(when(col("keep"), 1L).otherwise(0L)).cast(DoubleType)
              / count(lit(1))).as("achieved_rate"),
            sum(when(col("keep"), col("doc_id")).otherwise(0L))
              .as("kept_id_checksum"))
          .orderBy("lang")
      },
      Some("""WITH g AS (SELECT lang, doc_id,
             |    CAST(list_sum(list_transform(generate_series(1, 8), i ->
             |      (strpos('0123456789abcdef',
             |         substr(md5('mix1|' || CAST(doc_id AS VARCHAR)), i, 1)) - 1)
             |        * CAST(16 ** (8 - i) AS BIGINT))) AS BIGINT) % 10000 AS gate,
             |    CASE lang WHEN 'de' THEN 0.50 WHEN 'en' THEN 1.00
             |      WHEN 'es' THEN 0.25 WHEN 'fr' THEN 0.25 WHEN 'zh' THEN 0.10
             |      ELSE 0.10 END AS rate
             |  FROM documents),
             |k AS (SELECT lang, doc_id,
             |    gate < CAST(rate * 10000 AS BIGINT) AS keep FROM g)
             |SELECT lang,
             |  COUNT(*) AS n_total,
             |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
             |    / COUNT(*), 4) AS DOUBLE) AS achieved_rate,
             |  CAST(SUM(CASE WHEN keep THEN doc_id ELSE 0 END)
             |    AS BIGINT) AS kept_id_checksum
             |FROM k GROUP BY lang ORDER BY lang""".stripMargin)),

    // Q113 exact-quota stratified sampling (r12) ---------------------------
    // q55's sibling for the FIXED-SIZE case: carve exactly
    // min(quota, |stratum|) docs per language — the eval-set/calibration
    // carving operation, where "10% of the stratum" (q55's rate gate) is
    // the wrong contract and "exactly 30 docs" is the requirement.
    // Selection = the quota smallest (salted-hash, doc_id) keys per
    // stratum: uniform in the hash sense, reproducible on any cluster,
    // and RANK-NESTED — quota 15 is a strict prefix of quota 30 under
    // the same salt, so a larger eval set always contains the smaller
    // (MixingSpec pins both laws). Fresh salt => independent of q55/q74
    // draws and q88's splits (the family's independence contract).
    //
    // Scale shape: the rank is a per-stratum window whose rk <= quota
    // filter pushes a partial WindowGroupLimit below the exchange — each
    // map task forwards at most `quota` rows per stratum, so a
    // mega-stratum never materializes its full sort anywhere
    // (QueryPlanSpec pins the partial group-limit, q87's mechanism).
    QueryDef("q113_quota_sample",
      (s, d) => quotaSample(s, d, QuotaPerStratum),
      Some(s"""WITH g AS (SELECT lang, doc_id,
             |    CAST(list_sum(list_transform(generate_series(1, 8), i ->
             |      (strpos('0123456789abcdef',
             |         substr(md5('quota1|' || CAST(doc_id AS VARCHAR)), i, 1)) - 1)
             |        * CAST(16 ** (8 - i) AS BIGINT))) AS BIGINT) AS hk
             |  FROM documents),
             |r AS (SELECT lang, doc_id,
             |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id)
             |      AS rk
             |  FROM g)
             |SELECT lang, CAST(rk AS INT) AS rk, doc_id
             |FROM r WHERE rk <= $QuotaPerStratum
             |ORDER BY lang, rk""".stripMargin)),

    // Q56 benchmark decontamination (r5) -----------------------------------
    // The eval-leakage check every training corpus needs: flag training
    // documents sharing >= 2 distinct word-8-gram shingles with a held-out
    // benchmark set (stand-in here: doc_id % 19 == 0). Shingles are built
    // LAMBDA-FREE (8 slices + arrays_zip, the q52 lesson: a transform
    // lambda inlined into Catalyst's inferred explode filter re-evaluates
    // split per element). Scale shape: the benchmark side is tiny by
    // construction (eval sets are thousands of docs, not billions), so its
    // distinct shingle set BROADCASTS and the training corpus is one
    // shuffle-free scan + one partial-agg groupBy per contaminated doc.
    QueryDef("q56_decontamination",
      (s, d) => {
        def shingles(df: DataFrame): DataFrame = wordShingles(df)
        val toks = docsWithTokens(s, d)
        // bench side pre-aggregated to ONE row per shingle (carrying its
        // bench-doc count): without this, a boilerplate shingle shared by
        // many train docs AND many bench docs multiplies in the join —
        // train_rows x bench_rows per hot key, the quadratic blowup the
        // 10x hot-cluster run exposed (15s -> 2s). The price is reporting
        // bench HITS (sum of per-shingle bench-doc counts, an upper bound
        // of distinct bench docs) instead of a distinct count — the audit
        // quantity operators actually rank leaks by.
        val bench = shingles(toks.filter(col("doc_id") % 19 === 0))
          .groupBy("sh").agg(count(lit(1)).as("n_bench_docs_sh"))
        val train = shingles(toks.filter(col("doc_id") % 19 =!= 0))
        train.join(graft.BroadcastBounds.bounded("bench-shingles")(bench), "sh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shared_shingles"),
            sum(col("n_bench_docs_sh")).as("n_bench_hits"))
          .filter(col("n_shared_shingles") >= 2)
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (SELECT doc_id, w,
             |    unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i
             |  FROM tk),
             |sh AS (SELECT DISTINCT doc_id,
             |    array_to_string(w[i:i+7], ' ') AS sh
             |  FROM idx),
             |bench AS (SELECT sh, COUNT(*) AS n_bench_docs_sh FROM sh
             |          WHERE doc_id % 19 = 0 GROUP BY sh),
             |train AS (SELECT doc_id, sh FROM sh WHERE doc_id % 19 <> 0)
             |SELECT t.doc_id,
             |  COUNT(*) AS n_shared_shingles,
             |  CAST(SUM(b.n_bench_docs_sh) AS BIGINT) AS n_bench_hits
             |FROM train t JOIN bench b ON t.sh = b.sh
             |GROUP BY t.doc_id
             |HAVING COUNT(*) >= 2
             |ORDER BY doc_id""".stripMargin)),

    // Q106 bloom-gated decontamination (r12) -------------------------------
    // q56's SCALE PATH: identical semantics (the oracle IS q56's SQL), a
    // different physical regime. q56 broadcasts the bench shingle table —
    // right while the holdout fits the broadcast ceiling (~2 GB at a
    // 2M-doc holdout per BENCH_NOTES_r12 §2), wrong beyond it, where the
    // fallback is a CORPUS-sized shuffle of every train shingle. Here the
    // bench side compresses to a ~1.2 MB/M-shingle bloom SKETCH (one
    // aggregate, bitmap-OR merge), shipped as a plan literal into a
    // codegen'd scan-side predicate (Spark's own runtime-filter kernel,
    // which InjectRuntimeFilter cannot place here because the key is an
    // exploded shingle behind a generator) — so the corpus-sized stream
    // dies AT THE SCAN and only ~fpp of it plus the true hits reach the
    // exact confirm join. That join is deliberately UN-broadcast: its
    // probe side is survivor-sized, its build side holdout-sized, and
    // both shuffle cheaply at any corpus scale. False positives add
    // survivors, never results — the string-keyed confirm join removes
    // them, so the output is exact (hash-equal to q56's).
    QueryDef("q106_bloom_decontamination",
      (s, d) => {
        val (_, survivors, bench) = bloomDecontamParts(s, d)
        survivors.join(bench, "sh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shared_shingles"),
            sum(col("n_bench_docs_sh")).as("n_bench_hits"))
          .filter(col("n_shared_shingles") >= 2)
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (SELECT doc_id, w,
             |    unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i
             |  FROM tk),
             |sh AS (SELECT DISTINCT doc_id,
             |    array_to_string(w[i:i+7], ' ') AS sh
             |  FROM idx),
             |bench AS (SELECT sh, COUNT(*) AS n_bench_docs_sh FROM sh
             |          WHERE doc_id % 19 = 0 GROUP BY sh),
             |train AS (SELECT doc_id, sh FROM sh WHERE doc_id % 19 <> 0)
             |SELECT t.doc_id,
             |  COUNT(*) AS n_shared_shingles,
             |  CAST(SUM(b.n_bench_docs_sh) AS BIGINT) AS n_bench_hits
             |FROM train t JOIN bench b ON t.sh = b.sh
             |GROUP BY t.doc_id
             |HAVING COUNT(*) >= 2
             |ORDER BY doc_id""".stripMargin)),

    // Q101 fuzzy decontamination (r12) -------------------------------------
    // The GRADED twin of q56's binary >=2-shared-shingles flag: for every
    // training doc, the MAXIMUM Jaccard similarity of its word-8-gram
    // shingle set against any single benchmark doc (the GPT-3 appendix-C /
    // Dolma overlap-decontamination measure), with the best-matching bench
    // doc named. Output is the top-50 report ordered by similarity — the
    // artifact an operator actually reviews before dropping docs.
    //
    // Scale shape: shingles materialize once (corpus scan + the distinct's
    // exchange); the bench side is holdout-sized; the train x bench join is
    // keyed on the shingle and BOUNDED by the bench df cap (see
    // FuzzyShingleDfCap — Jaccard needs per-PAIR intersections, so without
    // the cap one boilerplate shingle multiplies train_df x bench_df rows;
    // with it, join fan-out per train shingle is <= cap). Pair
    // intersections partial-aggregate on (t_doc, b_doc) before their
    // exchange; per-doc sizes attach by keyed joins; the per-train argmax
    // is a window over candidate pairs only (bounded partitions — a train
    // doc has at most |shared shingles| candidates); the global top-50 is
    // TakeOrderedAndProject. Jaccard ratios are exact small-integer
    // divisions, so cross-engine ordering is bit-stable.
    QueryDef("q101_fuzzy_decontamination",
      (s, d) => {
        val sh = wordShingles(docsWithTokens(s, d))
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val bench = sh.filter(col("doc_id") % 19 === 0)
          .select(col("doc_id").as("b_doc"), col("sh"))
        val bdf = bench.groupBy("sh").agg(count(lit(1)).as("df"))
        val usable = bench.join(
          bdf.filter(col("df") <= FuzzyShingleDfCap).select("sh"), "sh")
        val train = sh.filter(col("doc_id") % 19 =!= 0)
          .select(col("doc_id").as("t_doc"), col("sh"))
        val inter = train.join(usable, "sh")
          .groupBy("t_doc", "b_doc").agg(count(lit(1)).as("n_inter"))
        val j = inter
          .join(sizes.select(col("doc_id").as("t_doc"), col("n_sh").as("n_t")),
            "t_doc")
          .join(sizes.select(col("doc_id").as("b_doc"), col("n_sh").as("n_b")),
            "b_doc")
          .withColumn("jacc", col("n_inter").cast(DoubleType)
            / (col("n_t") + col("n_b") - col("n_inter")).cast(DoubleType))
        j.withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("t_doc")
              .orderBy(col("jacc").desc, col("b_doc"))))
          .filter(col("rk") === 1)
          .select(col("t_doc").as("doc_id"), col("b_doc").as("bench_doc"),
            r4(col("jacc")).as("max_jaccard"),
            (col("jacc") >= FuzzyTau).as("contaminated"))
          .orderBy(col("max_jaccard").desc, col("doc_id"))
          .limit(50)
      },
      Some(s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (SELECT doc_id, w,
             |    unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i FROM tk),
             |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS sh
             |  FROM idx),
             |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
             |bench AS (SELECT doc_id AS b_doc, sh FROM sh WHERE doc_id % 19 = 0),
             |bdf AS (SELECT sh FROM bench GROUP BY sh
             |        HAVING COUNT(*) <= $FuzzyShingleDfCap),
             |usable AS (SELECT b_doc, b.sh FROM bench b JOIN bdf USING (sh)),
             |train AS (SELECT doc_id AS t_doc, sh FROM sh WHERE doc_id % 19 <> 0),
             |inter AS (SELECT t_doc, b_doc, COUNT(*) AS n_inter
             |  FROM train t JOIN usable u ON t.sh = u.sh GROUP BY t_doc, b_doc),
             |j AS (SELECT t_doc, b_doc,
             |    CAST(n_inter AS DOUBLE)
             |      / CAST(st.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jacc
             |  FROM inter JOIN sizes st ON st.doc_id = t_doc
             |             JOIN sizes sb ON sb.doc_id = b_doc),
             |best AS (SELECT t_doc, b_doc, jacc,
             |    ROW_NUMBER() OVER (PARTITION BY t_doc
             |      ORDER BY jacc DESC, b_doc) AS rk FROM j)
             |SELECT t_doc AS doc_id, b_doc AS bench_doc,
             |  CAST(ROUND(jacc, 4) AS DOUBLE) AS max_jaccard,
             |  jacc >= $FuzzyTau AS contaminated
             |FROM best WHERE rk = 1
             |ORDER BY max_jaccard DESC, doc_id LIMIT 50""".stripMargin)),

    // Q102 incremental ingest dedup (r12) ----------------------------------
    // THE production crawl-ingest operator: an ARRIVING batch (doc_id % 10
    // = 7, ~10% of the corpus) is classified against the STORED corpus —
    // 'exact' (fingerprint already indexed), 'near' (shares a MinHash band
    // bucket with a stored doc), or 'novel' — with the stored anchor named
    // and the signature agreement est_sim attached. The batch twin of
    // q53's streaming ingest-dedup, against a persistent index instead of
    // watermarked state; in-batch duplicates are q30's job, not this one's.
    //
    // The signature is MinHash over word-5-GRAM shingle sets (the
    // RefinedWeb/Dolma near-dup unit), NOT q35's token sets: on any corpus
    // with a shared vocabulary, token SETS converge (every long doc
    // contains the common tokens, so token-set Jaccard ~ 1 and 'near'
    // would fire on everything — measured: 49/50 on this corpus); shingle
    // sets stay document-specific, so the band test discriminates. Docs
    // shorter than 5 tokens fall back to their raw token set (both
    // engines). Same 12-hash family, 3 bands x 4 rows.
    //
    // Scale shape: the stored side participates ONLY as two pre-aggregated
    // indexes — one row per fingerprint (16-byte md5) and ONE ROW PER BAND
    // BUCKET (min stored doc id): a hot bucket (near-dup cluster of half
    // the corpus) is one index row here, so no pair stream exists anywhere
    // — unlike q35, membership needs no within-bucket pairs. Both probe
    // joins are keyed and batch-sized on the probe side; anchors resolve
    // per batch doc by a partial-aggregatable min; the est_sim re-attach
    // touches <= 1 stored signature per batch doc. The shingle expansion
    // is a per-row Project (the signature never sees a shuffle). In
    // production the two index tables persist between ingests (here both
    // build from the stored partition — the build is one scan + two
    // partial aggs).
    QueryDef("q102_ingest_dedup",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val sig = ingestSig(t(s, d, "documents"))
        val stored = sig.filter(col("doc_id") % 10 =!= 7)
        val batch = sig.filter(col("doc_id") % 10 === 7)
        classifyAgainstIndex(batch, fpIndexOf(stored), bandIndexOf(stored),
            stored.select(col("doc_id"), col("sigl")))
          .orderBy("doc_id")
      },
      Some(s"""WITH $INGEST_SIG_SQL,
             |stored AS (SELECT doc_id FROM documents WHERE doc_id % 10 <> 7),
             |batch AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 7),
             |fpidx AS (SELECT fp, MIN(f.doc_id) AS exact_anchor
             |  FROM fps f JOIN stored s ON s.doc_id = f.doc_id GROUP BY fp),
             |sbuck AS (SELECT b, bv, MIN(bd.doc_id) AS band_anchor
             |  FROM bands bd JOIN stored s ON s.doc_id = bd.doc_id
             |  GROUP BY b, bv),
             |nearx AS (SELECT bd.doc_id, MIN(band_anchor) AS near_anchor
             |  FROM bands bd JOIN batch ba ON ba.doc_id = bd.doc_id
             |  JOIN sbuck sb ON sb.b = bd.b AND sb.bv = bd.bv
             |  GROUP BY bd.doc_id),
             |cls AS (SELECT ba.doc_id, fx.exact_anchor, nx.near_anchor,
             |    CASE WHEN fx.exact_anchor IS NOT NULL THEN 'exact'
             |         WHEN nx.near_anchor IS NOT NULL THEN 'near'
             |         ELSE 'novel' END AS status,
             |    COALESCE(fx.exact_anchor, nx.near_anchor) AS anchor_doc
             |  FROM batch ba
             |  LEFT JOIN fps f ON f.doc_id = ba.doc_id
             |  LEFT JOIN fpidx fx ON fx.fp = f.fp
             |  LEFT JOIN nearx nx ON nx.doc_id = ba.doc_id)
             |SELECT c.doc_id AS doc_id, c.status AS status, c.anchor_doc AS anchor_doc,
             |  CAST(ROUND(CASE WHEN c.anchor_doc IS NOT NULL THEN
             |    CAST(list_sum(list_transform(generate_series(1, 12),
             |      i -> CASE WHEN sa.sigl[i] = sb.sigl[i] THEN 1 ELSE 0 END))
             |      AS DOUBLE) / 12 END, 4) AS DOUBLE) AS est_sim
             |FROM cls c
             |LEFT JOIN sig sa ON sa.doc_id = c.anchor_doc
             |LEFT JOIN sig sb ON sb.doc_id = c.doc_id
             |ORDER BY c.doc_id""".stripMargin)),

    // Q57 sequence packing (r5, distributed r6) ----------------------------
    // GPT-style concat-and-chunk packing: documents in deterministic order
    // concatenate into one token stream chunked into fixed 2048-token
    // training sequences; each doc's bin is floor((cumsum - n) / 2048) —
    // the sequence its first token lands in. Pure integer arithmetic, so
    // the oracle is exact.
    //
    // Scale shape (r5 verdict item 2): the global running sum is a
    // TWO-LEVEL PREFIX SUM, not a single-partition window. Level 1 shards
    // the order key into ~sqrt(maxId) contiguous doc_id ranges (shard width
    // sqrt(maxId), so shard COUNT is also ~sqrt(maxId) — both levels stay
    // balanced at any corpus size) and computes each shard's local cumsum
    // with an ordinary partitioned window — parallel across shards, each
    // partition bounded by the shard width. Level 2 computes the exclusive
    // running offset of the per-shard token totals: that window IS
    // single-partition, but over the sqrt-sized totals table (an aggregate
    // output, never the corpus — QueryPlanSpec pins this shape), and the
    // offsets broadcast back onto the shards. cum = local_cum + offset,
    // identical to the old global window bit-for-bit. The narrow
    // (doc_id, n_tok) projection is localCheckpoint'ed because both levels
    // read it — without the barrier each branch would re-tokenize the full
    // text column, the actual 100 TB cost.
    QueryDef("q57_sequence_packing",
      (s, d) => {
        val seqLen = 2048
        val docs = t(s, d, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast(LongType).as("n_tok"))
          .localCheckpoint()
        val maxId = docs.agg(coalesce(max("doc_id"), lit(0L))).head().getLong(0)
        val shardWidth =
          math.max(1L, math.ceil(math.sqrt((maxId + 1).toDouble)).toLong)
        val sharded = docs.withColumn("shard", expr(s"doc_id DIV $shardWidth"))
        val localW = Window.partitionBy("shard").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsetW = Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsets = sharded.groupBy("shard")
          .agg(sum(col("n_tok")).as("shard_tok"))
          .withColumn("offset",
            sum(col("shard_tok")).over(offsetW) - col("shard_tok"))
          .select(col("shard"), col("offset"))
        sharded
          .withColumn("local_cum", sum(col("n_tok")).over(localW))
          .join(graft.BroadcastBounds.bounded("sqrt-shard-offsets")(offsets),
            "shard")
          .withColumn("cum", col("local_cum") + col("offset"))
          .withColumn("bin", ((col("cum") - col("n_tok")) / seqLen)
            .cast(LongType))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("sum_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy("bin")
      },
      Some("""WITH t AS (SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |c AS (SELECT doc_id, n_tok,
             |    SUM(n_tok) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM t),
             |b AS (SELECT doc_id, n_tok,
             |    CAST(FLOOR((cum - n_tok) / 2048.0) AS BIGINT) AS bin FROM c)
             |SELECT bin, COUNT(*) AS n_docs,
             |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
             |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
             |FROM b GROUP BY bin ORDER BY bin""".stripMargin)),

    // Q58 repetition filter (r5) -------------------------------------------
    // The Gopher-rules repetition check: per document, the fraction of
    // word-3-gram occurrences taken by the single most frequent 3-gram —
    // looping/boilerplate text scores high and gets flagged (> 0.2, the
    // published duplicate-n-gram threshold family). Lambda-free 3-gram
    // stream (slices + arrays_zip, the q52 lesson); both aggregations are
    // partial-aggregatable groupBys whose keys INCLUDE doc_id, so there is
    // no cross-document hot key at any corpus size.
    QueryDef("q58_repetition_filter",
      (s, d) => {
        val len = greatest(size(col("toks")) - 2, lit(0))
        val grams = docsWithTokens(s, d)
          .withColumn("g1", slice(col("toks"), lit(1), len))
          .withColumn("g2", slice(col("toks"), lit(2), len))
          .withColumn("g3", slice(col("toks"), lit(3), len))
          .select(col("doc_id"),
            explode(arrays_zip(col("g1"), col("g2"), col("g3"))).as("z"))
          .select(col("doc_id"),
            concat_ws(" ", col("z.g1"), col("z.g2"), col("z.g3")).as("gram"))
        grams
          .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id")
          .agg(sum(col("cnt")).as("n_grams"),
            max(col("cnt")).as("top_gram_count"),
            r4(max(col("cnt")).cast(DoubleType) / sum(col("cnt")))
              .as("top_gram_ratio"))
          // flagged compares the ROUNDED ratio on BOTH engines (the oracle
          // wraps the same comparison around its rounded alias): comparing
          // rounded on one side and raw on the other flips the flag for
          // ratios inside the (threshold, threshold + 0.00005) band
          .withColumn("flagged", col("top_gram_ratio") > 0.2)
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (SELECT doc_id, w,
             |    unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
             |  FROM tk),
             |g AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram
             |      FROM idx),
             |c AS (SELECT doc_id, gram, COUNT(*) AS cnt
             |      FROM g GROUP BY doc_id, gram)
             |SELECT doc_id, n_grams, top_gram_count, top_gram_ratio,
             |  top_gram_ratio > 0.2 AS flagged
             |FROM (SELECT doc_id,
             |    CAST(SUM(cnt) AS BIGINT) AS n_grams,
             |    CAST(MAX(cnt) AS BIGINT) AS top_gram_count,
             |    CAST(ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 4) AS DOUBLE)
             |      AS top_gram_ratio
             |  FROM c GROUP BY doc_id) x
             |ORDER BY doc_id""".stripMargin)),

    // Q52 bigram-LM quality score (r5) -------------------------------------
    // CCNet/Gopher-style corpus-LM scoring: train bigram counts on the
    // corpus itself, score every document by its total bigram
    // log-likelihood sum ln P(w_i | w_{i-1}) with P = c(w1,w2) /
    // c_prefix(w1) (n_bigrams rides along, so the mean is derivable).
    // Self-scoring means every scored bigram exists in the counts (no
    // smoothing term), and low per-bigram scores flag outlier text. Scale
    // shape: the count tables are one partial-aggregatable groupBy each;
    // scoring joins them back by key (broadcast at small SF, shuffle join
    // at corpus scale); per-position log terms route through DECIMAL(18,4)
    // before the sum so partial-aggregation order cannot flip the hash
    // (Q.sum4's rule; ln portability itself is proven by q24's oracle).
    // The SUM — not the mean — is the output contract: dividing the
    // 1e-4-quantized sum by small n lands exactly on round-half knife
    // edges often enough to flip hashes between engines (observed at
    // sf0.01: sum -33.8315 / 10 = -3.38315).
    QueryDef("q52_bigram_lm_score",
      (s, d) => {
        // bigram stream as (doc_id, w1, w2) — two-column keys, no string
        // concat/split round-trip (the oracle keys on w1||chr(1)||w2, which
        // only has to produce the same COUNTS). Built with slice+arrays_zip
        // — one-pass array ops, NO per-element lambda: the explode makes
        // Catalyst infer a size(...)>0 filter and push it into the scan
        // with the array expression INLINED; a transform lambda there
        // re-evaluates split(text) per element (O(tokens^2) per row, 3x —
        // measured 6.4s at sf0.1 for a 266k-bigram corpus), while the
        // sliced zip inlines as O(tokens).
        val bg = docsWithTokens(s, d)
          .withColumn("h", slice(col("toks"), lit(1), size(col("toks")) - 1))
          .withColumn("t2", slice(col("toks"), lit(2), size(col("toks")) - 1))
          .select(col("doc_id"), explode(arrays_zip(col("h"), col("t2"))).as("z"))
          .select(col("doc_id"), col("z.h").as("w1"), col("z.t2").as("w2"))
        // the prefix count is the bigram counts re-aggregated (sum over
        // w2) — no second scan of the per-position stream; the ratio table
        // is per-DISTINCT-bigram and joins the stream exactly once
        val bgCounts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
        val prefixCounts = bgCounts.groupBy("w1").agg(sum("c_bg").as("c_w1"))
        val ratio = bgCounts.join(prefixCounts, "w1")
        bg
          .join(ratio, Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).cast(IntegerType).as("n_bigrams"),
            sum4(log(col("c_bg").cast(DoubleType)
              / col("c_w1").cast(DoubleType))).as("sum_logp"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |bg AS (SELECT doc_id, UNNEST(list_transform(
             |    generate_series(1, greatest(len(w) - 1, 0)),
             |    i -> w[i] || chr(1) || w[i+1])) AS bg
             |  FROM tk),
             |bc AS (SELECT bg, COUNT(*) AS c_bg FROM bg GROUP BY bg),
             |pc AS (SELECT split_part(bg, chr(1), 1) AS w1, COUNT(*) AS c_w1
             |       FROM bg GROUP BY 1)
             |SELECT b.doc_id,
             |  CAST(COUNT(*) AS INT) AS n_bigrams,
             |  CAST(ROUND(SUM(CAST(ln(CAST(c.c_bg AS DOUBLE)
             |      / p.c_w1) AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_logp
             |FROM bg b
             |JOIN bc c ON b.bg = c.bg
             |JOIN pc p ON split_part(b.bg, chr(1), 1) = p.w1
             |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin)),

    // Q59 dedup RESOLUTION: best-quality canonical per component (r7) ------
    // What a real dedup campaign keeps is not the minimum doc id but the
    // BEST member of each near-dup cluster. Components come from the shared
    // q51 labels; quality is the distinct-token count (integer, so the
    // hash compare is drift-free); the argmax is the deterministic
    // two-step — per-component MAX(score), then MIN(doc_id) among the tied
    // best — because single-pass arg_max is tie-nondeterministic in both
    // engines. Scale shape: labels (n rows) join the per-doc score on
    // doc_id, two partial-aggregatable groupBys on comp, one (comp, score)
    // join back — everything shuffles on component keys, nothing
    // quadratic, no windows.
    QueryDef("q59_dedup_resolution",
      (s, d) => {
        val labels = neardupLabels(s, d)
        val scored = docsWithTokens(s, d).select(col("doc_id"),
          size(array_distinct(col("toks"))).cast(IntegerType).as("score"))
        val members = labels.join(scored, "doc_id")
        val best = members.groupBy("comp").agg(
          count(lit(1)).as("n_members"), max("score").as("best_score"))
        val canon = members
          .join(best.select(col("comp"), col("best_score").as("score")),
            Seq("comp", "score"))
          .groupBy("comp").agg(min("doc_id").as("canonical_doc"))
        best.join(canon, "comp")
          .select(col("comp"), col("n_members"), col("best_score"),
            col("canonical_doc"))
          .orderBy("comp")
      },
      Some(s"""WITH RECURSIVE $MINHASH_BANDS_SQL,
             |$MINHASH_PAIRS_SQL,
             |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
             |          UNION ALL SELECT doc_b, doc_a FROM pairs),
             |reach AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
             |cmp AS (SELECT src AS doc_id, MIN(dst) AS mincomp
             |        FROM reach GROUP BY src),
             |m AS (SELECT d.doc_id,
             |    LEAST(d.doc_id, COALESCE(c.mincomp, d.doc_id)) AS comp,
             |    CAST(len(list_distinct(string_split(d.text, ' '))) AS INT)
             |      AS score
             |  FROM documents d LEFT JOIN cmp c ON c.doc_id = d.doc_id),
             |b AS (SELECT comp, COUNT(*) AS n_members, MAX(score) AS best_score
             |      FROM m GROUP BY comp),
             |canon AS (SELECT m.comp, MIN(m.doc_id) AS canonical_doc
             |          FROM m JOIN b ON m.comp = b.comp AND m.score = b.best_score
             |          GROUP BY m.comp)
             |SELECT b.comp AS comp, b.n_members AS n_members,
             |  b.best_score AS best_score, canon.canonical_doc AS canonical_doc
             |FROM b JOIN canon ON b.comp = canon.comp
             |ORDER BY comp""".stripMargin)),

    // Q60 deterministic training shuffle + sharding (r7) -------------------
    // The last step before tokenized data hits the trainer: a reproducible
    // global permutation and shard assignment. The shuffle key is the
    // salted-md5 arithmetic q55's sampling gate established (pure function
    // of (salt, doc_id) — re-runs, engines and cluster layouts agree);
    // shard = key mod nShards balances by construction (md5 uniformity),
    // so the per-shard position window is a PARTITIONED window over
    // corpus/nShards rows — no global single-task ordering anywhere. The
    // (key, doc_id) composite order makes positions total even under md5
    // prefix collisions.
    QueryDef("q60_shuffle_shard",
      (s, d) => {
        val nShards = 8
        val key = saltedHash("shard1|")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"))
          .orderBy(col("shuffle_key"), col("doc_id"))
        t(s, d, "documents")
          .select(col("doc_id"), key.as("shuffle_key"))
          .withColumn("shard", pmod(col("shuffle_key"), lit(nShards.toLong))
            .cast(IntegerType))
          .withColumn("pos", row_number().over(w).cast(LongType))
          .select(col("doc_id"), col("shuffle_key"), col("shard"), col("pos"))
          .orderBy("doc_id")
      },
      Some("""WITH k AS (SELECT doc_id,
             |    CAST(list_sum(list_transform(generate_series(1, 8), i ->
             |      (strpos('0123456789abcdef',
             |         substr(md5('shard1|' || CAST(doc_id AS VARCHAR)), i, 1)) - 1)
             |        * CAST(16 ** (8 - i) AS BIGINT))) AS BIGINT) AS shuffle_key
             |  FROM documents)
             |SELECT doc_id, shuffle_key,
             |  CAST(shuffle_key % 8 AS INT) AS shard,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_key % 8
             |    ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
             |FROM k ORDER BY doc_id""".stripMargin)),

    // Q61 dataset card: per-(source, lang) corpus audit (r7) ---------------
    // The report every training-data pipeline emits before mixing: how
    // much of each source survives, how duplicated it is, what its token
    // economics look like. Exact-dup flags come from a corpus-wide md5
    // group (shuffle on the content hash — the one global key; everything
    // after is partial-aggregatable on (source, lang)). Per-doc ratios are
    // rounded to 4 places BEFORE averaging so both engines aggregate
    // identical inputs; the averages go through the exact-decimal-sum
    // helpers like every other float aggregate in this file.
    // Q88 deterministic train/val/test split (r8) --------------------------
    // The split every training run starts from: 80/10/10 by the salted-md5
    // gate under its OWN salt ("split1|" — independent of q55/q74's
    // sampling draws, nested-subset property preserved within each salt).
    // Membership is per-row arithmetic (no shuffle, no state, same
    // assignment on any cluster at any scale); the audit pins per-split
    // counts, an exact id checksum (the selected SET, not just its size —
    // BIGINT, the one-canonical-rendering type; see q55's scaladoc) and
    // shares. Disjoint + covering by construction: CASE on one gate.
    QueryDef("q88_train_val_test",
      (s, d) => {
        val gate = saltedGate("split1|")
        val w = org.apache.spark.sql.expressions.Window.partitionBy()
        t(s, d, "documents")
          .withColumn("split",
            when(gate < 8000, "train").when(gate < 9000, "val")
              .otherwise("test"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_checksum"))
          // 3-row post-aggregation window (share of corpus), never the corpus
          .withColumn("share",
            f4(col("n_docs").cast(DoubleType) / sum(col("n_docs")).over(w)))
          .orderBy("split")
      },
      Some("""WITH g AS (SELECT doc_id,
             |    CAST(list_sum(list_transform(generate_series(1, 8), i ->
             |      (strpos('0123456789abcdef',
             |         substr(md5('split1|' || CAST(doc_id AS VARCHAR)), i, 1)) - 1)
             |        * CAST(16 ** (8 - i) AS BIGINT))) AS BIGINT) % 10000 AS gate
             |  FROM documents),
             |a AS (SELECT CASE WHEN gate < 8000 THEN 'train'
             |    WHEN gate < 9000 THEN 'val' ELSE 'test' END AS split, doc_id
             |  FROM g),
             |c AS (SELECT split, COUNT(*) AS n_docs,
             |    CAST(SUM(doc_id) AS BIGINT) AS id_checksum
             |  FROM a GROUP BY split)
             |SELECT split, n_docs, id_checksum,
             |  CAST(FLOOR((CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER ())
             |    * 10000 + 0.5) / 10000.0 AS DOUBLE) AS share
             |FROM c ORDER BY split""".stripMargin)),

    QueryDef("q61_dataset_card",
      (s, d) => {
        val docs = t(s, d, "documents")
        val dupFlags = docs
          .groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("h_n"))
        val perDoc = docs
          .withColumn("h", md5(col("text")))
          .join(dupFlags, "h")
          .withColumn("toks", split(col("text"), " "))
          .select(col("source"), col("lang"),
            (col("h_n") > 1).as("is_dup"),
            size(col("toks")).cast(LongType).as("n_toks"),
            r4(size(array_distinct(col("toks"))).cast(DoubleType)
              / nullif(size(col("toks")), lit(0))).as("ttr"))
        perDoc.groupBy("source", "lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_docs"),
            sum(col("n_toks")).as("total_tokens"),
            avg4(col("n_toks")).as("avg_tokens"),
            // f4, not r4: at sf0.001 the (src0, fr) stratum's mean ttr
            // lands exactly on 0.53175 and ROUND's decimal-vs-binary
            // halfway split flips the 4th decimal between engines
            f4(sum(dec18(col("ttr"))).cast(DoubleType) / count(col("ttr")))
              .as("avg_ttr"))
          .orderBy("source", "lang")
      },
      Some(s"""WITH g AS (SELECT MD5(text) AS h, COUNT(*) AS h_n
             |          FROM documents GROUP BY MD5(text)),
             |p AS (SELECT d.source, d.lang,
             |    g.h_n > 1 AS is_dup,
             |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks,
             |    CAST(ROUND(CAST(len(list_distinct(string_split(d.text, ' ')))
             |        AS DOUBLE)
             |      / NULLIF(len(string_split(d.text, ' ')), 0), 4) AS DOUBLE)
             |      AS ttr
             |  FROM documents d JOIN g ON MD5(d.text) = g.h)
             |SELECT source, lang,
             |  COUNT(*) AS n_docs,
             |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_dup_docs,
             |  CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
             |  ${Q.AVG4("n_toks")} AS avg_tokens,
             |  ${Q.F4("CAST(SUM(CAST(ttr AS DECIMAL(18,4))) AS DOUBLE) / COUNT(ttr)")} AS avg_ttr
             |FROM p GROUP BY source, lang ORDER BY source, lang""".stripMargin))
  )
}
