package graft.queries

import graft.{Q, QueryDef}
import graft.Q._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistics operators rounding out SURVEY §2B's declared surface:
  * exact percentiles (the pass the reference rejected as too costly at
  * `czi_to_zarr.py:477-481` — affordable as a distributed aggregate),
  * approximate distinct counting, the scalar UDF registration surface, and
  * the typed weighted-percentile Aggregator.
  */
object Stats {

  val defs: Seq[QueryDef] = Seq(

    // Q44 exact interpolated percentiles (oracle: DuckDB quantile_cont) ----
    QueryDef("q44_percentiles",
      (s, d) =>
        // the three l_quantity ranks ride ONE percentile(..., array(...))
        // aggregate (r20): one value->count map + one eval sort instead of
        // three per group — same algorithm, same exact values
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            expr("percentile(l_quantity, array(0.1D, 0.5D, 0.95D))")
              .as("qty_pcts"),
            r4(expr("percentile(l_extendedprice, 0.5)")).as("p50_price"))
          .select(col("l_returnflag"),
            r4(element_at(col("qty_pcts"), 1)).as("p10_qty"),
            r4(element_at(col("qty_pcts"), 2)).as("p50_qty"),
            r4(element_at(col("qty_pcts"), 3)).as("p95_qty"),
            col("p50_price"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             | CAST(ROUND(quantile_cont(l_quantity, 0.1), 4) AS DOUBLE) AS p10_qty,
             | CAST(ROUND(quantile_cont(l_quantity, 0.5), 4) AS DOUBLE) AS p50_qty,
             | CAST(ROUND(quantile_cont(l_quantity, 0.95), 4) AS DOUBLE) AS p95_qty,
             | CAST(ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS DOUBLE) AS p50_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Q44b approx percentile — the scale twin of Q44's exact pass ----------
    // `percentile` buffers every value of a group in one aggregation buffer
    // (exact, but a 100TB group OOMs it); `percentile_approx` is Spark's
    // bounded GK quantile sketch — partial-aggregatable, fixed memory, the
    // one to reach for beyond bounded-cardinality groups. Crossover rule of
    // thumb: exact while rows-per-group x 8 bytes fits an executor's
    // aggregation buffer comfortably (~10^7 values), approx beyond.
    //
    // TOLERANCE-CHECKED ORACLE (r8/r10 verdict): the sketch estimate itself
    // is engine-specific (GK internals differ), so the oracle-compared
    // projection carries the EXACT percentile (cross-engine hash-checked
    // against DuckDB's quantile_cont) plus the tolerance verdict
    // |approx - exact| / exact <= 1% as a boolean the oracle pins to TRUE.
    // The exact column proves both engines agree on the ground truth; the
    // boolean proves Spark's sketch lands within the bound of that shared
    // truth — so a drifting estimate flips the hash and fails the driver
    // gate, not just the local spec.
    QueryDef("q44b_percentiles_approx",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            r4(expr("percentile(l_quantity, 0.5)")).as("p50_exact"),
            r4(expr("percentile_approx(l_quantity, 0.5, 10000)")).as("p50_approx"),
            r4(expr("percentile(l_extendedprice, 0.95)")).as("p95_exact"),
            r4(expr("percentile_approx(l_extendedprice, 0.95, 10000)")).as("p95_approx"))
          .select(col("l_returnflag"),
            col("p50_exact"),
            (abs(col("p50_approx") - col("p50_exact")) / col("p50_exact")
              <= 0.01).as("p50_within_tol"),
            col("p95_exact"),
            (abs(col("p95_approx") - col("p95_exact")) / col("p95_exact")
              <= 0.01).as("p95_within_tol"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             | CAST(ROUND(quantile_cont(l_quantity, 0.5), 4) AS DOUBLE) AS p50_exact,
             | TRUE AS p50_within_tol,
             | CAST(ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS DOUBLE) AS p95_exact,
             | TRUE AS p95_within_tol
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Q12c approx distinct — tolerance-checked oracle, same scheme as q44b:
    // HLL++ internals differ across engines, so the compared projection is
    // the exact distinct count (hash-checked) plus the 5% tolerance verdict
    // pinned TRUE. The estimator runs at rsd 0.015, NOT its 0.05 default:
    // the pinned bound must sit well outside the estimator's standard
    // error (0.05 tolerance at 0.05 rsd is a ~1-sigma bet that a testdata
    // regeneration can plausibly lose — r11 advice), so the sketch is
    // sized ~3.3 sigma inside the bound. Memory cost is the HLL++
    // register file growing ~(0.05/0.015)^2 ≈ 11x to ~50 KB per buffer —
    // still constant, still partial-aggregatable.
    QueryDef("q12c_approx_distinct",
      (s, d) =>
        t(s, d, "lineitem")
          .agg(
            approx_count_distinct(col("l_partkey"), 0.015).as("approx_parts"),
            countDistinct(col("l_partkey")).as("exact_parts"))
          .select(col("exact_parts"),
            (abs(col("approx_parts") - col("exact_parts")).cast(DoubleType)
              / col("exact_parts") <= 0.05).as("within_tol")),
      Some("""SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
             | TRUE AS within_tol
             |FROM lineitem""".stripMargin)),

    // Q100 mergeable-sketch rollup (Datasketches HLL) ---------------------
    // The lakehouse pre-aggregation pattern q12c's one-shot estimate
    // can't express: per-slice HLL sketches are STORED once (here the
    // per-source aggregate; in production a per-partition/day summary
    // table), and any coarser rollup derives by UNIONING sketches —
    // hll_union_agg never rescans the corpus. At 100 TB the corpus scan
    // happens once per ingest; every subsequent distinct-count rollup
    // (per source, global, any grouping-set over stored slices) is
    // sketch-sized work (~2.5 KB per sketch at lgK=12, rel err ~1.6%).
    //
    // TOLERANCE-CHECKED ORACLE (promoted r12, q44b's scheme): sketch
    // binary layouts and estimators are engine-specific, so the compared
    // projection carries the EXACT distinct count (cross-engine
    // hash-checked against DuckDB) plus the 5%-tolerance verdict
    // |est - exact| / exact <= 0.05 pinned TRUE — ~3 sigma of lgK=12's
    // ~1.6% rel err, the same estimator-headroom rule as q12c. A
    // drifting estimate now fails the driver gate, not just
    // SketchRollupSpec.
    QueryDef("q100_hll_sketch_rollup",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("source"), md5(col("text")).as("fp"))
        val slices = docs.groupBy("source").agg(
          expr("hll_sketch_agg(fp, 12)").as("sk"),
          countDistinct(col("fp")).as("exact_distinct"))
        val per = slices.select(col("source"),
          expr("hll_sketch_estimate(sk)").as("est_distinct"),
          col("exact_distinct"))
        val global = slices.agg(
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_distinct"))
          .crossJoin(graft.BroadcastBounds.bounded("scalar-agg")(
            docs.agg(countDistinct(col("fp")).as("exact_distinct"))))
          .select(lit("__all__").as("source"), col("est_distinct"),
            col("exact_distinct"))
        per.unionByName(global)
          .select(col("source"), col("exact_distinct"),
            (abs(col("est_distinct") - col("exact_distinct"))
              .cast(DoubleType) / col("exact_distinct") <= 0.05)
              .as("within_tol"))
          .orderBy("source")
      },
      Some("""WITH per AS (SELECT source,
             |    COUNT(DISTINCT md5(text)) AS exact_distinct
             |  FROM documents GROUP BY source),
             |tot AS (SELECT '__all__' AS source,
             |    COUNT(DISTINCT md5(text)) AS exact_distinct FROM documents)
             |SELECT source, exact_distinct, TRUE AS within_tol
             |FROM (SELECT * FROM per UNION ALL SELECT * FROM tot)
             |ORDER BY source""".stripMargin)),

    // Q115 mergeable QUANTILE sketch rollup (r13) — q100's pattern for
    // percentiles: per-slice Datasketches KLL sketches (k=200, ~1.65%
    // rank error, a few KB each) computed in ONE fact-table scan; any
    // coarser rollup derives by kll_merge_agg over the STORED sketches —
    // percentile cubes without rescanning, the thing exact percentiles
    // (q44's sort-based, non-mergeable aggregate) cannot do. Exact
    // percentile rides along as the audit column; the oracle hash-pins
    // the exact values and the within-10%-of-exact booleans — a bound
    // several times the k=200 rank-error envelope, because KLL
    // compaction is randomized and UNSEEDED: a tail-event miss at a
    // tight bound would fail the oracle gate as a flake (KLL
    // compaction is randomized, so the ESTIMATES themselves are not
    // cross-engine-hashable — q100's HLL treatment). At 100 TB: slice
    // sketches are the stored artifact, the global quantile is a merge
    // of K sketches, not a rescan of the table.
    QueryDef("q115_kll_quantile_rollup",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_returnflag").as("slice"),
            col("l_extendedprice").cast(DoubleType).as("v"))
        // ONE scan computes every exact audit percentile (per-slice AND
        // global) via rollup's two grouping sets, plus the per-slice
        // sketches; the grand-total row's own sketch is deliberately
        // DISCARDED — the global estimate must come from merging the
        // STORED slice sketches, because that merge is the operator's
        // whole claim
        // both exact percentiles from ONE percentile(..., array(...))
        // aggregate (r20 optimization): two scalar percentile() calls
        // each build their own value->count map per group and sort it at
        // eval — the array form pays the map and the sort once for both
        // ranks. Same algorithm, same exact values. element_at runs after
        // the localCheckpoint, so the array is read materialized.
        val agg0 = org.apache.spark.sql.execution.GraftCheckpoint
          .localCheckpointFlatStats(li.rollup("slice").agg(
            expr("kll_sketch_agg_double(v, 200)").as("sk"),
            expr("percentile(v, array(0.5D, 0.95D))").as("pcts")))
        val agg = agg0.select(col("slice"), col("sk"),
          r4(element_at(col("pcts"), 1)).as("exact_p50"),
          r4(element_at(col("pcts"), 2)).as("exact_p95"))
        val slices = agg.filter(col("slice").isNotNull)
        val per = slices.select(col("slice"), col("exact_p50"),
          col("exact_p95"),
          expr("kll_sketch_get_quantile_double(sk, 0.5D)").as("est_p50"),
          expr("kll_sketch_get_quantile_double(sk, 0.95D)").as("est_p95"))
        val global = slices
          .agg(expr("kll_merge_agg_double(sk)").as("gsk"))
          .crossJoin(graft.BroadcastBounds.bounded("scalar-agg")(
            agg.filter(col("slice").isNull)
              .select(col("exact_p50"), col("exact_p95"))))
          .select(lit("__all__").as("slice"), col("exact_p50"),
            col("exact_p95"),
            expr("kll_sketch_get_quantile_double(gsk, 0.5D)").as("est_p50"),
            expr("kll_sketch_get_quantile_double(gsk, 0.95D)").as("est_p95"))
        per.unionByName(global)
          .select(col("slice"), col("exact_p50"), col("exact_p95"),
            (abs(col("est_p50") - col("exact_p50")) / col("exact_p50")
              <= 0.10).as("p50_tol"),
            (abs(col("est_p95") - col("exact_p95")) / col("exact_p95")
              <= 0.10).as("p95_tol"))
          .orderBy("slice")
      },
      Some("""WITH per AS (SELECT l_returnflag AS slice,
             |    CAST(ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS DOUBLE)
             |      AS exact_p50,
             |    CAST(ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS DOUBLE)
             |      AS exact_p95
             |  FROM lineitem GROUP BY l_returnflag),
             |tot AS (SELECT '__all__' AS slice,
             |    CAST(ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS DOUBLE)
             |      AS exact_p50,
             |    CAST(ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS DOUBLE)
             |      AS exact_p95
             |  FROM lineitem)
             |SELECT slice, exact_p50, exact_p95,
             |  TRUE AS p50_tol, TRUE AS p95_tol
             |FROM (SELECT * FROM per UNION ALL SELECT * FROM tot)
             |ORDER BY slice""".stripMargin)),

    // Q116 mergeable TOP-K sketch rollup (r13) — the third member of the
    // pre-aggregated sketch cube (q100 distinct=HLL, q115 quantiles=KLL,
    // q116 frequent items): per-source approx_top_k_accumulate states
    // (bounded: maxItemsTracked entries each) in ONE token scan, the
    // global rollup by approx_top_k_combine over the STORED states — no
    // rescan. The Misra-Gries-family sketch is EXACT while the tracked
    // map never evicts (distinct items <= maxItemsTracked, true here and
    // asserted by the spec), so unlike q100/q115 the counts themselves
    // hash against DuckDB's exact aggregation; at open-vocabulary scale
    // it degrades to the guaranteed-overcount regime q99 rescues.
    // Ties re-ranked (cnt DESC, token ASC) in both engines — the sketch
    // API's own tie order is unspecified — and the estimate window is
    // the FULL tracked capacity (10000, not a 64-item slice), so no
    // count tie can straddle a window boundary and drop a token the
    // oracle's total order would have ranked in.
    QueryDef("q116_topk_sketch_rollup",
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("source"),
            explode(split(col("text"), " ")).as("token"))
        val states = toks.groupBy("source")
          .agg(expr("approx_top_k_accumulate(token, 10000)").as("st"))
        def top3(df: DataFrame): DataFrame = df
          .select(col("source"),
            explode(expr("approx_top_k_estimate(st, 10000)")).as("e"))
          .select(col("source"), col("e.item").as("token"),
            col("e.count").cast(LongType).as("cnt"))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("source")
              .orderBy(col("cnt").desc, col("token"))))
          .filter(col("rk") <= 3)
          .select(col("source"), col("rk").cast(IntegerType).as("rk"),
            col("token"), col("cnt"))
        val per = top3(states)
        val global = top3(states
          .agg(expr("approx_top_k_combine(st, 10000)").as("st"))
          .select(lit("__all__").as("source"), col("st")))
        per.unionByName(global).orderBy("source", "rk")
      },
      Some("""WITH toks AS (SELECT source,
             |    unnest(string_split(text, ' ')) AS token
             |  FROM documents),
             |cnts AS (SELECT source, token, COUNT(*) AS cnt
             |  FROM toks GROUP BY source, token),
             |per AS (SELECT source, CAST(ROW_NUMBER() OVER (
             |      PARTITION BY source ORDER BY cnt DESC, token) AS INT)
             |      AS rk, token, cnt
             |  FROM cnts),
             |gcnts AS (SELECT '__all__' AS source, token,
             |    COUNT(*) AS cnt FROM toks GROUP BY token),
             |gl AS (SELECT source, CAST(ROW_NUMBER() OVER (
             |      ORDER BY cnt DESC, token) AS INT) AS rk, token, cnt
             |  FROM gcnts)
             |SELECT * FROM (
             |  SELECT * FROM per WHERE rk <= 3
             |  UNION ALL SELECT * FROM gl WHERE rk <= 3)
             |ORDER BY source, rk""".stripMargin)),

    // Q45 scalar UDF registration surface ---------------------------------
    // A deterministic quality score via a REGISTERED Scala UDF; the oracle
    // replicates the arithmetic in SQL. (Engine surface demo — the
    // documented guidance stays "builtin functions first": every other
    // query avoids UDFs.)
    QueryDef("q45_udf_quality",
      (s, d) => {
        val score = udf((nChars: Long, nTokens: Int) =>
          if (nTokens == 0) 0.0
          else math.min(10.0, nChars.toDouble / nTokens) / 10.0)
        s.udf.register("quality_score", score)
        t(s, d, "documents")
          .withColumn("n_tokens", size(split(col("text"), " ")))
          .select(col("doc_id"),
            r4(call_udf("quality_score", col("n_chars"), col("n_tokens")))
              .as("quality"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             | CAST(ROUND(CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0
             |   ELSE LEAST(10.0, CAST(n_chars AS DOUBLE)
             |     / len(string_split(text, ' '))) / 10.0 END, 4) AS DOUBLE) AS quality
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Q46 typed Aggregator: weighted percentile over event values ---------
    // oracle: the same "smallest v whose cumulative weight reaches
    // p * total" rule as explicit window SQL
    //
    // EXACTNESS PRECONDITION for the hash-match oracle: the aggregator's
    // buffer stays exact up to 2*8192 distinct values per partial buffer
    // and compresses to equi-depth centroids beyond (WeightedPercentile
    // scaladoc has the error analysis) — past that crossover the result is
    // approximate (centroid values need not be data values) and this
    // oracle would have to become a tolerance-checked projection like
    // q44b's. The events table holds <10k distinct values per event_type
    // TOTAL at sf0.1 (so even a single-partition partial buffer stays
    // under the 16384 crossover with ~1.6x headroom; compression behavior
    // beyond it is spec-pinned in WeightedPercentileSpec), so the exact
    // path is what ships here.
    QueryDef("q46_weighted_percentile",
      (s, d) => {
        import s.implicits._
        val median = udaf(new graft.functions.WeightedPercentile(0.5))
        s.udf.register("weighted_median", median)
        events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"), col("value").cast(DoubleType).as("v"),
            lit(1.0).as("w"))
          .groupBy("event_type")
          .agg(expr("weighted_median(v, w)").as("median_value"))
          .select(col("event_type"), r4(col("median_value")).as("median_value"))
          .orderBy("event_type")
      },
      Some(s"""WITH e AS (${graft.Q.EVENTS_SQL}),
              |x AS (SELECT event_type, CAST(value AS DOUBLE) AS v, 1.0 AS w
              |      FROM e WHERE value IS NOT NULL),
              |o AS (SELECT event_type, v,
              |    SUM(w) OVER (PARTITION BY event_type ORDER BY v
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              |    SUM(w) OVER (PARTITION BY event_type) AS total
              |  FROM x)
              |SELECT event_type,
              |  CAST(ROUND(MIN(CASE WHEN cum >= 0.5 * total THEN v END), 4)
              |    AS DOUBLE) AS median_value
              |FROM o GROUP BY event_type ORDER BY event_type""".stripMargin)))
}
