package graft.queries

import graft.QueryDef
import graft.Q._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed vector statistics over the embeddings table (round 8):
  * covariance matrix estimation, PCA via power iteration, and Lloyd
  * k-means — the linear-algebra layer an embedding-curation pipeline needs
  * beside ANN search (q41/q48/q62) and quantization (q54).
  *
  * Shared scale shape: every corpus-sized pass is a partial-aggregatable
  * groupBy whose output is bounded by the embedding DIMENSION (64) or by
  * d^2/k — never by the corpus. Driver-side work only ever touches those
  * dimension-bounded aggregates (64, 64^2, or k*64 rows), the same
  * collect-scalars-then-broadcast loop MLlib's own KMeans/PCA use.
  * Determinism: every distributed double sum is made exact and
  * association-order-free — the hot gram-matrix path via fixed-point LONG
  * sums (scale-8 quantization, pure primitive codegen), the
  * dimension-cheap paths via DECIMAL(18,8) — so repeated runs and the
  * DuckDB oracle see bit-identical results.
  */
object VectorStats {

  /** Embedding dimension of the testdata table (FIXTURES.md). */
  val Dim = 64

  /** q80 clusters and fixed Lloyd iterations. */
  val KmeansK = 8
  val KmeansIters = 4

  /** Exact-sum element type. Precision 18 (not more) is deliberate: Spark's
    * Decimal stays in its compact unscaled-Long representation up to
    * precision 18 — beyond that every add goes through BigDecimal (~4x
    * slower across the corpus-sized aggregations here). Headroom: unit-scale
    * element products at scale 8 leave ~10 integer digits, so sums stay
    * exact to ~10^10 vectors; past that, widen the scale 8 to 6 before
    * widening precision. */
  private val dec8 = DecimalType(18, 8)

  /** embeddings as (vec_id, v: array<double>) — float32 payloads widened
    * once so all downstream arithmetic is double in BOTH engines (DuckDB
    * promotes list elements to double; float*float in Spark would round
    * differently). */
  private[graft] def vecs(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").select(col("vec_id"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("v"))

  /** Per-coordinate exact sums: (k 1-based, sx DECIMAL, n). 64-row output. */
  private def coordSums(e: DataFrame): DataFrame =
    e.select(posexplode(col("v")).as(Seq("p", "x")))
      .groupBy((col("p") + 1).cast(IntegerType).as("k"))
      .agg(sum(col("x").cast(dec8)).as("sx"), count(lit(1)).as("n"))

  /** Per-(i,j) product sums over the UPPER TRIANGLE (j >= i, 1-based):
    * (i, j, sxy8, n) with d(d+1)/2 = 2080 groups, sxy8 a FIXED-POINT LONG
    * at scale 8 (floor(xy*1e8 + 0.5) per element — q54's halfway-safe
    * quantization): long sums are exact, association-order-free, and stay
    * entirely in primitive codegen, where a DECIMAL(18,8) path pays a
    * Decimal allocation per element (~5x wall: 5.2 s -> 0.9 s at sf0.1).
    * Same overflow headroom as decimal 18,8 (~10^9 vectors at unit scale;
    * widen the quantization scale past that). Shape: cross join each
    * vector against a BROADCAST d(d+1)/2-row index-pair table and read
    * v[i]*v[j] by element_at — inside one whole-stage-codegen span the
    * "join" is just a loop over 2080 (i,j) ints per vector doing two
    * primitive array reads and a multiply; no outer-product array is ever
    * materialized. (Two slower shapes tried first: a
    * flatten(transform(transform)) generator boxes d^2 Doubles per row
    * (~6 s at sf0.1); a struct-per-cell triangle generator defeats
    * codegen entirely (~20 s).) The only shuffle carries the partial-agg
    * groups — map-side combine reduces each partition to <= 2080 rows
    * regardless of corpus size. */
  private def productSums(e: DataFrame): DataFrame = {
    val pairs = e.sparkSession.createDataFrame(
      for { i <- 1 to Dim; j <- i to Dim } yield (i, j)).toDF("i", "j")
    e.crossJoin(graft.BroadcastBounds.bounded("dim-pairs")(pairs))
      .groupBy("i", "j")
      .agg(sum(floor((element_at(col("v"), col("i"))
          * element_at(col("v"), col("j"))) * 1e8 + 0.5).cast(LongType))
        .as("sxy8"),
        count(lit(1)).as("n"))
  }

  /** Driver-side (n, mean, covariance) from the dimension-bounded
    * aggregates above (64 + 4096 collected rows — driver-scalar, like
    * q71's vocab-sized BPE trainer; the corpus itself is never collected). */
  def covarianceMatrix(s: SparkSession, d: String)
      : (Long, Array[Double], Array[Array[Double]]) = {
    val e = vecs(s, d)
    val ms = coordSums(e).collect()
    val n = ms.head.getLong(2)
    val mean = Array.ofDim[Double](Dim)
    ms.foreach(r => mean(r.getInt(0) - 1) =
      r.getDecimal(1).doubleValue() / n)
    val cov = Array.ofDim[Double](Dim, Dim)
    productSums(e).collect().foreach { r =>
      val i = r.getInt(0) - 1; val j = r.getInt(1) - 1
      val c = r.getLong(2) / 1e8 / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c // upper triangle mirrored by symmetry
    }
    (n, mean, cov)
  }

  /** Power iteration for the top eigenpair of a symmetric d x d matrix.
    * Deterministic: fixed uniform init (never orthogonal to the top
    * eigenvector of a covariance matrix in practice — and the spec pins the
    * Rayleigh quotient, not luck), fixed iteration count, sign normalized
    * so the largest-|w| component is positive. */
  def powerIteration(m: Array[Array[Double]], iters: Int = 500)
      : (Array[Double], Double) = {
    val d = m.length
    var w = Array.fill(d)(1.0 / math.sqrt(d))
    def mul(v: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => {
        var acc = 0.0; var j = 0
        while (j < d) { acc += m(i)(j) * v(j); j += 1 }
        acc
      })
    for (_ <- 1 to iters) {
      val nw = mul(w)
      val norm = math.sqrt(nw.map(x => x * x).sum)
      w = nw.map(_ / norm)
    }
    val mw = mul(w)
    val lambda = w.zip(mw).map { case (a, b) => a * b }.sum
    val imax = w.indices.maxBy(i => math.abs(w(i)))
    if (w(imax) < 0) w = w.map(-_)
    (w, lambda)
  }

  /** One Lloyd run: returns the per-cluster summary frame plus the SSE
    * trajectory (SSE under the centroids entering each iteration). The
    * driver loop only ever moves k*d scalars (collect the k*64 centroid
    * sums, broadcast them back as plan literals) — the corpus-sized work
    * per iteration is one narrow assign+aggregate job, MLlib's exact
    * shape. Plan depth stays constant across iterations (each rebuilds
    * from the persisted base, literals swapped), so no checkpoint is
    * needed. */
  /** Cluster assignment for one centroid snapshot: the k centroids ride as
    * PLAN LITERALS (the expression equivalent of a broadcast model), so
    * assignment is a pure Project over the vector scan — no join, no
    * shuffle. Exposed for plan assertions (QueryPlanSpec / DumpPlans). */
  private[graft] def lloydAssign(e: DataFrame,
      c: Array[Array[Double]]): DataFrame = {
    val centLit = array(c.map(cc => array(cc.map(lit): _*)): _*)
    e.withColumn("dists", transform(centLit, cc =>
        aggregate(zip_with(col("v"), cc, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)))
      .withColumn("cluster",
        (expr("array_position(dists, array_min(dists))") - 1)
          .cast(IntegerType))
      .withColumn("d2", array_min(col("dists")))
  }

  /** The one distributed job a Lloyd iteration runs: assignment fused into
    * the per-(cluster, coordinate) partial-agg groupBy, output bounded by
    * k*d rows + exact SSE riding the same aggregate. Exposed so the
    * per-iteration plan (not just the final summary) can be asserted. */
  private[graft] def lloydUpdate(e: DataFrame,
      c: Array[Array[Double]]): DataFrame =
    lloydAssign(e, c)
      .select(col("cluster"), col("d2"), posexplode(col("v")).as(Seq("p", "x")))
      .groupBy("cluster", "p")
      .agg(sum(col("x").cast(dec8)).as("sx"), count(lit(1)).as("n"),
        sum(when(col("p") === 0, col("d2").cast(dec8))).as("sse_part"))

  def kmeans(s: SparkSession, d: String, k: Int = KmeansK,
      iters: Int = KmeansIters): (DataFrame, Seq[Double]) = {
    val e = vecs(s, d).persist()
    // deterministic init: the k smallest vec_ids (k driver rows)
    var cents: Array[Array[Double]] = e.filter(col("vec_id") < k)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray)
    val sseHistory = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      // one job per iteration: coordinate sums per cluster (k*64 rows) +
      // the exact SSE ride along in the same aggregate
      val upd = lloydUpdate(e, cents).collect()
      sseHistory += upd.flatMap(r => Option(r.getDecimal(4)))
        .map(_.doubleValue()).sum
      val next = cents.map(_.clone())
      upd.foreach { r =>
        val c = r.getInt(0); val p = r.getInt(1)
        next(c)(p) = r.getDecimal(2).doubleValue() / r.getLong(3)
      }
      cents = next
    }
    val finalA = lloydAssign(e, cents)
    // materialize the k-row summary, then drop the corpus cache — the
    // returned frame must not re-read the (now unpersisted) base lazily
    val out = org.apache.spark.sql.execution.GraftCheckpoint
      .localCheckpointFlatStats(finalA.groupBy("cluster")
        .agg(count(lit(1)).as("n_vecs"),
          r4(sum(col("d2").cast(dec8))).as("sse"))
        .orderBy("cluster"))
    e.unpersist(blocking = false)
    (out, sseHistory.result())
  }

  /** q85 damping factor and fixed iteration count. */
  val PrDamping = 0.85
  val PrIters = 8

  /** Damped PageRank over a directed edge list (cols src, dst), nodes
    * given explicitly so rank mass conserves across dangling/isolated
    * vertices. Canonical distributed shape: the edge list (with out-degree
    * attached once, flat-stats-checkpointed) is the large static side;
    * each iteration is one src-keyed join + one dst-keyed partial-agg
    * groupBy — at cluster scale both sides pre-partition on the join key
    * and the shuffle carries contributions, never vector payloads. Rank
    * frames are checkpointed per iteration (q51's pattern) so plan depth
    * and Catalyst stats stay constant across iterations.
    *
    * Determinism: per-edge contributions and the dangling mass quantize to
    * fixed-point longs at scale 12 (floor(x*1e12+0.5) — q76's mechanism,
    * finer grid because ranks live at 1/N scale), so every iteration's
    * ranks are exact, association-order-free doubles and repeated runs are
    * bit-identical. */
  /** One PageRank iteration as a single plan: src-keyed rank join ->
    * per-edge fixed-point contributions -> dst-keyed partial-agg groupBy,
    * with the dangling mass reduced to ONE ROW and broadcast into the same
    * plan (the only intentional nested-loop join — a scalar attach, not a
    * data-data cartesian). Exposed so the per-iteration plan (not just the
    * final ranks frame) can be asserted by QueryPlanSpec / DumpPlans. */
  private[graft] def pagerankStep(nodes: DataFrame, e: DataFrame,
      srcs: DataFrame, ranks: DataFrame, nN: Double,
      damping: Double): DataFrame = {
    val contrib = e
      .join(ranks.withColumnRenamed("id", "src"), "src")
      .select(col("dst"),
        floor(col("r") / col("outdeg") * 1e12 + 0.5).as("c12"))
      .groupBy("dst").agg(sum(col("c12")).as("s12"))
    // dangling mass rides the SAME plan as a one-row broadcast scalar
    // (not a per-iteration driver action): one Spark job per iteration
    val dangling = ranks
      .join(srcs, ranks("id") === srcs("src"), "left_anti")
      .agg(coalesce(sum(floor(col("r") * 1e12 + 0.5)), lit(0L)).as("d12"))
    nodes.join(contrib, nodes("id") === contrib("dst"), "left")
      .crossJoin(graft.BroadcastBounds.bounded("scalar-agg")(dangling))
      .select(col("id"),
        (lit((1 - damping) / nN) + lit(damping)
          * (coalesce(col("s12"), lit(0L)) / 1e12
            + col("d12") / 1e12 / nN))
          .as("r"))
  }

  def pagerank(nodes: DataFrame, edges: DataFrame,
      iters: Int = PrIters, damping: Double = PrDamping): DataFrame = {
    import org.apache.spark.sql.execution.GraftCheckpoint.localCheckpointFlatStats
    val nN = nodes.count().toDouble
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = localCheckpointFlatStats(edges.join(outdeg, "src"))
    val srcs = e.select("src").distinct()
    var ranks = localCheckpointFlatStats(
      nodes.withColumn("r", lit(1.0 / nN)))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      prev = ranks
      ranks = localCheckpointFlatStats(
        pagerankStep(nodes, e, srcs, ranks, nN, damping))
      // the new generation is materialized (localCheckpoint is eager);
      // the previous one's executor blocks are dead — release NOW rather
      // than waiting on the async cleaner (q51's hygiene rule; at corpus
      // scale `iters` retained rank generations is real storage)
      LlmOps.releaseCheckpoint(prev)
    }
    // the returned frame references only the final generation; the edge
    // checkpoint served its last join in the loop above
    LlmOps.releaseCheckpoint(e)
    ranks
  }

  val defs: Seq[QueryDef] = Seq(

    // Q76 covariance matrix (upper triangle) -------------------------------
    // The gram-matrix pass PCA/whitening starts from. One generator pass
    // builds each row's outer product locally; the only shuffle carries
    // d^2-bounded partial aggregates (map-side combine does the real
    // reduction), so the plan is corpus-scan + tiny exchange at ANY corpus
    // size — the canonical "distributed covariance" shape. Exact
    // fixed-point sums make the result association-order-free, which is
    // what lets a DuckDB oracle hash-match a 32-way parallel aggregation.
    QueryDef("q76_embedding_covariance",
      (s, d) => {
        val e = vecs(s, d)
        val prods = productSums(e)
        val m = coordSums(e)
        prods
          .join(graft.BroadcastBounds.bounded("dim-means")(
            m.select(col("k").as("i"), col("sx").as("sxi"))), "i")
          .join(graft.BroadcastBounds.bounded("dim-means")(
            m.select(col("k").as("j"), col("sx").as("sxj"))), "j")
          .select(col("i"), col("j"),
            // + 0.0 normalizes IEEE negative zero: near-zero covariance
            // cells round to -0.0 in DuckDB but 0.0 in Spark's
            // BigDecimal-based ROUND; -0.0 + 0.0 = +0.0 in both engines
            (r4(col("sxy8").cast(DoubleType) / 1e8 / col("n")
              - (col("sxi").cast(DoubleType) / col("n"))
              * (col("sxj").cast(DoubleType) / col("n"))) + lit(0.0))
              .as("cov"))
          .orderBy("i", "j")
      },
      Some(s"""WITH e AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |px AS (SELECT e.vec_id, t.k, e.v[t.k] AS x
             |  FROM e, generate_series(1, $Dim) AS t(k)),
             |m AS (SELECT k, SUM(CAST(x AS DECIMAL(18,8))) AS sx
             |  FROM px GROUP BY k),
             |pr AS (SELECT a.k AS i, b.k AS j,
             |    SUM(CAST(FLOOR(a.x * b.x * 1e8 + 0.5) AS BIGINT)) AS sxy8,
             |    COUNT(*) AS n
             |  FROM px a JOIN px b ON a.vec_id = b.vec_id AND b.k >= a.k
             |  GROUP BY a.k, b.k)
             |SELECT CAST(pr.i AS INT) AS i, CAST(pr.j AS INT) AS j,
             |  CAST(ROUND(CAST(sxy8 AS DOUBLE) / 1e8 / n
             |    - (CAST(mi.sx AS DOUBLE) / n) * (CAST(mj.sx AS DOUBLE) / n),
             |    4) AS DOUBLE) + 0.0 AS cov
             |FROM pr JOIN m mi ON pr.i = mi.k JOIN m mj ON pr.j = mj.k
             |ORDER BY i, j""".stripMargin)),

    // Q77 PCA projection via power iteration -------------------------------
    // Top principal component of the embedding cloud: covariance from the
    // same dimension-bounded aggregates as q76, eigenvector by driver-side
    // power iteration on the 64x64 matrix (dimension-sized, like q71's
    // vocab-sized trainer), then ONE distributed projection pass with the
    // centered weights baked in as plan literals (codegen'd zip_with +
    // aggregate — no UDF, no second shuffle). PROMOTED to a full hash
    // oracle (r15): DuckDB has no eigensolver, but the power iteration
    // carries the WHOLE weight vector as one list-typed row, so the 500
    // iterations ride a RECURSIVE CTE whose step is per-row arithmetic —
    // no aggregation over the recursive term, which is what standard SQL
    // recursion forbids. Every float op mirrors the driver loop in order
    // (matrix-vector products and norms as LEFT FOLDS via list_reduce;
    // the covariance inputs are the exact fixed-point/decimal aggregates
    // q76 already hash-proves; the first-max sign convention becomes
    // list_position over the abs list), so 500 iterations land on
    // identical doubles. PcaSpec keeps the Rayleigh-quotient and
    // variance laws.
    QueryDef("q77_pca_projection",
      (s, d) => {
        val (_, mean, cov) = covarianceMatrix(s, d)
        val (w, lambda) = powerIteration(cov)
        val trace = (0 until Dim).map(i => cov(i)(i)).sum
        val mLit = array(mean.map(lit): _*)
        val wLit = array(w.map(lit): _*)
        vecs(s, d).select(col("vec_id"),
            r4(aggregate(
              zip_with(zip_with(col("v"), mLit, (a, b) => a - b), wLit,
                (a, b) => a * b),
              lit(0.0), (acc, x) => acc + x)).as("pc1_score"))
          .withColumn("eigenvalue", r4(lit(lambda)))
          .withColumn("explained_ratio", r4(lit(lambda / trace)))
          .orderBy("vec_id")
      },
      Some {
        val D = Dim
        val I = 500 // powerIteration's default iters
        val Z = "CAST(0.0 AS DOUBLE)"
        def foldl(items: String) =
          s"list_reduce(list_prepend($Z, $items), (acc, e) -> acc + e)"
        def mulRow(w: String) = foldl(
          s"list_transform(generate_series(1, $D), j -> cm.m[i][j] * $w[j])")
        s"""WITH RECURSIVE
           |v AS MATERIALIZED (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings),
           |nrow AS MATERIALIZED (SELECT COUNT(*) AS n FROM v),
           |meanv AS MATERIALIZED (SELECT array_agg(mp ORDER BY p) AS mean
           |  FROM (SELECT u.p,
           |      CAST(SUM(CAST(v.v[u.p] AS DECIMAL(18,8))) AS DOUBLE)
           |        / nn.n AS mp
           |    FROM v CROSS JOIN
           |      (SELECT UNNEST(generate_series(1, $D)) AS p) u
           |    CROSS JOIN nrow nn
           |    GROUP BY u.p, nn.n)),
           |prods AS MATERIALIZED (SELECT u.i, u.j,
           |    SUM(CAST(FLOOR(v.v[u.i] * v.v[u.j] * 1e8 + 0.5) AS BIGINT))
           |      AS sxy8
           |  FROM v CROSS JOIN (SELECT i.i, j.j
           |    FROM (SELECT UNNEST(generate_series(1, $D)) AS i) i,
           |         (SELECT UNNEST(generate_series(1, $D)) AS j) j
           |    WHERE j.j >= i.i) u
           |  GROUP BY u.i, u.j),
           |covm AS MATERIALIZED (SELECT array_agg(rowl ORDER BY i) AS m
           |  FROM (SELECT i.i, array_agg(
           |      p.sxy8 / 1e8 / nn.n - mv.mean[i.i] * mv.mean[j.j]
           |      ORDER BY j.j) AS rowl
           |    FROM (SELECT UNNEST(generate_series(1, $D)) AS i) i
           |    CROSS JOIN (SELECT UNNEST(generate_series(1, $D)) AS j) j
           |    JOIN prods p ON p.i = LEAST(i.i, j.j)
           |      AND p.j = GREATEST(i.i, j.j)
           |    CROSS JOIN nrow nn CROSS JOIN meanv mv
           |    GROUP BY i.i)),
           |pit AS (SELECT 0 AS k,
           |    list_transform(generate_series(1, $D),
           |      i -> CAST(1.0 AS DOUBLE) / sqrt(CAST($D AS DOUBLE))) AS w
           |  UNION ALL
           |  SELECT k + 1, list_transform(nw, x -> x / nrm) FROM (
           |    SELECT k, nw,
           |      sqrt(${foldl("list_transform(nw, x -> x * x)")}) AS nrm
           |    FROM (SELECT k,
           |        list_transform(generate_series(1, $D), i ->
           |          ${mulRow("w")}) AS nw
           |      FROM pit, covm cm WHERE k < $I) q1) q2),
           |fin AS MATERIALIZED (SELECT w,
           |    list_transform(generate_series(1, $D), i ->
           |      ${mulRow("w")}) AS mw
           |  FROM pit, covm cm WHERE k = $I),
           |eig AS MATERIALIZED (SELECT
           |    ${foldl(s"list_transform(generate_series(1, $D), i -> w[i] * mw[i])")}
           |      AS lambda,
           |    CASE WHEN w[list_position(list_transform(w, x -> abs(x)),
           |        list_aggregate(list_transform(w, x -> abs(x)), 'max'))]
           |        < 0
           |      THEN list_transform(w, x -> -x) ELSE w END AS w
           |  FROM fin),
           |tr AS MATERIALIZED (SELECT
           |    ${foldl(s"list_transform(generate_series(1, $D), i -> cm.m[i][i])")}
           |      AS trace
           |  FROM covm cm)
           |SELECT v.vec_id,
           |  CAST(ROUND(${foldl(s"list_transform(generate_series(1, $D), i -> (v.v[i] - mv.mean[i]) * e.w[i])")}, 4)
           |    AS DOUBLE) AS pc1_score,
           |  CAST(ROUND(e.lambda, 4) AS DOUBLE) AS eigenvalue,
           |  CAST(ROUND(e.lambda / t.trace, 4) AS DOUBLE)
           |    AS explained_ratio
           |FROM v CROSS JOIN meanv mv CROSS JOIN eig e CROSS JOIN tr t
           |ORDER BY v.vec_id""".stripMargin
      }),

    // Q80 Lloyd k-means ----------------------------------------------------
    // Full iterative clustering (q48's IVF trains exactly one Lloyd step;
    // this is the general loop): k=8, 4 iterations, deterministic init
    // (lowest vec_ids) and deterministic tie-break (array_position takes
    // the FIRST minimum). PROMOTED to a full hash oracle (r15, the q85
    // unroll recipe): the fixed iteration count unrolls as chained
    // MATERIALIZED CTEs; the per-row distance is a LEFT FOLD in array
    // order (list_reduce mirrors Spark's aggregate() digit for digit),
    // centroid updates are exact DECIMAL(18,8) coordinate sums divided
    // as doubles, the first-minimum tie-break becomes ROW_NUMBER ORDER BY
    // (dist, cluster), and an emptied cluster keeps its old centroid via
    // COALESCE over the previous generation (mirroring the driver loop's
    // clone-then-update). KMeansSpec keeps monotone SSE, the
    // exact-partition invariants, and run-to-run determinism.
    QueryDef("q80_kmeans",
      (s, d) => kmeans(s, d)._1,
      Some {
        val D = 64
        def fold(ve: String, ce: String) =
          s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(generate_series(1, $D), i ->
             |        ($ve[i] - $ce[i]) * ($ve[i] - $ce[i]))),
             |      (acc, e) -> acc + e)""".stripMargin
        def assign(k: Int, prev: String) =
          s"""a$k AS MATERIALIZED (
             |  SELECT vec_id, v, cluster, dd AS d2 FROM (
             |    SELECT vec_id, v, cluster, dd,
             |      ROW_NUMBER() OVER (PARTITION BY vec_id
             |        ORDER BY dd, cluster) AS rn
             |    FROM (SELECT x.vec_id, x.v, c.cluster,
             |        ${fold("x.v", "c.cent")} AS dd
             |      FROM v x CROSS JOIN $prev c))
             |  WHERE rn = 1)""".stripMargin
        def update(k: Int) =
          s"""mean$k AS MATERIALIZED (
             |  SELECT cluster, array_agg(cp ORDER BY p) AS cent FROM (
             |    SELECT a.cluster, u.p,
             |      CAST(SUM(CAST(a.v[u.p] AS DECIMAL(18,8))) AS DOUBLE)
             |        / COUNT(*) AS cp
             |    FROM a$k a CROSS JOIN
             |      (SELECT UNNEST(generate_series(1, $D)) AS p) u
             |    GROUP BY a.cluster, u.p)
             |  GROUP BY cluster),
             |c$k AS MATERIALIZED (SELECT o.cluster,
             |    COALESCE(m.cent, o.cent) AS cent
             |  FROM c${k - 1} o LEFT JOIN mean$k m USING (cluster))""".stripMargin
        val steps = (1 to KmeansIters)
          .map(k => s"${assign(k, s"c${k - 1}")},\n${update(k)}")
          .mkString(",\n")
        s"""WITH v AS MATERIALIZED (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings),
           |c0 AS MATERIALIZED (SELECT CAST(vec_id AS INT) AS cluster,
           |    v AS cent
           |  FROM v WHERE vec_id < $KmeansK),
           |$steps,
           |${assign(KmeansIters + 1, s"c$KmeansIters")}
           |SELECT cluster, COUNT(*) AS n_vecs,
           |  CAST(ROUND(SUM(CAST(d2 AS DECIMAL(18,8))), 4) AS DOUBLE)
           |    AS sse
           |FROM a${KmeansIters + 1} GROUP BY cluster ORDER BY cluster""".stripMargin
      }),

    // Q90 robust outlier detection over embedding norms ---------------------
    // Corrupt-embedding screening for curation: L2 norms -> median ->
    // MAD -> robust z-score (0.6745*(x-med)/MAD), flag |rz| > 3.5 (the
    // standard Iglewicz-Hoaglin cut). Determinism: the squared norm
    // accumulates as fixed-point longs INSIDE one higher-order aggregate
    // (per-row, zero shuffle — q76's mechanism), so every norm is the
    // identical double in both engines; median/MAD are exact interpolated
    // percentiles over identical inputs (q44's check), broadcast back as
    // one-row scalars. Scale note: exact `percentile` buffers the group —
    // fine to ~10^7 values (q44b scaladoc); past that swap in
    // percentile_approx cutpoints, same plan shape.
    QueryDef("q90_embedding_outliers",
      (s, d) => {
        val norms = t(s, d, "embeddings").select(col("vec_id"),
          sqrt(aggregate(
            transform(col("embedding"), x => {
              val xd = x.cast(DoubleType)
              floor(xd * xd * 1e8 + 0.5)
            }),
            lit(0L), (acc, x) => acc + x).cast(DoubleType) / 1e8)
            .as("norm"))
        val med = graft.BroadcastBounds.bounded("scalar-agg")(norms.agg(
          expr("percentile(norm, 0.5)").as("med")))
        val withMed = norms.crossJoin(med)
        val mad = graft.BroadcastBounds.bounded("scalar-agg")(withMed.agg(
          expr("percentile(abs(norm - med), 0.5)").as("mad")))
        withMed.crossJoin(mad)
          // degenerate guard: >=50% identical norms (e.g. L2-normalized
          // embeddings) makes MAD = 0 and the z-score NaN/±Inf, which
          // diverges between engines downstream of f4's floor; a zero
          // spread means no robust outlier signal, so rz := 0
          .withColumn("rz",
            when(col("mad") === 0.0, lit(0.0))
              .otherwise(lit(0.6745) * (col("norm") - col("med")) / col("mad")))
          .select(col("vec_id"), f4(col("norm")).as("norm"),
            f4(col("rz")).as("rz"),
            (abs(col("rz")) > 3.5).as("is_outlier"))
          .orderBy("vec_id")
      },
      Some("""WITH n AS (SELECT vec_id,
             |    sqrt(CAST(list_sum(list_transform(embedding, x ->
             |      CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e8
             |        + 0.5) AS BIGINT))) AS DOUBLE) / 1e8) AS norm
             |  FROM embeddings),
             |m AS (SELECT quantile_cont(norm, 0.5) AS med FROM n),
             |a AS (SELECT quantile_cont(ABS(norm - med), 0.5) AS mad
             |  FROM n CROSS JOIN m),
             |z AS (SELECT vec_id, norm,
             |    CASE WHEN mad = 0 THEN 0.0
             |      ELSE 0.6745 * (norm - med) / mad END AS rz
             |  FROM n CROSS JOIN m CROSS JOIN a)
             |SELECT vec_id,
             |  CAST(FLOOR((norm) * 10000 + 0.5) / 10000.0 AS DOUBLE) AS norm,
             |  CAST(FLOOR((rz) * 10000 + 0.5) / 10000.0 AS DOUBLE) AS rz,
             |  ABS(rz) > 3.5 AS is_outlier
             |FROM z ORDER BY vec_id""".stripMargin)),

    // Q85 PageRank over the kNN graph --------------------------------------
    // Semantic centrality of the embedding corpus: damped PageRank over
    // q62's IVF k-NN edge list (the SAME edges the q62 oracle
    // hash-checks), 8 fixed iterations. PROMOTED to a full hash oracle
    // (r15): the per-edge contributions are FIXED-POINT integers
    // (floor(r/outdeg * 1e12 + 0.5)) summed exactly — association-order-
    // free, so a DuckDB replay of the 8 iterations UNROLLED as chained
    // CTEs (fixed count => no recursion needed) lands on identical
    // doubles when every IEEE op is mirrored in order; decimal literals
    // are CAST to DOUBLE in the SQL because DuckDB parses 0.85 as
    // DECIMAL while Scala computes in doubles (1 - 0.85 differs between
    // the two number systems). The spec keeps the driver-twin replay,
    // mass conservation, and the uniform lower bound. Output scaled by N
    // (mean 1.0) so ROUND(4) keeps resolution at any corpus size.
    QueryDef("q85_pagerank",
      (s, d) => {
        val nodes = t(s, d, "embeddings").select(col("vec_id").as("id"))
        val edges = TextSearch.knnGraph(s, d)
          .select(col("qid").as("src"), col("nn_id").as("dst"))
        val n = nodes.count().toDouble
        pagerank(nodes, edges)
          .select(col("id").as("vec_id"), r4(col("r") * n).as("rank_x_n"))
          .orderBy(col("rank_x_n").desc, col("vec_id"))
          .limit(20)
      },
      Some {
        val d = s"CAST($PrDamping AS DOUBLE)"
        val steps = (1 to PrIters).map { k =>
          val p = s"pr${k - 1}"
          s"""s$k AS MATERIALIZED (SELECT e.dst,
             |    SUM(CAST(FLOOR(p.r / o.outdeg * 1e12 + 0.5) AS BIGINT))
             |      AS s12
             |  FROM edges e JOIN $p p ON p.id = e.src
             |  JOIN outdeg o ON o.src = e.src GROUP BY e.dst),
             |d$k AS MATERIALIZED (SELECT
             |    COALESCE(SUM(CAST(FLOOR(p.r * 1e12 + 0.5)
             |      AS BIGINT)), 0) AS d12
             |  FROM $p p WHERE p.id NOT IN (SELECT src FROM edges)),
             |pr$k AS MATERIALIZED (SELECT n.id,
             |    (CAST(1 AS DOUBLE) - $d) / nn.n
             |      + $d * (COALESCE(s.s12, 0) / 1e12
             |        + dg.d12 / 1e12 / nn.n) AS r
             |  FROM nodes n CROSS JOIN nn CROSS JOIN d$k dg
             |  LEFT JOIN s$k s ON s.dst = n.id)""".stripMargin
        }.mkString(",\n")
        // every multiply-referenced CTE is MATERIALIZED: DuckDB inlines
        // plain CTEs per reference, and the 8 iterations reference
        // edges/ranks 3x each — un-materialized, the whole IVF training
        // chain would re-run dozens of times (measured: minutes at
        // sf0.001 vs ~1 s materialized)
        s"""WITH ${TextSearch.KNN_GRAPH_CTES},
           |edges AS MATERIALIZED (SELECT qid AS src, nn_id AS dst FROM g),
           |outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg
           |  FROM edges GROUP BY src),
           |nodes AS MATERIALIZED (SELECT vec_id AS id FROM embeddings),
           |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n
           |  FROM nodes),
           |pr0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS r
           |  FROM nodes CROSS JOIN nn),
           |$steps
           |SELECT p.id AS vec_id,
           |  CAST(ROUND(p.r * nn.n, 4) AS DOUBLE) AS rank_x_n
           |FROM pr$PrIters p CROSS JOIN nn
           |ORDER BY rank_x_n DESC, vec_id LIMIT 20""".stripMargin
      })
  )
}
