package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Math contracts of the vector-statistics layer (q76/q77/q80) — the
  * rows-only members (PCA, k-means) have no DuckDB oracle, so the linear
  * algebra itself is pinned here, on sf0.001 where a driver-side
  * brute-force twin is affordable.
  */
class VectorStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val local: Array[Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)

  test("q76: covariance matches a driver-side brute-force computation") {
    val rows = SparkEntry.queries("q76_embedding_covariance")(spark, dir)
      .collect()
    val n = local.length
    val d = local.head.length
    val mean = Array.tabulate(d)(k => local.map(_(k)).sum / n)
    assert(rows.length == d * (d + 1) / 2)
    rows.foreach { r =>
      val i = r.getInt(0) - 1; val j = r.getInt(1) - 1
      val exp = local.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j)
      // the query's exact-decimal path vs naive double summation: agreement
      // to well under the ROUND(4) grid proves the decimal plumbing carries
      // the right quantity (not just a deterministic one)
      assert(math.abs(r.getDouble(2) - exp) < 1e-3,
        s"cov($i,$j): got ${r.getDouble(2)}, brute $exp")
    }
  }

  test("q77: PC1 beats every coordinate axis and carries its eigenvalue") {
    val (nRows, mean, cov) = graft.queries.VectorStats
      .covarianceMatrix(spark, dir)
    assert(nRows == local.length)
    val (w, lambda) = graft.queries.VectorStats.powerIteration(cov)
    // Rayleigh quotient of the returned eigenvector is the max variance
    // direction: it must dominate every coordinate axis's variance
    val maxAxis = cov.indices.map(i => cov(i)(i)).max
    assert(lambda >= maxAxis - 1e-9,
      s"lambda $lambda < best axis variance $maxAxis")
    // unit norm + eigenvector residual ||Cw - lambda w|| small
    assert(math.abs(w.map(x => x * x).sum - 1.0) < 1e-9)
    val res = cov.indices.map { i =>
      val cw = cov(i).zip(w).map { case (a, b) => a * b }.sum
      math.abs(cw - lambda * w(i))
    }.max
    assert(res < 1e-6, s"eigen residual $res")

    // the distributed projection's variance equals the eigenvalue (the
    // defining property of PCA), and the emitted scores match a driver
    // recompute of (v - mean) . w
    val out = SparkEntry.queries("q77_pca_projection")(spark, dir).collect()
    assert(out.length == local.length)
    val scores = out.map(_.getDouble(1))
    local.zip(scores).foreach { case (v, s) =>
      val exp = v.indices.map(k => (v(k) - mean(k)) * w(k)).sum
      assert(math.abs(s - exp) < 1e-3)
    }
    val sMean = scores.sum / scores.length
    val sVar = scores.map(x => (x - sMean) * (x - sMean)).sum / scores.length
    assert(math.abs(sVar - lambda) < 5e-3,
      s"projection variance $sVar != eigenvalue $lambda")
    assert(out.forall(r => r.getDouble(3) > 0 && r.getDouble(3) <= 1))
  }

  test("q77: repeated runs are bit-identical (exact decimal upstream)") {
    val a = SparkEntry.queries("q77_pca_projection")(spark, dir).collect()
    val b = SparkEntry.queries("q77_pca_projection")(spark, dir).collect()
    assert(a.sameElements(b))
  }

  test("q80: SSE is monotone non-increasing and partitions are exact") {
    val (out, sse) = graft.queries.VectorStats.kmeans(spark, dir)
    assert(sse.nonEmpty)
    sse.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-6, s"SSE rose: $sse")
      case _ =>
    }
    val rows = out.collect()
    // every cluster id in range, counts sum to the corpus, SSE parts >= 0
    assert(rows.map(_.getLong(1)).sum == local.length)
    assert(rows.forall(r => r.getInt(0) >= 0
      && r.getInt(0) < graft.queries.VectorStats.KmeansK))
    assert(rows.forall(_.getDouble(2) >= 0.0))
    // determinism: a second full run emits the identical summary
    val again = graft.queries.VectorStats.kmeans(spark, dir)._1.collect()
    assert(rows.sameElements(again))
  }

  test("q80: assignment is the true argmin over the final centroids") {
    // recompute the final centroids driver-side by running the same number
    // of Lloyd iterations on the collected corpus; cluster counts must match
    val k = graft.queries.VectorStats.KmeansK
    val iters = graft.queries.VectorStats.KmeansIters
    var cents = (0 until k).map(i => local(i)).toArray
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(v: Array[Double]): Int =
      cents.indices.minBy(c => (d2(v, cents(c)), c))
    for (_ <- 1 to iters) {
      val groups = local.groupBy(assign)
      cents = cents.indices.map { c =>
        groups.get(c) match {
          case Some(vs) =>
            val dDim = vs.head.length
            Array.tabulate(dDim)(p => vs.map(_(p)).sum / vs.length)
          case None => cents(c)
        }
      }.toArray
    }
    val expCounts = local.groupBy(assign).view.mapValues(_.length).toMap
    val gotCounts = SparkEntry.queries("q80_kmeans")(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1).toInt).toMap
    assert(gotCounts == expCounts,
      s"cluster sizes diverge: spark $gotCounts vs driver $expCounts")
  }

  test("q85: PageRank matches an exact driver-twin replay; mass conserves") {
    val nodes = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).sorted
    val edges = graft.queries.TextSearch.knnGraph(spark, dir)
      .select("qid", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = nodes.length.toDouble
    val d = graft.queries.VectorStats.PrDamping
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap

    // driver replay of the EXACT fixed-point iteration (same quantization,
    // same double expressions) — distributed and local must agree bitwise
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to graft.queries.VectorStats.PrIters) {
      val c12 = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (src, dst) =>
        c12(dst) += math.floor(r(src) / outdeg(src) * 1e12 + 0.5).toLong
      }
      val d12 = nodes.filterNot(outdeg.contains)
        .map(id => math.floor(r(id) * 1e12 + 0.5).toLong).sum
      val dm = d12 / 1e12
      r = nodes.map(id => id ->
        ((1 - d) / n + d * (c12(id) / 1e12 + dm / n))).toMap
    }
    val got = graft.queries.VectorStats.pagerank(
        spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id").as("id")),
        graft.queries.TextSearch.knnGraph(spark, dir)
          .select(col("qid").as("src"), col("nn_id").as("dst")))
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(got.keySet == r.keySet)
    nodes.foreach { id =>
      assert(got(id) == r(id),
        s"rank($id): spark ${got(id)} != twin ${r(id)}")
    }
    // mass conservation (quantization loses <= n*1e-12 per iteration) and
    // the uniform teleport lower bound
    val mass = r.values.sum
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass $mass")
    assert(r.values.forall(_ >= (1 - d) / n - 1e-12))

    val top = SparkEntry.queries("q85_pagerank")(spark, dir).collect()
    assert(top.length == 20)
    assert(top.map(_.getDouble(1)).toSeq
      == top.map(_.getDouble(1)).sorted.reverse.toSeq)
  }

  test("q85: an edgeless graph keeps the uniform distribution") {
    // degenerate case: every node dangling — all rank mass teleports each
    // iteration and the stationary distribution must stay exactly uniform
    // (a drift here would mean the dangling-mass redistribution loses or
    // duplicates mass)
    val sp = spark
    import sp.implicits._
    val nodes = sp.range(0, 50).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val ranks = graft.queries.VectorStats.pagerank(nodes, edges, iters = 3)
      .collect().map(_.getDouble(1))
    assert(ranks.length == 50)
    assert(ranks.distinct.length == 1, s"uniformity broke: ${ranks.toSet}")
    assert(math.abs(ranks.sum - 1.0) < 1e-6)
  }

  test("q75/q75b: pivot and unpivot are exact inverses of the groupBy") {
    val direct = SparkEntry.queries("q75b_unpivot")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val plain = Q.t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(Q.sum4(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(direct.sameElements(plain))
  }
}
