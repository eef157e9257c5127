package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Scale-safety guarantees of the near-dup operators on adversarial skew:
  *
  *  - q35: an LSH band bucket holding (almost) the whole corpus — the
  *    hot-bucket case that made the unbounded all-pairs band join quadratic
  *    (k² pairs) — must emit bounded star edges (k-1 pairs, same union-find
  *    connectivity) instead, with the dropped-pair count observable in q35b.
  *  - q37: a label block above EmbedBlockCap must join on (label, bucket)
  *    — the composed key must be visible in the physical plan — while small
  *    labels keep the exact all-pairs path.
  */
class LshScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def finalized(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Seq.empty
    }
    (p +: (p.children ++ nested).flatMap(collectAll)) ++ p.subqueries.flatMap(collectAll)
  }

  test("q35: a 3000-doc duplicate cluster emits k-1 star edges, not k^2 pairs") {
    val sp = spark
    import sp.implicits._
    val dir = tempDir("graft-lsh-hot")
    val n = 3000
    val dup = "the quick brown fox jumps over the lazy dog"
    val docs =
      (0L until n.toLong).map(i => (i, dup, "en", "synth", dup.length.toLong)) ++
        (0 until 5).map(i =>
          (n.toLong + i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i",
            "en", "synth", 40L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val df = SparkEntry.queries("q35_minhash_lsh")(sp, dir)
    val rows = df.collect()
    // the old all-pairs join emits n(n-1)/2 = 4,498,500 pairs here; the
    // star-edge rewrite emits exactly k-1 anchored to MIN(doc_id)=0
    assert(rows.length == n - 1, s"expected ${n - 1} star edges, got ${rows.length}")
    // bucket sizing must stay a partial-aggregatable groupBy: a window
    // would route this whole hot bucket through ONE task's buffer (the r3
    // plan this spec pins against regression)
    assert(!collectAll(finalized(df)).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "q35 must not size buckets through a window")
    assert(rows.forall(_.getAs[Long]("doc_a") == 0L))
    assert(rows.forall(_.getAs[Double]("est_sim") == 1.0))
    // the global bound the cap guarantees at any scale
    assert(rows.length <= 3 * (n + 5))

    // q35b makes the drop observable: per band one oversized bucket holding
    // the cluster, with the exact dropped all-pairs count
    val stats = SparkEntry.queries("q35b_lsh_bucket_stats")(sp, dir).collect()
    assert(stats.length == 3)
    val expectedDropped = n.toLong * (n - 1) / 2 - (n - 1)
    stats.foreach { r =>
      assert(r.getAs[Long]("max_bucket") == n.toLong)
      assert(r.getAs[Long]("oversized_buckets") == 1L)
      assert(r.getAs[Long]("dropped_pairs") == expectedDropped)
      assert(r.getAs[Long]("n_buckets") == 6L) // cluster bucket + 5 singletons
    }
  }

  test("q35: buckets at or under the cap keep exact all-pairs semantics") {
    val sp = spark
    import sp.implicits._
    val dir = tempDir("graft-lsh-small")
    val k = LshBucketCapForTest // alias below keeps the spec honest
    val dup = "small cluster shared text body"
    val docs =
      (0L until k.toLong).map(i => (i, dup, "en", "synth", dup.length.toLong)) ++
        Seq((k.toLong, "another unique standalone document", "en", "synth", 34L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q35_minhash_lsh")(sp, dir).collect()
    assert(rows.length == k * (k - 1) / 2, "cap-sized bucket must stay all-pairs")
  }

  private def LshBucketCapForTest: Int = graft.queries.LlmOps.LshBucketCap

  test("q36: a 3000-doc duplicate cluster emits k-1 star edges, not k^2 pairs") {
    val sp = spark
    import sp.implicits._
    val dir = tempDir("graft-simhash-hot")
    val n = 3000
    // identical docs -> identical simhash -> every byte-band bucket holds
    // the whole cluster: the pre-cap plan emitted 4 * C(3000,2) ~ 18M join
    // rows; the star-edge rewrite emits exactly k-1 pairs anchored at 0
    val dup = "the quick brown fox jumps over the lazy dog"
    val docs =
      (0L until n.toLong).map(i => (i, dup, "en", "synth", dup.length.toLong)) ++
        (0 until 5).map(i =>
          (n.toLong + i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i",
            "en", "synth", 40L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val df = SparkEntry.queries("q36_simhash")(sp, dir)
    val rows = df.collect()
    assert(!collectAll(finalized(df)).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "q36 must not size buckets through a window")
    val cluster = rows.filter(_.getAs[Long]("doc_a") == 0L)
    assert(cluster.length == n - 1, s"expected ${n - 1} star edges, got ${cluster.length}")
    assert(cluster.forall(_.getAs[Int]("hamming") == 0))
    // non-anchor cluster members must NOT pair with each other (that is the
    // bound); any extra rows could only come from the 5 unique docs
    assert(rows.length <= (n - 1) + 5 * 4 / 2, s"unbounded pairs: ${rows.length}")
  }

  test("q37: oversized label joins on (label, bucket); small label stays exact") {
    val sp = spark
    import sp.implicits._
    val dir = tempDir("graft-emb-skew")
    val dim = 64
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)
    val cap = graft.queries.LlmOps.EmbedBlockCap
    val big = cap + 72 // 200 rows in label 1: two 100-copy duplicate groups
    val rows =
      (0 until big).map { i =>
        (i.toLong, if (i % 2 == 0) oneHot(0) else oneHot(1), 1)
      } ++
        // label 2 (small): one duplicate pair + 8 mutually-orthogonal vectors
        Seq((big.toLong, oneHot(10), 2), (big.toLong + 1, oneHot(10), 2)) ++
        (2 until 10).map(i => (big.toLong + i, oneHot(10 + i), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val df = SparkEntry.queries("q37_embedding_neardup")(sp, dir)
    val out = df.collect()
    // big label: identical copies pair up inside their hyperplane bucket
    // (2 * C(100,2) = 9900); orthogonal cross-pairs are filtered by sim;
    // small label: exactly the one duplicate pair
    assert(out.length == 2 * (100 * 99 / 2) + 1, s"got ${out.length}")
    assert(out.forall(_.getAs[Double]("sim") == 1.0))

    // the scale promise: some physical join keys compose label AND bucket
    val joins = collectAll(finalized(df)).collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty)
    val composed = joins.exists { j =>
      val keys = j.leftKeys.map(_.toString).mkString(",")
      keys.contains("label") && keys.contains("bucket")
    }
    assert(composed, s"no join keyed on (label, bucket):\n${joins.map(_.verboseString(2)).mkString("\n")}")
  }
}
