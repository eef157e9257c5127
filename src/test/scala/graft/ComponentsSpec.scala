package graft

import org.scalatest.funsuite.AnyFunSuite

/** q51 resource hygiene: the iterative label propagation localCheckpoints
  * a labels generation per round (plus the edges), and every generation
  * except the final one must be RELEASED before the query returns —
  * Dataset.unpersist is a no-op on checkpointed Datasets (it only reaches
  * CacheManager entries), so this pins that the underlying RDDs are
  * actually freed, not just believed freed.
  */
class ComponentsSpec extends AnyFunSuite {

  test("q51 releases every intermediate checkpoint generation") {
    val spark = TestSpark.spark
    def persisted: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = persisted
    val df = SparkEntry.queries("q51_neardup_components")(
      spark, "/root/testdata/sf0.001")
    val rows = df.count()
    assert(rows == 500) // one row per document
    val leaked = persisted -- before
    // only the FINAL labels generation may remain (the returned DataFrame
    // is backed by it); edges and all intermediate rounds must be gone
    assert(leaked.size <= 1,
      s"q51 left ${leaked.size} persistent RDDs behind: $leaked")
  }

  test("pointer doubling: a 10k-node chain converges in <= 15 rounds") {
    // the adversarial shape for one-hop min-label propagation: a pure
    // chain 0-1-2-...-9999 (no shortcut edges) has diameter ~n, so without
    // the doubling step convergence needs ~n rounds and the 50-round bound
    // aborts. With doubling, covered distance follows d -> 2(d+1), so
    // ceil(log2(n)) + 1 detection round ≈ 14 rounds here.
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 10000L
    val nodes = spark.range(n).select(col("id").as("doc_id"))
    val fwd = spark.range(n - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val edges = fwd
      .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val (labels, rounds, frontier) =
      graft.queries.LlmOps.propagateComponents(nodes, edges)
    assert(rounds <= 15, s"chain of $n took $rounds rounds")
    // one component, labeled by its minimum node
    assert(labels.agg(max("comp")).head().getLong(0) == 0L)
    assert(labels.count() == n)
    // DELTA ITERATION observable: the frontier (rows whose label changed,
    // == next round's join probe volume) is monotone non-increasing on the
    // chain — unconverged count is n minus the doubled coverage 2^k — and
    // the fixpoint round is an empty frontier. The chain is delta
    // iteration's WORST case (nothing converges until coverage reaches
    // it); star/cluster graphs shed most of the frontier in round one.
    assert(frontier.last == 0L)
    assert(frontier.zip(frontier.tail).forall { case (a, b) => b <= a },
      s"frontier grew between rounds: $frontier")
    // the closing round's probe volume collapsed well below the corpus
    // (chain worst case: the last nonzero frontier is n minus the tripled
    // coverage 3^k, under half of n; cluster graphs shed far more — the
    // BENCH_NOTES 10x-rig trace shows 70k -> 7k -> 2.4k -> 20 -> 0)
    assert(frontier(frontier.size - 2) < frontier.head / 2,
      s"closing-round frontier still corpus-sized: $frontier")
  }

  test("q59: each canonical doc holds its component's max quality score") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val res = SparkEntry.queries("q59_dedup_resolution")(spark, dir).cache()
    val comps = SparkEntry.queries("q51_neardup_components")(spark, dir)
    // component sets agree between the two views of the same labels
    assert(res.count() == comps.select("comp").distinct().count())
    // n_members sums back to the corpus, and every canonical doc is a
    // member of its own component carrying the component-best score
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(res.agg(sum("n_members")).head().getLong(0) == n)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("canonical_doc"),
        size(array_distinct(split(col("text"), " "))).as("doc_score"))
    val joined = res.join(toks, "canonical_doc")
    assert(joined.filter(col("doc_score") =!= col("best_score")).count() == 0,
      "a canonical doc does not carry its component's best score")
    // near-dups exist at this SF: some component resolves away members
    assert(res.filter(col("n_members") > 1).count() > 0)
    res.unpersist()
  }
}
