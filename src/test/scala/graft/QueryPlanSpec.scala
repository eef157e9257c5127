package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions on the sf0.001 testdata: the scale properties
  * SURVEY.md §4 promises (pushdown, pruning, broadcast) actually hold.
  */
class QueryPlanSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(TestSpark.spark, dir)
    df.collect() // finalize AQE
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    // AQE wraps executed subtrees in leaf QueryStageExec nodes; traverse
    // into them or the interesting operators are invisible.
    val nested = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Seq.empty
    }
    (p +: (p.children ++ nested).flatMap(collectAll)) ++ p.subqueries.flatMap(collectAll)
  }

  test("q01: filters are pushed to the parquet scan and columns pruned") {
    val scans = collectAll(executedPlan("q01_scan_filter_project"))
      .collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.dataFilters.nonEmpty, "expected pushed data filters")
    val readCols = scan.schema.fieldNames.toSet
    assert(readCols.subsetOf(Set(
      "l_orderkey", "l_linenumber", "l_shipdate", "l_discount",
      "l_quantity", "l_extendedprice")),
      s"scan reads more than the query needs: $readCols")
  }

  test("q04: dimension tables broadcast (BroadcastHashJoin present)") {
    val plan = executedPlan("q04_broadcast_join")
    val broadcasts = collectAll(plan).collect { case b: BroadcastExchangeLike => b }
    assert(broadcasts.nonEmpty, s"no broadcast exchange in:\n$plan")
  }

  test("q02: aggregate is partial (map-side combine) before the exchange") {
    val plan = executedPlan("q02_agg_pricing_summary")
    val aggs = collectAll(plan)
      .collect { case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a }
    // partial + final pair
    assert(aggs.size >= 2, s"expected partial+final hash aggregate:\n$plan")
  }

  test("q57: no corpus-wide single-partition window (two-level prefix sum)") {
    // r5 verdict item 2: the packing cumsum must not route the whole corpus
    // through one window task. Required shape: (a) the corpus-level cumsum
    // is a PARTITIONED window (per doc_id shard); (b) any window WITHOUT
    // partition columns may only run over the per-shard totals — i.e. its
    // input subtree contains an Aggregate, never a raw file scan.
    val windows = collectAll(executedPlan("q57_sequence_packing"))
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "expected window operators in the q57 plan")
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "expected a shard-partitioned window for the corpus-level cumsum")
    // a scan reachable from the window WITHOUT passing through an
    // aggregate means the window consumes corpus-sized input
    def scanAboveAgg(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        false // everything below is pre-aggregated: bounded input
      case _: FileSourceScanExec => true
      case _: org.apache.spark.sql.execution.RDDScanExec => true // checkpoint
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scanAboveAgg(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scanAboveAgg(r.child)
      case a: AdaptiveSparkPlanExec => scanAboveAgg(a.executedPlan)
      case other => other.children.exists(scanAboveAgg)
    }
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(!scanAboveAgg(w.child),
        s"single-partition window runs over non-aggregated (corpus-sized) input:\n$w")
    }
  }

  test("q60: every window is shard-partitioned (no global ordering task)") {
    // the training-shuffle position counter must never route the corpus
    // through one task: all windows partition on the shard key
    val windows = collectAll(executedPlan("q60_shuffle_shard"))
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "expected a window operator in the q60 plan")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"q60 window is unpartitioned (global single-task ordering):\n$w")
    }
  }

  test("q76: exactly one data exchange, and it carries only aggregates") {
    // the gram-matrix promise: vectors never shuffle. Every shuffle
    // exchange in the plan must sit ABOVE a partial aggregate (i.e. carry
    // d^2-bounded combined rows), never raw vector rows.
    val plan = executedPlan("q76_embedding_covariance")
    val shuffles = collectAll(plan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.nonEmpty, "expected a shuffle for the (i,j) aggregate")
    def hasAggBelow(p: SparkPlan): Boolean = collectAll(p).exists {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case _ => false
    }
    val rangeOrAgg = shuffles.forall { s =>
      // the final ORDER BY range exchange runs over 2080 aggregated rows;
      // every hash exchange must be fed by a partial aggregate
      hasAggBelow(s.child)
    }
    assert(rangeOrAgg,
      s"a shuffle carries non-aggregated (vector-sized) rows:\n$plan")
  }

  test("q82: the dimension merge runs on broadcast joins only") {
    // MERGE shape: the CDC batch broadcasts; the customer dimension must
    // not hash-shuffle for any of the three join branches (the only
    // allowed shuffle is the final ORDER BY range exchange)
    val plan = executedPlan("q82_scd2_merge")
    val joins = collectAll(plan).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joins.nonEmpty, "expected join operators in the q82 plan")
    joins.foreach {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => ()
      case other => fail(s"dimension shuffled for a merge branch:\n$other")
    }
  }

  test("q87: lateral subquery decorrelates (no per-row nested loop)") {
    // the correlated ORDER BY+LIMIT must become a ranked window + join —
    // a BroadcastNestedLoopJoin/CartesianProduct here means Catalyst fell
    // back to executing the subquery per outer row: O(n*m) at scale
    val all = collectAll(executedPlan("q87_lateral_topk"))
    assert(!all.exists {
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec => true
      case _ => false
    }, "lateral join executed as a nested loop")
    // and the top-k is bounded BEFORE the shuffle (partial WindowGroupLimit)
    assert(all.exists {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        w.mode == org.apache.spark.sql.execution.window.Partial
      case _ => false
    }, "expected a partial (map-side) WindowGroupLimit below the exchange")
  }

  test("q113: the quota rank is map-side-bounded (partial WindowGroupLimit)") {
    // a mega-stratum must never materialize its full sort: each map task
    // forwards at most `quota` rows per stratum before the exchange
    val all = collectAll(executedPlan("q113_quota_sample"))
    assert(all.exists {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        w.mode == org.apache.spark.sql.execution.window.Partial
      case _ => false
    }, "expected a partial (map-side) WindowGroupLimit below the exchange")
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  private def executedPlanOf(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("q80: the Lloyd iteration job is one partial-agg shuffle, no joins") {
    // the per-iteration claim (VERDICT r7 #7): assignment is a pure
    // Project (centroids are plan literals), the only exchange carries
    // k*d-bounded partial aggregates, and vectors never join anything
    import graft.queries.VectorStats
    val e = VectorStats.vecs(TestSpark.spark, dir)
    val cents = e.filter(org.apache.spark.sql.functions.col("vec_id") < VectorStats.KmeansK)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1).toArray)
    val all = collectAll(executedPlanOf(VectorStats.lloydUpdate(e, cents)))
    assert(!all.exists {
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => true
      case _ => false
    }, "Lloyd iteration must not join — centroids ride as plan literals")
    val shuffles = all.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
    }
    assert(shuffles.nonEmpty, "expected the (cluster, coord) aggregate exchange")
    def hasAggBelow(p: SparkPlan): Boolean = collectAll(p).exists {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case _ => false
    }
    shuffles.foreach { s =>
      assert(hasAggBelow(s.child),
        s"iteration shuffle carries non-aggregated (vector-sized) rows:\n$s")
    }
  }

  test("q85: the PageRank iteration is keyed joins + a one-row broadcast") {
    // per-iteration claim: contrib join keyed on src, partial-agg groupBy
    // on dst before its exchange, dangling mass attached as a ONE-ROW
    // broadcast (the only nested-loop join allowed), no cartesian product
    import graft.queries.VectorStats
    import org.apache.spark.sql.functions.{col, count, lit}
    import org.apache.spark.sql.execution.GraftCheckpoint.localCheckpointFlatStats
    val s = TestSpark.spark
    val nodes = VectorStats.vecs(s, dir).select(col("vec_id").as("id"))
    val edges = graft.queries.TextSearch.knnGraph(s, dir)
      .select(col("qid").as("src"), col("nn_id").as("dst"))
    val nN = nodes.count().toDouble
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = localCheckpointFlatStats(edges.join(outdeg, "src"))
    val srcs = e.select("src").distinct()
    val ranks = localCheckpointFlatStats(nodes.withColumn("r", lit(1.0 / nN)))
    val step = VectorStats.pagerankStep(nodes, e, srcs, ranks, nN,
      VectorStats.PrDamping)
    val all = collectAll(executedPlanOf(step))
    assert(!all.exists {
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec => true
      case _ => false
    }, "PageRank iteration contains a cartesian product")
    // every nested-loop join must be the dangling-mass scalar attach:
    // its build side reduces to one row (an Aggregate with no grouping)
    all.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.foreach { b =>
      val build = b.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
      }
      val buildAggs = collectAll(build).collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }
      assert(buildAggs.nonEmpty && buildAggs.exists(_.groupingExpressions.isEmpty),
        s"nested-loop join whose build side is not a one-row scalar:\n$b")
    }
    // the dst-keyed contribution exchange is fed by a partial aggregate
    def hasAggBelow(p: SparkPlan): Boolean = collectAll(p).exists {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case _ => false
    }
    val hashShuffles = all.collect {
      case sh: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
        if sh.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => sh
    }
    assert(hashShuffles.exists(sh => hasAggBelow(sh.child)),
      "expected the dst-keyed partial-agg contribution exchange")
    graft.queries.LlmOps.releaseCheckpoint(e)
    graft.queries.LlmOps.releaseCheckpoint(ranks)
  }

  test("q93: recursion runs through the native UnionLoop operator") {
    val all = collectAll(executedPlan("q93_recursive_hierarchy"))
    assert(all.exists(_.getClass.getSimpleName.startsWith("UnionLoop")),
      "expected Spark 4's UnionLoopExec for WITH RECURSIVE")
  }

  test("q94: dup-set joins broadcast; the corpus is never join-shuffled") {
    val all = collectAll(executedPlan("q94_line_dedup"))
    val bhj = all.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.nonEmpty, "expected the filtered dup set on a broadcast join")
    assert(!all.exists {
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case _ => false
    }, "corpus side must not be shuffled for the dup-mark join")
    // line-frequency shuffle has map-side combine below it
    val hashShuffles = all.collect {
      case sh: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
        if sh.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => sh
    }
    def hasAggBelow(p: SparkPlan): Boolean = collectAll(p).exists {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case _ => false
    }
    assert(hashShuffles.nonEmpty && hashShuffles.forall(sh => hasAggBelow(sh.child)),
      "every hash exchange must be fed by a partial aggregate")
  }

  test("q99: exact rescue pass joins the candidate set broadcast") {
    val all = collectAll(executedPlan("q99_heavy_hitters"))
    // the candidate gate must be a broadcast semi-join (candidates are
    // <= sketch capacity by construction), never a shuffled join of the
    // exploded corpus against them
    val bhj = all.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.exists(_.joinType.toString == "LeftSemi"),
      "expected a broadcast LEFT SEMI gate on the candidate tokens")
    assert(!all.exists {
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case _ => false
    }, "the exploded corpus must not shuffle to meet the candidate set")
    // the post-gate count groupBy partial-aggregates below its exchange
    val hashShuffles = all.collect {
      case sh: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
        if sh.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => sh
    }
    def hasAggBelow(p: SparkPlan): Boolean = collectAll(p).exists {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case _ => false
    }
    assert(hashShuffles.forall(sh => hasAggBelow(sh.child)),
      "candidate-count exchange must be fed by a partial aggregate")
  }

  test("q95: variant shred is join-free and prunes the orders scan") {
    val all = collectAll(executedPlan("q95_variant_shred"))
    assert(!all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BaseJoinExec]),
      "variant ingestion must be a pure per-row pipeline")
    val scans = all.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    assert(scans.head.schema.fieldNames.toSet == Set(
      "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
      s"scan not pruned: ${scans.head.schema.fieldNames.toSet}")
  }
}
