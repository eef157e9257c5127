package graft

import graft.queries.LlmOps
import org.apache.spark.sql.execution.FilterExec
import org.scalatest.funsuite.AnyFunSuite

/** q106 bloom-gated decontamination: cross-regime parity with q56 (same
  * declared semantics, different physical shape), the bloom prefilter's
  * selectivity and soundness, the scan-side placement of the
  * might_contain predicate, and the empty-holdout edge.
  */
class BloomDecontamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q106 equals q56 row for row (bloom regime changes nothing)") {
    val fast = SparkEntry.queries("q106_bloom_decontamination")(spark, dir)
      .collect().toSeq
    val ref = SparkEntry.queries("q56_decontamination")(spark, dir)
      .collect().toSeq
    assert(fast.nonEmpty, "live corpus has cross-split contamination")
    assert(fast == ref, s"regimes diverged: bloom=${fast.size} bcast=${ref.size}")
  }

  test("bloom prefilter is sound (keeps every true hit) and selective") {
    val (train, survivors, bench) = LlmOps.bloomDecontamParts(spark, dir)
    val nTrain = train.count()
    val nSurv = survivors.count()
    // soundness: a bloom has no false negatives, so every train shingle
    // that actually occurs in the bench set must survive the prefilter
    val trueHits = train.join(bench, "sh").count()
    val survHits = survivors.join(bench, "sh").count()
    assert(survHits == trueHits,
      s"bloom dropped true hits: $survHits of $trueHits survived")
    // selectivity: survivors ~ true hits + fpp * rest; at fpp = 1% the
    // stream must shrink by well over 2x even on this dup-heavy corpus
    assert(nSurv * 2 < nTrain,
      s"bloom not selective: $nSurv of $nTrain train shingles survived")
    assert(nSurv >= trueHits, "survivors must contain the true hits")
  }

  test("might_contain runs as a Filter predicate, below any join") {
    val (_, survivors, _) = LlmOps.bloomDecontamParts(spark, dir)
    val plan = PlanWalk.executedPlanOf(survivors)
    val all = PlanWalk.collectAll(plan)
    val bloomFilters = all.collect {
      case f: FilterExec if f.condition.toString.contains("might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "no might_contain Filter in the plan")
    // the prefilter must see the raw shingle stream: no join may sit
    // beneath it (the whole point is killing rows before any exchange
    // carries them)
    bloomFilters.foreach { f =>
      val below = PlanWalk.collectAll(f)
      assert(!below.exists(_.nodeName.toLowerCase.contains("join")),
        s"a join feeds the bloom filter:\n$f")
    }
  }

  test("empty holdout: no bench docs -> empty output, no failure") {
    val sp = spark
    import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    // ids 1..6 — none divisible by 19, so the bench side is EMPTY
    val rows = (1L to 6L).map(i => i -> (1 to 30).map(j => s"w${i}_$j").mkString(" "))
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q106_bloom_decontamination")(spark, tmp)
      .collect()
    assert(out.isEmpty, s"empty holdout must yield no contamination: ${out.toSeq}")
  }
}
