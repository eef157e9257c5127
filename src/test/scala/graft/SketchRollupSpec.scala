package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q100: the mergeable-sketch contract — per-slice HLL sketches union into
  * any coarser rollup without rescanning, with bounded estimate error
  * (lgK=12 -> ~1.6% relative standard error; 5% is ~3 sigma).
  */
class SketchRollupSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q100: every slice and the union rollup estimate within 5% of exact") {
    val spark = TestSpark.spark
    // since the r12 oracle promotion the query itself computes the 5%
    // verdict (the estimate column would hash-mismatch across engines);
    // the spec asserts the verdict and the rig's shape
    val rows = SparkEntry.queries("q100_hll_sketch_rollup")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.exists(_._1 == "__all__"), "missing the union rollup row")
    assert(rows.length >= 3, s"degenerate rig: ${rows.length} rows")
    rows.foreach { case (src, exact, withinTol) =>
      assert(exact > 0, s"$src: exact distinct is 0")
      assert(withinTol, s"$src: sketch estimate outside 5% of $exact")
    }
  }

  test("union of slice sketches agrees with a direct whole-corpus sketch") {
    val spark = TestSpark.spark
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), md5(col("text")).as("fp"))
    val viaUnion = docs.groupBy("source")
      .agg(expr("hll_sketch_agg(fp, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .head().getLong(0)
    val direct = docs.agg(expr("hll_sketch_estimate(hll_sketch_agg(fp, 12))"))
      .head().getLong(0)
    // union drops the HIP estimator for the composite one, so the two are
    // close but not bit-equal — the mergeability law is agreement, 2%
    val diff = math.abs(viaUnion - direct).toDouble / math.max(direct, 1L)
    assert(diff <= 0.02, s"union $viaUnion vs direct $direct ($diff)")
  }
}
