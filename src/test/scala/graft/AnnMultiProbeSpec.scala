package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall guarantee of q41's multi-probe ANN on data where recall is
  * meaningful: a 30-member near-dup cluster (sim ~0.99 to the query) inside
  * 400 random distractors. With AnnBits=16 a single-bucket lookup loses any
  * neighbor whose projection crossed one low-margin hyperplane (~half of
  * them at sim 0.99); probing the sign-flip subsets of the query's
  * AnnProbePlanes lowest-|projection| planes must recover enough of the
  * cluster that the whole top-5 is cluster members.
  *
  * The corpus is seed-fixed, so the assertion is deterministic — this spec
  * is the "recall spec" companion to the oracle hash-match (which only
  * proves Spark and DuckDB agree, not that the operator finds anything).
  */
class AnnMultiProbeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("q41: multi-probe top-5 is drawn from the near-dup cluster") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-probe").toString
    val dim = 64
    val rnd = new scala.util.Random(42)
    def gaussian(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    def normalize(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = gaussian()
    val cluster = (1 to 30).map { i =>
      (i.toLong, normalize(base.zip(gaussian()).map { case (b, g) => b + 0.08 * g }), 1)
    }
    val distractors = (31 to 430).map(i => (i.toLong, normalize(gaussian()), 2))
    val rows = Seq((0L, normalize(base), 1)) ++ cluster ++ distractors
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("q41_ann_lsh")(sp, dir).collect()
    assert(out.length == 5, s"expected a full top-5, got ${out.length}")
    out.foreach { r =>
      val (id, sim) = (r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))
      assert(id >= 1 && id <= 30, s"distractor $id (sim $sim) in top-5")
      assert(sim >= 0.9, s"top-5 member $id has sim $sim < 0.9")
    }
  }
}
