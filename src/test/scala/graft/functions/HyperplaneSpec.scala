package graft.functions

import graft.TestSpark
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

/** The single-pass hyperplane expressions must be BIT-identical to the
  * Column-composed formula they replaced (per-plane `aggregate` folds in
  * element order) — q41/q37/q48's oracle SQL mirrors that formula, so any
  * drift here is an oracle mismatch at the next driver run.
  */
class HyperplaneSpec extends AnyFunSuite {

  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }

  /** The r4 Column formula (nBits sequential folds), kept here as the
    * executable specification of the arithmetic. */
  private def referenceProjs(emb: org.apache.spark.sql.Column, nBits: Int) =
    array((0 until nBits).map { p =>
      aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (v, i) => v.cast(DoubleType) *
            when(pmod(i * 2654435761L + lit(p) * 40503L, lit(97)) < 48, 1.0)
              .otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
    }: _*)

  private def vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 50).map { i =>
      (i.toLong, Array.fill(96)((rnd.nextFloat() - 0.5f) * 3f))
    }.toDF("vec_id", "embedding")
  }

  test("hyperplane_projs is bit-identical to the per-plane fold formula") {
    val nb = 16
    val rows = vecs
      .withColumn("fast", expr(s"hyperplane_projs(embedding, $nb)"))
      .withColumn("ref", referenceProjs(col("embedding"), nb))
      .select("vec_id", "fast", "ref")
      .collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val fast = r.getSeq[Double](1)
      val ref = r.getSeq[Double](2)
      assert(fast.size == nb)
      // exact ==, not a tolerance: same element order, same arithmetic
      assert(fast == ref, s"vec ${r.getLong(0)}")
    }
  }

  test("hyperplane_bucket packs exactly the positive-projection sign bits") {
    val nb = 16
    val rows = vecs
      .withColumn("bucket", expr(s"hyperplane_bucket(embedding, $nb)"))
      .withColumn("projs", expr(s"hyperplane_projs(embedding, $nb)"))
      .collect()
    rows.foreach { r =>
      val projs = r.getSeq[Double](3)
      val want = (0 until nb).map(p => if (projs(p) > 0) 1L << p else 0L).sum
      assert(r.getLong(2) == want)
    }
  }

  test("null embedding yields null, not a crash") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Array[Float]]), (2L, Some(Array(1f, 2f))))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        expr("hyperplane_bucket(embedding, 8)").as("b"),
        expr("hyperplane_projs(embedding, 8)").as("p"))
      .orderBy("vec_id").collect()
    assert(df(0).isNullAt(1) && df(0).isNullAt(2))
    assert(!df(1).isNullAt(1) && !df(1).isNullAt(2))
  }

  test("non-ARRAY<FLOAT> input and non-literal nBits are analysis errors") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
    val e = intercept[AnalysisException](
      df.select(expr("hyperplane_bucket(embedding, 8)")).collect())
    assert(e.getMessage.contains("ARRAY<FLOAT>"))
    val e2 = intercept[Exception](
      df.select(expr("hyperplane_bucket(embedding, vec_id)")).collect())
    assert(e2.getMessage.contains("literal"))
  }
}
