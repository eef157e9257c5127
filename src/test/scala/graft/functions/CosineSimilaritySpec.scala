package graft.functions

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite {

  private def sims(pairs: Seq[(Seq[Float], Seq[Float])]): Seq[Option[Double]] = {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    pairs.toDF("a", "b")
      .selectExpr("cosine_sim(a, b) AS sim")
      .collect()
      .toSeq
      .map { case Row(v) => Option(v).map(_.asInstanceOf[Double]) }
  }

  test("matches double-precision index-order computation") {
    val a = Seq(1.0f, 2.0f, 3.0f)
    val b = Seq(-4.0f, 5.0f, 6.0f)
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    val Seq(got) = sims(Seq((a, b)))
    assert(got.contains(dot / (na * nb)))
  }

  test("identical vectors -> 1.0, orthogonal -> 0.0") {
    val Seq(same, orth) = sims(Seq(
      (Seq(1f, 2f), Seq(1f, 2f)),
      (Seq(1f, 0f), Seq(0f, 1f))))
    assert(math.abs(same.get - 1.0) < 1e-12)
    assert(orth.contains(0.0))
  }

  test("non-float arrays are rejected at analysis time, not reinterpreted") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(array(1.0D, 2.0D), array(1.0D, 2.0D))").collect()
    }
    assert(e.getMessage.contains("ARRAY<FLOAT>"))
  }

  test("zero-norm vector yields NULL (not NaN)") {
    val Seq(z) = sims(Seq((Seq(0f, 0f), Seq(1f, 2f))))
    assert(z.isEmpty)
  }

  test("dimension mismatch yields NULL, not a prefix cosine") {
    val Seq(m) = sims(Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))))
    assert(m.isEmpty)
  }

  test("interpreted eval agrees with codegen path") {
    // eval() via a literal-bound expression, bypassing codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val mk = (xs: Seq[Float]) =>
      Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(FloatType))
    val e = CosineSimilarity(mk(Seq(1f, 2f, 3f)), mk(Seq(4f, 5f, 6f)))
    val interp = e.eval(null).asInstanceOf[Double]
    val Seq(cg) = sims(Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))))
    assert(cg.contains(interp))
  }
}
