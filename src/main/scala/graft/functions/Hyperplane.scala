package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared kernel for the random-hyperplane LSH expressions: ONE pass over
  * the embedding computing all `nBits` signed projections (the r4 design
  * folded the array once per plane — nBits sequential traversals per row,
  * the dominant signature cost in q41/q37/q48 profiles). Called from both
  * the interpreted eval and the generated Java (static forwarder), so the
  * two paths cannot drift.
  *
  * The ±1 plane signs come from the same pure integer mixing formula the
  * DuckDB oracle uses — `(i*2654435761 + p*40503) % 97 < 48` — and each
  * projection accumulates in ascending element order, exactly like the old
  * per-plane `aggregate` fold, so results are bit-identical to both.
  */
object Hyperplane {

  def projections(emb: ArrayData, nBits: Int): Array[Double] = {
    val projs = new Array[Double](nBits)
    val n = emb.numElements()
    var i = 0
    while (i < n) {
      val v = emb.getFloat(i).toDouble
      val base = i.toLong * 2654435761L
      var p = 0
      while (p < nBits) {
        projs(p) += v * (if ((base + p.toLong * 40503L) % 97L < 48L) 1.0 else -1.0)
        p += 1
      }
      i += 1
    }
    projs
  }

  def bucket(emb: ArrayData, nBits: Int): Long = {
    val projs = projections(emb, nBits)
    var b = 0L
    var p = 0
    while (p < nBits) {
      if (projs(p) > 0) b |= 1L << p
      p += 1
    }
    b
  }

  private[functions] def check(name: String, child: Expression, nBits: Int)
      : TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if nBits >= 1 && nBits <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$name nBits must be in [1, 63], got $nBits")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$name requires an ARRAY<FLOAT> input, got ${other.sql}")
  }
}

/** All `nBits` signed hyperplane projections of a float vector as
  * ARRAY<DOUBLE>, in one pass (see [[Hyperplane]]). Registered as
  * `hyperplane_projs(emb, nBits)`; nBits must be a literal.
  */
case class HyperplaneProjections(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hyperplane_projs"
  override def checkInputDataTypes(): TypeCheckResult =
    Hyperplane.check(prettyName, child, nBits)

  override def nullSafeEval(a: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      Hyperplane.projections(a.asInstanceOf[ArrayData], nBits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.Hyperplane.projections($a, $nBits));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The packed sign-bit bucket (BIGINT) of a float vector's hyperplane
  * projections, in one pass (see [[Hyperplane]]). Registered as
  * `hyperplane_bucket(emb, nBits)`; nBits must be a literal. Equal to
  * packing `hyperplane_projs(emb, nBits)[p] > 0` bits, without
  * materializing the array.
  */
case class HyperplaneBucket(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hyperplane_bucket"
  override def checkInputDataTypes(): TypeCheckResult =
    Hyperplane.check(prettyName, child, nBits)

  override def nullSafeEval(a: Any): Any =
    java.lang.Long.valueOf(Hyperplane.bucket(a.asInstanceOf[ArrayData], nBits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Hyperplane.bucket($a, $nBits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
