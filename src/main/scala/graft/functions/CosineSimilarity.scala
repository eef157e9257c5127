package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

private[functions] object VectorTypeCheck {
  /** Both inputs must be ARRAY<FLOAT>: getFloat on any other element type
    * would silently reinterpret bytes (the inputTypes/AbstractDataType API
    * is private[sql], so the check lives in checkInputDataTypes). */
  def check(name: String, left: Expression, right: Expression): TypeCheckResult = {
    val bad = Seq(left, right).map(_.dataType).filterNot {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires ARRAY<FLOAT> inputs, got ${bad.map(_.sql).mkString(", ")} " +
        "(cast explicitly, e.g. CAST(col AS ARRAY<FLOAT>))")
  }
}

/** Cosine similarity between two float vectors, computed in double precision
  * in index order (deterministic), as a native Catalyst expression with
  * whole-stage codegen — this is the 100TB hot loop for similarity search /
  * embedding near-dup, so it must JIT to a tight primitive loop rather than
  * box through a Scala UDF.
  *
  * Returns NULL when either vector has zero norm.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.check(prettyName, left, right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // dimension mismatch -> NULL: a prefix-cosine over min(len) looks
    // plausible and silently corrupts similarity search results
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  if ($nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product twin of [[CosineSimilarity]] (same codegen shape). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.check(prettyName, left, right)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null // see CosineSimilarity
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native SQL functions. Idempotent. */
object GraftFunctions {
  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn requires a literal INT plane count, got ${other.sql}")
  }

  private def litString(e: Expression, fn: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, StringType) if v != null =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$fn requires a literal STRING merge table, got ${other.sql}")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("hyperplane_projs",
      exprs => HyperplaneProjections(exprs(0), litInt(exprs(1), "hyperplane_projs")),
      "built-in")
    reg.createOrReplaceTempFunction("hyperplane_bucket",
      exprs => HyperplaneBucket(exprs(0), litInt(exprs(1), "hyperplane_bucket")),
      "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinhashSignature(exprs(0), litInt(exprs(1), "minhash_sig")),
      "built-in")
    reg.createOrReplaceTempFunction("simhash32",
      exprs => Simhash32(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("bpe_encode",
      exprs => BpeEncode(exprs(0),
        BpeCodec.parseMerges(litString(exprs(1), "bpe_encode"))),
      "built-in")
    // Spark's runtime-filter bloom kernels, exposed as session functions
    // (OSS keeps them internal to InjectRuntimeFilter; q106 needs them on
    // a DERIVED key — an exploded shingle — that no optimizer rule can
    // reach through the generator). bloom_agg(xxhash64(x), nItems, nBits)
    // -> binary sketch; bloom_might_contain(sketchLit, xxhash64(x)) is a
    // codegen'd scan-side predicate.
    reg.createOrReplaceTempFunction("bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}
