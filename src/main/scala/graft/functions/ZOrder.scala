package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Morton (Z-order) curve arithmetic as pure Column compositions — every
  * step is a codegen'd long op (shift/and/or), no UDF, no custom
  * expression needed. 16 bits per dimension, two dimensions -> a 32-bit
  * z-value in a long.
  *
  * The interleave uses the classic magic-mask bit spread: x | x<<8
  * masked to 0x00FF00FF, then 4/2/1 — each step doubles the gap between
  * payload bits until each sits at an even position; y lands on the odd
  * positions. ZOrderSpec pins a plain-Scala reference roundtrip.
  */
object ZOrder {

  /** Linear map of `c` from [lo, hi] onto the 16-bit grid [0, 65535]
    * (floor; hi clamps to 65535, a degenerate range to 0). NULL in ->
    * NULL out. The mapping only positions rows on the curve — layout
    * changes NEVER change query results, so this arithmetic needs no
    * cross-engine determinism contract. */
  def norm16(c: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) when(c.isNull, lit(null).cast(LongType)).otherwise(lit(0L))
    // least() SKIPS nulls (it returns the least non-null operand), so the
    // null case needs the explicit branch or a NULL coordinate would land
    // at 65535 — the top curve corner — instead of propagating
    // clamp BOTH ends: a coordinate below `lo` would floor to a negative
    // value whose spread16 leaks bits outside the even positions and
    // scrambles curve locality — greatest(0) makes the map total over
    // out-of-range inputs (callers passing measured min/max never hit it)
    else when(c.isNull, lit(null).cast(LongType))
      .otherwise(least(lit(65535L), greatest(lit(0L),
        floor((c.cast(DoubleType) - lit(lo)) / lit(hi - lo) * 65536.0)
          .cast(LongType))))

  /** Spread the low 16 bits of `c` onto even bit positions 0,2,..,30. */
  def spread16(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** The z-value of two 16-bit coordinates: x on even bits, y on odd. */
  def interleave16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** HILBERT index (r17, q107b) of two 16-bit coordinates — the
    * locality-cliff-free alternative to the Morton interleave: a Morton
    * curve jumps across the whole space at quadrant boundaries (the
    * z-shape's diagonal stroke), so a file of consecutive z-values can
    * straddle two far-apart regions; the Hilbert curve's consecutive
    * indices are always GRID-ADJACENT cells, so every file covers one
    * connected blob and its per-column min/max stats are as tight as a
    * space-filling curve can make them.
    *
    * Implementation: the classic per-level fold (mask out the level bit
    * of each coordinate, accumulate the quadrant's step count, reflect +
    * transpose the frame for the next level — the standard xy2d
    * formulation), expressed as `functions.aggregate` over the 16 level
    * numbers with a (x, y, d) STRUCT accumulator. The lambda references
    * the accumulator ONCE per level, so the expression stays O(levels)
    * in size — a naive when()-chained unroll would re-inline the whole
    * prior state into every branch and blow up exponentially. Pure
    * Column arithmetic end to end (no UDF); same contract as
    * [[interleave16]]: layout-only, NULL in -> NULL out (a NULL
    * coordinate yields a NULL index via null propagation through the
    * struct arithmetic). ZOrderSpec pins a plain-Scala reference
    * (equality on random points), the bijection (inverse roundtrip) and
    * the adjacency law (consecutive indices are grid neighbors — the
    * property Morton lacks). */
  def hilbert16(x: Column, y: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(Hilbert16(
      org.apache.spark.sql.GraftSqlBridge.expr(x),
      org.apache.spark.sql.GraftSqlBridge.expr(y)))

  /** The shared per-row kernel: the classic xy2d per-level fold (mask
    * out the level bit of each coordinate, accumulate the quadrant's
    * step count, reflect inside the FULL grid (n-1 = 65535) when rx==1
    * then transpose — only when ry==0). Bit-for-bit the r17 Column-fold
    * semantics (ZOrderSpec pins the plain-Scala reference, the
    * bijection and the adjacency law). */
  def hilbert16Kernel(x: Long, y: Long): Long = {
    var hx = x; var hy = y; var hd = 0L
    var lvl = 15
    while (lvl >= 0) {
      val s = 1L << lvl
      val rx = if ((hx & s) > 0) 1L else 0L
      val ry = if ((hy & s) > 0) 1L else 0L
      hd += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val fx = if (rx == 1L) 65535L - hx else hx
        val fy = if (rx == 1L) 65535L - hy else hy
        hx = fy; hy = fx
      }
      lvl -= 1
    }
    hd
  }
}

/** HILBERT index (r17, q107b) of two 16-bit coordinates — the
  * locality-cliff-free alternative to the Morton interleave: a Morton
  * curve jumps across the whole space at quadrant boundaries (the
  * z-shape's diagonal stroke), so a file of consecutive z-values can
  * straddle two far-apart regions; the Hilbert curve's consecutive
  * indices are always GRID-ADJACENT cells, so every file covers one
  * connected blob and its per-column min/max stats are as tight as a
  * space-filling curve can make them.
  *
  * r20 (optimization round): previously a `functions.aggregate` fold
  * over the 16 level numbers with a (x, y, d) struct accumulator —
  * higher-order functions are CodegenFallback, so every row paid 16
  * interpreted lambda evaluations with struct boxing (measured: 37 s
  * of task CPU inside q118b's 3 s rewrite). Now a binary expression
  * whose codegen is one static-call loop ([[ZOrder.hilbert16Kernel]]),
  * whole-stage-codegen-friendly like the sketch kernels. Same
  * contract: layout-only, NULL in -> NULL out. */
case class Hilbert16(left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, LongType}

  override def prettyName: String = "hilbert16"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT) coordinates, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(ZOrder.hilbert16Kernel(
      a.asInstanceOf[Long], b.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.hilbert16Kernel($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression)
    : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(left = newLeft, right = newRight)
}
