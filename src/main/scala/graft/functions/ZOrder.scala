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
  def hilbert16(x: Column, y: Column): Column = {
    // the fold's when().otherwise() arms swallow NULL (a NULL bit test
    // takes the otherwise branch), so propagation is explicit
    when(x.isNull || y.isNull, lit(null).cast(LongType))
      .otherwise(hilbertFold(x, y))
  }

  private def hilbertFold(x: Column, y: Column): Column = {
    val init = struct(x.cast(LongType).as("hx"), y.cast(LongType).as("hy"),
      lit(0L).as("hd"))
    val levels = sequence(lit(15), lit(0), lit(-1))
    aggregate(levels, init, (acc, lvl) => {
      val hx = acc.getField("hx")
      val hy = acc.getField("hy")
      val s = call_function("shiftleft", lit(1L), lvl.cast("int"))
      val rx = when(hx.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(hy.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
      val d2 = acc.getField("hd") +
        (s * s * (lit(3L) * rx).bitwiseXOR(ry))
      // frame rotation for the next level: reflect inside the FULL grid
      // (n-1 = 65535) when rx==1, then transpose — only when ry==0
      val fx = when(rx === 1, lit(65535L) - hx).otherwise(hx)
      val fy = when(rx === 1, lit(65535L) - hy).otherwise(hy)
      struct(
        when(ry === 0, fy).otherwise(hx).as("hx"),
        when(ry === 0, fx).otherwise(hy).as("hy"),
        d2.as("hd"))
    }).getField("hd")
  }
}
