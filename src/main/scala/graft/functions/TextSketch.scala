package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token-sketch kernels for the near-dup signatures (q35
  * MinHash, q36 SimHash). The Column-composed versions built these from
  * per-token `md5()` + 12 rotation substrings (q35) resp. 32 sequential
  * bit-folds (q36) — allocation-heavy inner loops on the 100TB corpus
  * scan. Here each distinct token is md5'd ONCE (thread-local digest, no
  * per-call instance) and all hash-family members update in the same pass,
  * with zero intermediate string allocation.
  *
  * The arithmetic is EXACTLY the declared formula (and the DuckDB oracle's):
  *  - minhash_sig: per distinct token, h = lowercase-hex md5 of the UTF-8
  *    bytes; family member j (0-based) is chars [j, j+16) of h+h; the
  *    signature is the per-j minimum under binary string order, seeded
  *    with "g" (> any hex char, the declared empty-document sentinel).
  *  - simhash32: per distinct token, the first 8 hex chars of md5 as a
  *    32-bit value; per bit, count +1/-1 over tokens; the simhash sets the
  *    bits whose count is strictly positive.
  * Null tokens are SKIPPED in both sketches. For minhash_sig that matches
  * the Column fold it replaced (`least(x, NULL)` ignores the null hash);
  * for simhash32 it is a deliberate DIVERGENCE from the old fold, whose
  * `when(...).otherwise(-1)` silently counted a null hash as -1 on every
  * bit — an artifact, not a contract (token arrays come from `split`,
  * which never yields null; the DuckDB oracle likewise never sees one).
  * TextSketchSpec pins the skip semantics explicitly. Duplicate tokens
  * count once (both versions hash `array_distinct`/`list_distinct`
  * tokens).
  */
object TextSketch {

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase-hex md5 of `bytes`, doubled (h+h) into a 64-char buffer so
    * rotation windows are plain slices. */
  private def md5DoubledHex(bytes: Array[Byte]): Array[Char] = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](64)
    var i = 0
    while (i < 16) {
      val hi = HexChars((d(i) >> 4) & 0xf)
      val lo = HexChars(d(i) & 0xf)
      out(2 * i) = hi
      out(2 * i + 1) = lo
      out(32 + 2 * i) = hi
      out(32 + 2 * i + 1) = lo
      i += 1
    }
    out
  }

  /** Compares the 16-char window of `doubled` at `off` against `min`
    * (16 chars): negative when the window is smaller. */
  private def cmpWindow(doubled: Array[Char], off: Int, min: Array[Char]): Int = {
    var i = 0
    while (i < 16) {
      val c = doubled(off + i) - min(i)
      if (c != 0) return c
      i += 1
    }
    0
  }

  def minhashSig(toks: ArrayData, nHashes: Int): ArrayData = {
    val mins = Array.fill(nHashes)(null: Array[Char])
    val seen = new java.util.HashSet[UTF8String]()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val tok = toks.getUTF8String(i)
        if (seen.add(tok.clone())) { // clone: the row buffer is reused
          val doubled = md5DoubledHex(tok.getBytes)
          var j = 0
          while (j < nHashes) {
            if (mins(j) == null || cmpWindow(doubled, j, mins(j)) < 0) {
              val w = new Array[Char](16)
              System.arraycopy(doubled, j, w, 0, 16)
              mins(j) = w
            }
            j += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map[Any] { m =>
      UTF8String.fromString(if (m == null) "g" else new String(m))
    })
  }

  def simhash32(toks: ArrayData): Long = {
    val counts = new Array[Int](32)
    val seen = new java.util.HashSet[UTF8String]()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val tok = toks.getUTF8String(i)
        if (seen.add(tok.clone())) {
          val md = digest.get()
          md.reset()
          val d = md.digest(tok.getBytes)
          // first 8 hex chars = first 4 digest bytes, big-endian
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          var bit = 0
          while (bit < 32) {
            if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
            bit += 1
          }
        }
      }
      i += 1
    }
    var sh = 0L
    var bit = 0
    while (bit < 32) {
      if (counts(bit) > 0) sh |= 1L << bit
      bit += 1
    }
    sh
  }

  private[functions] def check(name: String, child: Expression): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires an ARRAY<STRING> token input, got ${other.sql}")
    }
}

/** `minhash_sig(toks, nHashes)`: the per-document MinHash signature as
  * ARRAY<STRING> (see [[TextSketch]]). nHashes must be a literal in
  * [1, 32] (rotation windows of a 32-hex-char digest). */
case class MinhashSignature(child: Expression, nHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult = {
    if (nHashes < 1 || nHashes > 32)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName nHashes must be in [1, 32], got $nHashes")
    else TextSketch.check(prettyName, child)
  }

  override def nullSafeEval(a: Any): Any =
    TextSketch.minhashSig(a.asInstanceOf[ArrayData], nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextSketch.minhashSig($a, $nHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash32(toks)`: the 32-bit SimHash of the distinct tokens as BIGINT
  * (see [[TextSketch]]). */
case class Simhash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash32"
  override def checkInputDataTypes(): TypeCheckResult =
    TextSketch.check(prettyName, child)

  override def nullSafeEval(a: Any): Any =
    java.lang.Long.valueOf(TextSketch.simhash32(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextSketch.simhash32($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
