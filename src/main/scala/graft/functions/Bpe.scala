package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding trainer + encoder (q71), completing the tokenizer
  * loop q66 opens (q66 counts the corpus's adjacent char-pair frequencies;
  * this trains the merge table from them and applies it).
  *
  * Split of labor mirrors every production BPE trainer (Sennrich et al.
  * 2016; HF tokenizers): TRAINING runs driver-side over the aggregated
  * word->count vocabulary — the corpus reduces to vocab-sized data first
  * (one partial-agg groupBy), and the vocabulary is orders of magnitude
  * smaller than the corpus at any scale, so the driver loop is bounded by
  * vocab x merges, never by corpus size. ENCODING is the distributed hot
  * path: a native codegen expression applying the (broadcast-literal)
  * merge table per document at scan speed.
  *
  * Semantics (char-level base alphabet, q66's convention — no end-of-word
  * marker):
  *  - training step: count adjacent symbol pairs weighted by word count,
  *    merge the most frequent pair everywhere (ties -> lexicographically
  *    smallest pair, so training is deterministic), repeat;
  *  - encoding: repeatedly merge the LOWEST-RANK (earliest-trained)
  *    adjacent pair present in the word, all occurrences left-to-right,
  *    until no trained pair remains (HF `tokenizers` semantics — the word
  *    replays vocabulary evolution, so encoding a training word yields
  *    exactly its end-of-training segmentation).
  */
object BpeCodec {

  /** Merge all adjacent occurrences of `pair` in `syms`, left-to-right
    * (so "aaa" under (a,a) gives ["aa","a"]). */
  private def mergeAll(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Train `nMerges` merges from a word->count vocabulary. Stops early
    * when no adjacent pair is left (fully merged vocabulary). */
  def train(vocab: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var words = vocab.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + c
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, c) =>
          (mergeAll(syms, best._1, best._2), c)
        }
      }
    }
    merges.toSeq
  }

  /** Rank lookup keyed "a b" (symbols come from whitespace-split words, so
    * a space can never occur inside a symbol). */
  def ranksOf(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  /** Encode one word: repeatedly merge the lowest-rank adjacent pair. */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) {
          bestRank = r; bestA = syms(i); bestB = syms(i + 1)
        }
        i += 1
      }
      if (bestA == null) continue = false
      else syms = mergeAll(syms, bestA, bestB)
    }
    syms
  }

  /** The expression kernel: encode every token of `toks`, flattened in
    * order. Null tokens are skipped (split() never yields them). */
  def encodeTokens(toks: ArrayData,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val w = toks.getUTF8String(i).toString
        if (w.nonEmpty) {
          val enc = encodeWord(w, ranks)
          var j = 0
          while (j < enc.length) { out += UTF8String.fromString(enc(j)); j += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Wire format of a merge table inside a SQL literal: pairs "a b" joined
    * by commas (symbols are whitespace-split word fragments — no spaces or
    * commas inside a symbol in this corpus's alphabet). */
  def formatMerges(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"$a $b" }.mkString(",")

  def parseMerges(s: String): Seq[(String, String)] =
    if (s.isEmpty) Seq.empty
    else s.split(",", -1).toSeq.map { p =>
      val sp = p.indexOf(' ')
      require(sp > 0 && sp < p.length - 1, s"malformed merge entry '$p'")
      (p.substring(0, sp), p.substring(sp + 1))
    }
}

/** `bpe_encode(toks, 'a b,es t,...')`: apply the literal merge table to
  * every token, returning the flattened subword stream as ARRAY<STRING>.
  * The merge table must be a literal (it is the trained model, fixed at
  * plan time and shipped inside the generated code's references — the
  * expression equivalent of broadcasting the model).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_encode"
  override def checkInputDataTypes(): TypeCheckResult =
    TextSketch.check(prettyName, child)

  @transient private lazy val ranks = BpeCodec.ranksOf(merges)

  override def nullSafeEval(a: Any): Any =
    BpeCodec.encodeTokens(a.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      classOf[java.util.HashMap[String, Integer]].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BpeCodec.encodeTokens($a, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
