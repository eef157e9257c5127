package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The single-pass token sketches must be BIT-identical to the
  * Column-composed folds they replaced — the DuckDB oracles for
  * q35/q35b/q36 mirror those folds, so any drift is an oracle mismatch at
  * the next driver run. Inputs cover duplicates, empty strings, unicode,
  * empty arrays and null tokens.
  */
class TextSketchSpec extends AnyFunSuite {

  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }

  /** The r4 Column fold for the 12-hash minhash signature. */
  private def referenceSig(toks: org.apache.spark.sql.Column) =
    aggregate(
      transform(array_distinct(toks), tok => md5(tok)),
      array_repeat(lit("g"), 12),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(11)),
          j => concat(h, h).substr(j + 1, lit(16))),
        (a, r) => least(a, r)))

  /** The r4 Column fold for the 32-bit simhash. */
  private def referenceSimhash(toks: org.apache.spark.sql.Column) = {
    val hs = transform(array_distinct(toks),
      tok => conv(substring(md5(tok), 1, 8), 16, 10).cast(LongType))
    (0 until 32).map { bit =>
      val wt = aggregate(hs, lit(0),
        (acc, h) => acc +
          when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1))
      when(wt > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  private def docs = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val organic = (0 until 40).map { i =>
      (i.toLong, Seq.fill(5 + rnd.nextInt(60))(s"tok${rnd.nextInt(80)}"))
    }
    val edge = Seq(
      (100L, Seq.empty[String]),                      // empty doc -> "g" seed
      (101L, Seq("", "", "a")),                       // empty-string tokens
      (102L, Seq("dup", "dup", "dup")),               // duplicates count once
      (103L, Seq("café", "中文", "a")))  // multi-byte UTF-8
    (organic ++ edge).toDF("doc_id", "toks")
  }

  test("minhash_sig is bit-identical to the Column fold") {
    val rows = docs
      .withColumn("fast", expr("minhash_sig(toks, 12)"))
      .withColumn("ref", referenceSig(col("toks")))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](2) == r.getSeq[String](3), s"doc ${r.getLong(0)}")
    }
  }

  test("simhash32 is bit-identical to the 32-pass Column fold") {
    val rows = docs
      .withColumn("fast", expr("simhash32(toks)"))
      .withColumn("ref", referenceSimhash(col("toks")))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(3), s"doc ${r.getLong(0)}")
    }
  }

  test("null tokens are skipped: minhash matches the fold, simhash skips") {
    import spark.implicits._
    // minhash: least(x, NULL) ignored the null hash -> identical semantics
    val m = Seq((1L, Seq(Some("a"), None, Some("b")))).toDF("doc_id", "toks")
      .withColumn("fast", expr("minhash_sig(toks, 12)"))
      .withColumn("ref", referenceSig(col("toks")))
      .collect().head
    assert(m.getSeq[String](2) == m.getSeq[String](3))
    // simhash: skip-null is the DECLARED semantics — equal to the sketch
    // of the same array without the null. (The old Column fold counted a
    // null hash as -1 per bit; with an ODD real-token count the two
    // disagree, which is exactly why the contract is pinned here.)
    val s3 = Seq(
      (1L, Seq(Some("a"), None, Some("b"), Some("c"))),
      (2L, Seq(Some("a"), Some("b"), Some("c"))))
      .toDF("doc_id", "toks")
      .withColumn("fs", expr("simhash32(toks)"))
      .orderBy("doc_id").collect()
    assert(s3(0).getLong(2) == s3(1).getLong(2))
  }

  test("null array yields null; wrong types are analysis errors") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Seq[String]]), (2L, Some(Seq("x"))))
      .toDF("doc_id", "toks")
      .select(col("doc_id"), expr("minhash_sig(toks, 12)").as("m"),
        expr("simhash32(toks)").as("s"))
      .orderBy("doc_id").collect()
    assert(df(0).isNullAt(1) && df(0).isNullAt(2))
    assert(!df(1).isNullAt(1) && !df(1).isNullAt(2))
    val bad = Seq((1L, Seq(1, 2))).toDF("doc_id", "toks")
    val e = intercept[Exception](
      bad.select(expr("simhash32(toks)")).collect())
    assert(e.getMessage.contains("ARRAY<STRING>"))
  }
}
