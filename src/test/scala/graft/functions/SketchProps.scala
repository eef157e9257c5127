package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the sketch kernels, against independent plain-Scala
  * re-implementations of the DECLARED formulas (not the Spark Column folds
  * — TextSketchSpec/HyperplaneSpec already pin those): random unicode
  * tokens with duplicates/empties for the text sketches, random float
  * vectors for the hyperplane LSH. The kernels are pure JVM functions, so
  * the properties run without a SparkSession.
  */
object SketchProps extends Properties("Sketch") {

  // -- text sketches ------------------------------------------------------

  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("", "café", "中文", "naïve", "θ", "a b", "\ttab"),
    Gen.choose(0, 0x2FFF).map(cp => new String(Character.toChars(cp))))
  private val tokenLists: Gen[List[String]] = Gen.listOf(token)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def refMinhash(toks: List[String], n: Int): Seq[String] = {
    val ds = toks.distinct
    (0 until n).map { j =>
      val cands = ds.map { t => val h = md5Hex(t); (h + h).substring(j, j + 16) }
      if (cands.isEmpty) "g" else cands.min
    }
  }

  private def refSimhash(toks: List[String]): Long = {
    val hs = toks.distinct.map(t => java.lang.Long.parseLong(md5Hex(t).take(8), 16))
    (0 until 32).map { bit =>
      val wt = hs.map(h => if (((h >> bit) & 1L) == 1L) 1 else -1).sum
      if (wt > 0) 1L << bit else 0L
    }.sum
  }

  private def arr(toks: List[String]) =
    new GenericArrayData(toks.map[Any](UTF8String.fromString).toArray)

  property("minhash_sig == declared rotation-min formula") =
    forAll(tokenLists, Gen.choose(1, 32)) { (toks, n) =>
      val got = TextSketch.minhashSig(arr(toks), n)
      val want = refMinhash(toks, n)
      (0 until n).forall(j => got.getUTF8String(j).toString == want(j))
    }

  property("simhash32 == declared per-bit majority formula") =
    forAll(tokenLists) { toks =>
      TextSketch.simhash32(arr(toks)) == refSimhash(toks)
    }

  property("duplicate tokens never change either sketch") =
    forAll(tokenLists) { toks =>
      val doubled = toks ++ toks
      val sigDoubled = TextSketch.minhashSig(arr(doubled), 12)
      val sigPlain = TextSketch.minhashSig(arr(toks), 12)
      TextSketch.simhash32(arr(doubled)) == TextSketch.simhash32(arr(toks)) &&
        (0 until 12).forall(j =>
          sigDoubled.getUTF8String(j) == sigPlain.getUTF8String(j))
    }

  // -- hyperplane LSH -----------------------------------------------------

  private val vectors: Gen[Array[Float]] =
    Gen.containerOf[Array, Float](Gen.chooseNum(-3.0f, 3.0f))

  private def refProjs(v: Array[Float], nBits: Int): Array[Double] = {
    // independent loop nesting (p outer, i inner); per-plane accumulation
    // order is still ascending i, so results must be BIT-identical
    (0 until nBits).map { p =>
      var acc = 0.0
      var i = 0
      while (i < v.length) {
        val sign = if ((i.toLong * 2654435761L + p.toLong * 40503L) % 97L < 48L) 1.0 else -1.0
        acc += v(i).toDouble * sign
        i += 1
      }
      acc
    }.toArray
  }

  private def farr(v: Array[Float]) = new GenericArrayData(v.map[Any](identity).toArray)

  property("hyperplane projections == declared formula, bit-identical") =
    forAll(vectors, Gen.choose(1, 24)) { (v, nBits) =>
      val got = Hyperplane.projections(farr(v), nBits)
      val want = refProjs(v, nBits)
      got.length == nBits && got.indices.forall(p =>
        java.lang.Double.doubleToLongBits(got(p)) ==
          java.lang.Double.doubleToLongBits(want(p)))
    }

  property("bucket packs exactly the positive-projection bits") =
    forAll(vectors, Gen.choose(1, 24)) { (v, nBits) =>
      val projs = Hyperplane.projections(farr(v), nBits)
      val want = projs.indices.map(p => if (projs(p) > 0) 1L << p else 0L).sum
      Hyperplane.bucket(farr(v), nBits) == want
    }
}
