package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the pure netpbm codec: encode/decode round-trip
  * over arbitrary payloads and row widths, and decode totality (no crash,
  * None on malformed input). */
object PnmProps extends Properties("Pnm") {

  private val payloads = Gen.containerOf[Array, Byte](Gen.choose(-128, 127).map(_.toByte))
  private val widths = Gen.choose(1, 200)

  property("decode(encodeGray(b, w)) recovers b zero-padded") =
    forAll(payloads, widths) { (bytes, rowWidth) =>
      val img = Multimodal.Pnm.encodeGray(bytes, rowWidth)
      Multimodal.Pnm.decode(img) match {
        case Some((w, h, ch, samples)) =>
          val n = math.max(bytes.length, 1)
          ch == 1 && w == math.min(n, rowWidth) &&
            h == (n + w - 1) / w &&
            samples.length == w * h &&
            samples.take(bytes.length).sameElements(bytes) &&
            samples.drop(bytes.length).forall(_ == 0)
        case None => false
      }
    }

  property("decode never throws and rejects non-netpbm prefixes") =
    forAll(payloads) { bytes =>
      // arbitrary bytes: decode must return (it may legitimately succeed if
      // the random bytes happen to spell a valid header, but never throw)
      Multimodal.Pnm.decode(bytes)
      true
    }

  property("truncating the sample plane yields None") =
    forAll(payloads.suchThat(_.length >= 2), widths) { (bytes, rowWidth) =>
      val img = Multimodal.Pnm.encodeGray(bytes, rowWidth)
      Multimodal.Pnm.decode(img.dropRight(1)).isEmpty
    }
}
