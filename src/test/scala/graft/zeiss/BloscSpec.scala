package graft.zeiss

import org.scalatest.funsuite.AnyFunSuite

class BloscSpec extends AnyFunSuite {

  test("shuffle/unshuffle are inverse for every typesize") {
    val rng = new scala.util.Random(42)
    for (ts <- 1 to 8; n <- Seq(0, 1, 7, 64, 1000, 1001)) {
      val arr = new Array[Byte](n)
      rng.nextBytes(arr)
      assert(Blosc.unshuffle(Blosc.shuffle(arr, ts), ts).toSeq == arr.toSeq,
        s"typesize=$ts n=$n")
    }
  }

  test("shuffle groups byte planes (c-blosc layout)") {
    val in = Array[Byte](1, 2, 3, 4, 5, 6) // 3 uint16 elements
    assert(Blosc.shuffle(in, 2).toSeq == Seq[Byte](1, 3, 5, 2, 4, 6))
  }

  test("compress/decompress round-trips typical chunk payloads") {
    val rng = new scala.util.Random(7)
    for (ts <- Seq(1, 2, 4, 8); n <- Seq(0, 1, 1000, 4096)) {
      val data = new Array[Byte](n * ts)
      rng.nextBytes(data)
      // make it compressible: zero half
      java.util.Arrays.fill(data, 0, data.length / 2, 0.toByte)
      val frame = Blosc.compress(data, ts, clevel = 3)
      assert(Blosc.decompress(frame).toSeq == data.toSeq)
    }
  }

  test("header fields are the c-blosc v1 layout") {
    val data = Array.fill[Byte](1024)(42)
    val frame = Blosc.compress(data, 2, clevel = 3)
    assert(frame(0) == 2) // format version
    assert((frame(2) & Blosc.FlagShuffle) != 0)
    assert(((frame(2) & 0xff) >> 5) == Blosc.ZstdCodecId)
    assert(frame(3) == 2) // typesize
    // nbytes LE
    val nbytes = (frame(4) & 0xff) | ((frame(5) & 0xff) << 8) |
      ((frame(6) & 0xff) << 16) | ((frame(7) & 0xff) << 24)
    assert(nbytes == 1024)
    assert(frame.length < 1024) // constant payload compresses
  }

  test("incompressible payload falls back to memcpy frame") {
    val rng = new scala.util.Random(13)
    val data = new Array[Byte](512)
    rng.nextBytes(data)
    val frame = Blosc.compress(data, 1, clevel = 3)
    assert((frame(2) & Blosc.FlagMemcpy) != 0 || frame.length < data.length + 24)
    assert(Blosc.decompress(frame).toSeq == data.toSeq)
  }

  test("truncated/corrupt frames fail with a diagnosable IOException") {
    val good = Blosc.compress(Array.tabulate[Byte](512)(i => (i % 7).toByte), 2)
    intercept[java.io.IOException](Blosc.decompress(good.take(10)))
    intercept[java.io.IOException](Blosc.decompress(good.take(20)))
    val badStart = good.clone()
    badStart(16) = 0x7f.toByte // bstart way past the frame
    badStart(17) = 0x7f.toByte
    intercept[java.io.IOException](Blosc.decompress(badStart))
  }

  test("higher clevel never corrupts (levels 1..9)") {
    val data = Array.tabulate[Byte](2048)(i => (i % 97).toByte)
    for (lvl <- 1 to 9)
      assert(Blosc.decompress(Blosc.compress(data, 2, lvl)).toSeq == data.toSeq)
  }
}
