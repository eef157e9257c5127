package graft.zeiss

import org.scalatest.funsuite.AnyFunSuite

class DtypeSpec extends AnyFunSuite {

  test("read/write round-trip representative values per dtype") {
    val cases: Seq[(Dtype, Seq[Double])] = Seq(
      Dtype.UInt8 -> Seq(0, 1, 127, 255),
      Dtype.UInt16 -> Seq(0, 1, 32767, 65535),
      Dtype.Int16 -> Seq(-32768, -1, 0, 32767),
      Dtype.Int32 -> Seq(Int.MinValue, -1, 0, Int.MaxValue),
      Dtype.Float32 -> Seq(-1.5, 0.0, 3.140625, 1e10),
      Dtype.Float64 -> Seq(-1.5e300, 0.0, math.Pi, 1e-300))
    cases.foreach { case (dt, vals) =>
      val b = new Array[Byte](vals.size * dt.itemSize)
      vals.zipWithIndex.foreach { case (v, i) => dt.write(b, i, v) }
      vals.zipWithIndex.foreach { case (v, i) =>
        assert(dt.read(b, i) == v, s"$dt value $v")
      }
    }
  }

  test("payload bytes are little-endian (zarr '<' order)") {
    val b = new Array[Byte](2)
    Dtype.UInt16.write(b, 0, 0x0102)
    assert(b.toSeq == Seq[Byte](0x02, 0x01))
  }

  test("fromZarr resolves typestrings and rejects unknowns") {
    assert(Dtype.fromZarr("<u2") == Dtype.UInt16)
    assert(Dtype.fromZarr("|u1") == Dtype.UInt8)
    intercept[IllegalArgumentException](Dtype.fromZarr("<c16"))
  }

  test("integer dtype bounds match numpy iinfo (czi_to_zarr.py:461-466)") {
    assert(Dtype.UInt16.minValue == 0 && Dtype.UInt16.maxValue == 65535)
    assert(Dtype.Int16.minValue == -32768 && Dtype.Int16.maxValue == 32767)
  }
}
