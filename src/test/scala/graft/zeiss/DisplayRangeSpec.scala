package graft.zeiss

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** DisplayRange unit coverage beyond the PyramidSpec end-to-end assert:
  * the exact integer histogram path on a known distribution, and the
  * float fallback (percentile_approx sketch) that PyramidSpec never
  * exercises (the pipeline is uint16).
  */
class DisplayRangeSpec extends AnyFunSuite {

  private def chunkOf(dt: Dtype, vals: Seq[Double]): ImageChunk = {
    val bytes = new Array[Byte](vals.size * dt.itemSize)
    vals.zipWithIndex.foreach { case (v, i) => dt.write(bytes, i, v) }
    ImageChunk(0, 0, 0, 0, 0, bytes)
  }

  test("integer histogram path: exact lower-interpolation percentiles") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dt = Dtype.UInt16
    // 1000 values 0..999 split across chunks/partitions
    val chunks = (0 until 10).map(c => chunkOf(dt, (0 until 100).map(i => (c * 100 + i).toDouble)))
    val ds = spark.createDataset(chunks).repartition(4)
    val got = DisplayRange.percentiles(spark, ds, dt, Seq(0.001, 0.5, 0.95))
    // smallest v with cum count >= p*1000: 0 (cum 1 >= 1), 499, 949
    assert(got == Seq(0.0, 499.0, 949.0))
  }

  test("float fallback: percentile_approx lands within 1% on a ramp") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dt = Dtype.Float32
    val chunks = (0 until 10).map(c =>
      chunkOf(dt, (0 until 1000).map(i => (c * 1000 + i).toDouble)))
    val ds = spark.createDataset(chunks).repartition(4)
    val Seq(lo, hi) = DisplayRange.percentiles(spark, ds, dt, Seq(0.001, 0.95))
    assert(math.abs(lo - 10.0) <= 100.0, s"p0.1% = $lo")
    assert(math.abs(hi - 9500.0) / 9500.0 < 0.01, s"p95 = $hi")
  }
}
