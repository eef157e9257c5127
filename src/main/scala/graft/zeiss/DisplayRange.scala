package graft.zeiss

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The optional display-range statistics pass the reference REJECTED as too
  * expensive — `da.percentile(image_data, (0.1, 95))` at
  * `compress/czi_to_zarr.py:477-481` ("it would take so much time and
  * resources to calculate", hard-coding the omero window to (0.0, 550.0)
  * instead). SURVEY §2A op 15 / §7.6 declare shipping it as an optional
  * pass feeding `omero.window`.
  *
  * In Spark the pass is affordable for integer pixel dtypes because a
  * percentile over a bounded value domain is a HISTOGRAM: each task folds
  * its chunks into a value→count map (per-partition combine — no voxel ever
  * leaves its task), one narrow shuffle merges ≤ 65536 (value, count) rows
  * for uint16, and a window walk over that tiny histogram reads off EXACT
  * percentiles. Cost at any array size: one scan + a shuffle whose volume is
  * the value-domain size, independent of voxel count — the 100TB-safe shape
  * of the pass the reference couldn't afford single-node.
  *
  * Float dtypes have no bounded domain; they fall back to the
  * `percentile_approx` sketch over the voxel stream (still one pass,
  * bounded state).
  */
object DisplayRange {

  /** The reference's rejected percentile pair, as fractions: 0.1% and 95%
    * (`compress/czi_to_zarr.py:477-481`). */
  val LowFraction = 0.001
  val HighFraction = 0.95

  /** Lower-interpolation percentiles of all voxel values in `chunks`:
    * smallest value whose cumulative count reaches p * total, per p. */
  def percentiles(spark: SparkSession, chunks: Dataset[ImageChunk],
      dtype: Dtype, ps: Seq[Double]): Seq[Double] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"fractions in [0,1]: $ps")
    import spark.implicits._
    if (dtype.isInteger) {
      val dt = dtype
      val hist = chunks.mapPartitions { it =>
        val m = mutable.HashMap.empty[Long, Long]
        it.foreach { ch =>
          val n = ch.data.length / dt.itemSize
          var i = 0
          while (i < n) {
            val v = dt.read(ch.data, i).toLong
            m.update(v, m.getOrElse(v, 0L) + 1L)
            i += 1
          }
        }
        m.iterator
      }.toDF("value", "cnt")
        .groupBy("value").agg(sum("cnt").as("cnt"))
      // the histogram is value-domain-sized (<= 65536 rows for uint16) and
      // scale-independent, so the unpartitioned cumulative window is a
      // bounded single task, not a data-sized sort
      val cum = hist
        .withColumn("cum", sum("cnt").over(
          Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("total", sum("cnt").over(Window.partitionBy()))
      val aggs = ps.zipWithIndex.map { case (p, i) =>
        min(when(col("cum") >= col("total") * p, col("value"))).as(s"p$i")
      }
      val row = cum.agg(aggs.head, aggs.tail: _*).head()
      ps.indices.map(i => row.getLong(i).toDouble)
    } else {
      val dt = dtype
      val vals = chunks.flatMap { ch =>
        val n = ch.data.length / dt.itemSize
        (0 until n).iterator.map(i => dt.read(ch.data, i))
      }.toDF("v")
      val row = vals.agg(
        expr(s"percentile_approx(v, array(${ps.mkString(",")}), 10000)").as("q")).head()
      row.getSeq[Double](0)
    }
  }

  /** The (start, end) omero.window pair: (0.1%-ile, 95%-ile) of the voxel
    * data — the live twin of the reference's hard-coded (0.0, 550.0). */
  def window(spark: SparkSession, chunks: Dataset[ImageChunk], dtype: Dtype)
      : (Double, Double) = {
    val Seq(lo, hi) = percentiles(spark, chunks, dtype, Seq(LowFraction, HighFraction))
    (lo, hi)
  }
}
