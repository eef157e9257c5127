package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` computing exact weighted percentiles —
  * the declared UDAF surface (SURVEY §2B) mirroring the stats pass the
  * reference REJECTED as too expensive (`da.percentile(image_data,
  * (0.1, 95))`, `compress/czi_to_zarr.py:477-481`). In Spark the exact pass
  * is affordable: partial buffers merge associatively, so the driver only
  * sees one buffer per partition.
  *
  * Semantics: weighted lower-interpolation percentile — the smallest value v
  * such that the cumulative weight of elements <= v reaches p * totalWeight.
  * Exact (buffers hold all distinct values); for 100TB use the
  * percentile_approx built-in instead — this Aggregator is the exact-answer
  * tool for bounded-cardinality columns.
  */
class WeightedPercentile(p: Double)
    extends Aggregator[(Double, Double), Map[Double, Double], Double] {
  require(p >= 0 && p <= 1, s"percentile must be in [0,1]: $p")

  def zero: Map[Double, Double] = Map.empty

  def reduce(buf: Map[Double, Double], in: (Double, Double)): Map[Double, Double] =
    buf.updated(in._1, buf.getOrElse(in._1, 0.0) + in._2)

  def merge(a: Map[Double, Double], b: Map[Double, Double]): Map[Double, Double] =
    b.foldLeft(a) { case (acc, (v, w)) => acc.updated(v, acc.getOrElse(v, 0.0) + w) }

  def finish(buf: Map[Double, Double]): Double = {
    if (buf.isEmpty) return Double.NaN
    val total = buf.values.sum
    val target = p * total
    var cum = 0.0
    val sorted = buf.toSeq.sortBy(_._1)
    sorted.foreach { case (v, w) =>
      cum += w
      if (cum >= target) return v
    }
    sorted.last._1
  }

  def bufferEncoder: Encoder[Map[Double, Double]] =
    Encoders.kryo[Map[Double, Double]]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
