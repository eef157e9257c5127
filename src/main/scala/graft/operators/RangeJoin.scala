package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — the scale path for inequality-only joins.
  *
  * A join whose predicate has NO equality conjunct (`p.pt > i.lo AND
  * p.pt <= i.hi`) gives Catalyst nothing to hash on: the physical plan is
  * BroadcastNestedLoopJoin (or CartesianProduct), O(|points| x
  * |intervals|) — the canonical 100 TB scale killer. The standard fix
  * (Databricks' range-join optimization, interval trees in the
  * literature) buckets the value domain into fixed-width bins:
  *
  *  - each POINT row belongs to exactly one bin: floor(pt / binWidth);
  *  - each INTERVAL row replicates to every bin its (lo, hi] span
  *    touches — fan-out bounded by span/binWidth + 1;
  *  - an ordinary hash equi-join on the bin plus the original predicate
  *    as residual filter reproduces the pair set EXACTLY, with no
  *    deduplication step: a matching point lies in exactly one bin, and
  *    the interval's replica in that bin is unique.
  *
  * The result is hash-partitioned parallel work whose cost is
  * O(pairs-per-bin), tunable by binWidth against the interval-length
  * distribution (binWidth ~ typical span keeps fan-out ~2).
  *
  * Interval convention is half-open (lo, hi] — matching the engine's
  * event-attribution queries (q09/q73: `ts > click AND ts <= click+1h`).
  */
object RangeJoin {

  /** Join `points` to `intervals` on `lo < pt <= hi` via binWidth-wide
    * buckets of the (LONG) value domain. Returns all columns of both
    * inputs; column names must not collide (alias beforehand).
    */
  def binned(points: DataFrame, intervals: DataFrame,
      pt: Column, lo: Column, hi: Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__bin", floor(pt / binWidth).cast("long"))
    // (lo, hi] touches bins floor(lo/w)..floor(hi/w); the residual filter
    // discards the lo-bin rows whose point lands at or before lo
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(lo / binWidth).cast("long"),
        floor(hi / binWidth).cast("long"))))
    p.join(iv, p("__bin") === iv("__bin") && pt > lo && pt <= hi)
      .drop("__bin")
  }
}
