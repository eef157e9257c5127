package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BOX-CALIBRATION ANCHOR (r19, the r18 verdict's bench-methodology
  * fix): two PINNED workloads — a pure-CPU codegen loop and a
  * fixed-size shuffle — timed at the head of every [[graft.Bench]] run
  * and before every [[TimeOne]] session, and emitted beside the query
  * timings. Absolute per-query seconds on this box drift 1.5-2x with
  * ambient load (r18 burned a judge A/B rebuild proving two "movers"
  * were box-wide drift); certified bands therefore carry NO meaning
  * across box states without a denominator. The anchor is that
  * denominator: a query reading 14 s under anchor 2.0 s and 10 s under
  * anchor 1.4 s is the SAME code at the same ratio. BENCH_NOTES certify
  * rig-query bands as RATIOS to `total` (cpu + shuffle), and a judge
  * adjudicates movers by comparing ratios — no worktree rebuilds.
  *
  * The two components are deliberately orthogonal: `cpu` saturates
  * whole-stage codegen arithmetic (no exchange, no IO), `shuffle` pays
  * one fixed 32-partition hash exchange + aggregation. Load that slows
  * only one of them (CPU contention vs disk/page-cache pressure) shows
  * up as a skewed pair, which the notes can reason about. Workload
  * sizes are constants by design — changing them invalidates every
  * recorded ratio, so don't.
  */
object Anchor {

  /** min-of-3 seconds for one thunk (the bench's own steady-state
    * convention — transient spikes must not poison the denominator). */
  private def time(body: => Unit): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }.min

  /** (cpuSec, shuffleSec) — run AFTER warmup so JIT is not billed. */
  def run(spark: SparkSession): (Double, Double) = {
    // pure CPU: 64M rows through a 4-deep codegen'd hash chain, one
    // partition per local core, no exchange (sum is partial-final
    // over the same partitioning)
    val cpu = time {
      // pmod before the sum: raw xxhash64 longs overflow an ANSI SUM
      spark.range(0L, 64000000L, 1L, 32)
        .select(sum(pmod(xxhash64(xxhash64(xxhash64(xxhash64(col("id"),
          lit(1L)), lit(2L)), lit(3L)), lit(4L)), lit(1000000L)))
          .as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    // fixed shuffle: 16M (key, id) pairs through one 4096-key hash
    // exchange + final aggregation — ~256 MB of shuffle payload
    val shuffle = time {
      spark.range(0L, 16000000L, 1L, 32)
        .select(pmod(xxhash64(col("id")), lit(4096L)).as("k"), col("id"))
        .groupBy("k")
        .agg(sum(col("id")).as("s"), count(lit(1)).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    (cpu, shuffle)
  }

  /** One warm pass of both workloads (JIT/codegen compile), untimed. */
  def warm(spark: SparkSession): Unit = {
    spark.range(0L, 2000000L, 1L, 32)
      .select(sum(pmod(xxhash64(xxhash64(xxhash64(xxhash64(col("id"),
        lit(1L)), lit(2L)), lit(3L)), lit(4L)), lit(1000000L))).as("h"))
      .write.format("noop").mode("overwrite").save()
    spark.range(0L, 1000000L, 1L, 32)
      .select(pmod(xxhash64(col("id")), lit(4096L)).as("k"), col("id"))
      .groupBy("k")
      .agg(sum(col("id")).as("s"), count(lit(1)).as("c"))
      .write.format("noop").mode("overwrite").save()
  }
}
