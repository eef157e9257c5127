package graft

import org.apache.spark.sql.execution.GraftCheckpoint
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the GraftCheckpoint contract that q51's iteration depends on:
  * per-generation size estimates must NOT compound. Stock localCheckpoint
  * carries the origin plan's Statistics onto its LogicalRDD, and Catalyst's
  * size-only estimator multiplies child sizes at every join — re-checkpoint
  * a join of checkpoints a few times and the "size" becomes a BigInt whose
  * DIGIT COUNT grows geometrically, until the optimizer spends minutes in
  * BigInteger multiplication (observed as a driver hang in round 7).
  */
class CheckpointStatsSpec extends AnyFunSuite {

  test("flat-stats checkpoint generations do not compound size estimates") {
    val spark = TestSpark.spark
    var flat = GraftCheckpoint.localCheckpointFlatStats(
      spark.range(100).select(col("id").as("doc_id"), col("id").as("comp")))
    var stock = flat.localCheckpoint()
    var flatDigits = Seq.newBuilder[Int]
    var stockDigits = Seq.newBuilder[Int]
    def digits(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.stats.sizeInBytes.toString.length
    (1 to 4).foreach { _ =>
      val fj = flat.as("a").join(
          flat.select(col("doc_id").as("d2"), col("comp").as("c2")),
          col("comp") === col("d2"))
        .select(col("doc_id"), col("c2").as("comp"))
      flat = GraftCheckpoint.localCheckpointFlatStats(fj)
      flatDigits += digits(flat)
      val sj = stock.as("a").join(
          stock.select(col("doc_id").as("d2"), col("comp").as("c2")),
          col("comp") === col("d2"))
        .select(col("doc_id"), col("c2").as("comp"))
      stock = sj.localCheckpoint()
      stockDigits += digits(stock)
    }
    val f = flatDigits.result()
    val s = stockDigits.result()
    // flat generations: constant-size estimate (the leaf default), round
    // after round — plan time stays O(plan) in an iteration
    assert(f.distinct.size == 1, s"flat stats drifted across rounds: $f")
    // stock generations compound: each round's estimate carries the
    // previous round's as a factor (this is the hang this spec pins; if
    // Spark ever stops carrying originStats the helper becomes a no-op
    // and this assertion is the only one that needs updating)
    assert(s.last > s.head, s"expected stock checkpoint stats to compound: $s")
    assert(s.last > f.last, s"stock should exceed flat: stock=$s flat=$f")
  }
}
