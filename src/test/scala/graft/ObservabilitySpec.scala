package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Production observability surface: `Dataset.observe` attaches named
  * metrics to a query so they ride the SAME job as the real work — the
  * q84 validation rules without a second scan. At 100 TB a separate
  * metrics pass doubles IO; CollectMetrics costs nothing but the
  * accumulator merge.
  */
class ObservabilitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("observe() collects validation metrics in the same job as the write") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val obs = Observation("li_quality")
    // one pass: the "real" work is a filter+projection materialization;
    // the quality gate rides it as CollectMetrics
    val out = li.observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(!(col("l_quantity") >= 1 && col("l_quantity") <= 50), 1L)
          .otherwise(0L)).as("qty_violations"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))
          .as("null_shipdates"))
      .filter(col("l_discount") >= 0.0)
      .select("l_orderkey", "l_linenumber")
    out.write.format("noop").mode("overwrite").save()

    val m = obs.get
    // the metrics observe the PRE-filter stream (observe sits where it is
    // attached), so rows_seen is the full table
    assert(m("rows_seen") == li.count())
    // and they agree with a direct (second-pass) aggregation
    val direct = li.agg(
      sum(when(!(col("l_quantity") >= 1 && col("l_quantity") <= 50), 1L)
        .otherwise(0L)).as("qv"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("ns")).head()
    assert(m("qty_violations") == direct.getLong(0))
    assert(m("null_shipdates") == direct.getLong(1))
  }

  test("observe() works under a streaming query via its named metrics") {
    // batch Observation cannot be reused across streaming epochs; the
    // streaming surface is observe(name, ...) + progress.observedMetrics —
    // assert the metric appears and sums correctly across micro-batches
    val tmp = java.nio.file.Files.createTempDirectory("graft-observe")
    try {
      graft.streaming.EventStream.stageReplay(spark, dir,
        s"$tmp/replay", nFiles = 4)
      val schema = spark.read.parquet(s"$tmp/replay").schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$tmp/replay")
        .observe("ingest", count(lit(1)).as("rows"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_values"))
        .writeStream.format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val observed = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("ingest")))
      assert(observed.nonEmpty, "no observed metrics surfaced in progress")
      val total = observed.map(_.getLong(0)).sum
      assert(total == spark.read.parquet(s"$tmp/replay").count(),
        s"streamed observe saw $total rows")
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete()
      }
      rm(tmp.toFile)
    }
  }
}
