package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime filter injection (Catalyst `InjectRuntimeFilter`): when a fact
  * table shuffle-joins a dimension that carries a selective filter, the
  * optimizer builds a bloom filter over the dimension's join keys at
  * runtime and applies it to the FACT SCAN — rows that cannot match are
  * dropped before the shuffle. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the ~matching fraction;
  * it composes with (and goes beyond) static partition pruning, which
  * only helps when the filter column IS the partition column.
  *
  * Thresholds are tuned down because the spec corpus is tiny (the
  * application side must look "big enough to be worth filtering"); on a
  * real cluster the defaults (10MB creation side / 10GB application side)
  * gate the same rewrite.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter into the fact side") {
    val spark = TestSpark.spark
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // the fact side is KBs here; drop the "is it worth it" size gate
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: runtime filters only pay off when the fact
      // side would otherwise be exchanged (a broadcast join already ships
      // the dim to the fact)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderstatus") === "P") // selective: ~4% of orders
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("might_contain"),
        s"no bloom runtime filter injected:\n$optimized")

      // and the filtered plan still computes the right answer
      val n = joined.collect().map(r => r.getLong(1)).sum
      val expected = li.join(
        spark.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderstatus") === "P"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
