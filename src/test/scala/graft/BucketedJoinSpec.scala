package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the zero-shuffle repeated-join pattern
  * for 100TB fact tables (SURVEY §4): bucket both sides on the join key at
  * write time and the sort-merge join needs NO exchange at read time.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Seq.empty
    }
    (p +: (p.children ++ nested).flatMap(collectAll)) ++ p.subqueries.flatMap(collectAll)
  }

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try {
      val dir = "/root/testdata/sf0.001"
      spark.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      spark.read.parquet(s"$dir/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum("l_quantity").as("qty"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan
      val shuffles = collectAll(plan).collect { case s: ShuffleExchangeLike => s }
      // the join itself must be exchange-free; the only allowed shuffle is
      // the one the groupBy introduces on o_orderstatus
      assert(shuffles.size <= 1,
        s"bucketed join still shuffles (${shuffles.size} exchanges):\n$plan")

      // same result as the unbucketed join
      val plainCount = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey")).count()
      val bucketedCount = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(bucketedCount == plainCount)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
