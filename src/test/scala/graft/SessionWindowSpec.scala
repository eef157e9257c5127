package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Q29's declared equivalence: the Spark-native `session_window` operator
  * produces the same sessionization as the portable gaps-and-islands window
  * SQL the oracle checks (SURVEY §2B Q29). */
class SessionWindowSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("session_window(ts, 30 min) == LAG/cumsum sessionization") {
    val spark = TestSpark.spark
    val e = Q.events(spark, dir)
      .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))

    val native = e
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("total_events"))

    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val run = ord.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val manual = e
      .withColumn("prev_ts", lag(col("ts"), 1).over(ord))
      .withColumn("new_s", when(col("prev_ts").isNull
        || col("ts") >= col("prev_ts") + expr("INTERVAL '30' MINUTE"), 1).otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("total_events"))

    val diff = native.as("a").join(manual.as("b"), Seq("user_id"), "full_outer")
      .filter(col("a.n_sessions") =!= col("b.n_sessions")
        || col("a.total_events") =!= col("b.total_events")
        || col("a.n_sessions").isNull || col("b.n_sessions").isNull)
      .count()
    assert(diff == 0, s"$diff users disagree between session_window and SQL form")
    assert(native.count() > 0)
  }

  test("approx_count_distinct lands within 5% of exact (q12c contract)") {
    val spark = TestSpark.spark
    val row = SparkEntry.queries("q12c_approx_distinct")(spark, dir).collect().head
    assert(row.getAs[Boolean]("within_tol"),
      s"approx distinct out of 5% tolerance (exact=${row.getAs[Long]("exact_parts")})")
  }
}
