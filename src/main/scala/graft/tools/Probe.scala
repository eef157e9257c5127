package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only schema probe over /root/testdata — verifies how Spark reads the
  * driver-generated parquet (notably events.ts TIMESTAMP[ns]). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tables = Seq("events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"=== $t rows=${df.count()}")
      println(df.schema.treeString)
    }
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")).cast("timestamp_ntz"))
    ev.printSchema()
    ev.orderBy("event_id").show(5, truncate = false)
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.orderBy("doc_id").show(3, truncate = 120)
    import org.apache.spark.sql.functions._
    spark.stop()
  }
}
