package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted physical plan of one named query.
  * args: <queryName> [sfDir] [outPath] — writes `.explain("formatted")`
  * output (the optimization-round deliverable format) to outPath
  * (default /tmp/explain.txt). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val out = if (args.length > 2) args(2) else "/tmp/explain.txt"
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    println(s"[explain] wrote $out")
    spark.stop()
  }
}
