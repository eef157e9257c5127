package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: q51's delta-iteration trace at a given sf dir — rounds,
  * per-round frontier sizes (== each round's join probe volume), and wall
  * time. The BENCH_NOTES scale runs record this as the evidence that the
  * per-round shuffle SHRINKS once regions of the near-dup graph converge.
  */
object ComponentsScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val (rounds, frontier) =
        graft.queries.LlmOps.componentsScaleRun(spark, sfDir)
      println(f"[components] rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"$rounds rounds, frontier=${frontier.mkString(",")}")
    }
    spark.stop()
  }
}
