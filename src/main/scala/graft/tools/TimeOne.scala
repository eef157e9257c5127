package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time one named query N times at a given sf dir. Trailing
  * `key=value` args become session conf (e.g.
  * `spark.graft.ivf.maxCellGroupMembers=1024` or
  * `spark.sql.autoBroadcastJoinThreshold=-1` for regime rehearsals). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // arg 2 is reps only when it isn't a key=value conf pair, so confs can
    // be passed without an explicit reps count
    val reps =
      if (args.length > 2 && !args(2).contains("=")) args(2).toInt else 3
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      println(s"[time] conf $k=$v")
      spark.conf.set(k, v)
    }
    // box-calibration anchor (r19): print the denominator so readings
    // from different box states compare as ratios (Anchor's doc)
    Anchor.warm(spark)
    val (ac, as) = Anchor.run(spark)
    println(f"[time] anchor cpu=$ac%.2f shuffle=$as%.2f " +
      f"total=${ac + as}%.2f s")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[time] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
