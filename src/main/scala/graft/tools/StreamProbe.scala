package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: per-micro-batch progress for the q98 stream-stream join, to
  * see where replay wall time goes (state store commits vs work).
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val replay = s"${java.nio.file.Files.createTempDirectory("graft-probe")}/replay"
    graft.streaming.EventStream.stageReplay(spark, sfDir, replay, nFiles = 4)
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} state=${p.stateOperators.map(s => s"rows=${s.numRowsTotal} commit=${s.commitTimeMs}ms").mkString(";")}")
      }
    })
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      graft.streaming.EventStream.attributedPairs(spark, replay, s"probe_sink_$i").count()
      println(f"[probe] parts=$parts rep$i total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
