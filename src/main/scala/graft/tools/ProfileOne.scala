package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only: run named queries (comma-separated) once each (after warm
  * reps) with a listener that prints, per query, the Spark job count, the
  * summed job wall-clock, the summed inter-job gaps (driver-side work:
  * planning, manifest IO, stream trigger scheduling), summed task time,
  * GC time and shuffle volume — the local-mode substitute for the Spark
  * UI's Jobs page (the bench box runs with the UI off).
  */
object ProfileOne {
  private case class JobRow(id: Int, submitted: Long,
    var completed: Long = 0L, var taskTime: Long = 0L, var gcTime: Long = 0L,
    var shuffleRead: Long = 0L, var shuffleWrite: Long = 0L,
    var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val warmReps =
      if (args.length > 2 && !args(2).contains("=")) args(2).toInt else 1
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
      spark.conf.set(k, v)
    }

    val rows = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var recording = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (recording) {
          rows.put(e.jobId, JobRow(e.jobId, e.time))
          e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        Option(rows.get(e.jobId)).foreach(_.completed = e.time)
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val j = stageToJob.get(e.stageId)
        Option(rows.get(j)).foreach { r =>
          r.synchronized {
            r.tasks += 1
            if (e.taskMetrics != null) {
              r.taskTime += e.taskMetrics.executorRunTime
              r.gcTime += e.taskMetrics.jvmGCTime
              r.shuffleRead += e.taskMetrics.shuffleReadMetrics.totalBytesRead
              r.shuffleWrite += e.taskMetrics.shuffleWriteMetrics.bytesWritten
            }
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      def run(): Unit =
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      (1 to warmReps).foreach { i =>
        val t0 = System.nanoTime()
        run()
        println(f"[profile] $name warm rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      rows.clear(); stageToJob.clear()
      recording = true
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      recording = false
      Thread.sleep(500) // let the listener bus drain
      import scala.jdk.CollectionConverters._
      val all = rows.values.asScala.toSeq.sortBy(_.submitted)
      var prevEnd = if (all.nonEmpty) all.head.submitted else 0L
      var gapTotal = 0L; var jobTotal = 0L
      all.foreach { r =>
        gapTotal += math.max(0L, r.submitted - prevEnd)
        jobTotal += math.max(0L, r.completed - r.submitted)
        prevEnd = math.max(prevEnd, r.completed)
      }
      val task = all.map(_.taskTime).sum / 1000.0
      val gc = all.map(_.gcTime).sum / 1000.0
      val sr = all.map(_.shuffleRead).sum / 1024 / 1024
      val sw = all.map(_.shuffleWrite).sum / 1024 / 1024
      println(f"[profile] $name wall=$wall%.2f s jobs=${all.size} " +
        f"jobWall=${jobTotal / 1000.0}%.2f s gaps=${gapTotal / 1000.0}%.2f s " +
        f"task=$task%.1f s gc=$gc%.1f s shufR=${sr}MB shufW=${sw}MB")
    }
    spark.stop()
  }
}
