package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.streaming.{IngestIndex, IngestStream}

/** Dev rig: measure the q104 bucketed index's per-trigger write IO in
  * the regime it exists for — batches SMALL relative to the index.
  * Stages `nBatches` replay slices, runs the ingest stream with
  * `buckets` write partitions, then walks the surviving version dirs:
  * bytes + bucket-dir count per version, the live index size, and the
  * total written vs what the r12 full-rewrite scheme would have written
  * (the growing index re-serialized every trigger).
  *
  * `sbt "runMain graft.tools.IngestIo /root/testdata/sf0.01 32 2048"`
  */
object IngestIo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val nBatches = if (args.length > 1) args(1).toInt else 32
    val buckets = if (args.length > 2) args(2).toInt else 2048
    // optional 4th arg: split threshold in bytes (r14 — rehearse the
    // bucket-splitting crawl regime at test scale)
    val splitBytes =
      if (args.length > 3) args(3).toLong else 128L * 1024 * 1024
    // optional 5th arg: broadcast-topology gate (r15 — rehearse the
    // 10^6-bucket regime's assignment representation; 1 forces every
    // split-topology assignment through the broadcast map)
    val bcastMinIds = if (args.length > 4) args(4).toInt else 65536
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.ingest.indexBuckets", buckets.toString)
      .config("spark.graft.ingest.splitBytes", splitBytes.toString)
      .config("spark.graft.ingest.topologyBroadcastMinIds",
        bcastMinIds.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("graft-ingestio")
      .toString
    val replay = s"$work/replay"
    val state = s"$work/state"
    IngestStream.stageReplay(spark, sfDir, replay, nBatches)
    IngestStream.classified(spark, replay, state).count()

    val fs = new Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataBytes(p: Path): Long =
      if (!fs.exists(p)) 0L
      else fs.listFiles(p, true).pipe { it =>
        var total = 0L
        while (it.hasNext) {
          val f = it.next()
          if (!f.getPath.getName.startsWith("_")
            && !f.getPath.toString.contains("_checkpoint"))
            total += f.getLen
        }
        total
      }
    // GC'd versions are gone; walk the survivors
    val versions = fs.listStatus(new Path(state))
      .map(_.getPath.getName).filter(_.matches("v-?\\d+"))
      .map(_.drop(1).toInt).sorted
    var cumWritten = 0L
    versions.foreach { v =>
      val b = dataBytes(new Path(s"$state/v$v"))
      cumWritten += b
      val touched = IngestIndex.Tables.map { t =>
        val p = new Path(s"$state/v$v/$t")
        if (fs.exists(p))
          fs.listStatus(p).count(_.getPath.getName.startsWith("bkt="))
        else 0
      }.sum
      println(f"[io] v$v%-4d bytes=$b%10d bucketDirs=$touched%5d")
    }
    // live index = the manifest view (one current copy of each bucket)
    val last = versions.max
    val manifest = IngestIndex.readManifest(fs, state, last.toLong)
    // one listing pass over the live buckets serves both the per-bucket
    // sizes and their total
    // EmptyVer sentinels (live-but-empty split children) hold no data:
    // skip them so live_buckets counts only data-bearing buckets and no
    // v<EmptyVer> path is probed
    val bucketSizes = manifest.toSeq.flatMap { case (t, bkts) =>
      bkts.toSeq.collect { case (bk, e) if e.ver != IngestIndex.EmptyVer =>
        dataBytes(new Path(s"$state/v${e.ver}/$t/bkt=$bk"))
      }
    }
    val liveBytes = bucketSizes.sum
    // per-trigger write = one version dir's data bytes (GC'd versions
    // were the same scale — each held only its batch's touched buckets);
    // r12's model rewrote the ENTIRE index-as-of-then every trigger
    val steady = versions.filter(_ > 1)
      .map(v => dataBytes(new Path(s"$state/v$v")))
    val avgPerTrigger =
      if (steady.isEmpty) 0L else steady.sum / steady.length
    val maxGen = manifest.values.flatMap(_.values.map(_.gen))
      .maxOption.getOrElse(0)
    println(f"[io] live_buckets=${bucketSizes.length} max_bucket_bytes=${
      bucketSizes.maxOption.getOrElse(0L)} max_gen=$maxGen (splitBytes=$splitBytes)")
    println(f"[io] versions_surviving=${versions.length} (of ${nBatches + 1} written; rest GC'd)")
    println(f"[io] live_index_bytes=$liveBytes%d")
    println(f"[io] avg_bytes_per_trigger=$avgPerTrigger%d (surviving post-v1 versions)")
    println(f"[io] r12_per_trigger=$liveBytes%d (full index rewrite)  win=${
      if (avgPerTrigger == 0) 0.0 else liveBytes.toDouble / avgPerTrigger}%.1fx")
    spark.stop()
  }

  private implicit class Pipe[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}
