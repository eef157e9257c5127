package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared replay-ordering contract for the file-source streaming rigs: the
  * file source replays in (mtime, path) order, but parallel part-file
  * writes land with arbitrary mtimes — pin them to name order (which range
  * partitioning made the data order) so replays are deterministic. One
  * implementation for q33/q50's event replay and q53's document replay; a
  * drift here would silently change every streaming query's batch split.
  */
object ReplayStage {

  def pinReplayOrder(spark: SparkSession, replayDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(replayDir)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir)
      .filter { st =>
        st.isFile && st.getPath.getName.startsWith("part-") &&
          st.getPath.getName.endsWith(".parquet")
      }
      .sortBy(_.getPath.getName)
      .zipWithIndex.foreach { case (st, i) =>
        fs.setTimes(st.getPath, 1700000000000L + i * 60000L, -1)
      }
  }
}
