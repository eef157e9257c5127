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

  /** The pinned-mtime scheme itself — file k replays at BaseEpochMs +
    * k * SpacingMs. Single source for every rig (q33/q50/q53/q104): a
    * second copy of these constants is exactly the drift the object doc
    * warns about. */
  val BaseEpochMs = 1700000000000L
  val SpacingMs = 60000L

  /** The schema of IngestStream.stageReplay's files, shared by its two
    * readers (IngestStream/HitterStream) — the same single-source
    * argument as the mtime constants: a staging change must not need
    * mirroring across readers. (DocStream's replay is a different
    * staging: it carries an event-time ts column.) */
  val DocSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))

  /** Pin one staged file to replay position `k`. */
  def pinFile(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path, k: Int): Unit =
    fs.setTimes(path, BaseEpochMs + k * SpacingMs, -1)

  /** Stage one pre-sliced batch frame as replay file `k`: single-file
    * write to a scratch dir, rename to `batch-%04d.parquet`, pinned
    * mtime. THE single implementation of the per-slice staging scheme
    * (IngestStream / VectorStream / CdfStream all route here — a second
    * copy of this loop is exactly the drift the object doc warns
    * about). */
  def stageSlice(fs: org.apache.hadoop.fs.FileSystem, replayDir: String,
      k: Int, df: org.apache.spark.sql.DataFrame): Unit = {
    val stage = s"$replayDir/_stage$k"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .map(_.getPath)
      .filter(p => p.getName.startsWith("part-") &&
        p.getName.endsWith(".parquet"))
      .head
    val dst = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(replayDir), f"batch-$k%04d.parquet")
    fs.rename(part, dst)
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    pinFile(fs, dst, k)
  }

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
      .zipWithIndex.foreach { case (st, i) => pinFile(fs, st.getPath, i) }
  }
}
