package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.queries.TextSearch

/** Q114b: STREAMING vector ingest — q114's upsert as the continuous
  * topology it exists for (embeddings arrive as a crawl, not a batch):
  * trigger 0 trains the coarse codebook on the initial corpus and
  * PERSISTS it beside the index (the frozen-quantizer contract), every
  * later trigger assigns its batch against the frozen centroids (one
  * scan of the batch, centroids broadcast, stored vectors untouched)
  * and merges into the persistent bucketed index — the q104
  * [[IngestIndex]] machinery verbatim: touched buckets rewritten,
  * manifest repointed, versions GC'd, replay idempotent (batch k reads
  * manifest v(k), overwrites v(k+1) at deterministic paths).
  *
  * Because per-row assignment against frozen centroids commutes with
  * slicing, the completed stream's index is EXACTLY q114's two-phase
  * build — the two share one DuckDB oracle (train on the first half,
  * assign everything one-shot).
  */
object VectorStream {

  private[graft] val VecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Stage the embeddings as a replay: batch 0 = the initial corpus
    * (non-null embeddings with vec_id < floor(n/2)) — the exact split
    * q114's oracle trains on — and the rest sliced into `restSlices`
    * files by a deterministic hash gate. Because per-row assignment
    * against frozen centroids commutes with slicing, EVERY restSlices
    * value yields the same final index (the VectorIngestSpec
    * slicing-independence property). */
  def stageReplay(spark: SparkSession, sfDir: String,
      replayDir: String, restSlices: Int = 1): Unit = {
    val e = TextSearch.embNonNull(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val half = e.count() / 2
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(replayDir)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val rest = e.filter(col("vec_id") >= half)
    val slices = Seq(0 -> e.filter(col("vec_id") < half)) ++
      (0 until restSlices).map(j => (j + 1) ->
        rest.filter(pmod(xxhash64(col("vec_id")), lit(restSlices)) === j))
    slices.foreach { case (k, batch) =>
      ReplayStage.stageSlice(fs, replayDir, k, batch)
    }
  }

  /** Run the ingest stream over every currently-unprocessed replay file,
    * then answer the q48-shaped probe over the manifest read-back.
    * Restart-safe: source progress in the stream checkpoint, index
    * versions batchId-derived, centroids written once at trigger 0 and
    * frozen (an idempotent overwrite on replay). */
  def ingested(spark: SparkSession, replayDir: String,
      stateDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val q = spark.readStream
      .schema(VecSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(replayDir)
      .writeStream
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val fs = new org.apache.hadoop.fs.Path(stateDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val cents =
          if (batchId == 0L) {
            // the frozen coarse codebook: trained on the FIRST trigger's
            // corpus, persisted beside the index for every later trigger
            val c = TextSearch.trainCents(spark, batch.toDF(),
              TextSearch.ivfCells(batch.count()))
            c.write.mode("overwrite").parquet(s"$stateDir/cents")
            c
          } else spark.read.parquet(s"$stateDir/cents")
        val assigned = TextSearch.nearestCells(batch.toDF(),
            graft.BroadcastBounds.bounded("ivf-centroids")(cents))
          .filter(col("rn") <= TextSearch.IvfProbes)
          .select(col("vec_id"), col("cid"), col("embedding"), col("rn"))
        val m = IngestIndex.readManifest(fs, stateDir, batchId)
        val next = batchId + 1
        val vecMap = IngestIndex.mergeCommit(spark, stateDir, m, "vec",
          next, assigned, (cur, d) => cur.unionByName(d))
        IngestIndex.writeManifest(fs, stateDir, next, Map("vec" -> vecMap))
        IngestIndex.gc(fs, stateDir, batchId, next)
        IngestIndex.maybeCompact(spark, stateDir, next)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.queries.VectorIngest.probeOf(spark,
      IngestIndex.currentTable(spark, stateDir, "vec"))
  }
}
