package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque BINARY + typed metadata,
  * decode/feature-extract as a partition-wise batch transform.
  *
  * The actual image/audio codecs are not available in this environment, so
  * `decodeStub` is a clearly-marked deterministic fake; everything Spark-side
  * (schema, binary payload handling, partitioning, per-partition batch shape)
  * is real. At 100TB the binary payloads ride in their own column so column
  * pruning keeps metadata-only queries from ever reading the bytes.
  */
object Multimodal {

  case class MediaRow(id: Long, kind: String, media: Array[Byte])
  case class MediaFeatures(
      id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int,
      mean_byte: Double, entropy_bits: Double, sha: String)

  /** STUB decoder: stands in for a real image/audio decode (libs absent).
    * Deterministic: derives fake dimensions + real byte statistics.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Double, Double) = {
    val n = bytes.length.max(1)
    val hist = new Array[Long](256)
    var sum = 0L
    bytes.foreach { b => val u = b & 0xff; hist(u) += 1; sum += u }
    var entropy = 0.0
    hist.foreach { c =>
      if (c > 0) { val p = c.toDouble / n; entropy -= p * math.log(p) / math.log(2) }
    }
    val width = 16 + (n % 640)   // fake "decoded" dimensions
    val height = 16 + ((n / 7) % 480)
    (width, height, sum.toDouble / n, entropy)
  }

  /** Builds a media table from documents (text bytes stand in for payloads)
    * and runs the partition-wise feature extraction.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
    media.mapPartitions { it =>
      it.map { row =>
        val (w, h, mean, ent) = decodeStub(row.media)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(row.media).take(8).map("%02x".format(_)).mkString
        MediaFeatures(row.id, row.kind, row.media.length, w, h,
          math.rint(mean * 10000) / 10000, math.rint(ent * 10000) / 10000, sha)
      }
    }.toDF().orderBy("id")
  }

  def mediaTable(spark: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"),
        (col("doc_id") % 3).cast(StringType).as("kind"),
        col("text").cast(BinaryType).as("media"))
      .as[MediaRow]
  }

  case class ResizedMedia(id: Long, kind: String,
      width: Int, height: Int, out_width: Int, out_height: Int,
      thumb: Array[Byte])

  /** STUB resize: a real implementation would decode + bilinear-resample;
    * the stub derives the fake decoded dims and emits a deterministic
    * `out_w x out_h` byte grid sampled from the payload. The Spark-side
    * contract is the real part: binary in, fixed-size binary out,
    * partition-wise batches, payload column prunable. */
  def resize(spark: SparkSession, dir: String, outW: Int, outH: Int): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { it =>
      it.map { row =>
        val (w, h, _, _) = decodeStub(row.media)
        val n = row.media.length
        val thumb =
          if (n == 0) new Array[Byte](outW * outH) // empty payload -> blank thumb
          else Array.tabulate[Byte](outW * outH) { i =>
            row.media((i.toLong * 2654435761L % n).toInt)
          }
        ResizedMedia(row.id, row.kind, w, h, outW, outH, thumb)
      }
    }.toDF()
  }

  case class FrameSample(id: Long, frame_idx: Int, t_offset_ms: Long,
      frame: Array[Byte])

  /** STUB frame sampler: treats the payload as a "video" of `nFrames`
    * equal-length frames and emits every `stride`-th frame as its own row —
    * the explode-shaped generator a video pipeline needs (one row per
    * sampled frame, frame bytes in a prunable binary column). */
  def sampleFrames(spark: SparkSession, dir: String, nFrames: Int = 16,
      stride: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).flatMap { row =>
      val n = row.media.length
      if (n == 0) Iterator.empty
      else {
        val frameLen = math.max(n / nFrames, 1)
        Iterator.range(0, nFrames, stride).map { f =>
          val start = math.min(f * frameLen, n - 1)
          val frame = java.util.Arrays.copyOfRange(row.media, start,
            math.min(start + frameLen, n))
          FrameSample(row.id, f, f * 40L, frame) // 25fps -> 40ms per frame
        }
      }
    }.toDF()
  }
}
