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
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"),
        (col("doc_id") % 3).cast(StringType).as("kind"),
        col("text").cast(BinaryType).as("media"))
      .as[MediaRow]
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
}
