package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque BINARY + typed metadata,
  * decode/feature-extract as a partition-wise batch transform.
  *
  * Decode is REAL for netpbm images (P5/P6 — a public, lib-free binary
  * format; one third of the media table carries genuine PGM payloads so the
  * real path is exercised end-to-end); formats that need absent codec
  * libraries (JPEG, audio, video) go through `decodeStub`, a clearly-marked
  * deterministic fake. Everything Spark-side (schema, binary payload
  * handling, partitioning, per-partition batch shape) is real either way.
  * At 100TB the binary payloads ride in their own column so column pruning
  * keeps metadata-only queries from ever reading the bytes.
  */
object Multimodal {

  case class MediaRow(id: Long, kind: String, media: Array[Byte])
  case class MediaFeatures(
      id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int,
      mean_byte: Double, entropy_bits: Double, sha: String,
      decoder: String)

  /** Minimal REAL netpbm codec (public format: binary PGM "P5" grayscale /
    * PPM "P6" rgb, maxval <= 255). No external libraries needed, so unlike
    * the stub below this is a genuine decode: header parse (whitespace +
    * `#` comments), dimension extraction, raw sample plane. */
  object Pnm {
    /** Packs raw bytes into a zero-padded P5 grayscale image, `rowWidth`
      * pixels wide. */
    def encodeGray(pixels: Array[Byte], rowWidth: Int = 64): Array[Byte] = {
      val n = math.max(pixels.length, 1)
      val w = math.min(n, rowWidth)
      val h = (n + w - 1) / w
      s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++
        java.util.Arrays.copyOf(pixels, w * h)
    }

    /** (width, height, channels, samples) for a binary P5/P6 payload. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (bytes.length < 2 || bytes(0) != 'P' ||
        (bytes(1) != '5' && bytes(1) != '6')) return None
      val channels = if (bytes(1) == '5') 1 else 3
      var i = 2
      def nextInt(): Int = {
        while (i < bytes.length &&
          (bytes(i).toChar.isWhitespace || bytes(i) == '#')) {
          if (bytes(i) == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
          else i += 1
        }
        var v = -1
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
          v = math.max(v, 0) * 10 + (bytes(i) - '0'); i += 1
        }
        v
      }
      val (w, h, maxv) = (nextInt(), nextInt(), nextInt())
      if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
      i += 1 // exactly one whitespace byte separates maxval from samples
      val need = w.toLong * h * channels
      if (i + need > bytes.length) return None
      Some((w, h, channels, java.util.Arrays.copyOfRange(bytes, i, i + need.toInt)))
    }
  }

  /** STUB decoder: stands in for image/audio decodes whose codec libraries
    * are absent in this environment. Deterministic: derives fake dimensions
    * + real byte statistics.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Double, Double) = {
    val n = bytes.length.max(1)
    val (mean, entropy) = byteStats(bytes)
    val width = 16 + (n % 640)   // fake "decoded" dimensions
    val height = 16 + ((n / 7) % 480)
    (width, height, mean, entropy)
  }

  private def byteStats(bytes: Array[Byte]): (Double, Double) = {
    val n = bytes.length.max(1)
    val hist = new Array[Long](256)
    var sum = 0L
    bytes.foreach { b => val u = b & 0xff; hist(u) += 1; sum += u }
    var entropy = 0.0
    hist.foreach { c =>
      if (c > 0) { val p = c.toDouble / n; entropy -= p * math.log(p) / math.log(2) }
    }
    (sum.toDouble / n, entropy)
  }

  /** Builds a media table from documents (text bytes stand in for payloads)
    * and runs the partition-wise feature extraction.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
    media.mapPartitions { it =>
      it.map { row =>
        val (w, h, mean, ent, decoder) = Pnm.decode(row.media) match {
          case Some((pw, ph, _, samples)) =>
            val (m, e) = byteStats(samples)
            (pw, ph, m, e, "pnm")
          case None =>
            val (sw, sh, m, e) = decodeStub(row.media)
            (sw, sh, m, e, "stub")
        }
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(row.media).take(8).map("%02x".format(_)).mkString
        MediaFeatures(row.id, row.kind, row.media.length, w, h,
          math.rint(mean * 10000) / 10000, math.rint(ent * 10000) / 10000, sha,
          decoder)
      }
    }.toDF().orderBy("id")
  }

  /** Media table from documents: text bytes stand in for payloads; kind-1
    * rows are wrapped as genuine P5 grayscale images so the REAL decode
    * path runs end-to-end, kinds 0/2 stay opaque (stub-decoded).
    *
    * The wrap is a Column expression (a UDF confined to the `media`
    * column), NOT a typed `.map`: a Dataset map would force whole-row
    * deserialization for every downstream query, and Catalyst could no
    * longer prune the payload out of metadata-only plans — the pruning
    * contract this object's scaladoc promises (spec-asserted against the
    * scan's ReadSchema). */
  def mediaTable(spark: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[MediaRow] = {
    import spark.implicits._
    val wrapP5 = udf((bytes: Array[Byte]) => Pnm.encodeGray(bytes))
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"),
        (col("doc_id") % 3).cast(StringType).as("kind"),
        when(col("doc_id") % 3 === 1, wrapP5(col("text").cast(BinaryType)))
          .otherwise(col("text").cast(BinaryType)).as("media"))
      .as[MediaRow]
  }

  case class ResizedMedia(id: Long, kind: String,
      width: Int, height: Int, out_width: Int, out_height: Int,
      thumb: Array[Byte])

  /** Resize: REAL nearest-neighbor grayscale resample for netpbm payloads
    * (P6 rgb averaged to gray first); payloads needing absent codecs fall
    * back to a deterministic sampled byte grid. Either way the Spark-side
    * contract holds: binary in, fixed-size binary out, partition-wise
    * batches, payload column prunable. */
  def resize(spark: SparkSession, dir: String, outW: Int, outH: Int): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { it =>
      it.map { row =>
        val (w, h, thumb) = grayThumb(row.media, outW, outH)
        ResizedMedia(row.id, row.kind, w, h, outW, outH, thumb)
      }
    }.toDF()
  }

  /** (src width, src height, outW*outH gray thumb) — real nearest-neighbor
    * resample for netpbm payloads (P6 rgb averaged to gray), deterministic
    * sampled byte grid for absent-codec formats. Shared by [[resize]] and
    * [[phashes]]. */
  def grayThumb(media: Array[Byte], outW: Int, outH: Int)
      : (Int, Int, Array[Byte]) =
    Pnm.decode(media) match {
      case Some((pw, ph, ch, samples)) =>
        val gray =
          if (ch == 1) samples
          else Array.tabulate[Byte](pw * ph) { i =>
            (((samples(3 * i) & 0xff) + (samples(3 * i + 1) & 0xff) +
              (samples(3 * i + 2) & 0xff)) / 3).toByte
          }
        val t = Array.tabulate[Byte](outW * outH) { i =>
          val (ox, oy) = (i % outW, i / outW)
          gray(math.min(oy.toLong * ph / outH, ph - 1).toInt * pw +
            math.min(ox.toLong * pw / outW, pw - 1).toInt)
        }
        (pw, ph, t)
      case None =>
        val (sw, sh, _, _) = decodeStub(media)
        val n = media.length
        val t =
          if (n == 0) new Array[Byte](outW * outH) // empty -> blank thumb
          else Array.tabulate[Byte](outW * outH) { i =>
            media((i.toLong * 2654435761L % n).toInt)
          }
        (sw, sh, t)
    }

  /** 64-bit average-hash (aHash): bit i set iff thumb pixel i is above the
    * thumb mean. Byte-identical images agree exactly; small pixel noise
    * flips only the bits whose pixels sit near the mean, so image near-dup
    * is hamming distance on a 64-bit key — q36's simhash banding machinery
    * pointed at pixels instead of tokens. */
  def perceptualHash(thumb: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < thumb.length) { sum += thumb(i) & 0xff; i += 1 }
    val mean = if (thumb.length == 0) 0.0 else sum.toDouble / thumb.length
    var h = 0L
    i = 0
    while (i < 64 && i < thumb.length) {
      if ((thumb(i) & 0xff) > mean) h |= 1L << i
      i += 1
    }
    h
  }

  case class PHashRow(id: Long, kind: String, phash: Long)

  /** NoisyIdOffset separates stamped re-crawl copies from organic ids. */
  val NoisyIdOffset = 1000000L

  /** Per-image 64-bit perceptual hash over the real-decode slice (kind 1 =
    * genuine P5 payloads). Every 10th image also emits a STAMPED "noisy
    * re-crawl" copy (id + NoisyIdOffset, every 16th payload byte bumped —
    * different sha256, near-identical pixels), so the near-dup pass has
    * byte-distinct/pixel-close pairs to find: exactly the case exact-hash
    * dedup (q30's sha) misses and pHash exists for.
    *
    * Scale shape: the stamp + decode + 8x8 resample + hash is one
    * partition-wise pass over the media scan (no shuffle, no driver
    * bytes); output is 9 bytes per image. */
  def phashes(spark: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[PHashRow] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(col("kind") === "1")
      .as[MediaRow]
      .flatMap { row =>
        val base = row :: Nil
        val rows =
          if (row.id % 10 == 1) {
            val noisy = row.media.clone()
            var i = 16
            while (i < noisy.length) { noisy(i) = (noisy(i) + 1).toByte; i += 16 }
            MediaRow(row.id + NoisyIdOffset, row.kind, noisy) :: base
          } else base
        rows.map { r =>
          val (_, _, thumb) = grayThumb(r.media, 8, 8)
          PHashRow(r.id, r.kind, perceptualHash(thumb))
        }
      }
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
