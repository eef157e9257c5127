package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("features: one row per media item, deterministic stats, real sha") {
    val spark = TestSpark.spark
    val df = Multimodal.features(spark, dir).cache()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(df.count() == n)
    val row = df.filter(col("id") === 0).collect().head
    assert(row.getAs[Int]("n_bytes") > 0)
    assert(row.getAs[Double]("entropy_bits") > 0.0)
    assert(row.getAs[String]("sha").length == 16)
    // rerun -> identical (determinism)
    val again = Multimodal.features(spark, dir).filter(col("id") === 0).collect().head
    assert(again == row)
    df.unpersist()
  }

  test("kind-1 rows decode through the REAL netpbm path") {
    val spark = TestSpark.spark
    val df = Multimodal.features(spark, dir)
    val byDecoder = df.groupBy("decoder").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // kinds 0/2 are opaque payloads (stub); kind 1 is genuine P5
    assert(byDecoder.keySet == Set("pnm", "stub"))
    assert(byDecoder("pnm") > 0)
    val r = df.filter(col("id") === 1).collect().head // kind 1
    assert(r.getAs[String]("decoder") == "pnm")
    assert(r.getAs[Int]("width") == 64) // encodeGray row width
  }

  test("Pnm codec: encode/decode round-trip, comments, truncation rejected") {
    val pixels = Array.tabulate[Byte](130)(i => (i * 7).toByte)
    val img = Multimodal.Pnm.encodeGray(pixels, rowWidth = 64)
    val Some((w, h, ch, samples)) = Multimodal.Pnm.decode(img)
    assert((w, h, ch) == (64, 3, 1)) // 130 bytes -> 64x3 zero-padded
    assert(samples.take(130).toSeq == pixels.toSeq)
    assert(samples.drop(130).forall(_ == 0))
    // header comments are skipped per the spec
    val commented = "P5\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4)
    assert(Multimodal.Pnm.decode(commented).contains((2, 2, 1, Array[Byte](1, 2, 3, 4)))
      || Multimodal.Pnm.decode(commented).exists(_._4.toSeq == Seq[Byte](1, 2, 3, 4)))
    // truncated sample plane -> None, not garbage
    assert(Multimodal.Pnm.decode(img.dropRight(10)).isEmpty)
    // P6 rgb decodes with 3 channels
    val rgb = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20, 30, 40, 50, 60)
    assert(Multimodal.Pnm.decode(rgb).exists { case (w2, h2, c2, s2) =>
      w2 == 2 && h2 == 1 && c2 == 3 && s2.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60)
    })
  }

  test("resize resamples real netpbm images by nearest neighbor") {
    val spark = TestSpark.spark
    val df = Multimodal.resize(spark, dir, 8, 6)
    val r = df.filter(col("id") === 1).collect().head // kind 1 -> real path
    val media = Multimodal.mediaTable(spark, dir)
      .filter(_.id == 1L).collect().head.media
    val Some((pw, ph, _, gray)) = Multimodal.Pnm.decode(media)
    assert(r.getAs[Int]("width") == pw && r.getAs[Int]("height") == ph)
    val thumb = r.getAs[Array[Byte]]("thumb")
    for (oy <- 0 until 6; ox <- 0 until 8) {
      val want = gray(math.min(oy.toLong * ph / 6, ph - 1).toInt * pw +
        math.min(ox.toLong * pw / 8, pw - 1).toInt)
      assert(thumb(oy * 8 + ox) == want, s"thumb ($ox,$oy)")
    }
  }

  test("resize emits fixed-size thumbs; payload column is prunable") {
    val spark = TestSpark.spark
    val df = Multimodal.resize(spark, dir, 8, 6)
    val r = df.filter(col("id") === 1).collect().head
    assert(r.getAs[Array[Byte]]("thumb").length == 48)
    assert(r.getAs[Int]("out_width") == 8 && r.getAs[Int]("out_height") == 6)
    // metadata-only projection never deserializes thumbs into the result
    val meta = df.select("id", "width", "height").limit(3).collect()
    assert(meta.length == 3 && meta.head.length == 3)
  }

  test("mediaTable keeps the payload column prunable (plan-level)") {
    val spark = TestSpark.spark
    // metadata-only query: the parquet scan must not read `text` at all —
    // this is the plan property the P5 wrap would break if it were a typed
    // .map (whole-row deserialization) instead of a Column expression
    val meta = Multimodal.mediaTable(spark, dir).select("id", "kind")
    val plan = meta.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("doc_id"), s"no parquet scan found in:\n$plan")
    assert(!readSchema.contains("text"),
      s"metadata-only query still reads the payload: $readSchema")
    assert(meta.limit(3).collect().length == 3)
  }

  test("sampleFrames explodes every stride-th frame with time offsets") {
    val spark = TestSpark.spark
    val df = Multimodal.sampleFrames(spark, dir, nFrames = 16, stride = 4)
    val one = df.filter(col("id") === 2).orderBy("frame_idx").collect()
    assert(one.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 4, 8, 12))
    assert(one.map(_.getAs[Long]("t_offset_ms")).toSeq == Seq(0L, 160L, 320L, 480L))
    assert(one.forall(_.getAs[Array[Byte]]("frame").nonEmpty))
  }

  test("q42b query: one summary row per doc, deterministic digests") {
    val spark = TestSpark.spark
    val run = graft.SparkEntry.queries("q42b_multimodal_resize")
    val df = run(spark, dir).cache()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(df.count() == n)
    val r = df.filter(col("id") === 1).collect().head // kind-1: real pnm path
    assert(r.getAs[Int]("out_width") == 16 && r.getAs[Int]("out_height") == 16)
    assert(r.getAs[Int]("width") == 64) // encodeGray row width
    assert(r.getAs[String]("thumb_sha").length == 16)
    assert(r.getAs[Long]("n_frames") == 4) // 16 frames, stride 4
    assert(r.getAs[Long]("frame_bytes") > 0)
    // rerun -> identical rows (determinism: the driver's rows-only gate
    // still rereads the dump, so flapping digests would look like churn)
    val again = run(spark, dir).filter(col("id") === 1).collect().head
    assert(again == r)
    df.unpersist()
  }

  test("q96 phash near-dup: banded pairs == brute force, stamps recovered") {
    val spark = TestSpark.spark
    val hashes = Multimodal.phashes(spark, dir).collect()
    // the blocking-recall law: 8 bands x 8 bits means any pair within
    // hamming 7 shares an untouched band (pigeonhole), so the banded join
    // must return EXACTLY the brute-force pair set at the <= 6 threshold
    val brute = (for {
      a <- hashes; b <- hashes if a.id < b.id
      h = java.lang.Long.bitCount(a.phash ^ b.phash) if h <= 6
    } yield (a.id, b.id, h)).toSet
    val pairs = graft.SparkEntry.queries("q96_image_phash_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == brute,
      s"banded join != brute force: missing=${brute -- pairs} extra=${pairs -- brute}")
    // stamped noisy re-crawl copies are byte-distinct (every 16th payload
    // byte bumped -> different sha256) yet pixel-close: each must be
    // recovered as a near-dup of its original — the case exact-sha dedup
    // cannot see
    val off = Multimodal.NoisyIdOffset
    val stamped = hashes.map(_.id).filter(_ >= off).map(_ - off)
    assert(stamped.nonEmpty)
    stamped.foreach { id =>
      assert(pairs.exists(p => p._1 == id && p._2 == id + off),
        s"stamped re-crawl copy of $id not recovered")
    }
  }
}
