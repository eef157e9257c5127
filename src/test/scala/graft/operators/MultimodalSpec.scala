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

  test("sampleFrames explodes every stride-th frame with time offsets") {
    val spark = TestSpark.spark
    val df = Multimodal.sampleFrames(spark, dir, nFrames = 16, stride = 4)
    val one = df.filter(col("id") === 2).orderBy("frame_idx").collect()
    assert(one.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 4, 8, 12))
    assert(one.map(_.getAs[Long]("t_offset_ms")).toSeq == Seq(0L, 160L, 320L, 480L))
    assert(one.forall(_.getAs[Array[Byte]]("frame").nonEmpty))
  }
}
