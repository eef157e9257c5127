package graft.zeiss

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Ops 7, 9-12, 23, 25-26: reshape laws, JSON sources, sync+cleanup. */
class ReshapeJsonSpec extends AnyFunSuite {

  // ---- reshape laws (utils/utils.py:16-108) ----

  test("padShape prepends unit axes to rank 5 and rejects higher rank") {
    assert(Reshape.padShape(Seq(1600L, 2000L)) == Seq(1L, 1L, 1L, 1600L, 2000L))
    assert(Reshape.padShape(Seq(1L, 2L, 3L, 4L, 5L)) == Seq(1L, 2L, 3L, 4L, 5L))
    intercept[IllegalArgumentException](Reshape.padShape(Seq(1L, 2L, 3L), dim = 2))
  }

  test("extract(pad(s)) == s for non-unit logical shapes (round-trip law)") {
    for (s <- Seq(Seq(7L), Seq(160L, 200L), Seq(3L, 160L, 200L), Seq(2L, 3L, 4L, 5L))) {
      assert(Reshape.extractShape(Reshape.padShape(s)) == s)
    }
  }

  test("extractShape refuses to drop non-unit leading dims") {
    intercept[IllegalArgumentException](
      Reshape.extractShape(Seq(2L, 1L, 160L, 200L), Some(2)))
  }

  test("squeeze drops unit axes; addLeadingDim is pad by one") {
    assert(Reshape.squeezeShape(Seq(1L, 1L, 96L, 1L, 224L)) == Seq(96L, 224L))
    assert(Reshape.squeezeShape(Seq(1L, 1L)) == Seq(1L))
    assert(Reshape.addLeadingDim(Seq(5L, 6L)) == Seq(1L, 5L, 6L))
  }

  // ---- JSON sources (ops 7, 23) ----

  private def conf = TestSpark.spark.sparkContext.hadoopConfiguration

  test("readJson: default throws on missing; emptyOnMissing replicates {} quirk") {
    intercept[java.io.FileNotFoundException](
      JsonUtil.readJson(conf, "/tmp/graft-nope.json"))
    assert(JsonUtil.readJson(conf, "/tmp/graft-nope.json",
      emptyOnMissing = true).size == 0)
  }

  test("voxelResolution parses acquisition.json scale transform -> [z,y,x]") {
    val tmp = java.nio.file.Files.createTempFile("acq", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"tiles": [{"coordinate_transformations": [
        |  {"type": "translation", "translation": [9, 9, 9]},
        |  {"type": "scale", "scale": ["0.4", "0.4", "1.0"]}]}]}""".stripMargin)
    assert(JsonUtil.voxelResolution(conf, tmp.toString) == Seq(1.0, 0.4, 0.4))
    java.nio.file.Files.delete(tmp)
  }

  // ---- sync + cleanup (ops 24-26) ----

  test("s3Location sync copies the stack then deletes the local copy") {
    val spark = TestSpark.spark
    val in = java.nio.file.Files.createTempDirectory("graft-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-out").toString
    val remote = java.nio.file.Files.createTempDirectory("graft-remote").toString
    java.nio.file.Files.createFile(java.nio.file.Paths.get(in, "s(1).czi"))
    val settings = ZeissJobSettings(
      inputSource = in, outputDirectory = out,
      s3Location = Some(remote), // any Hadoop scheme; file:// here
      chunkSize = Seq(32, 32, 32), downsampleLevels = 1)
    val resp = ZeissJob.runJob(spark, settings)
    assert(resp.statusCode == 200)
    assert(new java.io.File(s"$remote/s_1.ome.zarr/.zattrs").exists)
    assert(!new java.io.File(s"$out/s_1.ome.zarr").exists, "local copy not cleaned")
  }

  test("uploadDerivatives raises when the folder is missing (op 26)") {
    val in = java.nio.file.Files.createTempDirectory("graft-in2").toString
    val settings = ZeissJobSettings(
      inputSource = in, outputDirectory = "/tmp/x",
      uploadDerivatives = true, s3Location = Some("/tmp/y"))
    intercept[java.io.FileNotFoundException](
      ZeissJob.runJob(TestSpark.spark, settings))
  }
}
