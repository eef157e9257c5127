package graft.zeiss

import org.scalatest.funsuite.AnyFunSuite

class SettingsSpec extends AnyFunSuite {

  test("defaults mirror models.py:23-76") {
    val s = ZeissJobSettings("/in", "/out")
    assert(s.compressorName == "blosc")
    assert(s.compressorCname == "zstd")
    assert(s.compressorClevel == 3)
    assert(s.compressorShuffle)
    assert(s.chunkSize == Seq(128, 128, 128))
    assert(s.scaleFactor == Seq(2, 2, 2))
    assert(s.downsampleLevels == 4)
    assert(s.s3Location.isEmpty)
    assert(s.compressionEnabled)
  }

  test("snake_case JSON settings parse with partial overrides") {
    val s = ZeissJobSettings.fromJson(
      """{"input_source": "/data/in", "output_directory": "/data/out",
        | "s3_location": "s3://bucket/prefix",
        | "num_of_partitions": 5, "partition_to_process": 2,
        | "compressor_kwargs": {"cname": "zstd", "clevel": 1, "shuffle": 0},
        | "chunk_size": [64, 64, 64], "downsample_levels": 2}""".stripMargin)
    assert(s.inputSource == "/data/in")
    assert(s.s3Location.contains("s3://bucket/prefix"))
    assert(s.numOfPartitions == 5 && s.partitionToProcess == 2)
    assert(s.compressorClevel == 1 && !s.compressorShuffle)
    assert(s.chunkSize == Seq(64, 64, 64))
    assert(s.downsampleLevels == 2)
    assert(s.scaleFactor == Seq(2, 2, 2)) // untouched default
  }

  test("unknown compressor name disables compression (zeiss_job.py:91-103)") {
    assert(!ZeissJobSettings("/i", "/o", compressorName = "lzma").compressionEnabled)
  }

  test("validation mirrors pydantic constraints") {
    intercept[IllegalArgumentException](ZeissJobSettings("/i", "/o", numOfPartitions = 0))
    intercept[IllegalArgumentException](
      ZeissJobSettings("/i", "/o", numOfPartitions = 2, partitionToProcess = 2))
    intercept[IllegalArgumentException](ZeissJobSettings("/i", "/o", chunkSize = Seq(1, 2)))
    intercept[IllegalArgumentException](
      ZeissJobSettings.fromJson("""{"output_directory": "/o"}"""))
  }

  test("flags round-trip through JSON; explicit null == absent") {
    val s = ZeissJobSettings.fromJson(
      """{"input_source": "/i", "output_directory": "/o",
        | "s3_location": null, "delete_after_sync": false,
        | "upload_derivatives": true, "stack_parallelism": 3}""".stripMargin)
    assert(s.s3Location.isEmpty) // null must not become Some("null")
    assert(!s.deleteAfterSync && s.uploadDerivatives && s.stackParallelism == 3)
  }

  test("unimplemented blosc cname is rejected, non-blosc ignores cname") {
    intercept[IllegalArgumentException](
      ZeissJobSettings("/i", "/o", compressorCname = "lz4"))
    ZeissJobSettings("/i", "/o", compressorName = "none", compressorCname = "lz4")
  }

  test("env-var fallback (zeiss_job.py:255-257)") {
    val s = ZeissJobSettings.fromEnv(Map(
      "ZEISS_INPUT_SOURCE" -> "/e/in", "ZEISS_OUTPUT_DIRECTORY" -> "/e/out",
      "ZEISS_DOWNSAMPLE_LEVELS" -> "2"))
    assert(s.inputSource == "/e/in" && s.downsampleLevels == 2)
  }
}
