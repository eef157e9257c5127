package graft.zeiss

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Job settings mirroring the reference's pydantic `ZeissJobSettings`
  * (`models.py:23-76`) including every default:
  * compressor blosc/zstd/clevel 3/byte-shuffle, chunk 128^3, scale 2^3,
  * 4 pyramid levels. `compressJobSaveKwargs` is declared-but-dead in the
  * reference (`models.py:57-61`, never read) and is intentionally omitted.
  *
  * Settings arrive as a JSON string, a JSON config file, or environment
  * variables prefixed ZEISS_ (mirroring `zeiss_job.py:249-257`).
  */
final case class ZeissJobSettings(
    inputSource: String,
    outputDirectory: String,
    s3Location: Option[String] = None,
    numOfPartitions: Int = 1,
    partitionToProcess: Int = 0,
    compressorName: String = "blosc",
    compressorCname: String = "zstd",
    compressorClevel: Int = 3,
    compressorShuffle: Boolean = true,
    chunkSize: Seq[Int] = Seq(128, 128, 128),
    scaleFactor: Seq[Int] = Seq(2, 2, 2),
    downsampleLevels: Int = 4,
    /** op 25: delete the local stack after a successful S3 sync
      * (`zeiss_job.py:196-200`); only meaningful with s3Location set. */
    deleteAfterSync: Boolean = true,
    /** op 26: upload `input/derivatives` (`zeiss_job.py:202-220`) — the
      * reference's caller is commented out, so default OFF. */
    uploadDerivatives: Boolean = false,
    /** Concurrent stacks. The reference converts one stack at a time per
      * node (1 writer thread, GIL-averse — `czi_to_zarr.py:458-459`); Spark
      * jobs from several driver threads interleave on the same executors,
      * keeping the cluster busy through each stack's small tail stages. */
    stackParallelism: Int = 1,
    /** Optional display-range stats pass (SURVEY §2A op 15): compute the
      * omero.window start/end as the (0.1%, 95%) voxel percentiles instead
      * of the reference's hard-coded (0.0, 550.0). Default OFF for parity —
      * the reference explicitly cost-rejected `da.percentile`
      * (`czi_to_zarr.py:477-481`); our histogram pass makes it affordable
      * (see [[DisplayRange]]). */
    computeDisplayRange: Boolean = false,
    /** When a file has the ZISRAWFILE magic but the reader cannot decode it
      * (JPEG-XR, overlapping mosaic, corrupt), fall back to the synthetic
      * source instead of failing. Default OFF: writing fabricated voxels
      * under a real stack's name is a data-integrity hazard; opt in only
      * for rigs that knowingly exercise the synthetic path. */
    syntheticFallbackForUnsupported: Boolean = false) {

  require(numOfPartitions > 0, "num_of_partitions must be > 0")
  require(partitionToProcess >= 0 && partitionToProcess < numOfPartitions,
    "partition_to_process out of range")
  require(chunkSize.size == 3 && chunkSize.forall(_ > 0), "chunk_size must be 3 positive ints")
  require(scaleFactor.size == 3 && scaleFactor.forall(_ > 0), "scale_factor must be 3 positive ints")
  require(downsampleLevels > 0, "downsample_levels must be > 0")

  // only the zstd cname is implemented; advertising an unimplemented codec
  // in .zarray metadata would contradict the frames on disk
  require(compressorName != "blosc" || compressorCname == "zstd",
    s"unsupported blosc cname '$compressorCname' (only zstd is implemented)")

  /** Unknown compressor name -> no compression, matching `_get_compressor`'s
    * silent None fallback (`zeiss_job.py:91-103`). */
  def compressionEnabled: Boolean = compressorName == "blosc"
}

object ZeissJobSettings {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Parse the reference's snake_case JSON settings document. */
  def fromJson(json: String): ZeissJobSettings = {
    val node = mapper.readTree(json)
    // explicit JSON nulls (pydantic serializes unset Optionals as null)
    // must behave like absent keys — NullNode.asText would yield "null"
    def field(k: String) = Option(node.get(k)).filter(!_.isNull)
    def str(k: String): Option[String] = field(k).map(_.asText)
    def int(k: String, dflt: Int): Int = field(k).map(_.asInt).getOrElse(dflt)
    def bool(k: String, dflt: Boolean): Boolean =
      field(k).map(_.asBoolean).getOrElse(dflt)
    def ints(k: String, dflt: Seq[Int]): Seq[Int] =
      field(k).map { n =>
        (0 until n.size).map(i => n.get(i).asInt)
      }.getOrElse(dflt)
    val kwargs = field("compressor_kwargs")
    ZeissJobSettings(
      inputSource = str("input_source").getOrElse(
        throw new IllegalArgumentException("input_source is required")),
      outputDirectory = str("output_directory").getOrElse(
        throw new IllegalArgumentException("output_directory is required")),
      s3Location = str("s3_location").filter(_.nonEmpty),
      numOfPartitions = int("num_of_partitions", 1),
      partitionToProcess = int("partition_to_process", 0),
      compressorName = str("compressor_name").getOrElse("blosc"),
      compressorCname = kwargs.flatMap(k => Option(k.get("cname")).map(_.asText))
        .getOrElse("zstd"),
      compressorClevel = kwargs.flatMap(k => Option(k.get("clevel")).map(_.asInt))
        .getOrElse(3),
      compressorShuffle = kwargs.flatMap(k => Option(k.get("shuffle")).map(_.asInt != 0))
        .getOrElse(true),
      chunkSize = ints("chunk_size", Seq(128, 128, 128)),
      scaleFactor = ints("scale_factor", Seq(2, 2, 2)),
      downsampleLevels = int("downsample_levels", 4),
      deleteAfterSync = bool("delete_after_sync", true),
      uploadDerivatives = bool("upload_derivatives", false),
      stackParallelism = int("stack_parallelism", 1),
      computeDisplayRange = bool("compute_display_range", false),
      syntheticFallbackForUnsupported =
        bool("synthetic_fallback_for_unsupported", false))
  }

  def fromConfigFile(path: String): ZeissJobSettings =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Env-var fallback (`zeiss_job.py:255-257`): ZEISS_INPUT_SOURCE etc.
    * Every JSON-settable field has an env twin; lists are comma-separated. */
  def fromEnv(env: Map[String, String] = sys.env): ZeissJobSettings = {
    def get(k: String) = env.get(s"ZEISS_${k.toUpperCase}")
    def ints(k: String, dflt: Seq[Int]) =
      get(k).map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(dflt)
    ZeissJobSettings(
      inputSource = get("input_source").getOrElse(
        throw new IllegalArgumentException("ZEISS_INPUT_SOURCE is required")),
      outputDirectory = get("output_directory").getOrElse(
        throw new IllegalArgumentException("ZEISS_OUTPUT_DIRECTORY is required")),
      s3Location = get("s3_location").filter(_.nonEmpty),
      numOfPartitions = get("num_of_partitions").map(_.toInt).getOrElse(1),
      partitionToProcess = get("partition_to_process").map(_.toInt).getOrElse(0),
      compressorName = get("compressor_name").getOrElse("blosc"),
      compressorClevel = get("compressor_clevel").map(_.toInt).getOrElse(3),
      compressorShuffle = get("compressor_shuffle").forall(_.toBoolean),
      chunkSize = ints("chunk_size", Seq(128, 128, 128)),
      scaleFactor = ints("scale_factor", Seq(2, 2, 2)),
      downsampleLevels = get("downsample_levels").map(_.toInt).getOrElse(4),
      deleteAfterSync = get("delete_after_sync").forall(_.toBoolean),
      uploadDerivatives = get("upload_derivatives").exists(_.toBoolean),
      stackParallelism = get("stack_parallelism").map(_.toInt).getOrElse(1),
      computeDisplayRange = get("compute_display_range").exists(_.toBoolean),
      syntheticFallbackForUnsupported =
        get("synthetic_fallback_for_unsupported").exists(_.toBoolean))
  }
}

/** A file with the ZISRAWFILE magic that [[CziReader]] cannot decode.
  * Thrown (rather than silently substituting synthetic voxels) unless
  * `synthetic_fallback_for_unsupported` is set. */
final class UnsupportedCziException(path: String, reason: String)
  extends RuntimeException(
    s"$path is a real CZI this reader cannot decode ($reason); refusing to " +
      "write synthetic voxels in its place — set " +
      "synthetic_fallback_for_unsupported=true to override")

/** The reference's `JobResponse` analogue (`zeiss_job.py:239-241`). */
final case class JobResponse(statusCode: Int, message: String, data: Option[String] = None)
