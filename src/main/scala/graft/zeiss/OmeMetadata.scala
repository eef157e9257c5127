package graft.zeiss

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** OME-NGFF (v0.4) metadata generators — driver-side ports of `_build_ome`,
  * `_compute_scales`, `_get_axes_5d`, `_get_pyramid_metadata`
  * (`compress/czi_to_zarr.py:28-219,324-339`). Pure JSON construction; no
  * distributed work (SURVEY §2A op 16).
  */
object OmeMetadata {

  private val mapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }

  def toJson(v: Any): String = mapper.writeValueAsString(v)

  /** `_get_axes_5d` (`czi_to_zarr.py:198-219`). */
  def axes5d(timeUnit: String = "millisecond", spaceUnit: String = "micrometer")
      : Seq[Map[String, String]] = Seq(
    Map("name" -> "t", "type" -> "time", "unit" -> timeUnit),
    Map("name" -> "c", "type" -> "channel"),
    Map("name" -> "z", "type" -> "space", "unit" -> spaceUnit),
    Map("name" -> "y", "type" -> "space", "unit" -> spaceUnit),
    Map("name" -> "x", "type" -> "space", "unit" -> spaceUnit))

  /** `_build_ome` (`czi_to_zarr.py:28-96`): the `omero` rendering object.
    * Defaults mirror the reference: channel names "Channel:<image>:<i>",
    * colors = index as 6-digit hex, minmax defaults (0,1), startend =
    * minmax, rdefs.defaultZ = Z//2. */
  def buildOme(
      dataShape: Seq[Long],
      imageName: String,
      channelNames: Option[Seq[String]] = None,
      channelColors: Option[Seq[Int]] = None,
      channelMinmax: Option[Seq[(Double, Double)]] = None,
      channelStartend: Option[Seq[(Double, Double)]] = None): Map[String, Any] = {
    val nCh = dataShape(1).toInt
    val names = channelNames.getOrElse((0 until nCh).map(i => s"Channel:$imageName:$i"))
    val colors = channelColors.getOrElse(0 until nCh)
    val minmax = channelMinmax.getOrElse(Seq.fill(nCh)((0.0, 1.0)))
    val startend = channelStartend.getOrElse(minmax)
    val channels = (0 until nCh).map { i =>
      Map(
        "active" -> true,
        "coefficient" -> 1,
        "color" -> f"${colors(i)}%06x",
        "family" -> "linear",
        "inverted" -> false,
        "label" -> names(i),
        "window" -> Map(
          "end" -> startend(i)._2, "max" -> minmax(i)._2,
          "min" -> minmax(i)._1, "start" -> startend(i)._1))
    }
    Map(
      "id" -> 1,
      "name" -> imageName,
      "version" -> "0.4",
      "channels" -> channels,
      "rdefs" -> Map(
        "defaultT" -> 0,
        "defaultZ" -> (dataShape(2) / 2), // Z // 2
        "model" -> "color"))
  }

  /** `_compute_scales` (`czi_to_zarr.py:99-195`): per-level scale transforms
    * (cumulative product over Z,Y,X voxel sizes; T,C scale 1.0) + per-level
    * chunk options (chunks clamped to the shrinking level shape). */
  def computeScales(
      nLevels: Int,
      scaleFactor: Seq[Int],
      pixelSizes: Seq[Double],
      chunks: Seq[Int],          // Z, Y, X write chunk
      dataShape: Seq[Long],      // T, C, Z, Y, X
      translation: Option[Seq[Double]] = None)
      : (Seq[Seq[Map[String, Any]]], Seq[Seq[Int]]) = {
    var scale = Seq(1.0, 1.0, pixelSizes(0), pixelSizes(1), pixelSizes(2))
    var (lz, ly, lx) = (dataShape(2), dataShape(3), dataShape(4))
    val transforms = Seq.newBuilder[Seq[Map[String, Any]]]
    val chunkSizes = Seq.newBuilder[Seq[Int]]
    (0 until nLevels).foreach { lvl =>
      if (lvl > 0) {
        scale = Seq(1.0, 1.0,
          scale(2) * scaleFactor(0), scale(3) * scaleFactor(1), scale(4) * scaleFactor(2))
        lz = Grid.ceilDiv(lz, scaleFactor(0))
        ly = Grid.ceilDiv(ly, scaleFactor(1))
        lx = Grid.ceilDiv(lx, scaleFactor(2))
      }
      val tf = Seq(Map[String, Any]("type" -> "scale", "scale" -> scale)) ++
        translation.map(tr => Map[String, Any]("type" -> "translation", "translation" -> tr))
      transforms += tf
      chunkSizes += Seq(1, 1,
        math.min(lz, chunks(0)).toInt, math.min(ly, chunks(1)).toInt,
        math.min(lx, chunks(2)).toInt)
    }
    (transforms.result(), chunkSizes.result())
  }

  /** `_get_pyramid_metadata` (`czi_to_zarr.py:324-339`) analogue. */
  def pyramidMetadata: Map[String, Any] = Map(
    "metadata" -> Map(
      "description" -> "windowed mean downsampling",
      "method" -> "graft.zeiss.Downsample.windowedMean",
      "version" -> "0.1.0",
      "args" -> "[false]",
      "kwargs" -> Map.empty[String, Any]))

  /** Full `.zattrs` content: `multiscales` + `omero`
    * (`write_ome_ngff_metadata`, `czi_to_zarr.py:222-295`). */
  def zattrs(
      imageName: String,
      dataShape: Seq[Long],
      nLevels: Int,
      scaleFactor: Seq[Int],
      voxelSize: Seq[Double],
      chunks: Seq[Int],
      dtype: Dtype,
      /** omero.window (start, end): defaults to the reference's hard-coded
        * display range (`czi_to_zarr.py:477-481`); the optional
        * [[DisplayRange]] stats pass supplies live percentiles instead. */
      displayRange: Option[(Double, Double)] = None): String = {
    val (transforms, _) =
      computeScales(nLevels, scaleFactor, voxelSize, chunks, dataShape)
    val datasets = (0 until nLevels).map { lvl =>
      Map("path" -> lvl.toString, "coordinateTransformations" -> transforms(lvl))
    }
    val multiscales = Seq(Map(
      "axes" -> axes5d(),
      "datasets" -> datasets,
      "name" -> imageName,
      "version" -> "0.4") ++ pyramidMetadata)
    // channel window from dtype bounds + the display range: the reference's
    // hard-coded (0.0, 550.0) (`czi_to_zarr.py:461-481`) unless the
    // optional percentile pass computed a live one
    val omero = buildOme(dataShape, imageName,
      channelMinmax = Some(Seq.fill(dataShape(1).toInt)((dtype.minValue, dtype.maxValue))),
      channelStartend = Some(Seq.fill(dataShape(1).toInt)(
        displayRange.getOrElse((0.0, 550.0)))))
    toJson(Map("multiscales" -> multiscales, "omero" -> omero))
  }
}
