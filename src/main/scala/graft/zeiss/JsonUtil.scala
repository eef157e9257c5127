package graft.zeiss

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** JSON document sources (SURVEY §2A ops 7, 23).
  *
  * `readJsonAsDict` replicates `utils/utils.py:111-135` including its
  * missing-file behavior — but ONLY behind `emptyOnMissing=true`, because
  * silently returning `{}` for a absent path is a foot-gun the survey flags;
  * the default here throws.
  */
object JsonUtil {

  private val mapper = new ObjectMapper()

  def readJson(conf: Configuration, path: String, emptyOnMissing: Boolean = false): JsonNode = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) {
      if (emptyOnMissing) return mapper.readTree("{}")
      throw new java.io.FileNotFoundException(path)
    }
    val in = fs.open(p)
    try mapper.readTree(in) finally in.close()
  }

  /** `_get_voxel_resolution` (`zeiss_job.py:64-89`, the disabled
    * acquisition.json path, kept behind explicit invocation per SURVEY
    * §7.3): filter `tiles[0].coordinate_transformations` for
    * `type == "scale"`, take the first, cast X,Y,Z to double. Returns
    * (Z, Y, X) like the reference. */
  def voxelResolution(conf: Configuration, acquisitionPath: String): Seq[Double] = {
    val doc = readJson(conf, acquisitionPath)
    val tiles = doc.get("tiles")
    require(tiles != null && tiles.size > 0, s"no tiles in $acquisitionPath")
    val transforms = tiles.get(0).get("coordinate_transformations")
    require(transforms != null, "no coordinate_transformations")
    val scaleTf = (0 until transforms.size).map(transforms.get)
      .find(t => t.get("type") != null && t.get("type").asText == "scale")
      .getOrElse(throw new IllegalArgumentException("no scale transform"))
    val s = scaleTf.get("scale")
    // acquisition.json stores X, Y, Z; reference returns [z, y, x]
    Seq(s.get(2).asDouble, s.get(1).asDouble, s.get(0).asDouble)
  }
}
