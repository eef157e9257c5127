package graft.zeiss

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Minimal ZISRAW (Zeiss CZI) container reader — closes the "real CZI
  * source" gap of SURVEY §2A op 5 for the common uncompressed case. The
  * format is public: Zeiss's ZISRAW specification ("CZI — Image File Format
  * for Microscopy"), independently implemented by github.com/ZEISS/libczi
  * and by the `bioio-czi` reader the reference delegates to
  * (`zeiss_job.py:145-153`).
  *
  * Layout parsed here: a CZI is a sequence of 32-byte-aligned segments,
  * each `[16-byte ASCII id][int64 allocatedSize][int64 usedSize][data]`.
  *  - `ZISRAWFILE` (at offset 0): major/minor/reserved ints, two GUIDs,
  *    filePart, then the subblock-directory file position at data offset 52.
  *  - `ZISRAWDIRECTORY`: int32 entry count, 124 reserved bytes, then
  *    packed DirectoryEntryDV records.
  *  - DirectoryEntryDV: "DV", int32 pixelType, int64 filePosition,
  *    int32 filePart, int32 compression, 6 reserved bytes, int32
  *    dimensionCount, then 20-byte DimensionEntryDV1 records
  *    (4-char dimension, int32 start, int32 size, float32 startCoordinate,
  *    int32 storedSize).
  *  - `ZISRAWSUBBLOCK`: int32 metadataSize, int32 attachmentSize, int64
  *    dataSize, a copy of the DirectoryEntryDV, padding so the variable
  *    part starts at offset max(256, 16 + entry size), then metadata XML,
  *    then the pixel payload (then attachments).
  *
  * Scope (documented non-goals beyond this): uncompressed and
  * zstd0-compressed Gray8/Gray16 subblocks — real Zeiss light-sheet
  * acquisitions are uint16. JPEG-XR and zstd1 subblocks (the latter's 1-3
  * byte header carries a hi-lo-packing flag), mosaics with overlapping
  * tiles, and the XML metadata segment (voxel size lives there) are not
  * parsed; files this reader cannot handle make `tryOpen` return None and
  * the caller falls back to the synthetic source at the same seam
  * (ZeissJob.writeStack) — matching the reference's own tests, which never
  * decode a real CZI either (`tests/test_zeiss_job.py:30-32`).
  */
object CziReader {

  /** One DimensionEntryDV1. */
  final case class DimEntry(dim: String, start: Int, size: Int, storedSize: Int)

  /** One subblock-directory entry: where the payload lives + its extents. */
  final case class SubblockEntry(
      pixelType: Int,
      filePosition: Long,
      compression: Int,
      dims: Seq[DimEntry]) {
    def dim(name: String): Option[DimEntry] = dims.find(_.dim == name)
    def start(name: String): Int = dim(name).map(_.start).getOrElse(0)
    def size(name: String): Int = dim(name).map(_.size).getOrElse(1)
  }

  /** Parsed container: directory entries + the derived 5-D geometry. */
  final case class CziInfo(
      path: String,
      entries: Seq[SubblockEntry],
      dtype: Dtype,
      /** TCZYX extents (max(start+size) - min(start) per dimension). */
      shape: Seq[Long],
      /** Per-dimension minimum start (origin normalization): T,C,Z,Y,X. */
      origin: Seq[Int])

  private val DimOrder = Seq("T", "C", "Z", "Y", "X")

  val PixelGray8 = 0
  val PixelGray16 = 1
  val CompressionNone = 0
  /** ZISRAW "zstd0": the payload is one raw zstd frame (no extra header —
    * unlike zstd1/=6, whose 1-3 byte header with the hi-lo-packing flag is
    * out of scope here). Decompressed size is known from the entry's
    * dimension extents. */
  val CompressionZstd0 = 5

  private val Supported = Set(CompressionNone, CompressionZstd0)

  private def pixelDtype(pixelType: Int): Option[Dtype] = pixelType match {
    case PixelGray8 => Some(Dtype.UInt8)
    case PixelGray16 => Some(Dtype.UInt16)
    case _ => None
  }

  private def le(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  /** Reads `n` bytes at `pos` through the Hadoop FS API (works for file://
    * and any other configured scheme; executors re-open per task). */
  private def readAt(conf: Configuration, path: String, pos: Long, n: Int): Array[Byte] = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    try {
      val buf = new Array[Byte](n)
      in.readFully(pos, buf)
      buf
    } finally in.close()
  }

  /** Segment header at `pos`: (id, usedSize, dataStart). */
  private def segmentHeader(conf: Configuration, path: String, pos: Long)
      : (String, Long, Long) = {
    val h = readAt(conf, path, pos, 32)
    val id = new String(h, 0, 16, "US-ASCII").takeWhile(_ != '\u0000').trim
    val used = le(h).getLong(24)
    (id, used, pos + 32)
  }

  /** Parses one packed DirectoryEntryDV at `buf[off..]`; returns the entry
    * and its byte length. */
  private def directoryEntry(buf: ByteBuffer, off: Int): (SubblockEntry, Int) = {
    val schema = new String(Array(buf.get(off), buf.get(off + 1)), "US-ASCII")
    require(schema == "DV", s"unsupported directory entry schema '$schema'")
    val pixelType = buf.getInt(off + 2)
    val filePosition = buf.getLong(off + 6)
    val compression = buf.getInt(off + 18)
    val dimCount = buf.getInt(off + 28)
    require(dimCount >= 0 && dimCount <= 16, s"implausible dimensionCount $dimCount")
    val dims = (0 until dimCount).map { i =>
      val o = off + 32 + 20 * i
      val name = new String(
        Array(buf.get(o), buf.get(o + 1), buf.get(o + 2), buf.get(o + 3)),
        "US-ASCII").takeWhile(_ != '\u0000').trim
      DimEntry(name, buf.getInt(o + 4), buf.getInt(o + 8), buf.getInt(o + 16))
    }
    (SubblockEntry(pixelType, filePosition, compression, dims), 32 + 20 * dimCount)
  }

  /** Parses the container if this reader supports it (ZISRAWFILE magic,
    * DV directory entries, one uncompressed Gray8/Gray16 pixel type). */
  def tryOpen(conf: Configuration, path: String): Option[CziInfo] =
    try {
      val (magic, _, fhData) = segmentHeader(conf, path, 0L)
      if (magic != "ZISRAWFILE") return None
      val fh = le(readAt(conf, path, fhData, 512))
      val directoryPosition = fh.getLong(52)
      val (dirId, dirUsed, dirData) = segmentHeader(conf, path, directoryPosition)
      require(dirId == "ZISRAWDIRECTORY", s"expected directory segment, got '$dirId'")
      val dir = le(readAt(conf, path, dirData, dirUsed.toInt))
      val count = dir.getInt(0)
      var off = 128
      val entries = (0 until count).map { _ =>
        val (e, len) = directoryEntry(dir, off)
        off += len
        e
      }
      if (entries.isEmpty) return None
      val pixelTypes = entries.map(_.pixelType).distinct
      val dtype = pixelTypes match {
        case Seq(pt) => pixelDtype(pt).getOrElse(return None)
        case _ => return None // mixed pixel types unsupported
      }
      if (entries.exists(e => !Supported(e.compression))) return None
      // each subblock must be a single (T, C) plane stack — CziSource walks
      // its payload as one dense ZYX box per (t, c)
      if (entries.exists(e => e.size("T") != 1 || e.size("C") != 1)) return None
      // size sanity: extents positive and bounded so a corrupt directory
      // cannot drive giant task-side allocations in `payload`
      if (entries.exists(e => e.dims.exists(d => d.size <= 0 || d.size > (1 << 24))))
        return None
      if (entries.exists(_.filePosition <= 0)) return None
      val origin = DimOrder.map(d => entries.map(_.start(d)).min)
      val shape = DimOrder.zip(origin).map { case (d, o) =>
        entries.map(e => e.start(d) + e.size(d)).max.toLong - o
      }
      Some(CziInfo(path, entries, dtype, shape, origin))
    } catch {
      case scala.util.control.NonFatal(_) => None // not a parseable CZI
    }

  /** Reads one subblock's pixel payload, decoded to raw little-endian
    * C-order bytes over the entry's dimension extents (X fastest). */
  def payload(conf: Configuration, path: String, e: SubblockEntry): Array[Byte] = {
    val (id, _, data) = segmentHeader(conf, path, e.filePosition)
    require(id == "ZISRAWSUBBLOCK", s"expected subblock segment, got '$id'")
    val fixed = le(readAt(conf, path, data, 16))
    val metadataSize = fixed.getInt(0)
    val dataSize = fixed.getLong(8)
    val entrySize = 32 + 20 * e.dims.size
    val dataOff = math.max(256, 16 + entrySize) + metadataSize
    val rawSize = e.dims.map(_.size.toLong).product *
      pixelDtype(e.pixelType).map(_.itemSize).getOrElse(
        throw new IllegalArgumentException(s"pixel type ${e.pixelType}"))
    require(rawSize > 0 && rawSize <= Int.MaxValue - 8,
      s"implausible subblock extent ($rawSize raw bytes)")
    require(dataSize > 0 && dataSize <= Int.MaxValue - 8,
      s"implausible dataSize $dataSize")
    val stored = readAt(conf, path, data + dataOff, dataSize.toInt)
    e.compression match {
      case CompressionNone =>
        // a corrupt dataSize must fail loudly, not hand the grid a
        // wrong-sized voxel box
        require(stored.length == rawSize,
          s"uncompressed payload ${stored.length} bytes, extents say $rawSize")
        stored
      case CompressionZstd0 =>
        com.github.luben.zstd.Zstd.decompress(stored, rawSize.toInt)
      case other =>
        throw new IllegalArgumentException(s"unsupported compression $other")
    }
  }
}
