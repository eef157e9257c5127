package graft.zeiss

import org.apache.spark.sql.{Dataset, SparkSession}

/** One row per chunk of a 5-D TCZYX image array — the Spark-native
  * representation of the reference's chunked dask array (SURVEY.md §1.5).
  * Grid coordinates are the key; `data` is the little-endian C-order voxel
  * payload of the (possibly edge-truncated) chunk.
  *
  * T and C chunk extents are always 1, mirroring the reference forcing them
  * to 1 at write time (`compress/czi_to_zarr.py:150-157`), so only spatial
  * coordinates carry chunk indices.
  */
final case class ImageChunk(
    t: Int, c: Int, zi: Int, yi: Int, xi: Int, data: Array[Byte])

/** Static chunk-grid geometry of one array: full 5-D shape (T,C,Z,Y,X),
  * spatial chunk shape (Z,Y,X), dtype. Carried in closures, not in rows —
  * per-row copies of invariant geometry would be pure shuffle weight.
  */
final case class ChunkGrid(
    shape: Seq[Long], // length 5: T, C, Z, Y, X
    chunk: Seq[Int],  // length 3: Z, Y, X
    dtypeName: String) {

  require(shape.size == 5, "shape must be rank 5 (TCZYX)")
  require(chunk.size == 3, "chunk must be rank 3 (ZYX)")

  @transient lazy val dtype: Dtype = Dtype.fromZarr(dtypeName)

  def nT: Int = shape(0).toInt
  def nC: Int = shape(1).toInt
  def nz: Int = Grid.nChunks(shape(2), chunk(0))
  def ny: Int = Grid.nChunks(shape(3), chunk(1))
  def nx: Int = Grid.nChunks(shape(4), chunk(2))
  def numChunks: Long = nT.toLong * nC * nz * ny * nx

  /** Spatial extent of chunk (zi,yi,xi) — edge chunks truncated. */
  def extent(zi: Int, yi: Int, xi: Int): (Int, Int, Int) = (
    Grid.chunkExtent(shape(2), chunk(0), zi),
    Grid.chunkExtent(shape(3), chunk(1), yi),
    Grid.chunkExtent(shape(4), chunk(2), xi))

  def chunkBytes(zi: Int, yi: Int, xi: Int): Int = {
    val (ez, ey, ex) = extent(zi, yi, xi)
    ez * ey * ex * dtype.itemSize
  }

  /** Geometry of the array downsampled by spatial `factors` (ceil-div shape
    * rule, `compress/czi_to_zarr.py:181-183`), chunked by `newChunk`. */
  def downsampled(factors: Seq[Int], newChunk: Seq[Int]): ChunkGrid =
    ChunkGrid(
      Seq(shape(0), shape(1),
        Grid.ceilDiv(shape(2), factors(0)),
        Grid.ceilDiv(shape(3), factors(1)),
        Grid.ceilDiv(shape(4), factors(2))),
      newChunk, dtypeName)
}

object ChunkTable {

  /** Deterministic synthetic voxel value — stands in for the CZI decode,
    * which is an explicit non-goal (the reference's own tests never decode a
    * real CZI either: `tests/test_zeiss_job.py:30-32` creates empty files).
    * Pure function of seed + global coordinates, so any sub-array can be
    * recomputed independently for verification.
    */
  def voxel(seed: Long, t: Long, c: Long, z: Long, y: Long, x: Long, dtype: Dtype): Double = {
    // Smooth low-frequency field + 4 bits of hash noise: shaped like real
    // light-sheet data (slowly varying intensity), so the Blosc
    // byte-shuffle + zstd path is actually exercised (a pure-noise field
    // is incompressible and only ever hits the memcpy fallback).
    val base = (((z >> 3) * 31 + (y >> 3) * 17 + (x >> 3) * 11 + seed) & 0xfffL) << 4
    var h = seed * 0x9e3779b97f4a7c15L
    h ^= t * 0xc2b2ae3d27d4eb4fL; h = java.lang.Long.rotateLeft(h, 27)
    h ^= c * 0x165667b19e3779f9L; h = java.lang.Long.rotateLeft(h, 29)
    h ^= z * 0x27d4eb2f165667c5L; h = java.lang.Long.rotateLeft(h, 31)
    h ^= y * 0x85ebca6b0db95151L; h = java.lang.Long.rotateLeft(h, 33)
    h ^= x * 0xc2b2ae35a32a9637L
    h *= 0xff51afd7ed558ccdL
    val u = (base | ((h >>> 16) & 0xfL)) & 0xffffL
    dtype match {
      case Dtype.UInt8 => (u & 0xffL).toDouble
      case Dtype.UInt16 => u.toDouble
      case Dtype.Int16 => (u - 32768L).toDouble
      case Dtype.Int32 => (u * 1000L - 32768000L).toDouble
      case _ => u.toDouble / 65536.0
    }
  }

  /** Materializes one chunk of the synthetic stack. */
  def syntheticChunk(grid: ChunkGrid, seed: Long,
      t: Int, c: Int, zi: Int, yi: Int, xi: Int): ImageChunk = {
    val dt = grid.dtype
    val (ez, ey, ex) = grid.extent(zi, yi, xi)
    val bytes = new Array[Byte](ez * ey * ex * dt.itemSize)
    val z0 = zi.toLong * grid.chunk(0)
    val y0 = yi.toLong * grid.chunk(1)
    val x0 = xi.toLong * grid.chunk(2)
    var i = 0
    var z = 0
    while (z < ez) {
      var y = 0
      while (y < ey) {
        var x = 0
        while (x < ex) {
          dt.write(bytes, i, voxel(seed, t, c, z0 + z, y0 + y, x0 + x, dt))
          i += 1; x += 1
        }
        y += 1
      }
      z += 1
    }
    ImageChunk(t, c, zi, yi, xi, bytes)
  }

  /** Distributed synthetic stack source (SURVEY §2A op 5's stand-in): one
    * task per chunk-range, generated in place — no driver materialization.
    * `keep` prunes on grid COORDS before any voxel is generated (the
    * blocked writer's sub-range scans would otherwise pay full-array
    * generation per block).
    */
  def synthetic(spark: SparkSession, grid: ChunkGrid, seed: Long,
      keep: (Int, Int, Int, Int, Int) => Boolean = (_, _, _, _, _) => true)
      : Dataset[ImageChunk] = {
    import spark.implicits._
    val g = grid
    val (nc, nz, ny, nx) = (g.nC, g.nz, g.ny, g.nx)
    spark.range(0, grid.numChunks, 1,
        math.min(grid.numChunks, spark.sparkContext.defaultParallelism * 2).toInt)
      .flatMap { idx =>
        var r = idx
        val xi = (r % nx).toInt; r /= nx
        val yi = (r % ny).toInt; r /= ny
        val zi = (r % nz).toInt; r /= nz
        val c = (r % nc).toInt; r /= nc
        val t = r.toInt
        if (keep(t, c, zi, yi, xi))
          Iterator.single(syntheticChunk(g, seed, t, c, zi, yi, xi))
        else Iterator.empty
      }
  }

  /** Reads a decoded chunk back into a dense Scala array for verification
    * (column-pruned callers should NOT use this — it materializes voxels). */
  def toDoubles(grid: ChunkGrid, chunk: ImageChunk): Array[Double] = {
    val dt = grid.dtype
    val n = chunk.data.length / dt.itemSize
    Array.tabulate(n)(i => dt.read(chunk.data, i))
  }
}
