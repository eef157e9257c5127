package graft.zeiss

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class RechunkDownsampleSpec extends AnyFunSuite {

  /** Dense in-memory model of a synthetic stack for verification. */
  private def dense(grid: ChunkGrid, seed: Long): Array[Double] = {
    val Seq(_, _, nz, ny, nx) = grid.shape
    val out = new Array[Double]((nz * ny * nx).toInt)
    var i = 0
    for (z <- 0L until nz; y <- 0L until ny; x <- 0L until nx) {
      out(i) = ChunkTable.voxel(seed, 0, 0, z, y, x, grid.dtype); i += 1
    }
    out
  }

  private def denseOf(grid: ChunkGrid, chunks: Seq[ImageChunk]): Array[Double] = {
    val Seq(_, _, nz, ny, nx) = grid.shape
    val out = new Array[Double]((nz * ny * nx).toInt)
    chunks.foreach { ch =>
      val (ez, ey, ex) = grid.extent(ch.zi, ch.yi, ch.xi)
      val dt = grid.dtype
      var i = 0
      for (z <- 0 until ez; y <- 0 until ey; x <- 0 until ex) {
        val gz = ch.zi.toLong * grid.chunk(0) + z
        val gy = ch.yi.toLong * grid.chunk(1) + y
        val gx = ch.xi.toLong * grid.chunk(2) + x
        out(((gz * ny + gy) * nx + gx).toInt) = dt.read(ch.data, i)
        i += 1
      }
    }
    out
  }

  test("rechunk preserves every voxel across uneven grid boundaries") {
    val spark = TestSpark.spark
    // 21x17x13 array, 8^3 chunks -> 5^3 chunks (both leave ragged edges)
    val grid = ChunkGrid(Seq(1L, 1L, 21L, 17L, 13L), Seq(8, 8, 8), "<u2")
    val src = ChunkTable.synthetic(spark, grid, seed = 5)
    val expected = dense(grid, 5)
    val (newGrid, out) = Rechunk(spark, src, grid, Seq(5, 5, 5))
    assert(newGrid.chunk == Seq(5, 5, 5))
    val got = denseOf(newGrid, out.collect().toSeq)
    assert(got.toSeq == expected.toSeq)
  }

  test("rechunk to identical grid is the identity (no-op, no shuffle)") {
    val spark = TestSpark.spark
    val grid = ChunkGrid(Seq(1L, 1L, 16L, 16L, 16L), Seq(8, 8, 8), "<u2")
    val src = ChunkTable.synthetic(spark, grid, seed = 9)
    val (g2, out) = Rechunk(spark, src, grid, Seq(8, 8, 8))
    assert(g2 eq grid)
    assert(out eq src)
  }

  test("windowed-mean downsample matches naive computation incl. ragged edges") {
    // single chunk with odd extents: 5x6x7, factor 2 -> 3x3x4
    val grid = ChunkGrid(Seq(1L, 1L, 5L, 6L, 7L), Seq(5, 6, 7), "<u2")
    val chunk = ChunkTable.syntheticChunk(grid, 3, 0, 0, 0, 0, 0)
    // NOTE: windowedMean requires chunk % factor == 0; bypass via the pure
    // kernel which handles ragged *array* edges (chunk == full array here).
    val out = Downsample.downsampleChunk(grid, Seq(2, 2, 2), chunk)
    val dt = grid.dtype
    def v(z: Int, y: Int, x: Int) = ChunkTable.voxel(3, 0, 0, z, y, x, dt)
    for (zo <- 0 until 3; yo <- 0 until 3; xo <- 0 until 4) {
      var sum = 0.0; var n = 0
      for (z <- zo * 2 until math.min(zo * 2 + 2, 5);
           y <- yo * 2 until math.min(yo * 2 + 2, 6);
           x <- xo * 2 until math.min(xo * 2 + 2, 7)) {
        sum += v(z, y, x); n += 1
      }
      val want = math.floor(sum / n) // uint16: truncate toward zero
      assert(dt.read(out.data, (zo * 3 + yo) * 4 + xo) == want, s"($zo,$yo,$xo)")
    }
  }

  test("windowedMean rejects factor-misaligned chunks") {
    val spark = TestSpark.spark
    val grid = ChunkGrid(Seq(1L, 1L, 9L, 9L, 9L), Seq(3, 3, 3), "<u2")
    val src = ChunkTable.synthetic(spark, grid, 1)
    intercept[IllegalArgumentException](
      Downsample.windowedMean(spark, src, grid, Seq(2, 2, 2)))
  }

  test("distributed pyramid level equals locally computed downsample") {
    val spark = TestSpark.spark
    val grid = ChunkGrid(Seq(1L, 1L, 12L, 10L, 8L), Seq(4, 4, 4), "<u2")
    val src = ChunkTable.synthetic(spark, grid, seed = 11)
    val full = dense(grid, 11)
    val (lvlGrid, lvl) = Downsample.level(spark, src, grid, Seq(2, 2, 2), Seq(4, 4, 4))
    assert(lvlGrid.shape == Seq(1L, 1L, 6L, 5L, 4L))
    val got = denseOf(lvlGrid, lvl.collect().toSeq)
    var i = 0
    for (zo <- 0 until 6; yo <- 0 until 5; xo <- 0 until 4) {
      var sum = 0.0; var n = 0
      for (z <- zo * 2 until math.min(zo * 2 + 2, 12);
           y <- yo * 2 until math.min(yo * 2 + 2, 10);
           x <- xo * 2 until math.min(xo * 2 + 2, 8)) {
        sum += full((z * 10 + y) * 8 + x); n += 1
      }
      assert(got(i) == math.floor(sum / n), s"voxel ($zo,$yo,$xo)")
      i += 1
    }
  }
}
