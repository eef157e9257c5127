package graft.zeiss

import org.scalatest.funsuite.AnyFunSuite

/** Planner arithmetic (SURVEY §2A ops 14, 19-20) — expected values mirror
  * the reference's behavior (`compress/zarr_writer.py`, `czi_to_zarr.py`). */
class GridSpec extends AnyFunSuite {

  test("ceilDiv matches ceil-division shape rule") {
    assert(Grid.ceilDiv(128, 2) == 64)
    assert(Grid.ceilDiv(129, 2) == 65)
    assert(Grid.ceilDiv(1, 2) == 1)
  }

  test("levelShape applies per-axis ceil-div per level (czi_to_zarr.py:181-183)") {
    assert(Grid.levelShape(Seq(100L, 64L, 33L), Seq(2L, 2L, 2L), 0) == Seq(100L, 64L, 33L))
    assert(Grid.levelShape(Seq(100L, 64L, 33L), Seq(2L, 2L, 2L), 1) == Seq(50L, 32L, 17L))
    assert(Grid.levelShape(Seq(100L, 64L, 33L), Seq(2L, 2L, 2L), 3) == Seq(13L, 8L, 5L))
  }

  test("sizeBytes rejects non-positive dims (zarr_writer.py:15-26)") {
    assert(Grid.sizeBytes(Seq(128, 128, 128), 2) == 4194304L)
    intercept[IllegalArgumentException](Grid.sizeBytes(Seq(128, 0, 128), 2))
    intercept[IllegalArgumentException](Grid.sizeBytes(Seq(-1, 2, 3), 2))
  }

  test("closerToTarget is strict (ties keep best, zarr_writer.py:29-48)") {
    // candidate 256 bytes vs best 128 bytes, target 200
    assert(Grid.closerToTarget(Seq(256), Seq(128), 200, 1))
    assert(!Grid.closerToTarget(Seq(128), Seq(256), 200, 1))
    // equal distance -> keep best
    assert(!Grid.closerToTarget(Seq(150), Seq(250), 200, 1))
  }

  test("expandChunks cycle mode doubles axes round-robin toward the target") {
    // 2-byte voxels; start 64^3 (512 KiB); doubling z, y, then x lands
    // exactly on the 4 MiB target: 128^3 * 2 B
    val out = Grid.expandChunks(Seq(64, 64, 64), Seq(1024L, 1024L, 1024L),
      4L * 1024 * 1024, 2, "cycle")
    assert(out == Seq(128, 128, 128))
    assert(Grid.sizeBytes(out, 2) == 4L * 1024 * 1024)
    // asymmetric target: stops after z+y doubles, x untouched
    val out2 = Grid.expandChunks(Seq(64, 64, 64), Seq(1024L, 1024L, 1024L),
      2L * 1024 * 1024, 2, "cycle")
    assert(out2 == Seq(128, 128, 64))
  }

  test("expandChunks clamps to data shape") {
    val out = Grid.expandChunks(Seq(64, 64, 64), Seq(80L, 80L, 80L),
      1L << 40, 2, "cycle")
    assert(out.forall(_ <= 80))
  }

  test("expandChunks iso mode scales all axes uniformly") {
    val out = Grid.expandChunks(Seq(32, 32, 32), Seq(4096L, 4096L, 4096L),
      16L * 32 * 32 * 32 * 8 * 2, 2, "iso") // target = (2x)^3 * 2... pick 64^3*2*2
    assert(out(0) == out(1) && out(1) == out(2))
    assert(out(0) >= 32)
  }

  test("expandChunks rejects unknown mode and oversized base") {
    intercept[IllegalArgumentException](
      Grid.expandChunks(Seq(64), Seq(128L), 1024, 1, "spiral"))
    intercept[IllegalArgumentException](
      Grid.expandChunks(Seq(256), Seq(128L), 1024, 1, "cycle"))
  }

  test("blockSlices covers the array exactly once, truncating the last slice") {
    val slices = Grid.blockSlices(Seq(5L, 3L), Seq(2, 2)).toSeq
    assert(slices.size == 6) // ceil(5/2) * ceil(3/2)
    assert(slices.head == Seq((0L, 2), (0L, 2)))
    assert(slices.last == Seq((4L, 1), (2L, 1)))
    val covered = slices.map { s => s.map(_._2.toLong).product }.sum
    assert(covered == 15L)
  }

  test("chunkExtent truncates edge chunks") {
    assert(Grid.chunkExtent(100, 32, 0) == 32)
    assert(Grid.chunkExtent(100, 32, 3) == 4)
  }

  test("blockShape honors the reference call-site override semantics") {
    // 12,800 MB target over a huge array expands well past one chunk
    val bs = Grid.blockShape(Seq(4096L, 8192L, 8192L), Seq(128, 128, 128), 2,
      targetSizeMb = 12800L)
    assert(Grid.sizeBytes(bs, 2) > Grid.sizeBytes(Seq(128, 128, 128), 2))
    bs.zip(Seq(4096L, 8192L, 8192L)).foreach { case (b, d) => assert(b <= d) }
  }
}
