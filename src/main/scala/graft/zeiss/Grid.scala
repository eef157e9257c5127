package graft.zeiss

/** Pure grid / chunk-shape arithmetic for the 5-D chunk table.
  *
  * Ports the reference's planning math exactly (it is pure arithmetic, the
  * one piece SURVEY.md §4 says to keep verbatim-in-spirit):
  *  - ceil-division pyramid shape rule, `compress/czi_to_zarr.py:181-183`
  *  - `_get_size` / `_closer_to_target` / `expand_chunks` / `get_block_shape`,
  *    `compress/zarr_writer.py:15-120,215-244`
  *  - block slice generator `gen_slices`, `compress/zarr_writer.py:129-186`
  */
object Grid {

  def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  /** Shape of pyramid level `level` given level-0 shape and per-axis integer
    * scale factors (applied `level` times, ceil-div at each step). */
  def levelShape(shape: Seq[Long], factors: Seq[Long], level: Int): Seq[Long] =
    (0 until level).foldLeft(shape) { (s, _) =>
      s.zip(factors).map { case (d, f) => ceilDiv(d, f) }
    }

  /** Byte size of a chunk shape; rejects non-positive dims
    * (`zarr_writer.py:15-26` raises ValueError on dim <= 0). */
  def sizeBytes(shape: Seq[Int], itemSize: Int): Long = {
    require(shape.forall(_ > 0), s"all dimensions must be > 0: $shape")
    shape.map(_.toLong).product * itemSize
  }

  /** True when `candidate` is closer to `target` bytes than `best`
    * (`zarr_writer.py:29-48`; ties keep `best` — strict `<`). */
  def closerToTarget(
      candidate: Seq[Int], best: Seq[Int], targetBytes: Long, itemSize: Int): Boolean =
    math.abs(sizeBytes(candidate, itemSize) - targetBytes) <
      math.abs(sizeBytes(best, itemSize) - targetBytes)

  /** Expands a base chunk shape by integer multiples until closest to the
    * target byte size, never exceeding `dataShape`
    * (`zarr_writer.py:51-120`).
    *
    * mode "cycle": doubles one axis per step round-robin (z, y, x order);
    * mode "iso": scales all axes by i = 2, 3, 4, ...
    * Each candidate is clamped to the data shape; expansion stops when a
    * further step is no closer to the target.
    */
  def expandChunks(
      chunks: Seq[Int],
      dataShape: Seq[Long],
      targetBytes: Long,
      itemSize: Int,
      mode: String = "cycle"): Seq[Int] = {
    require(chunks.size == dataShape.size, "rank mismatch")
    require(chunks.forall(_ >= 1), "chunks must be >= 1 for all dimensions")
    require(dataShape.forall(_ >= 1), "data_shape must be >= 1 for all dimensions")
    require(chunks.zip(dataShape).forall { case (c, d) => c <= d },
      "chunks cannot be larger than data_shape in any dimension")
    require(targetBytes > 0, "target_size must be > 0")
    require(itemSize > 0, "itemsize must be > 0")

    def clamp(c: Seq[Long]): Seq[Int] =
      c.zip(dataShape).map { case (v, d) => math.min(v, d).toInt }
    def pick(current: Seq[Int], prev: Seq[Int]): Seq[Int] =
      if (closerToTarget(current, prev, targetBytes, itemSize)) current else prev

    // Faithful port of the reference loop (zarr_writer.py:85-116): grow
    // until the size reaches the target or every axis is clamped at the
    // data bound, then return the closer of the last two candidates. A
    // clamped axis does NOT stop the cycle — the next axes keep doubling.
    mode match {
      case "cycle" =>
        val n = chunks.size
        var current = chunks
        var prev = current
        var idx = 0
        var done = false
        while (!done && sizeBytes(current, itemSize) < targetBytes) {
          prev = current
          current = current.zipWithIndex.map { case (v, i) =>
            if (i == idx % n) math.min(dataShape(i), v.toLong * 2).toInt else v
          }
          idx += 1
          if (current.zip(dataShape).forall { case (c, d) => c >= d }) done = true
        }
        pick(current, prev)
      case "iso" =>
        var current = chunks
        var prev = current
        var i = 2L
        var done = false
        while (!done && sizeBytes(current, itemSize) < targetBytes) {
          prev = current
          current = clamp(chunks.map(_ * i))
          i += 1
          if (current.zip(dataShape).forall { case (c, d) => c >= d }) done = true
        }
        pick(current, prev)
      case other =>
        throw new IllegalArgumentException(s"Invalid mode $other")
    }
  }

  /** Block shape for bounded sink execution: base chunks expanded toward
    * `targetSizeMb` (`zarr_writer.py:215-244`; default target 409,600 MB,
    * caller override 12,800 MB at `czi_to_zarr.py:510-513`). */
  def blockShape(
      arrShape: Seq[Long],
      chunkShape: Seq[Int],
      itemSize: Int,
      targetSizeMb: Long = 409600L,
      mode: String = "cycle"): Seq[Int] = {
    val base = chunkShape.zip(arrShape).map { case (c, d) => math.min(c.toLong, d).toInt }
    expandChunks(base, arrShape, targetSizeMb * 1024L * 1024L, itemSize, mode)
  }

  /** Block-aligned slice starts+shapes covering `arrShape` — the
    * `gen_slices` generator (`zarr_writer.py:129-186`): per-dim stepping by
    * `blockShape`, last slice truncated to the array bound. Row-major order. */
  def blockSlices(arrShape: Seq[Long], blockShape: Seq[Int]): Iterator[Seq[(Long, Int)]] = {
    require(arrShape.size == blockShape.size, "rank mismatch")
    def rec(dim: Int): Iterator[List[(Long, Int)]] =
      if (dim == arrShape.size) Iterator(Nil)
      else
        Iterator.range(0L, arrShape(dim), blockShape(dim).toLong).flatMap { start =>
          val len = math.min(blockShape(dim).toLong, arrShape(dim) - start).toInt
          rec(dim + 1).map((start, len) :: _)
        }
    rec(0)
  }

  /** Number of chunks along one dim. */
  def nChunks(dim: Long, chunk: Int): Int = ceilDiv(dim, chunk).toInt

  /** Extent of chunk index `ci` along a dim (edge chunks truncated). */
  def chunkExtent(dim: Long, chunk: Int, ci: Int): Int =
    math.min(chunk.toLong, dim - ci.toLong * chunk).toInt
}
