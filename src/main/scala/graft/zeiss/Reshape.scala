package graft.zeiss

/** Rank-normalization ops over the chunk table (SURVEY §2A ops 9-12).
  *
  * In the reference these reshape a dense ndarray (`da.squeeze`,
  * `pad_array_n_d`, `add_leading_dim`, `extract_data` —
  * `utils/utils.py:16-108`). On the chunk table, unit axes carry no payload,
  * so every one of these is pure grid-metadata arithmetic: the voxel bytes
  * never move and no Spark job runs. That is the point of keying chunks by
  * grid coordinates — rank changes are free.
  *
  * Internal representation is always rank 5 (TCZYX); these ops convert
  * between a logical rank (what the caller sees) and that normal form.
  */
object Reshape {

  /** `pad_array_n_d` (`utils/utils.py:33-55`): prepend unit axes until rank
    * `dim`. Rejects rank > dim like the reference ("Array have dimensions
    * bigger than required"). Input: logical shape; output: padded shape. */
  def padShape(shape: Seq[Long], dim: Int = 5): Seq[Long] = {
    require(dim >= shape.size, "Array has more dimensions than required")
    Seq.fill(dim - shape.size)(1L) ++ shape
  }

  /** `add_leading_dim` (`utils/utils.py:16-30`): data[None, ...]. */
  def addLeadingDim(shape: Seq[Long]): Seq[Long] = 1L +: shape

  /** `da.squeeze` (`zeiss_job.py:153`): drop all unit axes. */
  def squeezeShape(shape: Seq[Long]): Seq[Long] = {
    val kept = shape.filter(_ != 1L)
    if (kept.isEmpty) Seq(1L) else kept
  }

  /** `extract_data` (`utils/utils.py:58-108`): index away leading expanded
    * axes keeping the last K dims; e.g. (1,1,1,1600,2000) -> (1600,2000).
    * Fails when a leading axis is non-unit (cannot slice it away at index 0
    * without losing data — mirrors the reference raising ValueError). */
  def extractShape(shape: Seq[Long], lastDimensions: Option[Int] = None): Seq[Long] = {
    val keep = lastDimensions.getOrElse(shape.count(_ != 1L) match {
      case 0 => 1
      case n => n
    })
    require(keep <= shape.size, "last_dimensions exceeds rank")
    val dropped = shape.dropRight(keep)
    require(dropped.forall(_ == 1L),
      s"cannot extract: leading dims $dropped are not unit axes")
    shape.takeRight(keep)
  }

  /** Lifts a logical-rank grid (rank <= 5, spatial dims = trailing 3) into
    * the canonical rank-5 chunk grid. The chunk Dataset is untouched —
    * t/c coordinates of existing rows are already 0 for unit axes. */
  def padGrid(grid: ChunkGrid): ChunkGrid = grid // canonical form is rank 5

  /** Squeeze view of a rank-5 grid: the logical shape with unit axes
    * dropped, alongside the unchanged physical grid. */
  def squeezedView(grid: ChunkGrid): (Seq[Long], ChunkGrid) =
    (squeezeShape(grid.shape), grid)
}
