package graft.zeiss

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property suites over the pure kernels (no SparkSession):
  * Blosc round-trips, reshape laws, grid coverage, and rechunk
  * split/assemble voxel preservation on arbitrary grids.
  */
object BloscProps extends Properties("Blosc") {

  private val payloads = for {
    ts <- Gen.oneOf(1, 2, 4, 8)
    n <- Gen.choose(0, 2000)
    bytes <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  } yield (ts, bytes)

  property("shuffle.unshuffle == identity") = forAll(payloads) { case (ts, data) =>
    Blosc.unshuffle(Blosc.shuffle(data, ts), ts).sameElements(data)
  }

  property("compress.decompress == identity at any clevel") =
    forAll(payloads, Gen.choose(1, 9)) { case ((ts, data), lvl) =>
      Blosc.decompress(Blosc.compress(data, ts, lvl)).sameElements(data)
    }
}

object ReshapeProps extends Properties("Reshape") {

  private val shapes = Gen.choose(1, 5).flatMap(r =>
    Gen.listOfN(r, Gen.choose(2L, 64L))) // non-unit dims

  property("extract(pad(s)) == s") = forAll(shapes) { s =>
    Reshape.extractShape(Reshape.padShape(s)) == s
  }

  property("pad yields rank 5 with unit prefix") = forAll(shapes) { s =>
    val p = Reshape.padShape(s)
    p.size == 5 && p.takeRight(s.size) == s && p.dropRight(s.size).forall(_ == 1L)
  }

  property("squeeze removes exactly the unit axes") =
    forAll(Gen.listOfN(5, Gen.oneOf(Gen.const(1L), Gen.choose(2L, 9L)))) { s =>
      Reshape.squeezeShape(s) == (if (s.forall(_ == 1L)) Seq(1L) else s.filter(_ != 1L))
    }
}

object GridProps extends Properties("Grid") {

  private val dims = Gen.zip(Gen.choose(1L, 500L), Gen.choose(1, 64))

  property("blockSlices tile the array exactly") =
    forAll(Gen.listOfN(3, dims)) { spec =>
      val (shape, block) = (spec.map(_._1), spec.map(_._2))
      val slices = Grid.blockSlices(shape, block).toSeq
      val covered = slices.map(_.map(_._2.toLong).product).sum
      covered == shape.product &&
        slices.forall(_.zip(block).forall { case ((_, len), b) => len <= b })
    }

  property("chunkExtent sums to the dim") = forAll(dims) { case (dim, chunk) =>
    (0 until Grid.nChunks(dim, chunk)).map(Grid.chunkExtent(dim, chunk, _).toLong)
      .sum == dim
  }

  property("levelShape never hits zero while factors >= 1") =
    forAll(Gen.listOfN(3, Gen.choose(1L, 1000L)), Gen.choose(0, 6)) { (s, lvl) =>
      Grid.levelShape(s, Seq(2L, 2L, 2L), lvl).forall(_ >= 1L)
    }
}

object RechunkProps extends Properties("Rechunk") {

  // pure split/assemble over a single-stack grid, no Spark: every voxel of
  // every source chunk must land at its exact target position
  private val cases = for {
    nz <- Gen.choose(1L, 24L); ny <- Gen.choose(1L, 24L); nx <- Gen.choose(1L, 24L)
    sc <- Gen.listOfN(3, Gen.choose(1, 9))
    dc <- Gen.listOfN(3, Gen.choose(1, 9))
  } yield (Seq(1L, 1L, nz, ny, nx), sc, dc)

  property("split+assemble preserves every voxel") = forAll(cases) {
    case (shape, sc, dc) =>
      val src = ChunkGrid(shape, sc.zip(shape.drop(2)).map {
        case (c, d) => math.min(c.toLong, d).toInt
      }, "<u2")
      val dst = ChunkGrid(shape, dc.zip(shape.drop(2)).map {
        case (c, d) => math.min(c.toLong, d).toInt
      }, "<u2")
      val frags = (for {
        zi <- 0 until src.nz; yi <- 0 until src.ny; xi <- 0 until src.nx
      } yield ChunkTable.syntheticChunk(src, 7, 0, 0, zi, yi, xi))
        .iterator.flatMap(ch => Rechunk.split(src, dst, ch)).toSeq
      val assembled = frags.groupBy(f => (f.zi, f.yi, f.xi)).map { case ((zi, yi, xi), fs) =>
        (zi, yi, xi) -> Rechunk.assemble(dst, 0, 0, zi, yi, xi, fs.iterator)
      }
      val dt = dst.dtype
      assembled.forall { case ((zi, yi, xi), ch) =>
        val (ez, ey, ex) = dst.extent(zi, yi, xi)
        (0 until ez * ey * ex).forall { i =>
          val z = i / (ey * ex); val y = (i / ex) % ey; val x = i % ex
          dt.read(ch.data, i) == ChunkTable.voxel(7, 0, 0,
            zi.toLong * dst.chunk(0) + z, yi.toLong * dst.chunk(1) + y,
            xi.toLong * dst.chunk(2) + x, dt)
        }
      }
  }
}
