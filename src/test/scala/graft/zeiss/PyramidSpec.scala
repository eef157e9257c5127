package graft.zeiss

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** t1 end-to-end slice (SURVEY §7.1 step 3): synthetic uint16 stack ->
  * multi-level OME-Zarr pyramid on disk -> read back with our own reader ->
  * voxel equality against independently computed expectations, plus
  * `.zattrs` / `.zarray` structural checks.
  */
class PyramidSpec extends AnyFunSuite {

  private def withTempDir[A](f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-zarr").toFile
    try f(dir.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete()
      }
      rm(dir)
    }
  }

  test("writeStack produces a readable 3-level pyramid with exact voxels") {
    val spark = TestSpark.spark
    withTempDir { out =>
      val settings = ZeissJobSettings(
        inputSource = "/nonexistent", outputDirectory = out,
        chunkSize = Seq(16, 16, 16), downsampleLevels = 3)
      val shape = Seq(1L, 1L, 34L, 24L, 18L) // ragged vs both chunk and factor
      val counts = ZeissJob.writeStack(spark, settings, s"$out/demo(7).czi",
        headerOverride = Some((shape, Seq(1.0, 0.5, 0.5), 123L)))
      assert(counts.size == 3)
      // level 0 grid: ceil(34/16)*ceil(24/16)*ceil(18/16) = 3*2*2
      assert(counts(0) == 12)

      val groupDir = s"$out/demo_7.ome.zarr"
      // ----- level 0: exact voxel equality against the source function
      val (g0, l0) = ZarrIO.readLevel(spark, groupDir, 0)
      assert(g0.shape == shape && g0.chunk == Seq(16, 16, 16))
      val dt = g0.dtype
      l0.collect().foreach { ch =>
        val (ez, ey, ex) = g0.extent(ch.zi, ch.yi, ch.xi)
        var i = 0
        for (z <- 0 until ez; y <- 0 until ey; x <- 0 until ex) {
          val want = ChunkTable.voxel(123L, 0, 0,
            ch.zi.toLong * 16 + z, ch.yi.toLong * 16 + y, ch.xi.toLong * 16 + x, dt)
          assert(dt.read(ch.data, i) == want)
          i += 1
        }
      }

      // ----- level shapes follow the ceil-div rule
      val (g1, l1) = ZarrIO.readLevel(spark, groupDir, 1)
      assert(g1.shape == Seq(1L, 1L, 17L, 12L, 9L))
      val (g2, _) = ZarrIO.readLevel(spark, groupDir, 2)
      assert(g2.shape == Seq(1L, 1L, 9L, 6L, 5L))

      // ----- level 1 voxels: windowed mean of the source, spot-checked densely
      val dense0 = Array.tabulate(34, 24, 18)((z, y, x) =>
        ChunkTable.voxel(123L, 0, 0, z, y, x, dt))
      val got1 = new Array[Double](17 * 12 * 9)
      l1.collect().foreach { ch =>
        val (ez, ey, ex) = g1.extent(ch.zi, ch.yi, ch.xi)
        var i = 0
        for (z <- 0 until ez; y <- 0 until ey; x <- 0 until ex) {
          val gz = ch.zi * g1.chunk(0) + z; val gy = ch.yi * g1.chunk(1) + y
          val gx = ch.xi * g1.chunk(2) + x
          got1((gz * 12 + gy) * 9 + gx) = dt.read(ch.data, i)
          i += 1
        }
      }
      for (zo <- 0 until 17; yo <- 0 until 12; xo <- 0 until 9) {
        var sum = 0.0; var n = 0
        for (z <- zo * 2 until math.min(zo * 2 + 2, 34);
             y <- yo * 2 until math.min(yo * 2 + 2, 24);
             x <- xo * 2 until math.min(xo * 2 + 2, 18)) {
          sum += dense0(z)(y)(x); n += 1
        }
        assert(got1((zo * 12 + yo) * 9 + xo) == math.floor(sum / n), s"L1 ($zo,$yo,$xo)")
      }

      // ----- metadata sidecars
      val conf = spark.sparkContext.hadoopConfiguration
      val zattrs = new String(ZarrIO.readBytes(conf, s"$groupDir/.zattrs"), "UTF-8")
      val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(zattrs)
      val ms = tree.get("multiscales").get(0)
      assert(ms.get("datasets").size == 3)
      assert(ms.get("axes").size == 5)
      assert(ms.get("axes").get(0).get("name").asText == "t")
      // cumulative scale product at level 2 = voxel * 4
      val s2 = ms.get("datasets").get(2).get("coordinateTransformations")
        .get(0).get("scale")
      assert(s2.get(2).asDouble == 4.0 && s2.get(3).asDouble == 2.0)
      val omero = tree.get("omero")
      assert(omero.get("rdefs").get("defaultZ").asLong == 17) // 34 // 2
      assert(omero.get("channels").get(0).get("window").get("max").asDouble == 65535.0)
      val zarray = new String(ZarrIO.readBytes(conf, s"$groupDir/0/.zarray"), "UTF-8")
      val za = new com.fasterxml.jackson.databind.ObjectMapper().readTree(zarray)
      assert(za.get("dtype").asText == "<u2")
      assert(za.get("dimension_separator").asText == "/")
      assert(za.get("compressor").get("cname").asText == "zstd")
    }
  }

  test("uncompressed mode round-trips when compressor name is unknown") {
    val spark = TestSpark.spark
    withTempDir { out =>
      val settings = ZeissJobSettings(
        inputSource = "/nonexistent", outputDirectory = out,
        compressorName = "unknown-codec", // -> None fallback, zeiss_job.py:91-103
        chunkSize = Seq(8, 8, 8), downsampleLevels = 1)
      val shape = Seq(1L, 1L, 8L, 8L, 8L)
      ZeissJob.writeStack(spark, settings, "x.czi",
        headerOverride = Some((shape, Seq(1, 1, 1), 1L)))
      val (g0, l0) = ZarrIO.readLevel(spark, s"$out/x_0.ome.zarr", 0)
      val ch = l0.collect().head
      assert(ch.data.length == 8 * 8 * 8 * 2)
      assert(g0.dtype.read(ch.data, 0) ==
        ChunkTable.voxel(1L, 0, 0, 0, 0, 0, g0.dtype))
    }
  }

  test("runJob globs, renames, partitions and reports like the reference") {
    val spark = TestSpark.spark
    withTempDir { in =>
      withTempDir { out =>
        // 3 stacks; empty files — the listing never decodes (matches the
        // reference's own test fixtures, tests/test_zeiss_job.py:26-38)
        Seq("a(1).czi", "b.czi", "c(2).czi").foreach { n =>
          java.nio.file.Files.createFile(java.nio.file.Paths.get(in, n))
        }
        java.nio.file.Files.createFile(java.nio.file.Paths.get(in, "ignored.txt"))
        val settings = ZeissJobSettings(
          inputSource = in, outputDirectory = out,
          numOfPartitions = 2, partitionToProcess = 0,
          chunkSize = Seq(32, 32, 32), downsampleLevels = 1)
        val resp = ZeissJob.runJob(spark, settings.copy())
        assert(resp.statusCode == 200)
        assert(resp.message.contains("Stacks: 2")) // round-robin: a(1), c(2)
        val dirs = new java.io.File(out).list().toSet
        assert(dirs == Set("a_1.ome.zarr", "c_2.ome.zarr"))
      }
    }
  }

  test("blocked level-0 execution (op 19) writes the identical pyramid") {
    val spark = TestSpark.spark
    withTempDir { outA =>
      withTempDir { outB =>
        val shape = Seq(1L, 1L, 40L, 32L, 24L)
        val header = Some((shape, Seq(1.0, 1.0, 1.0), 77L))
        def run(out: String, block: Option[Long]) = {
          val st = ZeissJobSettings(inputSource = "/nonexistent",
            outputDirectory = out, chunkSize = Seq(8, 8, 8), downsampleLevels = 2)
          ZeissJob.writeStack(spark, st, "blk.czi", header, blockTargetMb = block)
        }
        // tiny block target -> many bounded sub-jobs; must equal one-shot
        val cOne = run(outA, None)
        val cBlk = run(outB, Some(1L)) // ~1 MB blocks over 8^3 u16 chunks
        assert(cOne == cBlk, s"chunk counts differ: $cOne vs $cBlk")
        for (lvl <- 0 until 2) {
          val (ga, la) = ZarrIO.readLevel(spark, s"$outA/blk_0.ome.zarr", lvl)
          val (gb, lb) = ZarrIO.readLevel(spark, s"$outB/blk_0.ome.zarr", lvl)
          assert(ga == gb)
          val a = la.collect().map(c => ((c.zi, c.yi, c.xi), c.data.toSeq)).toMap
          val b = lb.collect().map(c => ((c.zi, c.yi, c.xi), c.data.toSeq)).toMap
          assert(a == b, s"level $lvl bytes differ")
        }
      }
    }
  }

  test("stackParallelism > 1 produces identical outputs concurrently") {
    val spark = TestSpark.spark
    withTempDir { in =>
      withTempDir { out =>
        Seq("p(1).czi", "q(2).czi", "r(3).czi").foreach { n =>
          java.nio.file.Files.createFile(java.nio.file.Paths.get(in, n))
        }
        val settings = ZeissJobSettings(
          inputSource = in, outputDirectory = out,
          chunkSize = Seq(32, 32, 32), downsampleLevels = 2,
          stackParallelism = 3)
        val resp = ZeissJob.runJob(spark, settings)
        assert(resp.statusCode == 200 && resp.message.contains("Stacks: 3"))
        Seq("p_1", "q_2", "r_3").foreach { name =>
          val (g0, l0) = ZarrIO.readLevel(spark, s"$out/$name.ome.zarr", 0)
          // spot-check one voxel against the per-stack seed
          val seed = ZeissJob.syntheticHeader(s"$in/$name.czi".replace(
            s"$name.czi", name.replaceAll("_(\\d+)$", "($1).czi")))._3
          val ch = l0.filter(c => c.zi == 0 && c.yi == 0 && c.xi == 0).head()
          assert(g0.dtype.read(ch.data, 0) ==
            ChunkTable.voxel(seed, 0, 0, 0, 0, 0, g0.dtype))
        }
      }
    }
  }

  test("level loop stops once the shape stops shrinking (<= n_lvls levels)") {
    val spark = TestSpark.spark
    withTempDir { out =>
      val settings = ZeissJobSettings(inputSource = "/nonexistent",
        outputDirectory = out, chunkSize = Seq(8, 8, 8), downsampleLevels = 6)
      val counts = ZeissJob.writeStack(spark, settings, "tiny.czi",
        headerOverride = Some((Seq(1L, 1L, 4L, 4L, 4L), Seq(1, 1, 1), 2L)))
      // 4 -> 2 -> 1, then 1 -> 1 stops the loop: exactly 3 levels
      assert(counts.size == 3, s"wrote ${counts.size} levels")
    }
  }

  test("re-running a synced job replaces the remote store (no nesting)") {
    val spark = TestSpark.spark
    withTempDir { in =>
      withTempDir { out =>
        withTempDir { remote =>
          java.nio.file.Files.createFile(java.nio.file.Paths.get(in, "r.czi"))
          val settings = ZeissJobSettings(inputSource = in, outputDirectory = out,
            s3Location = Some(remote), chunkSize = Seq(32, 32, 32),
            downsampleLevels = 1)
          ZeissJob.runJob(spark, settings)
          ZeissJob.runJob(spark, settings) // second run must replace, not nest
          val store = new java.io.File(s"$remote/r_0.ome.zarr")
          assert(store.isDirectory)
          assert(!new java.io.File(store, "r_0.ome.zarr").exists,
            "store nested inside itself on re-run")
        }
      }
    }
  }

  test("stored edge chunks are full-size, zero-padded (zarr v2 format)") {
    val spark = TestSpark.spark
    withTempDir { out =>
      val settings = ZeissJobSettings(
        inputSource = "/nonexistent", outputDirectory = out,
        chunkSize = Seq(16, 16, 16), downsampleLevels = 1)
      val shape = Seq(1L, 1L, 34L, 24L, 18L) // every axis chunk-ragged
      ZeissJob.writeStack(spark, settings, "edge.czi",
        headerOverride = Some((shape, Seq(1.0, 1.0, 1.0), 9L)))
      val conf = spark.sparkContext.hadoopConfiguration
      val lvl = s"$out/edge_0.ome.zarr/0"
      val grid = ZarrIO.parseZarray(new String(
        ZarrIO.readBytes(conf, s"$lvl/.zarray"), "UTF-8"))
      val fullBytes = 16 * 16 * 16 * grid.dtype.itemSize
      // every stored chunk — interior AND edge — must decode to exactly
      // prod(chunks)*itemsize bytes, the invariant standard zarr readers
      // (zarr-python, tensorstore, neuroglancer) rely on
      for (zi <- 0 until grid.nz; yi <- 0 until grid.ny; xi <- 0 until grid.nx) {
        val raw = ZarrIO.readBytes(conf, s"$lvl/0/0/$zi/$yi/$xi")
        val dec = Blosc.decompress(raw)
        assert(dec.length == fullBytes, s"chunk ($zi,$yi,$xi): ${dec.length}")
        // padding region beyond the live extent is fill_value = 0
        val (ez, ey, ex) = grid.extent(zi, yi, xi)
        var i = 0
        while (i < fullBytes / grid.dtype.itemSize) {
          val x = i % 16; val y = (i / 16) % 16; val z = i / 256
          if (z >= ez || y >= ey || x >= ex)
            assert(grid.dtype.read(dec, i) == 0.0, s"pad at ($zi,$yi,$xi)#$i")
          i += 1
        }
      }
      // read-back still returns the truncated working representation
      val (g0, l0) = ZarrIO.readLevel(spark, s"$out/edge_0.ome.zarr", 0)
      val corner = l0.filter(c => c.zi == 2 && c.yi == 1 && c.xi == 1).head()
      assert(corner.data.length == 2 * 8 * 2 * g0.dtype.itemSize) // 34%16=2, 24%16=8, 18%16=2
      val (ez, ey, ex) = g0.extent(2, 1, 1)
      var i = 0
      for (z <- 0 until ez; y <- 0 until ey; x <- 0 until ex) {
        assert(g0.dtype.read(corner.data, i) ==
          ChunkTable.voxel(9L, 0, 0, 32 + z, 16 + y, 16 + x, g0.dtype))
        i += 1
      }
    }
  }

  test("computeDisplayRange writes percentile omero.window (op 15 stats pass)") {
    val spark = TestSpark.spark
    withTempDir { out =>
      val shape = Seq(1L, 1L, 24L, 20L, 16L)
      val header = Some((shape, Seq(1.0, 1.0, 1.0), 55L))
      val base = ZeissJobSettings(inputSource = "/nonexistent",
        outputDirectory = out, chunkSize = Seq(16, 16, 16), downsampleLevels = 1)
      ZeissJob.writeStack(spark, base.copy(computeDisplayRange = true),
        "dr.czi", headerOverride = header)
      // local twin: exact lower-interpolation percentiles over every voxel
      val dt = Dtype.UInt16
      val vals = (for (z <- 0L until 24L; y <- 0L until 20L; x <- 0L until 16L)
        yield ChunkTable.voxel(55L, 0, 0, z, y, x, dt)).sorted
      def pct(p: Double): Double = {
        val target = p * vals.size
        var cum = 0
        vals.find { _ => cum += 1; cum >= target }.get
      }
      val conf = spark.sparkContext.hadoopConfiguration
      def window(name: String) = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(
          ZarrIO.readBytes(conf, s"$out/$name.ome.zarr/.zattrs"), "UTF-8"))
        .get("omero").get("channels").get(0).get("window")
      val w = window("dr_0")
      assert(w.get("start").asDouble == pct(DisplayRange.LowFraction))
      assert(w.get("end").asDouble == pct(DisplayRange.HighFraction))
      // default OFF keeps reference parity: hard-coded (0.0, 550.0)
      ZeissJob.writeStack(spark, base, "plain.czi", headerOverride = header)
      val p = window("plain_0")
      assert(p.get("start").asDouble == 0.0 && p.get("end").asDouble == 550.0)
    }
  }

  test("partitionList deals round-robin (zeiss_job.py:33-44)") {
    val parts = ZeissJob.partitionList((0 until 75).toList, 5)
    assert(parts.size == 5)
    assert(parts.map(_.size).toSet == Set(15))
    assert(parts.flatten.sorted == (0 until 75).toList)
    assert(parts(0).take(3) == List(0, 5, 10))
    val two = ZeissJob.partitionList((0 until 75).toList, 2)
    assert(two(0).size == 38 && two(1).size == 37)
  }

  test("renameStack handles the (N) suffix and the default") {
    assert(ZeissJob.renameStack("488_large(3).czi") == "488_large_3")
    assert(ZeissJob.renameStack("plain.czi") == "plain_0")
  }
}
