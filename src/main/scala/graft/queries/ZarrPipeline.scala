package graft.queries

import graft.QueryDef
import graft.zeiss._
import org.apache.spark.sql.functions._

/** Driver-visible demo of the image-pyramid ETL path (SURVEY §2A ops 5-22):
  * synthetic uint16 stack -> rechunk -> windowed-mean pyramid ->
  * Blosc(zstd+shuffle) -> Zarr v2 -> read back. Emits one summary row per
  * level with a voxel checksum computed from the READ-BACK bytes, so the
  * whole write/compress/decompress/read cycle is exercised, not just the
  * write. Rows-only check (no SQL oracle can express this pipeline).
  */
object ZarrPipeline {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q43_zarr_pyramid",
      (s, _) => {
        import s.implicits._
        val out = java.nio.file.Files.createTempDirectory("graft-zarr-q43").toString
        val settings = ZeissJobSettings(
          inputSource = "/nonexistent", outputDirectory = out,
          chunkSize = Seq(32, 32, 32), downsampleLevels = 3)
        val shape = Seq(1L, 1L, 64L, 96L, 128L)
        val counts = ZeissJob.writeStack(s, settings, "bench_stack.czi",
          headerOverride = Some((shape, Seq(1.0, 0.5, 0.5), 42L)))
        val rows = (0 until counts.size).map { lvl =>
          val (grid, ds) = ZarrIO.readLevel(s, s"$out/bench_stack_0.ome.zarr", lvl)
          val checksum = ds.map { ch =>
            val dt = grid.dtype
            var sum = 0.0
            var i = 0
            val n = ch.data.length / dt.itemSize
            while (i < n) { sum += dt.read(ch.data, i); i += 1 }
            sum
          }.reduce(_ + _)
          (lvl, counts(lvl), grid.shape.mkString("x"), checksum)
        }
        // summary rows are fully materialized locals — the store can go
        // before the DataFrame is even built (no temp-dir leak per run)
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
        }
        rm(new java.io.File(out))
        rows.toDF("level", "n_chunks", "shape", "voxel_sum")
          .withColumn("voxel_sum", round(col("voxel_sum"), 0))
          .orderBy("level")
      },
      None))
}
