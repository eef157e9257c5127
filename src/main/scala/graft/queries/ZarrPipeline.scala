package graft.queries

import graft.QueryDef
import graft.zeiss._
import org.apache.spark.sql.functions._

/** Driver-visible demo of the image-pyramid ETL path (SURVEY §2A ops 5-22):
  * synthetic uint16 stack -> rechunk -> windowed-mean pyramid ->
  * Blosc(zstd+shuffle) -> Zarr v2 -> read back. Emits one summary row per
  * level with a voxel checksum computed from the READ-BACK bytes, so the
  * whole write/compress/decompress/read cycle is exercised, not just the
  * write.
  *
  * PROMOTED to a full hash oracle (r15, the last rows-only row): the
  * synthetic voxel field is a pure function of (seed, coords) —
  * ChunkTable.voxel's 64-bit wrapping hash replays in DuckDB via
  * HUGEINT split-multiply (a*b mod 2^64 without overflowing the 128-bit
  * type), xor and shift-based rotates — and the windowed-mean pyramid
  * is a per-window GROUP BY with numpy-astype truncation (FLOOR on
  * non-negative means). Level sums are sums of INTEGER voxel values
  * (< 2^53), so they are association-order-free and hash exactly. The
  * oracle therefore recomputes the MATHEMATICAL pyramid from first
  * principles; equality with the READ-BACK sums proves the whole
  * rechunk -> downsample -> Blosc(zstd+shuffle) -> Zarr -> decode cycle
  * round-trips every voxel (a single corrupted chunk anywhere would
  * shift an integer sum). Chunk counts and level shapes pin the
  * ceil-division grid arithmetic in the same rows.
  */
object ZarrPipeline {

  /** SQL builders for the voxel-hash twin — 64-bit wrapping arithmetic
    * on DuckDB HUGEINTs. `mulmod` splits the constant so the 128-bit
    * intermediate never overflows HUGEINT's signed range. */
  private val Two64 = "(CAST(1 AS HUGEINT) << 64)"
  private def wrap(e: String) = s"(($e) % $Two64)"
  private def mulmod(a: String, b: BigInt): String = {
    val (bh, bl) = (b >> 32, b & 0xFFFFFFFFL)
    wrap(s"((($a) & 4294967295) * $bl + ((((($a) >> 32) * $bl" +
      s" + (($a) & 4294967295) * $bh) % 4294967296) << 32))")
  }
  private def rotl(e: String, r: Int) =
    s"(((($e) << $r) % $Two64) + (($e) >> ${64 - r}))"

  private def oracleSql: String = {
    val C1 = BigInt("9e3779b97f4a7c15", 16)
    val CZ = BigInt("27d4eb2f165667c5", 16)
    val CY = BigInt("85ebca6b0db95151", 16)
    val CX = BigInt("c2b2ae35a32a9637", 16)
    val CF = BigInt("ff51afd7ed558ccd", 16)
    // seed prefix (t = c = 0, so their xors are no-ops; the rotates
    // still apply) — one constant row
    val h2 = rotl(rotl(mulmod("CAST(42 AS HUGEINT)", C1), 27), 29)
    s"""WITH h2c AS MATERIALIZED (SELECT $h2 AS h2),
       |l0 AS MATERIALIZED (
       |  SELECT z.z, y.y, x.x,
       |    (((((z.z >> 3) * 31 + (y.y >> 3) * 17 + (x.x >> 3) * 11 + 42)
       |        & 4095) << 4)
       |      | CAST((h6 >> 16) & 15 AS BIGINT)) & 65535 AS u
       |  FROM (SELECT UNNEST(generate_series(0, 63)) AS z) z
       |  CROSS JOIN (SELECT UNNEST(generate_series(0, 95)) AS y) y
       |  CROSS JOIN (SELECT UNNEST(generate_series(0, 127)) AS x) x
       |  CROSS JOIN h2c
       |  CROSS JOIN LATERAL (SELECT ${rotl(
             s"xor(h2c.h2, ${mulmod("CAST(z.z AS HUGEINT)", CZ)})", 31)}
       |    AS h3) s3
       |  CROSS JOIN LATERAL (SELECT ${rotl(
             s"xor(s3.h3, ${mulmod("CAST(y.y AS HUGEINT)", CY)})", 33)}
       |    AS h4) s4
       |  CROSS JOIN LATERAL (SELECT ${mulmod(
             s"xor(s4.h4, ${mulmod("CAST(x.x AS HUGEINT)", CX)})", CF)}
       |    AS h6) s6),
       |l1 AS MATERIALIZED (
       |  SELECT z // 2 AS z, y // 2 AS y, x // 2 AS x,
       |    CAST(FLOOR(CAST(SUM(u) AS DOUBLE) / COUNT(*)) AS BIGINT) AS u
       |  FROM l0 GROUP BY 1, 2, 3),
       |l2 AS MATERIALIZED (
       |  SELECT z // 2 AS z, y // 2 AS y, x // 2 AS x,
       |    CAST(FLOOR(CAST(SUM(u) AS DOUBLE) / COUNT(*)) AS BIGINT) AS u
       |  FROM l1 GROUP BY 1, 2, 3),
       |sums AS (SELECT 0 AS level, CAST(SUM(u) AS DOUBLE) AS voxel_sum
       |    FROM l0
       |  UNION ALL SELECT 1, CAST(SUM(u) AS DOUBLE) FROM l1
       |  UNION ALL SELECT 2, CAST(SUM(u) AS DOUBLE) FROM l2),
       |lv AS (SELECT level,
       |    (64 + (1 << level) - 1) // (1 << level) AS sz,
       |    (96 + (1 << level) - 1) // (1 << level) AS sy,
       |    (128 + (1 << level) - 1) // (1 << level) AS sx
       |  FROM (SELECT UNNEST(generate_series(0, 2)) AS level))
       |SELECT s.level,
       |  CAST(((lv.sz + 31) // 32) * ((lv.sy + 31) // 32)
       |    * ((lv.sx + 31) // 32) AS INT) AS n_chunks,
       |  '1x1x' || lv.sz || 'x' || lv.sy || 'x' || lv.sx AS shape,
       |  s.voxel_sum
       |FROM sums s JOIN lv ON lv.level = s.level
       |ORDER BY s.level""".stripMargin
  }

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
      Some(oracleSql)))
}
