package graft.queries

import graft.QueryDef
import graft.Q._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus/table profiling + reshaping operators (round 8): PIVOT/UNPIVOT
  * (the wide-long reshape pair every reporting layer needs), fixed-width
  * histogram profiling (the data-distribution audit the reference skipped
  * as too expensive at `czi_to_zarr.py:477-481` — affordable as a
  * partial-agg pass), and the RefinedWeb-style per-source document cap
  * (web-corpus curation: no single domain may dominate the training mix).
  */
object Profiling {

  /** q79: max docs kept per source (RefinedWeb caps a domain's share the
    * same way — a fixed per-domain budget with a deterministic rank). */
  val DomainCap = 20

  /** q78: fixed-width histogram bucket in order-price units. */
  val BucketWidth = 50000L

  val defs: Seq[QueryDef] = Seq(

    // Q75 PIVOT — long-to-wide conditional aggregation ---------------------
    // Spark's relational pivot (`RelationalGroupedDataset.pivot`) with an
    // EXPLICIT value list: without it Spark runs an extra distinct-values
    // job AND the column set becomes data-dependent — a schema decided by
    // the data is how wide tables break downstream at 100 TB. Physically
    // this is one partial+final HashAggregate (pivot lowers to
    // sum(CASE WHEN ...) per value) — no extra shuffle vs a plain groupBy,
    // which is exactly what the oracle spells out.
    QueryDef("q75_pivot",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum4(col("l_quantity")))
          .select(col("l_returnflag"),
            col("F").as("qty_f"), col("O").as("qty_o"))
          .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
             |  ${SUM4("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f,
             |  ${SUM4("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Q75b UNPIVOT — the inverse reshape, pinned by the roundtrip law -------
    // pivot(unpivot(x)) == x: melting the q75 wide table back to long form
    // must reproduce the plain groupBy aggregate. Uses the native
    // `Dataset.unpivot` (Catalyst `Expand` — one pass, no join, no
    // generator shuffle); absent cells (a flag with no rows in a status)
    // come back as NULL measures and are dropped to match the groupBy,
    // which never saw such a group.
    QueryDef("q75b_unpivot",
      (s, d) => {
        val wide = t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum4(col("l_quantity")))
        wide.unpivot(
            Array(col("l_returnflag")),
            Array(col("F"), col("O")),
            "l_linestatus", "sum_qty")
          .filter(col("sum_qty").isNotNull)
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
             |  ${SUM4("l_quantity")} AS sum_qty
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Q78 fixed-width histogram ---------------------------------------------
    // Distribution profiling as a partial-agg pass: bucket assignment is
    // per-row arithmetic (floor over a double division — IEEE-identical in
    // both engines), so the corpus-sized input partial-aggregates map-side
    // down to O(buckets) rows; the share-of-total window then runs over
    // that bucket table (12 rows here, always O(buckets) — the single
    // unpartitioned window is over post-aggregation data, never the
    // corpus). At 100 TB this is the "one cheap pass" shape the reference
    // rejected percentiles over — a histogram costs a scan plus a
    // bucket-count shuffle.
    QueryDef("q78_histogram",
      (s, d) =>
        t(s, d, "orders")
          .select(floor(col("o_totalprice") / BucketWidth.toDouble)
            .cast(IntegerType).as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"))
          .select(col("bucket"),
            (col("bucket").cast(LongType) * BucketWidth).as("lo"),
            ((col("bucket").cast(LongType) + 1) * BucketWidth).as("hi"),
            col("n"),
            r4(col("n").cast(DoubleType)
              / sum(col("n")).over(Window.partitionBy())).as("share"))
          .orderBy("bucket"),
      Some(s"""WITH b AS (SELECT CAST(FLOOR(o_totalprice / ${BucketWidth}.0) AS INT)
             |    AS bucket FROM orders),
             |h AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket)
             |SELECT bucket,
             |  CAST(bucket AS BIGINT) * $BucketWidth AS lo,
             |  (CAST(bucket AS BIGINT) + 1) * $BucketWidth AS hi,
             |  n,
             |  CAST(ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 4) AS DOUBLE)
             |    AS share
             |FROM h ORDER BY bucket""".stripMargin)),

    // Q79 per-source document cap (RefinedWeb-style domain budget) ----------
    // Keep at most DomainCap docs per source, ranked by quality (here:
    // n_chars DESC with doc_id tiebreak — deterministic total order within
    // every source). The window partitions on source, so work parallelizes
    // across sources; the scale caveat is a single mega-source (one
    // partition's window funnels through one task). For that regime the
    // bounded alternative is a per-partition top-K aggregator merged
    // treewise (exactly q16's TakeOrdered shape, memory O(K) per source) —
    // at K=20 the window form is simpler and the skew term only bites when
    // one domain IS the corpus.
    QueryDef("q79_domain_cap",
      (s, d) =>
        t(s, d, "documents")
          .withColumn("rk", row_number().over(
            Window.partitionBy("source")
              .orderBy(col("n_chars").desc, col("doc_id"))))
          .filter(col("rk") <= DomainCap)
          .select(col("source"), col("rk").cast(IntegerType).as("rk"),
            col("doc_id"), col("n_chars"))
          .orderBy("source", "rk"),
      Some(s"""WITH r AS (SELECT source, doc_id, n_chars,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id) AS rk
             |  FROM documents)
             |SELECT source, CAST(rk AS INT) AS rk, doc_id, n_chars
             |FROM r WHERE rk <= $DomainCap
             |ORDER BY source, rk""".stripMargin))
  )
}
