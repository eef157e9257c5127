package graft.queries

import graft.QueryDef
import graft.Q._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling, reshaping and maintenance operators (round 8):
  * PIVOT/UNPIVOT (the wide-long reshape pair every reporting layer needs),
  * fixed-width histogram profiling (the data-distribution audit the
  * reference skipped as too expensive at `czi_to_zarr.py:477-481` —
  * affordable as a partial-agg pass), the SCD type-2 dimension merge
  * (MERGE INTO semantics over vanilla Spark), the Deequ-style
  * data-validation gate, and the RefinedWeb-style per-source document cap
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

    // Q82 SCD type-2 dimension merge ----------------------------------------
    // MERGE INTO semantics over vanilla Spark (no table format required):
    // a CDC batch against the customer dimension produces slowly-changing
    // history — matched rows close their old version and open a new one,
    // unmatched source rows insert, unmatched target rows pass through.
    // The CDC batch (here: a deterministic synthetic one — %7 keys change
    // segment, %11 keys arrive as brand-new customers) is BROADCAST to
    // every branch, so the dimension itself never shuffles: at a 10^9-row
    // dimension and a 10^5-row CDC batch the whole merge is three
    // broadcast-(anti/semi)-joins and a union, one dimension scan per
    // branch and zero exchanges. Lakehouse MERGE does the same in one
    // pass; the declarative union form trades re-scan for zero
    // format-specific machinery and keeps every branch codegen'd.
    QueryDef("q82_scd2_merge",
      (s, d) => {
        val base = t(s, d, "customer")
          .select(col("c_custkey").as("key"),
            col("c_mktsegment").as("mktsegment"))
        val changes = base.filter(col("key") % 7 === 0)
          .select(col("key"), lit("PROMO").as("new_seg"))
        // insert keys offset by max(c_custkey) (a one-row broadcast), not a
        // fixed 1e6: a fixed offset collides with real keys once the
        // dimension passes ~1M rows (SF >= 7), and a collision ties the
        // full (key, version, is_current) sort key, making row order
        // engine-dependent
        val mx = graft.BroadcastBounds.bounded("scalar-agg")(
          base.agg(max(col("key")).as("mx")))
        // +1: keys start at 0, so a bare +mx offset would land key 0's
        // insert on the REAL key mx — two current rows for one business
        // key (caught by the r15 review pass)
        val inserts = base.filter(col("key") % 11 === 0)
          .crossJoin(mx)
          .select((col("key") + col("mx") + 1).as("key"),
            lit("NEWSEG").as("mktsegment"))
        val v = (n: Int) => lit(n).cast(IntegerType).as("version")
        val cur = (b: Boolean) => lit(b).as("is_current")
        val unchanged = base.join(
          graft.BroadcastBounds.bounded("cdc-batch")(changes),
          Seq("key"), "left_anti")
          .select(col("key"), col("mktsegment"), v(1), cur(true))
        val closed = base.join(
          graft.BroadcastBounds.bounded("cdc-batch")(changes.select("key")),
          Seq("key"))
          .select(col("key"), col("mktsegment"), v(1), cur(false))
        val opened = base.join(
          graft.BroadcastBounds.bounded("cdc-batch")(changes), Seq("key"))
          .select(col("key"), col("new_seg").as("mktsegment"), v(2), cur(true))
        val inserted = inserts.select(col("key"), col("mktsegment"), v(1), cur(true))
        unchanged.unionAll(closed).unionAll(opened).unionAll(inserted)
          .orderBy("key", "version", "is_current")
      },
      Some("""WITH base AS (SELECT c_custkey AS key, c_mktsegment AS mktsegment
             |    FROM customer),
             |changes AS (SELECT key, 'PROMO' AS new_seg FROM base
             |    WHERE key % 7 = 0)
             |SELECT key, mktsegment, CAST(1 AS INT) AS version,
             |    TRUE AS is_current
             |  FROM base WHERE key NOT IN (SELECT key FROM changes)
             |UNION ALL
             |SELECT b.key, b.mktsegment, CAST(1 AS INT), FALSE
             |  FROM base b JOIN changes c ON b.key = c.key
             |UNION ALL
             |SELECT b.key, c.new_seg, CAST(2 AS INT), TRUE
             |  FROM base b JOIN changes c ON b.key = c.key
             |UNION ALL
             |SELECT key + (SELECT MAX(key) FROM base) + 1, 'NEWSEG',
             |    CAST(1 AS INT), TRUE
             |  FROM base WHERE key % 11 = 0
             |ORDER BY key, version, is_current""".stripMargin)),

    // Q84 data-validation gate (expectation suite) --------------------------
    // The Deequ-style quality gate a pipeline runs before publishing a
    // snapshot: each rule is one aggregate (or one broadcast anti-join for
    // the FK rule) over the table, emitted as (rule, n_checked,
    // n_violations, pass). Every branch partial-aggregates map-side — the
    // gate costs one scan per table at any scale, and rules over the same
    // table share the scan under one union when the reader caches. A
    // violating snapshot fails loudly (pass = false rows) instead of
    // poisoning downstream training data.
    QueryDef("q84_validation_audit",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        def rule(name: String, df: org.apache.spark.sql.DataFrame,
            bad: Column): org.apache.spark.sql.DataFrame =
          df.agg(count(lit(1)).as("n_checked"),
              sum(when(bad, 1L).otherwise(0L)).as("n_violations"))
            .select(lit(name).as("rule"), col("n_checked"),
              col("n_violations"), (col("n_violations") === 0).as("pass"))
        val fkOrphans = li.select(col("l_orderkey"))
          .join(o.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        val fkRule = li.agg(count(lit(1)).as("n_checked"))
          .crossJoin(fkOrphans)
          .select(lit("lineitem_fk_orders").as("rule"), col("n_checked"),
            col("n_violations"), (col("n_violations") === 0).as("pass"))
        val dupRule = o.agg(count(lit(1)).as("n_checked"),
            (count(lit(1)) - countDistinct(col("o_orderkey")))
              .as("n_violations"))
          .select(lit("orders_pk_unique").as("rule"), col("n_checked"),
            col("n_violations"), (col("n_violations") === 0).as("pass"))
        rule("lineitem_quantity_domain", li,
            !(col("l_quantity") >= 1 && col("l_quantity") <= 50))
          .unionAll(rule("lineitem_discount_domain", li,
            !(col("l_discount") >= 0.0 && col("l_discount") <= 0.1)))
          .unionAll(rule("lineitem_shipdate_not_null", li,
            col("l_shipdate").isNull))
          .unionAll(rule("orders_totalprice_positive", o,
            !(col("o_totalprice") > 0)))
          .unionAll(dupRule)
          .unionAll(fkRule)
          .orderBy("rule")
      },
      Some("""SELECT 'lineitem_quantity_domain' AS rule,
             |    COUNT(*) AS n_checked,
             |    CAST(SUM(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
             |    SUM(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50)
             |      THEN 1 ELSE 0 END) = 0 AS pass
             |  FROM lineitem
             |UNION ALL
             |SELECT 'lineitem_discount_domain', COUNT(*),
             |    CAST(SUM(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.1)
             |      THEN 1 ELSE 0 END) AS BIGINT),
             |    SUM(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.1)
             |      THEN 1 ELSE 0 END) = 0
             |  FROM lineitem
             |UNION ALL
             |SELECT 'lineitem_shipdate_not_null', COUNT(*),
             |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) = 0
             |  FROM lineitem
             |UNION ALL
             |SELECT 'orders_totalprice_positive', COUNT(*),
             |    CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT),
             |    SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) = 0
             |  FROM orders
             |UNION ALL
             |SELECT 'orders_pk_unique', COUNT(*),
             |    COUNT(*) - COUNT(DISTINCT o_orderkey),
             |    COUNT(*) - COUNT(DISTINCT o_orderkey) = 0
             |  FROM orders
             |UNION ALL
             |SELECT 'lineitem_fk_orders',
             |    (SELECT COUNT(*) FROM lineitem),
             |    (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
             |       ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL),
             |    (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
             |       ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) = 0
             |ORDER BY rule""".stripMargin)),

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
