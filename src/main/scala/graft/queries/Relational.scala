package graft.queries

import graft.{Q, QueryDef}
import graft.Q._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The relational surface declared in SURVEY.md section 2B (Q01-Q29).
  *
  * Every query is written Spark-first with the DataFrame API (Catalyst owns
  * pushdown, pruning, join selection); the paired oracle SQL states the same
  * semantics for DuckDB. All outputs are deterministically ordered and all
  * double aggregates are decimal-cast + ROUND(4) (see [[graft.Q]]).
  */
object Relational {

  /** lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with disc_price.
    * nation/region (and customer at small SF) are broadcast-able dims;
    * Catalyst picks BHJ via size estimation — q04 asserts it explicitly.
    */
  private def revenueJoin(s: SparkSession, d: String, forceBroadcast: Boolean): DataFrame = {
    val li = t(s, d, "lineitem").select(col("l_orderkey"), discPrice.as("disc_price"))
    val o = t(s, d, "orders").select("o_orderkey", "o_custkey")
    val c = t(s, d, "customer").select("c_custkey", "c_nationkey")
    val n0 = t(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey")
    val r0 = t(s, d, "region").select("r_regionkey", "r_name")
    val bb = graft.BroadcastBounds.bounded("enumerated-dim") _
    val (n, r) = if (forceBroadcast) (bb(n0), bb(r0)) else (n0, r0)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
  }

  private val REVENUE_JOIN_SQL =
    s"""FROM lineitem
       | JOIN orders ON l_orderkey = o_orderkey
       | JOIN customer ON o_custkey = c_custkey
       | JOIN nation ON c_nationkey = n_nationkey
       | JOIN region ON n_regionkey = r_regionkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Q01 scan + pushed filter + projection ------------------------------
    QueryDef("q01_scan_filter_project",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") < tsn("1998-09-01")
            && col("l_discount").between(0.02, 0.09)
            && col("l_quantity") < 24)
          .select(col("l_orderkey"), col("l_linenumber"),
            discPrice.cast(DoubleType).as("disc_price"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber,
              | CAST($DISC_PRICE_SQL AS DOUBLE) AS disc_price
              |FROM lineitem
              |WHERE l_shipdate < TIMESTAMP '1998-09-01'
              | AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 24
              |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Q02 hash aggregate (TPC-H Q1 shape) --------------------------------
    QueryDef("q02_agg_pricing_summary",
      (s, d) => {
        val charge = round(discPrice * (lit(1) + dec9(col("l_tax"))), 4)
          .cast(DecimalType(18, 4))
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= tsn("2001-09-01"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum4(col("l_quantity")).as("sum_qty"),
            sum4(col("l_extendedprice")).as("sum_base_price"),
            r4(sum(discPrice)).as("sum_disc_price"),
            r4(sum(charge)).as("sum_charge"),
            avg4(col("l_quantity")).as("avg_qty"),
            avg4(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              | ${SUM4("l_quantity")} AS sum_qty,
              | ${SUM4("l_extendedprice")} AS sum_base_price,
              | CAST(ROUND(SUM($DISC_PRICE_SQL), 4) AS DOUBLE) AS sum_disc_price,
              | CAST(ROUND(SUM(CAST(ROUND($DISC_PRICE_SQL * (1 + CAST(l_tax AS DECIMAL(9,4))), 4) AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_charge,
              | ${AVG4("l_quantity")} AS avg_qty,
              | ${AVG4("l_extendedprice")} AS avg_price,
              | COUNT(*) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Q03 multi-way inner equi-join --------------------------------------
    QueryDef("q03_join_revenue_by_region",
      (s, d) =>
        revenueJoin(s, d, forceBroadcast = false)
          .groupBy("r_name")
          .agg(r4(sum(col("disc_price"))).as("revenue"))
          .orderBy("r_name"),
      Some(s"""SELECT r_name,
              | CAST(ROUND(SUM($DISC_PRICE_SQL), 4) AS DOUBLE) AS revenue
              |$REVENUE_JOIN_SQL
              |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // Q04 broadcast join (same result; plan asserted in tests) -----------
    QueryDef("q04_broadcast_join",
      (s, d) =>
        revenueJoin(s, d, forceBroadcast = true)
          .groupBy("r_name", "n_name")
          .agg(r4(sum(col("disc_price"))).as("revenue"))
          .orderBy("r_name", "n_name"),
      Some(s"""SELECT r_name, n_name,
              | CAST(ROUND(SUM($DISC_PRICE_SQL), 4) AS DOUBLE) AS revenue
              |$REVENUE_JOIN_SQL
              |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // Q05 left outer join + aggregate ------------------------------------
    QueryDef("q05_left_outer_join",
      (s, d) => {
        val c = t(s, d, "customer").select("c_custkey", "c_name")
        val o = t(s, d, "orders").select("o_custkey", "o_orderkey")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey", "c_name")
          .agg(count(col("o_orderkey")).as("order_count"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_count
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin)),

    // Q06 left semi join (EXISTS) ----------------------------------------
    QueryDef("q06_semi_join",
      (s, d) => {
        val c = t(s, d, "customer").select("c_custkey", "c_name")
        val f = t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select("o_custkey")
        c.join(f, col("c_custkey") === col("o_custkey"), "left_semi")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)),

    // Q07 left anti join (NOT EXISTS) ------------------------------------
    QueryDef("q07_anti_join",
      (s, d) => {
        val c = t(s, d, "customer").select("c_custkey", "c_name")
        val o = t(s, d, "orders").select("o_custkey")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // Q08 full outer join -------------------------------------------------
    QueryDef("q08_full_outer_join",
      (s, d) => {
        val cc = t(s, d, "customer").groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("customers"))
        val sc = t(s, d, "supplier").groupBy(col("s_nationkey").as("snk"))
          .agg(count(lit(1)).as("suppliers"))
        cc.join(sc, col("nk") === col("snk"), "full_outer")
          .select(coalesce(col("nk"), col("snk")).as("nationkey"),
            coalesce(col("customers"), lit(0L)).as("customers"),
            coalesce(col("suppliers"), lit(0L)).as("suppliers"))
          .orderBy("nationkey")
      },
      Some("""WITH cc AS (SELECT c_nationkey AS nk, COUNT(*) AS customers
             |            FROM customer GROUP BY c_nationkey),
             |     sc AS (SELECT s_nationkey AS snk, COUNT(*) AS suppliers
             |            FROM supplier GROUP BY s_nationkey)
             |SELECT COALESCE(nk, snk) AS nationkey,
             |       COALESCE(customers, 0) AS customers,
             |       COALESCE(suppliers, 0) AS suppliers
             |FROM cc FULL OUTER JOIN sc ON nk = snk
             |ORDER BY nationkey""".stripMargin)),

    // Q09 range (theta) join ----------------------------------------------
    QueryDef("q09_range_join",
      (s, d) => {
        val e = events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("ts").as("cts"))
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts").as("pts"))
        clicks.join(purch,
            col("cu") === col("pu")
              && col("pts") > col("cts")
              && col("pts") <= col("cts") + expr("INTERVAL '1' HOUR"))
          .groupBy(col("cu").as("user_id"))
          .agg(count(lit(1)).as("pair_count"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS ($EVENTS_SQL)
              |SELECT c.user_id AS user_id, COUNT(*) AS pair_count
              |FROM e c JOIN e p ON c.user_id = p.user_id
              | AND c.event_type = 'click' AND p.event_type = 'purchase'
              | AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
              |GROUP BY c.user_id ORDER BY user_id""".stripMargin)),

    // Q73 binned range join — the NO-equi-key range join (r7) --------------
    // q09 has user_id equality to hash on; drop it and Catalyst's only
    // plan is BroadcastNestedLoopJoin, O(clicks x purchases) — the
    // canonical scale killer. graft.operators.RangeJoin rewrites the
    // inequality join through fixed-width time bins (interval side
    // replicates to the <=2 hour-bins its 1h span touches, point side
    // keys to its one bin, equi-join on bin + residual filter — exact, no
    // dedup needed). RangeJoinSpec proves pair-set equality with the
    // naive join and asserts the plan shapes (naive = BNLJ, binned = no
    // BNLJ anywhere). The DuckDB oracle runs the naive form — engine
    // parity across DIFFERENT algorithms pins the rewrite's correctness
    // at corpus scale too.
    QueryDef("q73_range_join_binned",
      (s, d) => {
        val e = events(s, d)
        // NTZ -> epoch seconds: session TZ is UTC everywhere (Verify/
        // Bench/tests), so the NTZ->TIMESTAMP hop is the identity and
        // matches DuckDB's epoch(naive-timestamp) convention
        val secs = expr("unix_seconds(CAST(ts AS TIMESTAMP))")
        val clicks = e.filter(col("event_type") === "click")
          .select(secs.as("cts"))
          .withColumn("chi", col("cts") + 3600L)
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event"), secs.as("pts"))
        graft.operators.RangeJoin
          .binned(purch, clicks, col("pts"), col("cts"), col("chi"), 3600L)
          .groupBy(expr("pts div 3600").as("hour_bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("p_event")).as("n_purchases"))
          .orderBy("hour_bucket")
      },
      Some(s"""WITH e AS ($EVENTS_SQL),
              |c AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS cts FROM e
              |      WHERE event_type = 'click'),
              |p AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS pts
              |      FROM e WHERE event_type = 'purchase')
              |SELECT pts // 3600 AS hour_bucket,
              |  COUNT(*) AS n_pairs,
              |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_purchases
              |FROM p JOIN c ON pts > cts AND pts <= cts + 3600
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Q10 as-of join (windowed running-max formulation) -------------------
    QueryDef("q10_asof_join",
      (s, d) => {
        val e = events(s, d)
          .filter(col("event_type").isin("view", "purchase"))
          .withColumn("kind", when(col("event_type") === "view", 0).otherwise(1))
        // views sort before purchases at equal ts so v.ts <= p.ts holds
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("kind"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        e.withColumn("last_view_ts", max(when(col("kind") === 0, col("ts"))).over(w))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("user_id"), col("ts"), col("last_view_ts"))
          .orderBy("event_id")
      },
      Some(s"""WITH e AS ($EVENTS_SQL)
              |SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS ts,
              | (SELECT MAX(v.ts) FROM e v
              |  WHERE v.user_id = p.user_id AND v.ts <= p.ts
              |    AND v.event_type = 'view') AS last_view_ts
              |FROM e p WHERE p.event_type = 'purchase'
              |ORDER BY event_id""".stripMargin)),

    // Q11 aggregate + HAVING ----------------------------------------------
    QueryDef("q11_having",
      (s, d) =>
        events(s, d)
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"), sum4(col("value")).as("sum_value"))
          .filter(col("cnt") > 100)
          .orderBy("event_type"),
      Some(s"""SELECT event_type, COUNT(*) AS cnt, ${SUM4("value")} AS sum_value
              |FROM events GROUP BY event_type HAVING COUNT(*) > 100
              |ORDER BY event_type""".stripMargin)),

    // Q12 distinct aggregates ---------------------------------------------
    QueryDef("q12_distinct_agg",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(countDistinct(col("l_suppkey")).as("distinct_suppliers"),
            countDistinct(col("l_partkey")).as("distinct_parts"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
             | COUNT(DISTINCT l_partkey) AS distinct_parts
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef("q12b_distinct_users",
      (s, d) =>
        events(s, d).agg(countDistinct(col("user_id")).as("distinct_users")),
      Some("SELECT COUNT(DISTINCT user_id) AS distinct_users FROM events")),

    // Q13 ROLLUP -----------------------------------------------------------
    QueryDef("q13_rollup",
      (s, d) =>
        // ROLLUP(r_name, n_name) expressed as its grouping-set expansion;
        // Dataset.rollup(String*) trips a spurious ambiguous-self-join check
        // against the join lineage in Spark 4.1, groupingSets does not.
        revenueJoin(s, d, forceBroadcast = false)
          .groupingSets(
            Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq.empty),
            col("r_name"), col("n_name"))
          .agg(r4(sum(col("disc_price"))).as("revenue"),
            grouping(col("r_name")).cast(IntegerType).as("g_r"),
            grouping(col("n_name")).cast(IntegerType).as("g_n"))
          .orderBy(col("g_r"), col("g_n"),
            col("r_name").asc_nulls_first, col("n_name").asc_nulls_first),
      Some(s"""SELECT r_name, n_name,
              | CAST(ROUND(SUM($DISC_PRICE_SQL), 4) AS DOUBLE) AS revenue,
              | CAST(GROUPING(r_name) AS INT) AS g_r,
              | CAST(GROUPING(n_name) AS INT) AS g_n
              |$REVENUE_JOIN_SQL
              |GROUP BY ROLLUP (r_name, n_name)
              |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)),

    // Q14 CUBE -------------------------------------------------------------
    QueryDef("q14_cube",
      (s, d) =>
        t(s, d, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(sum4(col("l_quantity")).as("sum_qty"),
            grouping(col("l_returnflag")).cast(IntegerType).as("g_rf"),
            grouping(col("l_linestatus")).cast(IntegerType).as("g_ls"))
          .orderBy(col("g_rf"), col("g_ls"),
            col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some(s"""SELECT l_returnflag, l_linestatus, ${SUM4("l_quantity")} AS sum_qty,
              | CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
              | CAST(GROUPING(l_linestatus) AS INT) AS g_ls
              |FROM lineitem
              |GROUP BY CUBE (l_returnflag, l_linestatus)
              |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // Q15 GROUPING SETS ----------------------------------------------------
    QueryDef("q15_grouping_sets",
      (s, d) =>
        revenueJoin(s, d, forceBroadcast = false)
          .groupingSets(Seq(Seq(col("r_name")), Seq(col("n_name")), Seq.empty),
            col("r_name"), col("n_name"))
          .agg(r4(sum(col("disc_price"))).as("revenue"),
            grouping(col("r_name")).cast(IntegerType).as("g_r"),
            grouping(col("n_name")).cast(IntegerType).as("g_n"))
          .orderBy(col("g_r"), col("g_n"),
            col("r_name").asc_nulls_first, col("n_name").asc_nulls_first),
      Some(s"""SELECT r_name, n_name,
              | CAST(ROUND(SUM($DISC_PRICE_SQL), 4) AS DOUBLE) AS revenue,
              | CAST(GROUPING(r_name) AS INT) AS g_r,
              | CAST(GROUPING(n_name) AS INT) AS g_n
              |$REVENUE_JOIN_SQL
              |GROUP BY GROUPING SETS ((r_name), (n_name), ())
              |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)),

    // Q16 ranking window + top-k per group --------------------------------
    QueryDef("q16_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, d, "customer")
          .select(col("c_nationkey"), col("c_custkey"), col("c_name"), col("c_acctbal"))
          .withColumn("rn", row_number().over(w).cast(LongType))
          .withColumn("rnk", rank().over(w).cast(LongType))
          .withColumn("drnk", dense_rank().over(w).cast(LongType))
          .filter(col("rn") <= 3)
          .orderBy("c_nationkey", "rn")
      },
      Some("""SELECT * FROM (
             | SELECT c_nationkey, c_custkey, c_name, c_acctbal,
             |  ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
             |  RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
             |  DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk
             | FROM customer) t
             |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin)),

    // Q17 lag / lead -------------------------------------------------------
    QueryDef("q17_lag_lead",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
          .withColumn("delta_prev",
            r4(dec18(col("o_totalprice")) - dec18(lag(col("o_totalprice"), 1).over(w))))
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             | LAG(o_totalprice) OVER w AS prev_price,
             | LEAD(o_totalprice) OVER w AS next_price,
             | CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4))
             |   - CAST(LAG(o_totalprice) OVER w AS DECIMAL(18,4)), 4) AS DOUBLE) AS delta_prev
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // Q18 ROWS frame -------------------------------------------------------
    QueryDef("q18_rows_frame",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-2, Window.currentRow)
        events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .withColumn("rolling_sum", r4(sum(dec18(col("value"))).over(w)))
          .orderBy("user_id", "ts", "event_id")
      },
      Some(s"""WITH e AS ($EVENTS_SQL)
              |SELECT event_id, user_id, ts, value,
              | CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER (
              |   PARTITION BY user_id ORDER BY ts, event_id
              |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS rolling_sum
              |FROM e ORDER BY user_id, ts, event_id""".stripMargin)),

    // Q19 cumulative window ------------------------------------------------
    QueryDef("q19_cumulative",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
          .withColumn("running_count", count(lit(1)).over(w))
          .withColumn("running_sum", r4(sum(dec18(col("o_totalprice"))).over(w)))
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             | COUNT(*) OVER w AS running_count,
             | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w, 4) AS DOUBLE) AS running_sum
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // Q20 sort + limit (top-k) --------------------------------------------
    QueryDef("q20_topk",
      (s, d) =>
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // Q21 set operations ---------------------------------------------------
    QueryDef("q21_set_ops",
      (s, d) => {
        val f = t(s, d, "orders").filter(col("o_orderstatus") === "F").select("o_custkey")
        val o = t(s, d, "orders").filter(col("o_orderstatus") === "O").select("o_custkey")
        def cnt(df: DataFrame, tag: String) =
          df.agg(count(lit(1)).as("cnt")).select(lit(tag).as("op"), col("cnt"))
        cnt(f.intersect(o), "intersect")
          .unionAll(cnt(f.except(o), "except_fo"))
          .unionAll(cnt(o.except(f), "except_of"))
          .unionAll(cnt(f.union(o).distinct(), "union"))
          .unionAll(cnt(f.union(o), "union_all"))
          .orderBy("op")
      },
      Some("""WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
             |     o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
             |SELECT 'intersect' AS op, COUNT(*) AS cnt FROM (SELECT * FROM f INTERSECT SELECT * FROM o) t1
             |UNION ALL
             |SELECT 'except_fo', COUNT(*) FROM (SELECT * FROM f EXCEPT SELECT * FROM o) t2
             |UNION ALL
             |SELECT 'except_of', COUNT(*) FROM (SELECT * FROM o EXCEPT SELECT * FROM f) t3
             |UNION ALL
             |SELECT 'union', COUNT(*) FROM (SELECT * FROM f UNION SELECT * FROM o) t4
             |UNION ALL
             |SELECT 'union_all', COUNT(*) FROM (SELECT * FROM f UNION ALL SELECT * FROM o) t5
             |ORDER BY op""".stripMargin)),

    // Q22 string functions -------------------------------------------------
    QueryDef("q22_string_funcs",
      (s, d) =>
        t(s, d, "part").select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          lower(col("p_brand")).as("low_brand"),
          length(col("p_name")).cast(IntegerType).as("name_len"),
          substring(col("p_name"), 1, 5).as("name_pre"),
          trim(col("p_name")).as("trimmed"),
          regexp_replace(col("p_type"), lit(" "), lit("_")).as("type_u"),
          concat(col("p_brand"), lit("#"), col("p_name")).as("brand_name"),
          col("p_name").like("%al%").as("has_al"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, UPPER(p_name) AS up_name, LOWER(p_brand) AS low_brand,
             | CAST(LENGTH(p_name) AS INT) AS name_len, SUBSTRING(p_name, 1, 5) AS name_pre,
             | TRIM(p_name) AS trimmed, REPLACE(p_type, ' ', '_') AS type_u,
             | CONCAT(p_brand, '#', p_name) AS brand_name,
             | p_name LIKE '%al%' AS has_al,
             | REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Q23 date/time functions ---------------------------------------------
    QueryDef("q23_date_funcs",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("month_start"))
          .agg(sum4(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"))
          .select(col("month_start"),
            year(col("month_start")).cast(IntegerType).as("order_year"),
            month(col("month_start")).cast(IntegerType).as("order_month"),
            col("revenue"), col("n_orders"))
          .orderBy("month_start"),
      Some(s"""SELECT DATE_TRUNC('month', o_orderdate) AS month_start,
              | CAST(EXTRACT(YEAR FROM DATE_TRUNC('month', o_orderdate)) AS INT) AS order_year,
              | CAST(EXTRACT(MONTH FROM DATE_TRUNC('month', o_orderdate)) AS INT) AS order_month,
              | ${SUM4("o_totalprice")} AS revenue, COUNT(*) AS n_orders
              |FROM orders GROUP BY DATE_TRUNC('month', o_orderdate)
              |ORDER BY month_start""".stripMargin)),

    // Q24 math functions ---------------------------------------------------
    QueryDef("q24_math_funcs",
      (s, d) =>
        t(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          abs(dec18(col("l_quantity"))).cast(DoubleType).as("abs_qty"),
          ceil(dec18(col("l_extendedprice"))).cast(DoubleType).as("ceil_price"),
          floor(dec18(col("l_extendedprice"))).cast(DoubleType).as("floor_price"),
          round(dec18(col("l_extendedprice")), 2).cast(DoubleType).as("round_price"),
          r4(pow(col("l_quantity"), 2)).as("pow_qty"),
          r4(sqrt(col("l_extendedprice"))).as("sqrt_price"),
          r4(log(col("l_extendedprice"))).as("ln_price"),
          r4(log10(col("l_extendedprice"))).as("log10_price"),
          // FLOOR pins the double->int semantics: Spark CAST truncates but
          // DuckDB CAST rounds half-to-even — divergent on non-integral qty
          (floor(col("l_quantity")).cast(IntegerType) % 7).cast(IntegerType).as("mod_qty"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             | CAST(ABS(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS abs_qty,
             | CAST(CEIL(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS ceil_price,
             | CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS floor_price,
             | CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS round_price,
             | CAST(ROUND(POWER(l_quantity, 2), 4) AS DOUBLE) AS pow_qty,
             | CAST(ROUND(SQRT(l_extendedprice), 4) AS DOUBLE) AS sqrt_price,
             | CAST(ROUND(LN(l_extendedprice), 4) AS DOUBLE) AS ln_price,
             | CAST(ROUND(LOG10(l_extendedprice), 4) AS DOUBLE) AS log10_price,
             | CAST(CAST(FLOOR(l_quantity) AS INT) % 7 AS INT) AS mod_qty
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Q25 array functions --------------------------------------------------
    QueryDef("q25_array_funcs",
      (s, d) =>
        t(s, d, "embeddings").select(
          col("vec_id"),
          size(col("embedding")).cast(IntegerType).as("dim"),
          element_at(col("embedding"), 1).cast(DoubleType).as("first_val"),
          r4(sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))).as("l2_norm"))
          .orderBy("vec_id"),
      Some("""SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
             | CAST(embedding[1] AS DOUBLE) AS first_val,
             | CAST(ROUND(SQRT(list_sum(list_transform(embedding,
             |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS DOUBLE) AS l2_norm
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // Q26 JSON extraction --------------------------------------------------
    QueryDef("q26_json_extract",
      (s, d) =>
        events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
          .groupBy("event_type")
          .agg(count(col("k")).as("cnt_k"),
            r4(sum(col("k")).cast(DoubleType) / count(col("k"))).as("avg_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(k) AS cnt_k,
             | CAST(ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(k), 4) AS DOUBLE) AS avg_k
             |FROM (SELECT event_type,
             |   CAST(NULLIF(REGEXP_EXTRACT(props, '"k":\s*(-?\d+)', 1), '') AS INT) AS k
             |  FROM events) t
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Q27 tumbling event-time window (batch) ------------------------------
    QueryDef("q27_tumbling_window",
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), sum4(col("value")).as("sum_value"))
          .select(col("window.start").as("hour_start"), col("event_type"),
            col("cnt"), col("sum_value"))
          .orderBy("hour_start", "event_type"),
      Some(s"""WITH e AS ($EVENTS_SQL)
              |SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
              | COUNT(*) AS cnt, ${SUM4("value")} AS sum_value
              |FROM e GROUP BY DATE_TRUNC('hour', ts), event_type
              |ORDER BY hour_start, event_type""".stripMargin)),

    // Q28 sliding window ---------------------------------------------------
    QueryDef("q28_sliding_window",
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("window.start").as("window_start"), col("cnt"))
          .orderBy("window_start"),
      Some(s"""WITH e AS ($EVENTS_SQL),
              |g AS (SELECT DATE_TRUNC('hour', ts)
              |  + CASE WHEN EXTRACT(MINUTE FROM ts) >= 30
              |      THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS w1 FROM e),
              |x AS (SELECT w1 AS window_start FROM g
              |      UNION ALL SELECT w1 - INTERVAL 30 MINUTE FROM g)
              |SELECT window_start, COUNT(*) AS cnt FROM x
              |GROUP BY window_start ORDER BY window_start""".stripMargin)),

    // Q29 session windows (gaps and islands) ------------------------------
    QueryDef("q29_sessions",
      (s, d) => {
        val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("prev_ts", lag(col("ts"), 1).over(ord))
          .withColumn("new_s",
            when(col("prev_ts").isNull
              || col("ts") >= col("prev_ts") + expr("INTERVAL '30' MINUTE"), 1)
              .otherwise(0))
          .withColumn("session_id", sum(col("new_s")).over(run))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"))
        sess.groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            r4(sum(col("n_events")).cast(DoubleType) / count(lit(1))).as("avg_session_events"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS ($EVENTS_SQL),
              |l AS (SELECT user_id, ts, event_id,
              |  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e),
              |f AS (SELECT user_id, ts, event_id,
              |  CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL 30 MINUTE
              |    THEN 1 ELSE 0 END AS new_s FROM l),
              |sids AS (SELECT user_id, event_id,
              |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM f),
              |c AS (SELECT user_id, session_id, COUNT(*) AS n_events
              |      FROM sids GROUP BY user_id, session_id)
              |SELECT user_id, COUNT(*) AS n_sessions,
              | CAST(ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_session_events
              |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q89 distribution window functions (r8) --------------------------------
    // The remaining ranking-window surface beyond q16's rank trio:
    // NTILE (equi-depth binning), PERCENT_RANK and CUME_DIST, all inside
    // per-status partitions — ntile is inherently a total order over its
    // partition, so the partition key (not an unpartitioned window) is
    // what keeps it off the single-task path at scale; for corpus-global
    // equi-depth bins the scale tool is approx-percentile cutpoints
    // (q44b), not a global window. Deciles summarized per (status,
    // decile) with exact bounds; (price, orderkey) total order makes the
    // tile assignment deterministic.
    QueryDef("q89_distribution_windows",
      (s, d) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
          .withColumn("decile", ntile(10).over(w))
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .groupBy(col("o_orderstatus"), col("decile").cast(IntegerType).as("decile"))
          .agg(count(lit(1)).as("n"),
            r4(min(col("o_totalprice"))).as("lo_price"),
            r4(max(col("o_totalprice"))).as("hi_price"),
            f4(max(col("pr"))).as("max_pr"),
            f4(max(col("cd"))).as("max_cd"))
          .orderBy("o_orderstatus", "decile")
      },
      Some("""WITH r AS (SELECT o_orderstatus, o_totalprice,
             |    NTILE(10) OVER w AS decile,
             |    PERCENT_RANK() OVER w AS pr,
             |    CUME_DIST() OVER w AS cd
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderstatus
             |               ORDER BY o_totalprice, o_orderkey))
             |SELECT o_orderstatus, CAST(decile AS INT) AS decile, COUNT(*) AS n,
             |  CAST(ROUND(MIN(o_totalprice), 4) AS DOUBLE) AS lo_price,
             |  CAST(ROUND(MAX(o_totalprice), 4) AS DOUBLE) AS hi_price,
             |  CAST(FLOOR((MAX(pr)) * 10000 + 0.5) / 10000.0 AS DOUBLE) AS max_pr,
             |  CAST(FLOOR((MAX(cd)) * 10000 + 0.5) / 10000.0 AS DOUBLE) AS max_cd
             |FROM r GROUP BY o_orderstatus, decile
             |ORDER BY o_orderstatus, decile""".stripMargin)),

    // Q87 LATERAL join (r8) -------------------------------------------------
    // The correlated-subquery-in-FROM surface: per customer, its top-2
    // orders by price — a correlated ORDER BY + LIMIT the optimizer must
    // DECORRELATE (Catalyst rewrites the lateral into a ranked window
    // join; DuckDB runs its own lateral decorrelation) rather than
    // re-execute per outer row. Same result as q16's window form, but it
    // exercises the planner path q16 does not: a per-outer-row subquery
    // that would be O(customers x orders-scan) if executed naively is one
    // shuffle after decorrelation — the difference between a plan that
    // survives 100 TB and one that does not. Customers with no orders
    // drop (inner lateral), keeping the output deterministic.
    QueryDef("q87_lateral_topk",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("q87_customer")
        t(s, d, "orders").createOrReplaceTempView("q87_orders")
        s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
                |FROM q87_customer c,
                |LATERAL (SELECT o_orderkey, o_totalprice FROM q87_orders o
                |         WHERE o.o_custkey = c.c_custkey
                |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
                |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
      },
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
             |FROM customer c,
             |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             |         WHERE o.o_custkey = c.c_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
             |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)),

    // Q93 recursive CTE: hierarchical rollup ------------------------------
    // The hierarchical-query class (org charts, BOM explosion, thread
    // trees) via Spark 4's NATIVE `WITH RECURSIVE` (UnionLoopExec): a
    // deterministic forest is derived over part (parent = p_partkey div 8,
    // roots < 8), walked from the roots, and rolled up per depth. Each
    // recursion level is one keyed join against the previous frontier —
    // the same per-level dataflow q51 hand-builds; the engine's loop
    // replaces the hand-rolled driver iteration for moderate-depth
    // hierarchies (depth here is log_8(n): 6 levels at 10^9 parts,
    // frontier-sized intermediate rows, never the closure). For
    // million-round graph closures q51's delta iteration with
    // checkpoints remains the scale path — this is the SQL-surface
    // operator, not a replacement. DuckDB runs the identical ANSI text
    // (modulo `div` vs `//`), so the oracle is cross-engine recursion
    // parity, like q87's cross-planner lateral check.
    QueryDef("q93_recursive_hierarchy",
      (s, d) => {
        t(s, d, "part").createOrReplaceTempView("q93_part")
        s.sql("""WITH RECURSIVE h AS (
                |  SELECT p_partkey, CAST(p_partkey AS BIGINT) AS root,
                |         0 AS depth, CAST(p_retailprice AS DECIMAL(18,4)) AS price
                |  FROM q93_part WHERE p_partkey < 8
                |  UNION ALL
                |  SELECT c.p_partkey, h.root, h.depth + 1,
                |         CAST(c.p_retailprice AS DECIMAL(18,4))
                |  FROM q93_part c JOIN h
                |    ON c.p_partkey div 8 = h.p_partkey AND c.p_partkey >= 8
                |)
                |SELECT depth, COUNT(*) AS n_parts,
                |  CAST(SUM(root) AS BIGINT) AS root_checksum,
                |  CAST(ROUND(SUM(price), 4) AS DOUBLE) AS total_price
                |FROM h GROUP BY depth ORDER BY depth""".stripMargin)
      },
      Some("""WITH RECURSIVE h AS (
             |  SELECT p_partkey, CAST(p_partkey AS BIGINT) AS root,
             |         0 AS depth, CAST(p_retailprice AS DECIMAL(18,4)) AS price
             |  FROM part WHERE p_partkey < 8
             |  UNION ALL
             |  SELECT c.p_partkey, h.root, h.depth + 1,
             |         CAST(c.p_retailprice AS DECIMAL(18,4))
             |  FROM part c JOIN h
             |    ON c.p_partkey // 8 = h.p_partkey AND c.p_partkey >= 8
             |)
             |SELECT depth, COUNT(*) AS n_parts,
             |  CAST(SUM(root) AS BIGINT) AS root_checksum,
             |  CAST(ROUND(SUM(price), 4) AS DOUBLE) AS total_price
             |FROM h GROUP BY depth ORDER BY depth""".stripMargin)),

    // Q95 VARIANT shredding (semi-structured ingestion) -------------------
    // Spark 4's native VARIANT type over RAGGED JSON — the schema-on-read
    // path for semi-structured ingestion. Odd orderkeys carry an
    // `order.discount` field, even ones omit it entirely; `parse_json`
    // shreds each document into the binary VARIANT encoding once at the
    // scan, and typed `variant_get` paths pull fields out WITHOUT a
    // fixed struct schema (the `from_json`-with-schema alternative
    // can't express "field sometimes absent" this cheaply — absent paths
    // are just NULL). At 100 TB this is the right ingestion shape:
    // VARIANT decode + path extraction are per-row codegen'd expressions
    // (no UDF, no regex over strings), and the downstream agg is an
    // ordinary partial-agg groupBy on a 5-value key. The oracle computes
    // the same answer straight from the base columns, making the check a
    // JSON-roundtrip identity: construct → shred → extract must lose
    // nothing. Net revenue uses the discPrice exact-decimal mechanism.
    QueryDef("q95_variant_shred",
      (s, d) => {
        val o = t(s, d, "orders")
        val meta = struct(col("o_orderpriority").as("priority"),
          col("o_orderstatus").as("status"))
        val js = o.withColumn("js",
          when(col("o_orderkey") % 2 === 1,
            to_json(struct(
              struct(col("o_orderkey").as("id"),
                col("o_totalprice").as("price"),
                ((col("o_orderkey") % 10).cast(DoubleType) / lit(100.0))
                  .as("discount")).as("order"),
              meta.as("meta"))))
          .otherwise(to_json(struct(
            struct(col("o_orderkey").as("id"),
              col("o_totalprice").as("price")).as("order"),
            meta.as("meta")))))
        js.select(
            expr("variant_get(parse_json(js), '$.meta.priority', 'string')")
              .as("priority"),
            expr("variant_get(parse_json(js), '$.order.price', 'double')")
              .as("price"),
            expr("try_variant_get(parse_json(js), '$.order.discount', 'double')")
              .as("disc"))
          .groupBy("priority")
          .agg(count(lit(1)).as("n"),
            count(col("disc")).as("n_disc"),
            r4(sum(round(dec18(col("price")) *
                (lit(1) - dec9(coalesce(col("disc"), lit(0.0)))), 4)
              .cast(DecimalType(18, 4)))).as("net_revenue"))
          .orderBy("priority")
      },
      Some("""SELECT o_orderpriority AS priority, COUNT(*) AS n,
             |  CAST(COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS BIGINT)
             |    AS n_disc,
             |  CAST(ROUND(SUM(CAST(ROUND(
             |      CAST(o_totalprice AS DECIMAL(18,4)) *
             |      (1 - CAST(CASE WHEN o_orderkey % 2 = 1
             |                THEN (o_orderkey % 10) / 100.0
             |                ELSE 0.0 END AS DECIMAL(9,4))), 4)
             |    AS DECIMAL(18,4))), 4) AS DOUBLE) AS net_revenue
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
