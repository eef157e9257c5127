package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql(...)` entry point: the engine's tables registered as
  * views and queried in plain SQL must agree with the DataFrame twins —
  * users of the reference switching over can keep writing SQL.
  */
class SqlSurfaceSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def registerViews(): Unit = {
    val spark = TestSpark.spark
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    Q.events(spark, dir).createOrReplaceTempView("events")
  }

  test("SQL text of representative queries equals the DataFrame results") {
    val spark = TestSpark.spark
    registerViews()
    val cases = Seq(
      "q03_join_revenue_by_region" ->
        s"""SELECT r_name,
           | CAST(ROUND(SUM(${Q.DISC_PRICE_SQL}), 4) AS DOUBLE) AS revenue
           |FROM lineitem
           | JOIN orders ON l_orderkey = o_orderkey
           | JOIN customer ON o_custkey = c_custkey
           | JOIN nation ON c_nationkey = n_nationkey
           | JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name ORDER BY r_name""".stripMargin,
      "q11_having" ->
        s"""SELECT event_type, COUNT(*) AS cnt, ${Q.SUM4("value")} AS sum_value
           |FROM events GROUP BY event_type HAVING COUNT(*) > 100
           |ORDER BY event_type""".stripMargin,
      "q16_topk_per_group" ->
        """SELECT * FROM (
          | SELECT c_nationkey, c_custkey, c_name, c_acctbal,
          |  ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
          |  RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
          |  DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk
          | FROM customer) t
          |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin)
    cases.foreach { case (name, sql) =>
      val viaSql = spark.sql(sql).collect().toSeq
      val viaDf = SparkEntry.queries(name)(spark, dir).collect().toSeq
      assert(viaSql == viaDf, s"$name: SQL text and DataFrame twin disagree")
    }
  }

  test("custom functions are callable from SQL after registration") {
    val spark = TestSpark.spark
    graft.functions.GraftFunctions.register(spark)
    registerViews()
    val r = spark.sql(
      """SELECT vec_id, ROUND(cosine_sim(embedding, embedding), 4) AS self_sim
        |FROM embeddings ORDER BY vec_id LIMIT 3""".stripMargin).collect()
    assert(r.forall(_.getDouble(1) == 1.0))
  }

  test("SQL scalar UDFs (CREATE FUNCTION ... RETURN) run over the views") {
    // Spark 4's declarative SQL UDFs: the body is inlined into the plan as
    // an ordinary expression tree (codegen'd, optimizer-visible) — the SQL
    // twin of q45's registered Scala UDF, without leaving Catalyst.
    val spark = TestSpark.spark
    registerViews()
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION disc_price(
                |  p DOUBLE, d DOUBLE) RETURNS DOUBLE
                |RETURN CAST(CAST(p AS DECIMAL(18,4)) *
                |  (1 - CAST(d AS DECIMAL(9,4))) AS DOUBLE)""".stripMargin)
    val viaUdf = spark.sql(
      """SELECT CAST(ROUND(SUM(CAST(disc_price(l_extendedprice, l_discount)
        |  AS DECIMAL(18,4))), 4) AS DOUBLE) AS rev
        |FROM lineitem""".stripMargin).collect().head.getDouble(0)
    val direct = spark.sql(
      s"""SELECT CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
         |  (1 - CAST(l_discount AS DECIMAL(9,4))) AS DECIMAL(18,4))), 4)
         |  AS DOUBLE) AS rev
         |FROM lineitem""".stripMargin).collect().head.getDouble(0)
    assert(viaUdf == direct && viaUdf > 0.0)
  }

  test("q93: recursive CTE rollup matches a driver-side tree walk") {
    val spark = TestSpark.spark
    val out = SparkEntry.queries("q93_recursive_hierarchy")(spark, dir)
      .collect().map(r => r.getAs[Int]("depth") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("root_checksum"))).toMap
    // driver twin: walk parent = p div 8 up to a root (< 8)
    val keys = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey").collect().map(_.getLong(0))
    val keySet = keys.toSet
    def rootAndDepth(p: Long): Option[(Long, Int)] = {
      var cur = p; var d = 0
      while (cur >= 8) {
        cur = cur / 8; d += 1
        // a missing intermediate breaks the chain: the CTE never reaches p
        if (!keySet.contains(cur)) return None
      }
      Some((cur, d))
    }
    val twin = keys.flatMap(rootAndDepth).groupBy(_._2)
      .view.mapValues(g => (g.length.toLong, g.map(_._1).sum)).toMap
    assert(out == twin, s"recursive rollup != driver walk:\n$out\nvs\n$twin")
    // every level is the 8-ary frontier of the previous one (forest law)
    assert(out.keys.toSeq.sorted == (0 until out.size),
      "depths must be contiguous from 0")
  }
}
