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

  // ---- SQL MERGE INTO (r17): the statement reaches the store ----

  /** Stage a fresh store with `target` committed at v1; returns its dir. */
  private def stageStore(target: org.apache.spark.sql.DataFrame): String = {
    val spark = TestSpark.spark
    val state = java.nio.file.Files
      .createTempDirectory("graft-sqlmerge").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = graft.streaming.IngestIndex.mergeCommit(spark, state,
      Map.empty, "state", 1L, target, (_, d) => d)
    graft.streaming.IngestIndex.writeManifest(fs, state, 1L,
      Map("state" -> m1))
    state
  }

  private def stateRows(state: String): Seq[(Long, Long, BigDecimal)] = {
    val spark = TestSpark.spark
    graft.streaming.IngestIndex.currentTable(spark, state, "state")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDecimal(2)))).toSeq.sortBy(_._1)
  }

  test("spark.sql MERGE INTO == the DataFrame MergeInto on q127's " +
    "three-clause shape (delete / update / insert), via the injected " +
    "resolution rule") {
    val spark = TestSpark.spark
    val (target, source) = graft.queries.MergeOps.q127Inputs(spark, dir)
    // DataFrame path
    val dfState = stageStore(target)
    val fs = new org.apache.hadoop.fs.Path(dfState)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = graft.streaming.IngestIndex.readManifest(fs, dfState, 1L)
    val m2 = graft.streaming.IngestIndex.mergeCommit(spark, dfState, m1,
      "state", 2L, source, graft.queries.MergeOps.q127Merge)
    graft.streaming.IngestIndex.writeManifest(fs, dfState, 2L,
      Map("state" -> m2))
    // SQL path — the genuine spark.sql entry on the extensions session
    val sqlState = stageStore(target)
    graft.operators.GraftSql.registerTable("merge_sql_q127", sqlState,
      "state")
    source.createOrReplaceTempView("src127")
    val out = spark.sql(
      """MERGE INTO merge_sql_q127 AS t USING src127 AS s
        |ON t.user_id = s.user_id
        |WHEN MATCHED AND s.n_events > t.n_events THEN DELETE
        |WHEN MATCHED THEN UPDATE SET
        |  n_events = t.n_events + s.n_events,
        |  sum_value = CAST(t.sum_value + s.sum_value AS DECIMAL(18,4))
        |WHEN NOT MATCHED THEN INSERT (user_id, n_events, sum_value)
        |  VALUES (s.user_id, s.n_events, s.sum_value)
        |""".stripMargin).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L),
      "MERGE returns the committed version")
    assert(stateRows(sqlState) === stateRows(dfState),
      "SQL MERGE and DataFrame MergeInto disagree on q127")
    // the commit is tagged in DESCRIBE HISTORY
    val sfs = new org.apache.hadoop.fs.Path(sqlState)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.streaming.IngestIndex.describeHistory(sfs, sqlState)
      .find(_.version == 2L).map(_.operation) === Some("merge-sql"))
    graft.operators.GraftSql.unregisterTable("merge_sql_q127")
  }

  test("spark.sql MERGE INTO: q131's ordered clause lists round-trip " +
    "through Spark's parser — first-match-wins order preserved") {
    val spark = TestSpark.spark
    val (target, source) = graft.queries.MergeOps.q131Inputs(spark, dir)
    val dfState = stageStore(target)
    val fs = new org.apache.hadoop.fs.Path(dfState)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = graft.streaming.IngestIndex.readManifest(fs, dfState, 1L)
    val m2 = graft.streaming.IngestIndex.mergeCommit(spark, dfState, m1,
      "state", 2L, source, graft.queries.MergeOps.q131Merge)
    graft.streaming.IngestIndex.writeManifest(fs, dfState, 2L,
      Map("state" -> m2))
    val sqlState = stageStore(target)
    graft.operators.GraftSql.registerTable("merge_sql_q131", sqlState,
      "state")
    source.createOrReplaceTempView("src131")
    spark.sql(
      """MERGE INTO merge_sql_q131 AS t USING src131 AS s
        |ON t.user_id = s.user_id
        |WHEN MATCHED AND s.sum_value > t.sum_value THEN UPDATE SET
        |  n_events = s.n_events, sum_value = s.sum_value
        |WHEN MATCHED AND s.n_events < t.n_events - 4 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET
        |  n_events = t.n_events + s.n_events,
        |  sum_value = CAST(t.sum_value + s.sum_value AS DECIMAL(18,4))
        |WHEN NOT MATCHED AND s.user_id % 2 = 0 THEN INSERT *
        |WHEN NOT MATCHED THEN INSERT (user_id, n_events, sum_value)
        |  VALUES (s.user_id, s.n_events, CAST(0 AS DECIMAL(18,4)))
        |""".stripMargin).collect()
    assert(stateRows(sqlState) === stateRows(dfState),
      "SQL MERGE and DataFrame MergeInto disagree on q131's six arms")
    graft.operators.GraftSql.unregisterTable("merge_sql_q131")
  }

  test("spark.sql MERGE INTO: WHEN NOT MATCHED BY SOURCE (q127b's " +
    "full-sync shape) — the full-target pairing is made automatically") {
    val spark = TestSpark.spark
    val (target, source) = graft.queries.MergeOps.q127bInputs(spark, dir)
    val dfState = stageStore(target)
    val fs = new org.apache.hadoop.fs.Path(dfState)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = graft.streaming.IngestIndex.readManifest(fs, dfState, 1L)
    graft.queries.MergeOps.commitFullSync(spark, dfState, m1, 2L, source,
      graft.queries.MergeOps.q127bMerge)
    val sqlState = stageStore(target)
    graft.operators.GraftSql.registerTable("merge_sql_q127b", sqlState,
      "state")
    source.createOrReplaceTempView("src127b")
    spark.sql(
      s"""MERGE INTO merge_sql_q127b AS t USING src127b AS s
         |ON t.user_id = s.user_id
         |WHEN MATCHED THEN UPDATE SET
         |  n_events = s.n_events, sum_value = s.sum_value
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND
         |  t.n_events < ${graft.queries.MergeOps.SyncStaleFloor}
         |  THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET
         |  sum_value = CAST(0 AS DECIMAL(18,4))
         |""".stripMargin).collect()
    assert(stateRows(sqlState) === stateRows(dfState),
      "SQL MERGE and DataFrame MergeInto disagree on q127b full-sync")
    graft.operators.GraftSql.unregisterTable("merge_sql_q127b")
  }

  test("SQL MERGE INTO guard rails: unregistered target fails as an " +
    "unresolved table; a non-key ON condition and unqualified columns " +
    "fail with named errors; GraftSql.sql works without extensions") {
    val spark = TestSpark.spark
    val (target, source) = graft.queries.MergeOps.q127Inputs(spark, dir)
    source.createOrReplaceTempView("src_rails")
    // unregistered target: our rule stays silent, Spark reports the
    // missing table
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """MERGE INTO not_a_graft_table AS t USING src_rails AS s
          |ON t.user_id = s.user_id
          |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    val state = stageStore(target)
    graft.operators.GraftSql.registerTable("merge_sql_rails", state,
      "state")
    // non-key ON condition
    val e1 = intercept[Throwable] {
      spark.sql(
        """MERGE INTO merge_sql_rails AS t USING src_rails AS s
          |ON t.n_events = s.n_events
          |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e1.getMessage.contains("key equi-join"), e1.getMessage)
    // unqualified payload reference
    val e2 = intercept[Throwable] {
      spark.sql(
        """MERGE INTO merge_sql_rails AS t USING src_rails AS s
          |ON t.user_id = s.user_id
          |WHEN MATCHED AND n_events > 3 THEN DELETE""".stripMargin)
        .collect()
    }
    assert(e2.getMessage.contains("qualify every non-key column"),
      e2.getMessage)
    // BY SOURCE clauses cannot reference the source
    val e3 = intercept[Throwable] {
      spark.sql(
        """MERGE INTO merge_sql_rails AS t USING src_rails AS s
          |ON t.user_id = s.user_id
          |WHEN NOT MATCHED BY SOURCE AND s.n_events > 3 THEN DELETE
          |""".stripMargin).collect()
    }
    assert(e3.getMessage.contains("cannot reference the source"),
      e3.getMessage)
    // reassigning the merge key throws in EVERY family (review fix: a
    // BY SOURCE key assignment used to silently no-op)
    val e4 = intercept[Throwable] {
      spark.sql(
        """MERGE INTO merge_sql_rails AS t USING src_rails AS s
          |ON t.user_id = s.user_id
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET user_id = 0
          |""".stripMargin).collect()
    }
    assert(e4.getMessage.contains("reassigning the merge key"),
      e4.getMessage)
    val e5 = intercept[Throwable] {
      spark.sql(
        """MERGE INTO merge_sql_rails AS t USING src_rails AS s
          |ON t.user_id = s.user_id
          |WHEN MATCHED THEN UPDATE SET user_id = s.user_id + 1
          |""".stripMargin).collect()
    }
    assert(e5.getMessage.contains("reassigning the merge key"),
      e5.getMessage)
    // the extension-free twin: GraftSql.sql parses with the same parser
    // and runs the same translation — a subset DELETE merge applies
    val sub = source.filter(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.lit(3)) === 0)
    sub.createOrReplaceTempView("src_rails_sub")
    val before = stateRows(state).size
    graft.operators.GraftSql.sql(spark,
      """MERGE INTO merge_sql_rails AS t USING src_rails_sub AS s
        |ON t.user_id = s.user_id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    val after = stateRows(state)
    assert(after.size < before && after.nonEmpty,
      "matched keys deleted, unmatched target rows kept")
    assert(after.map(_._1).toSet.intersect(
      sub.select("user_id").collect().map(_.getLong(0)).toSet).isEmpty)
    graft.operators.GraftSql.unregisterTable("merge_sql_rails")
  }

  test("lakehouse verb statements via the injected parser (r17): " +
    "DESCRIBE HISTORY, RESTORE VERSION AS OF, and VACUUM run through " +
    "spark.sql; ordinary SQL delegates untouched") {
    val spark = TestSpark.spark
    val (target, source) = graft.queries.MergeOps.q127Inputs(spark, dir)
    val state = stageStore(target)
    graft.operators.GraftSql.registerTable("verbs_t", state, "state")
    source.createOrReplaceTempView("verbs_src")
    spark.sql(
      """MERGE INTO verbs_t AS t USING verbs_src AS s
        |ON t.user_id = s.user_id
        |WHEN MATCHED AND s.n_events > t.n_events THEN DELETE
        |WHEN MATCHED THEN UPDATE SET
        |  n_events = t.n_events + s.n_events,
        |  sum_value = CAST(t.sum_value + s.sum_value AS DECIMAL(18,4))
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    val v2 = stateRows(state)
    // DESCRIBE HISTORY: versions newest-first with operation tags
    val hist = spark.sql("DESCRIBE HISTORY verbs_t").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(hist.toSeq == Seq(2L -> "merge-sql", 1L -> "commit"),
      hist.mkString(","))
    // RESTORE: roll back to v1, returns the new version
    val restored = spark
      .sql("RESTORE TABLE verbs_t TO VERSION AS OF 1").collect()
    assert(restored.map(_.getLong(0)).toSeq == Seq(3L))
    val v3 = stateRows(state)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // v3 == v1's contents (the rollback), v2 still readable
    val v1rows = graft.streaming.IngestIndex
      .tableAt(spark, state, "state", 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(v3.map(r => (r._1, r._2)).toSet == v1rows)
    assert(v3 != v2)
    // VACUUM: retain 2 — v2 (prev) and v3 keep their data; the verb
    // reports what it deleted (possibly nothing: all dirs referenced)
    val deleted = spark.sql("VACUUM verbs_t RETAIN 2 VERSIONS").collect()
      .map(_.getLong(0)).toSet
    assert(graft.streaming.IngestIndex.latestVersion(fs, state)
      .contains(3L))
    assert(stateRows(state) == v3, s"VACUUM changed contents ($deleted)")
    // ordinary SQL still parses through the delegate
    assert(spark.sql("SELECT 1 AS one").collect().head.getInt(0) == 1)
    // unregistered DESCRIBE HISTORY DELEGATES (Spark's `DESCRIBE
    // history <col>` statement on a table named `history` must keep
    // working) — the delegate then fails on the missing table
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DESCRIBE HISTORY not_registered_tbl").collect()
    }
    assert(e.getMessage.toLowerCase.contains("history"), e.getMessage)
    // unregistered RESTORE/VACUUM shapes (statements Spark's grammar
    // does not carry at all) throw the registration error
    val e2 = intercept[Throwable] {
      spark.sql("VACUUM not_registered_tbl RETAIN 3 VERSIONS")
    }
    assert(e2.getMessage.contains("not a registered graft store table"),
      e2.getMessage)
    // the extension-free twin routes the same verbs
    val hist2 = graft.operators.GraftSql.sql(spark,
      "DESCRIBE HISTORY verbs_t").collect()
    assert(hist2.map(_.getLong(0)).contains(3L))
    graft.operators.GraftSql.unregisterTable("verbs_t")
  }

  test("SQL READ surface (r17): SELECT from a registered store == " +
    "currentTable; VERSION AS OF == tableAt; temp views shadow; " +
    "MERGE can USE a store table as its source") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    val (target, source) = graft.queries.MergeOps.q127Inputs(spark, dir)
    val state = stageStore(target)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = graft.streaming.IngestIndex.readManifest(fs, state, 1L)
    val m2 = graft.streaming.IngestIndex.mergeCommit(spark, state, m1,
      "state", 2L, source, graft.queries.MergeOps.q127Merge)
    graft.streaming.IngestIndex.writeManifest(fs, state, 2L,
      Map("state" -> m2))
    graft.operators.GraftSql.registerTable("read_t", state, "state")
    // current read == currentTable
    val viaSql = spark.sql("SELECT * FROM read_t ORDER BY user_id")
      .collect().map(_.toSeq).toSeq
    val direct = graft.streaming.IngestIndex
      .currentTable(spark, state, "state")
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(viaSql == direct, "SELECT over the store != currentTable")
    // VERSION AS OF 1 == tableAt(1) (the pre-merge snapshot)
    val v1Sql = spark.sql(
      "SELECT user_id, n_events FROM read_t VERSION AS OF 1 " +
        "ORDER BY user_id").collect().map(_.toSeq).toSeq
    val v1Direct = graft.streaming.IngestIndex
      .tableAt(spark, state, "state", 1L)
      .select("user_id", "n_events").orderBy("user_id")
      .collect().map(_.toSeq).toSeq
    assert(v1Sql == v1Direct && v1Sql != viaSql.map(_.take(2)),
      "VERSION AS OF 1 must be the pre-merge snapshot")
    // predicates/aggregates/qualified refs compose over the read
    val n = spark.sql(
      "SELECT COUNT(*) FROM read_t t WHERE t.user_id % 2 = 0")
      .collect().head.getLong(0)
    assert(n == direct.count(_.head.asInstanceOf[Long] % 2 == 0))
    // a temp view with the same name SHADOWS the store (builtin
    // resolution runs before the injected rule)
    Seq(Tuple1(-42L)).toDF("user_id").createOrReplaceTempView("read_t")
    val shadowed = spark.sql("SELECT user_id FROM read_t").collect()
    assert(shadowed.map(_.getLong(0)).toSeq == Seq(-42L),
      "temp views must win over the registry")
    spark.catalog.dropTempView("read_t")
    // MERGE INTO one store USING another registered store as source
    val srcState = stageStore(source)
    graft.operators.GraftSql.registerTable("read_src", srcState, "state")
    spark.sql(
      """MERGE INTO read_t AS t USING read_src AS s
        |ON t.user_id = s.user_id
        |WHEN MATCHED THEN UPDATE SET n_events = t.n_events + s.n_events
        |""".stripMargin).collect()
    assert(graft.streaming.IngestIndex
      .latestVersion(fs, state).contains(3L))
    graft.operators.GraftSql.unregisterTable("read_t")
    graft.operators.GraftSql.unregisterTable("read_src")
  }

  test("OPTIMIZE statement (r17): materializes a live deletion vector " +
    "and folds the version tail; contents unchanged; history tagged") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    val (target, _) = graft.queries.MergeOps.q127Inputs(spark, dir)
    val state = stageStore(target)
    graft.operators.GraftSql.registerTable("opt_t", state, "state")
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // DV-delete a stripe, then OPTIMIZE through SQL
    val m1 = graft.streaming.IngestIndex.readManifest(fs, state, 1L)
    val tomb = target.filter(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.lit(4)) === 1)
      .select("user_id")
    val m2 = graft.streaming.IngestIndex.deleteWithDv(spark, state, m1,
      "state", 2L, tomb)
    graft.streaming.IngestIndex.writeManifest(fs, state, 2L, m2,
      op = "delete-dv")
    val want = stateRows(state) // DV-applied view pre-OPTIMIZE
    val out = spark.sql("OPTIMIZE opt_t RETAIN 4 VERSIONS").collect()
    assert(out.length == 1 && out.head.getBoolean(1),
      "OPTIMIZE must report the tombstone purge")
    val top = out.head.getLong(0)
    // vector cleared, contents identical, raw == visible now
    val m = graft.streaming.IngestIndex.readManifest(fs, state, top)
    assert(!m.contains(graft.streaming.IngestIndex.dvTable("state")))
    assert(stateRows(state) == want, "OPTIMIZE changed visible contents")
    val hist = spark.sql("DESCRIBE HISTORY opt_t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hist(top) == "compact",
      s"the fold repoints the top manifest: $hist")
    // an OPTIMIZE with no live vector reports purged=false and still
    // compacts idempotently
    val out2 = spark.sql("OPTIMIZE opt_t RETAIN 4 VERSIONS").collect()
    assert(!out2.head.getBoolean(1))
    assert(stateRows(state) == want)
    graft.operators.GraftSql.unregisterTable("opt_t")
  }
}
