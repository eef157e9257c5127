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
    // STAR actions on a source missing a payload column are a named
    // error, not a silent NULL write (r18, advisor fix); the
    // LISTED-column INSERT path keeps SQL's NULL-fill semantics
    source.select("user_id", "n_events")
      .createOrReplaceTempView("src_rails_thin")
    val e6 = intercept[Throwable] {
      spark.sql(
        """MERGE INTO merge_sql_rails AS t USING src_rails_thin AS s
          |ON t.user_id = s.user_id
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    }
    assert(e6.getMessage.contains("every target payload column") &&
      e6.getMessage.contains("sum_value"), e6.getMessage)
    val e7 = intercept[Throwable] {
      spark.sql(
        """MERGE INTO merge_sql_rails AS t USING src_rails_thin AS s
          |ON t.user_id = s.user_id
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
    }
    assert(e7.getMessage.contains("every target payload column"),
      e7.getMessage)
    // the same thin source through a LISTED INSERT still null-fills
    spark.sql(
      """MERGE INTO merge_sql_rails AS t USING src_rails_thin AS s
        |ON t.user_id = s.user_id
        |WHEN NOT MATCHED AND s.user_id % 50 = 7 THEN
        |  INSERT (user_id, n_events) VALUES (s.user_id, s.n_events)
        |""".stripMargin).collect()
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

  test("CREATE TABLE ... USING graft + INSERT INTO (r18): DDL + " +
    "bulk-load through spark.sql — empty reads, PRIMARY KEY guards, " +
    "IF NOT EXISTS, OVERWRITE, meta durability across re-registration") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory("graft-sqlcreate").toString + "/users"
    try {
      spark.sql(
        s"""CREATE TABLE ct_users (
           |  user_id BIGINT, n_events BIGINT, score DOUBLE,
           |  PRIMARY KEY (user_id)
           |) USING graft LOCATION '$state'""".stripMargin)
      // empty read with the DECLARED schema, before any commit
      val empty = spark.sql("SELECT * FROM ct_users")
      assert(empty.columns.toSeq == Seq("user_id", "n_events", "score"))
      assert(empty.count() == 0L)
      // CREATE again: named error; IF NOT EXISTS: no-op re-register
      val e0 = intercept[Throwable] {
        spark.sql(s"CREATE TABLE ct_users (x BIGINT, PRIMARY KEY (x)) " +
          s"USING graft LOCATION '$state'")
      }
      assert(e0.getMessage.contains("already exists"), e0.getMessage)
      spark.sql(s"""CREATE TABLE IF NOT EXISTS ct_users (x BIGINT,
        |PRIMARY KEY (x)) USING graft LOCATION '$state'""".stripMargin)
      // positional INSERT
      Seq((1L, 10L, 0.5), (2L, 20L, 0.7))
        .toDF("a", "b", "c").createOrReplaceTempView("ct_src1")
      val v1 = spark.sql(
        "INSERT INTO ct_users SELECT a, b, c FROM ct_src1")
        .collect().head.getLong(0)
      assert(v1 == 1L)
      // column-list INSERT, unlisted payload -> NULL
      Seq((3L, 30L)).toDF("u", "n")
        .createOrReplaceTempView("ct_src2")
      spark.sql("INSERT INTO ct_users (user_id, n_events) " +
        "SELECT u, n FROM ct_src2").collect()
      val rows = spark.sql(
        "SELECT user_id, n_events, score FROM ct_users ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)))).toSeq
      assert(rows == Seq((1L, 10L, Some(0.5)), (2L, 20L, Some(0.7)),
        (3L, 30L, None)), rows.toString)
      // PK violation vs the store: named error pointing at MERGE
      val e1 = intercept[Throwable] {
        spark.sql("INSERT INTO ct_users SELECT a, b, c FROM ct_src1")
          .collect()
      }
      assert(e1.getMessage.contains("already exists — use MERGE INTO"),
        e1.getMessage)
      // PK violation within the batch: named error
      Seq((9L, 1L, 0.0), (9L, 2L, 0.0)).toDF("a", "b", "c")
        .createOrReplaceTempView("ct_dup")
      val e2 = intercept[Throwable] {
        spark.sql("INSERT INTO ct_users SELECT a, b, c FROM ct_dup")
          .collect()
      }
      assert(e2.getMessage.contains("duplicate PRIMARY KEY"),
        e2.getMessage)
      // arity mismatch: named error
      val e3 = intercept[Throwable] {
        spark.sql("INSERT INTO ct_users SELECT a, b FROM ct_src1")
          .collect()
      }
      assert(e3.getMessage.contains("positional"), e3.getMessage)
      // column list missing the key: named error
      val e4 = intercept[Throwable] {
        spark.sql("INSERT INTO ct_users (n_events, score) " +
          "SELECT b, c FROM ct_src1").collect()
      }
      assert(e4.getMessage.contains("merge key 'user_id'"),
        e4.getMessage)
      // INSERT OVERWRITE replaces contents
      spark.sql("INSERT OVERWRITE ct_users SELECT a + 100, b, c " +
        "FROM ct_src1").collect()
      val after = spark.sql("SELECT user_id FROM ct_users ORDER BY 1")
        .collect().map(_.getLong(0)).toSeq
      assert(after == Seq(101L, 102L), after.toString)
      // history carries the verb provenance
      val hist = spark.sql("DESCRIBE HISTORY ct_users").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(hist(1L) == "insert" && hist(3L) == "insert-overwrite",
        hist.toString)
      // meta durability: unregister, re-register via IF NOT EXISTS
      // (a fresh process's setup script), contents intact
      graft.operators.GraftSql.unregisterTable("ct_users")
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT * FROM ct_users").collect()
      }
      spark.sql(s"""CREATE TABLE IF NOT EXISTS ct_users (
        |user_id BIGINT, PRIMARY KEY (user_id))
        |USING graft LOCATION '$state'""".stripMargin)
      assert(spark.sql("SELECT user_id FROM ct_users ORDER BY 1")
        .collect().map(_.getLong(0)).toSeq == Seq(101L, 102L))
      // the SQL-created table MERGEs like any registered store
      Seq((101L, 5L, 1.0), (200L, 7L, 2.0)).toDF("user_id", "n_events",
        "score").createOrReplaceTempView("ct_merge_src")
      spark.sql(
        """MERGE INTO ct_users AS t USING ct_merge_src AS s
          |ON t.user_id = s.user_id
          |WHEN MATCHED THEN UPDATE SET n_events = t.n_events + s.n_events
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      val merged = spark.sql(
        "SELECT user_id, n_events FROM ct_users ORDER BY 1").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSeq
      assert(merged == Seq(101L -> 15L, 102L -> 20L, 200L -> 7L),
        merged.toString)
    } finally graft.operators.GraftSql.unregisterTable("ct_users")
  }

  test("INSERT INTO maps against the EVOLVED schema, not the stale " +
    "declared meta, and rewritten buckets keep evolved columns " +
    "(review fix)") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory("graft-sqlevo").toString + "/t"
    spark.sql(
      s"""CREATE TABLE evo_ins (
         |  user_id BIGINT, a BIGINT, PRIMARY KEY (user_id)
         |) USING graft LOCATION '$state'""".stripMargin)
    try {
      Seq((1L, 10L), (2L, 20L)).toDF("u", "n")
        .createOrReplaceTempView("evo_src1")
      spark.sql("INSERT INTO evo_ins SELECT * FROM evo_src1") // v1
      // the store evolves IN PLACE (the q128 path): an engine commit
      // brings column b — the declared meta still says two columns
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val m1 = graft.streaming.IngestIndex.readManifest(fs, state, 1L)
      val evolved = Seq((3L, 30L, 99L)).toDF("user_id", "a", "b")
      val map = graft.streaming.IngestIndex.mergeCommit(spark, state,
        m1, "evo_ins", 2L, evolved,
        (cur, d) => cur.unionByName(d, allowMissingColumns = true))
      graft.streaming.IngestIndex.writeManifest(fs, state, 2L,
        m1 + ("evo_ins" -> map))
      // a positional INSERT now takes THREE columns (current schema,
      // not the stale 2-column declaration)...
      Seq((4L, 40L, 77L)).toDF("u", "n", "b")
        .createOrReplaceTempView("evo_src2")
      spark.sql("INSERT INTO evo_ins SELECT * FROM evo_src2")
      // ...and the rewrite of user 3's bucket must NOT have dropped b
      val rows = spark.sql(
        "SELECT user_id, a, b FROM evo_ins ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)))).toSeq
      assert(rows == Seq((1L, 10L, None), (2L, 20L, None),
        (3L, 30L, Some(99L)), (4L, 40L, Some(77L))), rows.toString)
    } finally {
      graft.operators.GraftSql.unregisterTable("evo_ins")
      graft.streaming.IngestIndex.unregisterKeyCols("evo_ins")
    }
  }

  test("CTAS (r19): CREATE TABLE ... USING graft AS SELECT — schema " +
    "inferred, seed committed as v1 with create-as-select provenance, " +
    "IF NOT EXISTS whole-statement no-op, guard rails") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory("graft-ctas").toString + "/t"
    (1L to 6L).map(i => (i, i * 2L, s"u$i"))
      .toDF("user_id", "n", "tag")
      .createOrReplaceTempView("ctas_src")
    try {
      val v = spark.sql(
        s"""CREATE TABLE ctas_t (PRIMARY KEY (user_id)) USING graft
           |LOCATION '$state' AS
           |SELECT user_id, n, tag FROM ctas_src WHERE user_id <= 4
           |""".stripMargin).collect().head.getLong(0)
      assert(v == 1L, s"CTAS seeded v$v, expected v1")
      // schema inferred from the query; contents == the query
      val rows = spark.sql(
        "SELECT user_id, n, tag FROM ctas_t ORDER BY 1").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(rows == (1L to 4L).map(i => (i, i * 2L, s"u$i")), rows)
      // provenance: v1 reads create-as-select
      val hist = spark.sql("DESCRIBE HISTORY ctas_t").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(hist(1L) == "create-as-select", hist.toString)
      // plain CTAS on a live table: named error, table untouched
      val e0 = intercept[Throwable] { spark.sql(
        s"CREATE TABLE ctas_t (PRIMARY KEY (user_id)) USING graft " +
          s"LOCATION '$state' AS SELECT * FROM ctas_src") }
      assert(e0.getMessage.contains("never replaces a live table"),
        e0.getMessage)
      // IF NOT EXISTS: whole-statement no-op — the shifted query must
      // NOT run, and the verbs still compose on the re-registration
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS ctas_t (PRIMARY KEY (user_id)) " +
          s"USING graft LOCATION '$state' AS " +
          "SELECT user_id + 100 AS user_id, n, tag FROM ctas_src")
      assert(spark.sql("SELECT MAX(user_id) AS m FROM ctas_t")
        .collect().head.getLong(0) == 4L, "IF NOT EXISTS ran its query")
      spark.sql("INSERT INTO ctas_t " +
        "SELECT user_id, n, tag FROM ctas_src WHERE user_id > 4")
      assert(spark.sql("SELECT COUNT(*) AS c FROM ctas_t")
        .collect().head.getLong(0) == 6L)
      // guard rails: a column list beyond the key; a key not in the
      // query; duplicate keys in the seed (the PK guard rides the
      // commit); all named
      val e1 = intercept[Throwable] { spark.sql(
        "CREATE TABLE ctas_t2 (x BIGINT, PRIMARY KEY (x)) USING " +
          "graft LOCATION '/tmp/ctas-no' AS SELECT 1 AS x") }
      assert(e1.getMessage.contains("ONLY the PRIMARY KEY"),
        e1.getMessage)
      val e2 = intercept[Throwable] { spark.sql(
        "CREATE TABLE ctas_t3 (PRIMARY KEY (nope)) USING graft " +
          "LOCATION '/tmp/ctas-no' AS SELECT user_id FROM ctas_src") }
      assert(e2.getMessage.contains("not among the query's columns"),
        e2.getMessage)
      val dup = java.nio.file.Files
        .createTempDirectory("graft-ctasdup").toString + "/t"
      val e3 = intercept[Throwable] { spark.sql(
        s"CREATE TABLE ctas_dup (PRIMARY KEY (k)) USING graft " +
          s"LOCATION '$dup' AS SELECT user_id % 2 AS k FROM ctas_src") }
      assert(e3.getMessage.contains("duplicate PRIMARY KEY"),
        e3.getMessage)
      graft.operators.GraftSql.unregisterTable("ctas_dup")
      // extension-free twin routes the same statement
      val state2 = java.nio.file.Files
        .createTempDirectory("graft-ctas2").toString + "/t"
      graft.operators.GraftSql.sql(spark,
        s"CREATE TABLE ctas_twin (PRIMARY KEY (user_id)) USING graft " +
          s"LOCATION '$state2' AS SELECT user_id, n FROM ctas_src")
        .collect()
      assert(graft.operators.GraftSql.sql(spark,
        "SELECT COUNT(*) AS c FROM ctas_twin")
        .collect().head.getLong(0) == 6L)
      graft.operators.GraftSql.unregisterTable("ctas_twin")
    } finally {
      graft.operators.GraftSql.unregisterTable("ctas_t")
      graft.streaming.IngestIndex.unregisterKeyCols("ctas_t")
      graft.streaming.IngestIndex.unregisterKeyCols("ctas_dup")
      graft.streaming.IngestIndex.unregisterKeyCols("ctas_twin")
    }
  }

  test("DROP TABLE (r20): a flat-registered SQL-created table drops " +
    "meta + data + registry + key binding (a re-CREATE may rebind a " +
    "DIFFERENT key); IF EXISTS; unregistered names delegate to Spark; " +
    "hand-registered stores are refused by name") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-sqldrop").toString
    val state = root + "/droptbl"
    Seq((1L, 10L)).toDF("a", "b").createOrReplaceTempView("drop_src")
    try {
      spark.sql(s"CREATE TABLE drop_t (k BIGINT, v BIGINT, " +
        s"PRIMARY KEY (k)) USING graft LOCATION '$state'")
      spark.sql("INSERT INTO drop_t SELECT a, b FROM drop_src").collect()
      assert(spark.sql("SELECT * FROM drop_t").count() == 1L)
      spark.sql("DROP TABLE drop_t")
      // registry gone (the name no longer resolves anywhere) and the
      // store directory — meta file + version dirs — deleted
      assert(graft.operators.GraftSql.resolveStore("drop_t").isEmpty)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(state)), "store dir survived DROP")
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT * FROM drop_t").collect()
      }
      // key binding released: the SAME inner name re-CREATEs keyed by a
      // DIFFERENT column, and the PK guard fires on the NEW key
      spark.sql(s"CREATE TABLE drop_t (v BIGINT, k BIGINT, " +
        s"PRIMARY KEY (v)) USING graft LOCATION '$state'")
      spark.sql("INSERT INTO drop_t SELECT b, a FROM drop_src").collect()
      val eDup = intercept[Throwable] {
        spark.sql("INSERT INTO drop_t SELECT b, a + 9 FROM drop_src")
          .collect()
      }
      assert(eDup.getMessage.contains("already exists"), eDup.getMessage)
      // IF EXISTS composes with a live registered table too
      spark.sql("DROP TABLE IF EXISTS drop_t")
      assert(graft.operators.GraftSql.resolveStore("drop_t").isEmpty)
      // unregistered name: DELEGATES to Spark untouched — IF EXISTS
      // no-ops there, the bare form fails with Spark's own error
      spark.sql("DROP TABLE IF EXISTS drop_no_such_flat")
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("DROP TABLE drop_no_such_flat")
      }
      // a hand-registered store (no _graft_meta): DROP refuses by name
      // — SQL never owned that data — and points at unregisterTable
      val hand = root + "/hand"
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(hand))
      graft.operators.GraftSql.registerTable("drop_hand", hand, "state")
      val eHand = intercept[Throwable] {
        spark.sql("DROP TABLE drop_hand")
      }
      assert(eHand.getMessage.contains("unregisterTable"),
        eHand.getMessage)
      // the refusal deleted nothing and kept the registration
      assert(graft.operators.GraftSql.resolveStore("drop_hand").isDefined)
      // extension-free twin routes the same statement
      val state2 = root + "/twin"
      graft.operators.GraftSql.sql(spark,
        s"CREATE TABLE drop_twin (x BIGINT, PRIMARY KEY (x)) " +
          s"USING graft LOCATION '$state2'").collect()
      graft.operators.GraftSql.sql(spark, "DROP TABLE drop_twin")
        .collect()
      assert(graft.operators.GraftSql.resolveStore("drop_twin").isEmpty)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(state2)))
    } finally {
      graft.operators.GraftSql.unregisterTable("drop_t")
      graft.operators.GraftSql.unregisterTable("drop_hand")
      graft.operators.GraftSql.unregisterTable("drop_twin")
      graft.streaming.IngestIndex.unregisterKeyCols("drop_t")
      graft.streaming.IngestIndex.unregisterKeyCols("drop_twin")
    }
  }

  test("ALTER COLUMN TYPE (r20): safe widening rewrites copy-on-write " +
    "— the current snapshot carries the new type in EVERY file, time " +
    "travel reads each snapshot's own type, a live DV materializes " +
    "first; key retype / narrowing / cross-family are named errors; " +
    "the catalog path shares the helper") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val state = java.nio.file.Files
      .createTempDirectory("graft-retype").toString + "/t"
    Seq((1L, 10), (2L, 20), (3L, 30), (5L, 50)).toDF("a", "b")
      .createOrReplaceTempView("rt_src")
    try {
      spark.sql(s"CREATE TABLE rt_t (user_id BIGINT, n INT, " +
        s"PRIMARY KEY (user_id)) USING graft LOCATION '$state'")
      spark.sql("INSERT INTO rt_t SELECT a, b FROM rt_src")
      def typeOf(sqlText: String) = spark.sql(sqlText).schema("n").dataType
      assert(typeOf("SELECT * FROM rt_t") == IntegerType)
      // a LIVE deletion vector crosses the retype
      spark.sql("DELETE FROM rt_t WHERE user_id = 3")
      spark.sql("ALTER TABLE rt_t ALTER COLUMN n TYPE BIGINT")
      // current snapshot: new type, same values, tombstone honored
      assert(typeOf("SELECT * FROM rt_t") == LongType)
      val rows = spark.sql("SELECT user_id, n FROM rt_t ORDER BY 1")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((1L, 10L), (2L, 20L), (5L, 50L)), rows)
      // provenance: materialize then retype
      val hist = spark.sql("DESCRIBE HISTORY rt_t").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(hist(3L) == "materialize" && hist(4L) == "retype", hist)
      // TIME TRAVEL reads each snapshot's OWN type (history immutable:
      // v1's files were never rewritten)
      assert(typeOf("SELECT * FROM rt_t VERSION AS OF 1") == IntegerType)
      assert(spark.sql("SELECT user_id, n FROM rt_t VERSION AS OF 1 " +
        "ORDER BY 1").collect().map(r => (r.getLong(0), r.getInt(1)))
        .toSeq == Seq((1L, 10), (2L, 20), (3L, 30), (5L, 50)))
      // the widened column now holds values the old type could not
      spark.sql("INSERT INTO rt_t VALUES (9, 4000000001)")
      assert(spark.sql("SELECT n FROM rt_t WHERE user_id = 9")
        .collect().head.getLong(0) == 4000000001L)
      // no-op retype: same type, no new version
      val top = spark.sql("DESCRIBE HISTORY rt_t").collect()
        .map(_.getLong(0)).max
      spark.sql("ALTER TABLE rt_t ALTER COLUMN n TYPE BIGINT")
      assert(spark.sql("DESCRIBE HISTORY rt_t").collect()
        .map(_.getLong(0)).max == top, "no-op retype committed")
      // guard rails, all named: narrowing, cross-family, key retype,
      // unknown column
      val e1 = intercept[Throwable] {
        spark.sql("ALTER TABLE rt_t ALTER COLUMN n TYPE INT") }
      assert(e1.getMessage.contains("safe widenings"), e1.getMessage)
      val e2 = intercept[Throwable] {
        spark.sql("ALTER TABLE rt_t ALTER COLUMN n TYPE STRING") }
      assert(e2.getMessage.contains("safe widenings"), e2.getMessage)
      val e3 = intercept[Throwable] {
        spark.sql("ALTER TABLE rt_t ALTER COLUMN user_id TYPE DECIMAL(38,0)") }
      assert(e3.getMessage.contains("PRIMARY KEY"), e3.getMessage)
      val e4 = intercept[Throwable] {
        spark.sql("ALTER TABLE rt_t ALTER COLUMN nope TYPE BIGINT") }
      assert(e4.getMessage.contains("no column"), e4.getMessage)
    } finally {
      graft.operators.GraftSql.unregisterTable("rt_t")
      graft.streaming.IngestIndex.unregisterKeyCols("rt_t")
    }
  }

  test("DROP COLUMN / RENAME COLUMN (r20): copy-on-write rewrites — " +
    "current snapshot carries the new shape in EVERY file, time travel " +
    "reads each snapshot's own shape, a live DV materializes first; " +
    "CDF seam: rename = full-table update, drop = zero rows; key " +
    "drop/rename and rename collision are named errors") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory("graft-colalter").toString + "/t"
    Seq((1L, 10L, "a", 0.1), (2L, 20L, "b", 0.2), (3L, 30L, "c", 0.3),
      (5L, 50L, "e", 0.5)).toDF("a", "b", "c", "d")
      .createOrReplaceTempView("cr_src")
    try {
      spark.sql(s"CREATE TABLE cr_t (user_id BIGINT, n BIGINT, " +
        s"tag STRING, note DOUBLE, PRIMARY KEY (user_id)) " +
        s"USING graft LOCATION '$state'")
      spark.sql("INSERT INTO cr_t SELECT a, b, c, d FROM cr_src")
      // a LIVE deletion vector crosses BOTH rewrites
      spark.sql("DELETE FROM cr_t WHERE user_id = 3")
      spark.sql("ALTER TABLE cr_t RENAME COLUMN tag TO label")
      // current snapshot: renamed column, same values, tombstone honored
      val afterRename = spark.sql("SELECT * FROM cr_t")
      assert(afterRename.columns.toSeq ==
        Seq("user_id", "n", "label", "note"), afterRename.columns.toSeq)
      assert(spark.sql("SELECT user_id, label FROM cr_t ORDER BY 1")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, "b"), (5L, "e")))
      spark.sql("ALTER TABLE cr_t DROP COLUMN note")
      assert(spark.sql("SELECT * FROM cr_t").columns.toSeq ==
        Seq("user_id", "n", "label"))
      // provenance: delete-dv, materialize, rename-column, drop-column
      val hist = spark.sql("DESCRIBE HISTORY cr_t").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(hist(3L) == "materialize" && hist(4L) == "rename-column" &&
        hist(5L) == "drop-column", hist)
      // TIME TRAVEL reads each snapshot's OWN shape (v1's files were
      // never rewritten: old names, old columns, pre-delete contents)
      val v1 = spark.sql("SELECT * FROM cr_t VERSION AS OF 1")
      assert(v1.columns.toSeq == Seq("user_id", "n", "tag", "note"),
        v1.columns.toSeq)
      assert(v1.count() == 4)
      // v4 (post-rename, pre-drop) still carries note
      assert(spark.sql("SELECT * FROM cr_t VERSION AS OF 4")
        .columns.toSeq == Seq("user_id", "n", "label", "note"))
      // CDF seam laws: the RENAME step surfaces as a FULL-TABLE update
      // (postimages carry the renamed column's values; preimages NULL
      // it — the old name is gone from the post shape); the DROP step
      // emits ZERO rows (projected to the post shape, the rewritten
      // rows equal their preimages — "schema change, no row change")
      val renameStep = spark.sql(
        "SELECT * FROM table_changes('cr_t', 3, 4)")
      val kinds = renameStep.groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(kinds == Map("update_preimage" -> 3L,
        "update_postimage" -> 3L), kinds)
      assert(renameStep
        .filter("_change_type = 'update_postimage' AND user_id = 2")
        .select("label").collect().head.getString(0) == "b")
      assert(spark.sql("SELECT * FROM table_changes('cr_t', 4, 5)")
        .count() == 0L, "drop step must emit zero change rows")
      // post-rewrite INSERT aligns positionally against the NEW shape
      spark.sql("INSERT INTO cr_t VALUES (9, 90, 'z')")
      assert(spark.sql("SELECT label FROM cr_t WHERE user_id = 9")
        .collect().head.getString(0) == "z")
      // a later same-name ADD COLUMNS reads NULL, never stale bytes
      // (the honest-drop law: the rewrite physically removed them)
      spark.sql("ALTER TABLE cr_t ADD COLUMNS (note DOUBLE)")
      assert(spark.sql("SELECT note FROM cr_t WHERE user_id = 1")
        .collect().head.isNullAt(0), "dropped bytes resurrected")
      // no-op rename: same name, no new version
      val top = spark.sql("DESCRIBE HISTORY cr_t").collect()
        .map(_.getLong(0)).max
      spark.sql("ALTER TABLE cr_t RENAME COLUMN label TO label")
      assert(spark.sql("DESCRIBE HISTORY cr_t").collect()
        .map(_.getLong(0)).max == top, "no-op rename committed")
      // guard rails, all named
      val e1 = intercept[Throwable] {
        spark.sql("ALTER TABLE cr_t DROP COLUMN user_id") }
      assert(e1.getMessage.contains("PRIMARY KEY"), e1.getMessage)
      val e2 = intercept[Throwable] {
        spark.sql("ALTER TABLE cr_t RENAME COLUMN user_id TO uid") }
      assert(e2.getMessage.contains("PRIMARY KEY"), e2.getMessage)
      val e3 = intercept[Throwable] {
        spark.sql("ALTER TABLE cr_t RENAME COLUMN label TO n") }
      assert(e3.getMessage.contains("FIELD_ALREADY_EXISTS") ||
        e3.getMessage.contains("already exists"), e3.getMessage)
      val e4 = intercept[Throwable] {
        spark.sql("ALTER TABLE cr_t DROP COLUMN nope") }
      assert(e4.getMessage.contains("no column"), e4.getMessage)
      val e5 = intercept[Throwable] {
        spark.sql("ALTER TABLE cr_t RENAME COLUMN nope TO x") }
      assert(e5.getMessage.contains("no column"), e5.getMessage)
      // extension-free twin: GraftSql.sql parses the same verbs
      graft.operators.GraftSql.sql(spark,
        "ALTER TABLE cr_t RENAME COLUMN label TO tag2").collect()
      assert(spark.sql("SELECT * FROM cr_t").columns.contains("tag2"))
    } finally {
      graft.operators.GraftSql.unregisterTable("cr_t")
      graft.streaming.IngestIndex.unregisterKeyCols("cr_t")
    }
  }

  test("TRUNCATE TABLE + SHOW CREATE TABLE (r20): truncate is ONE " +
    "commit (history keeps old snapshots; RESTORE rolls it back); " +
    "SHOW CREATE output ROUND-TRIPS through the engine's own CREATE " +
    "verb; unregistered names delegate to Spark") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-trunc").toString
    Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("a", "b", "c").createOrReplaceTempView("tr_src")
    try {
      spark.sql(s"CREATE TABLE tr_t (user_id BIGINT, n BIGINT, " +
        s"tag STRING, PRIMARY KEY (user_id)) USING graft " +
        s"LOCATION '$root/t'")
      spark.sql("INSERT INTO tr_t SELECT a, b, c FROM tr_src")
      // SHOW CREATE TABLE: one string row that re-executes verbatim
      // (modulo name + location) and reproduces schema AND key
      val stmt = spark.sql("SHOW CREATE TABLE tr_t")
        .collect().head.getString(0)
      assert(stmt.contains("USING graft") &&
        stmt.contains("PRIMARY KEY (user_id)"), stmt)
      val twinStmt = stmt
        .replace("CREATE TABLE tr_t", "CREATE TABLE tr_twin")
        .replace(s"LOCATION '$root/t'", s"LOCATION '$root/twin'")
      spark.sql(twinStmt)
      assert(spark.sql("SELECT * FROM tr_twin").schema ==
        spark.sql("SELECT * FROM tr_t").schema,
        "SHOW CREATE TABLE output did not round-trip the schema")
      assert(graft.streaming.IngestIndex.keyColsFor("tr_twin") ==
        Seq("user_id"))
      // TRUNCATE: one commit, empty read under the declared schema
      val v = spark.sql("TRUNCATE TABLE tr_t")
        .collect().head.getLong(0)
      assert(v == 2L, s"truncate committed v$v")
      assert(spark.sql("SELECT * FROM tr_t").count() == 0L)
      assert(spark.sql("SELECT * FROM tr_t").columns.toSeq ==
        Seq("user_id", "n", "tag"))
      val hist = spark.sql("DESCRIBE HISTORY tr_t").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(hist(2L) == "truncate-sql", hist)
      // history keeps the old snapshot; RESTORE rolls the truncate back
      assert(spark.sql("SELECT * FROM tr_t VERSION AS OF 1")
        .count() == 3L)
      spark.sql("RESTORE TABLE tr_t VERSION AS OF 1")
      assert(spark.sql("SELECT user_id FROM tr_t ORDER BY 1").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
      // a truncated-then-reloaded table accepts fresh inserts
      spark.sql("TRUNCATE TABLE tr_t")
      spark.sql("INSERT INTO tr_t VALUES (9, 90, 'z')")
      assert(spark.sql("SELECT user_id FROM tr_t").collect()
        .map(_.getLong(0)).toSeq == Seq(9L))
      // already-empty truncate: no new version
      spark.sql("TRUNCATE TABLE tr_t")
      val top = spark.sql("DESCRIBE HISTORY tr_t").collect()
        .map(_.getLong(0)).max
      spark.sql("TRUNCATE TABLE tr_t")
      assert(spark.sql("DESCRIBE HISTORY tr_t").collect()
        .map(_.getLong(0)).max == top, "empty truncate committed")
      // unregistered names delegate to Spark untouched (Spark's own
      // TABLE_OR_VIEW_NOT_FOUND, not an engine error)
      val e1 = intercept[Throwable] {
        spark.sql("TRUNCATE TABLE no_such_graft_table") }
      assert(e1.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"),
        e1.getMessage)
      val e2 = intercept[Throwable] {
        spark.sql("SHOW CREATE TABLE no_such_graft_table") }
      assert(e2.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"),
        e2.getMessage)
    } finally {
      graft.operators.GraftSql.unregisterTable("tr_t")
      graft.operators.GraftSql.unregisterTable("tr_twin")
      graft.streaming.IngestIndex.unregisterKeyCols("tr_t")
      graft.streaming.IngestIndex.unregisterKeyCols("tr_twin")
    }
  }

  test("BEGIN...COMMIT transactions (r20): N statements, ONE version " +
    "(op = txn); read-your-writes (delete-then-reinsert works, the PK " +
    "guard sees the running state); batched == sequential; a failing " +
    "statement aborts the WHOLE transaction; scope guard rails") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-txn").toString
    def create(name: String): Unit =
      spark.sql(s"CREATE TABLE $name (user_id BIGINT, n BIGINT, " +
        s"PRIMARY KEY (user_id)) USING graft LOCATION '$root/$name'")
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (7L, 70L)).toDF("a", "b")
      .createOrReplaceTempView("txn_seed")
    try {
      create("txn_t")
      spark.sql("INSERT INTO txn_t SELECT a, b FROM txn_seed")
      val v = spark.sql(
        """BEGIN;
          |UPDATE txn_t SET n = n + 100 WHERE user_id <= 2;
          |DELETE FROM txn_t WHERE user_id = 7;
          |INSERT INTO txn_t VALUES (7, 777), (9, 90);
          |COMMIT""".stripMargin).collect().head.getLong(0)
      // ONE version for three statements, op = txn; read-your-writes:
      // user 7 was deleted THEN re-inserted in the same transaction
      assert(v == 2L, s"txn committed v$v, expected ONE version v2")
      val hist = spark.sql("DESCRIBE HISTORY txn_t").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(hist == Map(1L -> "insert", 2L -> "txn"), hist.toString)
      // the txn commit writes ONLY declared columns into the buckets —
      // SELECT * and the CDC step both stay clean of the internal
      // __txn_drop tag (the r20 fuzz law's bucket-pollution regression)
      assert(spark.sql("SELECT * FROM txn_t").columns.toSeq ==
        Seq("user_id", "n"))
      assert(spark.sql("SELECT * FROM table_changes('txn_t', 1, 2)")
        .columns.toSeq ==
        Seq("user_id", "n", "_change_type", "_commit_version"))
      val rows = spark.sql("SELECT user_id, n FROM txn_t ORDER BY 1")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((1L, 110L), (2L, 120L), (3L, 30L),
        (7L, 777L), (9L, 90L)), rows.toString)
      // batched == sequential: the same statements one at a time land
      // the same contents (but three versions)
      create("txn_seq")
      spark.sql("INSERT INTO txn_seq SELECT a, b FROM txn_seed")
      spark.sql("UPDATE txn_seq SET n = n + 100 WHERE user_id <= 2")
      spark.sql("DELETE FROM txn_seq WHERE user_id = 7")
      spark.sql("INSERT INTO txn_seq VALUES (7, 777), (9, 90)")
      val seq = spark.sql("SELECT user_id, n FROM txn_seq ORDER BY 1")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(seq == rows, s"batched $rows != sequential $seq")
      // ATOMIC: a failing guard (PK clash with the RUNNING state)
      // aborts the whole transaction — version count unchanged, the
      // earlier statement's update NOT applied
      val e1 = intercept[Throwable] { spark.sql(
        """BEGIN;
          |UPDATE txn_t SET n = 0 WHERE user_id = 3;
          |INSERT INTO txn_t VALUES (9, 1);
          |COMMIT""".stripMargin).collect() }
      assert(e1.getMessage.contains("already exists"), e1.getMessage)
      assert(spark.sql("DESCRIBE HISTORY txn_t").collect()
        .map(_.getLong(0)).max == 2L, "aborted txn committed a version")
      assert(spark.sql("SELECT n FROM txn_t WHERE user_id = 3")
        .collect().head.getLong(0) == 30L,
        "aborted txn applied an earlier statement")
      // in-batch duplicate inside one INSERT: named
      val e2 = intercept[Throwable] { spark.sql(
        "BEGIN; INSERT INTO txn_t VALUES (50, 1), (50, 2); COMMIT")
        .collect() }
      assert(e2.getMessage.contains("duplicate PRIMARY KEY"),
        e2.getMessage)
      // scope guard rails, all named: two tables; MERGE; OVERWRITE
      val e3 = intercept[Throwable] { spark.sql(
        """BEGIN;
          |DELETE FROM txn_t WHERE user_id = 1;
          |DELETE FROM txn_seq WHERE user_id = 1;
          |COMMIT""".stripMargin).collect() }
      assert(e3.getMessage.contains("ONE table"), e3.getMessage)
      val e4 = intercept[Throwable] { spark.sql(
        """BEGIN;
          |MERGE INTO txn_t AS t
          |USING (SELECT a AS user_id, b FROM txn_seed) AS s
          |ON t.user_id = s.user_id
          |WHEN MATCHED THEN UPDATE SET n = s.b;
          |COMMIT""".stripMargin).collect() }
      assert(e4.getMessage.contains("standalone"), e4.getMessage)
      val e5 = intercept[Throwable] { spark.sql(
        "BEGIN; INSERT OVERWRITE txn_t SELECT a, b FROM txn_seed; " +
          "COMMIT").collect() }
      assert(e5.getMessage.contains("OVERWRITE"), e5.getMessage)
      // quoted-literal splitting: a ';' inside a string literal does
      // not split the statement
      create("txn_q")
      spark.sql("ALTER TABLE txn_q ADD COLUMNS (tag STRING)")
      spark.sql(
        """BEGIN;
          |INSERT INTO txn_q VALUES (1, 1, 'a;b');
          |UPDATE txn_q SET tag = 'x;y' WHERE user_id = 1;
          |COMMIT""".stripMargin).collect()
      assert(spark.sql("SELECT tag FROM txn_q").collect()
        .head.getString(0) == "x;y")
      // extension-free twin routes the same block
      val v2 = graft.operators.GraftSql.sql(spark,
        "BEGIN; DELETE FROM txn_q WHERE user_id = 1; COMMIT")
        .collect().head.getLong(0)
      assert(v2 == 2L && spark.sql("SELECT COUNT(*) AS c FROM txn_q")
        .collect().head.getLong(0) == 0L)
      // FOOTPRINT LAW: a transaction touching ONE key commits only
      // that key's bucket — the manifest diff of the txn version
      // names exactly one changed data-bucket entry (the scale
      // property: txn cost is O(affected keys + touched buckets),
      // never O(table))
      create("txn_fp")
      Seq.tabulate(64)(i => (i.toLong + 1, i.toLong)).toDF("a", "b")
        .createOrReplaceTempView("txn_fp_seed")
      spark.sql("INSERT INTO txn_fp SELECT a, b FROM txn_fp_seed")
      spark.sql(
        """BEGIN;
          |UPDATE txn_fp SET n = 999 WHERE user_id = 17;
          |DELETE FROM txn_fp WHERE user_id = 17;
          |INSERT INTO txn_fp VALUES (17, 1000);
          |COMMIT""".stripMargin).collect()
      val fs = new org.apache.hadoop.fs.Path(s"$root/txn_fp")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val m1 = graft.streaming.IngestIndex
        .readManifest(fs, s"$root/txn_fp", 1L)
      val m2 = graft.streaming.IngestIndex
        .readManifest(fs, s"$root/txn_fp", 2L)
      val changed = (m1.keySet ++ m2.keySet).flatMap { t =>
        val a = m1.getOrElse(t, Map.empty)
        val b = m2.getOrElse(t, Map.empty)
        (a.keySet ++ b.keySet).filter(k => a.get(k) != b.get(k))
          .map(t -> _)
      }
      assert(changed.size == 1 && changed.head._1 == "txn_fp",
        s"one-key txn touched ${changed.size} bucket entries: $changed")
      assert(spark.sql("SELECT n FROM txn_fp WHERE user_id = 17")
        .collect().head.getLong(0) == 1000L)
    } finally {
      Seq("txn_t", "txn_seq", "txn_q", "txn_fp").foreach { n =>
        graft.operators.GraftSql.unregisterTable(n)
        graft.streaming.IngestIndex.unregisterKeyCols(n)
      }
    }
  }

  test("DELETE FROM / UPDATE (r18): row-level DML through spark.sql — " +
    "DV tombstones, copy-on-write update, truncate form, no-op on an " +
    "empty table, guard rails, extension-free twin") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    val state = java.nio.file.Files
      .createTempDirectory("graft-sqldml").toString + "/users"
    try {
      spark.sql(
        s"""CREATE TABLE dml_users (
           |  user_id BIGINT, n_events BIGINT, score DOUBLE,
           |  PRIMARY KEY (user_id)
           |) USING graft LOCATION '$state'""".stripMargin)
      // DML on a CREATEd-but-never-loaded table: Delta-like no-op at v0
      assert(spark.sql("DELETE FROM dml_users WHERE user_id = 1")
        .collect().head.getLong(0) == 0L)
      assert(spark.sql("UPDATE dml_users SET score = 0.0")
        .collect().head.getLong(0) == 0L)
      (1L to 8L).map(i => (i, i * 10L, i * 0.5))
        .toDF("a", "b", "c").createOrReplaceTempView("dml_src")
      spark.sql("INSERT INTO dml_users SELECT a, b, c FROM dml_src")
      // DELETE: payload + key predicates; write side is TOMBSTONES (the
      // op tag pins the path; q114d pins dv == eager)
      val v2 = spark.sql(
        "DELETE FROM dml_users WHERE n_events > 60 OR user_id = 1")
        .collect().head.getLong(0)
      assert(v2 == 2L)
      assert(spark.sql("SELECT user_id FROM dml_users ORDER BY 1")
        .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L, 5L, 6L))
      // zero matched rows: the commit is a harmless no-op version
      spark.sql("DELETE FROM dml_users WHERE user_id = 999").collect()
      // UPDATE with alias-qualified references; deleted keys (1,7,8)
      // overlap the predicate but are hidden — they must not resurrect
      val v4 = spark.sql(
        "UPDATE dml_users AS t SET score = t.score + 1.0, " +
          "n_events = t.n_events * 2 WHERE t.user_id % 2 = 1")
        .collect().head.getLong(0)
      assert(v4 == 4L)
      val rows = spark.sql(
        "SELECT user_id, n_events, score FROM dml_users ORDER BY 1")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq((2L, 20L, 1.0), (3L, 60L, 2.5), (4L, 40L, 2.0),
        (5L, 100L, 3.5), (6L, 60L, 3.0)), rows.toString)
      // provenance: each verb tagged; time travel pre-delete still
      // shows the full table (the DV is part of each snapshot)
      val hist = spark.sql("DESCRIBE HISTORY dml_users").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(hist(2L) == "delete-sql" && hist(4L) == "update-sql",
        hist.toString)
      assert(spark.sql(
        "SELECT COUNT(*) AS c FROM dml_users VERSION AS OF 1")
        .collect().head.getLong(0) == 8L)
      // guard rails, each a named error
      val e1 = intercept[Throwable] { spark.sql(
        "UPDATE dml_users SET user_id = user_id + 1") }
      assert(e1.getMessage.contains("reassigning the merge key"),
        e1.getMessage)
      // a FOREIGN-qualified RHS is a genuine reassignment, not the
      // identity no-op (r19 advisor fix): `SET user_id = foo.user_id`
      // must raise, never silently drop
      val e1b = intercept[Throwable] { spark.sql(
        "UPDATE dml_users AS t SET user_id = foo.user_id") }
      assert(e1b.getMessage.contains("reassigning the merge key"),
        e1b.getMessage)
      // ... while the TARGET-qualified identity stays a no-op
      spark.sql(
        "UPDATE dml_users AS t SET user_id = t.user_id, score = score")
        .collect()
      val e2 = intercept[Throwable] { spark.sql(
        "DELETE FROM dml_users WHERE nope = 1").collect() }
      assert(e2.getMessage.contains("not a column"), e2.getMessage)
      val e3 = intercept[Throwable] { spark.sql(
        "DELETE FROM dml_users AS t WHERE x.user_id = 1").collect() }
      assert(e3.getMessage.contains("only the target table's columns"),
        e3.getMessage)
      val e4 = intercept[Throwable] { spark.sql(
        "DELETE FROM dml_users WHERE user_id IN " +
          "(SELECT user_id FROM dml_users)").collect() }
      assert(e4.getMessage.contains("subqueries in the condition"),
        e4.getMessage)
      val e5 = intercept[Throwable] { spark.sql(
        "UPDATE dml_users SET score = 1.0, score = 2.0").collect() }
      assert(e5.getMessage.contains("assigned more than once"),
        e5.getMessage)
      // extension-free twin routes the same statements
      graft.operators.GraftSql.sql(spark,
        "UPDATE dml_users SET score = 9.9 WHERE user_id = 2").collect()
      assert(graft.operators.GraftSql.sql(spark,
        "SELECT score FROM dml_users WHERE user_id = 2")
        .collect().head.getDouble(0) == 9.9)
      // TRUNCATE form: DELETE with no WHERE — one overwrite commit, no
      // table-sized tombstone list; schema survives
      spark.sql("DELETE FROM dml_users").collect()
      val t = spark.sql("SELECT * FROM dml_users")
      assert(t.count() == 0L &&
        t.columns.toSeq == Seq("user_id", "n_events", "score"))
      val hist2 = spark.sql("DESCRIBE HISTORY dml_users").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(hist2.values.exists(_ == "truncate-sql"), hist2.toString)
      // an unregistered target falls through to Spark's own handling
      spark.range(3).createOrReplaceTempView("dml_plain")
      val e6 = intercept[Throwable] { spark.sql(
        "DELETE FROM dml_plain WHERE id = 1") }
      assert(!e6.getMessage.contains("graft"), e6.getMessage)
    } finally graft.operators.GraftSql.unregisterTable("dml_users")
  }

  test("OPTIMIZE <layout> ZORDER|HILBERT BY (r18): curve-clusters a " +
    "registered parquet layout in place — invariant contents, fewer " +
    "files, a usable stats manifest; store targets reject the clause") {
    val spark = TestSpark.spark
    val (ev, ur, vr) = graft.queries.Layout.eventRanges(spark, dir)
    val path = java.nio.file.Files
      .createTempDirectory("graft-sqlopt").toString + "/events"
    ev.repartition(40).write.mode("overwrite").parquet(path)
    graft.operators.GraftSql.registerLayout("opt_lay", path)
    try {
      val before = ev.collect().map(_.toSeq).toSet
      val out = spark.sql(
        "OPTIMIZE opt_lay HILBERT BY (user_id, value)").collect()
      assert(out.length == 1 &&
        out.head.getLong(1) < out.head.getLong(0),
        s"bin-packing must reduce the file count: ${out.toSeq}")
      val after = spark.read.parquet(path).drop("zv")
        .collect().map(_.toSeq).toSet
      assert(after == before, "OPTIMIZE changed the layout's contents")
      // the manifest landed at the FINAL path and prunes
      val (keep, total) = graft.queries.Layout
        .manifestPrunedFiles(spark, path, ur, vr)
      assert(keep.size < total.toInt,
        s"the q107 box must prune the optimized layout: $keep/$total")
      // a store target rejects the curve clause with a named error
      val (target, _) = graft.queries.MergeOps.q127Inputs(spark, dir)
      val st = stageStore(target)
      graft.operators.GraftSql.registerTable("opt_store18", st, "state")
      val e = intercept[Throwable] {
        spark.sql("OPTIMIZE opt_store18 ZORDER BY (user_id, n_events)")
      }
      assert(e.getMessage.contains("hash-bucketed"), e.getMessage)
      graft.operators.GraftSql.unregisterTable("opt_store18")
      // unregistered layout: named registration error
      val e2 = intercept[Throwable] {
        spark.sql("OPTIMIZE nope_lay ZORDER BY (a, b)")
      }
      assert(e2.getMessage.contains("registerLayout"), e2.getMessage)
    } finally graft.operators.GraftSql.unregisterLayout("opt_lay")
  }

  test("VACUUM ... RETAIN n HOURS (r18): the wall-clock window — a " +
    "young version survives where the version-count form would " +
    "reclaim it") {
    val spark = TestSpark.spark
    val (target, _) = graft.queries.MergeOps.q127Inputs(spark, dir)
    val state = stageStore(target)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // three more full-overwrite commits: every version supersedes every
    // bucket, so old version dirs are unreferenced — exactly what a
    // count-based vacuum reclaims
    (2L to 4L).foreach { v =>
      val m = graft.streaming.IngestIndex.readManifest(fs, state, v - 1)
      val nm = graft.streaming.IngestIndex.mergeCommit(spark, state, m,
        "state", v, target, (_, d) => d)
      graft.streaming.IngestIndex.writeManifest(fs, state, v,
        Map("state" -> nm))
    }
    graft.operators.GraftSql.registerTable("vac_t", state, "state")
    try {
      // hours form: every version's mtime is seconds old — NOTHING dies,
      // v1 stays time-travelable despite the aggressive count
      val del1 = spark.sql("VACUUM vac_t RETAIN 1 HOURS").collect()
      assert(del1.isEmpty, s"young versions reclaimed: ${del1.toSeq}")
      assert(graft.streaming.IngestIndex
        .tableAt(spark, state, "state", 1L).count() > 0)
      // the CONTRAST: the version-count form at the same store reclaims
      // the unreferenced tail (proving the hours run's survival was the
      // wall-clock window, not data referencing)
      val del2 = spark.sql("VACUUM vac_t RETAIN 2 VERSIONS").collect()
        .map(_.getLong(0)).toSet
      assert(del2.contains(1L), s"count vacuum kept v1: $del2")
      intercept[Throwable] {
        graft.streaming.IngestIndex
          .tableAt(spark, state, "state", 1L).count()
      }
    } finally graft.operators.GraftSql.unregisterTable("vac_t")
  }

  test("VACUUM ... DRY RUN + DESCRIBE DETAIL (r20): the dry run " +
    "reports the reclaimable set from the identical reference " +
    "computation and deletes NOTHING; the real vacuum then reclaims " +
    "exactly that set; DESCRIBE DETAIL is Delta's one-row summary") {
    val spark = TestSpark.spark
    val (target, _) = graft.queries.MergeOps.q127Inputs(spark, dir)
    val state = stageStore(target)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (2L to 4L).foreach { v =>
      val m = graft.streaming.IngestIndex.readManifest(fs, state, v - 1)
      val nm = graft.streaming.IngestIndex.mergeCommit(spark, state, m,
        "state", v, target, (_, d) => d)
      graft.streaming.IngestIndex.writeManifest(fs, state, v,
        Map("state" -> nm))
    }
    graft.operators.GraftSql.registerTable("vacdry_t", state, "state")
    try {
      // DESCRIBE DETAIL: the one-row summary, before any reclamation
      val d0 = spark.sql("DESCRIBE DETAIL vacdry_t")
      assert(d0.columns.toSeq == Seq("format", "name", "location",
        "primary_key", "current_version", "retained_versions",
        "live_buckets", "size_bytes", "last_modified"))
      val r0 = d0.collect().head
      assert(r0.getString(0) == "graft" &&
        r0.getString(1) == "vacdry_t" && r0.getString(2) == state)
      assert(r0.getString(3) ==
        graft.streaming.IngestIndex.keyColsFor("state").mkString(", "))
      assert(r0.getLong(4) == 4L && r0.getInt(5) == 4, r0.toString)
      assert(r0.getInt(6) > 0 && r0.getLong(7) > 0L &&
        r0.getLong(8) > 0L, r0.toString)
      // DRY RUN: the audit column name, a non-empty reclaimable set,
      // and NOTHING deleted (v1 stays fully travelable)
      val dryDf = spark.sql("VACUUM vacdry_t RETAIN 2 VERSIONS DRY RUN")
      assert(dryDf.columns.toSeq == Seq("reclaimable_version"))
      val dry = dryDf.collect().map(_.getLong(0)).toSet
      assert(dry.contains(1L), s"dry run saw no reclaimable v1: $dry")
      assert(graft.streaming.IngestIndex
        .tableAt(spark, state, "state", 1L).count() > 0,
        "DRY RUN deleted data")
      // the real vacuum reclaims EXACTLY the dry-run set
      val del = spark.sql("VACUUM vacdry_t RETAIN 2 VERSIONS").collect()
        .map(_.getLong(0)).toSet
      assert(del == dry, s"real vacuum ($del) != dry-run audit ($dry)")
      intercept[Throwable] {
        graft.streaming.IngestIndex
          .tableAt(spark, state, "state", 1L).count()
      }
      // the summary reflects the reclamation
      assert(spark.sql("DESCRIBE DETAIL vacdry_t").collect().head
        .getInt(5) == 4 - dry.size)
      // unregistered names delegate to Spark untouched
      val e = intercept[Throwable] {
        spark.sql("DESCRIBE DETAIL no_such_detail_t") }
      assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"),
        e.getMessage)
    } finally graft.operators.GraftSql.unregisterTable("vacdry_t")
  }

  test("TIMESTAMP AS OF (r18): epoch-millis and string-literal forms " +
    "resolve through manifest mtimes; unsupported travel specs on a " +
    "registered name throw NAMED errors, not table-not-found") {
    val spark = TestSpark.spark
    val (target, source) = graft.queries.MergeOps.q127Inputs(spark, dir)
    val state = stageStore(target)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = graft.streaming.IngestIndex.readManifest(fs, state, 1L)
    val m2 = graft.streaming.IngestIndex.mergeCommit(spark, state, m1,
      "state", 2L, source, graft.queries.MergeOps.q127Merge)
    graft.streaming.IngestIndex.writeManifest(fs, state, 2L,
      Map("state" -> m2))
    graft.operators.GraftSql.registerTable("tt_t", state, "state")
    try {
      val hist = graft.streaming.IngestIndex.describeHistory(fs, state)
        .map(h => h.version -> h.manifestMtime).toMap
      val v1 = graft.streaming.IngestIndex
        .tableAt(spark, state, "state", 1L)
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      // epoch-millis form, instant just before v2's commit -> v1
      val viaMillis = spark.sql(
        s"SELECT * FROM tt_t TIMESTAMP AS OF ${hist(2L) - 1} " +
          "ORDER BY user_id").collect().map(_.toSeq).toSeq
      assert(viaMillis == v1, "millis timestamp travel != tableAt(1)")
      // string-literal form (session tz is UTC): the same instant
      val iso = java.time.Instant.ofEpochMilli(hist(2L) - 1)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      val viaString = spark.sql(
        s"SELECT * FROM tt_t TIMESTAMP AS OF '$iso' ORDER BY user_id")
        .collect().map(_.toSeq).toSeq
      assert(viaString == v1, "string timestamp travel != tableAt(1)")
      // an instant at/after v2's commit reads the CURRENT snapshot
      val now = spark.sql(
        s"SELECT * FROM tt_t TIMESTAMP AS OF ${hist(2L)} " +
          "ORDER BY user_id").collect().map(_.toSeq).toSeq
      assert(now == graft.streaming.IngestIndex
        .currentTable(spark, state, "state")
        .orderBy("user_id").collect().map(_.toSeq).toSeq)
      // too-early: named range error, not table-not-found
      val e1 = intercept[Throwable] {
        spark.sql("SELECT * FROM tt_t TIMESTAMP AS OF 1000").collect()
      }
      assert(e1.getMessage.contains("precedes every retained commit"),
        e1.getMessage)
      // non-numeric version: named error
      val e2 = intercept[Throwable] {
        spark.sql("SELECT * FROM tt_t VERSION AS OF 'abc'").collect()
      }
      assert(e2.getMessage.contains("non-numeric"), e2.getMessage)
      // current_timestamp() is CONSTANT-FOLDED by the analyzer before
      // the rule sees it — it legitimately travels to "now" (= latest)
      val nowRead = spark.sql(
        "SELECT * FROM tt_t TIMESTAMP AS OF current_timestamp() " +
          "ORDER BY user_id").collect().map(_.toSeq).toSeq
      assert(nowRead == now, "TIMESTAMP AS OF current_timestamp() must " +
        "read the latest snapshot")
      // a genuinely non-literal timestamp: named error
      val e3 = intercept[Throwable] {
        spark.sql("SELECT * FROM tt_t TIMESTAMP AS OF rand()").collect()
      }
      assert(e3.getMessage.contains("literal"), e3.getMessage)
      // RESTORE ... TIMESTAMP AS OF (r20): resolves through versionAt
      // — the SAME instant that travels to v1 restores to v1 (one new
      // version whose manifest is v1's; contents == the v1 read).
      // Runs LAST: the restore changes the current snapshot.
      val rv = spark.sql(
        s"RESTORE TABLE tt_t TIMESTAMP AS OF ${hist(2L) - 1}")
        .collect().head.getLong(0)
      assert(rv == 3L, s"restore committed v$rv")
      assert(spark.sql("SELECT * FROM tt_t ORDER BY user_id")
        .collect().map(_.toSeq).toSeq == v1,
        "timestamp restore != the v1 contents")
      // pre-history instant: versionAt's named retention error
      val eR = intercept[Throwable] {
        spark.sql("RESTORE TABLE tt_t TIMESTAMP AS OF 1000") }
      assert(eR.getMessage.contains("precedes every retained commit"),
        eR.getMessage)
    } finally graft.operators.GraftSql.unregisterTable("tt_t")
  }

  test("composite-key SQL MERGE (r18): a two-key store table MERGEs " +
    "via SQL == the DataFrame MergeInto row for row; partial-key ON " +
    "throws a named coverage error") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    // 'band' is the registry's two-key table: keyed by (b, bv)
    val target = Seq((0, 10L, 1L), (0, 11L, 2L), (1, 10L, 3L),
      (2, 20L, 4L)).toDF("b", "bv", "cnt")
    val source = Seq((0, 10L, 5L), (1, 10L, 6L), (3, 30L, 7L),
      (0, 99L, 8L)).toDF("b", "bv", "cnt")
    def stage(): String = {
      val state = java.nio.file.Files
        .createTempDirectory("graft-ckmerge").toString + "/state"
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val m1 = graft.streaming.IngestIndex.mergeCommit(spark, state,
        Map.empty, "band", 1L, target, (_, d) => d)
      graft.streaming.IngestIndex.writeManifest(fs, state, 1L,
        Map("band" -> m1))
      state
    }
    def rows(state: String): Seq[(Int, Long, Long)] =
      graft.streaming.IngestIndex.currentTable(spark, state, "band")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
    // DataFrame twin
    val dfState = stage()
    val fs = new org.apache.hadoop.fs.Path(dfState)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = graft.streaming.IngestIndex.readManifest(fs, dfState, 1L)
    val merge = graft.operators.MergeInto(
      keys = Seq("b", "bv"), payload = Seq("cnt"),
      matched = Seq(graft.operators.MergeClause.update(
        Map("cnt" -> (org.apache.spark.sql.functions.col("t_cnt") +
          org.apache.spark.sql.functions.col("s_cnt"))))),
      notMatched = Seq(graft.operators.MergeClause.insert()))
    val m2 = graft.streaming.IngestIndex.mergeCommit(spark, dfState, m1,
      "band", 2L, source, merge)
    graft.streaming.IngestIndex.writeManifest(fs, dfState, 2L,
      Map("band" -> m2))
    // SQL path
    val sqlState = stage()
    graft.operators.GraftSql.registerTable("ck_t", sqlState, "band")
    source.createOrReplaceTempView("ck_src")
    try {
      spark.sql(
        """MERGE INTO ck_t AS t USING ck_src AS s
          |ON t.b = s.b AND t.bv = s.bv
          |WHEN MATCHED THEN UPDATE SET cnt = t.cnt + s.cnt
          |WHEN NOT MATCHED THEN INSERT (b, bv, cnt)
          |  VALUES (s.b, s.bv, s.cnt)""".stripMargin).collect()
      assert(rows(sqlState) === rows(dfState),
        "composite-key SQL MERGE != DataFrame MergeInto")
      // sanity: both matched adds and both inserts landed
      assert(rows(sqlState).toSet ===
        Set((0, 10L, 6L), (0, 11L, 2L), (1, 10L, 9L), (2, 20L, 4L),
          (3, 30L, 7L), (0, 99L, 8L)))
      // partial-key ON: named coverage error
      val e1 = intercept[Throwable] {
        spark.sql(
          """MERGE INTO ck_t AS t USING ck_src AS s
            |ON t.b = s.b
            |WHEN MATCHED THEN DELETE""".stripMargin).collect()
      }
      assert(e1.getMessage.contains("keyed by"), e1.getMessage)
      // INSERT listing only one key: named error
      val e2 = intercept[Throwable] {
        spark.sql(
          """MERGE INTO ck_t AS t USING ck_src AS s
            |ON t.b = s.b AND t.bv = s.bv
            |WHEN NOT MATCHED THEN INSERT (b, cnt) VALUES (s.b, s.cnt)
            |""".stripMargin).collect()
      }
      assert(e2.getMessage.contains("every merge key"), e2.getMessage)
      // INSERT * round-trips the composite key verbatim
      spark.sql(
        """MERGE INTO ck_t AS t USING ck_src AS s
          |ON t.b = s.b AND t.bv = s.bv
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      assert(rows(sqlState) === rows(dfState),
        "INSERT *-only merge of already-present keys must be a no-op")
    } finally graft.operators.GraftSql.unregisterTable("ck_t")
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

  test("randomized FULL-VERB interleaving (r20): a random SQL program " +
    "over INSERT / UPDATE / DELETE / TRUNCATE / ADD-RENAME-DROP " +
    "COLUMN / BEGIN..COMMIT agrees with a pure in-memory model after " +
    "EVERY statement, and VERSION AS OF reads each recorded " +
    "snapshot's own shape") {
    Seq(20260817L, 424242L).foreach(runFuzzProgram)
  }

  private def runFuzzProgram(seed: Long): Unit = {
    val spark = TestSpark.spark
    val state = java.nio.file.Files
      .createTempDirectory(s"graft-fuzz-$seed").toString + "/t"
    // the model: declared payload order + live rows (by key, values by
    // current column name); x-values drop to None on DROP+re-ADD (the
    // honest-drop law: re-added columns must never resurrect bytes)
    var cols = Vector("n", "tag") // payload order after user_id
    var rows = Map.empty[Long, Map[String, Any]]
    var nextKey = 100L
    var renameI = 0
    val rnd = new scala.util.Random(seed)
    val hist = scala.collection.mutable.Map.empty[
      Long, (Vector[String], Map[Long, Map[String, Any]])]
    def lit(c: String, v: Any): String = v match {
      case None => "NULL"
      case Some(x) => lit(c, x)
      case s: String => s"'$s'"
      case d: Double => d.toString
      case l: Long => l.toString
      case other => other.toString
    }
    def readBack(): Map[Long, Map[String, Any]] = {
      val df = spark.sql("SELECT * FROM fuzz_t")
      assert(df.columns.toSeq == ("user_id" +: cols),
        s"declared order diverged: ${df.columns.toSeq} vs $cols")
      df.collect().map { r =>
        r.getAs[Long]("user_id") -> cols.map { c =>
          c -> (Option(r.getAs[Any](c)) match {
            case sm @ Some(_) if c == "x" => sm
            case Some(v) => v
            case None if c == "x" => None
            case None => null
          })
        }.toMap
      }.toMap
    }
    def top(): Long = spark.sql("DESCRIBE HISTORY fuzz_t").collect()
      .map(_.getLong(0)).maxOption.getOrElse(0L)
    try {
      spark.sql(s"CREATE TABLE fuzz_t (user_id BIGINT, n BIGINT, " +
        s"tag STRING, PRIMARY KEY (user_id)) USING graft " +
        s"LOCATION '$state'")
      (1 to 14).foreach { step =>
        rnd.nextInt(10) match {
          case 0 | 1 | 2 =>
            // INSERT fresh keys, positional against the CURRENT shape
            val ks = (0 until 1 + rnd.nextInt(3)).map(_ =>
              { nextKey += 1; nextKey })
            val vals = ks.map { k =>
              val m = cols.map {
                case "n" => "n" -> (k * 10L)
                case "tag" => "tag" -> s"t$k"
                case c if c.startsWith("lbl") => c -> s"t$k"
                case "x" => "x" -> Some(k * 0.5)
              }.toMap
              rows += k -> m
              "(" + (k +: cols.map(c => lit(c, m(c)))).mkString(", ") +
                ")"
            }
            spark.sql(s"INSERT INTO fuzz_t VALUES ${vals.mkString(", ")}")
          case 3 | 4 =>
            // UPDATE a numeric slice (simultaneous-assignment verb)
            val k = 2 + rnd.nextInt(3); val r = rnd.nextInt(k)
            val c = 1 + rnd.nextInt(9)
            spark.sql(s"UPDATE fuzz_t SET n = n + $c " +
              s"WHERE user_id % $k = $r")
            rows = rows.map { case (key, m) =>
              key -> (if (key % k == r)
                m + ("n" -> (m("n").asInstanceOf[Long] + c)) else m)
            }
          case 5 =>
            // DELETE a slice (DV tombstones)
            val k = 2 + rnd.nextInt(4); val r = rnd.nextInt(k)
            spark.sql(s"DELETE FROM fuzz_t WHERE user_id % $k = $r")
            rows = rows.filter { case (key, _) => key % k != r }
          case 6 =>
            // RENAME the tag-family column (copy-on-write rewrite)
            val cur = cols.find(c => c == "tag" || c.startsWith("lbl")).get
            renameI += 1
            val nn = s"lbl$renameI"
            spark.sql(s"ALTER TABLE fuzz_t RENAME COLUMN $cur TO $nn")
            cols = cols.map(c => if (c == cur) nn else c)
            rows = rows.map { case (k, m) =>
              k -> (m - cur + (nn -> m(cur))) }
          case 7 =>
            // DROP x if present, else ADD it (re-added x reads NULL —
            // the honest drop physically removed the old bytes)
            if (cols.contains("x")) {
              spark.sql("ALTER TABLE fuzz_t DROP COLUMN x")
              cols = cols.filterNot(_ == "x")
              rows = rows.map { case (k, m) => k -> (m - "x") }
            } else {
              spark.sql("ALTER TABLE fuzz_t ADD COLUMNS (x DOUBLE)")
              cols = cols :+ "x"
              rows = rows.map { case (k, m) => k -> (m + ("x" -> None)) }
            }
          case 8 =>
            // TRUNCATE: one commit, declared shape survives
            spark.sql("TRUNCATE TABLE fuzz_t")
            rows = Map.empty
          case 9 =>
            // BEGIN..COMMIT: insert + update + delete, ONE commit
            nextKey += 1; val k1 = nextKey
            val m1 = cols.map {
              case "n" => "n" -> (k1 * 10L)
              case "tag" => "tag" -> s"t$k1"
              case c if c.startsWith("lbl") => c -> s"t$k1"
              case "x" => "x" -> Some(k1 * 0.5)
            }.toMap
            spark.sql(
              s"""BEGIN;
                 |INSERT INTO fuzz_t VALUES (${(k1 +: cols.map(c =>
                    lit(c, m1(c)))).mkString(", ")});
                 |UPDATE fuzz_t SET n = n + 1000 WHERE user_id % 2 = 0;
                 |DELETE FROM fuzz_t WHERE user_id % 11 = 3;
                 |COMMIT""".stripMargin)
            rows += k1 -> m1
            rows = rows.map { case (key, m) =>
              key -> (if (key % 2 == 0)
                m + ("n" -> (m("n").asInstanceOf[Long] + 1000L)) else m)
            }
            rows = rows.filter { case (key, _) => key % 11 != 3 }
        }
        // THE LAW: the store == the model after every statement
        val got = readBack()
        assert(got == rows,
          s"step $step: store diverged from the model\n" +
            s"extra: ${(got.keySet -- rows.keySet).take(5)}\n" +
            s"missing: ${(rows.keySet -- got.keySet).take(5)}\n" +
            s"diff: ${got.keySet.intersect(rows.keySet)
              .filter(k => got(k) != rows(k)).take(3)
              .map(k => s"$k: ${got(k)} vs ${rows(k)}")}")
        hist(top()) = (cols, rows)
      }
      // TIME TRAVEL LAW: every recorded snapshot reads its OWN shape
      // and contents (old versions' files untouched by any rewrite) —
      // full canonical-row comparison against the model's snapshot
      hist.toSeq.sortBy(_._1).foreach { case (v, (vcols, vrows)) =>
        if (v >= 1) {
          val df = spark.sql(s"SELECT * FROM fuzz_t VERSION AS OF $v")
          assert(df.count() == vrows.size,
            s"VERSION AS OF $v: ${df.count()} rows, model ${vrows.size}")
          if (vrows.nonEmpty) {
            // a recorded column the PHYSICAL snapshot lacks is legal
            // ONLY when it was declared after this version's commit
            // (ADD COLUMNS is metadata-only — time travel reads the
            // committed width, current reads widen) — in that state
            // every model value for it is None by construction
            val physical = df.columns.toSet
            val (present, declaredOnly) =
              vcols.partition(physical.contains)
            declaredOnly.foreach { c =>
              assert(vrows.values.forall(m => m(c) == None),
                s"VERSION AS OF $v lacks column '$c' that the model " +
                  s"holds NON-NULL values for")
            }
            val got = df.collect().map { r =>
              r.getAs[Long]("user_id") -> present.map { c =>
                c -> (Option(r.getAs[Any](c)) match {
                  case sm @ Some(_) if c == "x" => sm
                  case Some(value) => value
                  case None if c == "x" => None
                  case None => null
                })
              }.toMap
            }.toMap
            val want = vrows.map { case (k, m) =>
              k -> m.filter { case (c, _) => present.contains(c) } }
            assert(got == want,
              s"VERSION AS OF $v contents diverged from the model " +
                s"snapshot (cols $present): sample diff " +
                s"${got.keySet.intersect(want.keySet)
                  .filter(k => got(k) != want(k)).take(3)
                  .map(k => s"$k: ${got(k)} vs ${want(k)}")}")
          }
        }
      }
    } finally {
      graft.operators.GraftSql.unregisterTable("fuzz_t")
      graft.streaming.IngestIndex.unregisterKeyCols("fuzz_t")
    }
  }
}
