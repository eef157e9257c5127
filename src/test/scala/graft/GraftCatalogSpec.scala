package graft

import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 session catalog (r18): graft store tables as Spark-native
  * catalog objects — standard DDL/DML/read statements over three-part
  * names, reads plan-identical to the DataFrame verbs, writes through
  * the store's guarded commits.
  */
class GraftCatalogSpec extends AnyFunSuite {

  private lazy val root: String = {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft-catalog").toString
    spark.conf.set("spark.sql.catalog.gcat",
      classOf[graft.operators.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.location", dir)
    dir
  }

  test("catalog lifecycle: CREATE (native PRIMARY KEY grammar), SHOW " +
    "TABLES, empty read, INSERT, SELECT, DESCRIBE, DROP") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    root // force catalog registration
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns1")
    spark.sql(
      """CREATE TABLE gcat.ns1.users (
        |  user_id BIGINT, n_events BIGINT, score DOUBLE,
        |  PRIMARY KEY (user_id)
        |)""".stripMargin)
    try {
      // catalog visibility
      val shown = spark.sql("SHOW TABLES IN gcat.ns1").collect()
        .map(_.getString(1)).toSeq
      assert(shown == Seq("users"), shown.toString)
      // empty read with the declared schema
      val empty = spark.sql("SELECT * FROM gcat.ns1.users")
      assert(empty.columns.toSeq == Seq("user_id", "n_events", "score"))
      assert(empty.count() == 0L)
      // CREATE again: catalog-standard error; IF NOT EXISTS: no-op
      intercept[Throwable] { spark.sql(
        "CREATE TABLE gcat.ns1.users (x BIGINT, PRIMARY KEY (x))") }
      spark.sql("CREATE TABLE IF NOT EXISTS gcat.ns1.users " +
        "(x BIGINT, PRIMARY KEY (x))")
      // PRIMARY KEY required (the pre-constraint path names the fix)
      val e0 = intercept[Throwable] { spark.sql(
        "CREATE TABLE gcat.ns1.nokeys (x BIGINT)") }
      assert(e0.getMessage.contains("PRIMARY KEY"), e0.getMessage)
      // INSERT INTO through the DSv2 V1-write fallback (positional)
      Seq((1L, 10L, 0.5), (2L, 20L, 0.7), (3L, 30L, 0.9))
        .toDF("a", "b", "c").createOrReplaceTempView("gcat_src")
      spark.sql("INSERT INTO gcat.ns1.users SELECT * FROM gcat_src")
      val rows = spark.sql(
        "SELECT user_id, n_events, score FROM gcat.ns1.users ORDER BY 1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
      assert(rows == Seq((1L, 10L, 0.5), (2L, 20L, 0.7), (3L, 30L, 0.9)),
        rows.toString)
      // PK guard fires through the catalog write path too
      val e1 = intercept[Throwable] {
        spark.sql("INSERT INTO gcat.ns1.users SELECT * FROM gcat_src")
          .collect()
      }
      assert(e1.getMessage.contains("already exists"), e1.getMessage)
      // INSERT OVERWRITE replaces contents
      spark.sql("INSERT OVERWRITE gcat.ns1.users " +
        "SELECT a + 100, b, c FROM gcat_src")
      val after = spark.sql(
        "SELECT user_id FROM gcat.ns1.users ORDER BY 1")
        .collect().map(_.getLong(0)).toSeq
      assert(after == Seq(101L, 102L, 103L), after.toString)
      // DESCRIBE TABLE shows the declared columns
      val desc = spark.sql("DESCRIBE TABLE gcat.ns1.users").collect()
        .map(_.getString(0)).toSeq
      assert(desc.contains("user_id") && desc.contains("score"), desc)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcat.ns1.users")
      graft.streaming.IngestIndex.unregisterKeyCols("ns1.users")
    }
    // dropped: gone from the catalog and unreadable
    assert(spark.sql("SHOW TABLES IN gcat.ns1").collect().isEmpty)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM gcat.ns1.users").collect()
    }
  }

  test("catalog CTAS (r19): CREATE TABLE cat.ns.t USING graft " +
    "TBLPROPERTIES('primary_key'=...) AS SELECT — Spark's native DSv2 " +
    "CTAS path creates + seeds through the V1-write fallback") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.nsc")
    Seq((1L, 10L, 0.5), (2L, 20L, 0.7), (2L, 21L, 0.9))
      .toDF("user_id", "n_events", "score")
      .createOrReplaceTempView("gcat_ctas_src")
    try {
      spark.sql(
        """CREATE TABLE gcat.nsc.agg USING graft
          |TBLPROPERTIES ('primary_key' = 'user_id')
          |AS SELECT user_id, SUM(n_events) AS n_events,
          |  COUNT(*) AS n
          |FROM gcat_ctas_src GROUP BY user_id""".stripMargin)
      val rows = spark.sql(
        "SELECT user_id, n_events, n FROM gcat.nsc.agg ORDER BY 1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(rows == Seq((1L, 10L, 1L), (2L, 41L, 2L)), rows)
      // the created identity is a real keyed store: the PK guard holds
      val e = intercept[Throwable] { spark.sql(
        "INSERT INTO gcat.nsc.agg VALUES (1, 5, 1)").collect() }
      assert(e.getMessage.contains("already exists"), e.getMessage)
      // every verb composes on the CTAS-created table
      spark.sql("DELETE FROM gcat.nsc.agg WHERE user_id = 1")
      assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.nsc.agg")
        .collect().head.getLong(0) == 1L)
      // no primary_key property and no constraint: the error names
      // BOTH fixes
      val e2 = intercept[Throwable] { spark.sql(
        "CREATE TABLE gcat.nsc.nokeys USING graft AS " +
          "SELECT 1L AS x") }
      assert(e2.getMessage.contains("primary_key"), e2.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcat.nsc.agg")
      graft.streaming.IngestIndex.unregisterKeyCols("nsc.agg")
    }
  }

  test("CREATE OR REPLACE TABLE (r19): the non-staging drop+create " +
    "path composes — the replaced table may even change its PRIMARY " +
    "KEY (dropTable releases the binding)") {
    val spark = TestSpark.spark
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.nsr")
    try {
      spark.sql("CREATE TABLE gcat.nsr.t (a BIGINT, b BIGINT, " +
        "PRIMARY KEY (a))")
      spark.sql("INSERT INTO gcat.nsr.t VALUES (1, 10)")
      // REPLACE: new schema, DIFFERENT key; contents reset
      spark.sql("CREATE OR REPLACE TABLE gcat.nsr.t (a BIGINT, " +
        "b BIGINT, c STRING, PRIMARY KEY (b))")
      assert(graft.streaming.IngestIndex.keyColsFor("nsr.t") == Seq("b"))
      val t = spark.sql("SELECT * FROM gcat.nsr.t")
      assert(t.columns.toSeq == Seq("a", "b", "c") && t.count() == 0L)
      spark.sql("INSERT INTO gcat.nsr.t VALUES (1, 10, 'x')")
      // the key is b now: a duplicate b collides, a duplicate a is fine
      spark.sql("INSERT INTO gcat.nsr.t VALUES (1, 11, 'y')")
      val e = intercept[Throwable] { spark.sql(
        "INSERT INTO gcat.nsr.t VALUES (9, 10, 'z')").collect() }
      assert(e.getMessage.contains("already exists"), e.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcat.nsr.t")
      graft.streaming.IngestIndex.unregisterKeyCols("nsr.t")
    }
  }

  test("DROP NAMESPACE CASCADE unregisters the tables it deletes " +
    "(r19 advisor fix): re-creating a same-named table with a " +
    "DIFFERENT primary key in the same JVM succeeds") {
    val spark = TestSpark.spark
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.nsd")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.nsd.inner")
    try {
      spark.sql("CREATE TABLE gcat.nsd.t (a BIGINT, b BIGINT, " +
        "PRIMARY KEY (a))")
      // a table inside a NESTED namespace must unregister too
      spark.sql("CREATE TABLE gcat.nsd.inner.t2 (x BIGINT, y BIGINT, " +
        "PRIMARY KEY (x))")
      spark.sql("DROP NAMESPACE gcat.nsd CASCADE")
      // rebinding both names to different keys now succeeds — the
      // cascade delete released the key-registry bindings like
      // dropTable does
      spark.sql("CREATE NAMESPACE gcat.nsd")
      spark.sql("CREATE NAMESPACE gcat.nsd.inner")
      spark.sql("CREATE TABLE gcat.nsd.t (a BIGINT, b BIGINT, " +
        "PRIMARY KEY (b))")
      spark.sql("CREATE TABLE gcat.nsd.inner.t2 (x BIGINT, y BIGINT, " +
        "PRIMARY KEY (y))")
      assert(graft.streaming.IngestIndex.keyColsFor("nsd.t") == Seq("b"))
      assert(graft.streaming.IngestIndex.keyColsFor("nsd.inner.t2")
        == Seq("y"))
    } finally {
      spark.sql("DROP NAMESPACE IF EXISTS gcat.nsd CASCADE")
      graft.streaming.IngestIndex.unregisterKeyCols("nsd.t")
      graft.streaming.IngestIndex.unregisterKeyCols("nsd.inner.t2")
    }
  }

  test("RENAME TABLE (r20): a metadata move — contents, DESCRIBE " +
    "HISTORY (ops AND commit instants), and VERSION AS OF survive; the " +
    "old name releases its key binding; guard rails for existing / " +
    "missing targets") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    root // force catalog registration
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.nsr")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.nsr2")
    spark.sql("CREATE TABLE gcat.nsr.src (user_id BIGINT, " +
      "n_events BIGINT, PRIMARY KEY (user_id))")
    try {
      Seq((1L, 10L), (2L, 20L)).toDF("a", "b")
        .createOrReplaceTempView("ren_src1")
      Seq((3L, 30L), (4L, 40L)).toDF("a", "b")
        .createOrReplaceTempView("ren_src2")
      spark.sql("INSERT INTO gcat.nsr.src SELECT * FROM ren_src1")
      spark.sql("INSERT INTO gcat.nsr.src SELECT * FROM ren_src2")
      spark.sql("DELETE FROM gcat.nsr.src WHERE user_id = 4")
      def canon(sqlText: String): Seq[(Long, Long)] =
        spark.sql(sqlText).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val before = canon(
        "SELECT user_id, n_events FROM gcat.nsr.src ORDER BY 1")
      val beforeV1 = canon("SELECT user_id, n_events FROM gcat.nsr.src " +
        "VERSION AS OF 1 ORDER BY 1")
      val histBefore = spark.sql("DESCRIBE HISTORY gcat.nsr.src")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val mtimesBefore = graft.streaming.IngestIndex.describeHistory(
        new org.apache.hadoop.fs.Path(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration),
        s"$root/nsr/src").map(h => h.version -> h.manifestMtime).toMap
      spark.sql("ALTER TABLE gcat.nsr.src RENAME TO nsr.tgt")
      // the old name is gone everywhere
      val shown = spark.sql("SHOW TABLES IN gcat.nsr").collect()
        .map(_.getString(1)).toSeq
      assert(shown == Seq("tgt"), shown.toString)
      intercept[Throwable] {
        spark.sql("SELECT * FROM gcat.nsr.src").collect() }
      // contents, history (operations AND commit instants) and time
      // travel all survive — the rename moved metadata, not history
      assert(canon("SELECT user_id, n_events FROM gcat.nsr.tgt " +
        "ORDER BY 1") == before)
      assert(canon("SELECT user_id, n_events FROM gcat.nsr.tgt " +
        "VERSION AS OF 1 ORDER BY 1") == beforeV1)
      val histAfter = spark.sql("DESCRIBE HISTORY gcat.nsr.tgt")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(histAfter == histBefore, s"$histAfter != $histBefore")
      val mtimesAfter = graft.streaming.IngestIndex.describeHistory(
        new org.apache.hadoop.fs.Path(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration),
        s"$root/nsr/tgt").map(h => h.version -> h.manifestMtime).toMap
      assert(mtimesAfter == mtimesBefore,
        "manifest mtimes (commit instants) shifted across the rename")
      // DML composes under the new name; the PK guard fires on it
      spark.sql("INSERT INTO gcat.nsr.tgt SELECT a + 100, b " +
        "FROM ren_src1")
      val e1 = intercept[Throwable] {
        spark.sql("INSERT INTO gcat.nsr.tgt SELECT * FROM ren_src1")
          .collect() }
      assert(e1.getMessage.contains("already exists"), e1.getMessage)
      // the OLD name's key binding released: re-CREATE with a
      // DIFFERENT primary key
      spark.sql("CREATE TABLE gcat.nsr.src (n_events BIGINT, " +
        "user_id BIGINT, PRIMARY KEY (n_events))")
      spark.sql("INSERT INTO gcat.nsr.src SELECT b, a FROM ren_src1")
      assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.nsr.src")
        .collect().head.getLong(0) == 2L)
      // guard rails: rename onto a live table / from a missing one
      intercept[org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException] {
        spark.sessionState.catalogManager.catalog("gcat")
          .asInstanceOf[org.apache.spark.sql.connector.catalog
            .TableCatalog]
          .renameTable(
            org.apache.spark.sql.connector.catalog.Identifier
              .of(Array("nsr"), "src"),
            org.apache.spark.sql.connector.catalog.Identifier
              .of(Array("nsr"), "tgt"))
      }
      intercept[Throwable] {
        spark.sql("ALTER TABLE gcat.nsr.no_such RENAME TO nsr.x") }
      // CROSS-NAMESPACE move: the same metadata move into another dir
      spark.sql("ALTER TABLE gcat.nsr.tgt RENAME TO nsr2.tgt2")
      assert(canon("SELECT user_id, n_events FROM gcat.nsr2.tgt2 " +
        "WHERE user_id <= 4 ORDER BY 1") == before)
      assert(spark.sql("SHOW TABLES IN gcat.nsr").collect()
        .map(_.getString(1)).toSeq == Seq("src"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcat.nsr.src")
      spark.sql("DROP TABLE IF EXISTS gcat.nsr.tgt")
      spark.sql("DROP TABLE IF EXISTS gcat.nsr2.tgt2")
      graft.streaming.IngestIndex.unregisterKeyCols("nsr.src")
      graft.streaming.IngestIndex.unregisterKeyCols("nsr.tgt")
      graft.streaming.IngestIndex.unregisterKeyCols("nsr2.tgt2")
    }
  }

  test("a FILTERED overwrite is rejected at ANALYSIS with Spark's " +
    "named error (r19 advisor fix): the table advertises TRUNCATE, " +
    "not OVERWRITE_BY_FILTER") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.nsf")
    spark.sql("CREATE TABLE gcat.nsf.t (a BIGINT, b BIGINT, " +
      "PRIMARY KEY (a))")
    try {
      Seq((1L, 10L)).toDF("a", "b")
        .writeTo("gcat.nsf.t").append()
      // full overwrite (INSERT OVERWRITE -> AlwaysTrue filter) works
      // through TRUNCATE
      spark.sql("INSERT OVERWRITE gcat.nsf.t VALUES (2, 20)")
      assert(spark.sql("SELECT a FROM gcat.nsf.t").collect()
        .map(_.getLong(0)).toSeq == Seq(2L))
      // a non-trivial overwrite filter dies at ANALYSIS, not deep in
      // the V1 write path at execution
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        Seq((3L, 30L)).toDF("a", "b")
          .writeTo("gcat.nsf.t")
          .overwrite(org.apache.spark.sql.functions.col("a") === 2L)
      }
      assert(e.getMessage.toLowerCase.contains("overwrite"),
        e.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcat.nsf.t")
      graft.streaming.IngestIndex.unregisterKeyCols("nsf.t")
    }
  }

  test("ALTER TABLE ADD COLUMNS (r18): metadata-only widening — added " +
    "columns read NULL, writes carry them, drops/renames are named " +
    "errors") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns3")
    spark.sql(
      """CREATE TABLE gcat.ns3.widen (
        |  user_id BIGINT, a BIGINT, PRIMARY KEY (user_id)
        |)""".stripMargin)
    try {
      Seq((1L, 10L), (2L, 20L)).toDF("u", "n")
        .createOrReplaceTempView("widen_src")
      spark.sql("INSERT INTO gcat.ns3.widen SELECT * FROM widen_src")
      spark.sql("ALTER TABLE gcat.ns3.widen ADD COLUMNS (b DOUBLE)")
      // visible immediately, NULL until data carries it — no files
      // rewrote (metadata-only: the commit count is unchanged)
      val afterAlter = spark.sql(
        "SELECT user_id, b FROM gcat.ns3.widen ORDER BY 1").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toSeq
      assert(afterAlter == Seq(1L -> None, 2L -> None), afterAlter)
      assert(spark.sql("DESCRIBE HISTORY gcat.ns3.widen")
        .collect().length == 1) // still just the INSERT commit
      // writes carry the new column: a 3-col INSERT and an UPDATE
      Seq((3L, 30L, 0.5)).toDF("u", "n", "b")
        .createOrReplaceTempView("widen_src3")
      spark.sql("INSERT INTO gcat.ns3.widen SELECT * FROM widen_src3")
      spark.sql("UPDATE gcat.ns3.widen SET b = 9.0 WHERE user_id = 1")
      val rows = spark.sql(
        "SELECT user_id, a, b FROM gcat.ns3.widen ORDER BY 1")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)))).toSeq
      assert(rows == Seq((1L, 10L, Some(9.0)), (2L, 20L, None),
        (3L, 30L, Some(0.5))), rows.toString)
      // guard rails — TYPED analysis errors (r19): callers matching on
      // Spark error classes see the built-in catalogs' taxonomy
      val e1 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("ALTER TABLE gcat.ns3.widen ADD COLUMNS (a BIGINT)") }
      assert(e1.getCondition == "FIELD_ALREADY_EXISTS", e1.getMessage)
      assert(e1.getMessage.contains("already exists"), e1.getMessage)
      // repositioning stays unsupported (DROP/RENAME COLUMN became
      // copy-on-write rewrites in r20 — their own test below)
      val e2 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("ALTER TABLE gcat.ns3.widen ALTER COLUMN a FIRST") }
      assert(e2.getCondition == "UNSUPPORTED_FEATURE.TABLE_OPERATION",
        e2.getMessage)
      assert(e2.getMessage.contains("column ADDITION"),
        e2.getMessage)
      // ALTER COLUMN TYPE through the CATALOG path (r20): the same
      // shared helper as the flat verb — safe widening rewrites, the
      // schema updates, and a narrowing raises the typed error
      spark.sql("ALTER TABLE gcat.ns3.widen ALTER COLUMN b TYPE DOUBLE")
      // (no-op: already DOUBLE — nothing committed)
      val before = spark.sql("DESCRIBE HISTORY gcat.ns3.widen")
        .collect().map(_.getLong(0)).max
      spark.sql("ALTER TABLE gcat.ns3.widen ALTER COLUMN a TYPE " +
        "DECIMAL(38,0)")
      // narrowing on the catalog path is rejected TWICE over: Spark's
      // own analyzer guard (canUpCast -> NOT_SUPPORTED_CHANGE_COLUMN)
      // fires first; the engine's widens() guard backstops paths that
      // bypass the analyzer (the flat verb's spec pins its message)
      val e3 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("ALTER TABLE gcat.ns3.widen ALTER COLUMN a TYPE " +
          "BIGINT") }
      assert(e3.getCondition == "NOT_SUPPORTED_CHANGE_COLUMN" ||
        (e3.getCondition == "UNSUPPORTED_FEATURE.TABLE_OPERATION" &&
          e3.getMessage.contains("safe widenings")), e3.getMessage)
      assert(spark.sql("SELECT * FROM gcat.ns3.widen").schema("a")
        .dataType == org.apache.spark.sql.types.DecimalType(38, 0))
      assert(spark.sql("DESCRIBE HISTORY gcat.ns3.widen").collect()
        .map(_.getLong(0)).max == before + 1, "retype should be ONE " +
        "copy-on-write commit")
      val sum = spark.sql("SELECT CAST(SUM(a) AS BIGINT) AS s " +
        "FROM gcat.ns3.widen").collect().head.getLong(0)
      assert(sum == 60L, s"values survived the retype rewrite: $sum")
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcat.ns3.widen")
      graft.streaming.IngestIndex.unregisterKeyCols("ns3.widen")
    }
  }

  test("DROP COLUMN / RENAME COLUMN through the CATALOG path (r20): " +
    "the same shared helpers as the flat verbs — one copy-on-write " +
    "commit each, values survive, key guards are named") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns3")
    spark.sql(
      """CREATE TABLE gcat.ns3.colalter (
        |  user_id BIGINT, n BIGINT, tag STRING, extra DOUBLE,
        |  PRIMARY KEY (user_id)
        |)""".stripMargin)
    try {
      Seq((1L, 10L, "a", 0.1), (2L, 20L, "b", 0.2),
        (3L, 30L, "c", 0.3)).toDF("u", "n", "t", "x")
        .createOrReplaceTempView("colalter_src")
      spark.sql("INSERT INTO gcat.ns3.colalter " +
        "SELECT * FROM colalter_src")
      spark.sql("ALTER TABLE gcat.ns3.colalter RENAME COLUMN tag " +
        "TO label")
      assert(spark.sql("SELECT * FROM gcat.ns3.colalter")
        .columns.toSeq == Seq("user_id", "n", "label", "extra"))
      spark.sql("ALTER TABLE gcat.ns3.colalter DROP COLUMN extra")
      assert(spark.sql("SELECT * FROM gcat.ns3.colalter")
        .columns.toSeq == Seq("user_id", "n", "label"))
      // one copy-on-write commit each: insert(1) + rename(2) + drop(3)
      val hist = spark.sql("DESCRIBE HISTORY gcat.ns3.colalter")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(hist == Map(1L -> "insert", 2L -> "rename-column",
        3L -> "drop-column"), hist)
      val rows = spark.sql("SELECT user_id, n, label " +
        "FROM gcat.ns3.colalter ORDER BY 1").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(rows == Seq((1L, 10L, "a"), (2L, 20L, "b"),
        (3L, 30L, "c")), rows.toString)
      // key guards are named on the catalog path too
      val e1 = intercept[Throwable] {
        spark.sql("ALTER TABLE gcat.ns3.colalter DROP COLUMN user_id") }
      assert(e1.getMessage.contains("PRIMARY KEY"), e1.getMessage)
      val e2 = intercept[Throwable] {
        spark.sql("ALTER TABLE gcat.ns3.colalter RENAME COLUMN " +
          "user_id TO uid") }
      assert(e2.getMessage.contains("PRIMARY KEY"), e2.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcat.ns3.colalter")
      graft.streaming.IngestIndex.unregisterKeyCols("ns3.colalter")
    }
  }

  test("TRUNCATE TABLE through the CATALOG path (r20): Spark's native " +
    "DSv2 TruncateTableExec drives the shared truncateStore commit — " +
    "one truncate-sql version, old snapshots stay readable") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns3")
    spark.sql(
      """CREATE TABLE gcat.ns3.trunc (
        |  user_id BIGINT, n BIGINT, PRIMARY KEY (user_id)
        |)""".stripMargin)
    try {
      Seq((1L, 10L), (2L, 20L)).toDF("u", "n")
        .createOrReplaceTempView("trunc_src")
      spark.sql("INSERT INTO gcat.ns3.trunc SELECT * FROM trunc_src")
      spark.sql("TRUNCATE TABLE gcat.ns3.trunc")
      assert(spark.sql("SELECT * FROM gcat.ns3.trunc").count() == 0L)
      val hist = spark.sql("DESCRIBE HISTORY gcat.ns3.trunc").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(hist == Map(1L -> "insert", 2L -> "truncate-sql"), hist)
      assert(spark.sql(
        "SELECT * FROM gcat.ns3.trunc VERSION AS OF 1").count() == 2L)
      // the emptied table accepts fresh inserts
      spark.sql("INSERT INTO gcat.ns3.trunc VALUES (9, 90)")
      assert(spark.sql("SELECT user_id FROM gcat.ns3.trunc").collect()
        .map(_.getLong(0)).toSeq == Seq(9L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcat.ns3.trunc")
      graft.streaming.IngestIndex.unregisterKeyCols("ns3.trunc")
    }
  }

  test("catalog DML: MERGE INTO / UPDATE / DELETE FROM / time travel / " +
    "lakehouse verbs over three-part names") {
    val spark = TestSpark.spark
    val sp = spark
    import sp.implicits._
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns2")
    spark.sql(
      """CREATE TABLE gcat.ns2.accounts (
        |  user_id BIGINT, n_events BIGINT, score DOUBLE,
        |  PRIMARY KEY (user_id)
        |)""".stripMargin)
    try {
      (1L to 6L).map(i => (i, i * 10L, i * 0.5))
        .toDF("user_id", "n_events", "score")
        .createOrReplaceTempView("gcat_seed")
      spark.sql("INSERT INTO gcat.ns2.accounts SELECT * FROM gcat_seed")
      // MERGE INTO over the catalog ident (resolved v2 target):
      // matched adds, unmatched inserts
      Seq((5L, 1L, 0.0), (6L, 2L, 0.0), (7L, 70L, 3.5))
        .toDF("user_id", "n_events", "score")
        .createOrReplaceTempView("gcat_delta")
      spark.sql(
        """MERGE INTO gcat.ns2.accounts AS t
          |USING gcat_delta AS s
          |ON t.user_id = s.user_id
          |WHEN MATCHED THEN UPDATE SET n_events = t.n_events + s.n_events
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      val merged = spark.sql(
        "SELECT user_id, n_events FROM gcat.ns2.accounts ORDER BY 1")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      assert(merged == Seq(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L,
        5L -> 51L, 6L -> 62L, 7L -> 70L), merged.toString)
      // DELETE (DV tombstones) + UPDATE (copy-on-write) over the ident
      spark.sql("DELETE FROM gcat.ns2.accounts WHERE user_id % 3 = 0")
      spark.sql("UPDATE gcat.ns2.accounts SET score = score + 1.0 " +
        "WHERE user_id > 4")
      val rows = spark.sql(
        "SELECT user_id, score FROM gcat.ns2.accounts ORDER BY 1")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
      assert(rows == Seq(1L -> 0.5, 2L -> 1.0, 4L -> 2.0, 5L -> 3.5,
        7L -> 4.5), rows.toString)
      // VERSION AS OF routes through the catalog's loadTable overload;
      // v1 is the seed commit
      assert(spark.sql(
        "SELECT COUNT(*) FROM gcat.ns2.accounts VERSION AS OF 1")
        .collect().head.getLong(0) == 6L)
      // TIMESTAMP AS OF resolves to the NEWEST commit at or before the
      // instant (Delta's rule) — probe just before v3's commit, which
      // lands on v2 (commits are Spark jobs apart, so v3.mtime - 1 is
      // always >= v2's mtime — the q137b argument)
      val hist = spark.sql("DESCRIBE HISTORY gcat.ns2.accounts")
        .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
      // Spark's native v2 travel path evaluates the literal AS A
      // TIMESTAMP (an integer would be epoch SECONDS) — format the
      // instant in the session timezone (UTC in TestSpark)
      val preV3 = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(hist(3L) - 1))
      val atV2 = spark.sql("SELECT COUNT(*) FROM gcat.ns2.accounts " +
        s"TIMESTAMP AS OF '$preV3'").collect().head.getLong(0)
      assert(atV2 == 7L, s"TIMESTAMP AS OF pre-v3 ($preV3) read $atV2")
      // history carries every verb's provenance
      val ops = spark.sql("DESCRIBE HISTORY gcat.ns2.accounts")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(ops(1L) == "insert" && ops(2L) == "merge-sql" &&
        ops(3L) == "delete-sql" && ops(4L) == "update-sql", ops.toString)
      // RESTORE to the pre-delete state via the verb statement
      spark.sql("RESTORE TABLE gcat.ns2.accounts TO VERSION AS OF 2")
      assert(spark.sql("SELECT COUNT(*) FROM gcat.ns2.accounts")
        .collect().head.getLong(0) == 7L)
      // key reassignment stays a named error through the catalog path
      val e = intercept[Throwable] { spark.sql(
        "UPDATE gcat.ns2.accounts SET user_id = user_id + 1") }
      assert(e.getMessage.contains("reassigning the merge key"),
        e.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcat.ns2.accounts")
      graft.streaming.IngestIndex.unregisterKeyCols("ns2.accounts")
    }
  }
}
