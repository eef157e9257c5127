package graft.operators

import graft.streaming.IngestIndex
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** The SQL `MERGE INTO` entry point (r17) — the statement every lakehouse
  * user actually types, wired to the engine's oracle-proven ordered-clause
  * MERGE algebra ([[MergeInto]]) over the bucketed persistent store
  * ([[IngestIndex]]).
  *
  * How it reaches `spark.sql(...)`: Spark's OWN parser already produces a
  * [[MergeIntoTable]] logical plan for the statement (the full SQL:2023
  * grammar — ordered WHEN clause lists, per-clause AND gates, all three
  * families, `UPDATE SET *` / `INSERT *`), so nothing is re-parsed here;
  * a resolution rule injected via [[graft.functions.GraftExtensions]]
  * intercepts plans whose target names a REGISTERED graft store table and
  * rewrites them to a [[GraftMergeIntoCommand]] — a runnable command the
  * session executes eagerly, exactly like any native SQL DDL/DML. Targets
  * not registered fall through untouched to Spark's own handling.
  * [[sql]] is the extension-free twin (parse → same translation → run)
  * for sessions built without `withExtensions`.
  *
  * Translation contract (SqlSurfaceSpec pins SQL == DataFrame row for
  * row on the q127 AND q131 shapes):
  *   - the ON condition must be the key equi-join `t.<key> = s.<key>`
  *     (either order; for COMPOSITE-key tables (r18) a conjunction of
  *     one such equality per key column) — the store's merge law;
  *     anything else throws.
  *   - clause gates/assignments reference columns QUALIFIED by the
  *     target/source alias; they translate to the `t_<col>`/`s_<col>`
  *     names [[MergeInto]] evaluates over its full-outer join. Key
  *     references (either side, or bare) map to the shared join key.
  *   - `WHEN NOT MATCHED BY SOURCE` gates/assignments may reference only
  *     target columns (no source row exists) — enforced here, like the
  *     standard.
  *   - INSERT follows SQL/Delta NULL semantics: listed columns take
  *     their VALUES expressions, unlisted payload columns insert NULL
  *     (`INSERT *` takes every source column verbatim). The merge key
  *     must be set from the source key.
  *   - the source is normalized to the target's (key + payload) columns
  *     by name before the merge (missing columns null-fill) — project
  *     arbitrary sources in the USING subquery, which is the SQL-native
  *     projection mechanism.
  *
  * Scale shape: identical to the DataFrame path — the command body IS
  * `mergeCommitDv` (touched-bucket reads/writes, full-target only for BY
  * SOURCE merges, DV composition, cardinality check riding the join's
  * shuffle); the SQL layer adds parsing and a manifest read, nothing
  * data-sized.
  */
object GraftSql {

  /** A registered SQL-addressable store table. */
  final case class StoreTarget(stateDir: String, table: String)

  private val targets =
    new java.util.concurrent.ConcurrentHashMap[String, StoreTarget]()

  /** Make `IngestIndex` table `table` under `stateDir` addressable as
    * `name` in SQL `MERGE INTO` statements (the catalog-registration
    * analogue; names are case-insensitive). */
  def registerTable(name: String, stateDir: String, table: String): Unit = {
    targets.put(name.toLowerCase(java.util.Locale.ROOT),
      StoreTarget(stateDir, table))
    ()
  }

  def unregisterTable(name: String): Unit = {
    targets.remove(name.toLowerCase(java.util.Locale.ROOT))
    ()
  }

  private def lookup(parts: Seq[String]): Option[StoreTarget] =
    Option(targets.get(
      parts.mkString(".").toLowerCase(java.util.Locale.ROOT)))

  /** Registry lookup for the sibling rules/commands. */
  private[operators] def lookupTarget(parts: Seq[String])
      : Option[StoreTarget] = lookup(parts)

  /** Registered parquet LAYOUT tables (r18) — plain clustered-parquet
    * directories (the q107/q118 layout family), addressable by the
    * `OPTIMIZE <name> ZORDER|HILBERT BY (x, y)` statement. A separate
    * registry from store tables: a layout is one directory of data
    * files + `_manifest`, not a versioned bucketed store. */
  private val layouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Make parquet layout dir `path` addressable as `name` in the
    * OPTIMIZE statement. */
  def registerLayout(name: String, path: String): Unit = {
    layouts.put(name.toLowerCase(java.util.Locale.ROOT), path)
    ()
  }

  def unregisterLayout(name: String): Unit = {
    layouts.remove(name.toLowerCase(java.util.Locale.ROOT))
    ()
  }

  private[operators] def lookupLayout(name: String): Option[String] =
    Option(layouts.get(name.toLowerCase(java.util.Locale.ROOT)))

  // ---- SQL-created store tables (r18): CREATE TABLE ... USING graft ----

  /** A SQL-created table's durable identity: its inner store-table name,
    * key columns, and declared schema — persisted as a small `_graft_
    * meta_<table>` file beside the version dirs (gc only touches `v*`
    * dirs, so the meta survives any retention policy), so a FRESH JVM
    * can re-register the table and an INSERT can map positional columns
    * without a committed version to read the schema from. */
  private[operators] final case class TableMeta(table: String,
      keys: Seq[String], schema: StructType)

  private[operators] def metaPath(stateDir: String, table: String): Path =
    new Path(s"$stateDir/_graft_meta_$table")

  private[operators] def readMeta(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String, table: String): Option[TableMeta] = {
    val p = metaPath(stateDir, table)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val kv = text.linesIterator.filter(_.nonEmpty).map { l =>
      val Array(k, v) = l.split("\t", 2); k -> v
    }.toMap
    Some(TableMeta(kv("table"), kv("keys").split(",").toSeq,
      StructType.fromDDL(kv("schema"))))
  }

  private[operators] def writeMeta(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String, meta: TableMeta): Unit = {
    val p = metaPath(stateDir, meta.table)
    val tmp = new Path(p.toString + s".tmp.${System.nanoTime()}")
    val bytes = (s"table\t${meta.table}\n" +
      s"keys\t${meta.keys.mkString(",")}\n" +
      s"schema\t${meta.schema.toDDL}\n").getBytes("UTF-8")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    // FileSystem.rename does not overwrite, and a delete-then-rename
    // leaves a window where the meta is ABSENT — a concurrent reader
    // (catalog loadTable / declaredMeta) mid-ALTER would see
    // NoSuchTable, not merely the pre-alter declaration (r18 advisor
    // fix). FileContext.rename(OVERWRITE) installs atomically on
    // file:// and HDFS; object stores without atomic rename degrade to
    // the same copy-window every writer there has, with the tmp bytes
    // still torn-proof.
    try org.apache.hadoop.fs.FileContext.getFileContext(p.toUri,
        fs.getConf).rename(tmp, p,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch {
      // UnsupportedFileSystemException is what getFileContext ACTUALLY
      // throws for a scheme with no AbstractFileSystem binding (r19
      // advisor fix — it is an IOException, so the old two-case catch
      // crashed on exactly the case this fallback documents)
      case _: UnsupportedOperationException |
          _: org.apache.hadoop.fs.UnsupportedFileSystemException |
          _: java.io.FileNotFoundException =>
        // no FileContext binding for this scheme (some test FS stubs):
        // fall back to the delete->rename pair, accepting the window
        if (fs.exists(p)) fs.delete(p, false)
        require(fs.rename(tmp, p), s"could not install table meta at $p")
    }
  }

  /** Safe type WIDENINGS (r20, `ALTER TABLE ... ALTER COLUMN ... TYPE`):
    * every value of `from` maps losslessly onto `to` by a plain cast —
    * integral up-casts, float→double, and same-scale decimal precision
    * growth. Everything else (narrowing, cross-family, string⇄numeric,
    * scale changes) is NOT a widening: it can lose or reinterpret data,
    * so it stays q128's named rewrite-under-a-new-shape error. */
  private[operators] def widens(
      from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (a: DecimalType, b: DecimalType) =>
        b.scale == a.scale && b.precision > a.precision
      // integral -> decimal with enough INTEGER digits for every value
      // of the source type (byte 3, short 5, int 10, long 19)
      case (ByteType | ShortType | IntegerType | LongType,
          b: DecimalType) =>
        val digits = from match {
          case ByteType => 3
          case ShortType => 5
          case IntegerType => 10
          case _ => 19
        }
        b.precision - b.scale >= digits
      case _ => false
    }
  }

  /** `ALTER TABLE ... ALTER COLUMN <c> TYPE <t>` for a store table (r20,
    * the r18 verdict's carried stretch): SAFE WIDENING ONLY, as an
    * explicit COPY-ON-WRITE rewrite — unlike ADD COLUMNS (metadata-only,
    * q128's in-place law), a retype rewrites every live bucket once at a
    * new version (`op = retype`, the OPTIMIZE machinery's shape: a live
    * deletion vector materializes first, then one full-footprint commit
    * casts the column), so:
    *   - the CURRENT snapshot carries the new type in every file — no
    *     reader ever sees a mixed-type union;
    *   - TIME TRAVEL reads each snapshot's own type (old versions' files
    *     are untouched — history is immutable);
    *   - the rewrite is one commit: rollback = RESTORE, like any other.
    * The PRIMARY KEY may not retype: the bucket layout hashes the key's
    * BYTES, and `xxhash64(int x)` != `xxhash64(long x)` — a key retype
    * would silently orphan every row's bucket assignment; the named
    * error says to copy via CREATE + INSERT instead. Narrowing and
    * cross-family changes raise the q128-style named error. */
  private[operators] def retypeColumn(spark: SparkSession,
      targetName: String, t: StoreTarget, colName: String,
      newType: org.apache.spark.sql.types.DataType): Unit = {
    import graft.streaming.IngestIndex
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fs = new Path(t.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = readMeta(fs, t.stateDir, t.table).getOrElse(
      throw new IllegalArgumentException(
        s"ALTER TABLE $targetName ALTER COLUMN: the store under " +
          s"${t.stateDir} carries no _graft_meta (not a SQL-created " +
          "table) — the declared schema is what a retype rewrites"))
    val f = meta.schema.fields.find(_.name.equalsIgnoreCase(colName))
      .getOrElse(throw new IllegalArgumentException(
        s"ALTER TABLE $targetName ALTER COLUMN: no column '$colName' " +
          s"(columns: ${meta.schema.fieldNames.mkString(", ")})"))
    require(!meta.keys.exists(_.equalsIgnoreCase(f.name)),
      s"ALTER TABLE $targetName: cannot retype PRIMARY KEY column " +
        s"'${f.name}' — the bucket layout hashes the key's bytes, so a " +
        "key retype orphans every row's bucket assignment; copy via " +
        "CREATE TABLE (new key type) + INSERT INTO ... SELECT")
    if (f.dataType == newType) return // no-op retype
    if (!widens(f.dataType, newType))
      throw new org.apache.spark.sql.AnalysisException(
        "UNSUPPORTED_FEATURE.TABLE_OPERATION",
        Map("tableName" -> targetName,
          "operation" -> (s"ALTER COLUMN ${f.name} TYPE " +
            s"${newType.sql} from ${f.dataType.sql} — only safe " +
            "widenings rewrite in place (byte/short/int→bigint, " +
            "float→double, same-scale decimal precision growth); " +
            "anything lossy needs a rewrite under the new shape " +
            "(CREATE + INSERT ... SELECT), q128's contract")))
    copyOnWriteRewrite(classic, t, op = "retype",
      cur => cur.withColumn(f.name,
        org.apache.spark.sql.functions.col(f.name).cast(newType)))
    writeMeta(fs, t.stateDir, meta.copy(schema =
      org.apache.spark.sql.types.StructType(meta.schema.fields.map(x =>
        if (x.name == f.name) x.copy(dataType = newType) else x))))
  }

  /** The shared COPY-ON-WRITE rewrite skeleton behind the
    * schema-changing ALTER verbs (retype q147, DROP COLUMN and RENAME
    * COLUMN r20): a live deletion vector MATERIALIZES first (the
    * OPTIMIZE shape — a raw-slice rewrite under a live DV would
    * resurrect tombstoned rows, mergeCommit's guard), then ONE
    * op-tagged commit rewrites every live bucket through `xform`. Old
    * versions' files are untouched — TIME TRAVEL reads each snapshot's
    * own shape, and RESTORE rolls the rewrite back like any commit. A
    * store with no live data commits nothing (the caller's meta write
    * is the whole change). At 100 TB the rewrite is one full-table
    * pass — exactly what the operation costs anywhere — but it is ONE
    * commit with normal rollback, and readers of the old snapshot are
    * never blocked. */
  private def copyOnWriteRewrite(
      classic: org.apache.spark.sql.classic.SparkSession,
      t: StoreTarget, op: String,
      xform: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
    val fs = new Path(t.stateDir)
      .getFileSystem(classic.sparkContext.hadoopConfiguration)
    IngestIndex.latestVersion(fs, t.stateDir).foreach { top0 =>
      var top = top0
      var m = IngestIndex.readManifest(fs, t.stateDir, top)
      if (m.get(IngestIndex.dvTable(t.table))
        .exists(_.exists(_._2.ver != IngestIndex.EmptyVer))) {
        m = IngestIndex.materializeDeletes(classic, t.stateDir, m,
          t.table, top + 1, IngestIndex.keyColsFor(t.table))
        IngestIndex.writeManifest(fs, t.stateDir, top + 1, m,
          op = "materialize")
        top += 1
      }
      val live = m.getOrElse(t.table, Map.empty[Int, IngestIndex.Bkt])
        .collect { case (b, e) if e.ver != IngestIndex.EmptyVer => b }
        .toSet
      if (live.nonEmpty) {
        val emptyDelta = IngestIndex.currentTable(classic, t.stateDir,
          t.table, raw = true).limit(0)
        val map = IngestIndex.mergeCommit(classic, t.stateDir, m,
          t.table, top + 1, emptyDelta,
          (cur, _) => xform(cur),
          touchedKnown = Some(live))
        IngestIndex.writeManifest(fs, t.stateDir, top + 1,
          m + (t.table -> map), op = op)
      }
    }
  }

  /** `ALTER TABLE ... DROP COLUMN <c>` for a store table (r20): the
    * narrowing half of the schema-evolution contract, as an explicit
    * COPY-ON-WRITE rewrite (one `op = drop-column` commit through
    * [[copyOnWriteRewrite]]) — NOT a metadata-only remap. Delta's
    * metadata-only drop needs column MAPPING (unique physical ids) to
    * stop a later same-name ADD COLUMNS from resurrecting the old
    * bytes; this store's columns are physical parquet names, so the
    * honest drop physically removes the column from every live bucket
    * — a later `ADD COLUMNS (c ...)` reads NULL, never stale values.
    * The PRIMARY KEY may not drop (it IS the bucket layout and the
    * row identity). CDF NOTE: the drop step emits ZERO change rows —
    * projected to the post-drop shape, the rewritten rows equal their
    * preimages ([[IngestIndex.changesBetween]]'s post-shape
    * alignment), Delta's "schema change, no row change" reading. */
  private[operators] def dropColumn(spark: SparkSession,
      targetName: String, t: StoreTarget, colName: String): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fs = new Path(t.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = readMeta(fs, t.stateDir, t.table).getOrElse(
      throw new IllegalArgumentException(
        s"ALTER TABLE $targetName DROP COLUMN: the store under " +
          s"${t.stateDir} carries no _graft_meta (not a SQL-created " +
          "table) — the declared schema is what a drop narrows"))
    val f = meta.schema.fields.find(_.name.equalsIgnoreCase(colName))
      .getOrElse(throw new IllegalArgumentException(
        s"ALTER TABLE $targetName DROP COLUMN: no column '$colName' " +
          s"(columns: ${meta.schema.fieldNames.mkString(", ")})"))
    require(!meta.keys.exists(_.equalsIgnoreCase(f.name)),
      s"ALTER TABLE $targetName: cannot drop PRIMARY KEY column " +
        s"'${f.name}' — the key is the bucket layout and the row " +
        "identity; copy via CREATE TABLE (new key) + INSERT INTO " +
        "... SELECT")
    copyOnWriteRewrite(classic, t, op = "drop-column",
      cur => cur.drop(f.name))
    writeMeta(fs, t.stateDir, meta.copy(schema =
      org.apache.spark.sql.types.StructType(
        meta.schema.fields.filterNot(_.name == f.name))))
  }

  /** `ALTER TABLE ... RENAME COLUMN <a> TO <b>` for a store table
    * (r20): a payload-column rename as a COPY-ON-WRITE rewrite (one
    * `op = rename-column` commit) — the same no-column-mapping honesty
    * as [[dropColumn]]: the physical parquet column renames in every
    * live bucket, old snapshots keep the old name (time travel reads
    * each version's own shape). The PRIMARY KEY may not rename: its
    * name is woven through the key registry, the DV side table and
    * every retained version's key column — a key rename would break
    * `changesBetween`'s cross-version EXCEPT at the seam; the named
    * error points at CREATE + INSERT. CDF NOTE: the rename step
    * surfaces as a FULL-TABLE update whose preimages carry NULL for
    * the renamed column (the old name is gone from the post shape) —
    * the rewrite IS the operation, and a downstream replica applying
    * postimages still converges; consumers adopt the new name on
    * restart (the graft-cdc widened-schema restart contract). */
  private[operators] def renameColumn(spark: SparkSession,
      targetName: String, t: StoreTarget, oldName: String,
      newName: String): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fs = new Path(t.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = readMeta(fs, t.stateDir, t.table).getOrElse(
      throw new IllegalArgumentException(
        s"ALTER TABLE $targetName RENAME COLUMN: the store under " +
          s"${t.stateDir} carries no _graft_meta (not a SQL-created " +
          "table) — the declared schema is what a rename rewrites"))
    val f = meta.schema.fields.find(_.name.equalsIgnoreCase(oldName))
      .getOrElse(throw new IllegalArgumentException(
        s"ALTER TABLE $targetName RENAME COLUMN: no column " +
          s"'$oldName' (columns: ${meta.schema.fieldNames.mkString(", ")})"))
    require(!meta.keys.exists(_.equalsIgnoreCase(f.name)),
      s"ALTER TABLE $targetName: cannot rename PRIMARY KEY column " +
        s"'${f.name}' — the key name is woven through the key " +
        "registry, the DV side table and every retained version; " +
        "copy via CREATE TABLE (new key name) + INSERT INTO ... SELECT")
    if (f.name == newName) return // no-op rename
    if (meta.schema.fields.exists(x => x.name != f.name &&
        x.name.equalsIgnoreCase(newName)))
      throw new org.apache.spark.sql.AnalysisException(
        "FIELD_ALREADY_EXISTS", Map("op" -> "rename",
          "fieldNames" -> s"`$newName`",
          "struct" -> meta.schema.toDDL))
    copyOnWriteRewrite(classic, t, op = "rename-column",
      cur => cur.withColumnRenamed(f.name, newName))
    writeMeta(fs, t.stateDir, meta.copy(schema =
      org.apache.spark.sql.types.StructType(meta.schema.fields.map(x =>
        if (x.name == f.name) x.copy(name = newName) else x))))
  }

  /** TRUNCATE for a store table — ONE metadata-shaped commit (`op =
    * truncate-sql`) that empties every live bucket; history keeps the
    * old snapshots, so time travel still reads pre-truncate contents
    * and RESTORE rolls it back. Shared by `DELETE FROM <t>` with no
    * WHERE, the flat `TRUNCATE TABLE` verb (r20) and the catalog's
    * DSv2 [[org.apache.spark.sql.connector.catalog.TruncatableTable]]
    * path, so the three spellings cannot diverge. A fully-emptied
    * gen-0 table drops out of the manifest (the store's absent=empty
    * law) — only the DECLARED meta of a SQL-created table keeps it
    * readable afterwards, so the verb requires one. Returns the
    * committed version (the prior top when already empty, 0 when no
    * version was ever committed). */
  private[operators] def truncateStore(
      spark: org.apache.spark.sql.classic.SparkSession,
      verb: String, targetName: String, target: StoreTarget): Long =
    GraftDml.snapshotOf(spark, verb, targetName, target) match {
      case None => 0L
      case Some((fs, top, m, schema)) =>
        require(readMeta(fs, target.stateDir, target.table).isDefined,
          s"$verb '$targetName' requires a SQL-created table (CREATE TABLE " +
            "... USING graft) — the declared schema is what keeps " +
            "the emptied table readable; use row-level DELETE FROM " +
            "... WHERE on engine-seeded stores")
        val live = m.getOrElse(target.table,
          Map.empty[Int, IngestIndex.Bkt]).keySet
        if (live.isEmpty) return top
        val next = top + 1
        val empty = spark.createDataFrame(
          java.util.Collections.emptyList[Row](), schema)
        val nm = IngestIndex.mergeCommitDv(spark, target.stateDir, m,
          target.table, next, empty, (_, d) => d,
          touchedKnown = Some(live))
        IngestIndex.writeManifest(fs, target.stateDir, next, nm,
          op = "truncate-sql")
        next
    }

  /** The declared schema of a registered SQL-created table, when one
    * exists (the empty-read shape and the INSERT positional target). */
  private[operators] def declaredMeta(spark: SparkSession,
      t: StoreTarget): Option[TableMeta] = {
    val fs = new Path(t.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    readMeta(fs, t.stateDir, t.table)
  }

  /** `df` widened to the DECLARED meta schema: fields the meta carries
    * that `df` lacks append as typed NULLs (r18, `ALTER TABLE ... ADD
    * COLUMNS` — the added column is visible immediately, reads NULL
    * until data carries it, and commits write it forward; the committed
    * files never rewrite, the q128 in-place-evolution law). No meta, or
    * nothing missing => `df` unchanged. */
  private[operators] def widenToMeta(spark: SparkSession,
      t: StoreTarget, df: DataFrame): DataFrame =
    declaredMeta(spark, t) match {
      case Some(meta) =>
        val have = df.columns
          .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
        val extra = meta.schema.fields.filterNot(f =>
          have(f.name.toLowerCase(java.util.Locale.ROOT)))
        if (extra.isEmpty) df
        else df.select((df.columns.toSeq.map(col) ++ extra.toSeq.map(f =>
          lit(null).cast(f.dataType).as(f.name))): _*)
      case None => df
    }

  /** The widened SCHEMA (same law as [[widenToMeta]], no frame). */
  private[operators] def widenSchemaToMeta(spark: SparkSession,
      t: StoreTarget, schema: StructType): StructType = {
    val have = schema.fieldNames
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    declaredMeta(spark, t) match {
      case Some(meta) => StructType(schema.fields ++
        meta.schema.fields.filterNot(f =>
          have(f.name.toLowerCase(java.util.Locale.ROOT))))
      case None => schema
    }
  }

  /** The schema a READ of the store serves right now (r19, shared with
    * the streaming CDC source): the CURRENT raw schema widened to the
    * declared meta when a version is committed, else the declared meta
    * alone — exactly [[GraftTable.schema]]'s rule for catalog tables.
    * Fails with a named error when the store has neither (nothing was
    * ever declared or committed, so no read shape exists). */
  private[graft] def readableSchema(spark: SparkSession,
      t: StoreTarget): StructType = {
    val fs = new Path(t.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = graft.streaming.IngestIndex
      .latestVersion(fs, t.stateDir)
      .filter(v => graft.streaming.IngestIndex
        .readManifest(fs, t.stateDir, v).contains(t.table))
    committed match {
      case Some(_) => widenSchemaToMeta(spark, t,
        graft.streaming.IngestIndex
          .currentTable(spark, t.stateDir, t.table, raw = true).schema)
      case None => declaredMeta(spark, t).map(_.schema).getOrElse(
        throw new IllegalArgumentException(
          s"table '${t.table}' has neither a meta file nor a " +
            s"committed version under ${t.stateDir} — CREATE TABLE " +
            "... USING graft, or commit a first version"))
    }
  }

  /** (alias, unwrapped plan): `MERGE INTO t AS x` wraps the relation in
    * a SubqueryAlias; alias defaults to the relation's last name part. */
  private def unwrap(p: LogicalPlan): (Option[String], LogicalPlan) =
    p match {
      case sa: SubqueryAlias => (Some(sa.alias), sa.child)
      case other => (None, other)
    }

  /** The registered store target of a parsed MERGE, if any — the rule's
    * match gate, side-effect-free (analyzer rules run to fixed point).
    * Flat registry names stay UnresolvedRelations (nothing else can
    * resolve them); DSv2 catalog names (r18) resolve to a
    * DataSourceV2Relation over [[GraftTable]] BEFORE this rule runs. */
  private[operators] def targetOf(m: MergeIntoTable)
      : Option[(String, StoreTarget)] =
    unwrap(m.targetTable)._2 match {
      case r: UnresolvedRelation =>
        // flat registry names AND catalog-prefixed names (r18): the
        // injected parser rewrites catalog MERGEs at PARSE time —
        // Spark's own RewriteMergeIntoTable throws for resolved
        // non-row-level v2 targets BEFORE extension rules run, so the
        // race must be won before the analyzer starts
        resolveStore(r.multipartIdentifier.mkString("."))
          .map(t => r.multipartIdentifier.mkString(".") -> t)
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        Some(t.name() -> t.storeTarget)
      case _ => None
    }

  /** Translate a parsed MERGE whose target is registered into the
    * runnable command. Throws on unsupported shapes (non-key ON
    * condition, unqualified/foreign column references, key
    * reassignment) with named errors. */
  private[operators] def translate(m: MergeIntoTable): GraftMergeIntoCommand = {
    val (name, tgt) = targetOf(m).getOrElse(throw new IllegalArgumentException(
      s"MERGE INTO target is not a registered graft store table — " +
        "GraftSql.registerTable(name, stateDir, table) first"))
    // composite merge keys (r18): the ON condition is a CONJUNCTION of
    // per-key equalities covering every key column of the store table
    // — the statement is key-arity-generic like the DataFrame algebra
    val keys = IngestIndex.keyColsFor(tgt.table)
    val tAlias = unwrap(m.targetTable)._1.getOrElse(name.split('.').last)
    // a RESOLVED (catalog) target's references arrive as
    // AttributeReferences — membership in these exprId sets decides the
    // side; flat-registry targets never resolve, so the sets are empty
    // and the alias-qualified translation below carries the load
    val tgtIds: Set[Long] = unwrap(m.targetTable)._2 match {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation => r.output.map(_.exprId.id).toSet
      case _ => Set.empty
    }
    val srcIds: Set[Long] =
      if (m.sourceTable.resolved)
        m.sourceTable.outputSet.toSeq.map(_.exprId.id).toSet
      else Set.empty
    val sAlias = unwrap(m.sourceTable) match {
      case (Some(a), _) => a
      case (None, r: UnresolvedRelation) => r.multipartIdentifier.last
      case _ if srcIds.nonEmpty => "__src"
      case _ => throw new IllegalArgumentException(
        "MERGE INTO: alias the USING source (`USING (...) AS s`) so " +
          "clause conditions can qualify its columns")
    }
    // ON must be the key equi-join (every key, each equality in either
    // order); the canonical key name from the registry is returned so
    // coverage is case-insensitive
    def stripCast(e: Expression): Expression = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast =>
        stripCast(c.child)
      case other => other
    }
    def keyOf(e: Expression, alias: String,
        ids: Set[Long]): Option[String] = stripCast(e) match {
      case UnresolvedAttribute(Seq(q, c)) if q.equalsIgnoreCase(alias) =>
        keys.find(_.equalsIgnoreCase(c))
      case a: AttributeReference if ids(a.exprId.id) =>
        keys.find(_.equalsIgnoreCase(a.name))
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val wantOn = keys.map(k => s"$tAlias.$k = $sAlias.$k").mkString(" AND ")
    val covered = conjuncts(m.mergeCondition).map {
      case EqualTo(l, r) =>
        (keyOf(l, tAlias, tgtIds), keyOf(r, sAlias, srcIds)) match {
          case (Some(k1), Some(k2)) if k1 == k2 => k1
          case _ =>
            (keyOf(l, sAlias, srcIds), keyOf(r, tAlias, tgtIds)) match {
              case (Some(k1), Some(k2)) if k1 == k2 => k1
              case _ => throw new IllegalArgumentException(
                s"MERGE INTO '$name' requires the key equi-join ON " +
                  s"$wantOn (the store's merge law); got conjunct: " +
                  s"${EqualTo(l, r).sql}")
            }
        }
      case other => throw new IllegalArgumentException(
        s"MERGE INTO '$name' requires the key equi-join ON $wantOn " +
          s"(the store's merge law); got: ${other.sql}")
    }
    if (covered.toSet != keys.toSet) throw new IllegalArgumentException(
      s"MERGE INTO '$name' requires the key equi-join ON $wantOn — " +
        s"the ON condition covers (${covered.distinct.mkString(", ")}) " +
        s"but '${tgt.table}' is keyed by (${keys.mkString(", ")})")
    GraftMergeIntoCommand(name, tgt, m.sourceTable, tAlias, sAlias, keys,
      ParsedMergeActions(m.matchedActions, m.notMatchedActions,
        m.notMatchedBySourceActions), tgtIds)
  }

  /** Extension-free SQL entry: the lakehouse-verb statements
    * (DESCRIBE HISTORY / RESTORE / VACUUM) and MERGE into a registered
    * store execute through the engine; everything else delegates to
    * `spark.sql`. */
  def sql(spark: SparkSession, text: String): DataFrame =
    parseVerb(text) match {
      case Some(cmd) => GraftSqlBridge.ofRows(spark, cmd)
      case None =>
        // ONE parse (review fix: the fallthrough used to re-parse via
        // spark.sql); ofRows analyzes — and for commands executes —
        // exactly like spark.sql
        spark.sessionState.sqlParser.parsePlan(text) match {
          case m: MergeIntoTable if targetOf(m).isDefined =>
            GraftSqlBridge.ofRows(spark, translate(m))
          // INSERT INTO / DELETE FROM / UPDATE over a registered store
          // (r18) — same translation the injected rule makes, so the
          // twin stays statement-complete
          case i: org.apache.spark.sql.catalyst.plans.logical
              .InsertIntoStatement =>
            GraftSqlBridge.ofRows(spark, GraftMergeSqlRule(i))
          case d: org.apache.spark.sql.catalyst.plans.logical
              .DeleteFromTable =>
            GraftSqlBridge.ofRows(spark, GraftMergeSqlRule(d))
          case u: org.apache.spark.sql.catalyst.plans.logical
              .UpdateTable =>
            GraftSqlBridge.ofRows(spark, GraftMergeSqlRule(u))
          case plan => GraftSqlBridge.ofRows(spark, plan)
        }
    }

  /** The `table_changes('<store>', v1, v2)` TABLE-VALUED function body
    * (r18): Spark's TVF resolution hands the literal arguments; the
    * returned plan is the engine's analyzed [[IngestIndex
    * .changesBetween]] — per-step reads restricted to each commit's own
    * bucket footprint, never O(table). The name resolves like every
    * verb statement (flat registry, then graft catalogs). */
  def tableChangesPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3,
      "table_changes(<store name>, <from version|timestamp>, " +
        s"<to version|timestamp>) takes 3 arguments; got ${args.length}")
    def lit(i: Int, what: String)
        : org.apache.spark.sql.catalyst.expressions.Literal =
      args(i) match {
        case l: org.apache.spark.sql.catalyst.expressions.Literal => l
        case other => throw new IllegalArgumentException(
          s"table_changes: the $what must be a literal; got ${other.sql}")
      }
    val name = String.valueOf(lit(0, "store name").value)
    val t = resolveStore(name).getOrElse(throw new IllegalArgumentException(
      s"table_changes: '$name' is not a registered graft store table — " +
        "GraftSql.registerTable first, or address it through a graft " +
        "catalog (<catalog>.<ns>.<table>)"))
    val spark = org.apache.spark.sql.SparkSession.active
    // a range bound is either an INTEGER version, or (r19) a
    // string/timestamp/date literal resolved to a version through
    // [[IngestIndex.versionAt]] — the SAME rule as every other travel
    // surface (newest commit at or before the instant), so
    // table_changes(t, ts1, ts2) == "changes since the snapshot you'd
    // read AS OF ts1, through the snapshot AS OF ts2" (the exclusive /
    // inclusive bounds exactly matching the ChangesSpec apply-law). An
    // instant preceding every retained commit throws versionAt's named
    // retention error.
    def bound(i: Int, what: String): Long = {
      val l = lit(i, what)
      l.dataType match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType =>
          l.value match {
            case n: java.lang.Number => n.longValue()
            case other => throw new IllegalArgumentException(
              s"table_changes: the $what must be an integer version " +
                s"(DESCRIBE HISTORY lists them) or a timestamp " +
                s"literal; got $other")
          }
        case _ =>
          val micros = org.apache.spark.sql.catalyst.expressions
            .Cast(l, org.apache.spark.sql.types.TimestampType,
              Some(spark.sessionState.conf.sessionLocalTimeZone)).eval()
          require(micros != null,
            s"table_changes: the $what ${l.sql} is neither an " +
              "integer version nor a timestamp literal")
          val fs = new Path(t.stateDir).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          IngestIndex.versionAt(fs, t.stateDir,
            Math.floorDiv(micros.asInstanceOf[Long], 1000L))
      }
    }
    val df = IngestIndex.changesBetween(spark, t.stateDir, t.table,
      bound(1, "from bound"), bound(2, "to bound"))
    SubqueryAlias("table_changes", GraftSqlBridge.analyzedPlan(df))
  }

  /** Shared command preamble: the store's filesystem handle and current
    * TOP version, failing with the verb's name when nothing committed. */
  private[operators] def storeTop(spark: SparkSession,
      target: StoreTarget, verb: String, name: String)
      : (org.apache.hadoop.fs.FileSystem, Long) = {
    val fs = new org.apache.hadoop.fs.Path(target.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val top = IngestIndex.latestVersion(fs, target.stateDir).getOrElse(
      throw new IllegalStateException(
        s"$verb '$name': the store under ${target.stateDir} has no " +
          "committed version — stage the target table first"))
    (fs, top)
  }

  // ---- lakehouse verb statements Spark's grammar does not carry ----
  // (Delta ships these through its own parser extension — the same
  // pattern here: GraftSqlParser intercepts, everything else delegates)

  private val DescribeHistoryRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.`]+)\s*;?\s*""".r
  // CREATE TABLE <n> (<cols..., PRIMARY KEY (k...)>) USING graft
  // LOCATION '<stateDir>' — only the graft provider is intercepted;
  // every other CREATE TABLE delegates to Spark untouched
  private val CreateTableRe =
    ("""(?is)\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?""" +
      """([\w.`]+)\s*\((.+)\)\s*USING\s+GRAFT\s+""" +
      """LOCATION\s+'([^']+)'\s*;?\s*""").r
  // CTAS (r19): CREATE TABLE <n> (PRIMARY KEY (k...)) USING graft
  // LOCATION '<dir>' AS <query> — schema INFERRED from the query (the
  // standard CTAS contract), so the column group declares only the key
  private val CtasRe =
    ("""(?is)\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?""" +
      """([\w.`]+)\s*\((.+?)\)\s*USING\s+GRAFT\s+""" +
      """LOCATION\s+'([^']+)'\s+AS\s+(.+?)\s*;?\s*""").r
  private val PrimaryKeyRe =
    """(?i),?\s*PRIMARY\s+KEY\s*\(([^)]*)\)""".r
  // ALTER TABLE <flat registered name> ADD COLUMN[S] (<ddl>) — only
  // REGISTERED FLAT names intercept; catalog names delegate to Spark's
  // own AlterTableAddColumns -> GraftCatalog.alterTable, and everything
  // else is Spark's statement untouched
  private val AlterAddRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+COLUMNS?\s*""" +
      """\((.+)\)\s*;?\s*""").r
  // ALTER TABLE <flat name> ALTER COLUMN <c> TYPE <t> (r20): safe
  // widening as a copy-on-write rewrite; registered flat names only —
  // catalog names ride Spark's native AlterColumn -> alterTable
  private val AlterRetypeRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+ALTER\s+COLUMN\s+""" +
      """`?(\w+)`?\s+(?:SET\s+DATA\s+)?TYPE\s+(.+?)\s*;?\s*""").r
  // ALTER TABLE <flat name> DROP COLUMN <c> / RENAME COLUMN <a> TO <b>
  // (r20): copy-on-write rewrites (dropColumn/renameColumn's contract);
  // registered flat names only — catalog names ride Spark's native
  // DropColumns/RenameColumn -> GraftCatalog.alterTable
  private val AlterDropColRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+COLUMN\s+""" +
      """`?(\w+)`?\s*;?\s*""").r
  private val AlterRenameColRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+RENAME\s+COLUMN\s+""" +
      """`?(\w+)`?\s+TO\s+`?(\w+)`?\s*;?\s*""").r
  // BEGIN; <dml>; ...; COMMIT (r20): several DML statements batched
  // into ONE store commit — one version, one footprint
  private val TxnRe =
    """(?is)\s*BEGIN\s*;(.*;)\s*COMMIT\s*;?\s*""".r

  /** Split a transaction body on ';' OUTSIDE single-quoted literals
    * (a WHERE clause may legitimately carry `';'`). */
  private[operators] def splitStatements(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    body.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ';' if !inQuote =>
        if (cur.toString.trim.nonEmpty) out += cur.toString
        cur.clear()
      case c => cur += c
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.result()
  }

  // DROP TABLE [IF EXISTS] <flat registered name> (r20, the r18
  // verdict's carried task #7) — only FLAT-REGISTERED names intercept
  // (the DESCRIBE HISTORY shadowing discipline: DROP TABLE is a valid
  // Spark statement, so an unregistered name must delegate untouched;
  // catalog names delegate too — Spark's native DSv2 path routes them
  // to GraftCatalog.dropTable)
  private val DropTableRe =
    ("""(?is)\s*DROP\s+TABLE\s+(?:(IF\s+EXISTS)\s+)?""" +
      """([\w.`]+)\s*;?\s*""").r
  // TRUNCATE TABLE <flat registered name> (r20): sugar over the shared
  // truncateStore commit (the same path as DELETE FROM with no WHERE
  // and the catalog's DSv2 TruncatableTable); only REGISTERED flat
  // names intercept — TRUNCATE TABLE is a valid Spark statement, so an
  // unregistered name must delegate untouched
  private val TruncateTableRe =
    """(?is)\s*TRUNCATE\s+TABLE\s+([\w.`]+)\s*;?\s*""".r
  // SHOW CREATE TABLE <flat registered name> (r20): reconstructs the
  // round-trippable CREATE statement from the declared meta; same
  // shadowing discipline (valid Spark statement)
  private val ShowCreateRe =
    """(?is)\s*SHOW\s+CREATE\s+TABLE\s+([\w.`]+)\s*;?\s*""".r
  private val RestoreRe =
    ("""(?is)\s*RESTORE\s+TABLE\s+([\w.`]+)\s+(?:TO\s+)?VERSION\s+AS""" +
      """\s+OF\s+(\d+)\s*;?\s*""").r
  // RESTORE ... TIMESTAMP AS OF (r20): Delta's other restore spelling —
  // resolves through versionAt (the ONE travel rule), then commits the
  // same restore manifest the version form does
  private val RestoreTsRe =
    ("""(?is)\s*RESTORE\s+TABLE\s+([\w.`]+)\s+(?:TO\s+)?TIMESTAMP\s+""" +
      """AS\s+OF\s+(?:'([^']+)'|(\d+))\s*;?\s*""").r

  /** A user-supplied timestamp as epoch millis: integral strings are
    * millis verbatim; anything else folds through a session-timezone
    * CAST to TIMESTAMP (string forms — the same resolution SQL
    * `TIMESTAMP AS OF` uses). Shared by RESTORE's timestamp form and
    * the graft-cdc source's startingTimestamp/endingTimestamp. */
  private[graft] def tsStringToMillis(
      spark: org.apache.spark.sql.SparkSession, label: String,
      s: String): Long =
    s.trim.toLongOption.getOrElse {
      val micros = org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Literal(s),
        org.apache.spark.sql.types.TimestampType,
        Some(spark.sessionState.conf.sessionLocalTimeZone)).eval()
      require(micros != null,
        s"$label: '$s' is neither epoch millis nor a timestamp string")
      Math.floorDiv(micros.asInstanceOf[Long], 1000L)
    }
  private val VacuumRe =
    ("""(?is)\s*VACUUM\s+([\w.`]+)\s+RETAIN\s+(\d+)\s+""" +
      """(VERSIONS|HOURS)(\s+DRY\s+RUN)?\s*;?\s*""").r
  // DESCRIBE DETAIL <name> (r20): Delta's one-row table summary —
  // REGISTERED names only (the DESCRIBE HISTORY shadowing discipline:
  // `DESCRIBE DETAIL <col>` is a valid Spark statement describing a
  // column of a table named DETAIL, and must delegate)
  private val DescribeDetailRe =
    """(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+([\w.`]+)\s*;?\s*""".r
  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+([\w.`]+)""" +
      """(?:\s+(ZORDER|HILBERT)\s+BY\s*\(\s*(\w+)\s*,\s*(\w+)\s*\))?""" +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*""").r

  /** Resolve a (possibly dotted) statement name to its store: the flat
    * registry first, then a DSv2 graft CATALOG prefix (r18) — so the
    * lakehouse verbs (DESCRIBE HISTORY / RESTORE / VACUUM / OPTIMIZE)
    * accept `<catalog>.<ns...>.<table>` names too. */
  private[graft] def resolveStore(name: String)
      : Option[StoreTarget] = {
    val parts = name.replace("`", "").split('.').toSeq
    lookup(parts).orElse {
      if (parts.length < 2) None
      else GraftSqlBridge.catalogPlugin(
          org.apache.spark.sql.SparkSession.active, parts.head) match {
        case Some(c: GraftCatalog) =>
          val ident = org.apache.spark.sql.connector.catalog.Identifier
            .of(parts.tail.init.toArray, parts.last)
          try Some(c.loadTable(ident).asInstanceOf[GraftTable].storeTarget)
          catch {
            case _: org.apache.spark.sql.catalyst.analysis
                .NoSuchTableException => None
          }
        case _ => None
      }
    }
  }

  private def registered(name: String): StoreTarget = {
    val clean = name.replace("`", "")
    resolveStore(clean).getOrElse(throw new IllegalArgumentException(
      s"'$clean' is not a registered graft store table — " +
        "GraftSql.registerTable(name, stateDir, table) first (or " +
        "address it through a graft catalog: <catalog>.<ns>.<table>)"))
  }

  /** The statement as a runnable command when it is one of the graft
    * lakehouse verbs; None hands the text to Spark's parser. RESTORE /
    * VACUUM / OPTIMIZE shapes with an unregistered name throw (no such
    * statements exist in Spark's grammar, so nothing valid is
    * shadowed); DESCRIBE HISTORY only intercepts REGISTERED names —
    * `DESCRIBE history <col>` is a valid Spark statement describing a
    * column of a table named `history`, and must delegate. */
  private[operators] def parseVerb(text: String)
      : Option[LogicalPlan] = text match {
    case TxnRe(body) =>
      // each inner statement parses through the ACTIVE session's parser
      // and normalizes through GraftMergeSqlRule (idempotent), so the
      // extension-installed and extension-free paths hand the command
      // the same typed statement list
      val spark = org.apache.spark.sql.SparkSession.active
      val stmts = splitStatements(body).map { s =>
        GraftMergeSqlRule(spark.sessionState.sqlParser.parsePlan(s))
      }
      Some(GraftTransactionCommand(stmts))
    case CtasRe(ifNot, name, colsText, location, query) =>
      val clean = name.replace("`", "")
      val keys = PrimaryKeyRe.findFirstMatchIn(colsText) match {
        case Some(mk) => mk.group(1).split(",").toSeq
          .map(_.trim.replace("`", "")).filter(_.nonEmpty)
        case None => throw new IllegalArgumentException(
          s"CREATE TABLE $clean USING graft ... AS SELECT: declare " +
            "PRIMARY KEY (col[, col...]) — the store is keyed")
      }
      val rest = PrimaryKeyRe.replaceFirstIn(colsText, "").trim
        .stripSuffix(",").stripPrefix(",").trim
      require(rest.isEmpty,
        s"CREATE TABLE $clean ... AS SELECT infers the schema from " +
          s"the query — declare ONLY the PRIMARY KEY in the column " +
          s"group (got: $rest)")
      Some(GraftCtasCommand(clean, location, clean.split('.').last,
        keys, ifNot != null, query))
    case CreateTableRe(ifNot, name, colsText, location) =>
      val clean = name.replace("`", "")
      val keys = PrimaryKeyRe.findFirstMatchIn(colsText) match {
        case Some(mk) => mk.group(1).split(",").toSeq
          .map(_.trim.replace("`", "")).filter(_.nonEmpty)
        case None => throw new IllegalArgumentException(
          s"CREATE TABLE $clean USING graft: declare PRIMARY KEY " +
            "(col[, col...]) — the store is keyed (its bucket layout, " +
            "MERGE law and deletion vectors all hash the key)")
      }
      val ddl = PrimaryKeyRe.replaceFirstIn(colsText, "").trim
        .stripSuffix(",").stripPrefix(",").trim
      val schema = StructType.fromDDL(ddl)
      val canonKeys = keys.map { k =>
        schema.fieldNames.find(_.equalsIgnoreCase(k)).getOrElse(
          throw new IllegalArgumentException(
            s"CREATE TABLE $clean: PRIMARY KEY column '$k' is not in " +
              s"the column list (${schema.fieldNames.mkString(", ")})"))
      }
      Some(GraftCreateTableCommand(clean, location,
        clean.split('.').last, schema, canonKeys, ifNot != null))
    case AlterAddRe(name, ddl) =>
      val clean = name.replace("`", "")
      lookup(clean.split('.').toSeq).map(t =>
        GraftAlterAddCommand(clean, t, ddl))
    case AlterRetypeRe(name, cn, ddl) =>
      val clean = name.replace("`", "")
      lookup(clean.split('.').toSeq).map(t =>
        GraftAlterRetypeCommand(clean, t, cn,
          org.apache.spark.sql.types.DataType.fromDDL(ddl)))
    case AlterDropColRe(name, cn) =>
      val clean = name.replace("`", "")
      lookup(clean.split('.').toSeq).map(t =>
        GraftAlterDropColumnCommand(clean, t, cn))
    case AlterRenameColRe(name, a, b) =>
      val clean = name.replace("`", "")
      lookup(clean.split('.').toSeq).map(t =>
        GraftAlterRenameColumnCommand(clean, t, a, b))
    case DescribeHistoryRe(name) =>
      resolveStore(name.replace("`", "")).map(t =>
        GraftDescribeHistoryCommand(name.replace("`", ""), t))
    case DropTableRe(ifExists, name) =>
      val clean = name.replace("`", "")
      lookup(clean.split('.').toSeq).map(t =>
        GraftDropTableCommand(clean, t, ifExists != null))
    case TruncateTableRe(name) =>
      val clean = name.replace("`", "")
      lookup(clean.split('.').toSeq).map(t =>
        GraftTruncateTableCommand(clean, t))
    case ShowCreateRe(name) =>
      val clean = name.replace("`", "")
      lookup(clean.split('.').toSeq).map(t =>
        GraftShowCreateTableCommand(clean, t))
    case RestoreRe(name, v) =>
      Some(GraftRestoreCommand(name.replace("`", ""), registered(name),
        v.toLong))
    case RestoreTsRe(name, str, num) =>
      val clean = name.replace("`", "")
      val t = registered(name)
      val spark = org.apache.spark.sql.SparkSession.active
      val ms = tsStringToMillis(spark,
        s"RESTORE TABLE $clean TIMESTAMP AS OF",
        Option(str).getOrElse(num))
      val fs = new Path(t.stateDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Some(GraftRestoreCommand(clean, t,
        graft.streaming.IngestIndex.versionAt(fs, t.stateDir, ms)))
    case VacuumRe(name, k, unit, dry) =>
      Some(GraftVacuumCommand(name.replace("`", ""), registered(name),
        k.toInt, hours = unit.equalsIgnoreCase("HOURS"),
        dryRun = dry != null))
    case DescribeDetailRe(name) =>
      resolveStore(name.replace("`", "")).map(t =>
        GraftDescribeDetailCommand(name.replace("`", ""), t))
    case OptimizeRe(name, curve, x, y, k) =>
      val clean = name.replace("`", "")
      if (curve == null)
        Some(GraftOptimizeCommand(clean, registered(name),
          Option(k).map(_.toInt).getOrElse(8)))
      else {
        // the curve clause addresses a registered parquet LAYOUT — a
        // hash-bucketed store's physical order is its key hash, so
        // curve-clustering one is a named contract error, not a typo
        require(k == null,
          s"OPTIMIZE $clean: RETAIN ... VERSIONS applies to store " +
            "tables; a parquet layout has no version history")
        lookupLayout(clean) match {
          case Some(path) => Some(GraftOptimizeLayoutCommand(clean, path,
            hilbert = curve.equalsIgnoreCase("HILBERT"),
            x = x, y = y))
          case None if lookup(Seq(clean)).isDefined =>
            throw new IllegalArgumentException(
              s"OPTIMIZE $clean ${curve.toUpperCase} BY: '$clean' is a " +
                "graft STORE table (hash-bucketed by key) — " +
                "curve-clustering applies to parquet layouts " +
                "(GraftSql.registerLayout); the store form is " +
                s"OPTIMIZE $clean [RETAIN k VERSIONS]")
          case None => throw new IllegalArgumentException(
            s"'$clean' is not a registered graft layout — " +
              "GraftSql.registerLayout(name, path) first")
        }
      }
    case _ => None
  }
}

/** The analyzer rule [[graft.functions.GraftExtensions]] injects: rewrite
  * a parsed [[MergeIntoTable]] whose target names a registered graft
  * store into the runnable [[GraftMergeIntoCommand]], and (r18) a parsed
  * `INSERT INTO` statement over one into [[GraftInsertCommand]]. Top
  * level only (both are statements, not operators), match-gated on the
  * registry, side-effect-free, and a no-op once rewritten — fixed-point
  * safe. Ordering invariant: this rule precedes [[GraftStoreReadRule]],
  * so the statement target is still an UnresolvedRelation here (the
  * read rule would otherwise resolve it into a snapshot scan). */
object GraftMergeSqlRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, UpdateTable}
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if GraftSql.targetOf(m).isDefined =>
      GraftSql.translate(m)
    case i @ InsertIntoStatement(
        r: UnresolvedRelation, _, _, _, _, _, _)
        if GraftSql.lookupTarget(r.multipartIdentifier).isDefined =>
      val name = r.multipartIdentifier.mkString(".")
      val t = GraftSql.lookupTarget(r.multipartIdentifier).get
      require(i.partitionSpec.isEmpty && !i.ifPartitionNotExists,
        s"INSERT INTO '$name': graft store tables are hash-bucketed — " +
          "PARTITION specs do not apply")
      GraftInsertCommand(name, t, i.userSpecifiedCols, i.query,
        i.overwrite, i.byName)
    // row-level DML verbs (r18): DELETE FROM -> deletion-vector
    // tombstones; UPDATE -> touched-bucket copy-on-write merge.
    // Unregistered targets fall through to Spark's own handling.
    case DeleteFromTable(tgt, cond)
        if GraftDml.targetOf(tgt).isDefined =>
      val (name, alias, t) = GraftDml.targetOf(tgt).get
      GraftDeleteCommand(name, t, alias, ParsedDml(Some(cond), Nil))
    case UpdateTable(tgt, assigns, cond)
        if GraftDml.targetOf(tgt).isDefined =>
      val (name, alias, t) = GraftDml.targetOf(tgt).get
      GraftUpdateCommand(name, t, alias, ParsedDml(cond, assigns))
    case _ => plan
  }
}

/** The SQL READ surface for registered store tables (r17): `SELECT ...
  * FROM <registered name>` resolves to the store's CURRENT snapshot
  * (`IngestIndex.currentTable` — manifest union, bucket pruning, the
  * deletion vector applied), and `FROM <name> VERSION AS OF <v>` to the
  * retained snapshot (`tableAt` — Spark parses the time-travel clause
  * natively into [[RelationTimeTravel]]; no parser work needed).
  *
  * Layering: Spark's own ResolveRelations runs BEFORE injected rules in
  * each fixed-point iteration, so temp views and catalog tables with the
  * same name win — this rule only sees names nothing else could resolve.
  * Streaming relations are left alone. The substituted subtree is the
  * ALREADY-ANALYZED store read wrapped in a SubqueryAlias carrying the
  * registered name, so qualified references (`t.user_id`) resolve. */
final case class GraftStoreReadRule(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.RelationTimeTravel

  /** A CREATEd-but-never-INSERTed table has no committed version yet,
    * and a TRUNCATEd one (r18, `DELETE FROM t` with no WHERE) has a
    * manifest with no entry for it (a fully-empty gen-0 table drops its
    * buckets — the store's absent=empty law): both read as an empty
    * frame with the DECLARED schema, like any freshly created SQL
    * table. ONE shared matcher for both the flat and the catalog read
    * branches (review fix: the message contract was duplicated). */
  private def readOrEmpty(read: => org.apache.spark.sql.DataFrame,
      emptySchema: => Option[StructType])
      : org.apache.spark.sql.DataFrame =
    try read catch {
      case e @ (_: IllegalStateException | _: IllegalArgumentException)
          if (e.getMessage.contains("no committed index version") ||
              e.getMessage.contains("absent from manifest") ||
              e.getMessage.contains("no readable snapshot of")) =>
        emptySchema match {
          case Some(s) => spark.createDataFrame(
            java.util.Collections.emptyList[Row](), s)
          case None => throw e
        }
    }

  private def storeRead(parts: Seq[String], version: Option[Long])
      : Option[LogicalPlan] =
    GraftSql.lookupTarget(parts).map { t =>
      val df = readOrEmpty(
        version match {
          case Some(v) =>
            IngestIndex.tableAt(spark, t.stateDir, t.table, v)
          case None =>
            // ALTERed-but-unwritten columns surface as NULL on the
            // CURRENT read (widenToMeta); snapshots keep their width
            GraftSql.widenToMeta(spark, t,
              IngestIndex.currentTable(spark, t.stateDir, t.table))
        },
        GraftSql.declaredMeta(spark, t).map(_.schema))
      SubqueryAlias(parts.last, GraftSqlBridge.analyzedPlan(df))
    }

  /** `TIMESTAMP AS OF <e>` as epoch millis (r18): an INTEGRAL literal is
    * epoch millis verbatim (the form rigs emit — no timezone in play);
    * anything else folds through a session-timezone CAST to TIMESTAMP
    * (string / timestamp / date literals — Delta's accepted forms). */
  private def tsMillisOf(name: String, e: Expression): Long = {
    require(e.resolved && e.foldable, s"FROM $name TIMESTAMP AS OF " +
      s"${e.sql}: the timestamp must be a literal expression")
    e.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType =>
        e.eval() match {
          case n: java.lang.Number => n.longValue()
          case other => throw new IllegalArgumentException(
            s"FROM $name TIMESTAMP AS OF ${e.sql}: null timestamp ($other)")
        }
      case _ =>
        val micros = org.apache.spark.sql.catalyst.expressions
          .Cast(e, org.apache.spark.sql.types.TimestampType,
            Some(conf.sessionLocalTimeZone)).eval()
        require(micros != null, s"FROM $name TIMESTAMP AS OF ${e.sql} " +
          "does not evaluate to a timestamp")
        Math.floorDiv(micros.asInstanceOf[Long], 1000L)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // time travel over a registered store: VERSION AS OF <digits> is
      // tableAt; TIMESTAMP AS OF <literal> (r18) resolves through the
      // manifest mtimes (versionAt — Delta's rule, newest version at or
      // before the instant); any OTHER travel spec on a registered name
      // throws a NAMED error here (r17 judge finding: leaving it
      // unresolved read as TABLE_OR_VIEW_NOT_FOUND for a table that IS
      // registered).
      case RelationTimeTravel(
          UnresolvedRelation(parts, _, false), ts, ver)
          if GraftSql.lookupTarget(parts).isDefined =>
        val name = parts.mkString(".")
        (ts, ver) match {
          case (None, Some(v)) if v.nonEmpty && v.forall(_.isDigit) =>
            storeRead(parts, Some(v.toLong)).get
          case (Some(e), None) =>
            val t = GraftSql.lookupTarget(parts).get
            val fs = new Path(t.stateDir)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            storeRead(parts, Some(IngestIndex.versionAt(fs, t.stateDir,
              tsMillisOf(name, e)))).get
          case (None, Some(v)) => throw new IllegalArgumentException(
            s"FROM $name VERSION AS OF '$v': graft store versions are " +
              "the integers DESCRIBE HISTORY lists — a non-numeric " +
              "version is not supported")
          case other => throw new IllegalArgumentException(
            s"FROM $name: unsupported time-travel spec $other on a " +
              "registered graft store table (supported: VERSION AS OF " +
              "<int>, TIMESTAMP AS OF <literal> — see DESCRIBE HISTORY)")
        }
      case r @ UnresolvedRelation(parts, _, false)
          if GraftSql.lookupTarget(parts).isDefined =>
        storeRead(parts, None).getOrElse(r)
      // DSv2 CATALOG tables (r18): Spark's own ResolveRelations turns
      // `graft.ns.t` into a DataSourceV2Relation over [[GraftTable]]
      // (loadTable carries any VERSION/TIMESTAMP AS OF pin). The table
      // deliberately does NOT implement SupportsRead — this rule
      // substitutes the engine's ALREADY-ANALYZED snapshot read,
      // re-aliased to the relation's ORIGINAL exprIds (upstream
      // references resolved against the relation in the same pass must
      // keep binding), so catalog reads are PLAN-IDENTICAL to the
      // DataFrame verbs plus one collapsing Project. Write/DML plans
      // never reach here: V2WriteCommand holds its table outside
      // `children`, and [[GraftMergeSqlRule]] (which runs FIRST) has
      // already rewritten MERGE/UPDATE/DELETE into commands.
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        // CREATEd-but-never-loaded or TRUNCATEd: an empty frame in
        // the RELATION's shape (same contract as flat names)
        val df = readOrEmpty(
          t.pinnedVersion match {
            case Some(v) =>
              IngestIndex.tableAt(spark, t.stateDir, t.meta.table, v)
            case None =>
              IngestIndex.currentTable(spark, t.stateDir, t.meta.table)
          },
          Some(org.apache.spark.sql.types.StructType(r.output.map(a =>
            org.apache.spark.sql.types.StructField(
              a.name, a.dataType, a.nullable)))))
        val analyzed = GraftSqlBridge.analyzedPlan(df)
        val byName = analyzed.output.map(a =>
          a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
        org.apache.spark.sql.catalyst.plans.logical.Project(
          r.output.map { a =>
            byName.get(a.name.toLowerCase(java.util.Locale.ROOT)) match {
              case Some(src) =>
                val value: Expression =
                  if (src.dataType == a.dataType) src
                  else org.apache.spark.sql.catalyst.expressions.Cast(
                    src, a.dataType)
                org.apache.spark.sql.catalyst.expressions.Alias(
                  value, a.name)(
                  exprId = a.exprId, qualifier = a.qualifier)
              case None =>
                // a time-travel read BEFORE a schema-evolution commit:
                // the snapshot lacks a column the CURRENT schema (the
                // relation's) carries — surface it as NULL, Delta's
                // read-old-data-under-new-schema semantics
                org.apache.spark.sql.catalyst.expressions.Alias(
                  org.apache.spark.sql.catalyst.expressions.Literal
                    .create(null, a.dataType), a.name)(
                  exprId = a.exprId, qualifier = a.qualifier)
            }
          }, analyzed)
    }
}

/** The parsed clause families, held OUTSIDE the command's expression
  * surface: MergeAction extends Expression, and `QueryPlan.expressions`
  * collects Expression-typed (and Iterable-of-Expression) product
  * elements — CheckAnalysis would then fail the command on the still-
  * unresolved `t.<col>` references that only translate at run time. A
  * plain non-Iterable holder is invisible to that walk (the same reason
  * CreateViewCommand keeps its un-analyzed child out of `children`). */
final case class ParsedMergeActions(
    matched: Seq[MergeAction],
    notMatched: Seq[MergeAction],
    bySource: Seq[MergeAction])

/** The executed MERGE statement: resolves the store's CURRENT schema,
  * finishes clause translation against it, and commits one
  * [[IngestIndex.mergeCommitDv]] transaction (manifest write `op =
  * "merge-sql"`). Output: the committed version — what `spark.sql`
  * returns, mirroring Delta's operation metrics row. */
final case class GraftMergeIntoCommand(
    targetName: String,
    target: GraftSql.StoreTarget,
    source: LogicalPlan,
    tAlias: String,
    sAlias: String,
    keys: Seq[String],
    acts: ParsedMergeActions,
    tgtIds: Set[Long] = Set.empty) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)

  /** The canonical key name `c` refers to, if it is one (composite keys
    * r18: every key column maps to the shared join-key name). */
  private def keyNamed(c: String): Option[String] =
    keys.find(_.equalsIgnoreCase(c))

  /** Rewrite alias-qualified references to the joined-frame names
    * [[MergeInto]] evaluates over; `bySource` additionally forbids
    * source references (the standard: no source row exists there). */
  private def xlate(e: Expression, bySource: Boolean): Column = {
    val t = e.transformUp {
      // the analyzer's Resolution batch runs before the injected rule
      // inside one fixed-point iteration, so references may already be
      // resolved. A flat-registry target NEVER resolves (tgtIds empty
      // — a resolved attribute is source-side by construction); a DSv2
      // catalog target (r18) resolves, and membership in its exprId
      // set decides the side.
      case a: org.apache.spark.sql.catalyst.expressions
          .AttributeReference =>
        if (tgtIds(a.exprId.id))
          keyNamed(a.name) match {
            case Some(k) => UnresolvedAttribute(Seq(k))
            case None => UnresolvedAttribute(Seq("t_" + a.name))
          }
        else if (bySource) throw new IllegalArgumentException(
          s"WHEN NOT MATCHED BY SOURCE clauses cannot reference the " +
            s"source ('${a.name}'): no source row exists for those keys")
        else keyNamed(a.name) match {
          case Some(k) => UnresolvedAttribute(Seq(k))
          case None => UnresolvedAttribute(Seq("s_" + a.name))
        }
      case UnresolvedAttribute(parts) => parts match {
        case Seq(q, c) if q.equalsIgnoreCase(tAlias) =>
          keyNamed(c) match {
            case Some(k) => UnresolvedAttribute(Seq(k))
            case None => UnresolvedAttribute(Seq("t_" + c))
          }
        case Seq(q, c) if q.equalsIgnoreCase(sAlias) =>
          if (bySource) throw new IllegalArgumentException(
            s"WHEN NOT MATCHED BY SOURCE clauses cannot reference the " +
              s"source ('$q.$c'): no source row exists for those keys")
          else keyNamed(c) match {
            case Some(k) => UnresolvedAttribute(Seq(k))
            case None => UnresolvedAttribute(Seq("s_" + c))
          }
        case Seq(c) if keyNamed(c).isDefined =>
          UnresolvedAttribute(Seq(keyNamed(c).get))
        case other => throw new IllegalArgumentException(
          s"MERGE INTO '$targetName' references " +
            s"'${other.mkString(".")}' — qualify every non-key column " +
            s"with the target ('$tAlias.') or source ('$sAlias.') alias")
      }
    }
    GraftSqlBridge.column(t)
  }

  /** Assigned column name of `a` (optionally target-qualified; a
    * resolved catalog target's keys arrive as AttributeReferences). */
  private def assignedCol(a: Assignment): String = a.key match {
    case UnresolvedAttribute(Seq(c)) => c
    case UnresolvedAttribute(Seq(q, c)) if q.equalsIgnoreCase(tAlias) => c
    case ar: org.apache.spark.sql.catalyst.expressions.AttributeReference
        if tgtIds.isEmpty || tgtIds(ar.exprId.id) => ar.name
    case other => throw new IllegalArgumentException(
      s"MERGE INTO '$targetName': cannot assign to '${other.sql}' — " +
        "assignments set target columns")
  }

  /** The assignment's value translates to exactly the source's SAME key
    * column `k`. */
  private def isSourceKey(a: Assignment, k: String): Boolean =
    a.value match {
      case UnresolvedAttribute(Seq(q, c)) =>
        q.equalsIgnoreCase(sAlias) && c.equalsIgnoreCase(k)
      case UnresolvedAttribute(Seq(c)) => c.equalsIgnoreCase(k)
      case ar: org.apache.spark.sql.catalyst.expressions
          .AttributeReference =>
        !tgtIds(ar.exprId.id) && ar.name.equalsIgnoreCase(k)
      case _ => false
    }

  /** The assignment's value is the TARGET's same key column `k` — the
    * identity no-op analyzer alignment can emit on resolved targets. */
  private def isTargetKey(a: Assignment, k: String): Boolean =
    a.value match {
      case ar: org.apache.spark.sql.catalyst.expressions
          .AttributeReference =>
        tgtIds(ar.exprId.id) && ar.name.equalsIgnoreCase(k)
      case UnresolvedAttribute(Seq(q, c)) =>
        q.equalsIgnoreCase(tAlias) && c.equalsIgnoreCase(k)
      case _ => false
    }

  private def clauseOf(a: MergeAction, payload: Seq[String],
      schema: StructType, family: String): MergeClause = {
    val bySource = family == "by-source"
    def payloadName(c: String): String =
      payload.find(_.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"MERGE INTO '$targetName': '$c' is not a column of " +
            s"'${target.table}' (payload: ${payload.mkString(", ")})"))
    a match {
      case DeleteAction(cond) =>
        MergeClause.delete(cond.map(xlate(_, bySource)))
      case UpdateAction(cond, assigns, _) =>
        val set = assigns.flatMap { as =>
          val c = assignedCol(as)
          keyNamed(c) match {
            case Some(k) =>
              // only IDENTITY key assignments are droppable: key =
              // source's same key in a MATCHED clause, or key = the
              // TARGET's own key (the no-op analyzer alignment emits on
              // resolved catalog targets — legal in any family).
              // Anything else is a key rewrite the store's merge law
              // cannot express (review fix: this used to silently
              // no-op outside the matched family)
              val identity = isTargetKey(as, k) ||
                (!bySource && isSourceKey(as, k))
              if (!identity)
                throw new IllegalArgumentException(
                  s"MERGE INTO '$targetName': reassigning the merge " +
                    s"key '$k' is not supported")
              None // identity assignment — the join key carries it
            case None => Some(payloadName(c) -> xlate(as.value, bySource))
          }
        }.toMap
        MergeClause.update(set, cond.map(xlate(_, bySource)))
      case UpdateStarAction(cond) =>
        if (bySource) throw new IllegalArgumentException(
          "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET * is not a MERGE " +
            "clause: no source row exists to copy from")
        MergeClause.update(
          payload.map(c => c -> col(s"s_$c")).toMap,
          cond.map(xlate(_, bySource)))
      case InsertAction(cond, assigns) =>
        // SQL/Delta NULL semantics: listed columns take their VALUES
        // expressions, every key must come from the source's same key,
        // and UNLISTED payload columns insert NULL (typed from the
        // target)
        val keysSet = scala.collection.mutable.Set.empty[String]
        val listed = assigns.flatMap { as =>
          val c = assignedCol(as)
          keyNamed(c) match {
            case Some(k) =>
              if (!isSourceKey(as, k)) throw new IllegalArgumentException(
                s"MERGE INTO '$targetName': INSERT must set the merge " +
                  s"key '$k' from the source key ($sAlias.$k)")
              keysSet += k
              None
            case None => Some(payloadName(c) -> xlate(as.value, bySource))
          }
        }.toMap
        if (keysSet.size != keys.size) throw new IllegalArgumentException(
          s"MERGE INTO '$targetName': INSERT must list every merge key " +
            s"(${keys.mkString(", ")}), each set from its $sAlias.<key>; " +
            s"missing: ${keys.filterNot(keysSet).mkString(", ")}")
        val set = payload.map { c =>
          c -> listed.getOrElse(c, lit(null).cast(schema(c).dataType))
        }.toMap
        MergeClause.insert(cond.map(xlate(_, bySource)), set)
      case InsertStarAction(cond) =>
        // INSERT * = every source column verbatim — MergeClause.insert's
        // own default
        MergeClause.insert(cond.map(xlate(_, bySource)))
      case other => throw new IllegalArgumentException(
        s"MERGE INTO '$targetName': unsupported $family action $other")
    }
  }

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val (fs, top) = GraftSql.storeTop(spark, target, "MERGE INTO",
      targetName)
    val m = IngestIndex.readManifest(fs, target.stateDir, top)
    // a TRUNCATEd table (live-but-empty, no manifest entry) merges like
    // an empty one — every source row is NOT MATCHED; the declared meta
    // carries the schema the clauses translate against
    val schema =
      if (m.contains(target.table))
        GraftSql.widenSchemaToMeta(spark, target, IngestIndex
          .currentTable(spark, target.stateDir, target.table, raw = true)
          .schema)
      else GraftSql.readMeta(fs, target.stateDir, target.table)
        .map(_.schema).getOrElse(throw new IllegalArgumentException(
          s"MERGE INTO '$targetName': table '${target.table}' absent " +
            s"from manifest v$top under ${target.stateDir}"))
    val payload = schema.fieldNames.toSeq
      .filterNot(c => keys.exists(_.equalsIgnoreCase(c)))
    val merge = MergeInto(
      keys = keys,
      payload = payload,
      matched = acts.matched.map(clauseOf(_, payload, schema, "matched")),
      notMatched =
        acts.notMatched.map(clauseOf(_, payload, schema, "not-matched")),
      notMatchedBySource =
        acts.bySource.map(clauseOf(_, payload, schema, "by-source")),
      // buckets predating an ALTER widening null-fill in the combine
      widenTo = Some(schema))
    // normalize the source to (key + payload) by name — missing payload
    // columns null-fill (the SQL subquery is the projection mechanism
    // for anything fancier)
    val srcRaw = GraftSqlBridge.ofRows(spark, source)
    keys.foreach { k =>
      require(srcRaw.columns.exists(_.equalsIgnoreCase(k)),
        s"MERGE INTO '$targetName': the USING source carries no '$k' " +
          s"column (source columns: ${srcRaw.columns.mkString(", ")})")
    }
    // STAR actions copy "every source column" — a source missing a
    // payload column (a typo'd USING projection) must be a named error,
    // not a silent NULL write (r17 advisor finding; Delta and the SQL
    // standard raise unresolved-column here). NULL-fill remains correct
    // only for the LISTED-column INSERT path, where unlisted columns
    // take NULL by SQL semantics.
    val hasStar = (acts.matched ++ acts.notMatched).exists {
      case _: UpdateStarAction | _: InsertStarAction => true
      case _ => false
    }
    if (hasStar) {
      val missing = payload.filterNot(c =>
        srcRaw.columns.exists(_.equalsIgnoreCase(c)))
      require(missing.isEmpty,
        s"MERGE INTO '$targetName': UPDATE SET * / INSERT * require the " +
          s"USING source to carry every target payload column; missing: " +
          s"${missing.mkString(", ")} (source columns: " +
          s"${srcRaw.columns.mkString(", ")})")
    }
    val src = srcRaw.select((keys ++ payload).map { c =>
      srcRaw.columns.find(_.equalsIgnoreCase(c)) match {
        case Some(have) => col(have).as(c)
        case None => lit(null).cast(schema(c).dataType).as(c)
      }
    }: _*)
    val next = top + 1
    // BY SOURCE merges must see every live target row — the same
    // full-target pairing commitFullSync makes on the DataFrame path
    val touched: Option[Set[Int]] =
      if (!merge.requiresFullTarget) None
      else {
        val n = IngestIndex.numBuckets(spark)
        val gens = IngestIndex.gensOf(m, target.table)
        val deltaBkts = IngestIndex
          .assignBucket(src, target.table, n, gens)
          .select("bkt").distinct().collect().map(_.getInt(0)).toSet
        Some(m.getOrElse(target.table,
          Map.empty[Int, IngestIndex.Bkt]).keySet ++ deltaBkts)
      }
    val nm = IngestIndex.mergeCommitDv(spark, target.stateDir, m,
      target.table, next, src, merge, touchedKnown = touched)
    IngestIndex.writeManifest(fs, target.stateDir, next, nm,
      op = "merge-sql")
    Seq(Row(next))
  }
}

/** `CREATE TABLE <n> (cols..., PRIMARY KEY (k...)) USING graft LOCATION
  * '<stateDir>'` (r18) — the DDL half of the SQL surface: persists the
  * table's identity (inner table name, keys, declared schema) as the
  * store's meta file, registers the key columns with the engine's
  * shared key registry (ONE bucket formula for every verb), and
  * registers the name for SQL addressing. Creates NO data version — the
  * first INSERT/MERGE commits v1; a SELECT before that reads an empty
  * frame with the declared schema. `IF NOT EXISTS` re-registers from
  * the EXISTING meta (the durable identity wins over the statement's
  * column list — re-running a setup script cannot silently rebind). */
final case class GraftCreateTableCommand(
    targetName: String,
    stateDir: String,
    table: String,
    declared: StructType,
    keys: Seq[String],
    ifNotExists: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = GraftSql.readMeta(fs, stateDir, table)
    val meta = existing match {
      case Some(m) if !ifNotExists =>
        throw new IllegalArgumentException(
          s"CREATE TABLE $targetName: a graft table '${m.table}' " +
            s"already exists under $stateDir (keyed by " +
            s"${m.keys.mkString(", ")}) — use CREATE TABLE IF NOT " +
            "EXISTS to re-register it")
      case Some(m) => m
      case None =>
        val m = GraftSql.TableMeta(table, keys, declared)
        fs.mkdirs(new Path(stateDir))
        GraftSql.writeMeta(fs, stateDir, m)
        m
    }
    graft.streaming.IngestIndex.registerKeyCols(meta.table, meta.keys)
    GraftSql.registerTable(targetName, stateDir, meta.table)
    Seq.empty
  }
}

/** `DROP TABLE [IF EXISTS] <flat registered name>` (r20 — closes the r18
  * verdict's carried task #7: the catalog path has had DSv2 `dropTable`
  * since r18, but a FLAT-registered table could only be dropped from
  * Scala). Removes, in order: the key-registry binding (so a later
  * CREATE may rebind the inner name to a DIFFERENT primary key), the
  * store directory (meta file + every version dir), and the SQL-name
  * registration — the exact inverse of [[GraftCreateTableCommand]], and
  * the same semantics as [[GraftCatalog.dropTable]].
  *
  * OWNERSHIP GUARD: only a SQL-CREATED table (its `_graft_meta_*` file
  * present) may be dropped — a hand-registered store directory was not
  * created through this surface, and DROP deleting it would destroy
  * data SQL never owned; the named error points at
  * `GraftSql.unregisterTable`, which removes only the registration.
  * `IF EXISTS` additionally tolerates a registered name whose meta/data
  * are ALREADY gone (an interrupted earlier drop): the registration is
  * cleaned up and the statement no-ops. */
final case class GraftDropTableCommand(
    targetName: String,
    target: GraftSql.StoreTarget,
    ifExists: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(ss: SparkSession): Seq[Row] = {
    val fs = new Path(target.stateDir)
      .getFileSystem(ss.sparkContext.hadoopConfiguration)
    GraftSql.readMeta(fs, target.stateDir, target.table) match {
      case Some(_) =>
        graft.streaming.IngestIndex.unregisterKeyCols(target.table)
        fs.delete(new Path(target.stateDir), true)
        GraftSql.unregisterTable(targetName)
      case None if ifExists =>
        // an earlier drop deleted meta + data but died before
        // unregistering — finish the cleanup, no-op otherwise
        GraftSql.unregisterTable(targetName)
      case None =>
        throw new IllegalArgumentException(
          s"DROP TABLE $targetName: the store under " +
            s"${target.stateDir} carries no _graft_meta — it was " +
            "registered by hand, not created through SQL, so DROP " +
            "will not delete data this surface never owned; " +
            "GraftSql.unregisterTable removes just the registration")
    }
    Seq.empty
  }
}

/** `INSERT INTO [OVERWRITE semantics via the overwrite flag] <registered
  * store table> [(cols)] SELECT ...` (r18) — the bulk-load half of the
  * SQL surface. Semantics:
  *   - plain INSERT INTO appends rows under the table's PRIMARY KEY:
  *     a duplicate key (within the batch, or against a live stored row)
  *     raises a named error AT EXECUTION — the guard rides the same
  *     touched-bucket join the commit pays anyway, no extra pass;
  *   - INSERT OVERWRITE replaces the table's contents (the rig-seeding
  *     verb as SQL): touched = every live bucket + the batch's, combine
  *     ignores the current slice; a live deletion vector composes (its
  *     tombstones are invalidated with the rewrite, so re-inserted keys
  *     surface — mergeCommitDv's law);
  *   - a column LIST maps by name, unlisted payload columns take NULL
  *     (every key must be listed); no list = positional against the
  *     declared schema (arity-checked), each column CAST to the
  *     declared type.
  * Cost geometry is the store's: O(batch + touched buckets) per
  * statement, one manifest write (`op = insert`/`insert-overwrite`).
  * Returns the committed version. */
final case class GraftInsertCommand(
    targetName: String,
    target: GraftSql.StoreTarget,
    userCols: Seq[String],
    query: LogicalPlan,
    overwrite: Boolean,
    byName: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)

  override def run(ss: SparkSession): Seq[Row] = {
    import graft.streaming.IngestIndex
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fs = new Path(target.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val top = IngestIndex.latestVersion(fs, target.stateDir)
    val m = top.map(IngestIndex.readManifest(fs, target.stateDir, _))
      .getOrElse(Map.empty: IngestIndex.Manifest)
    // the CURRENT raw schema wins over the declared meta when a version
    // is committed (review fix): a store that evolved in place (q128)
    // must map inserts — and rewrite touched buckets — under the
    // evolved width, not the stale CREATE-time declaration; the meta
    // schema is only the empty-table bootstrap
    val schema: StructType =
      if (m.contains(target.table))
        GraftSql.widenSchemaToMeta(spark, target,
          IngestIndex.currentTable(spark, target.stateDir, target.table,
            raw = true).schema)
      else GraftSql.declaredMeta(spark, target).map(_.schema).getOrElse(
        throw new IllegalArgumentException(
          s"INSERT INTO '$targetName': table '${target.table}' has " +
            s"neither a meta file nor a committed version under " +
            s"${target.stateDir} — CREATE TABLE ... USING graft first"))
    val keys = IngestIndex.keyColsFor(target.table)
    val src = GraftInsertCommand.alignSource(spark, targetName, schema,
      keys, userCols, query, byName)
    Seq(Row(GraftInsertCommand.insertAligned(spark, targetName, target,
      src, overwrite, resolved = Some((fs, top, m)))))
  }
}

object GraftInsertCommand {

  /** Column mapping shared by the statement path and the transaction
    * path (r20): BY NAME / column list map by name (keys mandatory,
    * unlisted payload -> NULL); default is positional, arity-checked,
    * each column CAST to the declared type. */
  private[operators] def alignSource(
      spark: org.apache.spark.sql.classic.SparkSession,
      targetName: String, schema: StructType, keys: Seq[String],
      userCols: Seq[String], query: LogicalPlan, byName: Boolean)
      : org.apache.spark.sql.DataFrame = {
    val src0 = GraftSqlBridge.ofRows(spark, query)
    if (byName || userCols.nonEmpty) {
      val provided: Map[String, Column] =
        if (userCols.nonEmpty) {
          require(userCols.size == src0.columns.length,
            s"INSERT INTO '$targetName' lists ${userCols.size} " +
              s"columns but the query produces " +
              s"${src0.columns.length}")
          userCols.zip(src0.columns).map { case (tc, sc) =>
            val canon = schema.fieldNames
              .find(_.equalsIgnoreCase(tc)).getOrElse(
                throw new IllegalArgumentException(
                  s"INSERT INTO '$targetName': '$tc' is not a " +
                    s"column (${schema.fieldNames.mkString(", ")})"))
            canon -> col(sc)
          }.toMap
        } else src0.columns.flatMap { sc =>
          schema.fieldNames.find(_.equalsIgnoreCase(sc))
            .map(_ -> col(sc))
        }.toMap
      keys.foreach(k => require(provided.contains(k),
        s"INSERT INTO '$targetName': the merge key '$k' must be " +
          "among the inserted columns"))
      src0.select(schema.fields.map { f =>
        provided.get(f.name) match {
          case Some(c) => c.cast(f.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }.toSeq: _*)
    } else {
      require(src0.columns.length == schema.fields.length,
        s"INSERT INTO '$targetName' (positional): the query " +
          s"produces ${src0.columns.length} columns, the table has " +
          s"${schema.fields.length} (${schema.fieldNames
            .mkString(", ")})")
      src0.select(schema.fields.zipWithIndex.map { case (f, i) =>
        col(src0.columns(i)).cast(f.dataType).as(f.name)
      }.toSeq: _*)
    }
  }

  /** The shared commit body for an ALREADY schema-aligned source — the
    * statement path maps columns first; the DSv2 catalog's V1-write
    * fallback ([[GraftWriteBuilder]]) hands a frame Spark aligned.
    * PRIMARY KEY guards ride the commit's own key window and slice
    * join (no extra passes); OVERWRITE replaces contents and composes
    * with a live deletion vector. Returns the committed version. */
  def insertAligned(spark: org.apache.spark.sql.classic.SparkSession,
      targetName: String, target: GraftSql.StoreTarget,
      src: org.apache.spark.sql.DataFrame, overwrite: Boolean,
      resolved: Option[(org.apache.hadoop.fs.FileSystem, Option[Long],
        graft.streaming.IngestIndex.Manifest)] = None,
      opTag: Option[String] = None): Long = {
    import graft.streaming.IngestIndex
    // the statement path already resolved (fs, top, manifest) for its
    // column mapping — don't pay the directory listing twice (review
    // fix: latestVersion is an unmemoized LIST per call)
    val (fs, top, m) = resolved.getOrElse {
      val fs0 = new Path(target.stateDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val top0 = IngestIndex.latestVersion(fs0, target.stateDir)
      (fs0, top0,
        top0.map(IngestIndex.readManifest(fs0, target.stateDir, _))
          .getOrElse(Map.empty: IngestIndex.Manifest))
    }
    val keys = IngestIndex.keyColsFor(target.table)
    val cols = src.columns.toSeq
    // PRIMARY KEY guard, batch-internal half: a duplicate key within
    // the inserted rows raises at execution (rides the key window)
    val keyStr = concat_ws(",", keys.map(k => col(k).cast("string")): _*)
    val delta = src.select((cols.map(col) :+
      when(count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)) > 1,
        raise_error(concat(
          lit(s"INSERT INTO '$targetName': duplicate PRIMARY KEY ("),
          keyStr, lit(") within the inserted rows"))).isNotNull)
        .otherwise(lit(true)).as("__pk")).toSeq: _*)
      .filter(col("__pk")).drop("__pk")
    val combine: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame =
      if (overwrite) (_, d) => d
      else (cur, d) => {
        // stored half of the PK guard: any live row matching an
        // inserted key raises — evaluated on the touched slice the
        // merge reads anyway. Buckets predating an ALTER widening
        // null-fill the added columns first (q128's law).
        val haveCur = cur.columns
          .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
        val extra = d.schema.fields.filterNot(f =>
          haveCur(f.name.toLowerCase(java.util.Locale.ROOT)))
        val curW =
          if (extra.isEmpty) cur
          else cur.select((cur.columns.toSeq.map(col) ++
            extra.toSeq.map(f =>
              lit(null).cast(f.dataType).as(f.name))): _*)
        val hits = d.select(keys.map(col): _*)
          .withColumn("__hit", lit(true))
        curW.join(hits, keys, "left")
          .select((cols.map(col) :+
            when(col("__hit"),
              raise_error(concat(
                lit(s"INSERT INTO '$targetName': PRIMARY KEY ("),
                keyStr, lit(") already exists — use MERGE INTO to " +
                  "upsert"))).isNotNull)
              .otherwise(lit(true)).as("__pk")).toSeq: _*)
          .filter(col("__pk")).drop("__pk")
          .unionByName(d)
      }
    val touched: Option[Set[Int]] =
      if (!overwrite) None
      else {
        val n = IngestIndex.numBuckets(spark)
        val gens = IngestIndex.gensOf(m, target.table)
        val deltaBkts = IngestIndex
          .assignBucket(delta, target.table, n, gens)
          .select("bkt").distinct().collect().map(_.getInt(0)).toSet
        Some(m.getOrElse(target.table,
          Map.empty[Int, IngestIndex.Bkt]).keySet ++ deltaBkts)
      }
    val next = top.getOrElse(0L) + 1
    val nm = IngestIndex.mergeCommitDv(spark, target.stateDir, m,
      target.table, next, delta, combine, touchedKnown = touched)
    IngestIndex.writeManifest(fs, target.stateDir, next, nm,
      op = opTag.getOrElse(if (overwrite) "insert-overwrite"
        else "insert"))
    next
  }
}

/** `CREATE TABLE <n> (PRIMARY KEY (k...)) USING graft LOCATION '<dir>'
  * AS <query>` (r19) — the one DDL form r18 left out: CTAS. Schema is
  * INFERRED from the query (the standard CTAS contract — the column
  * group declares only the key); the statement is the composition of
  * [[GraftCreateTableCommand]]'s identity write and
  * [[GraftInsertCommand.insertAligned]]'s guarded seed commit, in that
  * order (atomic-ish: meta first, seed as v1 — a seed failure leaves a
  * valid EMPTY table, never a keyless data dir). The seed rides the
  * commit's own shuffles with the PRIMARY KEY guards live: a CTAS
  * whose query yields duplicate keys raises the named batch-internal
  * error. History reads `create-as-select` at v1.
  *
  * `IF NOT EXISTS` is WHOLE-STATEMENT no-op when the table already
  * exists (Delta's CTAS rule): the existing identity re-registers, the
  * query is not run, the data is untouched — re-running a setup script
  * cannot clobber a live table. Returns the seeded (or current)
  * version. */
final case class GraftCtasCommand(
    targetName: String,
    stateDir: String,
    table: String,
    keys: Seq[String],
    ifNotExists: Boolean,
    queryText: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(ss: SparkSession): Seq[Row] = {
    import graft.streaming.IngestIndex
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    GraftSql.readMeta(fs, stateDir, table) match {
      case Some(m) if !ifNotExists =>
        throw new IllegalArgumentException(
          s"CREATE TABLE $targetName AS SELECT: a graft table " +
            s"'${m.table}' already exists under $stateDir (keyed by " +
            s"${m.keys.mkString(", ")}) — CTAS never replaces a live " +
            "table; use CREATE TABLE IF NOT EXISTS ... AS SELECT to " +
            "no-op, or DROP it first")
      case Some(m) =>
        // IF NOT EXISTS: re-register the DURABLE identity, run nothing
        IngestIndex.registerKeyCols(m.table, m.keys)
        GraftSql.registerTable(targetName, stateDir, m.table)
        Seq(Row(IngestIndex.latestVersion(fs, stateDir).getOrElse(0L)))
      case None =>
        // the query parses with the SESSION parser (not the verb
        // matcher — CTAS sources are plain queries) and analyzes here
        val src = GraftSqlBridge.ofRows(spark,
          spark.sessionState.sqlParser.parsePlan(queryText))
        val schema = src.schema
        val canonKeys = keys.map { k =>
          schema.fieldNames.find(_.equalsIgnoreCase(k)).getOrElse(
            throw new IllegalArgumentException(
              s"CREATE TABLE $targetName AS SELECT: PRIMARY KEY " +
                s"column '$k' is not among the query's columns " +
                s"(${schema.fieldNames.mkString(", ")})"))
        }
        IngestIndex.registerKeyCols(table, canonKeys)
        fs.mkdirs(new Path(stateDir))
        GraftSql.writeMeta(fs, stateDir,
          GraftSql.TableMeta(table, canonKeys, schema))
        GraftSql.registerTable(targetName, stateDir, table)
        Seq(Row(GraftInsertCommand.insertAligned(spark, targetName,
          GraftSql.StoreTarget(stateDir, table), src,
          overwrite = false, opTag = Some("create-as-select"))))
    }
  }
}

/** The parsed row-level-DML pieces, held OUTSIDE the command's
  * expression surface for the same reason as [[ParsedMergeActions]]:
  * `Assignment` and the WHERE condition are Expressions, and
  * CheckAnalysis would fail the command on references that only
  * translate against the store's schema at run time. */
final case class ParsedDml(
    cond: Option[Expression],
    sets: Seq[Assignment])

/** Shared translation for the row-level DML verbs (r18, `DELETE FROM` /
  * `UPDATE`): rewrite parsed target-column references to the snapshot's
  * canonical column names, with named errors for typos, foreign
  * qualifiers, and subquery conditions (the Delta restriction — a
  * correlated source belongs in `MERGE INTO ... USING`). */
private[operators] object GraftDml {

  def canon(verb: String, targetName: String, schema: StructType)
      (c: String): String =
    schema.fieldNames.find(_.equalsIgnoreCase(c)).getOrElse(
      throw new IllegalArgumentException(
        s"$verb '$targetName': '$c' is not a column of the table " +
          s"(${schema.fieldNames.mkString(", ")})"))

  /** The parsed expression as a Column over the snapshot's columns. */
  def xlate(verb: String, targetName: String, tAlias: String,
      schema: StructType)(e: Expression): Column = {
    require(!e.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.SubqueryExpression]),
      s"$verb '$targetName': subqueries in the condition are not " +
        "supported — express a correlated condition as MERGE INTO " +
        "with a USING source")
    val name = canon(verb, targetName, schema) _
    val t = e.transformUp {
      // defensive: builtin resolution runs before the injected rule in
      // each fixed-point pass; a reference it somehow resolved still
      // maps by name
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        UnresolvedAttribute(Seq(name(a.name)))
      case UnresolvedAttribute(parts) => parts match {
        case Seq(c) => UnresolvedAttribute(Seq(name(c)))
        case Seq(q, c) if q.equalsIgnoreCase(tAlias) =>
          UnresolvedAttribute(Seq(name(c)))
        case other => throw new IllegalArgumentException(
          s"$verb '$targetName' references '${other.mkString(".")}' — " +
            s"only the target table's columns (optionally qualified " +
            s"by '$tAlias.') are in scope")
      }
    }
    GraftSqlBridge.column(t)
  }

  /** UPDATE assignment translation, shared by the statement and the
    * transaction paths (r20): canonical column names, the identity-key
    * no-op rule (with the r18 foreign-qualifier guard), the key-rewrite
    * rejection, and the duplicate-assignment check. */
  def updateSets(targetName: String, tAlias: String, schema: StructType,
      keys: Seq[String], assigns: Seq[Assignment])
      : Map[String, Column] = {
    val name = canon("UPDATE", targetName, schema) _
    val xl = xlate("UPDATE", targetName, tAlias, schema) _
    val pairs = assigns.flatMap { as =>
      val c = as.key match {
        case UnresolvedAttribute(Seq(c0)) => c0
        case UnresolvedAttribute(Seq(q, c0))
            if q.equalsIgnoreCase(tAlias) => c0
        // catalog targets resolve before the rule runs (r18)
        case a: org.apache.spark.sql.catalyst.expressions
            .AttributeReference => a.name
        case other => throw new IllegalArgumentException(
          s"UPDATE '$targetName': cannot assign to " +
            s"'${other.sql}' — assignments set target columns")
      }
      keys.find(_.equalsIgnoreCase(c)) match {
        case Some(k) =>
          // the IDENTITY assignment (key = key) is a no-op, not a
          // key rewrite — analyzer alignment emits one per
          // unassigned column on resolved targets. An unresolved
          // RHS only counts as identity when its qualifier (if
          // any) is the TARGET's alias (r18 advisor fix):
          // `SET user_id = foo.user_id` is a genuine key
          // reassignment from a foreign source and must raise,
          // not silently no-op.
          val identity = as.value match {
            case a: org.apache.spark.sql.catalyst.expressions
                .AttributeReference => a.name.equalsIgnoreCase(k)
            case UnresolvedAttribute(parts) =>
              parts.last.equalsIgnoreCase(k) &&
                (parts.length == 1 || (parts.length == 2 &&
                  parts.head.equalsIgnoreCase(tAlias)))
            case _ => false
          }
          if (identity) None
          else throw new IllegalArgumentException(
            s"UPDATE '$targetName': reassigning the merge key " +
              s"'$k' is not supported — a key rewrite is a " +
              "DELETE + INSERT (express it with MERGE INTO)")
        case None => Some(name(c) -> xl(as.value))
      }
    }
    val dup = pairs.groupBy(_._1).collect {
      case (c, vs) if vs.size > 1 => c }
    require(dup.isEmpty, s"UPDATE '$targetName': column" +
      s"(s) assigned more than once: ${dup.mkString(", ")}")
    require(pairs.nonEmpty, s"UPDATE '$targetName': no assignments")
    pairs.toMap
  }

  /** (name, alias, target) when a DML statement's target plan names a
    * registered store table (optionally aliased); None falls through
    * to Spark's own handling. */
  def targetOf(p: LogicalPlan)
      : Option[(String, String, GraftSql.StoreTarget)] = {
    val (alias, inner) = p match {
      case sa: SubqueryAlias => (Some(sa.alias), sa.child)
      case other => (None, other)
    }
    inner match {
      case r: UnresolvedRelation =>
        // flat registry names AND catalog-prefixed names (r18 — the
        // injected parser rewrites DML before the analyzer can race)
        GraftSql.resolveStore(r.multipartIdentifier.mkString("."))
          .map { t =>
            val name = r.multipartIdentifier.mkString(".")
            (name, alias.getOrElse(r.multipartIdentifier.last), t)
          }
      // DSv2 catalog tables reaching the RESOLUTION rule (the
      // extension-free twin's path): match the resolved relation
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        Some((t.name(), alias.getOrElse(t.ident.name), t.storeTarget))
      case _ => None
    }
  }

  /** Shared preamble: manifest + current RAW schema, or None when the
    * table was CREATEd but never loaded (row-level DML on an empty
    * table is a no-op, like Delta's). Throws when nothing identifies
    * the table at all. */
  def snapshotOf(spark: org.apache.spark.sql.classic.SparkSession,
      verb: String, targetName: String, target: GraftSql.StoreTarget)
      : Option[(org.apache.hadoop.fs.FileSystem, Long,
          IngestIndex.Manifest, StructType)] = {
    val fs = new Path(target.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    IngestIndex.latestVersion(fs, target.stateDir) match {
      case None =>
        // no committed version: a CREATEd-but-empty table no-ops; a
        // target with no meta either is a broken registration
        if (GraftSql.readMeta(fs, target.stateDir, target.table).isEmpty)
          throw new IllegalStateException(
            s"$verb '$targetName': the store under ${target.stateDir} " +
              "has no committed version and no table meta — stage or " +
              "CREATE the table first")
        None
      case Some(top) =>
        val m = IngestIndex.readManifest(fs, target.stateDir, top)
        if (!m.contains(target.table)) {
          // a TRUNCATEd table (live-but-empty, no manifest entry):
          // row-level DML no-ops when the declared meta identifies it
          if (GraftSql.readMeta(fs, target.stateDir, target.table)
              .isDefined) None
          else throw new IllegalArgumentException(
            s"$verb '$targetName': table '${target.table}' absent from " +
              s"manifest v$top under ${target.stateDir}")
        } else {
          val schema = GraftSql.widenSchemaToMeta(spark, target,
            IngestIndex.currentTable(spark, target.stateDir,
              target.table, raw = true).schema)
          Some((fs, top, m, schema))
        }
    }
  }
}

/** `DELETE FROM <registered store table> [AS a] [WHERE <cond>]` (r18) —
  * the row-level delete verb as SQL, riding the store's deletion-vector
  * machinery: matched keys commit as TOMBSTONES into the `__dv` side
  * table (write IO O(matched keys), zero base buckets rewritten — the
  * q114d/q129b cost point; OPTIMIZE materializes later), and every read
  * verb hides them immediately. The matching scan is ONE pass over the
  * current snapshot with the predicate pushed into the parquet scans
  * and only the key (+ predicate) columns read. `DELETE FROM t` with no
  * WHERE (or WHERE true) is the TRUNCATE shape instead: one overwrite
  * commit whose combine drops every live row — O(live buckets) empty
  * writes, no table-sized tombstone list. Returns the committed
  * version; a CREATEd-but-never-loaded table no-ops at version 0. */
final case class GraftDeleteCommand(
    targetName: String,
    target: GraftSql.StoreTarget,
    tAlias: String,
    dml: ParsedDml) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val truncate = dml.cond.forall {
      case org.apache.spark.sql.catalyst.expressions
          .Literal(true, org.apache.spark.sql.types.BooleanType) => true
      case _ => false
    }
    if (truncate)
      return Seq(Row(GraftSql.truncateStore(spark,
        "DELETE FROM (no WHERE = truncate)", targetName, target)))
    GraftDml.snapshotOf(spark, "DELETE FROM", targetName, target) match {
      case None => Seq(Row(0L))
      case Some((fs, top, m, schema)) =>
        val keys = IngestIndex.keyColsFor(target.table)
        val next = top + 1
        val cond = GraftDml.xlate("DELETE FROM", targetName, tAlias,
          schema)(dml.cond.get)
        val snap = GraftSql.widenToMeta(spark, target,
          IngestIndex.currentTable(spark, target.stateDir,
            target.table))
        val tombstones = snap.where(cond)
          .select(keys.map(col): _*)
        val nm = IngestIndex.deleteWithDv(spark, target.stateDir, m,
          target.table, next, tombstones)
        IngestIndex.writeManifest(fs, target.stateDir, next, nm,
          op = "delete-sql")
        Seq(Row(next))
    }
  }
}

/** `UPDATE <registered store table> [AS a] SET c = e[, ...] [WHERE
  * <cond>]` (r18) — the row-level update verb as SQL: matched rows are
  * rewritten in place through the store's touched-bucket merge (Delta's
  * copy-on-write UPDATE — find the matched rows with one predicate-
  * pushed snapshot scan, rewrite ONLY the buckets holding them). The
  * merge key cannot be reassigned (the store's merge law — a key
  * rewrite is a DELETE + INSERT, which MERGE INTO expresses); a live
  * deletion vector composes (tombstoned rows neither match nor
  * resurrect — [[IngestIndex.mergeCommitDv]]'s law). Returns the
  * committed version; a CREATEd-but-never-loaded table no-ops at 0. */
final case class GraftUpdateCommand(
    targetName: String,
    target: GraftSql.StoreTarget,
    tAlias: String,
    dml: ParsedDml) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    GraftDml.snapshotOf(spark, "UPDATE", targetName, target) match {
      case None => Seq(Row(0L))
      case Some((fs, top, m, schema)) =>
        val keys = IngestIndex.keyColsFor(target.table)
        val xl = GraftDml.xlate("UPDATE", targetName, tAlias, schema) _
        val sets: Map[String, Column] = GraftDml.updateSets(targetName,
          tAlias, schema, keys, dml.sets)
        val snap = GraftSql.widenToMeta(spark, target,
          IngestIndex.currentTable(spark, target.stateDir, target.table))
        val matched = dml.cond.map(c => snap.where(xl(c))).getOrElse(snap)
        val updated = matched.select(schema.fields.map { f =>
          sets.get(f.name) match {
            case Some(c) => c.cast(f.dataType).as(f.name)
            case None => col(f.name)
          }
        }.toSeq: _*)
        val combine: (DataFrame, DataFrame) => DataFrame = (cur, d) =>
          // allowMissingColumns: buckets predating an ALTER widening
          // carry fewer columns than the widened delta (q128's law)
          cur.join(d.select(keys.map(col): _*), keys, "left_anti")
            .unionByName(d, allowMissingColumns = true)
        val next = top + 1
        val nm = IngestIndex.mergeCommitDv(spark, target.stateDir, m,
          target.table, next, updated, combine)
        IngestIndex.writeManifest(fs, target.stateDir, next, nm,
          op = "update-sql")
        Seq(Row(next))
    }
  }
}

/** `BEGIN; <dml>; ...; COMMIT` (r20, the r18 verdict's carried stretch)
  * — MULTI-STATEMENT TRANSACTIONS: several row-level DML statements over
  * ONE registered store table batched into ONE store commit. Semantics:
  *   - statements run against a VIRTUAL running state (read-your-writes:
  *     an INSERT sees prior DELETEs/UPDATEs in the same transaction, so
  *     delete-then-reinsert of a key works; the PK guard checks each
  *     INSERT against the running state, not the stale snapshot);
  *   - the store commits ONCE (`op = txn`): one version, one footprint —
  *     the union of every statement's touched buckets, written via the
  *     same key-window replace the other verbs use; deleted keys drop
  *     copy-on-write in the same rewrite (their buckets are being
  *     rewritten anyway, so no tombstone is cheaper);
  *   - ATOMIC: any statement's guard failing (duplicate key, bad column,
  *     key reassignment) aborts the WHOLE transaction before anything is
  *     written — the store's version count is unchanged;
  *   - a racing writer hits [[IngestIndex.writeManifest]]'s divergence
  *     law exactly like every single-statement verb (single-writer
  *     contract; the CAS commit adjudicates byte-identical replays).
  * Scope (named errors otherwise): INSERT INTO (positional or column
  * list; no OVERWRITE — a replace inside a multi-statement transaction
  * is a rig-seeding verb, run it standalone), DELETE FROM ... WHERE,
  * UPDATE ... SET ... WHERE, all over the SAME flat-registered or
  * catalog store table; MERGE INTO runs standalone (its clause algebra
  * already IS a multi-verb batch over one commit). Cost geometry: the
  * per-statement guards run one bounded probe each; the commit itself is
  * O(affected keys + touched buckets) — N statements cost ONE manifest
  * write and ONE version instead of N. */
final case class GraftTransactionCommand(
    stmts: Seq[LogicalPlan]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(ss: SparkSession): Seq[Row] = {
    import graft.streaming.IngestIndex
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    require(stmts.nonEmpty, "BEGIN ... COMMIT: empty transaction")
    // typed extraction; everything else is out of scope BY NAME
    val targets: Seq[(String, GraftSql.StoreTarget)] = stmts.map {
      case c: GraftInsertCommand =>
        require(!c.overwrite,
          s"BEGIN ... COMMIT: INSERT OVERWRITE '${c.targetName}' does " +
            "not compose into a transaction — a full replace is a " +
            "standalone statement")
        (c.targetName, c.target)
      case c: GraftDeleteCommand => (c.targetName, c.target)
      case c: GraftUpdateCommand => (c.targetName, c.target)
      case other => throw new IllegalArgumentException(
        "BEGIN ... COMMIT composes INSERT INTO / DELETE FROM / UPDATE " +
          "over ONE registered graft store table; got: " +
          other.nodeName + " (MERGE INTO runs standalone — its clause " +
          "algebra is already a multi-verb batch in one commit)")
    }
    val (name0, t) = targets.head
    require(targets.forall(_._2 == t),
      s"BEGIN ... COMMIT: one transaction commits ONE table — got " +
        targets.map(_._1).distinct.mkString(", "))
    val fs = new Path(t.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val top = IngestIndex.latestVersion(fs, t.stateDir)
    val m = top.map(IngestIndex.readManifest(fs, t.stateDir, _))
      .getOrElse(Map.empty: IngestIndex.Manifest)
    val keys = IngestIndex.keyColsFor(t.table)
    val schema: StructType =
      if (m.contains(t.table))
        GraftSql.widenSchemaToMeta(spark, t,
          IngestIndex.currentTable(spark, t.stateDir, t.table,
            raw = true).schema)
      else GraftSql.declaredMeta(spark, t).map(_.schema).getOrElse(
        throw new IllegalStateException(
          s"BEGIN ... COMMIT over '$name0': the store under " +
            s"${t.stateDir} has neither a meta file nor a committed " +
            "version — CREATE TABLE ... USING graft first"))
    // the virtual running state + the affected-key accumulator
    var running: org.apache.spark.sql.DataFrame =
      if (m.contains(t.table))
        GraftSql.widenToMeta(spark, t,
          IngestIndex.currentTable(spark, t.stateDir, t.table))
      else spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
    val keyShape = running.select(keys.map(col): _*).limit(0)
    var affected: org.apache.spark.sql.DataFrame = keyShape
    stmts.foreach {
      case i: GraftInsertCommand =>
        val src = GraftInsertCommand.alignSource(spark, i.targetName,
          schema, keys, i.userCols, i.query, i.byName)
        // eager PK guards against the RUNNING state (read-your-writes):
        // bounded probes, evaluated BEFORE anything commits — a failing
        // statement aborts the whole transaction with nothing written
        val dup = src.groupBy(keys.map(col): _*)
          .count().filter(col("count") > 1)
          .select(keys.map(col): _*).take(1)
        require(dup.isEmpty,
          s"BEGIN ... COMMIT: INSERT INTO '${i.targetName}' carries a " +
            s"duplicate PRIMARY KEY (${dup.mkString(", ")}) within " +
            "the inserted rows")
        val clash = src.select(keys.map(col): _*)
          .join(running.select(keys.map(col): _*), keys, "left_semi")
          .take(1)
        require(clash.isEmpty,
          s"BEGIN ... COMMIT: INSERT INTO '${i.targetName}': PRIMARY " +
            s"KEY (${clash.mkString(", ")}) already exists in the " +
            "transaction's running state — use UPDATE, or DELETE it " +
            "first (read-your-writes applies)")
        running = running.unionByName(src, allowMissingColumns = true)
        affected = affected
          .unionByName(src.select(keys.map(col): _*))
      case dcmd: GraftDeleteCommand =>
        // DELETE and UPDATE apply as SINGLE-PASS filters/projections on
        // the running state, never as self-joins: a join-based rewrite
        // (running anti-join running.where(cond)) references the running
        // plan TWICE, doubling the base-scan multiplicity per statement
        // — O(2^statements) scans in the final delta. The predicates are
        // deterministic xlate'd columns, so filter/when-projection are
        // semantically identical and keep the plan LINEAR: one base
        // scan + one operator per statement.
        val truncate = dcmd.dml.cond.forall {
          case org.apache.spark.sql.catalyst.expressions
              .Literal(true, org.apache.spark.sql.types.BooleanType) =>
            true
          case _ => false
        }
        if (truncate) {
          affected = affected
            .unionByName(running.select(keys.map(col): _*))
          running = running.limit(0)
        } else {
          val cond = GraftDml.xlate("DELETE FROM", dcmd.targetName,
            dcmd.tAlias, schema)(dcmd.dml.cond.get)
          affected = affected.unionByName(
            running.where(cond).select(keys.map(col): _*))
          // rows where cond is FALSE or NULL survive (SQL DELETE
          // removes only cond = TRUE)
          running = running.where(coalesce(!cond, lit(true)))
        }
      case u: GraftUpdateCommand =>
        val xl = GraftDml.xlate("UPDATE", u.targetName, u.tAlias,
          schema) _
        val sets = GraftDml.updateSets(u.targetName, u.tAlias, schema,
          keys, u.dml.sets)
        val condOpt = u.dml.cond.map(xl)
        affected = affected.unionByName(
          condOpt.map(c => running.where(c)).getOrElse(running)
            .select(keys.map(col): _*))
        // conditional projection, simultaneous assignment semantics
        // (RHS expressions read PRE-update values)
        running = running.select(schema.fields.map { f =>
          sets.get(f.name) match {
            case Some(e) => condOpt match {
              case Some(c) =>
                when(c, e.cast(f.dataType))
                  .otherwise(col(f.name)).as(f.name)
              case None => e.cast(f.dataType).as(f.name)
            }
            case None => col(f.name)
          }
        }.toSeq: _*)
      case _ => () // unreachable: typed above
    }
    // ONE commit: the final rows of every affected key, plus drop-tagged
    // tombstone rows for keys the transaction net-DELETED — the tag
    // keeps the whole delta shuffle-joinable (no driver-side key list,
    // no broadcast): per touched bucket the combine replaces the
    // affected keys' rows and simply does not re-add the dropped ones
    val affectedD = affected.distinct()
    val drop = "__txn_drop"
    val finalRows = running.join(affectedD, keys, "left_semi")
      .withColumn(drop, lit(false))
    val dropped = affectedD
      .join(running.select(keys.map(col): _*), keys, "left_anti")
      .select(schema.fields.map { f =>
        if (keys.exists(_.equalsIgnoreCase(f.name))) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
      .withColumn(drop, lit(true))
    // materialize the netted delta ONCE (flat-stats localCheckpoint,
    // the graft-upsert sink's discipline): the commit evaluates the
    // delta for its touched-bucket set and again inside the bucket
    // writes — without the pin, the whole transaction's composed plan
    // would re-run per evaluation
    val delta = org.apache.spark.sql.execution.GraftCheckpoint
      .localCheckpointFlatStats(finalRows.unionByName(dropped))
    val combine: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame =
      // cur.drop(drop): mergeCommit reads the touched slice against the
      // DELTA's shape, which null-fills the tag column into `cur` — left
      // in, the union would write `__txn_drop` into the bucket files
      // and every later `SELECT *` would surface it (found by the r20
      // full-verb interleaving fuzz law)
      (cur, d) => cur.drop(drop)
        .join(d.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(d.filter(!col(drop)).drop(drop),
          allowMissingColumns = true)
    val next = top.getOrElse(0L) + 1
    val nm = IngestIndex.mergeCommitDv(spark, t.stateDir, m, t.table,
      next, delta, combine)
    IngestIndex.writeManifest(fs, t.stateDir, next, nm, op = "txn")
    Seq(Row(next))
  }
}

/** `ALTER TABLE <flat registered name> ADD COLUMNS (<ddl>)` (r18): the
  * widening half of the store's schema-evolution contract as DDL — a
  * metadata-only append to the DECLARED meta schema; no committed file
  * rewrites (q128's law: the added column reads NULL until data carries
  * it, every write verb widens its slice). Catalog names take Spark's
  * native path into [[GraftCatalog.alterTable]] instead. */
final case class GraftAlterAddCommand(
    targetName: String,
    target: GraftSql.StoreTarget,
    ddl: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fs = new Path(target.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = GraftSql.readMeta(fs, target.stateDir, target.table)
      .getOrElse(throw new IllegalArgumentException(
        s"ALTER TABLE '$targetName': no declared meta under " +
          s"${target.stateDir} — ADD COLUMNS widens the DECLARED " +
          "schema, so it requires a SQL-created table (CREATE TABLE " +
          "... USING graft); engine-seeded stores evolve through " +
          "commits (mergeSchema, q128)"))
    val add = StructType.fromDDL(ddl)
    add.fields.foreach(f =>
      require(!meta.schema.fieldNames.exists(_.equalsIgnoreCase(f.name)),
        s"ALTER TABLE '$targetName': column '${f.name}' already exists"))
    GraftSql.writeMeta(fs, target.stateDir, meta.copy(schema =
      StructType(meta.schema.fields ++ add.fields.map(_.copy(
        nullable = true)))))
    Seq.empty
  }
}

/** `ALTER TABLE <flat name> ALTER COLUMN <c> TYPE <t>` (r20): safe type
  * widening as the copy-on-write rewrite [[GraftSql.retypeColumn]]
  * documents — the flat-registry twin of the catalog's
  * `TableChange.UpdateColumnType` path (both call the same helper, so
  * the widening rules and the rewrite shape can never diverge). */
final case class GraftAlterRetypeCommand(
    targetName: String,
    target: GraftSql.StoreTarget,
    column: String,
    newType: org.apache.spark.sql.types.DataType)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(ss: SparkSession): Seq[Row] = {
    GraftSql.retypeColumn(ss, targetName, target, column, newType)
    Seq.empty
  }
}

/** `ALTER TABLE <flat name> DROP COLUMN <c>` (r20): the narrowing half
  * of schema evolution as the copy-on-write rewrite
  * [[GraftSql.dropColumn]] documents — the flat-registry twin of the
  * catalog's `TableChange.DeleteColumn` path (same helper). */
final case class GraftAlterDropColumnCommand(
    targetName: String,
    target: GraftSql.StoreTarget,
    column: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(ss: SparkSession): Seq[Row] = {
    GraftSql.dropColumn(ss, targetName, target, column)
    Seq.empty
  }
}

/** `ALTER TABLE <flat name> RENAME COLUMN <a> TO <b>` (r20): a payload
  * rename as the copy-on-write rewrite [[GraftSql.renameColumn]]
  * documents — the flat-registry twin of the catalog's
  * `TableChange.RenameColumn` path (same helper). */
final case class GraftAlterRenameColumnCommand(
    targetName: String,
    target: GraftSql.StoreTarget,
    oldName: String,
    newName: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(ss: SparkSession): Seq[Row] = {
    GraftSql.renameColumn(ss, targetName, target, oldName, newName)
    Seq.empty
  }
}

/** `TRUNCATE TABLE <flat registered name>` (r20): ONE commit that
  * empties every live bucket ([[GraftSql.truncateStore]] — the same
  * shared path as `DELETE FROM <t>` with no WHERE and the catalog's
  * DSv2 `TruncatableTable`); history keeps the old snapshots, so time
  * travel reads pre-truncate contents and RESTORE rolls it back.
  * Returns the committed version. */
final case class GraftTruncateTableCommand(
    targetName: String,
    target: GraftSql.StoreTarget) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    Seq(Row(GraftSql.truncateStore(spark, "TRUNCATE TABLE",
      targetName, target)))
  }
}

/** `SHOW CREATE TABLE <flat registered name>` (r20): Spark's
  * one-string-row shape (`createtab_stmt`), reconstructed from the
  * DECLARED meta so the emitted statement ROUND-TRIPS through the
  * engine's own `CREATE TABLE ... USING graft` verb — columns, the
  * PRIMARY KEY clause, and the LOCATION. Engine-seeded stores without
  * a meta raise a named error (SQL never owned their schema). */
final case class GraftShowCreateTableCommand(
    targetName: String,
    target: GraftSql.StoreTarget) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("createtab_stmt",
      org.apache.spark.sql.types.StringType, nullable = false)())

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fs = new Path(target.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = GraftSql.readMeta(fs, target.stateDir, target.table)
      .getOrElse(throw new IllegalArgumentException(
        s"SHOW CREATE TABLE '$targetName': the store under " +
          s"${target.stateDir} carries no _graft_meta (not a " +
          "SQL-created table) — its schema lives in its commits, not " +
          "a declaration"))
    val cols = meta.schema.fields
      .map(f => s"  ${quoteIfNeeded(f.name)} ${f.dataType.sql}" +
        (if (f.nullable) "" else " NOT NULL"))
    val pk = s"  PRIMARY KEY (${meta.keys.map(quoteIfNeeded).mkString(", ")})"
    val stmt = s"CREATE TABLE $targetName (\n" +
      (cols :+ pk).mkString(",\n") +
      s"\n) USING graft\nLOCATION '${target.stateDir}'"
    Seq(Row(stmt))
  }

  private def quoteIfNeeded(n: String): String =
    if (n.matches("[A-Za-z_][A-Za-z0-9_]*")) n else s"`$n`"
}

/** `DESCRIBE HISTORY <registered table>` — Delta's ops surface as SQL:
  * one row per retained version, newest first, with the r17 operation
  * tag. Metadata-only (memoized manifest resolutions, zero data IO). */
final case class GraftDescribeHistoryCommand(
    targetName: String,
    target: GraftSql.StoreTarget) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation",
      org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("delta_depth",
      org.apache.spark.sql.types.IntegerType, nullable = false)(),
    AttributeReference("tables",
      org.apache.spark.sql.types.IntegerType, nullable = false)(),
    AttributeReference("live_buckets",
      org.apache.spark.sql.types.IntegerType, nullable = false)(),
    AttributeReference("manifest_mtime", LongType, nullable = false)())

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fs = new Path(target.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    IngestIndex.describeHistory(fs, target.stateDir).map(h =>
      Row(h.version, h.operation, h.deltaDepth, h.tables, h.liveBuckets,
        h.manifestMtime))
  }
}

/** `RESTORE TABLE <registered table> [TO] VERSION AS OF <v>` — Delta's
  * rollback verb as SQL: commits a new version whose manifest is `v`'s
  * (zero data copied — the q134 semantics) and returns it. */
final case class GraftRestoreCommand(
    targetName: String,
    target: GraftSql.StoreTarget,
    version: Long) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val (fs, top) = GraftSql.storeTop(spark, target, "RESTORE", targetName)
    IngestIndex.restore(fs, target.stateDir, version, top + 1)
    Seq(Row(top + 1))
  }
}

/** `VACUUM <registered table> RETAIN <k> VERSIONS | HOURS` — the gc
  * verb as SQL: reclaims version dirs no retained manifest references.
  * The VERSIONS form keeps the newest `k` snapshots fully readable (k
  * clamps to the crash-replay minimum of 2); the HOURS form (r18) is
  * the production wall-clock window (Delta's
  * `deletedFileRetentionDuration`): every version whose manifest mtime
  * is younger than `k` hours stays fully readable, with the count floor
  * at the crash-replay minimum. Returns the deleted versions. */
final case class GraftVacuumCommand(
    targetName: String,
    target: GraftSql.StoreTarget,
    retain: Int,
    hours: Boolean = false,
    dryRun: Boolean = false) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference(
      if (dryRun) "reclaimable_version" else "deleted_version",
      LongType, nullable = false)())

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val (fs, top) = GraftSql.storeTop(spark, target, "VACUUM", targetName)
    val deleted =
      if (hours)
        IngestIndex.gc(fs, target.stateDir, math.max(1L, top - 1), top,
          retain = 2, retainMillis = retain * 3600L * 1000L,
          dryRun = dryRun)
      else
        IngestIndex.gc(fs, target.stateDir, math.max(1L, top - 1), top,
          retain, dryRun = dryRun)
    deleted.map(Row(_))
  }
}

/** `DESCRIBE DETAIL <registered store | catalog name>` (r20): Delta's
  * one-row table summary — format, name, location, primary key, the
  * current version, retained version count, live data-bucket count,
  * live bytes, and the latest commit instant. Metadata-only except the
  * per-live-bucket size listing (O(live buckets) — exactly what
  * Delta's numFiles/sizeInBytes listing costs). */
final case class GraftDescribeDetailCommand(
    targetName: String,
    target: GraftSql.StoreTarget) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("format",
      org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("name",
      org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("location",
      org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("primary_key",
      org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("current_version", LongType, nullable = false)(),
    AttributeReference("retained_versions",
      org.apache.spark.sql.types.IntegerType, nullable = false)(),
    AttributeReference("live_buckets",
      org.apache.spark.sql.types.IntegerType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("last_modified", LongType, nullable = false)())

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fs = new Path(target.stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keys = IngestIndex.keyColsFor(target.table).mkString(", ")
    IngestIndex.latestVersion(fs, target.stateDir) match {
      case None =>
        // CREATEd-but-never-loaded: the declared table, zero data
        Seq(Row("graft", targetName, target.stateDir, keys, 0L, 0, 0,
          0L, 0L))
      case Some(top) =>
        val hist = IngestIndex.describeHistory(fs, target.stateDir)
        val m = IngestIndex.readManifest(fs, target.stateDir, top)
        val live = m.getOrElse(target.table,
          Map.empty[Int, IngestIndex.Bkt])
          .filter(_._2.ver != IngestIndex.EmptyVer)
        val bytes = live.iterator.map { case (b, e) =>
          IngestIndex.liveBytes(fs, target.stateDir, target.table, b,
            e.ver)
        }.sum
        Seq(Row("graft", targetName, target.stateDir, keys, top,
          hist.length, live.size, bytes,
          hist.headOption.map(_.manifestMtime).getOrElse(0L)))
    }
  }
}

/** The injected parser (the Delta-extension pattern): intercept the
  * lakehouse-verb statements Spark's grammar does not carry, delegate
  * EVERYTHING else — three anchored regex probes per statement, so the
  * overhead on ordinary SQL is nanoseconds. MERGE INTO needs no parser
  * work (Spark parses it natively; the resolution rule routes it). */
final class GraftSqlParser(
    delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
    extends org.apache.spark.sql.catalyst.parser.ParserInterface {

  /** DML statements over graft tables rewrite AT PARSE TIME (r18): a
    * MERGE/UPDATE/DELETE whose target is a registered flat name or a
    * graft-CATALOG name becomes the runnable command while every
    * reference is still unresolved — Spark's own RewriteMergeIntoTable
    * throws for resolved non-row-level v2 targets EARLIER in the
    * Resolution batch than injected rules run, so the analyzer race
    * cannot be won post-parse. [[GraftMergeSqlRule]] is idempotent and
    * returns other plans unchanged; INSERTs over catalog names stay
    * native (the DSv2 V1-write fallback handles column mapping). */
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSql.parseVerb(sqlText)
      .getOrElse(GraftMergeSqlRule(delegate.parsePlan(sqlText)))

  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    GraftSql.parseVerb(sqlText)
      .getOrElse(GraftMergeSqlRule(
        delegate.parsePlanWithParameters(sqlText, ctx)))

  override def parseExpression(sqlText: String)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String)
      : org.apache.spark.sql.catalyst.TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String)
      : org.apache.spark.sql.catalyst.FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  override def parseRoutineParam(sqlText: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)

  override def parseTableSchema(sqlText: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

/** `OPTIMIZE <registered table> [RETAIN <k> VERSIONS]` — the maintenance
  * verb as SQL: materialize any accumulated deletion vector (the
  * Delta REORG/PURGE half — one rewrite of only tombstoned buckets),
  * then fold the version tail into one compaction epoch (the OPTIMIZE
  * half), keeping `k` snapshots (default 8) time-travelable. Returns
  * (version, purged_tombstones). */
/** `OPTIMIZE <registered layout> ZORDER|HILBERT BY (x, y)` (r18) — the
  * Delta OPTIMIZE ZORDER statement over a plain parquet layout dir:
  * bin-pack + curve-cluster + stats manifest in one read/shuffle/write
  * ([[graft.queries.Layout.optimize]]'s shape), swapped IN PLACE so the
  * table path is stable for readers. The manifest is written AFTER the
  * swap (its file column holds absolute paths — written before, every
  * row would point at the staging dir). Crash window: between the
  * delete and the rename the dir is briefly absent — acceptable for a
  * maintenance STATEMENT (the streaming store's commit path never uses
  * this; it has the manifest protocol). Returns (files_before,
  * files_after). */
final case class GraftOptimizeLayoutCommand(
    targetName: String,
    path: String,
    hilbert: Boolean,
    x: String,
    y: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)())

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"OPTIMIZE $targetName: no layout at $path")
    def parquetFiles(d: Path): Long =
      fs.listStatus(d).count(st =>
        st.getPath.getName.endsWith(".parquet")).toLong
    val before = parquetFiles(p)
    val df = spark.read.parquet(path)
    Seq(x, y).foreach(c => require(df.columns.contains(c),
      s"OPTIMIZE $targetName: no column '$c' in the layout " +
        s"(columns: ${df.columns.mkString(", ")})"))
    val tmp = new Path(path + ".optimizing")
    fs.delete(tmp, true)
    graft.queries.Layout.clusterInto(spark, df, x, y, tmp.toString,
      hilbert)
    fs.delete(p, true)
    require(fs.rename(tmp, p),
      s"OPTIMIZE $targetName: could not install the rewritten layout " +
        s"at $path (rewrite staged at $tmp)")
    // AFTER the swap: the stats manifest records absolute file paths
    graft.queries.Layout.writeStatsManifest(spark, path,
      Seq(x, y, "zv"))
    Seq(Row(before, parquetFiles(p)))
  }
}

final case class GraftOptimizeCommand(
    targetName: String,
    target: GraftSql.StoreTarget,
    retain: Int) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("purged_tombstones",
      org.apache.spark.sql.types.BooleanType, nullable = false)())

  override def run(ss: SparkSession): Seq[Row] = {
    val spark = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val (fs, top0) = GraftSql.storeTop(spark, target, "OPTIMIZE",
      targetName)
    var top = top0
    val m = IngestIndex.readManifest(fs, target.stateDir, top)
    val dvLive = m.get(IngestIndex.dvTable(target.table))
      .exists(_.exists(_._2.ver != IngestIndex.EmptyVer))
    if (dvLive) {
      val nm = IngestIndex.materializeDeletes(spark, target.stateDir, m,
        target.table, top + 1, IngestIndex.keyColsFor(target.table))
      IngestIndex.writeManifest(fs, target.stateDir, top + 1, nm,
        op = "materialize")
      top += 1
    }
    IngestIndex.compact(spark, target.stateDir, top, retain = retain)
    Seq(Row(top, dvLive))
  }
}
