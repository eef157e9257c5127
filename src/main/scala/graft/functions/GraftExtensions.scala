package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Production wiring for graft's native functions: inject them at session
  * build time via `SparkSessionExtensions`, so every session created with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *
  * (or `spark.sql.extensions=graft.functions.GraftExtensions` in a
  * cluster's spark-defaults) has `cosine_sim` / `dot_product` available in
  * SQL and `expr(...)` without per-query registration. The per-session
  * [[GraftFunctions.register]] remains for ad-hoc use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    // no-op until spark.graft.rangeJoin.binWidth is set > 0
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
    // store-native CDC as a TABLE-VALUED function (r18, Delta parity):
    // SELECT * FROM table_changes('<store>', v1, v2) — resolved by
    // Spark's own TVF machinery; the builder returns the engine's
    // analyzed changesBetween plan (per-step reads restricted to the
    // commits' own bucket footprints)
    ext.injectTableFunction((
      new FunctionIdentifier("table_changes"),
      new ExpressionInfo(graft.operators.GraftSql.getClass.getName,
        "table_changes"),
      (exprs: Seq[Expression]) =>
        graft.operators.GraftSql.tableChangesPlan(exprs)))
    // SQL `MERGE INTO <registered graft store table>` (r17): Spark's own
    // parser already yields MergeIntoTable; this rewrite routes it to the
    // engine's MergeInto algebra over the bucketed store. Unregistered
    // targets fall through untouched.
    // ORDER INVARIANT: the MERGE rule must precede the store-read rule —
    // both run sequentially per fixed-point iteration, and the MERGE
    // target must still be an UnresolvedRelation when the merge rule
    // matches (the read rule would otherwise resolve it into a snapshot
    // scan and break the statement); once the merge rule has rewritten
    // the plan into its command, the read rule only ever resolves
    // genuine reads (including the MERGE's own USING source, which the
    // command analyzes at execution).
    ext.injectResolutionRule(_ => graft.operators.GraftMergeSqlRule)
    // SQL READ surface (r17): SELECT ... FROM <registered store table>
    // [VERSION AS OF v] — Spark parses the time-travel clause natively;
    // temp views/catalog tables with the same name win (builtin
    // resolution runs first), so nothing valid is shadowed.
    ext.injectResolutionRule(session =>
      graft.operators.GraftStoreReadRule(session))
    // the lakehouse verbs Spark's grammar does not carry — DESCRIBE
    // HISTORY / RESTORE ... VERSION AS OF / VACUUM ... RETAIN N VERSIONS
    // — via a delegating parser (the Delta-extension pattern): three
    // anchored regex probes per statement, everything else delegates
    ext.injectParser((_, delegate) =>
      new graft.operators.GraftSqlParser(delegate))
  }
}
