package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One WHEN clause of a [[MergeInto]]: an optional gate (None = fires
  * unconditionally), and the action — DELETE, or UPDATE/INSERT with the
  * per-column assignments in `set` (columns absent from `set` keep the
  * family's default: the target row's value for MATCHED / NOT MATCHED BY
  * SOURCE, the source row's for NOT MATCHED). Clauses in a family are
  * ORDERED: the first whose gate fires acts, later clauses are dead for
  * that row (the SQL:2023 first-match-wins contract). */
final case class MergeClause(
    when: Option[Column],
    delete: Boolean,
    set: Map[String, Column])

object MergeClause {
  def update(set: Map[String, Column], when: Option[Column] = None)
      : MergeClause = MergeClause(when, delete = false, set)
  def delete(when: Option[Column] = None): MergeClause =
    MergeClause(when, delete = true, Map.empty)
  /** An INSERT clause (NOT MATCHED family): `set` overrides source
    * values; absent columns take the source row's payload verbatim. */
  def insert(when: Option[Column] = None,
      set: Map[String, Column] = Map.empty): MergeClause =
    MergeClause(when, delete = false, set)
}

/** Declarative multi-clause MERGE — the lakehouse `MERGE INTO target
  * USING source ON key` statement (Delta/Iceberg/SQL:2023), expressed as
  * a pure DataFrame combine step so it composes with the bucketed
  * persistent store ([[graft.streaming.IngestIndex.mergeCommit]] takes
  * exactly a `(current, delta) => merged` function — and, because this
  * class IS that function, the store can enforce clause-family
  * preconditions at its entry point).
  *
  * The three SQL:2023 clause FAMILIES, each an ordered list (first match
  * wins per row; a row matching no clause of its family is kept
  * unchanged for MATCHED / BY SOURCE, and DROPPED for NOT MATCHED —
  * exactly the standard's defaults):
  *   - [[matched]]: `WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE`
  *   - [[notMatched]]: `WHEN NOT MATCHED [BY TARGET] [AND cond] THEN
  *     INSERT ...` (DELETE is illegal here — there is no target row)
  *   - [[notMatchedBySource]]: `WHEN NOT MATCHED BY SOURCE [AND cond]
  *     THEN UPDATE SET ... | DELETE` (the full-sync family: acts on
  *     target rows the source does not carry, so it requires a FULL
  *     target scan — the store's mergeCommit enforces that pairing)
  *
  * Conditions and assignments reference the target row's columns as
  * `t_<col>` and the source row's as `s_<col>` (both sides must carry
  * every `keys` column — COMPOSITE merge keys are one equi-join on the
  * key tuple (r18) — plus every `payload` column; BY SOURCE
  * conditions/assignments
  * may only reference `t_<col>` — no source row exists for those keys).
  * A gate evaluating to NULL reads as "does not fire" (SQL's
  * unknown-is-false for MERGE clause conditions).
  *
  * CARDINALITY (r16): SQL MERGE (and Delta) raise an error when multiple
  * source rows match one target key — silently emitting one output row
  * per duplicate would fan the target out. With [[checkCardinality]] on
  * (the default), the source side carries a per-key count window and any
  * MATCHED row whose key has >1 source rows raises a named error AT
  * EXECUTION, in the same pass as the merge itself (the window shuffles
  * on the join key the full-outer join needs anyway, so on a
  * pre-aggregated source the check adds no exchange). Sources that are
  * unique-by-construction can opt out.
  *
  * Scale shape: ONE full-outer equi-join on the merge key plus a
  * codegen'd projection — no second shuffle. Run through the bucketed
  * store, the join's left side is only the TOUCHED buckets' current
  * rows, so a MERGE batch costs O(batch + touched buckets), not
  * O(table): the exact geometry a 100 TB CDC MERGE needs (and the same
  * one q86's streaming upsert already rides). A merge with BY SOURCE
  * clauses is the exception — it must see every target row (a key can be
  * acted on precisely because the batch does NOT carry it), the
  * full-target-scan cost Delta documents for the clause family.
  */
final case class MergeInto(
    keys: Seq[String],
    payload: Seq[String],
    matched: Seq[MergeClause] = Nil,
    notMatched: Seq[MergeClause] = Nil,
    notMatchedBySource: Seq[MergeClause] = Nil,
    checkCardinality: Boolean = true,
    widenTo: Option[org.apache.spark.sql.types.StructType] = None)
    extends ((DataFrame, DataFrame) => DataFrame) {

  require(keys.nonEmpty, "MERGE INTO requires at least one merge key")
  require(notMatched.forall(!_.delete),
    "WHEN NOT MATCHED THEN DELETE is not a MERGE clause: no target row " +
      "exists for an unmatched source key")

  /** True when the merge has BY SOURCE clauses and therefore MUST see
    * every live target row — the store's mergeCommit asserts a
    * full-target touched set for such merges. */
  def requiresFullTarget: Boolean = notMatchedBySource.nonEmpty

  /** The MERGE as a combine: `target` = current rows (of the touched
    * slice, when run through the store), `source` = the batch. Returns
    * the slice's post-merge rows (`key` + `payload` columns). */
  def apply(target: DataFrame, source: DataFrame): DataFrame = {
    // schema-adaptive (r18, ALTER TABLE ADD COLUMNS): a side whose
    // stored buckets predate a declared-schema widening null-fills the
    // missing payload columns, typed from `widenTo` — the q128
    // read-old-under-new law applied to the merge's own slice read
    def fill(df: DataFrame): DataFrame = widenTo match {
      case Some(sch) =>
        val have = df.columns
          .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
        val extra = sch.fields.filter(f =>
          payload.exists(_.equalsIgnoreCase(f.name)) &&
            !have(f.name.toLowerCase(java.util.Locale.ROOT)))
        if (extra.isEmpty) df
        else df.select((df.columns.toSeq.map(col) ++ extra.toSeq.map(f =>
          lit(null).cast(f.dataType).as(f.name))): _*)
      case None => df
    }
    val t = fill(target).select(
      (keys.map(col) ++ payload.map(c => col(c).as(s"t_$c"))) :+
        lit(true).as("t_present"): _*)
    val s0 = fill(source).select(
      (keys.map(col) ++ payload.map(c => col(c).as(s"s_$c"))) :+
        lit(true).as("s_present"): _*)
    val s =
      if (checkCardinality)
        s0.withColumn("__s_dup",
          count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
      else s0.withColumn("__s_dup", lit(1L))
    val tp = coalesce(col("t_present"), lit(false))
    val sp = coalesce(col("s_present"), lit(false))
    val matchedRow = tp && sp
    val targetOnly = tp && !sp
    val sourceOnly = !tp && sp
    // null-safe clause gates: a condition evaluating to NULL must read
    // as "clause does not fire" (SQL MERGE treats unknown as false)
    val fires: MergeClause => Column =
      cl => coalesce(cl.when.getOrElse(lit(true)), lit(false))
    // first-match-wins DELETE flag of a clause family: the chained when
    // returns the FIRST firing clause's delete bit, false when none fires
    def familyDeletes(clauses: Seq[MergeClause]): Column =
      clauses.foldRight(lit(false)) { (cl, rest) =>
        when(fires(cl), lit(cl.delete)).otherwise(rest)
      }
    // first-match-wins value of payload column `c`: the first firing
    // clause's assignment (or `default` when it doesn't set `c`, or when
    // no clause fires). A firing DELETE clause also resolves to `default`
    // — the row is filtered out by the delete flag, the value is dead.
    def familyValue(clauses: Seq[MergeClause], c: String,
        default: Column): Column =
      clauses.foldRight(default) { (cl, rest) =>
        when(fires(cl),
          if (cl.delete) default else cl.set.getOrElse(c, default))
          .otherwise(rest)
      }
    val anyInsertFires = notMatched
      .map(fires).foldLeft(lit(false))(_ || _)
    val deleted =
      (matchedRow && familyDeletes(matched)) ||
        (targetOnly && familyDeletes(notMatchedBySource))
    val skippedInsert = sourceOnly && !anyInsertFires
    val cardinalityOk =
      if (!checkCardinality) lit(true)
      else when(matchedRow && col("__s_dup") > 1,
        raise_error(concat(
          lit("MERGE INTO cardinality violation: target key "),
          concat_ws(",", keys.map(k => col(k).cast("string")): _*),
          lit(" matches multiple source rows"))).isNotNull)
        .otherwise(lit(true))
    t.join(s, keys, "full_outer")
      .filter(cardinalityOk && !deleted && !skippedInsert)
      .select(keys.map(col) ++ payload.map { c =>
        when(matchedRow, familyValue(matched, c, col(s"t_$c")))
          .when(tp, familyValue(notMatchedBySource, c, col(s"t_$c")))
          .otherwise(familyValue(notMatched, c, col(s"s_$c"))).as(c)
      }: _*)
  }
}

object MergeInto {
  /** The r14 three-clause surface as a convenience constructor: one
    * optional conditional MATCHED DELETE (checked first), one
    * unconditional MATCHED UPDATE, one gated INSERT, and the optional
    * BY SOURCE delete/update pair — existing merges read the same. */
  def simple(
      key: String,
      payload: Seq[String],
      matchedDeleteWhen: Option[Column] = None,
      updateSet: Map[String, Column] = Map.empty,
      insertWhen: Column = lit(true),
      notMatchedBySourceDeleteWhen: Option[Column] = None,
      notMatchedBySourceSet: Map[String, Column] = Map.empty): MergeInto =
    MergeInto(
      keys = Seq(key),
      payload = payload,
      matched =
        matchedDeleteWhen.map(c => MergeClause.delete(Some(c))).toSeq :+
          MergeClause.update(updateSet),
      notMatched = Seq(MergeClause.insert(Some(insertWhen))),
      notMatchedBySource =
        notMatchedBySourceDeleteWhen.map(c =>
          MergeClause.delete(Some(c))).toSeq ++
          (if (notMatchedBySourceSet.nonEmpty)
            Seq(MergeClause.update(notMatchedBySourceSet))
          else Nil))
}
