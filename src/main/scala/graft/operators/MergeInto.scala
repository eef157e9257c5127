package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative multi-clause MERGE — the lakehouse `MERGE INTO target
  * USING source ON key` statement (Delta/Iceberg/SQL:2003), expressed as
  * a pure DataFrame combine step so it composes with the bucketed
  * persistent store ([[graft.streaming.IngestIndex.mergeCommit]] takes
  * exactly a `(current, delta) => merged` function).
  *
  * Clause semantics (the standard contract, first match wins per key):
  *   1. WHEN MATCHED AND [[matchedDeleteWhen]] THEN DELETE
  *   2. WHEN MATCHED THEN UPDATE SET [[updateSet]]
  *   3. WHEN NOT MATCHED [by target] AND [[insertWhen]] THEN INSERT
  *   4. WHEN NOT MATCHED BY SOURCE AND [[notMatchedBySourceDeleteWhen]]
  *      THEN DELETE (SQL:2023 / Delta's third clause family — the
  *      full-sync topology: prune target rows the source no longer
  *      carries)
  *   5. WHEN NOT MATCHED BY SOURCE THEN UPDATE SET
  *      [[notMatchedBySourceSet]] (when non-empty — e.g. tombstone
  *      flagging rows absent from the sync snapshot)
  * plus the implicit "target rows with no source match are kept" when
  * neither BY SOURCE clause is configured (the default, so existing
  * 3-clause merges are bit-identical).
  *
  * Conditions and assignments reference the target row's columns as
  * `t_<col>` and the source row's as `s_<col>` (both sides must carry
  * `key` plus every `payload` column; INSERT takes the source row's
  * payload verbatim; BY SOURCE conditions/assignments may only
  * reference `t_<col>` — no source row exists for those keys).
  *
  * Scale shape: ONE full-outer equi-join on the merge key plus a
  * codegen'd projection — no windows, no second shuffle. Run through the
  * bucketed store, the join's left side is only the TOUCHED buckets'
  * current rows, so a MERGE batch costs O(batch + touched buckets), not
  * O(table): the exact geometry a 100 TB CDC MERGE needs (and the same
  * one q86's streaming upsert already rides).
  */
final case class MergeInto(
    key: String,
    payload: Seq[String],
    matchedDeleteWhen: Option[Column] = None,
    updateSet: Map[String, Column] = Map.empty,
    insertWhen: Column = lit(true),
    notMatchedBySourceDeleteWhen: Option[Column] = None,
    notMatchedBySourceSet: Map[String, Column] = Map.empty) {

  /** The MERGE as a combine: `target` = current rows (of the touched
    * slice, when run through the store), `source` = the batch. Returns
    * the slice's post-merge rows (`key` + `payload` columns). */
  def apply(target: DataFrame, source: DataFrame): DataFrame = {
    val t = target.select(
      (col(key) +: payload.map(c => col(c).as(s"t_$c"))) :+
        lit(true).as("t_present"): _*)
    val s = source.select(
      (col(key) +: payload.map(c => col(c).as(s"s_$c"))) :+
        lit(true).as("s_present"): _*)
    val tp = coalesce(col("t_present"), lit(false))
    val sp = coalesce(col("s_present"), lit(false))
    val matched = tp && sp
    // null-safe clause gates: a condition evaluating to NULL must read
    // as "clause does not fire" (SQL MERGE treats unknown as false)
    val fires: Column => Column = c => coalesce(c, lit(false))
    val targetOnly = tp && !sp
    val deleted =
      (matched && fires(matchedDeleteWhen.getOrElse(lit(false)))) ||
        (targetOnly &&
          fires(notMatchedBySourceDeleteWhen.getOrElse(lit(false))))
    val skippedInsert = !tp && sp && !fires(insertWhen)
    t.join(s, Seq(key), "full_outer")
      .filter(!deleted && !skippedInsert)
      .select(col(key) +: payload.map { c =>
        when(matched, updateSet.getOrElse(c, col(s"t_$c")))
          .when(tp, notMatchedBySourceSet.getOrElse(c, col(s"t_$c")))
          .otherwise(col(s"s_$c")).as(c)
      }: _*)
  }
}
