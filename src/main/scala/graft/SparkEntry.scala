package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared surface (SURVEY.md §2B + LLM-pipeline
  * extensions); `oracleSql` pairs each SQL-expressible query with DuckDB SQL
  * the driver hash-compares against on the same parquet tables.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    graft.queries.Relational.defs ++ graft.queries.LlmOps.defs ++
      graft.queries.Stats.defs ++ graft.queries.TextSearch.defs ++
      graft.queries.Retrieval.defs ++ graft.queries.Curation.defs ++
      graft.queries.Profiling.defs ++ graft.queries.VectorStats.defs ++
      graft.queries.ZarrPipeline.defs ++ graft.queries.StreamingDemo.defs ++
      graft.queries.SimJoin.defs ++ graft.queries.Layout.defs ++
      graft.queries.Pq.defs ++ graft.queries.VectorIngest.defs ++
      graft.queries.MergeOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_revenue_by_region")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
