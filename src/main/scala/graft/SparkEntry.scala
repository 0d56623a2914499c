package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry aggregated from the operator modules under
  * `graft.ops`: the reference-derived fixed-width→Avro pipeline
  * ([[ops.Pipeline]]) plus the engine's analytical surface.
  */
object SparkEntry {

  /** Flagship: the §7.2 end-to-end slice — lineitem rendered to
    * fixed-width text, parsed back typed, through Avro framing and back.
    * Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    ops.Pipeline.fixedwidthRoundtrip(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * LLM-data-pipeline operator families. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Pipeline.queries ++ ops.TextAnalysis.queries ++
      ops.Dedup.queries ++ ops.Similarity.queries ++
      ops.Relational.queries ++ ops.Sessions.queries ++ ops.AsOf.queries ++
      ops.AllTypes.queries ++ ops.Multimodal.queries ++ ops.SetOps.queries ++
      ops.Layout.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Pipeline.oracleSql ++ ops.TextAnalysis.oracleSql ++
      ops.Dedup.oracleSql ++ ops.Similarity.oracleSql ++
      ops.Relational.oracleSql ++ ops.Sessions.oracleSql ++ ops.AsOf.oracleSql ++
      ops.AllTypes.oracleSql ++ ops.Multimodal.oracleSql ++ ops.SetOps.oracleSql ++
      ops.Layout.oracleSql
}
