package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AnnQueries, BpeQueries, CurationQueries, LakehouseQueries, RelationalQueries, SftQueries, SketchQueries, TemporalQueries, TextPipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each implemented operator from SURVEY.md §2 appears once in
  * `queries`, with a DuckDB-equivalent SQL in `oracleSql` (same output
  * column names — the driver's compare sorts columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextPipelineQueries.queries ++
      TemporalQueries.queries ++ graft.multimodal.MultimodalQueries.queries ++
      CurationQueries.queries ++ BpeQueries.queries ++
      SketchQueries.queries ++ AnnQueries.queries ++
      SftQueries.queries ++ LakehouseQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ TextPipelineQueries.oracle ++
      TemporalQueries.oracle ++ graft.multimodal.MultimodalQueries.oracle ++
      CurationQueries.oracle ++ BpeQueries.oracle ++
      SketchQueries.oracle ++ AnnQueries.oracle ++
      SftQueries.oracle ++ LakehouseQueries.oracle
}
