package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry; those
  * expressible in ANSI SQL have an `oracleSql` twin the driver runs in
  * DuckDB over the same parquet tables (hash-compared, columns sorted by
  * name — aliases match on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Word count over `documents` — the canonical job of the reference
    * MapReduce framework, as a single Catalyst plan.
    */
  def entry(spark: SparkSession): DataFrame =
    TextQueries.wordcount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TextQueries.queries ++ Relational.queries ++ EventQueries.queries ++
      MrQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ TextAnalysis.queries ++
      MultimodalQueries.queries ++ AdvancedQueries.queries ++
      CurationOps.queries ++ PipelineOps.queries ++ SearchQueries.queries ++
      GraphQueries.queries ++ TrainingOps.queries ++ SqlSurface.queries ++
      WarehouseOps.queries ++ StatsOps.queries ++ BpeOps.queries ++
      SurfaceCompletions.queries ++ MatrixOps.queries ++
      BehaviorOps.queries ++ MiningOps.queries ++ StringSimOps.queries ++
      InferenceOps.queries ++ RecommenderOps.queries ++
      TemporalOps.queries ++ BusinessOps.queries ++ ClassifyOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops
    * (driver records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    TextQueries.oracle ++ Relational.oracle ++ EventQueries.oracle ++
      MrQueries.oracle ++ DedupQueries.oracle ++
      SimilarityQueries.oracle ++ TextAnalysis.oracle ++
      MultimodalQueries.oracle ++ AdvancedQueries.oracle ++
      CurationOps.oracle ++ PipelineOps.oracle ++ SearchQueries.oracle ++
      GraphQueries.oracle ++ TrainingOps.oracle ++ SqlSurface.oracle ++
      WarehouseOps.oracle ++ StatsOps.oracle ++ BpeOps.oracle ++
      SurfaceCompletions.oracle ++ MatrixOps.oracle ++
      BehaviorOps.oracle ++ MiningOps.oracle ++ StringSimOps.oracle ++
      InferenceOps.oracle ++ RecommenderOps.oracle ++
      TemporalOps.oracle ++ BusinessOps.oracle ++ ClassifyOps.oracle
}
