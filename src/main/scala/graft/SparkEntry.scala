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
      TemporalOps.queries ++ BusinessOps.queries ++ ClassifyOps.queries ++
      DriftOps.queries ++ TrendOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops
    * (driver records a weaker rows-only check).
    */
  /** Pinning ScalaTest suite for every ROWS-ONLY entry (no oracleSql
    * twin): the driver artifact records `err: no_oracle` for these, so
    * this map + the per-entry row counts Verify dumps to
    * `rows_only.json` are what proves they ran and where their
    * semantics are checked. Keep in sync when adding rows-only entries
    * (Verify warns on any uncovered one).
    */
  def rowsOnlyProvenance: Map[String, String] = Map(
    "dedup_keep_min" -> "DedupSpec",
    "dedup_semantic" -> "AnnSpec",
    "dedup_simhash" -> "DedupSpec",
    "dedup_simhash_w" -> "DedupSpec",
    "dfs_roundtrip" -> "DfsSourceSpec",
    "layout_changelog" -> "VersionedTableSpec",
    "layout_result_cache" -> "ResultCacheSpec",
    "layout_mv_rewrite" -> "MvRewriteSpec",
    "stream_clamped_balance" -> "ClampedBalanceSpec",
    "stream_conformal" -> "StreamingDriftSpec",
    "stream_emb_drift" -> "StreamingDriftSpec",
    "stream_ab_monitor" -> "StreamingDriftSpec",
    "stream_cdc_inc" -> "StreamingDedupSpec",
    "stream_lm_ppl" -> "StreamingDriftSpec",
    "stream_holt" -> "HoltStreamSpec",
    "stream_holt_winters" -> "HoltWintersStreamSpec",
    "stream_index_inc" -> "IndexStreamSpec",
    "text_bpe_fertility" -> "BpeSpec",
    "q238_forget_flow" -> "VersionedTableSpec",
    "layout_compact" -> "LayoutPruningSpec",
    "layout_merge_versioned" -> "VersionedTableSpec",
    "layout_timetravel" -> "VersionedTableSpec",
    "ml_logreg" -> "ClassifySpec",
    "ml_kmeans_inc" -> "AnnSpec",
    "ml_silhouette" -> "AnnSpec",
    "mm_audio_neardup" -> "MultimodalSpec",
    "mm_audio_segments" -> "MultimodalSpec",
    "mm_decode_stats" -> "MultimodalSpec",
    "mm_frame_sample" -> "MultimodalSpec",
    "mm_image_neardup" -> "MultimodalSpec",
    "mm_scene_cuts" -> "MultimodalSpec",
    "mm_video_neardup" -> "MultimodalSpec",
    "q107_rolling_distinct" -> "StatsOpsSpec",
    "q112_approx_percentiles" -> "StatsOpsSpec",
    "q224_isotonic" -> "TrendSpec",
    "q231_pagerank_inc" -> "GraphSpec",
    "q232_pack_bins" -> "PipelineOpsSpec",
    "q233_approx_distinct" -> "ApproxRewriteSpec",
    "q234_retrieval_eval" -> "AnnSpec",
    "q78_compress_ratio" -> "TextKernelsSpec",
    "sim_ann_ivf" -> "AnnSpec",
    "sim_ann_ivfpq" -> "AnnSpec",
    "sim_ann_serve" -> "AnnSpec",
    "sim_ann_lsh" -> "AnnSpec",
    "sim_ann_stream_ingest" -> "AnnIngestSpec",
    "sim_ann_forget" -> "AnnSpec",
    "q245_mmr_rerank" -> "AnnSpec",
    "sim_pca" -> "MatrixSpec",
    "stats_approx_eqdepth" -> "StatsOpsSpec",
    "stats_approx_winsorize" -> "StatsOpsSpec",
    "stats_countmin" -> "SketchSpec",
    "stats_hll_overlap" -> "SketchSpec",
    "stream_dedup_inc" -> "StreamingDedupSpec",
    "stream_heavy_hitters" -> "EventStreamSpec",
    "stream_psi_drift" -> "StreamingDriftSpec",
    "stream_emd_drift" -> "StreamingDriftSpec",
    "stream_scd2_enrich" -> "EventStreamSpec",
    "text_bpe_encode" -> "BpeSpec",
    "text_bpe_train" -> "BpeSpec",
    "text_fingerprint_xx" -> "TextAnalysisSpec")

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
      TemporalOps.oracle ++ BusinessOps.oracle ++ ClassifyOps.oracle ++
      DriftOps.oracle ++ TrendOps.oracle
}
