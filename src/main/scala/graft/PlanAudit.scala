package graft

/** Scale-shape audit: execute recent queries and flag plan red flags
  * (CartesianProduct / BroadcastNestedLoopJoin), count shuffle
  * exchanges, and note scan pushdown — the quick "would this survive
  * 100×" re-check after adding operators. Usage: runMain graft.PlanAudit
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    Seq("q40_token_budget", "q41_listagg", "q42_pivot", "q43_grouping_sets",
      "q45_stream_join", "q46_freq_items", "q47_percentiles", "q48_array_fns",
      "q49_best_doc", "q50_deterministic_sample", "q51_centroids",
      "q52_math_fns", "q53_full_outer",
      "q55_stream_dedup", "q56_quantile_budget", "dedup_simhash_w",
      "sim_ann_lsh", "q23_ngram_jaccard",
      "q71_grep", "q72_inverted_index", "q73_bm25", "q74_pagerank",
      "q75_snapshot_diff", "q76_word_entropy", "q77_triangles",
      "q78_compress_ratio", "q79_zorder",
      "q85_kmeans", "q86_bfs", "q87_skew_profile", "q88_epoch_shuffle",
      "q89_temperature_mix", "q90_phrase_search", "q91_fuzzy_join",
      "q92_incremental_dedup", "q93_stream_topk",
      "q95_star_join", "q96_exists_subquery", "q97_scalar_subquery",
      "q98_unpivot", "q99_gap_fill",
      "q100_quality_audit", "q101_state_merge", "layout_compact",
      "q102_outliers", "q103_range_window", "q104_stream_left_join",
      "q105_upsert", "q106_eqdepth_hist", "dedup_cluster_best",
      "q107_rolling_distinct", "q108_containment", "q109_tfidf_topterms",
      "q110_share_of_total", "q111_mad_outliers",
      "q112_approx_percentiles", "stats_approx_eqdepth",
      "q113_rolling_distinct_exact", "q114_span_removal",
      "mm_image_neardup", "text_bpe_train", "text_bpe_encode",
      "q115_setops_all", "q116_not_exists", "q117_percentile_disc",
      "q118_regexp_extract", "q119_filtered_aggs", "q120_value_window_fns",
      "q121_grouping_id", "q122_stream_full_join",
      "q123_cdc_apply", "q124_checksum_compare", "q125_moving_median",
      "sim_ann_ivfpq", "q126_corr_matrix", "sim_pca",
      "q127_linreg", "q128_distribution_fns", "q129_shingle_cosine",
      "q130_bloom_join", "mm_scene_cuts", "mm_audio_segments",
      "q136_welch_ttest", "q137_chi_square", "q139_fuzzy_pairs",
      "q140_string_metrics", "q141_shortest_path", "q142_autocorr",
      "q143_recursive_reach", "q144_streaks", "q145_split_leakage",
      "q146_majority_label", "q147_lateral_topk", "q148_seasonal_anomaly",
      "q149_knn_classify", "q150_time_weighted_avg", "q151_overlap_exact",
      "stats_hll_overlap", "q152_event_paths", "q25_ann_topk",
      "q153_personalized_pr", "q154_also_bought",
      "q155_survival", "q156_interpolate", "q157_attribution",
      "q158_profile", "q159_cusum", "q160_sorted_neighborhood",
      "q161_hits", "mm_audio_neardup",
      "q162_debounce", "q164_conversion_lag", "q165_rfm",
      "q167_period_over_period", "q171_weighted_median",
      "q172_concentration", "q175_overlap_score", "q176_asof_native",
      "q177_benford", "q178_fk_orphans",
      "q179_seasonal_decompose", "q180_weighted_reservoir",
      "q181_feature_matrix", "q182_negative_sample",
      "q183_variant_extract", "q184_readability", "q185_zipf_fit",
      "mm_video_neardup", "layout_timetravel",
      "q186_mann_whitney", "q187_spearman",
      "q188_ks_test", "q189_naive_bayes", "q190_pmi_collocations",
      "q191_clustering_coeff", "q192_kcore", "q193_mv_join_maintain",
      "q194_pattern_match", "q195_entropy_mix", "q197_near_search",
      "ml_logreg", "q198_source_similarity", "q199_stream_semi_join",
      "q200_linkage_weights", "q201_ctfidf", "q202_winsorize",
      "q203_impute", "q204_quantize", "stats_wmedian_2pass",
      "rfm_globalrank", "text_fingerprint_xx", "dfs_roundtrip",
      "q205_anova", "q206_combo_profile", "q207_freq_triples",
      "q208_nfc_audit", "q209_dsir_weights", "stats_approx_winsorize",
      "ml_silhouette",
      // session-5 additions
      "q211_salted_hot_join", "q212_chunk_sliding", "q213_rep_ratio",
      "q214_ann_filtered", "q216_hard_negatives", "q215_boilerplate_chunks",
      "layout_merge_versioned", "sim_ann_ivf", "sim_ann_ivfpq",
      "stream_dedup_inc", "rfm_globalrank", "q154_also_bought",
      "text_bpe_encode",
      // round-5 additions
      "q220_psi_drift", "q221_target_encode", "q222_mann_kendall",
      "q223_quantile_norm", "q224_isotonic", "q225_bootstrap_ci",
      "q226_calibration", "q227_group_by_all", "stream_psi_drift",
      "q228_dynamic_sessions", "q229_source_overlap",
      "q230_homoglyph_dedup", "q231_pagerank_inc", "stream_scd2_enrich",
      "q232_pack_bins", "q233_approx_distinct", "q234_retrieval_eval",
      "q235_dedup_impact", "q236_profile_drift", "q237_nb_crossval",
      "ml_kmeans_inc", "stream_heavy_hitters", "q238_forget_flow",
      // round-6 additions
      "q239_heldout_ppl", "q240_k_anonymity", "q241_bloom_ref_dedup",
      "q242_feature_auc", "q243_clamped_balance", "q244_modularity",
      "q245_mmr_rerank", "layout_result_cache", "layout_mv_rewrite",
      "sim_ann_forget",
      // round-6 batch 2
      "q246_rrf_fusion", "q247_holt", "stream_holt", "stream_index_inc",
      "stats_eqdepth_rank", "stats_winsorize_rank", "stats_spearman_rank",
      "text_bpe_fertility", "stats_pctl_rank", "stats_mwu_rank",
      // round-7/8 additions
      "q248_holt_winters", "stream_holt_winters", "q249_t_closeness",
      "q250_emd_drift", "stream_emd_drift", "conc_globalrank", "q252_hill_tail",
      "sim_ann_serve", "dedup_jaccard_prefix",
      // round-9 additions
      "stats_ks_rank", "drift_qnorm_rank", "q54_full_curation",
      "q254_conformal", "q255_conformal_drift", "q256_emb_drift",
      "q257_dedup_sweep",
      // round-9 extension additions
      "q258_kneser_ney", "q259_dup_span_runs", "q260_loo_ablation",
      "q261_cdc_chunks", "q262_water_fill", "q263_vocab_coverage",
      "q264_classifier_agreement", "q265_changepoint",
      "q266_unseen_mass", "q267_mase_backtest", "q268_ab_power",
      "q269_dp_release", "q270_emb_hygiene", "q271_ctx_sweep",
      "q272_transition_entropy", "q273_ri_audit", "q274_key_audit",
      "q275_source_jsd", "q276_hamilton_quota",
      "q277_dup_cluster_profile")
      .foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      val bad = Seq("CartesianProduct", "BroadcastNestedLoop").filter(p.contains)
      val nEx = "Exchange hashpartitioning".r.findAllIn(p).size
      val pushed = if (p.contains("PushedFilters: [")
        && !p.contains("PushedFilters: []")) "pushed" else "-"
      val verdict = bad match {
        case Nil => ""
        case b => expectedBnlj.get(n) match {
          case Some(why) if b == Seq("BroadcastNestedLoop") =>
            s"bnlj=expected($why)"
          case _ => s"bad=${b.mkString(",")}"
        }
      }
      println(f"AUDIT $n%-24s exchanges=$nEx $verdict $pushed")
    }
    spark.stop()
  }

  /** Queries whose BroadcastNestedLoopJoin is the CORRECT physical plan,
    * not a red flag — each pairs a corpus-scale side with a side bounded
    * by construction, and the "nested loop" IS the operator's defined
    * work. Anything not listed here still fails the audit on a BNLJ.
    */
  private val expectedBnlj: Map[String, String] = Map(
    // brute-force scoring is DEFINED as every (query, corpus) pair: the
    // broadcast side is the caller-bounded query set (20 rows); the
    // plan is one corpus scan per batch of queries — the exact work any
    // engine must do for an exact top-k baseline
    "q25_ann_topk" -> "query-set broadcast, corpus scanned once by definition",
    // q245/q246 ride q25's candidate generation: the ≠-id join of the
    // bounded broadcast query set against the corpus IS the exact
    // brute-force pass (q25's rationale, one hop downstream)
    "q245_mmr_rerank" -> "q25's query-set broadcast candidate pass",
    "q246_rrf_fusion" -> "q25's query-set broadcast semantic arm",
    "q149_knn_classify" -> "query-set broadcast, corpus scanned once by definition",
    // both join predicates are inequalities (≠ id, ≠ label), so the
    // broadcast of the bounded query set cannot hash — the scan-once
    // nested loop IS the exact mining pass (q25's rationale)
    "q216_hard_negatives" -> "query-set broadcast, corpus scanned once by definition",
    // the eval's ground-truth side IS q25's brute-force pass (by
    // design: exact baseline); the IVF side and the metric join add
    // only bounded-key equi-joins
    "q234_retrieval_eval" -> "ground truth is q25's brute-force scan by definition",
    // the `<` pair join runs over the |event-types|-row SKETCH table —
    // bounded metadata (5x5 here); the corpus contributed one sketch
    // aggregation upstream
    "stats_hll_overlap" -> "type-pair join over the |types|-row sketch table",
    // 1-ROW scalar broadcasts (global horizon / calendar span / norm
    // constants): a cross join against a single-row aggregate IS the
    // plan — the nested loop degenerates to attaching one constant row
    "q155_survival" -> "1-row dataset-horizon broadcast",
    "q156_interpolate" -> "1-row calendar-span broadcast",
    "q161_hits" -> "1-row score-normalizer broadcasts",
    "q165_rfm" -> "1-row recency-horizon broadcast",
    "q249_t_closeness" -> "1-row global-total broadcast (bigN normalizer)",
    // the |classes|-row (≤5) model-constants grid attached to each test
    // doc — bounded metadata, the q161 normalizer pattern one row wider
    "q189_naive_bayes" -> "|classes|-row model-constant grid broadcast",
    // q189's grid widened to (|classes| x (|sources|+1)) model
    // constants, plus the 1-row full-model-accuracy broadcast at the end
    "q260_loo_ablation" ->
      "|classes x sources|-row LOO-model grid + 1-row full-acc broadcast",
    // q189's grid (inherited through nbScores) + the final 1-row
    // marginal-product broadcast attached to the 1-row base aggregate
    "q264_classifier_agreement" ->
      "q189 class grid + 1-row chance-agreement broadcast",
    "q181_feature_matrix" -> "1-row dataset-horizon broadcast",
    // the candidate universe IS the operator's defined work: every
    // customer × the PopPool(=50)-row popular-item pool, then anti-join
    "q182_negative_sample" -> "bounded candidate-pool (50-row) broadcast",
    "rfm_globalrank" -> "1-row recency-horizon broadcast",
    // q226/q237 ride q189's scoring: the same |classes|-row grid
    // broadcast (q237 five times, once per CV fold)
    "q226_calibration" -> "|classes|-row model-constant grid broadcast",
    "q237_nb_crossval" -> "|classes|-row grid broadcast per CV fold")
}
