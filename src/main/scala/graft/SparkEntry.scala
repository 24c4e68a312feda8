package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._
import graft.pipeline._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * `queries` is the operator inventory of SURVEY.md §2.B, one entry per
  * operator; `oracleSql` holds the DuckDB-equivalent ANSI SQL for every
  * query whose semantics are SQL-expressible (hash-dependent LSH ops and
  * approximate sketches are rows-only checked).
  */
object SparkEntry {

  /** Flagship: a DPP-orchestrated multi-step pipeline (scan → fan-in
    * join → filter → agg → sort), proving the pipeline layer drives real
    * relational work. Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = flagship(spark, "/root/testdata/sf0.001")

  def flagship(s: SparkSession, d: String): DataFrame = {
    val p = DPP(
      "lineitem" -> Tables.lineitem(s, d),
      "orders" -> Tables.orders(s, d))
    p.sequence(
      V(p.lineitem, p.orders) >> fanIn1("joinOrders") { case Seq(l, o) =>
        l.join(o, col("l_orderkey") === col("o_orderkey"))
      } >> p.joined,
      Prev >> fn("keepOpen")(_.filter(col("o_orderstatus") =!= "F")) >> p.kept,
      Prev >> fn("revenueByPriority")(
        _.groupBy("o_orderpriority")
          .agg(
            Relational.dsum(expr("l_extendedprice * (1 - l_discount)")).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority")) >> p.result,
    )
    p("result")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // projection / filter
    "q_project_cast" -> (Relational.q_project_cast _),
    "q_filter_pred" -> (Relational.q_filter_pred _),
    "q_filter_like" -> (Relational.q_filter_like _),
    // joins
    "q_join_inner" -> (Relational.q_join_inner _),
    "q_join_left" -> (Relational.q_join_left _),
    "q_join_right" -> (Relational.q_join_right _),
    "q_join_full" -> (Relational.q_join_full _),
    "q_join_dims" -> (Relational.q_join_dims _),
    "q_cross" -> (Relational.q_cross _),
    "q_tpch_q1ish" -> (Relational.q_tpch_q1ish _),
    "q_tpch_q3ish" -> (Relational.q_tpch_q3ish _),
    "q_tpch_q5ish" -> (Relational.q_tpch_q5ish _),
    "q_tpch_q10ish" -> (Relational.q_tpch_q10ish _),
    "q_tpch_q18ish" -> (Relational.q_tpch_q18ish _),
    "q_join_semi" -> (Relational.q_join_semi _),
    "q_join_anti" -> (Relational.q_join_anti _),
    "q_join_range" -> (Relational.q_join_range _),
    "q_join_range_binned" -> (Relational.q_join_range_binned _),
    "q_join_overlap" -> (Relational.q_join_overlap _),
    "q_scd2" -> (Relational.q_scd2 _),
    "q_graph_triangles" -> (Llm.q_graph_triangles _),
    "q_graph_triangles_deg" -> (Llm.q_graph_triangles_deg _),
    "q_graph_hits" -> (Llm.q_graph_hits _),
    "q_drift_psi" -> (Llm.q_drift_psi _),
    "q_dq_report" -> (Relational.q_dq_report _),
    "q_split_train" -> (Llm.q_split_train _),
    "q_corpus_shuffle" -> (Llm.q_corpus_shuffle _),
    "q_sessionize_batch" -> (Relational.q_sessionize_batch _),
    "q_session_paths" -> (Relational.q_session_paths _),
    "q_event_transitions" -> (Relational.q_event_transitions _),
    "q_join_asof" -> (Relational.q_join_asof _),
    "q_join_asof_native" -> (Relational.q_join_asof_native _),
    "q_join_asof_forward" -> (Relational.q_join_asof_forward _),
    "q_join_asof_fwd_native" -> (Relational.q_join_asof_fwd_native _),
    "q_join_asof_tol" -> (Relational.q_join_asof_tol _),
    "q_join_salted" -> (Relational.q_join_salted _),
    "q_join_bloom" -> (Relational.q_join_bloom _),
    "q_join_nullsafe" -> (Relational.q_join_nullsafe _),
    "q_sql_surface" -> (Relational.q_sql_surface _),
    // aggregation
    "q_agg_group" -> (Relational.q_agg_group _),
    "q_agg_distinct" -> (Relational.q_agg_distinct _),
    "q_agg_approx" -> (Relational.q_agg_approx _),
    "q_agg_approx_pct" -> (Relational.q_agg_approx_pct _),
    "q_agg_rollup" -> (Relational.q_agg_rollup _),
    "q_agg_stats" -> (Relational.q_agg_stats _),
    "q_agg_stats2" -> (Relational.q_agg_stats2 _),
    "q_agg_collect" -> (Relational.q_agg_collect _),
    "q_agg_histogram" -> (Relational.q_agg_histogram _),
    "q_agg_percentile" -> (Relational.q_agg_percentile _),
    "q_agg_cube" -> (Relational.q_agg_cube _),
    "q_agg_grouping_id" -> (Relational.q_agg_grouping_id _),
    "q_agg_minmax_by" -> (Relational.q_agg_minmax_by _),
    "q_agg_mode" -> (Relational.q_agg_mode _),
    "q_outlier_mad" -> (Relational.q_outlier_mad _),
    "q_feature_bins" -> (Relational.q_feature_bins _),
    "q_corr_matrix" -> (Relational.q_corr_matrix _),
    "q_stat_ks" -> (Relational.q_stat_ks _),
    "q_stat_chi2" -> (Relational.q_stat_chi2 _),
    "q_window_ewma" -> (Relational.q_window_ewma _),
    "q_skyline" -> (Relational.q_skyline _),
    "q_mutual_info" -> (Relational.q_mutual_info _),
    "q_winsorize" -> (Relational.q_winsorize _),
    "q_winsorize_approx" -> (Relational.q_winsorize_approx _),
    "q_sample_group" -> (Relational.q_sample_group _),
    "q_sample_neyman" -> (Relational.q_sample_neyman _),
    "q_sample_weights" -> (Relational.q_sample_weights _),
    "q_split_temporal" -> (Llm.q_split_temporal _),
    "q_corpus_card" -> (Llm.q_corpus_card _),
    "q_incr_rollup" -> (Relational.q_incr_rollup _),
    "q_join_setsim" -> (Llm.q_join_setsim _),
    "q_snapshot_diff" -> (Relational.q_snapshot_diff _),
    "q_share_of_total" -> (Relational.q_share_of_total _),
    "q_word_pmi" -> (Llm.q_word_pmi _),
    "q_window_median" -> (Relational.q_window_median _),
    "q_window_median_wide" -> (Relational.q_window_median_wide _),
    "q_ccnet_buckets" -> (Llm.q_ccnet_buckets _),
    "q_window_distinct" -> (Relational.q_window_distinct _),
    "q_abc_class" -> (Relational.q_abc_class _),
    "q_temperature_sample" -> (Llm.q_temperature_sample _),
    "q_sample_weighted" -> (Llm.q_sample_weighted _),
    "q_twap" -> (Relational.q_twap _),
    "q_interval_union" -> (Relational.q_interval_union _),
    "q_benford" -> (Relational.q_benford _),
    "q_event_streaks" -> (Relational.q_event_streaks _),
    "q_two_hop" -> (Llm.q_two_hop _),
    "q_two_hop_capped" -> (Llm.q_two_hop_capped _),
    "q_graph_kcore" -> (Llm.q_graph_kcore _),
    "q_zipf_fit" -> (Llm.q_zipf_fit _),
    "q_mmr_select" -> (Llm.q_mmr_select _),
    "q_percent_change" -> (Relational.q_percent_change _),
    "q_funnel_latency" -> (Relational.q_funnel_latency _),
    "q_null_profile" -> (Relational.q_null_profile _),
    "q_null_profile_approx" -> (Relational.q_null_profile_approx _),
    "q_k_anon" -> (Relational.q_k_anon _),
    "q_l_diversity" -> (Relational.q_l_diversity _),
    "q_dup_census" -> (Relational.q_dup_census _),
    "q_drift_psi_numeric" -> (Relational.q_drift_psi_numeric _),
    "q_gini" -> (Relational.q_gini _),
    "q_entropy" -> (Relational.q_entropy _),
    "q_churn" -> (Relational.q_churn _),
    "q_basket_lift" -> (Relational.q_basket_lift _),
    "q_union_byname" -> (Relational.q_union_byname _),
    "q_try_funcs" -> (Relational.q_try_funcs _),
    "q_bit_funcs" -> (Relational.q_bit_funcs _),
    "q_array_funcs2" -> (Relational.q_array_funcs2 _),
    "q_hash_funcs" -> (Relational.q_hash_funcs _),
    "q_explode_pos" -> (Relational.q_explode_pos _),
    "q_agg_groupingsets" -> (Relational.q_agg_groupingsets _),
    // windows
    "q_window_rank" -> (Relational.q_window_rank _),
    "q_window_lag" -> (Relational.q_window_lag _),
    "q_window_running" -> (Relational.q_window_running _),
    "q_window_ntile" -> (Relational.q_window_ntile _),
    "q_window_range_frame" -> (Relational.q_window_range_frame _),
    "q_window_firstlast" -> (Relational.q_window_firstlast _),
    "q_window_moving" -> (Relational.q_window_moving _),
    "q_struct_funcs" -> (Relational.q_struct_funcs _),
    // sort / limit / top-k
    "q_sort_limit" -> (Relational.q_sort_limit _),
    "q_topk_group" -> (Relational.q_topk_group _),
    "q_sample_hash" -> (Relational.q_sample_hash _),
    "q_sample_systematic" -> (Relational.q_sample_systematic _),
    "q_subquery_scalar" -> (Relational.q_subquery_scalar _),
    "q_subquery_corr" -> (Relational.q_subquery_corr _),
    // set ops
    "q_union" -> (Relational.q_union _),
    "q_union_all" -> (Relational.q_union_all _),
    "q_intersect" -> (Relational.q_intersect _),
    "q_except" -> (Relational.q_except _),
    // scalar function families
    "q_string_funcs" -> (Relational.q_string_funcs _),
    "q_string_funcs2" -> (Relational.q_string_funcs2 _),
    "q_map_funcs" -> (Relational.q_map_funcs _),
    "q_date_funcs" -> (Relational.q_date_funcs _),
    "q_date_funcs2" -> (Relational.q_date_funcs2 _),
    "q_math_funcs" -> (Relational.q_math_funcs _),
    "q_cond_funcs" -> (Relational.q_cond_funcs _),
    "q_array_funcs" -> (Relational.q_array_funcs _),
    "q_json_funcs" -> (Relational.q_json_funcs _),
    "q_pivot" -> (Relational.q_pivot _),
    "q_unpivot" -> (Relational.q_unpivot _),
    "q_explode" -> (Relational.q_explode _),
    "q_time_series" -> (Relational.q_time_series _),
    "q_na_fill" -> (Relational.q_na_fill _),
    "q_upsert" -> (Relational.q_upsert _),
    "q_funnel" -> (Relational.q_funnel _),
    "q_retention" -> (Relational.q_retention _),
    // sources (csv / json round-trips, from_json parsing)
    "q_source_csv" -> (Sources.q_source_csv _),
    "q_source_json" -> (Sources.q_source_json _),
    "q_source_orc" -> (Sources.q_source_orc _),
    "q_source_xml" -> (Sources.q_source_xml _),
    "q_source_avro" -> (Sources.q_source_avro _),
    "q_source_jdbc" -> (Sources.q_source_jdbc _),
    "q_source_evolution" -> (Sources.q_source_evolution _),
    "q_source_from_json" -> (Sources.q_source_from_json _),
    "q_last_n" -> (Relational.q_last_n _),
    "q_rfm" -> (Relational.q_rfm _),
    "q_cdc_apply" -> (Relational.q_cdc_apply _),
    "q_key_skew" -> (Relational.q_key_skew _),
    "q_interval_prorate" -> (Relational.q_interval_prorate _),
    "q_attribution_linear" -> (Relational.q_attribution_linear _),
    "q_cohort_ltv" -> (Relational.q_cohort_ltv _),
    "q_event_gaps" -> (Relational.q_event_gaps _),
    // r14: trend/changepoint/concurrency/windowed-funnel/rerank
    "q_trend_robust" -> (Relational.q_trend_robust _),
    "q_changepoint" -> (Relational.q_changepoint _),
    "q_peak_concurrency" -> (Relational.q_peak_concurrency _),
    "q_funnel_window" -> (Relational.q_funnel_window _),
    "q_sim_rerank" -> (Llm.q_sim_rerank _),
    "q_rank_movers" -> (Relational.q_rank_movers _),
    "q_seasonality_dow" -> (Relational.q_seasonality_dow _),
    "q_audience_overlap" -> (Relational.q_audience_overlap _),
    "q_dq_freshness" -> (Relational.q_dq_freshness _),
    "q_percentile_bands" -> (Relational.q_percentile_bands _),
    "q_anomaly_days" -> (Relational.q_anomaly_days _),
    "q_cooccur_skipgram" -> (Llm.q_cooccur_skipgram _),
    "q_pit_grid" -> (Relational.q_pit_grid _),
    "q_sample_balanced" -> (Relational.q_sample_balanced _),
    // r15: trimmed mean / U-shape attribution / LPA communities
    "q_trimmed_mean" -> (Relational.q_trimmed_mean _),
    "q_attribution_ushape" -> (Relational.q_attribution_ushape _),
    "q_graph_lpa" -> (Llm.q_graph_lpa _),
    // r15b: KM survival / time-decay attribution / CUPED / STL-lite
    "q_survival_km" -> (Relational.q_survival_km _),
    "q_attribution_decay" -> (Relational.q_attribution_decay _),
    "q_cuped" -> (Relational.q_cuped _),
    "q_seasonal_decompose" -> (Relational.q_seasonal_decompose _),
    "q_log_odds" -> (Llm.q_log_odds _),
    "q_quantile_norm" -> (Llm.q_quantile_norm _),
    "q_weighted_median" -> (Llm.q_weighted_median _),
    "q_drift_wasserstein" -> (Llm.q_drift_wasserstein _),
    // LLM: dedup
    "q_dedup_exact" -> (Llm.q_dedup_exact _),
    "q_dedup_minhash" -> (Llm.q_dedup_minhash _),
    "q_dedup_simhash" -> (Llm.q_dedup_simhash _),
    "q_dedup_ngram" -> (Llm.q_dedup_ngram _),
    "q_dedup_containment" -> (Llm.q_dedup_containment _),
    "q_dedup_url" -> (Llm.q_dedup_url _),
    "q_dedup_edit" -> (Llm.q_dedup_edit _),
    "q_dedup_embed" -> (Llm.q_dedup_embed _),
    "q_dedup_clusters" -> (Llm.q_dedup_clusters _),
    "q_dedup_bucket_stats" -> ((s, d) => Llm.minhashBucketStats(Tables.documents(s, d))),
    // LLM: similarity search
    "q_sim_topk" -> (Llm.q_sim_topk _),
    "q_knn_classify" -> (Llm.q_knn_classify _),
    "q_sim_truncated" -> (Llm.q_sim_truncated _),
    "q_sim_ivf" -> (Llm.q_sim_ivf _),
    // LLM: text analysis
    "q_text_stats" -> (Llm.q_text_stats _),
    "q_lang_filter" -> (Llm.q_lang_filter _),
    "q_lang_id" -> (Llm.q_lang_id _),
    "q_quality_score" -> (Llm.q_quality_score _),
    "q_readability" -> (Llm.q_readability _),
    "q_blocklist_phrases" -> (Llm.q_blocklist_phrases _),
    "q_c4_filters" -> (Llm.q_c4_filters _),
    "q_filter_waterfall" -> (Llm.q_filter_waterfall _),
    "q_token_count" -> (Llm.q_token_count _),
    "q_fingerprint" -> (Llm.q_fingerprint _),
    "q_winnow" -> (Llm.q_winnow _),
    "q_quality_signals" -> (Llm.q_quality_signals _),
    "q_quality_ngram_rep" -> (Llm.q_quality_ngram_rep _),
    "q_ngram_topk" -> (Llm.q_ngram_topk _),
    "q_text_redact" -> (Llm.q_text_redact _),
    "q_contamination" -> (Llm.q_contamination _),
    "q_contamination_fuzzy" -> (Llm.q_contamination_fuzzy _),
    "q_decontam_semantic" -> (Llm.q_decontam_semantic _),
    "q_dsir_weights" -> (Llm.q_dsir_weights _),
    "q_dsir_resample" -> (Llm.q_dsir_resample _),
    "q_eval_bootstrap" -> (Llm.q_eval_bootstrap _),
    "q_cluster_kmeans" -> (Llm.q_cluster_kmeans _),
    "q_dedup_semantic" -> (Llm.q_dedup_semantic _),
    "q_sim_quantized" -> (Llm.q_sim_quantized _),
    "q_dedup_lines" -> (Llm.q_dedup_lines _),
    "q_dedup_cdc" -> (Llm.q_dedup_cdc _),
    "q_dedup_keep_best" -> (Llm.q_dedup_keep_best _),
    "q_dedup_snm" -> (Llm.q_dedup_snm _),
    "q_bigram_lm" -> (Llm.q_bigram_lm _),
    "q_bigram_ppl" -> (Llm.q_bigram_ppl _),
    "q_mine_hardneg" -> (Llm.q_mine_hardneg _),
    "q_dedup_spans" -> (Llm.q_dedup_spans _),
    "q_text_normalize" -> (Llm.q_text_normalize _),
    "q_text_nfc" -> (Llm.q_text_nfc _),
    "q_script_detect" -> (Llm.q_script_detect _),
    "q_quality_compress" -> (Llm.q_quality_compress _),
    "q_dedup_incremental" -> (Llm.q_dedup_incremental _),
    "q_vocab_df" -> (Llm.q_vocab_df _),
    "q_pipeline_docs" -> (Llm.q_pipeline_docs _),
    "q_pipeline_release" -> (Llm.q_pipeline_release _),
    "q_tfidf" -> (Llm.q_tfidf _),
    "q_quality_perplexity" -> (Llm.q_quality_perplexity _),
    "q_bpe_train" -> (Llm.q_bpe_train _),
    "q_bpe_encode" -> (Llm.q_bpe_encode _),
    "q_tokenizer_fertility" -> (Llm.q_tokenizer_fertility _),
    "q_char_entropy" -> (Llm.q_char_entropy _),
    "q_bm25" -> (Llm.q_bm25 _),
    "q_inverted_index" -> (Llm.q_inverted_index _),
    // multimodal
    "q_mm_binary" -> (Multimodal.q_mm_binary _),
    "q_mm_features" -> (Multimodal.q_mm_features _),
    "q_mm_frames" -> (Multimodal.q_mm_frames _),
    "q_mm_phash" -> (Multimodal.q_mm_phash _),
    // time windows (streaming operators, batch-verified)
    "q_stream_tumbling" -> (Windows.q_stream_tumbling _),
    "q_stream_sliding" -> (Windows.q_stream_sliding _),
    "q_stream_session" -> (Windows.q_stream_session _),
    "q_stream_drift" -> (Windows.q_stream_drift _),
    // UDAF
    "q_udaf_custom" -> (Udafs.q_udaf_custom _),
    // scalar families II (variant / lateral / interval / regexp / url)
    "q_variant_funcs" -> (Relational.q_variant_funcs _),
    "q_lateral_topn" -> (Relational.q_lateral_topn _),
    "q_interval_funcs" -> (Relational.q_interval_funcs _),
    "q_regexp_funcs" -> (Relational.q_regexp_funcs _),
    "q_url_funcs" -> (Relational.q_url_funcs _),
    "q_stat_crosstab" -> (Relational.q_stat_crosstab _),
    "q_agg_bool" -> (Relational.q_agg_bool _),
    "q_agg_hll" -> (Relational.q_agg_hll _),
    // training-set assembly
    "q_chunk_docs" -> (Llm.q_chunk_docs _),
    "q_dedup_runs" -> (Llm.q_dedup_runs _),
    "q_quality_classifier" -> (Llm.q_quality_classifier _),
    "q_kwic" -> (Llm.q_kwic _),
    "q_pagerank" -> (Llm.q_pagerank _),
    "q_mix_sample" -> (Llm.q_mix_sample _),
    "q_pack_sequences" -> (Llm.q_pack_sequences _),
    "q_oov_rate" -> (Llm.q_oov_rate _),
    "q_ngram_novelty" -> (Llm.q_ngram_novelty _),
    "q_split_grouped" -> (Llm.q_split_grouped _),
    "q_budget_trim" -> (Llm.q_budget_trim _),
    "q_shard_rendezvous" -> (Llm.q_shard_rendezvous _),
    "q_eval_auc" -> (Llm.q_eval_auc _),
    "q_eval_ndcg" -> (Llm.q_eval_ndcg _),
    "q_eval_f1" -> (Llm.q_eval_f1 _),
    "q_rank_fusion" -> (Llm.q_rank_fusion _),
    "q_select_cover" -> (Llm.q_select_cover _),
    "q_eval_calibration" -> (Llm.q_eval_calibration _),
    "q_lang_kappa" -> (Llm.q_lang_kappa _),
    "q_agreement_alpha" -> (Llm.q_agreement_alpha _),
    "q_eval_lift" -> (Llm.q_eval_lift _),
    "q_drift_js" -> (Llm.q_drift_js _),
    "q_forecast_snaive" -> (Relational.q_forecast_snaive _),
    "q_xcorr_lag" -> (Relational.q_xcorr_lag _),
    "q_stat_ttest" -> (Relational.q_stat_ttest _),
    "q_stat_anova" -> (Relational.q_stat_anova _),
    "q_attribution_last" -> (Relational.q_attribution_last _),
    "q_keywords_ctfidf" -> (Llm.q_keywords_ctfidf _),
    "q_dedup_soft" -> (Llm.q_dedup_soft _),
    "q_sim_sparse" -> (Llm.q_sim_sparse _),
    "q_mm_metadata" -> (Multimodal.q_mm_metadata _),
    // TPC-H shapes II + generators/provenance
    "q_tpch_q4ish" -> (Relational.q_tpch_q4ish _),
    "q_tpch_q6ish" -> (Relational.q_tpch_q6ish _),
    "q_tpch_q7ish" -> (Relational.q_tpch_q7ish _),
    "q_tpch_q13ish" -> (Relational.q_tpch_q13ish _),
    "q_tpch_q14ish" -> (Relational.q_tpch_q14ish _),
    "q_tpch_q17ish" -> (Relational.q_tpch_q17ish _),
    "q_tpch_q19ish" -> (Relational.q_tpch_q19ish _),
    "q_tpch_q22ish" -> (Relational.q_tpch_q22ish _),
    // TPC-H shapes III (partsupp-free adaptations)
    "q_tpch_q8ish" -> (Relational.q_tpch_q8ish _),
    "q_tpch_q9ish" -> (Relational.q_tpch_q9ish _),
    "q_tpch_q12ish" -> (Relational.q_tpch_q12ish _),
    "q_tpch_q15ish" -> (Relational.q_tpch_q15ish _),
    "q_tpch_q21ish" -> (Relational.q_tpch_q21ish _),
    // TPC-H shapes IV — the last four of the 22 (partsupp-free adaptations)
    "q_tpch_q2ish" -> (Relational.q_tpch_q2ish _),
    "q_tpch_q11ish" -> (Relational.q_tpch_q11ish _),
    "q_tpch_q16ish" -> (Relational.q_tpch_q16ish _),
    "q_tpch_q20ish" -> (Relational.q_tpch_q20ish _),
    "q_listagg" -> (Relational.q_listagg _),
    "q_agg_bitmap" -> (Relational.q_agg_bitmap _),
    "q_explode_outer" -> (Relational.q_explode_outer _),
    "q_file_provenance" -> (Relational.q_file_provenance _),
    "q_recursive_cte" -> (Relational.q_recursive_cte _),
    "q_array_funcs3" -> (Relational.q_array_funcs3 _),
    "q_map_funcs2" -> (Relational.q_map_funcs2 _),
    "q_agg_theta" -> (Relational.q_agg_theta _),
    "q_pivot2" -> (Relational.q_pivot2 _),
    "q_collation" -> (Relational.q_collation _),
    "q_impute_locf" -> (Relational.q_impute_locf _),
    "q_math_funcs2" -> (Relational.q_math_funcs2 _),
    "q_agg_histogram2" -> (Relational.q_agg_histogram2 _),
    "q_date_funcs3" -> (Relational.q_date_funcs3 _),
    "q_string_funcs3" -> (Relational.q_string_funcs3 _),
    "q_json_funcs2" -> (Relational.q_json_funcs2 _),
    "q_window_trailing" -> (Relational.q_window_trailing _),
    "q_timezone_funcs" -> (Relational.q_timezone_funcs _),
    "q_agg_regr" -> (Relational.q_agg_regr _),
    "q_agg_approx_topk" -> (Relational.q_agg_approx_topk _),
    "q_source_text" -> (Sources.q_source_text _),
    "q_join_bucketed" -> (Sources.q_join_bucketed _),
    "q_source_binaryfile" -> (Sources.q_source_binaryfile _),
    "q_xml_funcs" -> (Relational.q_xml_funcs _),
    "q_encoding_funcs" -> (Relational.q_encoding_funcs _),
    "q_sentences" -> (Relational.q_sentences _),
  )

  /** `q_pagerank`'s oracle: the damped power iteration UNROLLED into one
    * CTE per round — fixed iteration count makes the "iterative, not
    * SQL-expressible" objection false for the gate's 5 rounds. Float
    * parity pillars: contributions accumulate as DECIMAL(28,12) (exactly
    * as [[graft.ops.Scale.pageRank]] does, so sums are order-independent
    * in BOTH engines), and the teleport constant is written `(1.0 - 0.85)`
    * so DuckDB folds the same IEEE double Scala computes for
    * `lit(1.0 - damping)` (0.15 is NOT representable; the engines must
    * share the 1-ulp error, not round it away).
    */
  private def pagerankOracle(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.id, (1.0 - 0.85) + 0.85 * coalesce(CAST(c.s AS DOUBLE), 0.0) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(CAST(r.rank / e.outdeg AS DECIMAL(28,12))) AS s
         |    FROM e JOIN r${k - 1} r ON e.src = r.id GROUP BY e.dst) c
         |  ON n.id = c.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT doc_id AS src, CAST(floor(doc_id / 2) AS BIGINT) AS dst
       |  FROM documents WHERE doc_id >= 2),
       |deg AS (SELECT src, count(*) AS outdeg FROM e0 GROUP BY src),
       |e AS (SELECT e0.src, e0.dst, deg.outdeg FROM e0 JOIN deg USING (src)),
       |nodes AS (SELECT src AS id FROM e0 UNION SELECT dst FROM e0),
       |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
       |$rounds
       |SELECT id, round(rank + 1e-12, 8) AS rank FROM r$iters ORDER BY id""".stripMargin
  }

  /** HITS unrolled: authority then hub pass per round, all-BIGINT (the
    * engine iterates without normalization, so every intermediate is an
    * exact integer — see Llm.q_graph_hits). Each a/s CTE is referenced
    * twice downstream → AS MATERIALIZED (DuckDB v1.0 inlines every CTE
    * reference; un-hinted this unrolling is 2^iters copies of round 1 —
    * the q_select_cover disk-fill trap, PERF.md round 10).
    */
  private def hitsOracle(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""a$k AS MATERIALIZED (
         |  SELECT n.id, coalesce(x.s, 0)::BIGINT AS auth
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(s.hub) AS s FROM e JOIN s${k - 1} s ON e.src = s.id
         |    GROUP BY e.dst) x ON n.id = x.dst),
         |h$k AS (
         |  SELECT n.id, coalesce(y.s, 0)::BIGINT AS hub
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.src, sum(a.auth) AS s FROM e JOIN a$k a ON e.dst = a.id
         |    GROUP BY e.src) y ON n.id = y.src),
         |s$k AS MATERIALIZED (SELECT h.id, h.hub, a.auth FROM h$k h JOIN a$k a USING (id))""".stripMargin
    }.mkString(",\n")
    s"""WITH ids AS (SELECT doc_id FROM documents),
       |e AS MATERIALIZED (
       |  SELECT x.doc_id AS src, y.doc_id AS dst
       |  FROM ids x JOIN ids y ON y.doc_id = x.doc_id + 1
       |  UNION ALL
       |  SELECT x.doc_id, y.doc_id
       |  FROM ids x JOIN ids y ON y.doc_id = x.doc_id + 2 AND x.doc_id % 2 = 0),
       |nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |s0 AS (SELECT id, 1::BIGINT AS hub, 1::BIGINT AS auth FROM nodes),
       |$rounds,
       |mx AS (SELECT max(hub) AS mh, max(auth) AS ma FROM s$iters)
       |SELECT id, hub, auth,
       |  round(CAST(hub AS DOUBLE) / mh + 1e-12, 8) AS hub_norm,
       |  round(CAST(auth AS DOUBLE) / ma + 1e-12, 8) AS auth_norm
       |FROM s$iters CROSS JOIN mx ORDER BY id""".stripMargin
  }

  /** DuckDB-equivalent SQL per query (same column names + total ORDER BY
    * in both engines; exact-DECIMAL accumulation for float sums; BIGINT
    * casts where the engines' integer widths differ).
    */
  /** Shared oracle CTE for the classifier-eval gates (q_eval_auc /
    * q_eval_calibration): the quality-classifier logistic rendered as
    * exact micro-unit integers + the C4 cascade keep decision as the
    * gold label — the SQL mirror of `Llm.classifierScored`. Kept
    * margin-raw (stripMargin is applied by the concatenating entries).
    */
  /** The Unicode-gate canary rows as a SQL VALUES list, single-sourced
    * from [[graft.ops.Llm.unicodeCanaries]] (the engine side) so the
    * two sides can never drift. Single quotes doubled for SQL.
    */
  private lazy val unicodeCanaryValues: String =
    graft.ops.Llm.unicodeCanaries
      .map { case (id, t) => s"($id, '${t.replace("'", "''")}')" }
      .mkString(", ")

  private val ClassifierScoredSql: String =
    """WITH sc AS (SELECT doc_id, source,
      |    CAST(round(round(1.0 / (1.0 + exp(-z)) + 1e-9, 6) * 1000000.0) AS BIGINT) AS score_ppm,
      |    (n_tok >= 30 AND n_tok <= 5000
      |     AND round(CAST(n_chars - (n_tok - 1) AS DOUBLE) / n_tok + 1e-9, 4) >= 3.0
      |     AND round(CAST(n_chars - (n_tok - 1) AS DOUBLE) / n_tok + 1e-9, 4) <= 12.0
      |     AND stop_hits >= 2 AND NOT has_block) AS label
      |  FROM (SELECT doc_id, source, n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST(len(list_filter(string_split(text, ' '),
      |         w -> w IN ('the','and','of','to','in'))) AS BIGINT) AS stop_hits,
      |    list_contains(string_split(text, ' '), 'slow') AS has_block,
      |    -2.0 + 1.5 * least(len(string_split(text,' ')) / 100.0, 1.0)
      |         + 0.4 * ((n_chars - len(string_split(text,' ')) + 1.0) / len(string_split(text,' ')))
      |         + 2.0 * (len(list_intersect(string_split(text,' '),
      |                      string_split('the,a,and,of,to,in,is,it',','))) / 8.0)
      |         + 1.2 * (len(list_distinct(string_split(text,' '))) / len(string_split(text,' '))) AS z
      |   FROM documents))"""

  def oracleSql: Map[String, String] = Map(

    // binned lift: integer divisions of exact counts; the cumulative
    // window orders ten bin rows
    "q_eval_lift" ->
      (ClassifierScoredSql +
      """,
        |b AS (SELECT least(score_ppm // 100000, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |  FROM sc GROUP BY 1),
        |c AS (SELECT bin, n, n_pos,
        |    CAST(sum(n) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |    CAST(sum(n_pos) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
        |  FROM b),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot_n, CAST(sum(n_pos) AS BIGINT) AS tot_pos FROM b)
        |SELECT bin, n, n_pos, cum_n, cum_pos,
        |  CAST((2000000 * cum_pos + tot_pos) // (2 * tot_pos) AS BIGINT) AS gain_ppm,
        |  CAST((2000000 * CAST(cum_pos AS HUGEINT) * tot_n + CAST(cum_n AS HUGEINT) * tot_pos) // (2 * CAST(cum_n AS HUGEINT) * tot_pos) AS BIGINT) AS lift_ppm
        |FROM c CROSS JOIN t ORDER BY bin DESC""").stripMargin,

    // JS terms: identical-rational shares through the same expression
    // order -> bit-identical doubles; epsilon round closes formatting
    "q_drift_js" ->
      """WITH b AS (
        |  SELECT least(CAST(floor(n_chars / 400) AS BIGINT), 9) AS bucket,
        |    CAST(sum(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(sum(CASE WHEN doc_id >= 250 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS BIGINT) AS tot_ref,
        |    CAST(sum(CASE WHEN doc_id >= 250 THEN 1 ELSE 0 END) AS BIGINT) AS tot_cur
        |  FROM documents),
        |ax AS (SELECT CAST(range AS BIGINT) AS bucket FROM range(10)),
        |f AS (SELECT bucket, coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM ax LEFT JOIN b USING (bucket)),
        |pq AS (SELECT bucket, n_ref, n_cur,
        |    (n_ref + 0.5) / (tot_ref + 5.0) AS p,
        |    (n_cur + 0.5) / (tot_cur + 5.0) AS q
        |  FROM f CROSS JOIN t)
        |SELECT bucket, n_ref, n_cur,
        |  round(0.5 * p * ln(p / ((p + q) / 2.0))
        |    + 0.5 * q * ln(q / ((p + q) / 2.0)) + 1e-9, 6) AS js_term
        |FROM pq ORDER BY bucket""".stripMargin,

    // daily DECIMAL totals, exact 7-day-lag join; MAE round-half-up in
    // micro units, bias shipped as the exact SIGNED micro sum (never a
    // rounded negative quotient)
    "q_forecast_snaive" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    sum(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type, a.v - b.v AS err
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day = b.day + INTERVAL 7 DAY)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST((2 * CAST(sum(abs(err)) * 1000000 AS HUGEINT) + count(*))
        |    // (2 * count(*)) AS BIGINT) AS mae_micro,
        |  CAST(CAST(sum(err) * 1000000 AS HUGEINT) AS BIGINT) AS bias_micro_sum
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_pit_grid" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
        |    event_type AS status
        |  FROM events),
        |ch AS (
        |  SELECT user_id, event_id, ts_us, status,
        |    lag(status) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
        |  FROM e),
        |iv0 AS (SELECT user_id, event_id, ts_us, status FROM ch
        |        WHERE prev IS NULL OR prev <> status),
        |iv AS (
        |  SELECT user_id, ts_us, status,
        |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      AS valid_to_us
        |  FROM iv0),
        |wm AS (SELECT max(ts_us) AS max_us FROM e),
        |grid AS (
        |  SELECT status,
        |    unnest(generate_series((ts_us + 604799999999) // 604800000000,
        |      (coalesce(valid_to_us, max_us + 1) - 1) // 604800000000)) AS wk
        |  FROM iv CROSS JOIN wm
        |  WHERE (coalesce(valid_to_us, max_us + 1) - 1) // 604800000000
        |        >= (ts_us + 604799999999) // 604800000000)
        |SELECT wk, status, CAST(count(*) AS BIGINT) AS n_users
        |FROM grid GROUP BY 1, 2 ORDER BY wk, status""".stripMargin,

    "q_sample_balanced" ->
      """WITH d AS (
        |  SELECT doc_id, lang, md5('bal:' || CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents),
        |q AS (SELECT min(n) AS quota FROM
        |       (SELECT count(*) AS n FROM d GROUP BY lang)),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY rk, doc_id) AS rn
        |  FROM d)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
        |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM r CROSS JOIN q WHERE rn <= quota
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_cooccur_skipgram" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |p AS (
        |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
        |           i -> {'w1': t[i], 'w2': t[i+1]})) AS u
        |  FROM toks WHERE len(t) >= 2
        |  UNION ALL
        |  SELECT unnest(list_transform(generate_series(1, len(t) - 2),
        |           i -> {'w1': t[i], 'w2': t[i+2]})) AS u
        |  FROM toks WHERE len(t) >= 3),
        |c AS (SELECT u.w1 AS w1, u.w2 AS w2 FROM p
        |      WHERE u.w1 <> '' AND u.w2 <> '')
        |SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_cooccur
        |FROM c GROUP BY 1, 2
        |ORDER BY n_cooccur DESC, w1, w2 LIMIT 100""".stripMargin,

    "q_percentile_bands" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(quantile_cont(CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE), 0.50) + 1e-9, 4) AS p50,
        |  round(quantile_cont(CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE), 0.90) + 1e-9, 4) AS p90,
        |  round(quantile_cont(CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE), 0.99) + 1e-9, 4) AS p99
        |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,

    "q_anomaly_days" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS xu
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, count(*) AS n, CAST(sum(xu) AS BIGINT) AS s1,
        |    CAST(sum(CAST(xu AS HUGEINT) * xu) AS HUGEINT) AS s2
        |  FROM daily GROUP BY 1),
        |z AS (
        |  SELECT d.event_type AS event_type, day, xu,
        |    (CAST(n AS DOUBLE) * CAST(xu AS DOUBLE) - CAST(s1 AS DOUBLE))
        |      / sqrt(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        |           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) AS zv
        |  FROM daily d JOIN st USING (event_type)
        |  WHERE n > 1 AND CAST(n AS HUGEINT) * s2
        |              - CAST(s1 AS HUGEINT) * s1 > 0)
        |SELECT event_type, day, xu AS day_total_micro,
        |  round(zv + 1e-9, 4) AS z_score
        |FROM z WHERE abs(zv) > 2.0
        |ORDER BY event_type, day""".stripMargin,

    "q_rank_movers" ->
      """WITH monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |    c_mktsegment AS segment,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT month, segment, rev,
        |    CAST(row_number() OVER (PARTITION BY month
        |      ORDER BY rev DESC, segment) AS BIGINT) AS rnk
        |  FROM monthly)
        |SELECT c.month AS month, c.segment AS segment, c.rnk AS rnk,
        |  p.rnk AS prev_rnk, p.rnk - c.rnk AS rank_delta,
        |  CAST(c.rev AS DOUBLE) AS revenue
        |FROM ranked c JOIN ranked p
        |  ON c.segment = p.segment AND c.month = p.month + INTERVAL 1 MONTH
        |ORDER BY month, rnk""".stripMargin,

    "q_seasonality_dow" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS vu
        |  FROM events GROUP BY 1, 2),
        |bydow AS (
        |  SELECT event_type, CAST(isodow(day) - 1 AS BIGINT) AS dow,
        |    CAST(sum(vu) AS BIGINT) AS sum_dow, count(*) AS n_days_dow
        |  FROM daily GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(sum(vu) AS BIGINT) AS sum_tot,
        |    count(*) AS n_days_tot
        |  FROM daily GROUP BY 1)
        |SELECT b.event_type AS event_type, dow,
        |  CAST(n_days_dow AS BIGINT) AS n_days_dow, sum_dow AS sum_micro,
        |  CAST(CAST(sum_dow AS HUGEINT) * n_days_tot * 1000000
        |    // (CAST(sum_tot AS HUGEINT) * n_days_dow) AS BIGINT) AS dow_index_ppm
        |FROM bydow b JOIN tot USING (event_type)
        |ORDER BY event_type, dow""".stripMargin,

    "q_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |sizes AS (SELECT event_type, count(*) AS n_users FROM ut GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_both
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b,
        |  CAST(sa.n_users AS BIGINT) AS n_a, CAST(sb.n_users AS BIGINT) AS n_b,
        |  CAST(n_both AS BIGINT) AS n_both,
        |  CAST(n_both * 1000000 // (sa.n_users + sb.n_users - n_both) AS BIGINT)
        |    AS jaccard_ppm
        |FROM pairs
        |JOIN sizes sa ON sa.event_type = type_a
        |JOIN sizes sb ON sb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,

    "q_dq_freshness" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) // 1000 AS ts_us FROM events),
        |wm AS (SELECT max(ts_us) AS corpus_max_us FROM e),
        |g AS (
        |  SELECT event_type,
        |    count(*) AS n_rows,
        |    (max(corpus_max_us) - max(ts_us)) // 60000000 AS staleness_min,
        |    sum(CASE WHEN ts_us > corpus_max_us - 604800000000
        |             THEN 1 ELSE 0 END) AS n_last_week,
        |    sum(CASE WHEN ts_us > corpus_max_us - 1209600000000
        |              AND ts_us <= corpus_max_us - 604800000000
        |             THEN 1 ELSE 0 END) AS n_prior_week
        |  FROM e CROSS JOIN wm GROUP BY 1)
        |SELECT event_type, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(staleness_min AS BIGINT) AS staleness_min,
        |  CAST(n_last_week AS BIGINT) AS n_last_week,
        |  CAST(n_prior_week AS BIGINT) AS n_prior_week,
        |  CASE WHEN n_prior_week = 0 THEN NULL
        |       ELSE CAST(n_last_week * 1000000 // n_prior_week AS BIGINT)
        |  END AS wow_ratio_ppm
        |FROM g ORDER BY event_type""".stripMargin,

    "q_trend_robust" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    sum(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM events GROUP BY 1, 2),
        |d2 AS (SELECT event_type, day, v,
        |         day - DATE '1970-01-01' AS di FROM daily),
        |pairs AS (
        |  SELECT a.event_type AS event_type,
        |    CAST(sign(CAST(b.v - a.v AS DOUBLE)) AS BIGINT) AS sgn,
        |    CAST(b.v - a.v AS DOUBLE) / CAST(b.di - a.di AS DOUBLE) AS slope
        |  FROM d2 a JOIN d2 b ON a.event_type = b.event_type AND a.di < b.di),
        |nd AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1),
        |ag AS (
        |  SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s_stat,
        |    count(*) AS n_pairs,
        |    round(quantile_cont(slope, 0.5) + 1e-9, 6) AS theil_sen_slope
        |  FROM pairs GROUP BY 1)
        |SELECT ag.event_type, CAST(n_days AS BIGINT) AS n_days, s_stat,
        |  round(CAST(s_stat AS DOUBLE) / CAST(n_pairs AS DOUBLE) + 1e-9, 6) AS kendall_tau,
        |  theil_sen_slope,
        |  CASE WHEN s_stat > 0 THEN 'rising' WHEN s_stat < 0 THEN 'falling'
        |       ELSE 'flat' END AS trend
        |FROM ag JOIN nd USING (event_type) ORDER BY event_type""".stripMargin,

    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS vu
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, day,
        |    CAST(sum(vu) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i
        |  FROM daily),
        |tot AS (SELECT event_type, CAST(sum(vu) AS BIGINT) AS total,
        |          CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1),
        |dev AS (
        |  SELECT c.event_type AS event_type, n_days, day,
        |    abs(n_days * cum - i * total) AS dev,
        |    row_number() OVER (PARTITION BY c.event_type
        |      ORDER BY abs(n_days * cum - i * total) DESC, day) AS rn
        |  FROM cum c JOIN tot USING (event_type))
        |SELECT event_type, n_days, day AS cp_day,
        |  CAST(dev AS BIGINT) AS max_dev_n_micro
        |FROM dev WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q_peak_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events),
        |x AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
        |           OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |              > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |se AS (
        |  SELECT user_id, ts_us,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM x),
        |sess AS (
        |  SELECT user_id, session_id, min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM se GROUP BY 1, 2),
        |sweep AS (
        |  SELECT user_id, session_id, start_us AS ts_us, 1 AS delta FROM sess
        |  UNION ALL
        |  SELECT user_id, session_id, end_us + 1 AS ts_us, -1 AS delta FROM sess),
        |cum AS (
        |  SELECT ts_us, delta,
        |    CAST(sum(delta) OVER (ORDER BY ts_us, delta, user_id, session_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open
        |  FROM sweep)
        |SELECT ts_us // 86400000000 AS day,
        |  CAST(max(open) AS BIGINT) AS peak_concurrency,
        |  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_session_starts
        |FROM cum GROUP BY 1 ORDER BY day""".stripMargin,

    "q_funnel_window" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events),
        |s AS (SELECT user_id, min(ts_us) AS s_us FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT DISTINCT e.user_id
        |      FROM e JOIN s USING (user_id)
        |      WHERE e.event_type = 'purchase'
        |        AND e.ts_us >= s.s_us AND e.ts_us <= s.s_us + 604800000000)
        |SELECT s_us // 604800000000 AS cohort_week,
        |  CAST(count(*) AS BIGINT) AS n_signups,
        |  CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_conv_7d,
        |  CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS cvr_ppm
        |FROM s LEFT JOIN c USING (user_id)
        |GROUP BY 1 ORDER BY cohort_week""".stripMargin,

    "q_sim_rerank" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
        |s AS (SELECT qid, cid, qe, ce,
        |        round(list_reduce(list_transform(range(1, 33), i -> qe[i] * ce[i]),
        |                          (a, b) -> a + b)
        |          / (sqrt(list_reduce(list_transform(qe[1:32], x -> x * x), (a, b) -> a + b))
        |           * sqrt(list_reduce(list_transform(ce[1:32], x -> x * x), (a, b) -> a + b))), 9) AS cos32_raw
        |      FROM q, c WHERE cid <> qid),
        |r AS (SELECT qid, cid, qe, ce,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos32_raw DESC, cid) AS rn32
        |      FROM s),
        |f AS (SELECT qid, cid, rn32,
        |        round(list_reduce(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i]),
        |                          (a, b) -> a + b)
        |          / (sqrt(list_reduce(list_transform(qe, x -> x * x), (a, b) -> a + b))
        |           * sqrt(list_reduce(list_transform(ce, x -> x * x), (a, b) -> a + b))), 9) AS cos_full_raw
        |      FROM r WHERE rn32 <= 20),
        |rr AS (SELECT qid, cid, rn32, cos_full_raw,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos_full_raw DESC, cid) AS rk
        |      FROM f)
        |SELECT qid, CAST(rk AS BIGINT) AS rank, cid,
        |  CAST(rn32 AS BIGINT) AS shortlist_pos,
        |  round(cos_full_raw, 6) AS cos_full
        |FROM rr WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    "q_stat_ttest" ->
      """WITH st AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,4))) AS s1,
        |    sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS s2
        |  FROM events GROUP BY event_type),
        |tot AS (SELECT sum(n) AS nt, sum(s1) AS s1t, sum(s2) AS s2t FROM st),
        |x AS (
        |  SELECT event_type, n, nt - n AS n2, s1, s2, s1t - s1 AS r1, s2t - s2 AS r2
        |  FROM st CROSS JOIN tot),
        |y AS (
        |  SELECT event_type, n, n2,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
        |    CAST(r1 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
        |    (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS v1,
        |    (CAST(n2 AS DOUBLE) * CAST(r2 AS DOUBLE) - CAST(r1 AS DOUBLE) * CAST(r1 AS DOUBLE))
        |      / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) AS v2
        |  FROM x),
        |z AS (
        |  SELECT event_type, n, n2, m1, m2, v1, v2,
        |    v1 / CAST(n AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) AS se2
        |  FROM y)
        |SELECT event_type, CAST(n AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  round((m1 - m2) / sqrt(se2) + 1e-9, 6) AS t_stat,
        |  round(se2 * se2
        |    / ((v1 / CAST(n AS DOUBLE)) * (v1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
        |      + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0))
        |    + 1e-9, 4) AS welch_df
        |FROM z ORDER BY event_type""".stripMargin,

    "q_stat_anova" ->
      """WITH st AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,4))) AS s1,
        |    sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS s2
        |  FROM events GROUP BY event_type),
        |agg AS (
        |  SELECT count(*) AS k, sum(n) AS n_tot, sum(s1) AS s1t, sum(s2) AS s2t,
        |    sum(CAST(round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
        |          * 1000000 + 1e-9, 0) AS HUGEINT)) AS a_micro
        |  FROM st),
        |x AS (
        |  SELECT k, n_tot, a_micro,
        |    CAST(round(CAST(s1t AS DOUBLE) * CAST(s1t AS DOUBLE) / CAST(n_tot AS DOUBLE)
        |        * 1000000 + 1e-9, 0) AS HUGEINT) AS grand_micro,
        |    CAST(round(CAST(s2t AS DOUBLE) * 1000000 + 1e-9, 0) AS HUGEINT) AS s2t_micro
        |  FROM agg)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n_tot AS BIGINT) AS n_tot,
        |  CAST(a_micro - grand_micro AS BIGINT) AS ssb_micro,
        |  CAST(s2t_micro - a_micro AS BIGINT) AS ssw_micro,
        |  round((CAST(a_micro - grand_micro AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
        |    / (CAST(s2t_micro - a_micro AS DOUBLE) / (CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE)))
        |    + 1e-9, 6) AS f_stat
        |FROM x""".stripMargin,

    "q_xcorr_lag" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    sum(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2),
        |a AS (SELECT day AS da, v AS x FROM daily WHERE event_type = 'click'),
        |b AS (SELECT day AS db, v AS y FROM daily WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT g.lag, x, y
        |  FROM a CROSS JOIN generate_series(0, 7) AS g(lag)
        |  JOIN b ON db = da + to_days(CAST(g.lag AS INTEGER))),
        |st AS (
        |  SELECT lag, count(*) AS n_days, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM j GROUP BY lag)
        |SELECT lag, n_days,
        |  round((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * sqrt(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    + 1e-9, 6) AS xcorr
        |FROM st ORDER BY lag""".stripMargin,

    "q_attribution_last" ->
      """WITH a AS (
        |  SELECT event_type, value,
        |    coalesce(last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'direct') AS channel
        |  FROM events)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY channel ORDER BY channel""".stripMargin,
    "q_pagerank" -> pagerankOracle(5),
    "q_graph_hits" -> hitsOracle(5),
    // hash-kernel gates: FNV-1a/splitmix64/minhash/LSH replicated in
    // DuckDB HUGEINT arithmetic (OracleSql scaladoc) — the former
    // "rows-only by design" class, now hash-exact
    "q_winnow" -> OracleSql.winnow,
    "q_pack_sequences" -> OracleSql.packSequences,
    "q_dedup_minhash" -> OracleSql.dedupMinhash,
    "q_pipeline_release" -> OracleSql.pipelineRelease,
    "q_dedup_clusters" -> OracleSql.dedupClusters,
    "q_dedup_bucket_stats" -> OracleSql.dedupBucketStats,
    "q_contamination_fuzzy" -> OracleSql.contaminationFuzzy,
    "q_dedup_simhash" -> OracleSql.dedupSimhash,
    "q_dedup_cdc" -> OracleSql.dedupCdc,
    "q_dedup_keep_best" -> OracleSql.dedupKeepBest,
    "q_dedup_snm" -> OracleSql.dedupSnm,
    "q_dedup_embed" -> OracleSql.dedupEmbed,
    "q_sim_quantized" -> OracleSql.simQuantized,
    // BPE: fixed merge budgets unroll as materialized CTE rounds; the
    // per-word greedy merge is a sep-encoded string replace (OracleSql
    // scaladoc) — the last deterministic gates that were rows-only
    "q_bpe_train" -> OracleSql.bpeTrain,
    "q_bpe_encode" -> OracleSql.bpeEncode,
    "q_tokenizer_fertility" -> OracleSql.tokenizerFertility,
    "q_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, u AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS u FROM documents)
        |  WHERE u <> ''),
        |cc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
        |wn AS (SELECT doc_id, cnt, sum(cnt) OVER (PARTITION BY doc_id) AS n FROM cc)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars_split,
        |  CAST(sum(CAST(round(-(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
        |        * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000 + 1e-9, 0)
        |      AS BIGINT)) AS BIGINT) AS entropy_micro
        |FROM wn GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_mm_frames" -> OracleSql.mmFrames,
    "q_mm_features" -> OracleSql.mmFeatures,
    "q_mm_phash" -> OracleSql.mmPhash,
    "q_project_cast" ->
      """SELECT p_partkey, p_name AS part_name,
        |  round(p_retailprice + 1e-9, 2) AS price_r,
        |  CAST(p_size AS BIGINT) AS size_l
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A','R')
        |  AND l_shipdate >= TIMESTAMP '1995-06-01'
        |  AND NOT (l_discount < 0.02) AND l_linestatus IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS order_cnt,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT s_suppkey, s_name FROM supplier s
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
        |ORDER BY s_suppkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_range" ->
      """SELECT p.p_partkey, count(*) AS n_close,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part p JOIN lineitem l
        |  ON l.l_partkey = p.p_partkey
        | AND l.l_quantity BETWEEN p.p_size - 5 AND p.p_size + 5
        |GROUP BY p.p_partkey ORDER BY p.p_partkey""".stripMargin,
    "q_join_range_binned" ->
      """SELECT o.o_orderkey, count(*) AS n_ship,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders o JOIN lineitem l
        |  ON l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        |WHERE o.o_orderkey % 1000 = 0
        |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin,
    "q_join_overlap" ->
      """SELECT o.o_orderkey, count(*) AS n_overlap,
        |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM orders o JOIN lineitem l
        |  ON o.o_orderdate < l.l_shipdate + l.l_linenumber * INTERVAL 1 DAY
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        |WHERE o.o_orderkey % 500 = 0 AND l.l_orderkey % 100 = 0
        |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin,
    "q_scd2" ->
      """WITH changes AS (
        |  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |    event_type AS status,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS prev
        |  FROM events)
        |SELECT user_id, event_id AS change_id, status,
        |  ts_us AS valid_from_us,
        |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us,
        |  (lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL)
        |    AS is_current
        |FROM changes WHERE prev IS NULL OR prev <> status
        |ORDER BY user_id, valid_from_us, change_id""".stripMargin,
    "q_graph_triangles" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |edges AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM ids x JOIN ids y ON y.doc_id = x.doc_id + 1
        |  UNION
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM ids x JOIN ids y ON y.doc_id = x.doc_id + 2 AND x.doc_id % 2 = 0)
        |SELECT e1.a, CAST(count(*) AS BIGINT) AS n_tri
        |FROM edges e1
        |JOIN edges e2 ON e2.a = e1.b
        |WHERE EXISTS (SELECT 1 FROM edges e3 WHERE e3.a = e1.a AND e3.b = e2.b)
        |GROUP BY e1.a ORDER BY e1.a""".stripMargin,
    // the degree-oriented guard path must match the SAME triangle oracle
    "q_graph_triangles_deg" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |edges AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM ids x JOIN ids y ON y.doc_id = x.doc_id + 1
        |  UNION
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM ids x JOIN ids y ON y.doc_id = x.doc_id + 2 AND x.doc_id % 2 = 0)
        |SELECT e1.a, CAST(count(*) AS BIGINT) AS n_tri
        |FROM edges e1
        |JOIN edges e2 ON e2.a = e1.b
        |WHERE EXISTS (SELECT 1 FROM edges e3 WHERE e3.a = e1.a AND e3.b = e2.b)
        |GROUP BY e1.a ORDER BY e1.a""".stripMargin,
    "q_drift_psi" ->
      """WITH b AS (
        |  SELECT doc_id, least(CAST(floor(n_chars / 400) AS BIGINT), 9) AS bucket
        |  FROM documents),
        |counts AS (
        |  SELECT bucket,
        |    CAST(sum(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(sum(CASE WHEN doc_id >= 250 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM b GROUP BY bucket),
        |totals AS (
        |  SELECT CAST(sum(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS BIGINT) AS tot_ref,
        |    CAST(sum(CASE WHEN doc_id >= 250 THEN 1 ELSE 0 END) AS BIGINT) AS tot_cur
        |  FROM b),
        |axis AS (SELECT unnest(generate_series(0, 9)) AS bucket)
        |SELECT CAST(axis.bucket AS BIGINT) AS bucket,
        |  coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur,
        |  round((((coalesce(n_ref, 0) + 0.5) / (tot_ref + 5.0))
        |       - ((coalesce(n_cur, 0) + 0.5) / (tot_cur + 5.0)))
        |    * ln(((coalesce(n_ref, 0) + 0.5) / (tot_ref + 5.0))
        |       / ((coalesce(n_cur, 0) + 0.5) / (tot_cur + 5.0))) + 1e-9, 6) AS psi_term
        |FROM axis LEFT JOIN counts ON counts.bucket = axis.bucket CROSS JOIN totals
        |ORDER BY bucket""".stripMargin,
    "q_dq_report" ->
      """WITH s AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS BIGINT) AS quantity_range,
        |    CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0 AND 0.1) THEN 1 ELSE 0 END) AS BIGINT) AS discount_range,
        |    CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS price_positive,
        |    CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT) AS returnflag_domain,
        |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS shipdate_not_null
        |  FROM lineitem)
        |SELECT rule, n_violations, n_rows, (n_violations = 0) AS pass FROM (
        |  SELECT 'discount_range' AS rule, discount_range AS n_violations, n_rows FROM s
        |  UNION ALL SELECT 'price_positive', price_positive, n_rows FROM s
        |  UNION ALL SELECT 'quantity_range', quantity_range, n_rows FROM s
        |  UNION ALL SELECT 'returnflag_domain', returnflag_domain, n_rows FROM s
        |  UNION ALL SELECT 'shipdate_not_null', shipdate_not_null, n_rows FROM s)
        |ORDER BY rule""".stripMargin,
    "q_split_train" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(text), 1, 1) IN ('0', '1') THEN 'test'
        |       WHEN substr(md5(text), 1, 1) IN ('2', '3') THEN 'val'
        |       ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_shard_rendezvous" ->
      """WITH w AS (
        |  SELECT doc_id, i AS shard,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)) AS wt
        |  FROM documents, range(8) t(i))
        |SELECT doc_id, CAST(arg_max(shard, wt) AS INT) AS shard
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_split_grouped" ->
      """SELECT doc_id, source,
        |  CASE WHEN substr(md5(source), 1, 1) IN ('0', '1', '2') THEN 'test'
        |       WHEN substr(md5(source), 1, 1) IN ('3', '4', '5') THEN 'val'
        |       ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_budget_trim" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    sum(len(string_split(text, ' '))) OVER (
        |      PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM documents)
        |SELECT doc_id, source,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM t WHERE cum_tokens - n_tokens < 1000 ORDER BY doc_id""".stripMargin,

    "q_corpus_shuffle" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |       AS BIGINT) AS position,
        |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |       AS BIGINT) % 8 AS shard
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_sessionize_batch" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value,
        |    lag(CAST(epoch_us(ts) AS BIGINT)) OVER (PARTITION BY user_id
        |      ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |sess AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    // sessionize → ordered first-5 path per session → top-20 paths;
    // the ordered list() makes the path total-order deterministic
    "q_session_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |    lag(CAST(epoch_us(ts) AS BIGINT)) OVER (PARTITION BY user_id
        |      ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |sess AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, session_id
        |    ORDER BY ts_us, event_id) AS rn
        |  FROM sess),
        |paths AS (
        |  SELECT user_id, session_id,
        |    array_to_string(list(event_type ORDER BY rn), '>') AS path
        |  FROM ranked WHERE rn <= 5 GROUP BY user_id, session_id)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM paths GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    "q_event_transitions" ->
      """WITH pairs AS (
        |  SELECT user_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS from_type,
        |    event_type AS to_type
        |  FROM events),
        |p AS (SELECT * FROM pairs WHERE from_type IS NOT NULL),
        |total AS (SELECT count(*) AS n_total FROM p)
        |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(count(*) AS DOUBLE) / n_total + 1e-9, 6) AS share
        |FROM p CROSS JOIN total
        |GROUP BY from_type, to_type, n_total
        |ORDER BY from_type, to_type""".stripMargin,

    "q_join_asof" ->
      """SELECT e.event_id, e.user_id, CAST(epoch_ns(p.ts) AS BIGINT) AS last_purchase_ns
        |FROM events e ASOF LEFT JOIN
        |  (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,

    "q_join_asof_forward" ->
      """SELECT e.event_id, e.user_id, CAST(epoch_ns(p.ts) AS BIGINT) AS next_purchase_ns
        |FROM events e ASOF LEFT JOIN
        |  (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts <= p.ts
        |ORDER BY e.event_id""".stripMargin,

    "q_join_asof_fwd_native" ->
      """SELECT e.event_id, e.user_id, CAST(epoch_ns(p.ts) AS BIGINT) AS next_purchase_ns
        |FROM events e ASOF LEFT JOIN
        |  (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts <= p.ts
        |ORDER BY e.event_id""".stripMargin,

    "q_join_asof_native" ->
      """SELECT e.event_id, e.user_id, CAST(epoch_ns(p.ts) AS BIGINT) AS last_purchase_ns
        |FROM events e ASOF LEFT JOIN
        |  (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,

    "q_join_nullsafe" ->
      """SELECT c_custkey, CAST(nullif(c_nationkey, 0) AS BIGINT) AS ckey, n_name
        |FROM customer
        |JOIN nation ON nullif(c_nationkey, 0) IS NOT DISTINCT FROM nullif(n_nationkey, 0)
        |ORDER BY c_custkey""".stripMargin,

    "q_sql_surface" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey)
        |SELECT c_custkey, c_name, revenue,
        |  CAST(rank() OVER (ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rnk
        |FROM rev JOIN customer ON o_custkey = c_custkey
        |ORDER BY rnk LIMIT 50""".stripMargin,

    "q_join_salted" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 25
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_bloom" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 10
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS uniq_cust, count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_mode" ->
      """SELECT l_returnflag, CAST(mode(l_linenumber) AS BIGINT) AS mode_line,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_union_byname" ->
      """SELECT o_orderkey, o_totalprice, 'a' AS src, NULL AS o_orderpriority FROM orders
        |UNION ALL BY NAME
        |SELECT o_orderkey, o_orderpriority, 'b' AS src FROM orders
        |ORDER BY o_orderkey, src""".stripMargin,

    // DuckDB's arg_max has no composite-ordering form, so the
    // tie-deterministic witness (largest/smallest key among tied
    // extremes, matching Spark's max_by over a (price, key) struct)
    // is expressed with ranking windows
    "q_agg_minmax_by" ->
      """WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rmax = 1 THEN o_orderkey END) AS key_of_max,
        |  max(CASE WHEN rmin = 1 THEN o_orderkey END) AS key_of_min,
        |  max(o_totalprice) AS max_price,
        |  min(o_totalprice) AS min_price
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_array_funcs2" ->
      """WITH t AS (
        |  SELECT vec_id,
        |    list_transform(embedding[1:8], x -> CAST(round(CAST(x AS DOUBLE) + 1e-9, 3) AS DECIMAL(10,3))) AS a,
        |    list_transform(embedding[1:8], x -> CAST(round(CAST(x AS DOUBLE) + 1e-9, 1) AS DECIMAL(10,1))) AS a1
        |  FROM embeddings)
        |SELECT vec_id,
        |  array_to_string(list_sort(a, 'DESC'), ',') AS sorted_desc,
        |  CAST(list_position(a, a[2]) AS BIGINT) AS pos2,
        |  array_to_string(flatten([a[1:2], a[7:8]]), ',') AS ends,
        |  CAST(len(list_distinct(a1)) AS BIGINT) AS ndist1,
        |  CAST(list_max(a) AS DOUBLE) AS amax
        |FROM t ORDER BY vec_id""".stripMargin,

    "q_bit_funcs" ->
      """SELECT l_returnflag,
        |  CAST(bit_and(l_linenumber) AS BIGINT) AS mask_and,
        |  CAST(bit_or(l_linenumber) AS BIGINT) AS mask_or,
        |  CAST(bit_xor(l_linenumber) AS BIGINT) AS mask_xor,
        |  bit_and(l_orderkey & 255) AS masked_and,
        |  max(CAST(l_linenumber AS BIGINT) << 2) AS max_shifted,
        |  max(xor(l_orderkey, 42)) AS max_xored
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_hash_funcs" ->
      """SELECT c_custkey,
        |  md5(c_name) AS h_md5,
        |  sha256(c_name) AS h_sha256,
        |  substring(sha256(c_name || '|' || c_mktsegment), 1, 16) AS h_composite
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_try_funcs" ->
      """SELECT c_custkey,
        |  TRY_CAST(c_name AS INTEGER) AS bad_cast,
        |  TRY_CAST(CAST(c_custkey AS VARCHAR) AS INTEGER) AS good_cast,
        |  c_acctbal / NULLIF(CAST(c_custkey % 3 AS DOUBLE), 0.0) AS safe_div,
        |  try_strptime(c_mktsegment, '%Y-%m-%d') AS bad_ts,
        |  try_strptime('2024-01-15', '%Y-%m-%d') AS good_ts
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_explode_pos" ->
      """SELECT o_orderkey, CAST(x.pos AS BIGINT) AS pos, x.val AS val
        |FROM (SELECT o_orderkey,
        |        unnest(list_transform(range(len(string_split(o_orderpriority, '-'))),
        |          i -> {'pos': i, 'val': string_split(o_orderpriority, '-')[i+1]})) AS x
        |      FROM orders) t
        |ORDER BY o_orderkey, pos""".stripMargin,

    "q_agg_grouping_id" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_dedup_lines" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(list_transform(range(len(string_split(text,' ')) // 8),
        |    i -> array_to_string(string_split(text,' ')[i*8+1 : i*8+8], ' '))) AS chunk
        |  FROM documents
        |), dup AS (
        |  SELECT chunk AS dchunk FROM ch GROUP BY chunk HAVING count(DISTINCT doc_id) > 1)
        |SELECT doc_id, count(*) AS n_chunks, count(dchunk) AS n_dup_chunks
        |FROM ch LEFT JOIN dup ON chunk = dchunk
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_dedup_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |occ AS (SELECT doc_id, q, array_to_string(w[q+1:q+7], ' ') AS gram
        |        FROM d, LATERAL unnest(range(0, greatest(n - 6, 0))) AS t(q)),
        |dup AS (SELECT gram FROM occ GROUP BY gram HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT o.doc_id, t.pos
        |        FROM occ o JOIN dup USING (gram),
        |        LATERAL unnest(range(o.q, o.q + 7)) AS t(pos)),
        |toks AS (SELECT doc_id, unnest(range(0, n)) AS pos, unnest(w) AS tok FROM d),
        |kept AS (SELECT t.doc_id, t.pos, t.tok FROM toks t
        |         LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
        |         WHERE c.doc_id IS NULL),
        |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
        |               count(*) AS n_kept FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
        |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(d.n - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
        |FROM d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "q_pipeline_docs" ->
      """WITH normed AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    md5(lower(trim(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'),
        |                                  ' +', ' ', 'g')))) AS norm_key
        |  FROM documents WHERE lang IN ('es', 'de', 'zh')),
        |uniq AS (
        |  SELECT *, row_number() OVER (PARTITION BY norm_key ORDER BY doc_id) AS rn
        |  FROM normed)
        |SELECT doc_id, lang, source, n_chars FROM uniq WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "q_inverted_index" ->
      """SELECT term, count(DISTINCT doc_id) AS df,
        |  array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term HAVING df >= 30 ORDER BY term""".stripMargin,

    "q_vocab_df" ->
      """SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term HAVING cf >= 50 ORDER BY term""".stripMargin,

    "q_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, term, tf, df,
        |  round(tf * (ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) + 1.0)
        |        + 1e-9, 6) AS tfidf
        |FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |WHERE tf >= 5
        |ORDER BY doc_id, term""".stripMargin,
    "q_basket_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |marg AS (SELECT event_type, count(*) AS n1 FROM ut GROUP BY 1),
        |tot AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
        |p AS (SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n12
        |  FROM ut a JOIN ut b USING (user_id) WHERE a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT t1, t2, n12,
        |  round(CAST(n12 AS DOUBLE) * n_users / (ma.n1 * mb.n1) + 1e-9, 6) AS lift
        |FROM p JOIN marg ma ON ma.event_type = t1
        |       JOIN marg mb ON mb.event_type = t2
        |       CROSS JOIN tot
        |ORDER BY t1, t2""".stripMargin,

    "q_churn" ->
      """WITH p AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |m AS (SELECT min(day) AS mind, max(day) AS maxd FROM p),
        |j AS (SELECT coalesce(a.day, b.day - 1) AS day,
        |    CASE WHEN b.user_id IS NULL THEN 'churned'
        |         WHEN a.user_id IS NULL THEN 'new'
        |         ELSE 'retained' END AS status
        |  FROM p a FULL JOIN p b
        |    ON a.user_id = b.user_id AND b.day = a.day + 1)
        |SELECT day,
        |  count(*) FILTER (WHERE status = 'retained') AS n_retained,
        |  count(*) FILTER (WHERE status = 'churned') AS n_churned,
        |  count(*) FILTER (WHERE status = 'new') AS n_new
        |FROM j CROSS JOIN m WHERE day >= mind AND day < maxd
        |GROUP BY day ORDER BY day""".stripMargin,

    "q_gini" ->
      """WITH cust AS (SELECT o_custkey,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
        |  FROM orders GROUP BY 1),
        |r AS (SELECT tot,
        |    row_number() OVER (ORDER BY tot, o_custkey) AS i FROM cust)
        |SELECT count(*) AS n_cust,
        |  round(2.0 * CAST(sum(i * tot) AS DOUBLE)
        |          / (count(*) * CAST(sum(tot) AS DOUBLE))
        |        - CAST(count(*) + 1 AS DOUBLE) / count(*) + 1e-9, 6) AS gini
        |FROM r""".stripMargin,

    "q_entropy" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.user_id, count(*) AS n_types,
        |  CAST(sum(CAST(round(-(CAST(c.c AS DOUBLE) / t.tot)
        |                      * ln(CAST(c.c AS DOUBLE) / t.tot) + 1e-9, 6)
        |               AS DECIMAL(18,6))) AS DOUBLE) AS entropy
        |FROM c JOIN t USING (user_id)
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,

    "q_k_anon" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |  count(*) AS n
        |FROM customer
        |GROUP BY 1, 2, 3 HAVING count(*) < 5
        |ORDER BY 1, 2, 3""".stripMargin,

    // numeric PSI: current binned by the REFERENCE deciles; Laplace +1;
    // ln argument is a ratio of exact integer products
    "q_drift_psi_numeric" ->
      """WITH ref AS (SELECT o_totalprice AS v FROM orders
        |             WHERE o_orderdate < TIMESTAMP '1998-01-01'),
        |cur AS (SELECT o_totalprice AS v FROM orders
        |        WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
        |e AS (SELECT [quantile_cont(v,0.1),quantile_cont(v,0.2),quantile_cont(v,0.3),
        |              quantile_cont(v,0.4),quantile_cont(v,0.5),quantile_cont(v,0.6),
        |              quantile_cont(v,0.7),quantile_cont(v,0.8),quantile_cont(v,0.9)]
        |        AS edges FROM ref),
        |rb AS (SELECT len(list_filter(edges, x -> v > x)) AS bin, count(*) AS n_ref
        |       FROM ref CROSS JOIN e GROUP BY 1),
        |cb AS (SELECT len(list_filter(edges, x -> v > x)) AS bin, count(*) AS n_cur
        |       FROM cur CROSS JOIN e GROUP BY 1),
        |tot AS (SELECT (SELECT sum(n_ref) FROM rb) AS nr,
        |               (SELECT sum(n_cur) FROM cb) AS nc),
        |g AS (SELECT coalesce(rb.bin, cb.bin) AS bin,
        |        coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur, nr, nc
        |      FROM rb FULL JOIN cb ON rb.bin = cb.bin CROSS JOIN tot)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(n_ref AS BIGINT) AS n_ref,
        |  CAST(n_cur AS BIGINT) AS n_cur,
        |  round(((n_ref + 1.0) / (nr + 10.0) - (n_cur + 1.0) / (nc + 10.0))
        |      * ln(CAST((n_ref + 1) * (nc + 10) AS DOUBLE)
        |           / CAST((n_cur + 1) * (nr + 10) AS DOUBLE)) * 1000000 + 1e-9, 3)
        |    AS psi_micro
        |FROM g ORDER BY bin""".stripMargin,

    "q_l_diversity" ->
      """SELECT c_nationkey,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_div
        |FROM customer GROUP BY 1, 2
        |HAVING count(DISTINCT c_mktsegment) < 3
        |ORDER BY 1, 2""".stripMargin,

    // word-SET fingerprint census: sorted-distinct-word md5 — both
    // engines sort ASCII tokens bytewise, so the keys are identical
    "q_dup_census" ->
      """WITH h AS (
        |  SELECT source,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
        |                        ',')) AS h
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
        |  CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_dup_rows,
        |  CAST((1000000 * (count(*) - count(DISTINCT h)) + count(*) // 2)
        |       // count(*) AS BIGINT) AS dup_ppm
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_null_profile" ->
      """WITH a AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_et,
        |    count(DISTINCT event_type) AS nd_et,
        |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_uid,
        |    count(DISTINCT user_id) AS nd_uid,
        |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_val,
        |    count(DISTINCT value) AS nd_val,
        |    CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
        |    count(DISTINCT props) AS nd_props
        |  FROM events)
        |SELECT 'event_type' AS column_name, n, null_et AS n_null, nd_et AS n_distinct FROM a
        |UNION ALL SELECT 'props', n, null_props, nd_props FROM a
        |UNION ALL SELECT 'user_id', n, null_uid, nd_uid FROM a
        |UNION ALL SELECT 'value', n, null_val, nd_val FROM a
        |ORDER BY column_name""".stripMargin,

    "q_percent_change" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |l AS (SELECT month, rev, lag(rev) OVER (ORDER BY month) AS prev FROM m)
        |SELECT month, CAST(rev AS DOUBLE) AS revenue,
        |  round(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE) + 1e-9, 6) + 0.0 AS mom_pct
        |FROM l ORDER BY month""".stripMargin,

    "q_funnel_latency" ->
      """WITH u AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS fs,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS fp
        |  FROM events GROUP BY user_id),
        |lat AS (SELECT fp - fs AS latency_us FROM u
        |  WHERE fs IS NOT NULL AND fp IS NOT NULL AND fp >= fs)
        |SELECT count(*) AS n_converted,
        |  round(quantile_cont(latency_us, 0.25) + 1e-9, 4) AS p25_us,
        |  round(quantile_cont(latency_us, 0.50) + 1e-9, 4) AS p50_us,
        |  round(quantile_cont(latency_us, 0.75) + 1e-9, 4) AS p75_us
        |FROM lat""".stripMargin,

    "q_event_streaks" ->
      """WITH o AS (SELECT user_id, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |r AS (SELECT user_id, event_id, event_type,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |  FROM o),
        |g AS (SELECT user_id, run_id, event_type,
        |    count(*) AS len, min(event_id) AS first_event
        |  FROM r GROUP BY 1, 2, 3),
        |p AS (SELECT user_id, event_type, len, first_event,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, event_type, first_event) AS rn
        |  FROM g)
        |SELECT user_id, event_type AS streak_type, len AS streak_len, first_event
        |FROM p WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_two_hop" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |e0 AS (
        |  SELECT x.doc_id AS s, y.doc_id AS t
        |  FROM ids x JOIN ids y ON y.doc_id = x.doc_id + 1
        |  UNION ALL
        |  SELECT x.doc_id, y.doc_id
        |  FROM ids x JOIN ids y ON y.doc_id = x.doc_id + 2
        |  WHERE x.doc_id % 2 = 0),
        |und AS (SELECT s, t FROM e0 UNION SELECT t, s FROM e0),
        |two AS (SELECT DISTINCT a.s AS a, b.t AS c
        |  FROM und a JOIN und b ON a.t = b.s WHERE b.t <> a.s)
        |SELECT two.a, count(*) AS n_two_hop
        |FROM two LEFT JOIN und ON und.s = two.a AND und.t = two.c
        |WHERE und.s IS NULL
        |GROUP BY two.a ORDER BY two.a""".stripMargin,
    // degreeCap=8 > max degree 4 on this graph: capped census ≡ exact
    "q_two_hop_capped" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |e0 AS (
        |  SELECT x.doc_id AS s, y.doc_id AS t
        |  FROM ids x JOIN ids y ON y.doc_id = x.doc_id + 1
        |  UNION ALL
        |  SELECT x.doc_id, y.doc_id
        |  FROM ids x JOIN ids y ON y.doc_id = x.doc_id + 2
        |  WHERE x.doc_id % 2 = 0),
        |und AS (SELECT s, t FROM e0 UNION SELECT t, s FROM e0),
        |two AS (SELECT DISTINCT a.s AS a, b.t AS c
        |  FROM und a JOIN und b ON a.t = b.s WHERE b.t <> a.s)
        |SELECT two.a, count(*) AS n_two_hop
        |FROM two LEFT JOIN und ON und.s = two.a AND und.t = two.c
        |WHERE und.s IS NULL
        |GROUP BY two.a ORDER BY two.a""".stripMargin,

    "q_benford" ->
      """WITH o AS (SELECT regexp_extract(CAST(value AS VARCHAR), '[1-9]') AS digit,
        |    count(*) AS n
        |  FROM events WHERE value > 0 GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM o),
        |s AS (SELECT digit, n,
        |    round(CAST(n AS DOUBLE) / n_tot + 1e-9, 6) AS obs_share,
        |    round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) + 1e-9, 6) AS benford_share
        |  FROM o CROSS JOIN t)
        |SELECT digit, n, obs_share, benford_share,
        |  round(pow(obs_share - benford_share, 2) / benford_share + 1e-9, 6) AS chi2_term
        |FROM s ORDER BY digit""".stripMargin,

    "q_twap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |w AS (SELECT user_id, value,
        |    lead(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us AS dt_us
        |  FROM e)
        |SELECT user_id, count(*) AS n_obs, CAST(sum(dt_us) AS BIGINT) AS span_us,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,2)) * dt_us) AS DOUBLE)
        |        / sum(dt_us) + 1e-9, 6) AS twap
        |FROM w WHERE dt_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_interval_union" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) + 600000000 AS end_us FROM events),
        |f AS (SELECT user_id, event_id, ts_us, end_us,
        |    max(end_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
        |  FROM e),
        |g AS (SELECT user_id, event_id, ts_us, end_us,
        |    CASE WHEN prev_max_end IS NULL OR ts_us > prev_max_end
        |         THEN 1 ELSE 0 END AS ni
        |  FROM f),
        |h AS (SELECT user_id, ts_us, end_us,
        |    sum(ni) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM g),
        |i AS (SELECT user_id, island, min(ts_us) AS i_start, max(end_us) AS i_end
        |  FROM h GROUP BY user_id, island)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(i_end - i_start) AS BIGINT) AS covered_us
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin,

    // A-Res weighted sample: u = 52-bit integer from the first 13 md5
    // hex chars (hex-cast BIGINT here, conv(…,16,10) on the Spark side)
    // — both engines divide the SAME exact integers before the one ln
    "q_sample_weighted" ->
      """WITH keyed AS (
        |  SELECT doc_id, n_chars,
        |    ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
        |       / 4503599627370497.0) / n_chars AS k
        |  FROM documents)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
        |       round(k + 1e-9, 6) + 0 AS key6
        |FROM keyed ORDER BY k DESC, doc_id LIMIT 20""".stripMargin,

    "q_temperature_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
        |t AS (SELECT sum(n_l) AS n_tot FROM c),
        |wts AS (SELECT lang, n_l,
        |    CAST(round(sqrt(CAST(n_l AS DOUBLE) / n_tot) + 1e-15, 12) AS DECIMAL(16,12)) AS w
        |  FROM c CROSS JOIN t),
        |nrm AS (SELECT sum(w) AS w_sum FROM wts),
        |q AS (SELECT lang,
        |    CAST(floor(200 * (CAST(w AS DOUBLE) / CAST(w_sum AS DOUBLE)) + 0.5) AS BIGINT) AS quota
        |  FROM wts CROSS JOIN nrm),
        |r AS (SELECT d.doc_id, d.lang, q.quota,
        |    row_number() OVER (PARTITION BY d.lang
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
        |  FROM documents d JOIN q USING (lang))
        |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn, quota
        |FROM r WHERE rn <= quota ORDER BY doc_id""".stripMargin,

    "q_window_distinct" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(len(list_distinct(list(event_type) OVER (PARTITION BY user_id ORDER BY event_id
        |       ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))) AS BIGINT) AS distinct_types_10
        |FROM events ORDER BY event_id""".stripMargin,

    "q_abc_class" ->
      """WITH rev AS (SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT l_partkey, rev,
        |    sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(rev) OVER () AS tot
        |  FROM rev),
        |s AS (SELECT l_partkey, CAST(rev AS DOUBLE) AS revenue,
        |    round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) + 1e-9, 6) AS cum_share
        |  FROM c)
        |SELECT l_partkey, revenue, cum_share,
        |  CASE WHEN cum_share <= 0.80 THEN 'A'
        |       WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc
        |FROM s ORDER BY revenue DESC, l_partkey""".stripMargin,

    "q_window_median" ->
      """SELECT event_id, user_id, value,
        |  round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) + 1e-9, 4) AS med7
        |FROM events ORDER BY event_id""".stripMargin,

    // the t-digest runs in its exact (pre-compression) regime at this
    // frame width, so the plain interpolated-median oracle is hash-exact
    "q_window_median_wide" ->
      """SELECT event_id, user_id, value,
        |  round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN 50 PRECEDING AND 50 FOLLOWING) + 1e-9, 4) AS med101
        |FROM events ORDER BY event_id""".stripMargin,

    "q_ccnet_buckets" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |vocab AS (SELECT term, count(*) AS cnt FROM terms GROUP BY 1),
        |total AS (SELECT count(*) AS total FROM terms),
        |scored AS (
        |  SELECT t.doc_id,
        |    round(-CAST(sum(CAST(round(ln(CAST(v.cnt AS DOUBLE) / CAST(tt.total AS DOUBLE))
        |                               + 1e-9, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |          / count(*) + 1e-9, 6) AS nll
        |  FROM terms t JOIN vocab v USING (term) CROSS JOIN total tt
        |  GROUP BY t.doc_id),
        |cuts AS (SELECT quantile_cont(nll, [0.3333333333333333, 0.6666666666666666]) AS cuts
        |  FROM scored),
        |b AS (SELECT s.doc_id, s.nll,
        |    CASE WHEN s.nll <= cuts.cuts[1] THEN 'head'
        |         WHEN s.nll <= cuts.cuts[2] THEN 'middle'
        |         ELSE 'tail' END AS bucket
        |  FROM scored s CROSS JOIN cuts)
        |SELECT bucket, count(*) AS n_docs,
        |  round(min(nll) + 1e-9, 6) AS nll_min,
        |  round(max(nll) + 1e-9, 6) AS nll_max,
        |  round(CAST(sum(CAST(nll AS DECIMAL(18,6))) AS DOUBLE) / count(*) + 1e-9, 6) AS nll_mean
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_quality_perplexity" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |vocab AS (SELECT term, count(*) AS cnt FROM terms GROUP BY 1),
        |total AS (SELECT count(*) AS total FROM terms),
        |scored AS (
        |  SELECT t.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_tokens,
        |    round(-CAST(sum(CAST(round(ln(CAST(v.cnt AS DOUBLE) / CAST(tt.total AS DOUBLE))
        |                               + 1e-9, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |          / count(*) + 1e-9, 6) AS nll
        |  FROM terms t JOIN vocab v USING (term) CROSS JOIN total tt
        |  GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens, nll, (nll <= 3.55) AS keep
        |FROM scored ORDER BY doc_id""".stripMargin,
    "q_bm25" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
        |stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
        |qt AS (SELECT * FROM terms WHERE term IN ('the', 'data', 'model')),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM qt GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM qt GROUP BY 1)
        |SELECT doc_id,
        |  round(CAST(sum(CAST(round(
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
        |      (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) + 1e-9, 6)
        |    AS DECIMAL(18,6))) AS DOUBLE) + 1e-9, 6) AS bm25,
        |  CAST(count(*) AS BIGINT) AS n_terms
        |FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin,

    "q_text_normalize" ->
      """SELECT doc_id,
        |  md5(lower(trim(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'),
        |                                ' +', ' ', 'g')))) AS norm_key,
        |  CAST(length(lower(trim(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'),
        |                                        ' +', ' ', 'g')))) AS BIGINT) AS norm_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    // both engines implement Unicode NFC (java.text.Normalizer /
    // utf8proc); the planted canary pair (-1 decomposed, -2 precomposed)
    // must share nfc_key, which makes the gate non-vacuous on the
    // all-ASCII fixture corpus. Canary literals are single-sourced from
    // Llm.unicodeCanaries so the two sides can never drift.
    "q_text_nfc" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT * FROM (VALUES ${unicodeCanaryValues}) v(doc_id, text))
         |SELECT doc_id, text = nfc_normalize(text) AS is_nfc,
         |  CAST(length(text) AS BIGINT) AS n_cp,
         |  CAST(length(nfc_normalize(text)) AS BIGINT) AS n_cp_nfc,
         |  md5(nfc_normalize(text)) AS nfc_key
         |FROM docs ORDER BY doc_id""".stripMargin,

    // RE2 script classes mirror the Java \p{IsScript} classes; counts
    // are exact integers and the ppm share is integer division
    "q_script_detect" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT * FROM (VALUES ${unicodeCanaryValues}) v(doc_id, text)),
         |c AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[\\p{Latin}]')) AS BIGINT) AS n_latin,
         |  CAST(len(regexp_extract_all(text, '[\\p{Cyrillic}]')) AS BIGINT) AS n_cyrillic,
         |  CAST(len(regexp_extract_all(text, '[\\p{Han}]')) AS BIGINT) AS n_han,
         |  CAST(len(regexp_extract_all(text, '[\\p{Hiragana}\\p{Katakana}]')) AS BIGINT) AS n_kana
         |FROM docs)
         |SELECT doc_id, n_latin, n_cyrillic, n_han, n_kana,
         |  CASE WHEN greatest(n_latin, n_cyrillic, n_han, n_kana) = 0 THEN 'none'
         |       WHEN n_latin = greatest(n_latin, n_cyrillic, n_han, n_kana) THEN 'latin'
         |       WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_han, n_kana) THEN 'cyrillic'
         |       WHEN n_han = greatest(n_latin, n_cyrillic, n_han, n_kana) THEN 'han'
         |       ELSE 'kana' END AS dominant,
         |  CASE WHEN n_latin + n_cyrillic + n_han + n_kana > 0
         |       THEN CAST(greatest(n_latin, n_cyrillic, n_han, n_kana) * 1000000
         |                 // (n_latin + n_cyrillic + n_han + n_kana) AS BIGINT)
         |       ELSE 0 END AS dom_share_ppm
         |FROM c ORDER BY doc_id""".stripMargin,
    "q_dedup_incremental" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    lower(trim(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'),
        |                              ' +', ' ', 'g'))) AS k
        |  FROM documents)
        |SELECT b.doc_id,
        |  (NOT EXISTS (SELECT 1 FROM n c WHERE c.doc_id < 250 AND c.k = b.k)
        |   AND NOT EXISTS (SELECT 1 FROM n b2
        |                   WHERE b2.doc_id >= 250 AND b2.doc_id < b.doc_id
        |                     AND b2.k = b.k)) AS keep
        |FROM n b WHERE b.doc_id >= 250 ORDER BY b.doc_id""".stripMargin,

    "q_join_right" ->
      """SELECT p_partkey, count(l_orderkey) AS li_cnt,
        |  coalesce(sum(l_quantity), 0.0) AS qty
        |FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin,

    "q_join_full" ->
      """SELECT coalesce(c.nk, s.nk) AS nk,
        |  coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON c.nk = s.nk
        |ORDER BY nk""".stripMargin,

    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_discount), 6) AS cov_qd,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  round(median(l_quantity), 4) AS med_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_collect" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS big_orders,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |  count(*) AS n
        |FROM orders WHERE o_totalprice > 450000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q1ish" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
        |  CAST(sum(round(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)), 4)) AS DOUBLE) AS sum_disc,
        |  CAST(sum(round(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2)), 4)) AS DOUBLE) AS sum_charge,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)/count(*) + 1e-9, 4) AS avg_qty,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)/count(*) + 1e-9, 4) AS avg_disc,
        |  count(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_stats2" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
        |    CAST(sum(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
        |    CAST(sum(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
        |    CAST(sum(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round(s1/n + 1e-9, 4) AS mean_qty,
        |  round((s2/n - (s1/n)*(s1/n)) + 1e-9, 4) AS var_pop,
        |  round((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n)) / pow(s2/n - (s1/n)*(s1/n), 1.5) + 1e-9, 4) AS skew_pop,
        |  round((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n) - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n)) / pow(s2/n - (s1/n)*(s1/n), 2) - 3 + 1e-9, 4) AS kurt_pop
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q_quality_signals" ->
      """WITH wc AS (
        |  SELECT doc_id, word, count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY doc_id, word
        |), per AS (
        |  SELECT doc_id, sum(cnt) AS n_words, count(*) AS n_distinct, max(cnt) AS top_cnt
        |  FROM wc GROUP BY doc_id)
        |SELECT doc_id,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  round(1.0 - CAST(n_distinct AS DOUBLE)/n_words + 1e-9, 4) AS dup_frac,
        |  round(CAST(top_cnt AS DOUBLE)/n_words + 1e-9, 4) AS top_frac
        |FROM per ORDER BY doc_id""".stripMargin,

    // rtrim before string_split: the native wordNGrams kernel uses Java
    // split semantics (trailing empty tokens dropped, leading/interior
    // kept), so trailing-space text would otherwise give DuckDB one
    // phantom bigram per trailing space (same below for q_ngram_topk)
    "q_quality_ngram_rep" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(rtrim(text, ' '), ' '))),
        |    i -> string_split(rtrim(text, ' '), ' ')[i] || ' ' || string_split(rtrim(text, ' '), ' ')[i+1])) AS g
        |  FROM documents),
        |c AS (SELECT doc_id, g, count(*) AS cnt FROM g GROUP BY doc_id, g)
        |SELECT doc_id,
        |  CAST(sum(cnt) AS BIGINT) AS n_big,
        |  round(CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
        |        / sum(cnt) + 1e-9, 4) AS dup_big_frac,
        |  round(CAST(sum(CASE WHEN cnt > 1 THEN len(g) * cnt ELSE 0 END) AS DOUBLE)
        |        / sum(len(g) * cnt) + 1e-9, 4) AS dup_char_frac,
        |  CAST(max(cnt) AS BIGINT) AS top_cnt
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_ngram_topk" ->
      """WITH b AS (
        |  SELECT unnest(list_transform(range(1, len(string_split(rtrim(text, ' '), ' '))),
        |    i -> string_split(rtrim(text, ' '), ' ')[i] || ' ' || string_split(rtrim(text, ' '), ' ')[i+1])) AS bigram
        |  FROM documents)
        |SELECT bigram, count(*) AS cnt FROM b GROUP BY bigram
        |ORDER BY cnt DESC, bigram LIMIT 50""".stripMargin,

    "q_text_redact" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]+', '<NUM>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT) AS n_hits
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_window_firstlast" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_window_moving" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / count(*) OVER w AS moving_avg,
        |  min(o_totalprice) OVER w AS moving_min,
        |  max(o_totalprice) OVER w AS moving_max
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "q_struct_funcs" ->
      """SELECT p_partkey,
        |  {'brand': p_brand, 'sz': p_size}.brand AS brand,
        |  CAST({'brand': p_brand, 'sz': p_size}.sz + 1 AS BIGINT) AS sz_plus,
        |  CAST({'inner': {'brand': p_brand, 'sz': p_size}, 't': p_type}.inner.sz AS BIGINT) AS sz_inner,
        |  {'inner': {'brand': p_brand, 'sz': p_size}, 't': p_type}.t AS t
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_sample_hash" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '29'
        |ORDER BY o_orderkey""".stripMargin,

    "q_sample_systematic" ->
      """WITH h AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    md5(CAST(o_orderkey AS VARCHAR)) AS h
        |  FROM orders),
        |p AS (SELECT *, row_number() OVER (ORDER BY h, o_orderkey) AS pos FROM h)
        |SELECT CAST(pos AS BIGINT) AS pos, o_orderkey, o_custkey, o_totalprice
        |FROM p WHERE pos % 10 = 0 ORDER BY pos""".stripMargin,

    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |                             / count(o_totalprice) FROM orders) * 2
        |ORDER BY o_orderkey""".stripMargin,

    "q_source_orc" ->
      """SELECT * FROM supplier ORDER BY s_suppkey""".stripMargin,

    "q_source_avro" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    "q_source_jdbc" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |WHERE c_acctbal > 0 AND c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,

    "q_interval_prorate" ->
      """WITH spans AS (
        |  SELECT user_id,
        |    min(epoch_ns(ts)) // 1000 AS a_us,
        |    max(epoch_ns(ts)) // 1000 AS b_us,
        |    CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END
        |      AS DECIMAL(18,4))) AS DOUBLE) AS value
        |  FROM events GROUP BY user_id
        |  HAVING max(epoch_ns(ts)) > min(epoch_ns(ts))),
        |days AS (
        |  SELECT user_id, value, a_us, b_us,
        |    unnest(generate_series(a_us // 86400000000, b_us // 86400000000)) AS day
        |  FROM spans),
        |ol AS (
        |  SELECT day, value, a_us, b_us,
        |    least(b_us, (day + 1) * 86400000000) -
        |    greatest(a_us, day * 86400000000) AS overlap_us
        |  FROM days)
        |SELECT day, count(*) AS n_user_days,
        |  CAST(sum(CAST(round(value * CAST(overlap_us AS DOUBLE)
        |      / CAST(b_us - a_us AS DOUBLE) * 10000 + 1e-9, 0) AS BIGINT))
        |    AS BIGINT) AS revenue_4
        |FROM ol WHERE overlap_us > 0
        |GROUP BY day ORDER BY day""".stripMargin,

    "q_key_skew" ->
      """WITH kc AS (
        |  SELECT event_type, user_id, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  count(*) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  max(cnt) AS max_key_rows,
        |  round(quantile_cont(cnt, 0.50), 4) AS p50_key_rows,
        |  round(quantile_cont(cnt, 0.99), 4) AS p99_key_rows,
        |  CAST(max(cnt) * 1000000 // sum(cnt) AS BIGINT) AS max_share_ppm
        |FROM kc GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_cdc_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey AS key, o_totalprice AS value
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |log AS (
        |  SELECT event_id % 4000 AS key,
        |    CASE WHEN event_id % 11 = 0 THEN 'D'
        |         WHEN event_id % 11 < 6 THEN 'U' ELSE 'I' END AS op,
        |    value AS new_value, epoch_ns(ts) AS seq, event_id
        |  FROM events),
        |last_op AS (
        |  SELECT key, op, new_value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY key
        |      ORDER BY seq DESC, event_id DESC) AS rn FROM log)
        |  WHERE rn = 1)
        |SELECT key,
        |  CASE WHEN op IS NOT NULL THEN new_value ELSE value END AS value,
        |  coalesce(op, 'base') AS last_op
        |FROM base FULL OUTER JOIN last_op USING (key)
        |WHERE op IS NULL OR op <> 'D'
        |ORDER BY key""".stripMargin,

    "q_rfm" ->
      """WITH cust AS (
        |  SELECT o_custkey, max(o_orderdate) AS recency,
        |    count(*) AS frequency,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        |  FROM orders GROUP BY 1),
        |q AS (SELECT monetary,
        |    CAST(ntile(5) OVER (ORDER BY recency DESC, o_custkey) AS BIGINT) AS r_q,
        |    CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_q,
        |    CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT) AS m_q
        |  FROM cust)
        |SELECT r_q, f_q, m_q, count(*) AS n_customers,
        |  CAST(sum(monetary) AS DOUBLE) AS segment_revenue
        |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_attribution_linear" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value, epoch_ns(ts) AS ts_ns
        |  FROM events),
        |c AS (SELECT *,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS cnt_click,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS cnt_view,
        |    count(CASE WHEN event_type = 'error' THEN 1 END) OVER w AS cnt_error,
        |    count(CASE WHEN event_type = 'signup' THEN 1 END) OVER w AS cnt_signup
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p AS (SELECT *, cnt_click + cnt_view + cnt_error + cnt_signup AS n_touch
        |  FROM c WHERE event_type = 'purchase'),
        |credits AS (
        |  SELECT 'click' AS channel, CAST(round(value * CAST(cnt_click AS DOUBLE)
        |      / CAST(n_touch AS DOUBLE) * 10000 + 1e-9, 0) AS BIGINT) AS credit_4
        |    FROM p WHERE n_touch > 0 AND cnt_click > 0
        |  UNION ALL
        |  SELECT 'view', CAST(round(value * CAST(cnt_view AS DOUBLE)
        |      / CAST(n_touch AS DOUBLE) * 10000 + 1e-9, 0) AS BIGINT)
        |    FROM p WHERE n_touch > 0 AND cnt_view > 0
        |  UNION ALL
        |  SELECT 'error', CAST(round(value * CAST(cnt_error AS DOUBLE)
        |      / CAST(n_touch AS DOUBLE) * 10000 + 1e-9, 0) AS BIGINT)
        |    FROM p WHERE n_touch > 0 AND cnt_error > 0
        |  UNION ALL
        |  SELECT 'signup', CAST(round(value * CAST(cnt_signup AS DOUBLE)
        |      / CAST(n_touch AS DOUBLE) * 10000 + 1e-9, 0) AS BIGINT)
        |    FROM p WHERE n_touch > 0 AND cnt_signup > 0
        |  UNION ALL
        |  SELECT 'direct', CAST(round(value * 10000 + 1e-9, 0) AS BIGINT)
        |    FROM p WHERE n_touch = 0)
        |SELECT channel, count(*) AS n_credits,
        |  CAST(sum(credit_4) AS BIGINT) AS revenue_4
        |FROM credits GROUP BY channel HAVING sum(credit_4) > 0
        |ORDER BY channel""".stripMargin,

    "q_cohort_ltv" ->
      """WITH e AS (
        |  SELECT user_id, event_type, value,
        |    epoch_ns(ts) // 1000 // 604800000000 AS week
        |  FROM events),
        |fs AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1),
        |weekly AS (
        |  SELECT cohort_week, e.week - cohort_week AS weeks_since,
        |    sum(CAST(value AS DECIMAL(18,4))) AS wrev
        |  FROM e JOIN fs USING (user_id)
        |  WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT cohort_week, weeks_since,
        |  CAST(wrev AS DOUBLE) AS weekly_revenue,
        |  CAST(sum(wrev) OVER (PARTITION BY cohort_week ORDER BY weeks_since
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_ltv
        |FROM weekly ORDER BY cohort_week, weeks_since""".stripMargin,

    "q_event_gaps" ->
      """WITH g AS (
        |  SELECT event_type,
        |    (epoch_ns(ts) - lag(epoch_ns(ts), 1) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY epoch_ns(ts), event_id)) // 1000 AS gap_us
        |  FROM events)
        |SELECT event_type, count(*) AS n_gaps,
        |  min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
        |  CAST(sum(gap_us) // count(*) AS BIGINT) AS mean_gap_us_floor
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_log_odds" ->
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
        |counts AS (
        |  SELECT word,
        |    count(CASE WHEN source = 'src0' THEN 1 END) AS y_i,
        |    count(CASE WHEN source <> 'src0' THEN 1 END) AS y_j
        |  FROM w GROUP BY word HAVING count(*) >= 20),
        |tot AS (
        |  SELECT count(CASE WHEN source = 'src0' THEN 1 END) AS n_i,
        |    count(CASE WHEN source <> 'src0' THEN 1 END) AS n_j
        |  FROM w),
        |m AS (SELECT word, y_i, y_j,
        |    1000.0 * (CAST(y_i + y_j AS DOUBLE) / CAST(n_i + n_j AS DOUBLE)) AS aw,
        |    CAST(n_i AS DOUBLE) AS ni, CAST(n_j AS DOUBLE) AS nj
        |  FROM counts, tot),
        |z AS (SELECT word, y_i, y_j,
        |    (ln((CAST(y_i AS DOUBLE) + aw) / (ni + 1000.0 - CAST(y_i AS DOUBLE) - aw))
        |     - ln((CAST(y_j AS DOUBLE) + aw) / (nj + 1000.0 - CAST(y_j AS DOUBLE) - aw)))
        |    / sqrt(1.0 / (CAST(y_i AS DOUBLE) + aw) + 1.0 / (CAST(y_j AS DOUBLE) + aw))
        |      AS zval
        |  FROM m)
        |SELECT word, y_i, y_j,
        |  CAST(round(zval * 1000000 + 1e-9, 0) AS BIGINT) AS z_micro
        |FROM z ORDER BY word""".stripMargin,

    "q_weighted_median" ->
      """WITH v AS (
        |  SELECT source, n_chars,
        |    sum(len(string_split(text, ' '))) AS wsum
        |  FROM documents GROUP BY 1, 2),
        |c AS (SELECT source, n_chars,
        |    sum(wsum) OVER (PARTITION BY source ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(wsum) OVER (PARTITION BY source) AS w_total
        |  FROM v)
        |SELECT source, min(n_chars) AS weighted_median_chars,
        |  CAST(max(w_total) AS BIGINT) AS total_tokens
        |FROM c WHERE cum * 2 >= w_total
        |GROUP BY source ORDER BY source""".stripMargin,

    "q_drift_wasserstein" ->
      """WITH bv AS (
        |  SELECT n_chars,
        |    count(CASE WHEN source = 'src0' THEN 1 END) AS ca,
        |    count(CASE WHEN source <> 'src0' THEN 1 END) AS cb
        |  FROM documents GROUP BY 1),
        |t AS (SELECT count(CASE WHEN source = 'src0' THEN 1 END) AS na,
        |    count(CASE WHEN source <> 'src0' THEN 1 END) AS nb
        |  FROM documents),
        |c AS (SELECT n_chars,
        |    sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb,
        |    lead(n_chars, 1) OVER (ORDER BY n_chars) - n_chars AS gap
        |  FROM bv
        |  WINDOW w AS (ORDER BY n_chars
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT CAST(sum(abs(cuma * nb - cumb * na) * gap) AS BIGINT) AS w1_numer,
        |  CAST(max(na * nb) AS BIGINT) AS w1_denom
        |FROM c CROSS JOIN t WHERE gap IS NOT NULL""".stripMargin,

    "q_quantile_norm" ->
      """WITH sv AS (
        |  SELECT source, n_chars, count(*) AS cnt FROM documents GROUP BY 1, 2),
        |sc AS (SELECT source, n_chars,
        |    sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY source) AS n_src
        |  FROM sv),
        |gv AS (SELECT n_chars, count(*) AS gcnt FROM documents GROUP BY 1),
        |gc AS (SELECT n_chars AS gval,
        |    sum(gcnt) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gcum,
        |    sum(gcnt) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - gcnt AS gprev
        |  FROM gv),
        |n AS (SELECT count(*) AS n_all FROM documents),
        |mapped AS (
        |  SELECT sc.source, sc.n_chars, gc.gval AS norm_chars
        |  FROM sc CROSS JOIN n
        |  JOIN gc ON ((sc.cum * n.n_all + sc.n_src - 1) // sc.n_src) > gc.gprev
        |         AND ((sc.cum * n.n_all + sc.n_src - 1) // sc.n_src) <= gc.gcum)
        |SELECT d.doc_id, d.source, d.n_chars, m.norm_chars
        |FROM documents d JOIN mapped m USING (source, n_chars)
        |ORDER BY d.doc_id""".stripMargin,

    "q_last_n" ->
      """WITH r AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id,
        |  array_to_string(list(event_id ORDER BY ts_ns ASC, event_id ASC), ',')
        |    AS last_event_ids
        |FROM r WHERE rn <= 3
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_contamination" ->
      """WITH g AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(range(1, len(string_split(text, ' ')) - 3),
        |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' ||
        |           string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3] || ' ' ||
        |           string_split(text, ' ')[i+4])) AS gram
        |  FROM documents
        |), bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |   corpus AS (SELECT DISTINCT doc_id, gram FROM g WHERE source <> 'src0')
        |SELECT doc_id, count(*) AS n_shared
        |FROM corpus JOIN bench USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_dsir_weights" ->
      """WITH terms AS (SELECT doc_id, lang,
        |    unnest(string_split(text, ' ')) AS term FROM documents),
        |vocab AS (SELECT term, count(*) AS cnt_s,
        |    count(*) FILTER (WHERE lang = 'en') AS cnt_t
        |  FROM terms GROUP BY term),
        |tot AS (SELECT sum(cnt_s) AS tot_s, sum(cnt_t) AS tot_t,
        |    count(*) AS v FROM vocab),
        |lr AS (SELECT term,
        |    CAST(round(ln(CAST(cnt_t + 1 AS DOUBLE) / CAST(tot_t + v AS DOUBLE))
        |             - ln(CAST(cnt_s + 1 AS DOUBLE) / CAST(tot_s + v AS DOUBLE))
        |             + 1e-9, 6) AS DECIMAL(18,6)) AS lr
        |  FROM vocab CROSS JOIN tot),
        |agg AS (SELECT t.doc_id, count(*) AS n_tok, sum(l.lr) AS slr
        |  FROM terms t JOIN lr l USING (term) GROUP BY t.doc_id)
        |SELECT a.doc_id, d.lang, a.n_tok,
        |  round(CAST(a.slr AS DOUBLE) / a.n_tok + 1e-9, 6) + 0.0 AS dsir_lr
        |FROM agg a JOIN documents d USING (doc_id) ORDER BY a.doc_id""".stripMargin,

    // same LR CTEs as q_dsir_weights; the Gumbel key rides the A-Res
    // sampler's md5-uniform (q_sample_weighted's u52 form)
    "q_dsir_resample" ->
      """WITH terms AS (SELECT doc_id, lang,
        |    unnest(string_split(text, ' ')) AS term FROM documents),
        |vocab AS (SELECT term, count(*) AS cnt_s,
        |    count(*) FILTER (WHERE lang = 'en') AS cnt_t
        |  FROM terms GROUP BY term),
        |tot AS (SELECT sum(cnt_s) AS tot_s, sum(cnt_t) AS tot_t,
        |    count(*) AS v FROM vocab),
        |lr AS (SELECT term,
        |    CAST(round(ln(CAST(cnt_t + 1 AS DOUBLE) / CAST(tot_t + v AS DOUBLE))
        |             - ln(CAST(cnt_s + 1 AS DOUBLE) / CAST(tot_s + v AS DOUBLE))
        |             + 1e-9, 6) AS DECIMAL(18,6)) AS lr
        |  FROM vocab CROSS JOIN tot),
        |agg AS (SELECT t.doc_id, count(*) AS n_tok, sum(l.lr) AS slr
        |  FROM terms t JOIN lr l USING (term) GROUP BY t.doc_id),
        |keyed AS (SELECT a.doc_id, d.lang, a.n_tok,
        |    CAST(a.slr AS DOUBLE) +
        |      -ln(-ln((('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
        |              / 4503599627370497.0)) AS k
        |  FROM agg a JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
        |  round(k + 1e-9, 6) AS gkey6
        |FROM keyed ORDER BY k DESC, doc_id LIMIT 50""".stripMargin,

    // deterministic Poisson(1) replicate weights from md5(doc_id:b);
    // CDF thresholds are pinned literals shared with the Spark gate
    "q_eval_bootstrap" ->
      """WITH reps AS (
        |  SELECT d.source, d.n_chars, g.b,
        |    ((('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(g.b AS VARCHAR)), 1, 13))::BIGINT + 1)
        |     / 4503599627370497.0) AS u
        |  FROM documents d, (SELECT unnest(generate_series(0, 31)) AS b) g),
        |wk AS (SELECT source, b, n_chars,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.73575888234288466 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3
        |         WHEN u < 0.9963401531726563 THEN 4
        |         WHEN u < 0.9994058151824183 THEN 5
        |         WHEN u < 0.999916758850712 THEN 6
        |         WHEN u < 0.9999897508033254 THEN 7
        |         ELSE 8 END AS k
        |  FROM reps),
        |m AS (SELECT source, b,
        |    CAST(round(CAST(sum(k * n_chars) AS DOUBLE) / CAST(sum(k) AS DOUBLE)
        |               + 1e-9, 6) AS DECIMAL(18,6)) AS m6
        |  FROM wk GROUP BY 1, 2 HAVING sum(k) > 0)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_reps,
        |  round(CAST(sum(m6) AS DOUBLE) / count(*) + 1e-9, 4) AS boot_mean,
        |  round(quantile_cont(CAST(m6 AS DOUBLE), 0.05) + 1e-9, 4) AS ci_lo,
        |  round(quantile_cont(CAST(m6 AS DOUBLE), 0.95) + 1e-9, 4) AS ci_hi
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    "q_join_dims" ->
      """SELECT r_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_time_series" ->
      """WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
        |                  max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
        |axis AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b),
        |daily AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
        |          FROM orders GROUP BY 1)
        |SELECT CAST(axis.day AS TIMESTAMP) AS day, coalesce(daily.n, 0) AS n
        |FROM axis LEFT JOIN daily ON CAST(axis.day AS DATE) = daily.day
        |ORDER BY day""".stripMargin,

    "q_na_fill" ->
      """SELECT c_custkey, coalesce(n_orders, 0) AS n_orders,
        |  coalesce(max_spend, 0.0) AS max_spend,
        |  n_orders IS NOT NULL AS has_orders
        |FROM customer LEFT JOIN
        |  (SELECT o_custkey, count(*) AS n_orders, max(o_totalprice) AS max_spend
        |   FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_upsert" ->
      """SELECT o_orderkey, o_totalprice, src FROM (
        |  SELECT o_orderkey, o_totalprice, 'base' AS src FROM orders
        |  WHERE o_orderkey % 10 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 1.1, 'update' FROM orders
        |  WHERE o_orderkey % 10 = 0)
        |ORDER BY o_orderkey""".stripMargin,

    "q_funnel" ->
      """WITH st AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup
        |  FROM events GROUP BY user_id),
        |pc AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
        |  FROM events e JOIN st ON e.user_id = st.user_id
        |  WHERE st.t_signup IS NOT NULL AND e.event_type = 'click'
        |    AND epoch_us(e.ts) > st.t_signup
        |  GROUP BY e.user_id),
        |pu AS (
        |  SELECT DISTINCT e.user_id FROM events e JOIN pc ON e.user_id = pc.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > pc.t_click)
        |SELECT count(*) AS n_signup, count(pc.user_id) AS n_click_after,
        |  count(pu.user_id) AS n_purchase_after
        |FROM st LEFT JOIN pc ON st.user_id = pc.user_id
        |        LEFT JOIN pu ON st.user_id = pu.user_id
        |WHERE st.t_signup IS NOT NULL""".stripMargin,

    "q_retention" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
        |fs AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id)
        |SELECT fs.cohort_week, ev.week - fs.cohort_week AS weeks_since,
        |  count(DISTINCT ev.user_id) AS active_users
        |FROM ev JOIN fs ON ev.user_id = fs.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_dedup_edit" ->
      """SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  CAST(levenshtein(substring(a.text, 1, 80), substring(b.text, 1, 80)) AS BIGINT) AS edit_dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY id1""".stripMargin,

    "q_agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_snapshot_diff" ->
      """WITH a AS (SELECT event_id, value AS value_a FROM events WHERE event_id % 7 <> 0),
        |b AS (SELECT event_id,
        |    value + CASE WHEN event_id % 3 = 0 THEN 10.0 ELSE 0.0 END AS value_b
        |  FROM events WHERE event_id % 5 <> 0),
        |f AS (SELECT coalesce(a.event_id, b.event_id) AS event_id, value_a, value_b
        |  FROM a FULL OUTER JOIN b ON a.event_id = b.event_id)
        |SELECT event_id,
        |  CASE WHEN value_a IS NULL THEN 'added'
        |       WHEN value_b IS NULL THEN 'removed'
        |       ELSE 'changed' END AS status,
        |  value_a, value_b
        |FROM f
        |WHERE value_a IS NULL OR value_b IS NULL OR value_a <> value_b
        |ORDER BY event_id""".stripMargin,

    "q_share_of_total" ->
      """WITH a AS (SELECT l_returnflag, l_linestatus,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, CAST(rev AS DOUBLE) AS revenue,
        |  round(CAST(rev AS DOUBLE) /
        |        CAST(sum(rev) OVER (PARTITION BY l_returnflag) AS DOUBLE) + 1e-9, 6) AS share
        |FROM a ORDER BY 1, 2""".stripMargin,

    "q_word_pmi" ->
      """WITH dw AS (SELECT doc_id,
        |    unnest(list_distinct(string_split(text, ' '))) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS nw FROM dw GROUP BY w),
        |tot AS (SELECT count(*) AS n_docs FROM documents),
        |p AS (SELECT a.w AS w1, b.w AS w2, count(*) AS n12
        |  FROM dw a JOIN dw b USING (doc_id) WHERE a.w < b.w
        |  GROUP BY 1, 2 HAVING count(*) >= 50)
        |SELECT w1, w2, n12,
        |  round(ln(CAST(n12 AS DOUBLE) * n_docs / (c1.nw * c2.nw)) + 1e-9, 6) + 0.0 AS pmi
        |FROM p JOIN wc c1 ON c1.w = w1 JOIN wc c2 ON c2.w = w2 CROSS JOIN tot
        |ORDER BY w1, w2""".stripMargin,

    "q_sample_group" ->
      """SELECT event_type, rn, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY md5(event_type || ':' || CAST(event_id AS VARCHAR)), event_id) AS rn
        |  FROM events)
        |WHERE rn <= 20 ORDER BY event_type, rn""".stripMargin,

    "q_incr_rollup" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_split_temporal" ->
      """SELECT split, count(*) AS n, min(event_id) AS min_id, max(event_id) AS max_id
        |FROM (SELECT event_id,
        |        CASE WHEN ts < TIMESTAMP '2024-01-18' THEN 'train'
        |             WHEN ts >= TIMESTAMP '2024-01-20' THEN 'test'
        |             ELSE 'embargo' END AS split
        |      FROM events)
        |GROUP BY split ORDER BY split""".stripMargin,

    // entropy terms rounded to micro-nats then integer-summed (the
    // q_entropy dsum convention); percentiles via quantile_cont
    "q_corpus_card" ->
      """WITH g AS (
        |  SELECT source, lang, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    md5(lower(trim(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'),
        |                                  ' +', ' ', 'g')))) AS k
        |  FROM documents),
        |base AS (
        |  SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |    round(quantile_cont(n_chars, 0.5) + 1e-9, 1) AS p50_chars,
        |    round(quantile_cont(n_chars, 0.95) + 1e-9, 1) AS p95_chars
        |  FROM g GROUP BY source),
        |dups AS (
        |  SELECT source, CAST(sum(c) - count(*) AS BIGINT) AS n_dups
        |  FROM (SELECT source, k, count(*) AS c FROM g GROUP BY source, k)
        |  GROUP BY source),
        |ent AS (
        |  SELECT source,
        |    CAST(sum(CAST(round(-p * ln(p) * 1000000 + 1e-9, 0) AS BIGINT)) AS BIGINT)
        |      AS lang_entropy_micro
        |  FROM (SELECT source,
        |          CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY source) AS p
        |        FROM (SELECT source, lang, count(*) AS c FROM g GROUP BY source, lang))
        |  GROUP BY source)
        |SELECT source, n_docs, n_tokens, p50_chars, p95_chars, n_dups, lang_entropy_micro
        |FROM base JOIN dups USING (source) JOIN ent USING (source)
        |ORDER BY source""".stripMargin,

    // Neyman allocation: variance numerators exact in HUGEINT, S_h
    // enters only as a rounded micro-unit integer, allocation is pure
    // integer floor + largest-remainder — engine-exact end to end
    "q_sample_neyman" ->
      """WITH st AS (
        |  SELECT source, count(*)::HUGEINT AS n,
        |    sum(n_chars::HUGEINT) AS s1, sum((n_chars::HUGEINT) * (n_chars::HUGEINT)) AS s2
        |  FROM documents GROUP BY source),
        |wv AS (
        |  SELECT source, n,
        |    n * (CASE WHEN n > 1
        |      THEN CAST(round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |             / CAST(n * (n - 1) AS DOUBLE)) * 1000000 + 1e-9) AS HUGEINT)
        |      ELSE 0::HUGEINT END) AS w
        |  FROM st),
        |tot AS (SELECT sum(w) AS bigw FROM wv),
        |base AS (
        |  SELECT source, n, (200 * w) // bigw AS base, (200 * w) % bigw AS rem
        |  FROM wv CROSS JOIN tot),
        |def AS (SELECT 200 - sum(base) AS deficit FROM base),
        |alloc AS (
        |  SELECT source,
        |    CAST(least(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
        |                           <= deficit THEN 1 ELSE 0 END, n) AS BIGINT) AS n_h
        |  FROM base CROSS JOIN def),
        |d AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT d.source, CAST(rn AS BIGINT) AS rn, doc_id, n_chars, n_h
        |FROM d JOIN alloc USING (source)
        |WHERE rn <= n_h ORDER BY source, rn""".stripMargin,

    "q_join_setsim" ->
      """WITH w AS (SELECT doc_id,
        |    unnest(list_distinct(string_split(text, ' '))) AS w
        |  FROM documents WHERE source = 'src0'),
        |n AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |  FROM w a JOIN w b USING (w) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |j AS (SELECT id1, id2, inter, na.n + nb.n - inter AS uni
        |  FROM inter JOIN n na ON na.doc_id = id1 JOIN n nb ON nb.doc_id = id2)
        |SELECT id1, id2, inter, uni,
        |  round(CAST(inter AS DOUBLE) / uni + 1e-9, 6) AS jac
        |FROM j WHERE CAST(inter AS DOUBLE) / uni >= 0.9
        |ORDER BY id1, id2""".stripMargin,

    "q_outlier_mad" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |wm AS (SELECT e.event_id, e.event_type, e.value, m.med
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM wm GROUP BY event_type)
        |SELECT w.event_id, w.event_type, w.value,
        |  round(w.med + 1e-9, 4) AS med,
        |  round(d.mad + 1e-9, 4) AS mad,
        |  round(abs(w.value - w.med) / (d.mad * 1.4826) + 1e-9, 4) AS rz
        |FROM wm w JOIN mad d USING (event_type)
        |WHERE round(abs(w.value - w.med) / (d.mad * 1.4826) + 1e-9, 4) > 3.0
        |ORDER BY event_id""".stripMargin,

    "q_feature_bins" ->
      """WITH cuts AS (SELECT quantile_cont(value,
        |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts FROM events),
        |b AS (SELECT event_id, value,
        |    CAST(len(list_filter(cuts.cuts, c -> c < value)) + 1 AS INT) AS bin
        |  FROM events CROSS JOIN cuts)
        |SELECT bin, count(*) AS n,
        |  round(min(value) + 1e-9, 4) AS lo,
        |  round(max(value) + 1e-9, 4) AS hi,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(value) + 1e-9, 4) AS mean_v
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "q_corr_matrix" ->
      """WITH c AS (SELECT
        |  round(corr(l_quantity, l_extendedprice) + 1e-9, 6) AS r_qe,
        |  round(corr(l_quantity, l_discount) + 1e-9, 6) AS r_qd,
        |  round(corr(l_quantity, l_tax) + 1e-9, 6) AS r_qt,
        |  round(corr(l_extendedprice, l_discount) + 1e-9, 6) AS r_ed,
        |  round(corr(l_extendedprice, l_tax) + 1e-9, 6) AS r_et,
        |  round(corr(l_discount, l_tax) + 1e-9, 6) AS r_dt
        |  FROM lineitem)
        |SELECT col_x, col_y, r FROM (
        |  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y, r_qe AS r FROM c
        |  UNION ALL SELECT 'l_quantity', 'l_discount', r_qd FROM c
        |  UNION ALL SELECT 'l_quantity', 'l_tax', r_qt FROM c
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', r_ed FROM c
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', r_et FROM c
        |  UNION ALL SELECT 'l_discount', 'l_tax', r_dt FROM c)
        |ORDER BY col_x, col_y""".stripMargin,

    // exact-rational KS: the max is taken over the integer numerator
    // |F1·n2 − F2·n1|; only the report rate is (integer-)rounded
    "q_stat_ks" ->
      """WITH byv AS (SELECT value, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |va AS (SELECT value, CAST(sum(c) AS BIGINT) AS c_all FROM byv GROUP BY 1),
        |ty AS (SELECT DISTINCT event_type AS et FROM events),
        |grid AS (SELECT t.et, v.value, coalesce(b.c, 0) AS c, v.c_all
        |  FROM ty t CROSS JOIN va v
        |  LEFT JOIN byv b ON b.event_type = t.et AND b.value = v.value),
        |cum AS (SELECT et, value,
        |    CAST(sum(c) OVER w AS BIGINT) AS f_t,
        |    CAST(sum(c_all) OVER w AS BIGINT) AS f_all
        |  FROM grid WINDOW w AS (PARTITION BY et ORDER BY value)),
        |tot AS (SELECT event_type AS et, CAST(count(*) AS BIGINT) AS n1,
        |    (SELECT CAST(count(*) AS BIGINT) FROM events) - CAST(count(*) AS BIGINT) AS n2
        |  FROM events GROUP BY 1),
        |mx AS (SELECT et, CAST(max(abs(f_t * n2 - (f_all - f_t) * n1)) AS BIGINT) AS d_num
        |  FROM cum JOIN tot USING (et) GROUP BY 1)
        |SELECT t.et AS event_type, n1, n2, d_num,
        |  CAST((2000000 * CAST(d_num AS HUGEINT) + CAST(n1 AS HUGEINT) * n2)
        |       // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS d_micro
        |FROM mx m JOIN tot t ON t.et = m.et ORDER BY event_type""".stripMargin,

    // integer-exact chi-square grid: expected and contribution rendered
    // as round-half-up micro-units in int128 arithmetic, zero cells kept
    "q_stat_chi2" ->
      """WITH rm AS (SELECT lang, CAST(count(*) AS BIGINT) AS r FROM documents GROUP BY 1),
        |cm AS (SELECT source, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1),
        |ob AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |tn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |g AS (SELECT rm.lang, cm.source, coalesce(ob.o, 0) AS o, rm.r, cm.c, tn.n
        |  FROM rm CROSS JOIN cm
        |  LEFT JOIN ob ON ob.lang = rm.lang AND ob.source = cm.source
        |  CROSS JOIN tn)
        |SELECT lang, source, o,
        |  CAST((2000000 * CAST(r AS HUGEINT) * c + n)
        |       // (2 * CAST(n AS HUGEINT)) AS BIGINT) AS e_micro,
        |  CAST((2000000 * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |                * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |        + CAST(n AS HUGEINT) * r * c)
        |       // (2 * CAST(n AS HUGEINT) * r * c) AS BIGINT) AS contrib_micro
        |FROM g ORDER BY lang, source""".stripMargin,

    // skyline: dominance via per-level maxima + a strictly-higher-level
    // running max over the tiny level table — spend stays DECIMAL
    // through every comparison
    "q_skyline" ->
      """WITH pts AS (
        |  SELECT c_mktsegment AS segment, o_custkey AS custkey,
        |         CAST(count(*) AS BIGINT) AS n_orders,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |lvl AS (SELECT segment, n_orders, max(spend) AS lvl_max
        |        FROM pts GROUP BY 1, 2),
        |lvl2 AS (SELECT segment, n_orders, lvl_max,
        |  max(lvl_max) OVER (PARTITION BY segment ORDER BY n_orders DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_higher
        |  FROM lvl)
        |SELECT p.segment, p.custkey, p.n_orders, CAST(p.spend AS DOUBLE) AS spend
        |FROM pts p JOIN lvl2 l ON p.segment = l.segment AND p.n_orders = l.n_orders
        |WHERE p.spend = l.lvl_max
        |  AND (l.best_higher IS NULL OR l.best_higher < p.spend)
        |ORDER BY p.segment, p.n_orders DESC, p.custkey""".stripMargin,

    // MI cells: the log argument is a ratio of exact integer products
    // (< 2^53 at any tested SF) so both engines ln the same double
    "q_mutual_info" ->
      """WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |           FROM documents GROUP BY 1, 2),
        |tot AS (SELECT sum(c) AS n FROM c),
        |rl AS (SELECT lang, sum(c) AS cl FROM c GROUP BY 1),
        |rs AS (SELECT source, sum(c) AS cs FROM c GROUP BY 1)
        |SELECT c.lang, c.source, c.c,
        |  round(ln(CAST(c.c * n AS DOUBLE) / CAST(cl * cs AS DOUBLE)) + 1e-9, 6)
        |    + 0.0 AS pmi,
        |  round(CAST(c.c AS DOUBLE) / CAST(n AS DOUBLE)
        |        * ln(CAST(c.c * n AS DOUBLE) / CAST(cl * cs AS DOUBLE)) + 1e-9, 6)
        |    + 0.0 AS mi_term
        |FROM c JOIN rl USING (lang) JOIN rs USING (source) CROSS JOIN tot
        |ORDER BY lang, source""".stripMargin,

    // α = 1/2 keeps every weight an exact power of two: the weighted sum
    // is a fixed left-to-right chain of exact double scalings, and the
    // truncated-tail normalizer 1 − 2^−m is exact too
    "q_window_ewma" ->
      """SELECT event_id, user_id,
        |  round((value * 0.5
        |    + coalesce(lag(value, 1) OVER w, 0) * 0.25
        |    + coalesce(lag(value, 2) OVER w, 0) * 0.125
        |    + coalesce(lag(value, 3) OVER w, 0) * 0.0625
        |    + coalesce(lag(value, 4) OVER w, 0) * 0.03125
        |    + coalesce(lag(value, 5) OVER w, 0) * 0.015625
        |    + coalesce(lag(value, 6) OVER w, 0) * 0.0078125
        |    + coalesce(lag(value, 7) OVER w, 0) * 0.00390625)
        |    / (1.0 - 1.0 / pow(2.0, least(row_number() OVER w, 8))) + 1e-9, 6) AS ewma
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    // nearest preceding purchase, but only within the 7-day tolerance:
    // the unbounded ASOF match post-filtered by the bound (any other
    // candidate is older still, so filtering the nearest is exact)
    "q_join_asof_tol" ->
      """SELECT e.event_id, e.user_id,
        |  CASE WHEN p.ts >= e.ts - INTERVAL 7 DAY
        |       THEN CAST(epoch_ns(p.ts) AS BIGINT) END AS last_purchase_tol_ns
        |FROM events e ASOF LEFT JOIN
        |  (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,

    "q_oov_rate" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |topv AS (SELECT term FROM (
        |    SELECT term, sum(tf) AS cnt FROM tf GROUP BY 1)
        |  ORDER BY cnt DESC, term LIMIT 500)
        |SELECT doc_id,
        |  CAST(sum(tf) AS BIGINT) AS n_tok,
        |  CAST(sum(CASE WHEN topv.term IS NULL THEN tf ELSE 0 END) AS BIGINT) AS n_oov,
        |  round(CAST(sum(CASE WHEN topv.term IS NULL THEN tf ELSE 0 END) AS DOUBLE)
        |        / sum(tf) + 1e-9, 6) AS oov_rate
        |FROM tf LEFT JOIN topv USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_ngram_novelty" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(string_split(rtrim(text, ' '), ' ')) - 3),
        |      i -> string_split(rtrim(text, ' '), ' ')[i] || ' ' ||
        |           string_split(rtrim(text, ' '), ' ')[i+1] || ' ' ||
        |           string_split(rtrim(text, ' '), ' ')[i+2] || ' ' ||
        |           string_split(rtrim(text, ' '), ' ')[i+3] || ' ' ||
        |           string_split(rtrim(text, ' '), ' ')[i+4])) AS g
        |    FROM documents)),
        |pd AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1),
        |u AS (SELECT min(doc_id) AS doc_id, count(*) AS df FROM g GROUP BY g),
        |uc AS (SELECT doc_id, count(*) AS n_unique FROM u WHERE df = 1 GROUP BY 1)
        |SELECT doc_id, n_grams,
        |  coalesce(n_unique, 0) AS n_unique,
        |  round(CAST(coalesce(n_unique, 0) AS DOUBLE) / n_grams + 1e-9, 6) AS novelty
        |FROM pd LEFT JOIN uc USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_agg_percentile" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // winsorize: bounds rounded to the data's 2-dp grain so every
    // clamped value is exact DECIMAL; means are exact-sum / count
    "q_winsorize" ->
      """WITH b AS (
        |  SELECT o_orderpriority,
        |    round(quantile_cont(o_totalprice, 0.05) + 1e-9, 2) AS lo,
        |    round(quantile_cont(o_totalprice, 0.95) + 1e-9, 2) AS hi
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderpriority, b.lo, b.hi, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |        / count(*) + 1e-9, 6) AS mean_raw,
        |  round(CAST(sum(CAST(least(greatest(o_totalprice, b.lo), b.hi)
        |                      AS DECIMAL(18,2))) AS DOUBLE)
        |        / count(*) + 1e-9, 6) AS mean_winsor
        |FROM orders o JOIN b USING (o_orderpriority)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    "q_trimmed_mean" ->
      """WITH b AS (
        |  SELECT o_orderpriority,
        |    round(quantile_cont(o_totalprice, 0.10) + 1e-9, 2) AS lo,
        |    round(quantile_cont(o_totalprice, 0.90) + 1e-9, 2) AS hi
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderpriority, b.lo, b.hi, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (WHERE o_totalprice >= b.lo AND o_totalprice <= b.hi)
        |       AS BIGINT) AS n_kept,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |        / count(*) + 1e-9, 6) AS mean_raw,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |          FILTER (WHERE o_totalprice >= b.lo AND o_totalprice <= b.hi) AS DOUBLE)
        |        / (count(*) FILTER (WHERE o_totalprice >= b.lo AND o_totalprice <= b.hi))
        |        + 1e-9, 6) AS mean_trimmed
        |FROM orders o JOIN b USING (o_orderpriority)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    "q_attribution_ushape" -> {
      val chans = Seq("click", "view", "error", "signup")
      def cr(c: String) =
        s"""SELECT '$c' AS channel,
           |  CASE WHEN n_touch = 1 THEN vu
           |       WHEN n_touch = 2 THEN
           |         (CASE WHEN first_ch = '$c' THEN vu // 2 ELSE 0 END)
           |       + (CASE WHEN last_ch = '$c' THEN vu - vu // 2 ELSE 0 END)
           |       ELSE
           |         (CASE WHEN first_ch = '$c' THEN f40 + mid_rem ELSE 0 END)
           |       + (CASE WHEN last_ch = '$c' THEN f40 ELSE 0 END)
           |       + (cnt_$c - (CASE WHEN first_ch = '$c' THEN 1 ELSE 0 END)
           |                 - (CASE WHEN last_ch = '$c' THEN 1 ELSE 0 END)) * mid_each
           |  END AS credit_4
           |FROM p2 WHERE n_touch > 0 AND cnt_$c > 0""".stripMargin
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, value, epoch_ns(ts) AS ts_ns
         |  FROM events),
         |c AS (SELECT *,
         |${chans.map(c => s"    count(CASE WHEN event_type = '$c' THEN 1 END) OVER w AS cnt_$c,").mkString("\n")}
         |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
         |                IGNORE NULLS) OVER w AS first_ch,
         |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
         |               IGNORE NULLS) OVER w AS last_ch
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |p AS (SELECT *, ${chans.map(c => s"cnt_$c").mkString(" + ")} AS n_touch,
         |    CAST(round(value * 10000 + 1e-9, 0) AS BIGINT) AS vu
         |  FROM c WHERE event_type = 'purchase'),
         |p2 AS (SELECT *, vu * 2 // 5 AS f40,
         |    CASE WHEN n_touch >= 3
         |         THEN (vu - 2 * (vu * 2 // 5)) // (n_touch - 2) ELSE 0 END AS mid_each,
         |    CASE WHEN n_touch >= 3
         |         THEN vu - 2 * (vu * 2 // 5)
         |            - (n_touch - 2) * ((vu - 2 * (vu * 2 // 5)) // (n_touch - 2))
         |         ELSE 0 END AS mid_rem
         |  FROM p),
         |credits AS (
         |${chans.map(cr).mkString("\n  UNION ALL\n")}
         |  UNION ALL
         |  SELECT 'direct', vu FROM p2 WHERE n_touch = 0)
         |SELECT channel, count(*) AS n_credits,
         |  CAST(sum(credit_4) AS BIGINT) AS revenue_4
         |FROM credits GROUP BY channel HAVING sum(credit_4) > 0
         |ORDER BY channel""".stripMargin
    },

    "q_survival_km" ->
      """WITH u AS (SELECT user_id, min(CAST(ts AS DATE)) AS fd,
        |             max(CAST(ts AS DATE)) AS ld FROM events GROUP BY 1),
        |h AS (SELECT max(ld) AS ed FROM u),
        |lt AS (SELECT CASE WHEN date_diff('day', ld, ed) >= 14
        |         THEN date_diff('day', fd, ld)
        |         ELSE date_diff('day', fd, ed) END AS t,
        |       date_diff('day', ld, ed) >= 14 AS dead
        |       FROM u, h),
        |g AS (SELECT t, sum(CASE WHEN dead THEN 1 ELSE 0 END) AS d,
        |        sum(CASE WHEN dead THEN 0 ELSE 1 END) AS c FROM lt GROUP BY 1),
        |tot AS (SELECT sum(d + c) AS n_total FROM g),
        |r AS (SELECT t, d, c,
        |        n_total - coalesce(sum(d + c) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
        |      FROM g, tot),
        |r2 AS (SELECT *,
        |        max(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END) OVER cum AS zeroed,
        |        sum(CASE WHEN d < n_at_risk
        |            THEN ln(1 - CAST(d AS DOUBLE) / n_at_risk) END)
        |          OVER cum AS lnsum
        |       FROM r WINDOW cum AS (ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT t AS duration_days, CAST(n_at_risk AS BIGINT) AS n_at_risk,
        |  CAST(d AS BIGINT) AS n_deaths, CAST(c AS BIGINT) AS n_censored,
        |  CASE WHEN zeroed = 1 THEN 0.0
        |       ELSE round(exp(lnsum) + 1e-9, 6) END AS survival
        |FROM r2 ORDER BY duration_days""".stripMargin,

    "q_attribution_decay" -> {
      val chans = Seq("click", "view", "error", "signup")
      def cr(c: String) =
        s"""SELECT '$c' AS channel,
           |  vu * wq_$c // W + (CASE WHEN rem_ch = '$c'
           |    THEN vu - (${chans.map(ch => s"vu * wq_$ch // W").mkString(" + ")})
           |    ELSE 0 END) AS credit_4
           |FROM p3 WHERE W > 0 AND wq_$c > 0""".stripMargin
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, value, epoch_ns(ts) AS ts_ns,
         |    CAST(ts AS DATE) AS day
         |  FROM events),
         |b AS (SELECT *, min(day) OVER (PARTITION BY user_id) AS base_day FROM e),
         |c AS (SELECT *,
         |${chans.map(ch => s"    sum(CASE WHEN event_type = '$ch' THEN pow(2.0, CAST(date_diff('day', base_day, day) AS DOUBLE) / 7.0) END) OVER w AS s_$ch,").mkString("\n")}
         |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
         |               IGNORE NULLS) OVER w AS last_ch
         |  FROM b
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |p AS (SELECT *, CAST(round(value * 10000 + 1e-9, 0) AS BIGINT) AS vu,
         |    pow(2.0, -CAST(date_diff('day', base_day, day) AS DOUBLE) / 7.0) AS pfac
         |  FROM c WHERE event_type = 'purchase'),
         |p2 AS (SELECT *,
         |${chans.map(ch => s"    coalesce(CAST(round(pfac * s_$ch * 1e6 + 1e-9, 0) AS BIGINT), 0) AS wq_$ch,").mkString("\n").dropRight(1)}
         |  FROM p),
         |p3 AS (SELECT *, ${chans.map(ch => s"wq_$ch").mkString(" + ")} AS W,
         |    substr(greatest(${chans.map(ch => s"lpad(CAST(wq_$ch AS VARCHAR), 20, '0') || '$ch'").mkString(", ")}), 21, 10) AS rem_ch
         |  FROM p2),
         |credits AS (
         |${chans.map(cr).mkString("\n  UNION ALL\n")}
         |  UNION ALL
         |  SELECT last_ch, vu FROM p3 WHERE W = 0 AND last_ch IS NOT NULL
         |  UNION ALL
         |  SELECT 'direct', vu FROM p3 WHERE W = 0 AND last_ch IS NULL)
         |SELECT channel, count(*) AS n_credits,
         |  CAST(sum(credit_4) AS BIGINT) AS revenue_4
         |FROM credits GROUP BY channel HAVING sum(credit_4) > 0
         |ORDER BY channel""".stripMargin
    },

    "q_cuped" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type, value
        |           FROM events),
        |sp AS (SELECT min(day) + CAST((date_diff('day', min(day), max(day)) // 2)
        |         AS INT) AS cut FROM e),
        |pu AS (SELECT user_id,
        |        sum(CASE WHEN event_type = 'purchase' AND day < cut
        |            THEN CAST(value AS DECIMAL(18,2))
        |            ELSE CAST(0 AS DECIMAL(18,2)) END) AS x,
        |        sum(CASE WHEN event_type = 'purchase' AND day >= cut
        |            THEN CAST(value AS DECIMAL(18,2))
        |            ELSE CAST(0 AS DECIMAL(18,2)) END) AS y
        |       FROM e, sp GROUP BY 1),
        |pa AS (SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |         THEN 'A' ELSE 'B' END AS arm, x, y FROM pu),
        |std AS (SELECT arm, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |        sum(CAST(x * y AS DECIMAL(38,4))) AS sxy,
        |        sum(CAST(x * x AS DECIMAL(38,4))) AS sxx,
        |        sum(CAST(y * y AS DECIMAL(38,4))) AS syy
        |       FROM pa GROUP BY 1),
        |st AS (SELECT arm, n, CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
        |        CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx,
        |        CAST(syy AS DOUBLE) AS syy FROM std),
        |po AS (SELECT CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx = 0.0 THEN 0.0
        |         ELSE (CAST(n AS DOUBLE) * sxy - sx * sy)
        |            / (CAST(n AS DOUBLE) * sxx - sx * sx) END AS theta,
        |        sx / CAST(n AS DOUBLE) AS mean_x
        |       FROM (SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
        |               sum(sxy) AS sxy, sum(sxx) AS sxx FROM st))
        |SELECT arm, CAST(n AS BIGINT) AS n_users,
        |  round(sy / CAST(n AS DOUBLE) + 1e-9, 6) AS mean_y,
        |  round(sy / CAST(n AS DOUBLE)
        |    - theta * (sx / CAST(n AS DOUBLE) - mean_x) + 1e-9, 6) AS mean_y_cuped,
        |  CASE WHEN CAST(n AS DOUBLE) * syy - sy * sy = 0.0 THEN 0.0
        |       ELSE round(1.0 - ((CAST(n AS DOUBLE) * syy - sy * sy)
        |            - 2.0 * theta * (CAST(n AS DOUBLE) * sxy - sx * sy)
        |            + theta * theta * (CAST(n AS DOUBLE) * sxx - sx * sx))
        |            / (CAST(n AS DOUBLE) * syy - sy * sy) + 1e-9, 6)
        |  END AS var_reduction
        |FROM st, po ORDER BY arm""".stripMargin,

    "q_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    sum(CAST(round(value * 10000 + 1e-9, 0) AS BIGINT)) AS r
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |t AS (SELECT *, count(*) OVER wma AS n7, sum(r) OVER wma AS sum7
        |      FROM daily
        |      WINDOW wma AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (SELECT *, CASE WHEN n7 = 7 THEN r * 7 - sum7 END AS det7 FROM t),
        |s AS (SELECT *, sum(det7) OVER (PARTITION BY dayofweek(day)) AS seas_num,
        |       count(det7) OVER (PARTITION BY dayofweek(day)) AS seas_den FROM t2)
        |SELECT day, round(CAST(r AS DOUBLE) / 10000 + 1e-9, 4) AS revenue,
        |  CASE WHEN n7 = 7
        |       THEN round(CAST(sum7 AS DOUBLE) / 7 / 10000 + 1e-9, 4) END AS trend_ma7,
        |  CASE WHEN seas_den > 0
        |       THEN round(CAST(seas_num AS DOUBLE) / seas_den / 7 / 10000 + 1e-9, 4)
        |  END AS seasonal_dow,
        |  CASE WHEN seas_den > 0
        |       THEN round((CAST(det7 AS DOUBLE) / 7
        |            - CAST(seas_num AS DOUBLE) / seas_den / 7) / 10000 + 1e-9, 4)
        |  END AS residual
        |FROM s ORDER BY day""".stripMargin,

    "q_graph_lpa" ->
      """WITH ids AS MATERIALIZED (SELECT doc_id AS id FROM documents),
        |ed AS (SELECT x.id AS src, y.id AS dst FROM ids x JOIN ids y ON y.id = x.id + 1
        |  UNION ALL
        |  SELECT x.id, y.id FROM ids x JOIN ids y ON x.id % 2 = 0 AND y.id = x.id + 2),
        |ud AS MATERIALIZED (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed)),
        |l0 AS (SELECT DISTINCT src AS id, src AS label FROM ud),
        |c1 AS (SELECT u.src AS id, l.label AS label, count(*) AS c
        |       FROM ud u JOIN l0 l ON l.id = u.dst GROUP BY 1, 2),
        |l1 AS (SELECT id, label FROM (SELECT id, label,
        |         row_number() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn
        |       FROM c1) WHERE rn = 1),
        |c2 AS (SELECT u.src AS id, l.label AS label, count(*) AS c
        |       FROM ud u JOIN l1 l ON l.id = u.dst GROUP BY 1, 2),
        |l2 AS (SELECT id, label FROM (SELECT id, label,
        |         row_number() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn
        |       FROM c2) WHERE rn = 1),
        |c3 AS (SELECT u.src AS id, l.label AS label, count(*) AS c
        |       FROM ud u JOIN l2 l ON l.id = u.dst GROUP BY 1, 2),
        |l3 AS MATERIALIZED (SELECT id, label FROM (SELECT id, label,
        |         row_number() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn
        |       FROM c3) WHERE rn = 1),
        |sz AS (SELECT label AS community, count(*) AS community_size FROM l3 GROUP BY 1)
        |SELECT l3.id, l3.label AS community,
        |  CAST(sz.community_size AS BIGINT) AS community_size
        |FROM l3 JOIN sz ON l3.label = sz.community
        |ORDER BY id""".stripMargin,

    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_groupingsets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_window_ntile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w + 1e-9, 6) AS pct_rank,
        |  round(cume_dist() OVER w + 1e-9, 6) AS cdist
        |FROM orders WINDOW w AS (PARTITION BY o_orderpriority
        |                         ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax FROM lineitem)
        |UNPIVOT (value FOR metric IN (l_quantity, l_discount, l_tax))
        |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin,

    "q_explode" ->
      """SELECT word, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY word""".stripMargin,

    "q_source_csv" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    // the XML round trip must be lossless: same oracle as the csv one
    "q_source_xml" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    // merged read = old generation null-filled UNION new generation
    "q_source_evolution" ->
      """SELECT * FROM (
        |  SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey
        |  FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, n_name, n_regionkey FROM nation)
        |ORDER BY n_nationkey, n_regionkey ASC NULLS FIRST""".stripMargin,

    "q_zipf_fit" ->
      """WITH f AS (
        |  SELECT w, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w),
        |r AS (SELECT freq,
        |  row_number() OVER (ORDER BY freq DESC, w) AS rank FROM f)
        |SELECT CAST(count(*) AS BIGINT) AS n_vocab,
        |  round(regr_slope(ln(freq), ln(rank)) + 1e-9, 6) + 0.0 AS zipf_slope,
        |  round(regr_intercept(ln(freq), ln(rank)) + 1e-9, 6) + 0.0 AS zipf_icept,
        |  round(regr_r2(ln(freq), ln(rank)) + 1e-9, 6) + 0.0 AS zipf_r2
        |FROM r""".stripMargin,

    "q_source_json" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_source_from_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_window_range_frame" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  count(*) OVER w AS n_near,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS near_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |             RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "q_window_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  CAST(rn AS BIGINT) AS rn, CAST(rk AS BIGINT) AS rk, CAST(drk AS BIGINT) AS drk
        |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |        row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |      FROM lineitem
        |      WINDOW w AS (PARTITION BY l_returnflag
        |                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber))
        |WHERE rn <= 5 ORDER BY l_returnflag, rn""".stripMargin,

    "q_window_lag" ->
      """SELECT event_id, user_id, value,
        |  lag(value) OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fval
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_union" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,

    "q_union_all" ->
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,

    "q_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS up_name, lower(p_brand) AS low_brand,
        |  substring(p_name, 1, 8) AS pre8,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat(p_brand, '#', p_type) AS brand_type, trim(p_name) AS trimmed,
        |  regexp_replace(p_type, ' ', '_', 'g') AS type_us,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_tpch_q3ish" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-09-01'
        |  AND l_shipdate > TIMESTAMP '1995-03-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q5ish" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_tpch_q10ish" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_tpch_q18ish" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum_qty > 150) big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_subquery_corr" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM customer c
        |WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "q_date_funcs2" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  CAST(o_orderdate AS DATE) + 45 AS plus45d
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_filter_like" ->
      """SELECT p_partkey,
        |  p_name LIKE 'a%' AS starts_a,
        |  p_type LIKE '%steel%' AS has_steel,
        |  regexp_matches(p_name, '[0-9]') AS has_digit
        |FROM part
        |WHERE p_type LIKE '%plated%' OR regexp_matches(p_name, '^[ab]')
        |ORDER BY p_partkey""".stripMargin,

    "q_string_funcs2" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS lp,
        |  rpad(p_brand, 12, '-') AS rp,
        |  reverse(p_name) AS rev,
        |  repeat(p_brand, 2) AS rep,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS a_pos,
        |  replace(p_brand, '#', '_') AS tr
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_map_funcs" ->
      """SELECT event_id,
        |  array_to_string(list_sort(json_keys(props)), ',') AS ks,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS kval,
        |  json_extract(props, '$.k') IS NOT NULL AS has_k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dy,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS BIGINT) AS days_to_96,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS r1,
        |  abs(l_discount - 0.05) AS ad,
        |  CAST(floor(l_quantity) AS BIGINT) AS fl,
        |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ce,
        |  round(sqrt(l_extendedprice), 6) AS sq,
        |  round(ln(l_extendedprice + 1), 6) AS lg,
        |  round(pow(l_discount, 2), 8) AS p2,
        |  CAST(l_quantity AS BIGINT) % 7 AS md
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_cond_funcs" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'high'
        |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_val,
        |  round(list_reduce(CAST(embedding AS DOUBLE[]), (a, b) -> a + b), 4) + 0.0 AS vsum,
        |  round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 6) AS vmax,
        |  round(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
        |        (a, b) -> a + b), 4) AS sq_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_pivot" ->
      """SELECT CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS day_epoch,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS dup_cnt, text
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "q_dedup_ngram" ->
      """SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  round(CAST(len(list_intersect(list_distinct(string_split(a.text, ' ')),
        |                                list_distinct(string_split(b.text, ' ')))) AS DOUBLE)
        |        / len(list_distinct(list_concat(string_split(a.text, ' '),
        |                                        string_split(b.text, ' ')))), 6) AS jaccard
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY id1""".stripMargin,

    "q_dedup_containment" ->
      """SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  round(CAST(len(list_intersect(list_distinct(string_split(a.text, ' ')),
        |                                list_distinct(string_split(b.text, ' ')))) AS DOUBLE)
        |        / len(list_distinct(string_split(a.text, ' '))) + 1e-9, 6) AS contain_fwd,
        |  round(CAST(len(list_intersect(list_distinct(string_split(a.text, ' ')),
        |                                list_distinct(string_split(b.text, ' ')))) AS DOUBLE)
        |        / len(list_distinct(string_split(b.text, ' '))) + 1e-9, 6) AS contain_rev
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY id1""".stripMargin,

    // four deterministic surface spellings per page id collapse to one
    // canonical URL; the canonicalization is replicated operator-for-
    // operator (regexp extract/replace, param filter+sort) in DuckDB
    "q_dedup_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' ||
        |    CASE WHEN doc_id % 4 = 1
        |         THEN upper('src' || ((doc_id // 4) % 20) || '.example.org') || ':443'
        |         ELSE 'src' || ((doc_id // 4) % 20) || '.example.org' END ||
        |    '/docs/' || (doc_id // 4) ||
        |    CASE WHEN doc_id % 4 = 3 THEN '/' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 2 THEN '?b=2&a=1'
        |         WHEN doc_id % 4 = 3 THEN '?a=1&b=2&utm_source=feed'
        |         ELSE '?a=1&b=2' END AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    'https://' ||
        |    lower(regexp_replace(regexp_extract(url, '^https?://([^/?#]+)', 1), ':443$', '')) ||
        |    regexp_replace(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1), '/$', '') ||
        |    '?' ||
        |    array_to_string(list_sort(list_filter(
        |      string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |      x -> NOT starts_with(x, 'utm_'))), '&') AS canon_url
        |  FROM u)
        |SELECT canon_url, count(*) AS n_dups, min(doc_id) AS keep_id
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // the greedy MMR loop unrolls into a recursive CTE carrying the
    // selected (id, vector) lists as state; cosine is spelled
    // dot/(sqrt(n1)*sqrt(n2)) — the exact shape of Vec.cosine, NOT
    // sqrt(n1*n2) — and the diversity weight is spelled (1.0 - 0.7) so
    // both engines share the same representation error as Scala's
    // lit(1.0 - lambda) (0.30000000000000004, not the 0.3 literal's
    // 0.29999…; same convention as the pagerank oracle's damping) —
    // so the argmax compares bit-identical doubles
    // (verified exact at sf0.01/sf0.1/sf1 incl. the jittered near-dup
    // copies, where scores separate by only ~1e-5)
    "q_mmr_select" ->
      """WITH RECURSIVE
        |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings ORDER BY vec_id LIMIT 1),
        |base AS (SELECT vec_id, embedding::DOUBLE[] AS e,
        |    list_dot_product(embedding::DOUBLE[], (SELECT qe FROM q))
        |      / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |         * sqrt(list_dot_product((SELECT qe FROM q), (SELECT qe FROM q)))) AS relq
        |  FROM embeddings),
        |sel AS (
        |  SELECT 1 AS rank, p.vec_id, p.score, [p.vec_id] AS ids, [p.e] AS vecs
        |  FROM (SELECT vec_id, e, 0.7 * relq AS score FROM base
        |        ORDER BY score DESC, vec_id LIMIT 1) p
        |  UNION ALL
        |  SELECT s.rank + 1, p.vec_id, p.score,
        |         list_append(s.ids, p.vec_id), list_append(s.vecs, p.e)
        |  FROM sel s, LATERAL (
        |    SELECT b.vec_id, b.e,
        |      0.7 * b.relq - (1.0 - 0.7) * list_max(list_transform(s.vecs,
        |        v -> list_dot_product(b.e, v)
        |             / (sqrt(list_dot_product(b.e, b.e)) * sqrt(list_dot_product(v, v))))) AS score
        |    FROM base b WHERE NOT list_contains(s.ids, b.vec_id)
        |    ORDER BY score DESC, b.vec_id LIMIT 1) p
        |  WHERE s.rank < 10)
        |SELECT rank, vec_id, round(score, 6) AS score FROM sel ORDER BY rank""".stripMargin,

    "q_sim_topk" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
        |s AS (SELECT qid, cid,
        |        round(list_reduce(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i]),
        |                          (a, b) -> a + b)
        |          / (sqrt(list_reduce(list_transform(qe, x -> x * x), (a, b) -> a + b))
        |           * sqrt(list_reduce(list_transform(ce, x -> x * x), (a, b) -> a + b))), 9) AS cos_raw
        |      FROM q, c WHERE cid <> qid),
        |r AS (SELECT qid, cid, cos_raw,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, cid) AS rn
        |      FROM s)
        |SELECT qid, CAST(rn AS BIGINT) AS rn, cid, round(cos_raw, 6) AS cos
        |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,

    "q_knn_classify" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe, label AS qlabel
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce, label AS clabel
        |      FROM embeddings),
        |s AS (SELECT qid, qlabel, cid, clabel,
        |        round(list_reduce(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i]),
        |                          (a, b) -> a + b)
        |          / (sqrt(list_reduce(list_transform(qe, x -> x * x), (a, b) -> a + b))
        |           * sqrt(list_reduce(list_transform(ce, x -> x * x), (a, b) -> a + b))), 9) AS cos_raw
        |      FROM q, c WHERE cid <> qid),
        |r AS (SELECT qid, qlabel, clabel,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, cid) AS rn
        |      FROM s),
        |v AS (SELECT qid, qlabel, clabel, count(*) AS votes, min(rn) AS best_rn
        |      FROM r WHERE rn <= 5 GROUP BY 1, 2, 3),
        |p AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY votes DESC, best_rn, clabel) AS vr FROM v)
        |SELECT qid, CAST(qlabel AS INT) AS true_label, CAST(clabel AS INT) AS pred_label,
        |       votes, clabel = qlabel AS correct
        |FROM p WHERE vr = 1 ORDER BY qid""".stripMargin,

    "q_sim_truncated" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
        |s AS (SELECT qid, cid, qe, ce,
        |        round(list_reduce(list_transform(range(1, 33), i -> qe[i] * ce[i]),
        |                          (a, b) -> a + b)
        |          / (sqrt(list_reduce(list_transform(qe[1:32], x -> x * x), (a, b) -> a + b))
        |           * sqrt(list_reduce(list_transform(ce[1:32], x -> x * x), (a, b) -> a + b))), 9) AS cos32_raw
        |      FROM q, c WHERE cid <> qid),
        |r AS (SELECT qid, cid, qe, ce, cos32_raw,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos32_raw DESC, cid) AS rn
        |      FROM s)
        |SELECT qid, CAST(rn AS BIGINT) AS rn, cid,
        |  round(cos32_raw, 6) AS cos32,
        |  round(round(list_reduce(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i]),
        |                          (a, b) -> a + b)
        |    / (sqrt(list_reduce(list_transform(qe, x -> x * x), (a, b) -> a + b))
        |     * sqrt(list_reduce(list_transform(ce, x -> x * x), (a, b) -> a + b))), 9), 6) AS cos_full
        |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,

    "q_bigram_lm" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |pairs AS (
        |  SELECT u.w1 AS w1, u.w2 AS w2
        |  FROM (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
        |          i -> {'w1': t[i], 'w2': t[i+1]})) AS u
        |        FROM toks WHERE len(t) >= 2)),
        |types AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM pairs GROUP BY w1, w2),
        |l AS (SELECT w1, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS n1p_fwd
        |      FROM types GROUP BY w1),
        |r AS (SELECT w2, count(*)::BIGINT AS n1p_bwd FROM types GROUP BY w2)
        |SELECT t.w1, t.w2, t.c12, l.c1, l.n1p_fwd, r.n1p_bwd
        |FROM types t JOIN l USING (w1) JOIN r USING (w2)
        |WHERE c12 >= 5
        |ORDER BY c12 DESC, w1, w2 LIMIT 1000""".stripMargin,

    // interpolated bigram LM scoring over the q_bigram_lm count tables:
    // per-type -ln p rounded then DECIMAL-summed (the house convention)
    "q_bigram_ppl" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pairs AS (
        |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |          i -> {'w1': t[i], 'w2': t[i+1]})) AS u
        |        FROM toks WHERE len(t) >= 2)),
        |dt AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS cnt FROM pairs GROUP BY 1, 2, 3),
        |types AS (SELECT w1, w2, sum(cnt)::BIGINT AS c12 FROM dt GROUP BY 1, 2),
        |l AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM types GROUP BY 1),
        |r AS (SELECT w2, sum(c12)::BIGINT AS c2 FROM types GROUP BY 1),
        |tot AS (SELECT sum(c12)::BIGINT AS n_total FROM types),
        |model AS (SELECT w1, w2,
        |    CAST(round(-ln(0.75 * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
        |               + 0.25 * (CAST(c2 AS DOUBLE) / CAST(n_total AS DOUBLE)))
        |         + 1e-9, 6) AS DECIMAL(18,6)) AS nll
        |  FROM types JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tot)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        |  round(CAST(sum(nll * cnt) AS DOUBLE) / sum(cnt) + 1e-9, 6) AS avg_nll
        |FROM dt JOIN model USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // semantic decontamination: per train vector, the nearest eval item
    // by exact cosine (canary: train -1 = eval 0's copy, cos exactly 1)
    "q_decontam_semantic" ->
      """WITH ev AS (SELECT vec_id AS eid, CAST(embedding AS DOUBLE[]) AS ee
        |           FROM embeddings WHERE vec_id < 50),
        |tr AS (SELECT vec_id AS tid, CAST(embedding AS DOUBLE[]) AS te
        |       FROM embeddings WHERE vec_id >= 50
        |       UNION ALL
        |       SELECT -1, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT tid, eid,
        |        round(list_reduce(list_transform(range(1, len(te) + 1), i -> te[i] * ee[i]),
        |                          (a, b) -> a + b)
        |          / (sqrt(list_reduce(list_transform(te, x -> x * x), (a, b) -> a + b))
        |           * sqrt(list_reduce(list_transform(ee, x -> x * x), (a, b) -> a + b))), 9) AS cos_raw
        |      FROM tr, ev),
        |r AS (SELECT tid, eid, cos_raw,
        |        row_number() OVER (PARTITION BY tid ORDER BY cos_raw DESC, eid DESC) AS rn
        |      FROM s)
        |SELECT tid, eid AS nearest_eval, cos_raw AS cos,
        |  cos_raw > 0.9 AS contaminated
        |FROM r WHERE rn = 1 ORDER BY tid""".stripMargin,

    // q_sim_topk's exact-cosine plan + a label-mismatch predicate:
    // the closest WRONG-label neighbors (contrastive hard negatives)
    "q_mine_hardneg" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(label AS BIGINT) AS qlabel,
        |           CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS cid, CAST(label AS BIGINT) AS clabel,
        |      CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
        |s AS (SELECT qid, qlabel, cid, clabel,
        |        round(list_reduce(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i]),
        |                          (a, b) -> a + b)
        |          / (sqrt(list_reduce(list_transform(qe, x -> x * x), (a, b) -> a + b))
        |           * sqrt(list_reduce(list_transform(ce, x -> x * x), (a, b) -> a + b))), 9) AS cos_raw
        |      FROM q, c WHERE clabel <> qlabel),
        |r AS (SELECT qid, qlabel, cid, clabel, cos_raw,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, cid) AS rn
        |      FROM s)
        |SELECT qid, qlabel, CAST(rn AS BIGINT) AS rn, cid, clabel, round(cos_raw, 6) AS cos
        |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  max(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_lang_filter" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang IN ('es','de','zh') AND n_chars >= 200 ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """SELECT doc_id, s_en, s_es, s_de,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
        |       WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS pred_lang
        |FROM (SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','and','of','to','in'))) AS BIGINT) AS s_en,
        |  CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','que','los'))) AS BIGINT) AS s_es,
        |  CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS s_de
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // position-based phrase matching (overlap-safe, like the Spark
    // side): explode tokens with ordinality, anchor on the phrase's
    // first token, verify with a list_slice equality
    "q_blocklist_phrases" ->
      """WITH ph AS (SELECT phrase, string_split(phrase, ' ') AS pw
        |  FROM (VALUES ('slow query'), ('fast table'),
        |               ('hash join fast'), ('the window')) v(phrase)),
        |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |pos AS (SELECT doc_id, ws, i
        |  FROM w, LATERAL unnest(generate_series(1, len(ws))) g(i))
        |SELECT p.doc_id, ph.phrase, count(*) AS n_hits
        |FROM pos p JOIN ph ON p.ws[p.i] = ph.pw[1]
        |WHERE list_slice(p.ws, p.i, p.i + len(ph.pw) - 1) = ph.pw
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_readability" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) AS words,
        |    greatest(1.0, CAST(len(regexp_extract_all(lower(text), '[.!?]+')) AS DOUBLE)) AS sents,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) AS sylls
        |  FROM documents)
        |SELECT doc_id, CAST(words AS BIGINT) AS n_words,
        |  round(206.835 - 1.015 * words / sents - 84.6 * sylls / words + 1e-9, 4) AS flesch
        |FROM t WHERE words > 0 ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         w -> w IN ('the','and','of','to','in'))) AS BIGINT) AS stop_hits
        |  FROM documents)
        |SELECT doc_id, n_tok,
        |  round(CAST(n_chars - (n_tok - 1) AS DOUBLE) / n_tok + 1e-9, 4) AS avg_wlen,
        |  round(CAST(stop_hits AS DOUBLE) / n_tok + 1e-9, 4) AS stop_ratio,
        |  round(least(1.0, CAST(n_tok AS DOUBLE) / 100.0) * 0.5
        |        + round(CAST(stop_hits AS DOUBLE) / n_tok + 1e-9, 4) * 0.5 + 1e-9, 4) AS score
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_c4_filters" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         w -> w IN ('the','and','of','to','in'))) AS BIGINT) AS stop_hits,
        |    list_contains(string_split(text, ' '), 'slow') AS has_block
        |  FROM documents),
        |f AS (SELECT doc_id, n_tok,
        |    round(CAST(n_chars - (n_tok - 1) AS DOUBLE) / n_tok + 1e-9, 4) AS avg_wlen,
        |    stop_hits, has_block,
        |    (n_tok >= 30 AND n_tok <= 5000) AS r_len,
        |    (round(CAST(n_chars - (n_tok - 1) AS DOUBLE) / n_tok + 1e-9, 4) >= 3.0
        |     AND round(CAST(n_chars - (n_tok - 1) AS DOUBLE) / n_tok + 1e-9, 4) <= 12.0) AS r_wlen,
        |    (stop_hits >= 2) AS r_stop,
        |    (NOT has_block) AS r_block
        |  FROM t)
        |SELECT doc_id, n_tok, avg_wlen, stop_hits, r_len, r_wlen, r_stop, r_block,
        |  (r_len AND r_wlen AND r_stop AND r_block) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_filter_waterfall" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         w -> w IN ('the','and','of','to','in'))) AS BIGINT) AS stop_hits,
        |    list_contains(string_split(text, ' '), 'slow') AS has_block
        |  FROM documents),
        |f AS (SELECT doc_id, n_tok, stop_hits, has_block,
        |    round(CAST(n_chars - (n_tok - 1) AS DOUBLE) / n_tok + 1e-9, 4) AS avg_wlen
        |  FROM t),
        |k AS (SELECT n_tok,
        |    CASE WHEN NOT (n_tok >= 30 AND n_tok <= 5000) THEN '1_len'
        |         WHEN NOT (avg_wlen >= 3.0 AND avg_wlen <= 12.0) THEN '2_wlen'
        |         WHEN NOT (stop_hits >= 2) THEN '3_stop'
        |         WHEN has_block THEN '4_block'
        |         ELSE '5_kept' END AS killed_by
        |  FROM f),
        |st AS (SELECT killed_by, count(*) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS tokens FROM k GROUP BY 1),
        |tot AS (SELECT count(*) AS n_in FROM k)
        |SELECT killed_by, n_docs, tokens,
        |  CAST(n_in - sum(CASE WHEN killed_by <> '5_kept' THEN n_docs ELSE 0 END)
        |    OVER (ORDER BY killed_by
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS survivors_after
        |FROM st CROSS JOIN tot ORDER BY killed_by""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp_md5,
        |  list_aggregate(list_transform(string_split(text, ' '), w -> md5(w)), 'min') AS fp_minword
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_mm_binary" ->
      """SELECT doc_id, hex(encode(text)) AS payload_hex,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_stream_tumbling" ->
      """SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start_epoch,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_stream_sliding" ->
      """SELECT CAST(floor((epoch(ts) - off)/600)*600 + off AS BIGINT) AS window_start_epoch,
        |  event_type, count(*) AS n
        |FROM events CROSS JOIN (VALUES (0), (300)) AS t(off)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // hourly event-type mix vs whole-corpus baseline, Laplace-smoothed
    // PSI per window; grid completed so zero-count cells contribute
    "q_stream_drift" ->
      """WITH win AS (
        |  SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS window_start_epoch,
        |    event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_base
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS k_types FROM events),
        |wt AS (SELECT window_start_epoch, CAST(sum(n) AS BIGINT) AS n_win
        |  FROM win GROUP BY 1),
        |grid AS (
        |  SELECT wt.window_start_epoch, b.event_type, coalesce(w.n, 0) AS n,
        |    wt.n_win, b.n_base, tot.n_tot, tot.k_types
        |  FROM wt CROSS JOIN base b
        |  LEFT JOIN win w ON w.window_start_epoch = wt.window_start_epoch
        |    AND w.event_type = b.event_type
        |  CROSS JOIN tot),
        |terms AS (
        |  SELECT window_start_epoch, n,
        |    CAST(round(((n + 0.5) / (n_win + 0.5 * k_types)
        |                - (n_base + 0.5) / (n_tot + 0.5 * k_types))
        |          * ln(((n + 0.5) / (n_win + 0.5 * k_types))
        |               / ((n_base + 0.5) / (n_tot + 0.5 * k_types)))
        |          + 1e-9, 6) AS DECIMAL(18,6)) AS psi_term
        |  FROM grid)
        |SELECT window_start_epoch, CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(sum(psi_term) AS DOUBLE) AS psi
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_epoch,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start_epoch""".stripMargin,

    "q_udaf_custom" ->
      """SELECT o_orderpriority, round(exp(avg(ln(o_totalprice))), 4) AS geo_price,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Spark reads the same value through VARIANT; the oracle goes
    // straight through DuckDB's JSON path extraction.
    "q_variant_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
        |  FALSE AS missing_is_null,
        |  CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
        |FROM events ORDER BY event_id""".stripMargin,

    "q_lateral_topn" ->
      """SELECT n_name, c_name, c_acctbal
        |FROM nation,
        |LATERAL (SELECT c_name, c_acctbal FROM customer
        |         WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2)
        |ORDER BY n_name, c_name, c_acctbal""".stripMargin,

    "q_interval_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate,
        |  l_shipdate + to_days(l_linenumber) AS ship_plus_days,
        |  l_shipdate - to_hours(CAST(l_orderkey % 24 AS INT)) AS ship_minus_hours,
        |  CAST(date_diff('day', l_shipdate, l_shipdate + to_days(l_linenumber)) AS BIGINT) AS day_gap
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_shipdate""".stripMargin,

    // DuckDB has no regexp_count/regexp_substr; equivalent forms via
    // regexp_extract_all (len = count, [0]-th = first match).
    "q_regexp_funcs" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, 's[a-z]+')) AS BIGINT) AS n_s,
        |  coalesce(regexp_extract(text, 's[a-z]+'), '') AS first_s,
        |  coalesce(array_to_string(regexp_extract_all(text, 's[a-z]+'), ','), '') AS all_s
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The URL is constructed from columns, so each parsed part has a
    // closed form; url_encode ≡ replace(' ','+') on [a-z ] text.
    "q_url_funcs" ->
      """SELECT doc_id,
        |  source || '.example.org' AS host,
        |  '/docs/' || doc_id AS path,
        |  lang AS qlang,
        |  replace(substr(text, 1, 20), ' ', '+') AS enc20
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_stat_crosstab" ->
      """SELECT l_returnflag AS l_returnflag_l_linestatus,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_agg_bool" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_discount > 0.05) AS any_disc,
        |  bool_and(l_tax >= 0.0) AS no_neg_tax,
        |  bool_or(l_quantity > 49) AS any_big
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_chunk_docs" ->
      """SELECT doc_id, chunk_id,
        |  array_to_string(words[(chunk_id*40 + 1):(chunk_id*40 + 50)], ' ') AS chunk_text,
        |  least(50, n_words - chunk_id*40) AS chunk_words
        |FROM (SELECT doc_id, string_split(text, ' ') AS words,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        |      FROM documents),
        |LATERAL unnest(range(0, ((n_words - 1) // 40) + 1)) AS t(chunk_id)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "q_kwic" ->
      """SELECT doc_id, CAST(p AS BIGINT) AS pos,
        |  coalesce(array_to_string(w[greatest(p - 2, 1):(p - 1)], ' '), '') AS left_ctx,
        |  coalesce(array_to_string(w[(p + 1):(p + 2)], ' '), '') AS right_ctx
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |LATERAL unnest([i for i in range(1, len(w) + 1) if w[i] = 'merge']) AS t(p)
        |ORDER BY doc_id, pos""".stripMargin,

    // fixed-weight logistic over closed-form features → exact replay
    "q_quality_classifier" ->
      """SELECT doc_id,
        |  round(1.0 / (1.0 + exp(-z)) + 1e-9, 6) AS quality,
        |  1.0 / (1.0 + exp(-z)) > 0.5 AS keep
        |FROM (SELECT doc_id,
        |  -2.0 + 1.5 * least(len(string_split(text,' ')) / 100.0, 1.0)
        |       + 0.4 * ((n_chars - len(string_split(text,' ')) + 1.0) / len(string_split(text,' ')))
        |       + 2.0 * (len(list_intersect(string_split(text,' '),
        |                    string_split('the,a,and,of,to,in,is,it',','))) / 8.0)
        |       + 1.2 * (len(list_distinct(string_split(text,' '))) / len(string_split(text,' '))) AS z
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // classifier scores as exact micro-unit integers + the C4 cascade
    // keep as gold → tie-aware Mann-Whitney AUC, all integer statistics
    // per-class P/R/F1 as exact integer micro-units; F1 via its exact
    // rational 2tp/(2tp+fp+fn) — no float P·R composition
    "q_eval_f1" ->
      """WITH base AS (
        |  SELECT lang AS gold,
        |    CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
        |         WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS pred
        |  FROM (SELECT lang,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','and','of','to','in'))) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','que','los'))) AS BIGINT) AS s_es,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS s_de
        |   FROM documents)),
        |cells AS (SELECT gold, pred, CAST(count(*) AS BIGINT) AS cc
        |          FROM base GROUP BY 1, 2),
        |cls AS (SELECT unnest(['de','en','es']) AS cls),
        |agg AS (
        |  SELECT cls,
        |    coalesce(sum(CASE WHEN gold = cls AND pred = cls THEN cc END), 0) AS tp,
        |    coalesce(sum(CASE WHEN pred = cls AND gold <> cls THEN cc END), 0) AS fp,
        |    coalesce(sum(CASE WHEN gold = cls AND pred <> cls THEN cc END), 0) AS fn
        |  FROM cls CROSS JOIN cells GROUP BY cls)
        |SELECT cls, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |  CAST(fn AS BIGINT) AS fn,
        |  CASE WHEN tp + fp > 0
        |       THEN CAST((1000000 * tp + (tp + fp) // 2) // (tp + fp) AS BIGINT) END
        |    AS precision_ppm,
        |  CASE WHEN tp + fn > 0
        |       THEN CAST((1000000 * tp + (tp + fn) // 2) // (tp + fn) AS BIGINT) END
        |    AS recall_ppm,
        |  CASE WHEN 2 * tp + fp + fn > 0
        |       THEN CAST((2000000 * tp + (2 * tp + fp + fn) // 2)
        |                 // (2 * tp + fp + fn) AS BIGINT) END AS f1_ppm
        |FROM agg ORDER BY cls""".stripMargin,

    // greedy max-coverage replayed as unrolled anti-join rounds (the
    // recursive list_contains form was quadratic in DuckDB at sf10)
    "q_select_cover" -> OracleSql.selectCover,

    // RRF: both rankings rounded before ranking (6/9 dp) so the orders
    // are engine-exact; rank sentinel 0 = absent from that top-50 list;
    // 1/(60+r) divides the same exact integers in both engines
    "q_rank_fusion" ->
      """WITH dl AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
        |tf AS (
        |  SELECT doc_id, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  WHERE term = 'data' GROUP BY 1),
        |dfq AS (SELECT count(*) AS df FROM tf),
        |bm AS (
        |  SELECT doc_id,
        |    round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
        |      (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) + 1e-9, 6) AS score
        |  FROM tf CROSS JOIN dfq JOIN dl USING (doc_id) CROSS JOIN stats),
        |bmr AS (SELECT doc_id,
        |          row_number() OVER (ORDER BY score DESC, doc_id) AS r1
        |        FROM bm),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
        |      FROM embeddings WHERE vec_id = 0),
        |cos AS (
        |  SELECT vec_id AS doc_id,
        |    round(list_reduce(list_transform(range(1, len(qe) + 1), i -> ce[i] * qe[i]),
        |                      (a, b) -> a + b)
        |      / (sqrt(list_reduce(list_transform(ce, x -> x * x), (a, b) -> a + b))
        |       * sqrt(list_reduce(list_transform(qe, x -> x * x), (a, b) -> a + b))), 9)
        |      AS c
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce
        |        FROM embeddings WHERE vec_id <> 0) CROSS JOIN q),
        |cr AS (SELECT doc_id,
        |         row_number() OVER (ORDER BY c DESC, doc_id) AS r2
        |       FROM cos),
        |fused AS (
        |  SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
        |    CAST(coalesce(b.r1, 0) AS BIGINT) AS r1,
        |    CAST(coalesce(c.r2, 0) AS BIGINT) AS r2
        |  FROM (SELECT * FROM bmr WHERE r1 <= 50) b
        |  FULL JOIN (SELECT * FROM cr WHERE r2 <= 50) c ON b.doc_id = c.doc_id)
        |SELECT doc_id, r1, r2,
        |  round(CASE WHEN r1 > 0 THEN 1.0 / (r1 + 60) ELSE 0 END
        |      + CASE WHEN r2 > 0 THEN 1.0 / (r2 + 60) ELSE 0 END + 1e-9, 6) AS rrf
        |FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // NDCG@10/P@10 over the BM25 ranker: ranking key is the 6-dp
    // rounded score (doc_id ties), gains are exact term frequencies
    "q_eval_ndcg" ->
      """WITH dl AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
        |qt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |       FROM documents),
        |qf AS (SELECT doc_id, term FROM qt WHERE term IN ('the','data','model')),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM qf GROUP BY 1, 2),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM qf GROUP BY 1),
        |scored AS (
        |  SELECT tf.term, tf.doc_id, tf.tf,
        |    round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
        |      (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) + 1e-9, 6) AS score
        |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
        |ranked AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rnk,
        |    row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS irnk
        |  FROM scored)
        |SELECT term,
        |  round(sum(CASE WHEN rnk <= 10 THEN tf / log2(rnk + 1.0) END) + 1e-9, 6)
        |    AS dcg10,
        |  round(sum(CASE WHEN irnk <= 10 THEN tf / log2(irnk + 1.0) END) + 1e-9, 6)
        |    AS idcg10,
        |  round(sum(CASE WHEN rnk <= 10 THEN tf / log2(rnk + 1.0) END)
        |      / sum(CASE WHEN irnk <= 10 THEN tf / log2(irnk + 1.0) END) + 1e-9, 6)
        |    AS ndcg10,
        |  round(sum(CASE WHEN rnk <= 10 AND tf >= 2 THEN 1 ELSE 0 END) / 10.0
        |        + 1e-9, 6) AS p10
        |FROM ranked GROUP BY term ORDER BY term""".stripMargin,

    "q_eval_auc" ->
      (ClassifierScoredSql +
      """,
        |g AS (SELECT source, score_ppm, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM sc GROUP BY 1, 2),
        |c AS (SELECT source, score_ppm, cnt, pos,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY score_ppm) AS BIGINT) AS cumall
        |  FROM g),
        |a AS (SELECT source, CAST(sum(pos) AS BIGINT) AS p,
        |    CAST(sum(cnt - pos) AS BIGINT) AS n,
        |    CAST(sum(pos * (2 * (cumall - cnt) + cnt + 1)) AS BIGINT) AS rs2
        |  FROM c GROUP BY 1)
        |SELECT source, p, n, rs2 - p * (p + 1) AS u2,
        |  CASE WHEN p > 0 AND n > 0 THEN
        |    CAST((1000000 * (rs2 - p * (p + 1)) + 2 * p * n) // (4 * p * n) AS BIGINT)
        |  END AS auc_micro
        |FROM a ORDER BY source""").stripMargin,

    "q_eval_calibration" ->
      (ClassifierScoredSql +
      """,
        |b AS (SELECT least(score_ppm // 100000, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(sum(score_ppm) AS BIGINT) AS sum_ppm
        |  FROM sc GROUP BY 1)
        |SELECT bin, n, n_pos,
        |  CAST((2 * sum_ppm + n) // (2 * n) AS BIGINT) AS mean_score_ppm,
        |  CAST((2000000 * n_pos + n) // (2 * n) AS BIGINT) AS pos_rate_ppm
        |FROM b ORDER BY bin""").stripMargin,

    // kappa ships the exact fraction (num/den), never a rounded
    // quotient: kappa can be negative and floor-vs-truncate integer
    // division diverges between engines below zero
    "q_lang_kappa" ->
      """WITH base AS (SELECT source, lang AS gold,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
        |       WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS pred
        |  FROM (SELECT source, lang,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','and','of','to','in'))) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','que','los'))) AS BIGINT) AS s_es,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS s_de
        |   FROM documents)),
        |pm AS (SELECT source, pred AS cat, CAST(count(*) AS BIGINT) AS rp
        |  FROM base GROUP BY 1, 2),
        |gm AS (SELECT source, gold AS cat, CAST(count(*) AS BIGINT) AS rg
        |  FROM base GROUP BY 1, 2),
        |ss AS (SELECT source, CAST(sum(rp * rg) AS BIGINT) AS s
        |  FROM pm JOIN gm USING (source, cat) GROUP BY 1),
        |ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN gold = pred THEN 1 ELSE 0 END) AS BIGINT) AS agree
        |  FROM base GROUP BY 1)
        |SELECT ag.source, n, agree, s,
        |  n * agree - s AS kappa_num, n * n - s AS kappa_den
        |FROM ag JOIN ss USING (source) ORDER BY source""".stripMargin,

    // alpha ships the exact fraction for the same reason kappa does:
    // below-chance alpha is negative and integer division diverges there
    "q_agreement_alpha" ->
      """WITH base AS (SELECT source, lang AS gold,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
        |       WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS pred
        |  FROM (SELECT source, lang,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','and','of','to','in'))) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','que','los'))) AS BIGINT) AS s_es,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS s_de
        |   FROM documents)),
        |pm AS (SELECT source, pred AS cat, CAST(count(*) AS BIGINT) AS rp
        |  FROM base GROUP BY 1, 2),
        |gm AS (SELECT source, gold AS cat, CAST(count(*) AS BIGINT) AS rg
        |  FROM base GROUP BY 1, 2),
        |m2 AS (SELECT source,
        |    CAST(sum((coalesce(rp, 0) + coalesce(rg, 0)) * (coalesce(rp, 0) + coalesce(rg, 0))) AS BIGINT) AS m2sum
        |  FROM pm FULL OUTER JOIN gm USING (source, cat) GROUP BY 1),
        |ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN gold <> pred THEN 1 ELSE 0 END) AS BIGINT) AS disagree
        |  FROM base GROUP BY 1)
        |SELECT ag.source, n, disagree, m2sum,
        |  4 * n * n - m2sum - 2 * disagree * (2 * n - 1) AS alpha_num,
        |  4 * n * n - m2sum AS alpha_den
        |FROM ag JOIN m2 USING (source) ORDER BY source""".stripMargin,

    // the log argument is the exact rational (S*ft + W)/(S*ft): both
    // engines divide the same BIGINTs as doubles and ln the same value
    "q_keywords_ctfidf" ->
      """WITH tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE term <> '' GROUP BY 1, 2),
        |ft AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ft FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS w,
        |    CAST(count(DISTINCT source) AS BIGINT) AS srcs FROM tf),
        |j AS (SELECT source, tf.term, tf,
        |    CAST(round(tf * ln(CAST(srcs * ft + w AS DOUBLE) / CAST(srcs * ft AS DOUBLE)) * 1000000 + 1e-9) AS BIGINT) AS w_ppm
        |  FROM tf JOIN ft USING (term) CROSS JOIN tot),
        |r AS (SELECT source, term, tf, w_ppm,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY w_ppm DESC, term) AS BIGINT) AS rn
        |  FROM j)
        |SELECT source, rn, term, tf, w_ppm FROM r WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin,

    // the peel fixpoint unrolls as three explicit rounds per k (the
    // pointer-jump-oracle precedent); OpsSpec proves round 3 removes
    // nothing on this graph family, so the truncation is exact
    "q_graph_kcore" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents),
        |ed AS (SELECT x.id AS src, y.id AS dst FROM ids x JOIN ids y ON y.id = x.id + 1
        |  UNION ALL
        |  SELECT x.id, y.id FROM ids x JOIN ids y ON x.id % 2 = 0 AND y.id = x.id + 2),
        |ud AS (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed)),
        |v AS (SELECT DISTINCT src AS id FROM ud),
        |k2d1 AS (SELECT src AS id, count(*) AS deg FROM ud GROUP BY 1),
        |k2r1 AS (SELECT v.id FROM v LEFT JOIN k2d1 USING (id) WHERE coalesce(deg, 0) < 2),
        |k2s1 AS (SELECT id FROM v WHERE id NOT IN (SELECT id FROM k2r1)),
        |k2e1 AS (SELECT src, dst FROM ud
        |  WHERE src NOT IN (SELECT id FROM k2r1) AND dst NOT IN (SELECT id FROM k2r1)),
        |k2d2 AS (SELECT src AS id, count(*) AS deg FROM k2e1 GROUP BY 1),
        |k2r2 AS (SELECT s.id FROM k2s1 s LEFT JOIN k2d2 USING (id) WHERE coalesce(deg, 0) < 2),
        |k2s2 AS (SELECT id FROM k2s1 WHERE id NOT IN (SELECT id FROM k2r2)),
        |k2e2 AS (SELECT src, dst FROM k2e1
        |  WHERE src NOT IN (SELECT id FROM k2r2) AND dst NOT IN (SELECT id FROM k2r2)),
        |k2d3 AS (SELECT src AS id, count(*) AS deg FROM k2e2 GROUP BY 1),
        |k2r3 AS (SELECT s.id FROM k2s2 s LEFT JOIN k2d3 USING (id) WHERE coalesce(deg, 0) < 2),
        |k2s3 AS (SELECT id FROM k2s2 WHERE id NOT IN (SELECT id FROM k2r3)),
        |k3d1 AS (SELECT src AS id, count(*) AS deg FROM ud GROUP BY 1),
        |k3r1 AS (SELECT v.id FROM v LEFT JOIN k3d1 USING (id) WHERE coalesce(deg, 0) < 3),
        |k3s1 AS (SELECT id FROM v WHERE id NOT IN (SELECT id FROM k3r1)),
        |k3e1 AS (SELECT src, dst FROM ud
        |  WHERE src NOT IN (SELECT id FROM k3r1) AND dst NOT IN (SELECT id FROM k3r1)),
        |k3d2 AS (SELECT src AS id, count(*) AS deg FROM k3e1 GROUP BY 1),
        |k3r2 AS (SELECT s.id FROM k3s1 s LEFT JOIN k3d2 USING (id) WHERE coalesce(deg, 0) < 3),
        |k3s2 AS (SELECT id FROM k3s1 WHERE id NOT IN (SELECT id FROM k3r2)),
        |k3e2 AS (SELECT src, dst FROM k3e1
        |  WHERE src NOT IN (SELECT id FROM k3r2) AND dst NOT IN (SELECT id FROM k3r2)),
        |k3d3 AS (SELECT src AS id, count(*) AS deg FROM k3e2 GROUP BY 1),
        |k3r3 AS (SELECT s.id FROM k3s2 s LEFT JOIN k3d3 USING (id) WHERE coalesce(deg, 0) < 3),
        |k3s3 AS (SELECT id FROM k3s2 WHERE id NOT IN (SELECT id FROM k3r3))
        |SELECT CAST(k AS BIGINT) AS k, id, CAST(peeled_round AS BIGINT) AS peeled_round FROM (
        |  SELECT 2 AS k, id, 0 AS peeled_round FROM k2s3
        |  UNION ALL SELECT 2, id, 1 FROM k2r1
        |  UNION ALL SELECT 2, id, 2 FROM k2r2
        |  UNION ALL SELECT 2, id, 3 FROM k2r3
        |  UNION ALL SELECT 3, id, 0 FROM k3s3
        |  UNION ALL SELECT 3, id, 1 FROM k3r1
        |  UNION ALL SELECT 3, id, 2 FROM k3r2
        |  UNION ALL SELECT 3, id, 3 FROM k3r3)
        |ORDER BY k, id""".stripMargin,

    // same allocation CTEs as q_sample_neyman; the weight is the
    // round-half-up ppm integer (the q_dedup_soft form)
    "q_sample_weights" ->
      """WITH st AS (
        |  SELECT source, count(*)::HUGEINT AS n,
        |    sum(n_chars::HUGEINT) AS s1, sum((n_chars::HUGEINT) * (n_chars::HUGEINT)) AS s2
        |  FROM documents GROUP BY source),
        |wv AS (
        |  SELECT source, n,
        |    n * (CASE WHEN n > 1
        |      THEN CAST(round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |             / CAST(n * (n - 1) AS DOUBLE)) * 1000000 + 1e-9) AS HUGEINT)
        |      ELSE 0::HUGEINT END) AS w
        |  FROM st),
        |tot AS (SELECT sum(w) AS bigw FROM wv),
        |base AS (
        |  SELECT source, n, (200 * w) // bigw AS base, (200 * w) % bigw AS rem
        |  FROM wv CROSS JOIN tot),
        |def AS (SELECT 200 - sum(base) AS deficit FROM base),
        |alloc AS (
        |  SELECT source, n,
        |    CAST(least(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
        |                           <= deficit THEN 1 ELSE 0 END, n) AS BIGINT) AS n_h
        |  FROM base CROSS JOIN def)
        |SELECT source, CAST(n AS BIGINT) AS n_pop, n_h AS n_samp,
        |  CAST((2000000 * n + n_h) // (2 * n_h) AS BIGINT) AS weight_ppm
        |FROM alloc WHERE n_h > 0 ORDER BY source""".stripMargin,

    "q_dedup_soft" ->
      """WITH k AS (SELECT doc_id, md5(text) AS k FROM documents),
        |m AS (SELECT k, CAST(count(*) AS BIGINT) AS m FROM k GROUP BY 1)
        |SELECT doc_id, m, CAST((2000000 + m) // (2 * m) AS BIGINT) AS weight_ppm
        |FROM k JOIN m USING (k) ORDER BY doc_id""".stripMargin,

    // inverted-index sparse cosine: integer dot/norms; sqrt and ÷ are
    // IEEE-correctly-rounded, so both engines rank identical doubles
    "q_sim_sparse" ->
      """WITH tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(list_transform(
        |      range(1, len(string_split(rtrim(text, ' '), ' '))),
        |      i -> string_split(rtrim(text, ' '), ' ')[i] || ' ' ||
        |           string_split(rtrim(text, ' '), ' ')[i+1])) AS term
        |    FROM documents)
        |  GROUP BY 1, 2),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |kt AS (SELECT term FROM tf CROSS JOIN nd
        |  GROUP BY term, n_docs HAVING count(*) * 10 <= n_docs),
        |kept AS (SELECT tf.* FROM tf JOIN kt USING (term)),
        |norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS norm2
        |  FROM kept GROUP BY 1),
        |qv AS (SELECT doc_id AS q_doc, term, tf AS qtf FROM kept
        |  WHERE doc_id IN (1, 2, 3, 4, 5)),
        |dots AS (SELECT q_doc, k.doc_id, CAST(sum(qtf * k.tf) AS BIGINT) AS dot
        |  FROM kept k JOIN qv USING (term) WHERE k.doc_id <> qv.q_doc GROUP BY 1, 2),
        |sc AS (SELECT q_doc, d.doc_id, dot,
        |    CAST(dot AS DOUBLE) / sqrt(CAST(n1.norm2 AS DOUBLE) * CAST(n2.norm2 AS DOUBLE)) AS cos
        |  FROM dots d JOIN norms n1 ON n1.doc_id = d.doc_id
        |  JOIN norms n2 ON n2.doc_id = d.q_doc),
        |r AS (SELECT q_doc, doc_id, dot, cos,
        |    row_number() OVER (PARTITION BY q_doc ORDER BY cos DESC, doc_id) AS rank
        |  FROM sc)
        |SELECT q_doc, CAST(rank AS BIGINT) AS rank, doc_id, dot,
        |  round(cos + 1e-9, 6) AS cos
        |FROM r WHERE rank <= 10 ORDER BY q_doc, rank""".stripMargin,

    // adjacent-run collapse via DuckDB's indexed list comprehension
    "q_dedup_runs" ->
      """SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |  CAST(len(kept) AS BIGINT) AS n_after,
        |  array_to_string(kept, ' ') AS collapsed
        |FROM (SELECT doc_id, w,
        |        [w[i] for i in range(1, len(w)+1) if i = 1 or w[i] != w[i-1]] AS kept
        |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "q_mix_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE lang WHEN 'en' THEN 'e6' WHEN 'de' THEN '80' WHEN 'fr' THEN '80'
        |            WHEN 'es' THEN '40' WHEN 'zh' THEN '40' ELSE '00' END
        |ORDER BY doc_id""".stripMargin,

    // the parsed header fields have closed forms over the source columns
    "q_mm_metadata" ->
      """SELECT doc_id, 'GFT1' AS fmt,
        |  CAST(doc_id % 640 + 16 AS BIGINT) AS width_p,
        |  CAST(n_chars % 480 + 16 AS BIGINT) AS height_p,
        |  CAST(len(text) AS BIGINT) AS body_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_tpch_q6ish" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q_tpch_q4ish" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q7ish" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_tpch_q13ish" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // correlated form in the oracle; the engine runs the de-correlated join
    "q_tpch_q17ish" ->
      """SELECT
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 + 1e-9, 4)
        |    AS avg_yearly,
        |  count(*) AS n
        |FROM lineitem l1
        |WHERE l_quantity < 0.2 * (
        |  SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity)
        |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,

    "q_tpch_q14ish" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(month(l_shipdate) AS BIGINT) AS l_month,
        |  CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |        THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE) AS promo_rev,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_rev,
        |  round(CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |          THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE) * 100.0
        |        / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |        + 1e-9, 6) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_tpch_q19ish" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "q_tpch_q22ish" ->
      """WITH avg_bal AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
        |FROM customer, avg_bal
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_tpch_q8ish" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_7'
        |        THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
        |    AS nation_rev,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_rev,
        |  round(CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_7'
        |          THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE) * 100.0
        |        / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |        + 1e-9, 6) AS mkt_share
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // factor-first exact decimal profit (matches the Spark side's
    // cast-before-multiply rule); 0.6·p_retailprice is the documented
    // partsupp-free surrogate supply cost
    "q_tpch_q9ish" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |         - CAST(0.6 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(18,1))
        |           * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Q2 shape: min-cost supplier per part — lineitem's min extended
    // price is the documented ps_supplycost surrogate; the correlated
    // min is exact DECIMAL so the equality never float-drifts
    "q_tpch_q2ish" ->
      """WITH eu_supp AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |costs AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem JOIN eu_supp ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |best AS (
        |  SELECT *, min(cost) OVER (PARTITION BY partkey) AS min_cost FROM costs)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |       CAST(cost AS DOUBLE) AS cost
        |FROM best JOIN part ON partkey = p_partkey
        |  JOIN eu_supp ON suppkey = s_suppkey
        |WHERE cost = min_cost AND p_size BETWEEN 10 AND 20 AND p_type = 'SMALL'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    // Q11 shape: HAVING vs scalar subquery; threshold compared as
    // value*1000 > total in exact decimal (boundary-stable)
    "q_tpch_q11ish" ->
      """WITH asia_supp AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |val AS (
        |  SELECT l_partkey AS partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * CAST(l_quantity AS DECIMAL(18,2))) AS value
        |  FROM lineitem JOIN asia_supp ON l_suppkey = s_suppkey
        |  GROUP BY 1)
        |SELECT partkey, CAST(value AS DOUBLE) AS value FROM val
        |WHERE value * 1000 > (SELECT sum(value) FROM val)
        |ORDER BY value DESC, partkey""".stripMargin,

    // Q16 shape: distinct-supplier census with a blocklist anti join
    // (negative acctbal = the "complaints" surrogate)
    "q_tpch_q16ish" ->
      """SELECT p_brand, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type <> 'PROMO' AND p_brand <> 'Brand#5'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 100""".stripMargin,

    // Q20 shape: both quantity sums from ONE pass over the red-part
    // slice; 2·q97 > qa exact decimal; NULL q97 (no 1997 rows) drops
    "q_tpch_q20ish" ->
      """WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
        |g AS (
        |  SELECT l_suppkey AS suppkey,
        |    sum(CASE WHEN year(l_shipdate) = 1997
        |             THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS q97,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS qa
        |  FROM lineitem JOIN red ON l_partkey = p_partkey
        |  GROUP BY l_suppkey, l_partkey)
        |SELECT s_name, s_acctbal FROM supplier
        |WHERE s_suppkey IN (SELECT suppkey FROM g WHERE q97 * 2 > qa)
        |  AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        |ORDER BY s_name""".stripMargin,

    "q_tpch_q12ish" ->
      """SELECT CASE
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60 THEN '60+'
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 30 THEN '31-60'
        |    ELSE '0-30' END AS delay_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tpch_q15ish" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    // correlated EXISTS/NOT-EXISTS form in the oracle; the engine runs
    // the de-correlated per-order aggregate + join-back
    "q_tpch_q21ish" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,

    "q_listagg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    // bitmap two-level aggregation is EXACT — plain COUNT(DISTINCT) oracle
    "q_agg_bitmap" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_explode_outer" ->
      """SELECT doc_id, w AS word
        |FROM (SELECT doc_id, regexp_extract_all(text, 'qu[a-z]+') AS arr FROM documents)
        |LEFT JOIN LATERAL (SELECT unnest(arr) AS w) AS t ON TRUE
        |ORDER BY doc_id, word""".stripMargin,

    // layout-independent closure of the per-file rollup: per-file rows
    // tile the table exactly whatever the file count, so the oracle is
    // a plain table aggregate at any write layout
    "q_file_provenance" ->
      """SELECT count(*) AS n_rows, min(doc_id) AS min_id,
        |  max(doc_id) AS max_id
        |FROM documents""".stripMargin,

    // every doc has >= 10 words, so words[1..4] are always present
    "q_array_funcs3" ->
      """SELECT doc_id,
        |  'BOS,' || array_to_string(string_split(text,' ')[1:3], ',') AS pre3,
        |  array_to_string(string_split(text,' ')[1:3], ',') || ',EOS' AS app3,
        |  string_split(text,' ')[1] || '-' || string_split(text,' ')[2] || ',' ||
        |    string_split(text,' ')[2] || '-' || string_split(text,' ')[3] || ',' ||
        |    string_split(text,' ')[3] || '-' || string_split(text,' ')[4] AS zipped,
        |  lang || ',' || lang || ',' || lang AS rep_lang,
        |  array_to_string(list_filter([nullif(lang,'en'), 'x'], x -> x IS NOT NULL), ',') AS compacted,
        |  string_split(text,' ')[1] || ',<INS>,' ||
        |    string_split(text,' ')[2] || ',' || string_split(text,' ')[3] AS inserted
        |FROM documents ORDER BY doc_id""".stripMargin,

    // props is always {"k": <int>} → the map is {k: v}, m2 adds e=event_id%7
    "q_map_funcs2" ->
      """SELECT event_id,
        |  'e,k' AS keys_sorted,
        |  array_to_string(
        |    list_sort(['e=' || CAST((event_id % 7) * 2 AS VARCHAR),
        |               'k=' || CAST(CAST(json_extract(props,'$.k') AS BIGINT) * 2 AS VARCHAR)]),
        |    ',') AS doubled_entries,
        |  CAST(CASE WHEN CAST(json_extract(props,'$.k') AS BIGINT) > 10 THEN 1 ELSE 0 END
        |       + CASE WHEN event_id % 7 > 10 THEN 1 ELSE 0 END AS BIGINT) AS n_big
        |FROM events ORDER BY event_id""".stripMargin,

    "q_date_funcs3" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS full_s,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs2" ->
      """SELECT p_partkey,
        |  round(sin(p_retailprice / 1000.0) + 1e-9, 6) AS sin_v,
        |  round(cos(p_retailprice / 1000.0) + 1e-9, 6) AS cos_v,
        |  round(atan2(CAST(p_size AS DOUBLE), p_retailprice / 100.0) + 1e-9, 6) AS at2,
        |  round(log2(p_size) + 1e-9, 6) AS lg2,
        |  round(cbrt(p_retailprice) + 1e-9, 6) AS cbr,
        |  CAST(sign(p_retailprice - 1000.0) AS BIGINT) AS sgn,
        |  CAST(factorial(p_size % 10) AS BIGINT) AS fact
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_string_funcs3" ->
      """SELECT p_partkey,
        |  CAST(ascii(substr(p_name, 1, 1)) AS BIGINT) AS first_code,
        |  chr(CAST(65 + p_partkey % 26 AS INT)) AS bucket_chr,
        |  left(p_name, 5) AS pre5,
        |  right(p_name, 4) AS suf4,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS a_pos
        |FROM part ORDER BY p_partkey""".stripMargin,

    // props is always {"k": <int>} and to_json has a closed per-row form
    "q_json_funcs2" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
        |  'STRUCT<k: BIGINT>' AS schema_s,
        |  '{"event_id":' || event_id || '}' AS tj
        |FROM events ORDER BY event_id""".stripMargin,

    // DuckDB date_trunc returns DATE → cast back to TIMESTAMP (trap)
    "q_impute_locf" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    max(CASE WHEN event_type = 'purchase' THEN value END) AS pval
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, day, pval,
        |  last_value(pval IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
        |FROM daily ORDER BY user_id, day""".stripMargin,

    "q_window_trailing" ->
      """SELECT event_id, user_id, ts,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS v_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_collation" ->
      """SELECT lower(CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
        |             ELSE lower(p_type) END) AS label,
        |  count(*) AS n
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,

    // Asia/Kolkata is a fixed +05:30 offset (no DST) → exact closed form
    "q_timezone_funcs" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL '5 hours 30 minutes' AS ist,
        |  CAST(hour(o_orderdate + INTERVAL '5 hours 30 minutes') AS BIGINT) AS ist_hour,
        |  o_orderdate AS utc_again
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_agg_regr" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity) + 1e-9, 6) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity) + 1e-9, 6) AS icept,
        |  round(regr_r2(l_extendedprice, l_quantity) + 1e-9, 6) AS r2,
        |  regr_count(l_extendedprice, l_quantity) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_pivot2" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click_n,
        |  CAST(coalesce(sum(CAST(value AS DECIMAL(18,6))) FILTER (event_type = 'click'), 0) AS DOUBLE) AS click_v,
        |  count(*) FILTER (event_type = 'purchase') AS purchase_n,
        |  CAST(coalesce(sum(CAST(value AS DECIMAL(18,6))) FILTER (event_type = 'purchase'), 0) AS DOUBLE) AS purchase_v
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_join_bucketed" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gross
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_source_text" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(len(text)) AS BIGINT) AS total_chars,
        |  count(DISTINCT text) AS n_distinct
        |FROM documents""".stripMargin,

    // 4 engine-written text part-files; bytes = ascii text + 1 newline/row
    "q_source_binaryfile" ->
      """SELECT CAST(4 AS BIGINT) AS n_files,
        |  CAST(sum(len(text) + 1) AS BIGINT) AS total_bytes,
        |  CAST(sum(len(text) + 1) AS BIGINT) AS content_bytes
        |FROM documents""".stripMargin,

    "q_recursive_cte" ->
      """WITH RECURSIVE reach(id, depth) AS (
        |  SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS depth
        |  UNION ALL
        |  SELECT i.doc_id, r.depth + 1
        |  FROM reach r JOIN documents i
        |    ON i.doc_id // 2 = r.id AND i.doc_id >= 2)
        |SELECT depth, count(*) AS n_nodes, CAST(sum(id) AS BIGINT) AS id_sum
        |FROM reach GROUP BY depth ORDER BY depth""".stripMargin,

    // the XML is built from columns → every parsed value has a closed form
    "q_xml_funcs" ->
      """SELECT doc_id, lang AS x_lang, n_chars AS x_n, n_chars AS p_n
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_encoding_funcs" ->
      """SELECT doc_id,
        |  to_base64(CAST(substr(text, 1, 20) AS BLOB)) AS b64,
        |  substr(text, 1, 20) AS rt,
        |  hex(CAST(lang AS BLOB)) AS lang_hex,
        |  printf('%s-%05d', lang, doc_id) AS tag
        |FROM documents ORDER BY doc_id""".stripMargin,

    // word-soup text has no punctuation → sentences() ≡ one whitespace
    // tokenization per document
    "q_sentences" ->
      """SELECT doc_id, CAST(1 AS BIGINT) AS n_sents,
        |  array_to_string(string_split(text, ' '), ',') AS tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
