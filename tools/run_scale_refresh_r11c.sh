#!/bin/bash
# r11 clean-epoch full refresh of BENCH_SCALE_400x (OPTIMIZATION_r11 "not yet" #4).
# Excludes the 7 serve_*-measured serving rows: their serve fields come from
# side harnesses (BENCH_*_SERVING.json); refreshing only the build-inclusive
# number would mix epochs WITHIN a row. Notes (cap/one-shot/build/adjudication)
# are re-attached by tools/annotate_scale_400x.py + tools/restore_400x_notes.py.
set -e
cd "$(dirname "$0")/.."

if [ -z "$SKIP_CHUNK_0" ]; then
SPARK_GRAFT_SCALE_QUERIES="q01_pricing_summary,q02_scan_project,q03_filter_predicates,q04_orderby_limit,q06_distinct,q07_count_distinct,q09_rollup,q100_stream_stream_join,q101_dedup_within_watermark,q104_grouping_id,q105_try_arithmetic,q106_collect_set,q107_bit_aggregates,q108_exact_correlation,q109_dedup_decision,q10_cube,q110_cross_modal_join,q111_source_stats,q112_returned_items,q113_sql_subqueries,q114_lateral_explode,q115_forecast_revenue,q116_priority_checking,q117_large_volume_customers" python tools/bench_scale.py 400 2>> /tmp/scale_r11c.stderr
echo "== refresh chunk 0 done =="
fi
if [ -z "$SKIP_CHUNK_1" ]; then
SPARK_GRAFT_SCALE_QUERIES="q119_range_frame_window,q11_star_join,q120_train_val_test_split,q121_chunking,q122_containment,q123_volume_shipping,q124_market_share,q125_customer_distribution,q126_promo_revenue,q127_top_supplier,q128_small_qty_revenue,q129_discounted_revenue,q12_fact_fact_join,q130_sales_opportunity,q132_min_cost_supplier,q133_product_type_profit,q134_important_stock,q135_shipping_modes,q136_parts_supplier_relationship,q137_potential_promotion,q138_waiting_suppliers,q139_data_mixing,q13_left_join,q140_frame_offsets" python tools/bench_scale.py 400 2>> /tmp/scale_r11c.stderr
echo "== refresh chunk 1 done =="
fi
if [ -z "$SKIP_CHUNK_2" ]; then
SPARK_GRAFT_SCALE_QUERIES="q141_duplicate_spans,q142_gopher_rules,q144_unigram_perplexity,q147_stream_static_enrich,q148_pipeline_capstone,q149_stateful_running_stats,q14_semi_join,q151_content_hash_sample,q153_session_windows,q154_sentence_udtf,q155_bigram_lift,q156_variant_json,q157_unpivot_measures,q158_upsert_snapshot,q159_ccnet_buckets,q15_anti_join,q160_outlier_zscore,q161_funnel,q162_cohort_retention,q164_stateful_stats_native,q165_pagerank_exact,q166_storage_merge_roundtrip,q167_rollup_serving,q168_shingle_neardup_full" python tools/bench_scale.py 400 2>> /tmp/scale_r11c.stderr
echo "== refresh chunk 2 done =="
fi
if [ -z "$SKIP_CHUNK_3" ]; then
SPARK_GRAFT_SCALE_QUERIES="q171_shipmode_rollup_serving,q173_shipmode_mv_serving,q177_ivf_index_maintenance,q178_dedup_ledger_maintenance,q17_cross_join,q181_decontam_ledger_maintenance,q183_dsir_importance_selection,q186_hybrid_index_serving,q188_streaming_curation_capstone,q189_bootstrap_attach_enrich,q18_range_join,q19_asof_join,q20_window_topk,q21_window_running,q22_window_lag,q29_json_extract,q32_date_funcs,q33_scalar_subquery,q34_pivot,q36_sessionize,q37_tumbling_window,q38_bfs_reachability,q40_html_categories,q41_html_last_edited" python tools/bench_scale.py 400 2>> /tmp/scale_r11c.stderr
echo "== refresh chunk 3 done =="
fi
if [ -z "$SKIP_CHUNK_4" ]; then
SPARK_GRAFT_SCALE_QUERIES="q42_word_count,q43_extract_text,q44_category_distribution,q45_converter_output,q46_url_normalize,q47_sanitize_filename,q48_array_ops,q50_exact_dedup,q51_hash_dedup,q52_token_jaccard,q53_shingle_neardup,q60_lang_id,q61_quality_score,q62_token_count,q63_fingerprint,q64_binary_meta,q66_grouping_sets,q67_tfidf_top_terms,q68_stopword_filter,q69_sentiment,q70_stream_tumbling,q71_stream_dedup,q72_stream_fanout,q73_sliding_window" python tools/bench_scale.py 400 2>> /tmp/scale_r11c.stderr
echo "== refresh chunk 4 done =="
fi
if [ -z "$SKIP_CHUNK_5" ]; then
SPARK_GRAFT_SCALE_QUERIES="q75_minmax_by,q76_conditional_agg,q78_date_arithmetic,q79_null_funcs,q81_salted_join,q82_heavy_hitters,q84_map_ops,q85_merge_upsert,q86_decontamination,q87_repetition,q88_pii_redaction,q89_stratified_sample,q90_sequence_packing,q92_correlated_subquery,q93_window_value_funcs,q96_explode_outer,q97_struct_ops,q98_shipping_priority,q99_local_supplier_volume" python tools/bench_scale.py 400 2>> /tmp/scale_r11c.stderr
echo "== refresh chunk 5 done =="
fi
