"""Contract-query plans (SURVEY.md §2) and their DuckDB oracles.

Importing this package populates the registry. Each module binds reusable
operators to the fixture tables and registers ``(name, fn, oracle_sql)``
via :mod:`mapreduce_hw05_spark.plans.registry`.
"""

from mapreduce_hw05_spark.plans import (  # noqa: F401  (import = register)
    relational,
    scalar_funcs,
    window_queries,
    events_queries,
    text_queries,
    text_analysis_queries,
    similarity_queries,
    udf_queries,
    graph_queries,
    io_queries,
    streaming_queries,
    subquery_queries,
    agg_ext_queries,
    etl_queries,
    analytics_queries,
    pipeline_queries,
    tpch_queries,
    governance_queries,
)
from mapreduce_hw05_spark.plans.registry import ORACLES, QUERIES

#: The correctness driver verifies the FIRST 50 registered queries only
#: (registration-order prefix of ``queries()``). Module import order above
#: would leave that window all-relational, so the registry is re-ordered
#: here: a curated window that (a) re-verifies contracts fixed this round
#: and (b) rotates in one-or-more flagships from every SURVEY §2 family
#: that had no driver-green CORRECTNESS row yet (LLM dedup/text/similarity,
#: UDF u-1…u-5, graph g-1…g-4, IO/connectors, streaming-executed st-5/6/7
#: + CDC, subqueries, Spark-4 SQL, sketches, pipeline, table maintenance,
#: TPC-H). Rotate per round until every family has been driver-green.
#: Every name here MUST have a SQL oracle — the driver records
#: ``err: no_oracle`` for rows-only contracts instead of rows-checking.
DRIVER_WINDOW = [
    # round-2 fixes (re-verify)
    "q_decimal_exact", "q_approx_distinct",
    # j-9 as-of join
    "q_asof_join",
    # llm dedup family (exact / MinHash-Jaccard / embedding / SimHash / n-gram)
    "q_dedup_exact", "q_near_dup_jaccard", "q_near_dup_embedding",
    "q_simhash_near_dup", "q_near_dup_ngram",
    # llm text ops + text analysis
    "q_wordcount", "q_text_stats_by_lang", "q_tfidf_top_terms",
    "q_language_id", "q_quality_score",
    # similarity search + kNN
    "q_similarity_topk", "q_knn_accuracy",
    # array functions
    "q_array_ops",
    # UDF surface u-1…u-5
    "q_udf_python", "q_pandas_udf_cosine", "q_grouped_map_zscore",
    "q_udaf_geomean", "q_udtf_tokens",
    # graph / iterative
    "q_triangle_count", "q_connected_components", "q_pagerank",
    "q_kmeans", "q_degree_distribution",
    # sources / sinks / connectors / multimodal
    "q_csv_roundtrip", "q_partitioned_pruning", "q_custom_datasource",
    "q_multimodal_features",
    # streaming-executed (incl. st-5/st-6/st-7 + exactly-once CDC sink)
    "q_stream_batch_equiv", "q_stream_static_join", "q_stream_dedup",
    "q_stream_stateful_counts", "q_stream_upsert_cdc",
    # correlated subqueries
    "q_exists_shiplag", "q_correlated_avg_qty",
    # Spark-4 SQL surface
    "q_recursive_cte", "q_lateral_topn",
    # aggregation extensions + sketches
    "q_grouping_sets", "q_median_exact", "q_approx_quantile",
    "q_hll_rollup",
    # distributed PCA
    "q_pca_variance",
    # training-data pipeline
    "q_stratified_sample", "q_pack_sequences", "q_decontaminate",
    # table maintenance / CDC
    "q_cdc_merge", "q_scd2_history",
    # TPC-H shape
    "q_tpch_q3",
]


#: Rotation plan for future rounds (98 queries never driver-verified
#: after r1+r2; swap DRIVER_WINDOW to R3 next round, R4 the one after —
#: then every contract has a driver-green CORRECTNESS row at least once).
#: R3 = the heavier/streaming/connector half; R4 = the remaining batch.
DRIVER_WINDOW_R3 = [
    # streaming-executed + connectors (the expensive, highest-risk set)
    "q_stream_stream_join", "q_stream_stream_outer", "q_stream_stream_full",
    "q_stream_stream_right", "q_stream_session_window", "q_stream_file_sink",
    "q_stream_exactly_once_cdc", "q_stream_compacted_sink",
    "q_custom_stream_source", "q_custom_sink_roundtrip",
    "q_json_roundtrip", "q_orc_roundtrip", "q_xml_roundtrip",
    "q_permissive_csv", "q_bucketed_join_contract",
    # iterative / sketch / ML contracts converted in r2
    "q_near_dup_lsh", "q_ann_ivf_topk", "q_ann_lsh_topk",
    "q_logreg_train", "q_logreg_score", "q_bpe_merges", "q_bpe_encode",
    "q_kll_rollup", "q_theta_sketch_ops", "q_pretrain_pipeline",
    "q_khop_reach", "q_embedding_quantize",
    # table maintenance
    "q_compact_small_files", "q_zorder_rewrite", "q_incremental_rollup",
    "q_profile_events", "q_pit_join",
    # TPC-H remainder (half)
    "q_tpch_q5", "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9_profit",
    "q_tpch_q10", "q_tpch_q13",
    # analytics (half)
    "q_funnel_steps", "q_cohort_retention", "q_regression_stats",
    "q_histogram_totalprice", "q_iqr_outliers", "q_event_transitions",
    # governance (half)
    "q_redact_pii", "q_k_anonymity", "q_dq_expectations",
    # time series
    "q_gapfill_hourly", "q_ohlc_hourly",
]

DRIVER_WINDOW_R4 = [
    "q_variant_json", "q_time_weighted_avg", "q_event_sequences",
    "q_token_stats", "q_fingerprint_groups", "q_simhash",
    "q_chunk_documents", "q_fuzzy_name_match", "q_repetition_score",
    "q_token_entropy", "q_bigram_pmi", "q_having_in_big_orders",
    "q_max_price_in_brand", "q_multi_supplier_late", "q_conditional_agg",
    "q_string_agg", "q_min_max_by", "q_stats_moments", "q_null_safe_join",
    "q_sample_hash", "q_rank_distribution", "q_salted_join_contract",
    "q_two_phase_agg_contract", "q_bloom_join_contract",
    "q_join_hints_contract", "q_winsorized_mean", "q_percent_of_total",
    "q_conditional_distinct", "q_rfm_segments", "q_rolling_dau",
    "q_skyline_pareto", "q_cumulative_users", "q_mom_growth", "q_lm_score",
    "q_decontaminate_ngram", "q_dedup_clusters", "q_inverted_index",
    "q_pseudonymize_users", "q_domain_mix", "q_tpch_q14", "q_tpch_q19",
    "q_tpch_q15", "q_tpch_q22", "q_tpch_q16_suppliers", "q_tpch_q2_mincost",
    "q_tpch_q20_semi_chain", "q_union_by_name", "q_schema_evolution",
    # late-r2 additions (landed after the r3 list was frozen at 50;
    # R4 may exceed 50 — the r4 curator trims/rolls the tail to r5)
    "q_stream_sketch_rollup", "q_stream_late_data", "q_stream_sliding",
]


def _reorder_registry() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    unoracled = [n for n in DRIVER_WINDOW if n in QUERIES and n not in ORACLES]
    if missing or unoracled:
        raise RuntimeError(
            f"DRIVER_WINDOW broken: missing={missing} unoracled={unoracled}"
        )
    for d in (QUERIES, ORACLES):
        head = {n: d[n] for n in DRIVER_WINDOW if n in d}
        tail = {n: v for n, v in d.items() if n not in head}
        d.clear()
        d.update(head)
        d.update(tail)


_reorder_registry()

__all__ = ["QUERIES", "ORACLES", "DRIVER_WINDOW"]
