"""Declared query inventory — the correctness surface (SURVEY.md §2).

Each submodule exposes ``QUERIES: dict[name, (spark_fn, oracle_sql | None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
equivalent ANSI SQL for the DuckDB oracle (None -> rows-only check for
non-SQL-expressible ops).

Determinism discipline (SURVEY.md §7.3 + FIXTURES.md §3):
- every aggregate/computed column aliased identically in Spark and SQL;
- double sums routed through DECIMAL casts in BOTH engines (exact arithmetic,
  immune to parallel-summation order differences);
- kernel outputs rounded as specified (4 dp volatility, 3 dp normalize);
- no raw current_timestamp in compared output.
"""

from __future__ import annotations

# Driver-coverage ordering (round 6). The per-round driver oracle run covers
# a time-budgeted prefix of this dict (~50 entries/round), so emission order
# decides which queries get a hard CORRECTNESS row. Union coverage r01-r05 is
# 118/118 green; the rotation policy is LONGEST-UNCHECKED FIRST (VERDICT r05
# ask #2): (0) the 23 queries whose latest driver row is r03 — code under
# several has changed since (stats_moments skew/kurt columns, zorder
# distributed ntile, shared pair-table cluster family); (1) queries new this
# round with no driver history at all; (2) the r04-checked block; (3) the
# r05-checked block (freshest — can wait a round). Within each block,
# cost-ascending by BENCH_r05 wall time so the time-budgeted prefix lands
# the most hard rows.
_STALE_R3 = [
    "stream_sample", "pandas_udf_normalize", "weekly_stats", "stats_moments",
    "grouped_scale_pandas", "text_profile", "ngram_logprob", "zorder_layout",
    "passage_dedup", "daily_stats", "date_construction", "event_window_agg",
    "event_sliding_window", "event_sessions", "event_json_props",
    "daily_stats_sql_udfs", "dataset_split", "array_functions",
    "date_functions", "doc_quality_signals", "corpus_curation",
    "corpus_mixture", "bpe_pair_counts",
]
_CHECKED_R4 = [
    "variant_extract", "stratified_sample_n", "rolling_user_stats",
    "sequence_packing", "multimodal_frames", "multimodal_meta",
    "pii_redaction", "pandas_udaf_quartiles", "hll_distinct_users",
    "udtf_chunk", "range_join_windows", "quantile_sketch_value",
    "hll_mergeable_rollup", "lateral_join", "q10_returned_items",
    "tfidf_terms", "recursive_cte", "q5_local_supplier_volume",
    "table_changes_cdf", "multimodal_embed_ann", "kmeans_clusters",
    "pagerank_centrality", "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash", "ann_bruteforce_topk", "ann_lsh_bucketed",
    "ann_ivf_topk", "dedup_embedding_cosine", "contamination_check",
    "cdc_apply_changes", "ann_recall_eval", "asof_cogrouped",
    "asof_view_purchase", "calendar_gapfill", "doc_chunking", "bm25_search",
    "cms_heavy_hitters", "collation_ops", "ann_pq_topk", "ann_ivfpq_topk",
    "dedup_incremental", "dedup_clusters", "dedup_keep_summary",
    "dedup_keep_best",
]
_CHECKED_R5 = [
    "watermark_filter", "order_limit", "q6_forecast_revenue",
    "sql_session_variables", "window_family2", "join_anti", "join_semi",
    "neardup_triangles", "q14_promo_revenue", "percentile_stats",
    "pivot_agg", "set_ops", "q15_top_supplier", "subquery_family",
    "join_right_outer", "q22_sales_opportunity", "snowflake_dialect_qualify",
    "join_left_outer", "q19_disjunctive", "q17_small_quantity",
    "window_family", "merge_upsert_rewrite", "skew_two_phase_agg",
    "q18_large_orders", "join_full_outer", "q4_order_priority",
    "q7_volume_shipping", "skew_salted_join", "q1_pricing_summary",
    "unpivot_agg", "rollup_agg", "grouping_sets_agg", "q16_supplier_variety",
    "q3_top_revenue", "merge_pruned_partitions", "semdedup_keep",
    "knn_graph", "region_revenue", "knn_graph_lsh", "fuzzy_name_match",
    "agg_global_minmax", "case_string_funcs", "cast_coercion", "cube_agg",
    "distinct_agg", "dedup_ngram_jaccard", "decimal_typed_stats",
    "cms_grouped_hitters", "data_quality_report", "dml_update_delete",
]
_STALE_R3_RANK = {n: i for i, n in enumerate(_STALE_R3)}
_R4_RANK = {n: i for i, n in enumerate(_CHECKED_R4)}
_R5_RANK = {n: i for i, n in enumerate(_CHECKED_R5)}

# r06-new queries, cost-ascending (measured sf0.01 bench seconds) — the
# driver's sample is TIME-budgeted, so cheap new queries first maximizes
# how many of this round's additions get a driver correctness row.
_NEW_R6_COST = {
    "snowflake_dialect_datetime": 0,
    "doc_classifier_margin": 1,
    "snowflake_dialect_qualify_nested": 2,
    "q12_ship_priority": 3,
    "embedding_gram": 4,
    "q13_customer_distribution": 5,
    "q11_important_parts": 6,
    "q20_promo_suppliers": 7,
    "weighted_sample_docs": 8,
    "q9_product_profit": 9,
    "q8_market_share": 10,
    "q21_waiting_suppliers": 11,
    "event_cohort_retention": 12,
    "q2_min_cost_supplier": 13,
    "doc_nb_quality": 14,
    "table_clone_changes": 15,
    "hll_audience_overlap": 16,
    "knn_graph_ivf2": 17,
    "event_funnel": 18,
    "semdedup_keep_lsh": 19,
    "ann_index_lifecycle": 20,
    "dedup_embedding_incremental": 21,
    "neardup_clustering_coeff": 22,
    "ann_index_append": 23,
    "doc_text_knn": 18,  # ~2 s in-batch; ties into the funnel/knn band
    "dedup_embedding_incremental_auto": 21,
}


def all_queries() -> dict:
    from . import (
        pipeline_queries,
        relational,
        relational2,
        similarity,
        sketches_q,
        spark4,
        streamops,
        temporal_prep,
        textops,
        tpch22,
        tpch_more,
    )

    out: dict = {}
    for mod in (
        relational,
        relational2,
        pipeline_queries,
        streamops,
        textops,
        similarity,
        temporal_prep,
        sketches_q,
        spark4,
        tpch_more,
        tpch22,
    ):
        out.update(mod.QUERIES)

    def rank(item):
        name, (_fn, _sql) = item
        if name in _STALE_R3_RANK:  # stalest: no driver row since r03
            return (0, _STALE_R3_RANK[name])
        if name in _R4_RANK:
            return (2, _R4_RANK[name])
        if name in _R5_RANK:  # freshest — can wait a round
            return (3, _R5_RANK[name])
        # new this round: no driver history yet; cost-ascending so the
        # time-budgeted sample covers as many new queries as possible
        return (1, _NEW_R6_COST.get(name, len(_NEW_R6_COST)), name)

    return dict(sorted(out.items(), key=rank))
