"""Mechanical invariants of the driver contract registry — guards
against rotation bookkeeping drift (the window composition is
hand-maintained; these assertions catch the failure modes)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# every query that is NEW in round 8, or over code that CHANGED in
# round 8 (first/fresh driver verdict pending), must sit inside the
# 50-slot driver window
ROUND8_NEW = [
    "etl_profile_table", "etl_profile_table_fast",
    "quality_trigram_ppl", "quality_ppl_gate",
    "events_tumbling_counts", "events_hopping_counts",
    "etl_upsert_nodes", "quality_mixture_sample", "quality_clf_weights",
    "sim_semantic_dedup_pairs",
    # the round-8 TPC-H completion battery (first driver verdicts)
    "q2_min_cost_supplier", "q9_product_type_profit", "q11_important_supply",
    "q12_priority_shipping", "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_quantity_revenue", "q20_dominant_suppliers", "q21_waiting_orders",
    # round-8 second batch: tokenizer apply, JL projection, BM25
    "text_bpe_encode", "sim_random_projection", "text_bm25_rank",
    "graph_kcore", "quality_dataset_split", "text_url_dedup",
    "text_normalize",
    "events_funnel", "events_retention", "basket_frequent_pairs",
    "text_entity_clusters",
    "events_threshold_crossings",
    "etl_expectations",
    # round-8 fourth batch: attribution, SCD-2, cascade delete, LPA,
    # BFS, PMI collocations, z-score outliers
    "events_attribution", "etl_scd2_history", "etl_cascade_delete",
    "graph_label_propagation", "graph_bfs_distances",
    "text_pmi_bigrams", "quality_zscore_outliers",
    # round-8 fifth batch: rolling median, snapshot diff, histogram,
    # correlation matrix, column masking
    "events_rolling_median", "etl_snapshot_diff", "quality_histogram",
    "quality_corr_matrix", "etl_mask_columns",
    # round-8 sixth batch: EWMA, Markov transitions, inverted index,
    # HITS
    "events_ewma", "events_markov", "text_inverted_index", "graph_hits",
    # round-8 seventh batch: negative sampling, Bellman-Ford,
    # stream-static enrichment twin
    "quality_negative_samples", "graph_bellman_ford",
    "events_enriched_stats",
    # round-8 eighth batch: Z-order layout, quantile normalization,
    # OHLC resampling (window overflow — these lead the r9 window)
    "etl_zorder_layout", "quality_quantile_normalize", "events_ohlc",
    "text_feature_hashing", "events_covisitation",
    "events_ohlc_windowed",
    "quality_group_percentiles", "events_spike_detection",
    "events_session_windows", "sim_ranking_eval", "quality_pr_curve",
    "sim_embedding_drift", "quality_winsorize",
    "etl_apply_cdc", "etl_scd2_pit", "graph_neighbor_stats",
    "graph_random_walks",
]


def test_every_query_has_an_oracle():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = sorted(set(qs) - set(osql))
    assert not missing, f"queries without oracle_sql entries: {missing}"
    orphans = sorted(set(osql) - set(qs))
    assert not orphans, f"oracle_sql entries without queries: {orphans}"


def test_round8_first_verdict_queries_in_window():
    """The 50-slot window cannot hold every round-8 addition any more
    (52 new queries): the overflow MUST sit at the head of the tail
    (positions 51+) so it leads the r9 window — first driver verdicts
    are delayed exactly one round, never silently dropped."""
    names = list(entry.queries())
    window, tail_head = names[:50], names[50:70]
    missing = [q for q in ROUND8_NEW if q not in window]
    assert missing == [q for q in tail_head if q in ROUND8_NEW], (
        f"round-8 first-verdict queries neither in-window nor leading "
        f"the tail: {missing}"
    )
    assert len(missing) <= 23, f"too many first-verdict queries deferred: {missing}"


def test_bench_headline_subset_of_registry():
    import bench

    qs = entry.queries()
    missing = [q for q in bench.HEADLINE if q not in qs]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"
