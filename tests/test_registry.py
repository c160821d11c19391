"""Mechanical invariants of the driver contract registry — guards
against rotation bookkeeping drift (the window composition is
hand-maintained; these assertions catch the failure modes)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# every query that is NEW in round 7 (first driver verdict pending)
# must sit inside the 50-slot driver window
ROUND7_NEW = [
    "q4_order_priority", "q7_volume_shipping", "q8_market_share",
    "q13_customer_distribution", "q14_promo_revenue", "q18_large_volume",
    "q19_discount_revenue", "q22_dormant_balance",
    "dedup_neardup_survivors", "dedup_passages", "quality_unigram_logprob",
    "pipeline_corpus_assembly", "quality_chunk_documents", "quality_gate",
    "dedup_span_scrub", "dedup_incremental", "quality_mixture_sample",
    "text_bpe_merges",
    "sim_pq_codebooks", "sim_pq_codes", "sim_pq_refine_topk",
    "sim_ivfpq_topk", "quality_clf_weights", "quality_curriculum_order",
    "events_hopping_counts", "etl_upsert_nodes",
    "text_fuzzy_pairs", "etl_profile_table", "graph_triangles", "quality_bigram_logprob",
]


def test_every_query_has_an_oracle():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = sorted(set(qs) - set(osql))
    assert not missing, f"queries without oracle_sql entries: {missing}"
    orphans = sorted(set(osql) - set(qs))
    assert not orphans, f"oracle_sql entries without queries: {orphans}"


def test_round7_first_verdict_queries_in_window():
    window = list(entry.queries())[:50]
    missing = [q for q in ROUND7_NEW if q not in window]
    assert not missing, f"round-7 first-verdict queries outside window: {missing}"


def test_bench_headline_subset_of_registry():
    import bench

    qs = entry.queries()
    missing = [q for q in bench.HEADLINE if q not in qs]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"
