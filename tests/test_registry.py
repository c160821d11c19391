"""Mechanical invariants of the driver contract registry — guards
against rotation bookkeeping drift (the window composition is
hand-maintained; these assertions catch the failure modes)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# r9 window composition (VERDICT r8 #5/#7): the 18 round-8 additions
# whose first driver verdicts were deferred by the r8 window overflow,
# the 2 queries NEW in round 9, and the 3 queries over code that
# CHANGED in round 9 — all must sit inside the 50-slot driver window.
ROUND9_DEFERRED = [
    "events_enriched_stats", "etl_zorder_layout",
    "quality_quantile_normalize", "events_ohlc", "text_feature_hashing",
    "events_covisitation", "events_ohlc_windowed",
    "quality_group_percentiles", "events_spike_detection",
    "events_session_windows", "sim_ranking_eval", "quality_pr_curve",
    "sim_embedding_drift", "quality_winsorize",
    "etl_apply_cdc", "etl_scd2_pit", "graph_neighbor_stats",
    "graph_random_walks",
]
ROUND9_NEW = ["stream_interval_join", "stream_ingest_admission"]
ROUND9_CHANGED = [
    "text_bm25_rank", "etl_expectations", "events_threshold_crossings",
]


def test_every_query_has_an_oracle():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = sorted(set(qs) - set(osql))
    assert not missing, f"queries without oracle_sql entries: {missing}"
    orphans = sorted(set(osql) - set(qs))
    assert not orphans, f"oracle_sql entries without queries: {orphans}"


def test_round9_window_composition():
    """The deferred round-8 first-verdict queries MUST lead the r9
    window (they have never had a driver verdict), followed by the
    round-9 additions and the round-9-changed queries — first driver
    verdicts are delayed at most one round, never silently dropped."""
    names = list(entry.queries())
    window = names[:50]
    assert names[:18] == ROUND9_DEFERRED, (
        "deferred first-verdict queries must occupy slots 1-18: "
        f"{names[:18]}"
    )
    for q in ROUND9_NEW + ROUND9_CHANGED:
        assert q in window, f"round-9 query {q} not in the driver window"


def test_bench_headline_subset_of_registry():
    import bench

    qs = entry.queries()
    missing = [q for q in bench.HEADLINE if q not in qs]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"
