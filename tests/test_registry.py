"""Mechanical invariants of the driver contract registry — guards
against rotation bookkeeping drift (the window composition is
hand-maintained; these assertions catch the failure modes)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# r11 window composition: the round-11 NEW queries and the queries
# over code CHANGED in round 11 lead the window; the rest of the 50
# slots go to the stalest driver verdicts (computed MECHANICALLY from
# the CORRECTNESS history below, not hand-listed).
ROUND11_NEW_OR_CHANGED = [
    "quality_kn_logprob", "events_concurrency",
    "events_cusum_changepoint", "events_ab_ztest",
    "etl_table_checksum", "graph_modularity", "graph_louvain_move",
    "sim_mmr_rerank",
    "sim_hamming_topk", "sim_hamming_topk_scale",
    "events_ab_cuped", "sim_hybrid_rrf",
    "dedup_ngram_novelty", "dedup_minhash_audit",
    "mm_resize_real", "events_survival_km",
    "approx_cms_counts", "etl_bloom_semi_join",
    "quality_dsir_weights", "sim_matryoshka_recall",
    "events_top_paths", "etl_freshness", "quality_domain_shift",
    "asof_join_nearest", "text_langid_confusion", "text_fertility",
    "events_markov_steady_state",
    "quality_shard_plan", "quality_gini_tokens", "sim_mips_ivf_topk",
    "events_holt_forecast",
]


def _latest_driver_round(before_round: int | None = None) -> dict[str, int]:
    """Latest driver-verdict round per query, computed from the
    CORRECTNESS_r*.json history.

    ``before_round`` makes the computation ROUND-AWARE: a window
    composed FOR round N was chosen from the history as it stood
    BEFORE round N ran, so its staleness invariant must ignore
    CORRECTNESS files from rounds >= N — otherwise the driver landing
    its own round-N results would retroactively make the window's
    entries look fresh and flip the assertion (the r11 red-test
    failure mode; VERDICT r11 item 1)."""
    import glob
    import json
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    # r* not r0*: CORRECTNESS_r10.json and later must count too
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if before_round is not None and r >= before_round:
            continue
        for k in json.load(open(f)):
            latest[k] = r
    return latest


def test_every_query_has_an_oracle():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = sorted(set(qs) - set(osql))
    assert not missing, f"queries without oracle_sql entries: {missing}"
    orphans = sorted(set(osql) - set(qs))
    assert not orphans, f"oracle_sql entries without queries: {orphans}"


def test_round11_window_composition():
    """The round-11 window (frozen as the keys of CORRECTNESS_r11.json
    once the driver lands it; the static list before) led with the
    new/changed round-11 queries, and every other slot went to a query
    whose latest PRE-r11 driver verdict was at least as stale as any
    query left out — staleness is computed round-aware
    (``before_round=11``) so the driver's own r11 results landing in
    the tree cannot retroactively flip this assertion (VERDICT r11
    item 1). Overlap with the r10 window stays within the <= 5
    budget."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r11_path = os.path.join(root, "CORRECTNESS_r11.json")
    if os.path.exists(r11_path):
        window = list(json.load(open(r11_path)))
    else:  # pre-driver tree: the live registry led with the r11 window
        window = list(entry.queries())[:50]
    lead = len(ROUND11_NEW_OR_CHANGED)
    assert window[:lead] == ROUND11_NEW_OR_CHANGED, (
        f"leading slots wrong: {window[:lead]}"
    )
    latest = _latest_driver_round(before_round=11)
    rest = window[lead:]
    in_window = set(window)
    tail = [q for q in entry.queries() if q not in in_window]
    # every non-changed window slot must be no NEWER than every tail
    # entry's PRE-r11 verdict (queries with no pre-r11 history — the
    # round-11-and-later additions — sort fresh in the tail, stale in
    # the window lead, and are excluded from `rest` by construction)
    max_in_window = max(latest.get(q, 0) for q in rest)
    min_in_tail = min(latest.get(q, 99) for q in tail)
    assert max_in_window <= min_in_tail, (
        f"window holds a fresher verdict ({max_in_window}) than the "
        f"stalest tail row ({min_in_tail}) — rotation skipped rows"
    )
    r10 = set(json.load(open(os.path.join(root, "CORRECTNESS_r10.json"))))
    assert len(set(window) & r10) <= 5, "r10-window overlap budget exceeded"


ROUND12_NEW_OR_CHANGED = [
    "etl_bloom_semi_join_scale", "graph_louvain_communities",
    "mm_image_ahash_dedup", "approx_hll_distinct",
    "graph_betweenness", "dedup_cdc_chunks", "quality_mad_outliers",
    "events_cohort_ltv", "graph_assortativity",
    "dedup_dup_rate_by_source", "events_burstiness",
    "etl_table_checksum", "dedup_minhash_audit",
    "asof_join_nearest", "asof_join_events", "graph_modularity",
    "graph_louvain_move", "sim_mmr_rerank", "etl_bloom_semi_join",
]


def test_round12_window_composition():
    """Round-aware from birth (VERDICT r11 #1): the r12 window is the
    live first-50 until CORRECTNESS_r12.json lands, then frozen as its
    keys; staleness uses only pre-r12 history either way, so the
    driver's own results never flip this test. New/changed queries
    lead; every filler slot is at least as stale as anything left in
    the tail; filler slots must not overlap the r11 window (the lead's
    code-changed entries legitimately do — changed code MUST
    re-certify, the r11 'code-changed lead slots' precedent)."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r12_path = os.path.join(root, "CORRECTNESS_r12.json")
    if os.path.exists(r12_path):
        window = list(json.load(open(r12_path)))
    else:
        window = list(entry.queries())[:50]
    lead = len(ROUND12_NEW_OR_CHANGED)
    assert window[:lead] == ROUND12_NEW_OR_CHANGED, (
        f"leading slots wrong: {window[:lead]}"
    )
    latest = _latest_driver_round(before_round=12)
    rest = window[lead:]
    in_window = set(window)
    tail = [q for q in entry.queries() if q not in in_window]
    max_in_window = max(latest.get(q, 0) for q in rest)
    min_in_tail = min(latest.get(q, 99) for q in tail)
    assert max_in_window <= min_in_tail, (
        f"window holds a fresher verdict ({max_in_window}) than the "
        f"stalest tail row ({min_in_tail}) — rotation skipped rows"
    )
    r11 = set(json.load(open(os.path.join(root, "CORRECTNESS_r11.json"))))
    assert not (set(rest) & r11), (
        f"filler slots overlap the r11 window: {sorted(set(rest) & r11)}"
    )


def test_bench_headline_subset_of_registry():
    import bench

    qs = entry.queries()
    missing = [q for q in bench.HEADLINE if q not in qs]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"


def test_staleness_policy_self_enforcing():
    """VERDICT r12 #3: the <=5-round re-certification policy enforces
    itself. Two clauses, both computed from the CORRECTNESS history:

    1. LANDED invariant — as of the latest landed driver round R, no
       certified query's verdict is older than R-5. This is exactly
       the policy statement and stays green across a driver landing
       IFF every window absorbed its about-to-breach entries.
    2. FORWARD gate — the LIVE window (first 50 of queries()) must
       contain every entry that would breach the bound the moment the
       upcoming round R+1 lands (latest <= R-5). Skipped while the
       live window IS the just-landed round's window (post-driver,
       pre-recomposition tree — clause 1 already holds there), so the
       driver landing its own results never flips this test red
       (the r11 failure mode)."""
    import glob
    import json
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = _latest_driver_round()
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    ]
    landed = max(rounds)
    overdue = sorted(q for q, r in latest.items() if landed - r > 5)
    assert not overdue, (
        f"staleness bound breached as of landed round {landed}: {overdue}"
    )

    window = list(entry.queries())[:50]
    last_file = os.path.join(root, f"CORRECTNESS_r{landed:02d}.json")
    if not os.path.exists(last_file):
        last_file = os.path.join(root, f"CORRECTNESS_r{landed}.json")
    if set(window) == set(json.load(open(last_file))):
        return  # post-driver, pre-recomposition tree: clause 1 governs
    must_recertify = sorted(
        q for q, r in latest.items() if r <= landed - 5 and q not in set(window)
    )
    assert not must_recertify, (
        f"these entries breach the 5-round bound when round {landed + 1} "
        f"lands and MUST lead its window: {must_recertify}"
    )


ROUND13_NEW_OR_CHANGED = [
    "graph_louvain_coarsen", "graph_louvain_two_level",
    "dedup_cdc_guarded", "quality_gopher_rules", "approx_hll_union",
    "graph_ktruss", "text_char_entropy", "dedup_overlap_pairs",
    "quality_k_anonymity", "quality_cohen_kappa",
    "quality_token_budget", "events_ab_srm", "graph_closeness",
    "text_vocab_overlap", "events_bot_users", "sim_ivf_recall_curve",
    "etl_bloom_semi_join", "etl_bloom_semi_join_scale",
    "graph_assortativity", "events_retention", "events_cohort_ltv",
    "events_burstiness", "events_concurrency", "graph_louvain_move",
    "graph_louvain_communities", "dedup_cdc_chunks",
    "mm_image_ahash_dedup", "approx_hll_distinct",
]


def test_round13_window_composition():
    """Round-aware from birth: the r13 window is the live first-50
    until CORRECTNESS_r13.json lands, then frozen as its keys;
    staleness uses only pre-r13 history either way. New/changed
    queries lead; every filler slot is at least as stale as anything
    left in the tail; filler slots must not overlap the r12 window
    (the code-changed lead entries legitimately do — changed code
    MUST re-certify)."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r13_path = os.path.join(root, "CORRECTNESS_r13.json")
    if os.path.exists(r13_path):
        window = list(json.load(open(r13_path)))
    else:
        window = list(entry.queries())[:50]
    lead = len(ROUND13_NEW_OR_CHANGED)
    assert window[:lead] == ROUND13_NEW_OR_CHANGED, (
        f"leading slots wrong: {window[:lead]}"
    )
    latest = _latest_driver_round(before_round=13)
    rest = window[lead:]
    in_window = set(window)
    tail = [q for q in entry.queries() if q not in in_window]
    max_in_window = max(latest.get(q, 0) for q in rest)
    min_in_tail = min(latest.get(q, 99) for q in tail)
    assert max_in_window <= min_in_tail, (
        f"window holds a fresher verdict ({max_in_window}) than the "
        f"stalest tail row ({min_in_tail}) — rotation skipped rows"
    )
    r12 = set(json.load(open(os.path.join(root, "CORRECTNESS_r12.json"))))
    assert not (set(rest) & r12), (
        f"filler slots overlap the r12 window: {sorted(set(rest) & r12)}"
    )
    # VERDICT r12 #2: the eight r7-era rows at the staleness ceiling
    # MUST be certified this round
    ceiling = {
        "sim_cosine_neardup_pairs", "sim_ivfpq_topk", "sim_pq_codebooks",
        "sim_pq_codes", "sim_pq_refine_topk", "text_bpe_merges",
        "text_fuzzy_pairs", "text_quality_scores",
    }
    assert ceiling <= in_window, (
        f"r7-ceiling rows missing from the window: {ceiling - in_window}"
    )


ROUND14_NEW_OR_CHANGED = [
    "graph_louvain_multilevel",
    "graph_triangles", "graph_ktruss", "graph_louvain_two_level",
    "graph_louvain_move", "graph_louvain_communities",
    "sim_ivf_recall_curve", "quality_cohen_kappa",
    "events_markov_steady_state",
]


def test_round14_window_composition():
    """Round-aware from birth: the r14 window is the live first-50
    until CORRECTNESS_r14.json lands, then frozen as its keys;
    staleness uses only pre-r14 history either way. New/changed
    queries lead; every filler slot is at least as stale as anything
    left in the tail; filler slots must not overlap the r13 window
    (the code-changed lead entries legitimately do — changed code
    MUST re-certify)."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r14_path = os.path.join(root, "CORRECTNESS_r14.json")
    if os.path.exists(r14_path):
        window = list(json.load(open(r14_path)))
    else:
        window = list(entry.queries())[:50]
    lead = len(ROUND14_NEW_OR_CHANGED)
    assert window[:lead] == ROUND14_NEW_OR_CHANGED, (
        f"leading slots wrong: {window[:lead]}"
    )
    latest = _latest_driver_round(before_round=14)
    rest = window[lead:]
    in_window = set(window)
    tail = [q for q in entry.queries() if q not in in_window]
    max_in_window = max(latest.get(q, 0) for q in rest)
    min_in_tail = min(latest.get(q, 99) for q in tail)
    assert max_in_window <= min_in_tail, (
        f"window holds a fresher verdict ({max_in_window}) than the "
        f"stalest tail row ({min_in_tail}) — rotation skipped rows"
    )
    r13 = set(json.load(open(os.path.join(root, "CORRECTNESS_r13.json"))))
    assert not (set(rest) & r13), (
        f"filler slots overlap the r13 window: {sorted(set(rest) & r13)}"
    )
    # VERDICT r13 #1: ALL 30 r8-era rows sit exactly at the staleness
    # ceiling and MUST be certified this round
    ceiling = {
        q for q, r in _latest_driver_round(before_round=14).items() if r == 8
    }
    assert len(ceiling) == 30
    assert ceiling <= in_window, (
        f"r8-ceiling rows missing from the window: {ceiling - in_window}"
    )


ROUND15_NEW_OR_CHANGED = [
    # r14-new lead (first driver certification) + one r15-new query;
    # the r15 code-changed ops (ppl_buckets two-phase rank,
    # minhash_recall_curve truth pinning, compaction_plan guards,
    # ab_power_analysis ts_col) all live inside this same lead
    "dedup_line_dedup", "text_readability", "etl_compaction_plan",
    "quality_ppl_buckets", "mm_image_phash_dedup",
    "events_power_analysis", "mm_video_scene_cuts", "events_ab_did",
    "dedup_soft_weights", "dedup_lsh_recall_curve",
    "dedup_semdedup",
]


def test_round15_window_composition():
    """Round-aware from birth: the r15 window is the live first-50
    until CORRECTNESS_r15.json lands, then frozen as its keys;
    staleness uses only pre-r15 history either way. New/changed
    queries lead; every filler slot is at least as stale as anything
    left in the tail; filler slots must not overlap the r14 window."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r15_path = os.path.join(root, "CORRECTNESS_r15.json")
    if os.path.exists(r15_path):
        window = list(json.load(open(r15_path)))
    else:
        window = list(entry.queries())[:50]
    lead = len(ROUND15_NEW_OR_CHANGED)
    assert window[:lead] == ROUND15_NEW_OR_CHANGED, (
        f"leading slots wrong: {window[:lead]}"
    )
    latest = _latest_driver_round(before_round=15)
    rest = window[lead:]
    in_window = set(window)
    tail = [q for q in entry.queries() if q not in in_window]
    max_in_window = max(latest.get(q, 0) for q in rest)
    min_in_tail = min(latest.get(q, 99) for q in tail)
    assert max_in_window <= min_in_tail, (
        f"window holds a fresher verdict ({max_in_window}) than the "
        f"stalest tail row ({min_in_tail}) — rotation skipped rows"
    )
    r14 = set(json.load(open(os.path.join(root, "CORRECTNESS_r14.json"))))
    assert not (set(rest) & r14), (
        f"filler slots overlap the r14 window: {sorted(set(rest) & r14)}"
    )
    # VERDICT r14 #2: ALL 37 r9-era rows sit exactly at the staleness
    # ceiling and MUST be certified this round
    ceiling = {
        q for q, r in _latest_driver_round(before_round=15).items() if r == 9
    }
    assert len(ceiling) == 37
    assert ceiling <= in_window, (
        f"r9-ceiling rows missing from the window: {ceiling - in_window}"
    )


ROUND16_NEW_OR_CHANGED = [
    # the five r15-new post-freeze queries (first driver
    # certification — VERDICT r15 #2); the r16 code changes
    # (contamination's JVM-side packed-decimal reduction + broadcast
    # gate, image_phash_pairs' narrow-segment warning,
    # domain_reweight's temperature guard, audio_fingerprint's XOR
    # fold) all live INSIDE this lead
    "sim_eval_contamination", "mm_image_phash_pairs",
    "quality_domain_reweight", "dedup_cluster_split",
    "mm_audio_fingerprint_dedup",
    # r16-new
    "mm_image_phash_pairs_wide", "sim_clip_filter",
]


def test_round16_window_composition():
    """Round-aware from birth: the r16 window is the live first-50
    until CORRECTNESS_r16.json lands, then frozen as its keys;
    staleness uses only pre-r16 history either way. New/changed
    queries lead; every filler slot is at least as stale as anything
    left in the tail; filler slots must not overlap the r15 window."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r16_path = os.path.join(root, "CORRECTNESS_r16.json")
    if os.path.exists(r16_path):
        window = list(json.load(open(r16_path)))
    else:
        window = list(entry.queries())[:50]
    lead = len(ROUND16_NEW_OR_CHANGED)
    assert window[:lead] == ROUND16_NEW_OR_CHANGED, (
        f"leading slots wrong: {window[:lead]}"
    )
    latest = _latest_driver_round(before_round=16)
    rest = window[lead:]
    in_window = set(window)
    tail = [q for q in entry.queries() if q not in in_window]
    max_in_window = max(latest.get(q, 0) for q in rest)
    min_in_tail = min(latest.get(q, 99) for q in tail)
    assert max_in_window <= min_in_tail, (
        f"window holds a fresher verdict ({max_in_window}) than the "
        f"stalest tail row ({min_in_tail}) — rotation skipped rows"
    )
    r15 = set(json.load(open(os.path.join(root, "CORRECTNESS_r15.json"))))
    assert not (set(rest) & r15), (
        f"filler slots overlap the r15 window: {sorted(set(rest) & r15)}"
    )
    # VERDICT r15 #2: ALL 43 r10-era rows sit exactly at the staleness
    # ceiling and MUST be certified this round
    ceiling = {
        q for q, r in _latest_driver_round(before_round=16).items() if r == 10
    }
    assert len(ceiling) == 43
    assert ceiling <= in_window, (
        f"r10-ceiling rows missing from the window: {ceiling - in_window}"
    )


ROUND17_NEW_OR_CHANGED = [
    # r16-new post-freeze lead — VERDICT r16 #1
    "quality_mojibake_scrub", "sim_embedding_outliers",
    "mm_video_keyframe_dedup", "dedup_minhash_contamination",
    # r17-new — VERDICT r16 #2 + #7
    "mm_audio_fingerprint_pairs", "mm_video_keyframe_pairs",
    "quality_token_cost_audit",
    # r17 code-changed (NaN-keep fix; packed_max_by domain guard)
    "sim_clip_filter", "sim_eval_contamination",
]


def test_round17_window_composition():
    """Round-aware from birth: the r17 window is the live first-50
    until CORRECTNESS_r17.json lands, then frozen as its keys;
    staleness uses only pre-r17 history either way. New/changed
    queries lead; every filler slot is at least as stale as anything
    left in the tail; filler slots must not overlap the r16 window
    (the code-changed lead entries legitimately do — changed code
    MUST re-certify)."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r17_path = os.path.join(root, "CORRECTNESS_r17.json")
    if os.path.exists(r17_path):
        window = list(json.load(open(r17_path)))
    else:
        window = list(entry.queries())[:50]
    lead = len(ROUND17_NEW_OR_CHANGED)
    assert window[:lead] == ROUND17_NEW_OR_CHANGED, (
        f"leading slots wrong: {window[:lead]}"
    )
    latest = _latest_driver_round(before_round=17)
    rest = window[lead:]
    in_window = set(window)
    tail = [q for q in entry.queries() if q not in in_window]
    max_in_window = max(latest.get(q, 0) for q in rest)
    min_in_tail = min(latest.get(q, 99) for q in tail)
    assert max_in_window <= min_in_tail, (
        f"window holds a fresher verdict ({max_in_window}) than the "
        f"stalest tail row ({min_in_tail}) — rotation skipped rows"
    )
    r16 = set(json.load(open(os.path.join(root, "CORRECTNESS_r16.json"))))
    assert not (set(rest) & r16), (
        f"filler slots overlap the r16 window: {sorted(set(rest) & r16)}"
    )
    # VERDICT r16 #1: ALL 41 r11-era rows sit exactly at the staleness
    # ceiling and MUST be certified this round
    ceiling = {
        q for q, r in _latest_driver_round(before_round=17).items() if r == 11
    }
    assert len(ceiling) == 41
    assert ceiling <= in_window, (
        f"r11-ceiling rows missing from the window: {ceiling - in_window}"
    )


ROUND18_NEW_OR_CHANGED = [
    # r17 code-changed, uncertified — VERDICT r17 #2 (355cbed Louvain/
    # pagerank rewrites, e2ae856 clf featurization, dc734c2 bloom
    # word-pack + ivf sweep reuse all postdate the r17 oracle window)
    "graph_louvain_move", "graph_louvain_communities",
    "graph_louvain_two_level", "graph_louvain_multilevel",
    "graph_pagerank", "graph_personalized_pagerank",
    "quality_clf_weights", "etl_bloom_semi_join",
    "sim_ivf_recall_curve",
    # r18 code-changed (per-round pins; ktruss fixpoint support reuse)
    "graph_hits", "graph_ktruss",
]


def test_round18_window_composition():
    """Round-aware from birth: the r18 window is the live first-50
    until CORRECTNESS_r18.json lands, then frozen as its keys;
    staleness uses only pre-r18 history either way. Changed queries
    lead (VERDICT r17 #2 — the r17 rewrites shipped past the last
    oracle run); every filler slot is at least as stale as anything
    left in the tail; filler slots must not overlap the r17 window."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r18_path = os.path.join(root, "CORRECTNESS_r18.json")
    if os.path.exists(r18_path):
        window = list(json.load(open(r18_path)))
    else:
        window = list(entry.queries())[:50]
    lead = len(ROUND18_NEW_OR_CHANGED)
    assert window[:lead] == ROUND18_NEW_OR_CHANGED, (
        f"leading slots wrong: {window[:lead]}"
    )
    latest = _latest_driver_round(before_round=18)
    rest = window[lead:]
    in_window = set(window)
    tail = [q for q in entry.queries() if q not in in_window]
    max_in_window = max(latest.get(q, 0) for q in rest)
    min_in_tail = min(latest.get(q, 99) for q in tail)
    assert max_in_window <= min_in_tail, (
        f"window holds a fresher verdict ({max_in_window}) than the "
        f"stalest tail row ({min_in_tail}) — rotation skipped rows"
    )
    r17 = set(json.load(open(os.path.join(root, "CORRECTNESS_r17.json"))))
    assert not (set(rest) & r17), (
        f"filler slots overlap the r17 window: {sorted(set(rest) & r17)}"
    )
    # VERDICT r17 #2 budget note: ALL 39 r12-era rows sit exactly at
    # the staleness ceiling and MUST be certified this round — with
    # the 11 changed-code lead slots that fills the window to exactly
    # 50, so the five r17-new post-freeze queries are certified
    # locally instead (check_oracle + result_hash artifacts).
    ceiling = {
        q for q, r in _latest_driver_round(before_round=18).items() if r == 12
    }
    assert len(ceiling) == 39
    assert ceiling <= in_window, (
        f"r12-ceiling rows missing from the window: {ceiling - in_window}"
    )
