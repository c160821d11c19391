"""Unit tests for the round-8 fourth batch: attribution, SCD-2
history, cascade delete, label propagation, BFS distances, PMI
bigrams, z-score outliers."""

from __future__ import annotations

import datetime

import pytest


def _ts(m):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m)


def test_attribution_last_and_first_touch(spark):
    from graph_etl_spark.operators import attribution

    rows = [
        # user 1: click(1), view(2), purchase(3), purchase(4)
        (10, _ts(1), 1, "click", 0.0),
        (11, _ts(2), 1, "view", 0.0),
        (12, _ts(3), 1, "purchase", 5.0),
        (13, _ts(4), 1, "purchase", 6.0),
        # user 2: purchase with no prior touch
        (20, _ts(1), 2, "purchase", 1.0),
        # user 3: touch at the SAME ts as the conversion — ties resolve
        # by event_id: touch 30 < conv 31 so it IS before
        (30, _ts(5), 3, "click", 0.0),
        (31, _ts(5), 3, "purchase", 2.0),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    last = {
        r["conv_event_id"]: (r["touch_event_id"], r["touch_type"])
        for r in attribution(e, "purchase", ["click", "view"]).collect()
    }
    assert last[12] == (11, "view")      # latest touch before conv 12
    assert last[13] == (11, "view")      # purchases are not touches
    assert last[20] == (None, None)      # unattributed kept with NULLs
    assert last[31] == (30, "click")     # same-ts touch with lower id counts
    first = {
        r["conv_event_id"]: r["touch_event_id"]
        for r in attribution(e, "purchase", ["click", "view"], model="first_touch").collect()
    }
    assert first[12] == 10 and first[13] == 10
    with pytest.raises(ValueError):
        attribution(e, "purchase", ["click"], model="linear")


def test_scd2_history_intervals(spark):
    from graph_etl_spark.functions import scd2_history

    rows = [
        # user 1: A, A (no change), B, B, A — three versions
        (1, _ts(0), "A"),
        (1, _ts(1), "A"),
        (1, _ts(2), "B"),
        (1, _ts(3), "B"),
        (1, _ts(4), "A"),
        # user 2: tie at same ts keeps lexicographically-first ("C")
        (2, _ts(0), "D"),
        (2, _ts(0), "C"),
        # user 3: NULL state handled null-safely (one version)
        (3, _ts(0), None),
        (3, _ts(1), None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, state string")
    out = scd2_history(df, "user_id", "ts", "state").collect()
    hist = sorted(
        [(r["user_id"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in out]
    )
    assert [(u, s) for u, s, *_ in hist] == [
        (1, "A"), (1, "A"), (1, "B"), (2, "C"), (3, None)
    ]
    u1 = [h for h in hist if h[0] == 1]
    assert u1[0][2:] == (_ts(0), _ts(2), False)
    assert u1[2][2:] == (_ts(2), _ts(4), False)   # B interval closed by the re-A
    assert u1[1][2:] == (_ts(4), None, True)      # reopened A is current
    assert [h[4] for h in hist if h[0] == 2] == [True]


def test_cascade_delete_chain(spark):
    from graph_etl_spark.pipeline import cascade_delete

    cust = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "ck long, name string")
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], "ok long, ck long"
    )
    items = spark.createDataFrame(
        [(10, 100), (11, 101), (12, 102), (13, 103), (13, 104)], "ok long, pk long"
    )
    seeds = spark.createDataFrame([(1,), (3,)], "ck long")
    purged = cascade_delete(
        seeds,
        [("cust", cust, "ck", "ck"), ("orders", orders, "ck", "ok"),
         ("items", items, "ok", None)],
    )
    assert sorted(r["ck"] for r in purged["cust"].collect()) == [2]
    assert sorted(r["ok"] for r in purged["orders"].collect()) == [12]
    assert sorted(r["pk"] for r in purged["items"].collect()) == [102]


def test_label_propagation_two_communities(spark):
    from graph_etl_spark.operators import label_propagation

    # two triangles joined by one bridge edge: LPA keeps two communities
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    out = {r["id"]: r["label"] for r in label_propagation(edges, n_iter=4).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == out[5] == out[6]
    assert out[4] != out[1]


def test_bfs_distances_hops_and_cap(spark):
    from graph_etl_spark.operators import bfs_distances

    # path 1-2-3-4-5 plus a disconnected 8-9
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "src long, dst long"
    )
    srcs = spark.createDataFrame([(1,)], "id long")
    out = {r["id"]: r["distance"] for r in bfs_distances(edges, srcs, max_hops=6).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}   # 8,9 unreachable
    capped = {r["id"]: r["distance"]
              for r in bfs_distances(edges, srcs, max_hops=2).collect()}
    assert capped == {1: 0, 2: 1, 3: 2}
    # multi-source: nearest source wins
    multi = {r["id"]: r["distance"]
             for r in bfs_distances(edges, spark.createDataFrame([(1,), (5,)], "id long"),
                                    max_hops=6).collect()}
    assert multi[3] == 2 and multi[4] == 1


def test_pmi_bigrams_counts(spark):
    import math

    from graph_etl_spark.operators import pmi_bigrams

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    out = {(r["token_a"], r["token_b"]): r for r in
           pmi_bigrams(docs, min_count=2).collect()}
    # bigrams: (a,b)x3, (b,a)x1, (b,c)x1 — only (a,b) passes min_count=2
    assert list(out) == [("a", "b")]
    r = out[("a", "b")]
    assert r["n_pair"] == 3
    # n_tok=7, n_big=5, n_a=3, n_b=3: pmi = ln(3*7*7/(5*3*3))
    assert r["pmi"] == pytest.approx(round(math.log(3 * 7 * 7 / (5 * 3 * 3)), 6))


def test_zscore_outliers_flags_spike(spark):
    from graph_etl_spark.operators import zscore_outliers

    rows = [("a", float(v)) for v in [10, 10, 10, 10, 10, 10, 10, 10, 10, 100]] + [
        ("b", 1.0), ("b", 1.0)  # zero-variance group emits nothing
    ]
    df = spark.createDataFrame(rows, "grp string, val double")
    out = zscore_outliers(df, "grp", "val", threshold=2.5).collect()
    assert len(out) == 1
    assert out[0]["grp"] == "a" and out[0]["val"] == 100.0 and out[0]["z"] > 2.5


def test_rolling_median_lower_median(spark):
    from graph_etl_spark.operators import rolling_median

    rows = [(1, i, float(v)) for i, v in enumerate([5, 1, 9, 3, 100])]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    out = {r["i"]: r["rolling_median"]
           for r in rolling_median(df, "k", "i", "v", window_size=3).collect()}
    # windows: [5], [5,1], [5,1,9], [1,9,3], [9,3,100]
    assert out == {0: 5.0, 1: 1.0, 2: 5.0, 3: 3.0, 4: 9.0}


def test_numeric_histogram_buckets(spark):
    from graph_etl_spark.operators import numeric_histogram

    df = spark.createDataFrame([(float(v),) for v in range(10)], "v double")
    out = {r["bucket"]: r for r in numeric_histogram(df, "v", n_bins=3).collect()}
    # lo=0, hi=9: buckets [0,3), [3,6), [6,9] — max clamps into last
    assert {b: out[b]["n_rows"] for b in sorted(out)} == {0: 3, 1: 3, 2: 4}
    assert out[0]["lo_edge"] == 0.0 and out[2]["hi_edge"] == 9.0


def test_corr_matrix_signs(spark):
    from graph_etl_spark.operators import corr_matrix

    rows = [(float(i), float(2 * i), float(-i), None if i == 3 else float(i))
            for i in range(6)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in corr_matrix(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == -1.0
    assert len(out) == 3
    # list-wise null drop: row i=3 excluded when d is requested
    out_d = {(r["col_a"], r["col_b"]): r["corr"]
             for r in corr_matrix(df, ["a", "d"]).collect()}
    assert out_d[("a", "d")] == 1.0


def test_mask_columns_deterministic_and_null_safe(spark):
    from graph_etl_spark.operators import mask_columns

    df = spark.createDataFrame(
        [(1, "alice"), (2, "alice"), (3, None)], "id long, name string"
    )
    out = {r["id"]: r["name"] for r in mask_columns(df, ["name"]).collect()}
    assert out[1] == out[2] and len(out[1]) == 16 and out[1] != "alice"
    assert out[3] is None
    resalted = {r["id"]: r["name"]
                for r in mask_columns(df, ["name"], salt="v2").collect()}
    assert resalted[1] != out[1]   # salt rotation re-keys the space


def test_snapshot_diff_change_types(spark):
    from graph_etl_spark.functions import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", None), (4, "d", 40.0)],
        "id long, s string, v double",
    )
    out = {r["id"]: (r["change_type"], r["changed_cols"])
           for r in snapshot_diff(old, new, "id").collect()}
    assert out[1] == ("removed", [])
    assert out[2] == ("changed", ["v"])
    assert out[4] == ("added", [])
    assert 3 not in out   # NULL == NULL is unchanged (null-safe compare)
    import pytest as _p
    with _p.raises(ValueError):
        snapshot_diff(old, new.drop("v"), "id")


def test_ewma_weights_and_partial_windows(spark):
    from graph_etl_spark.operators import ewma

    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 40])]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    out = {r["i"]: r["ewma"] for r in
           ewma(df, "k", "i", "v", alpha=0.5, window_size=4).collect()}
    assert out[0] == 10.0                       # partial window = itself
    # row 1: (20*1 + 10*0.5)/(1+0.5)
    assert out[1] == pytest.approx(round(25 / 1.5, 6))
    # row 2: (40*1 + 20*0.5 + 10*0.25)/(1.75)
    assert out[2] == pytest.approx(round(52.5 / 1.75, 6))


def test_event_transitions_row_stochastic(spark):
    from graph_etl_spark.operators import event_transitions

    rows = [
        (1, _ts(0), 1, "a", 0.0), (2, _ts(1), 1, "b", 0.0),
        (3, _ts(2), 1, "a", 0.0), (4, _ts(3), 1, "c", 0.0),
        (5, _ts(0), 2, "a", 0.0), (6, _ts(1), 2, "b", 0.0),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {(r["from_type"], r["to_type"]): (r["n_transitions"], r["p"])
           for r in event_transitions(e).collect()}
    # from 'a': a->b twice, a->c once; from 'b': b->a once
    assert out[("a", "b")] == (2, 0.666667)
    assert out[("a", "c")] == (1, 0.333333)
    assert out[("b", "a")] == (1, 1.0)
    assert ("c", "a") not in out   # last event of user 1 has no successor


def test_inverted_index_sorted_capped(spark):
    from graph_etl_spark.operators import inverted_index

    docs = spark.createDataFrame(
        [(3, "x y"), (1, "x z x"), (2, "x")], "doc_id long, text string"
    )
    out = {r["term"]: r for r in
           inverted_index(docs, min_df=1, max_postings=2).collect()}
    assert out["x"]["df"] == 3
    assert out["x"]["postings"] == "1,2"   # sorted THEN truncated
    assert out["z"]["df"] == 1 and out["z"]["postings"] == "1"


def test_hits_star_graph(spark):
    from graph_etl_spark.operators import hits

    # star: 1,2,3 all point at 9; 9 is the pure authority, 1-3 pure hubs
    edges = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9)], "src long, dst long"
    )
    out = {r["id"]: (r["hub"], r["authority"]) for r in hits(edges, max_iter=3).collect()}
    assert out[9] == (0.0, 1.0)
    assert out[1] == (1.0, 0.0) and out[2] == (1.0, 0.0) and out[3] == (1.0, 0.0)


def test_bellman_ford_weighted_vs_hops(spark):
    from graph_etl_spark.operators import bellman_ford

    # 1-2 (w5), 2-3 (w5), 1-3 (w20): weighted shortest 1->3 goes via 2
    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 5), (1, 3, 20)], "src long, dst long, w long"
    )
    srcs = spark.createDataFrame([(1,)], "id long")
    out = {r["id"]: r["distance"]
           for r in bellman_ford(edges, srcs, weight="w", max_iter=6).collect()}
    assert out == {1: 0, 2: 5, 3: 10}
    # weight=None degenerates to hop counts (BFS)
    hops = {r["id"]: r["distance"]
            for r in bellman_ford(edges, srcs, max_iter=6).collect()}
    assert hops == {1: 0, 2: 1, 3: 1}


def test_negative_samples_deterministic_no_collisions(spark):
    from graph_etl_spark.operators import negative_samples

    pairs = spark.createDataFrame([(1, 2), (3, 4)], "anchor_id long, positive_id long")
    corpus = spark.createDataFrame([(i,) for i in range(1, 21)], "doc_id long")
    out1 = negative_samples(pairs, corpus, k=3).collect()
    out2 = negative_samples(pairs, corpus, k=3).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # reproducible
    by_pair = {}
    for r in out1:
        by_pair.setdefault((r["anchor_id"], r["positive_id"]), []).append(r)
    for (a, p), rows in by_pair.items():
        assert len(rows) == 3
        assert sorted(r["sample_rank"] for r in rows) == [1, 2, 3]
        for r in rows:
            assert r["negative_id"] not in (a, p)


def test_streaming_enrich_batch_twin(spark):
    from graph_etl_spark.streaming import streaming_enrich

    ev = spark.createDataFrame([(1, 10.0), (2, 5.0), (9, 1.0)], "uid long, v double")
    dim = spark.createDataFrame([(1, "gold"), (2, "basic")], "uid long, tier string")
    out = {r["uid"]: r["tier"] for r in streaming_enrich(ev, dim, "uid").collect()}
    assert out == {1: "gold", 2: "basic", 9: None}


def test_zorder_key_interleaves(spark):
    from graph_etl_spark.operators import zorder_key

    # 4 corner points with bits=2: scaled coords are 0 or 3 (0b11)
    df = spark.createDataFrame(
        [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0)], "x double, y double"
    )
    out = {(r["x"], r["y"]): r["zkey"]
           for r in zorder_key(df, ["x", "y"], bits=2).collect()}
    # interleave: x bits land at even positions, y at odd
    assert out[(0.0, 0.0)] == 0b0000
    assert out[(3.0, 3.0)] == 0b1111
    assert out[(3.0, 0.0)] == 0b0101   # x=11 interleaved at even slots
    assert out[(0.0, 3.0)] == 0b1010


def test_quantile_normalize_total_order(spark):
    from graph_etl_spark.operators import quantile_normalize

    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 99.0), (4, 0.0), (5, 50.0)], "id long, v double"
    )
    out = {r["id"]: r["quantile"]
           for r in quantile_normalize(df, "v", "id").collect()}
    assert out[4] == 0.0 and out[3] == 1.0
    assert out[1] < out[2]   # tie resolved by id — deterministic
    assert out[5] == 0.75


def test_resample_ohlc_bars(spark):
    from graph_etl_spark.operators import resample_ohlc

    rows = [
        (1, _ts(0), 1, 10.0), (2, _ts(10), 1, 30.0), (3, _ts(50), 1, 20.0),
        (4, _ts(70), 1, 5.0),   # second hour
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = {r["bucket_start"]: r for r in
           resample_ohlc(e, "user_id", "ts", "value", "event_id",
                         bucket_seconds=3600).collect()}
    h0 = out[min(out)]
    assert (h0["open"], h0["high"], h0["low"], h0["close"]) == (10.0, 30.0, 10.0, 20.0)
    assert h0["n_rows"] == 3 and h0["total"] == 60.0
    h1 = out[max(out)]
    assert h1["open"] == h1["close"] == 5.0 and h1["n_rows"] == 1


def test_feature_hashing_counts(spark):
    from graph_etl_spark.operators import feature_hashing

    docs = spark.createDataFrame([(1, "a b a"), (2, "a")], "doc_id long, text string")
    out = feature_hashing(docs, n_buckets=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["bucket"]] = r["n"]
    assert sum(by_doc[1].values()) == 3 and sum(by_doc[2].values()) == 1
    # same token -> same bucket on every doc (hash determinism)
    [a_bucket] = [b for b, n in by_doc[2].items()]
    assert by_doc[1][a_bucket] == 2
    assert all(0 <= b < 4 for d in by_doc.values() for b in d)


def test_group_percentiles_exact_lower(spark):
    from graph_etl_spark.operators import group_percentiles

    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {(r["g"], r["p"]): r["value"]
           for r in group_percentiles(df, "g", "v", [0.5, 0.9]).collect()}
    # n=10: rank(0.5) = floor(0.5*9)+1 = 5 -> 5.0; rank(0.9) = floor(8.1)+1 = 9
    assert out[("a", 0.5)] == 5.0
    assert out[("a", 0.9)] == 9.0
    # singleton group: every p hits the single element
    assert out[("b", 0.5)] == 7.0 and out[("b", 0.9)] == 7.0


def test_zorder_layout_tightens_file_ranges(spark, tmp_path):
    """The point of Z-ordering: after repartitionByRange(zkey) +
    local sort, per-file min/max ranges on EACH clustered dimension
    are tighter than the natural layout's — footer pruning can skip
    files. Measured, not assumed."""
    from graph_etl_spark.operators import zorder_key
    from graph_etl_spark.sources import file_level_stats

    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    natural = str(tmp_path / "natural")
    li.repartition(8).write.parquet(natural)
    zsorted = str(tmp_path / "zsorted")
    (
        zorder_key(li, ["l_extendedprice", "l_quantity"], bits=8)
        .repartitionByRange(8, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.parquet(zsorted)
    )

    def avg_span(path, col):
        rows = file_level_stats(spark, path, [col]).collect()
        return sum(r[f"max_{col}"] - r[f"min_{col}"] for r in rows) / len(rows)

    for col in ["l_extendedprice", "l_quantity"]:
        assert avg_span(zsorted, col) < avg_span(natural, col), col


def test_ranking_metrics_values(spark):
    from graph_etl_spark.operators import ranking_metrics

    rows = [
        # q1: relevant at ranks 2 and 7 (2 relevant; 1 inside top-5)
        *[(1, r, r in (2, 7)) for r in range(1, 11)],
        # q2: no relevant at all
        *[(2, r, False) for r in range(1, 11)],
    ]
    df = spark.createDataFrame(rows, "query_id long, rank long, is_relevant boolean")
    out = {r["query_id"]: r for r in ranking_metrics(df, k=5).collect()}
    q1 = out[1]
    assert q1["n_relevant"] == 2
    assert q1["recall_at_k"] == 0.5        # 1 of min(2, 5)
    assert q1["precision_at_k"] == 0.2     # 1 of 5
    assert q1["reciprocal_rank"] == 0.5    # first hit at rank 2
    q2 = out[2]
    assert (q2["recall_at_k"], q2["reciprocal_rank"]) == (0.0, 0.0)


def test_pr_curve_single_scan_counts(spark):
    from graph_etl_spark.operators import pr_curve

    rows = [(0.9, True), (0.8, False), (0.4, True), (0.1, False)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = {r["threshold"]: r for r in
           pr_curve(df, "score", "label", [0.5, 0.85]).collect()}
    t5 = out[0.5]
    assert (t5["tp"], t5["fp"], t5["fn"]) == (1, 1, 1)
    assert t5["precision"] == 0.5 and t5["recall"] == 0.5
    t85 = out[0.85]
    assert (t85["tp"], t85["fp"], t85["fn"]) == (1, 0, 1)
    assert t85["precision"] == 1.0 and t85["recall"] == 0.5


def test_session_window_stats_matches_sessionize(spark):
    import datetime

    from graph_etl_spark.streaming import session_window_stats, sessionize

    def at(m):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m)

    rows = [(1, at(0)), (1, at(10)), (1, at(60)), (2, at(5))]
    e = spark.createDataFrame(rows, "user_id long, ts timestamp")
    native = session_window_stats(e, gap="30 minutes").collect()
    by_user = {}
    for r in native:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2            # 60-min gap splits user 1
    assert sorted(r["n_events"] for r in by_user[1]) == [1, 2]
    assert len(by_user[2]) == 1
    # session counts agree with the window-based sessionize operator
    legacy = (
        sessionize(e, gap_minutes=30)
        .groupBy("user_id")
        .agg({"session_id": "max"})
        .collect()
    )
    legacy_counts = {r["user_id"]: r["max(session_id)"] for r in legacy}
    assert legacy_counts == {u: len(v) for u, v in by_user.items()}


def test_embedding_drift_detects_shift(spark):
    from graph_etl_spark.operators import embedding_drift

    old = spark.createDataFrame(
        [([1.0, 0.0],), ([3.0, 0.0],)], "embedding array<double>"
    )
    new = spark.createDataFrame(
        [([2.0, 0.0],), ([4.0, 0.0],)], "embedding array<double>"
    )
    out = {r["dim"]: r for r in embedding_drift(old, new).collect()}
    assert out[0]["mean_old"] == 2.0 and out[0]["mean_new"] == 3.0
    assert out[0]["abs_delta"] == 1.0
    assert out[1]["abs_delta"] == 0.0


def test_winsorize_clips_to_group_band(spark):
    from graph_etl_spark.operators import winsorize

    rows = [("a", float(v)) for v in range(1, 11)]  # 1..10
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["v"]: r["winsorized"]
           for r in winsorize(df, "g", "v", lower_p=0.2, upper_p=0.8).collect()}
    # n=10: p0.2 rank floor(1.8)+1=2 -> 2.0; p0.8 rank floor(7.2)+1=8 -> 8.0
    assert out[1.0] == 2.0 and out[10.0] == 8.0
    assert out[5.0] == 5.0   # interior untouched


def test_schema_diff_changes(spark):
    from graph_etl_spark.functions import schema_diff

    old = spark.createDataFrame([(1, "x", 1.0)], "id long, s string, v double")
    new = spark.createDataFrame([(1, 2, True)], "id long, v int, extra boolean")
    out = {d["column"]: d for d in schema_diff(old, new)}
    assert out["s"]["change"] == "removed"
    assert out["extra"]["change"] == "added"
    assert out["v"]["change"] == "type_changed"
    assert out["v"]["old_type"] == "double" and out["v"]["new_type"] == "int"
    assert "id" not in out


def test_apply_cdc_insert_update_delete(spark):
    from graph_etl_spark.functions import apply_cdc

    cur = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    chg = spark.createDataFrame(
        [
            (2, "b2", "U", 10),          # update key 2
            (3, None, "D", 11),          # delete key 3 (null payload ok)
            (4, "d", "I", 12),           # insert new key 4
            (4, "d2", "U", 13),          # later update wins over the insert
            (5, "e", "I", 20),
            (5, None, "D", 21),          # insert then delete -> absent
        ],
        "id long, v string, op string, seq long",
    )
    out = {r["id"]: r["v"] for r in apply_cdc(cur, chg, "id").collect()}
    assert out == {1: "a", 2: "b2", 4: "d2"}


def test_neighbor_stats_star(spark):
    from graph_etl_spark.operators import neighbor_stats

    # star: hub 1 connects to 2,3,4; leaf neighbors all have degree 3
    edges = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "src long, dst long")
    out = {r["id"]: r for r in neighbor_stats(edges).collect()}
    assert out[1]["degree"] == 3
    assert out[1]["mean_neighbor_degree"] == 1.0   # leaves have degree 1
    assert out[2]["degree"] == 1
    assert out[2]["mean_neighbor_degree"] == 3.0 and out[2]["max_neighbor_degree"] == 3


def test_rolling_median_and_ewma_null_windows(spark):
    """Review regression: an all-NULL trailing window must emit NULL
    (median previously threw INVALID_INDEX_OF_ZERO; ewma emitted
    NaN), and NULL values drop out of the slice."""
    import math

    from graph_etl_spark.operators import ewma, rolling_median

    rows = [(1, 0, None), (1, 1, 4.0), (1, 2, None), (1, 3, 8.0)]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    med = {r["i"]: r["rolling_median"]
           for r in rolling_median(df, "k", "i", "v", window_size=3).collect()}
    assert med[0] is None
    assert med[1] == 4.0 and med[2] == 4.0
    assert med[3] == 4.0   # non-null slice [4, 8], lower median
    ew = {r["i"]: r["ewma"]
          for r in ewma(df, "k", "i", "v", alpha=0.5, window_size=3).collect()}
    assert ew[0] is None and not any(
        isinstance(v, float) and math.isnan(v) for v in ew.values() if v is not None
    )


def test_zscore_and_percentiles_ignore_nulls(spark):
    """Review regression: NULL values must not distort group moments
    or percentile ranks."""
    from graph_etl_spark.operators import group_percentiles, zscore_outliers

    rows = [("a", 10.0)] * 4 + [("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    # constant group once NULLs are excluded -> zero variance -> empty
    assert zscore_outliers(df, "g", "v", threshold=0.1).count() == 0
    pct = spark.createDataFrame(
        [("a", None), ("a", 1.0), ("a", 2.0), ("a", 3.0)], "g string, v double"
    )
    out = {r["p"]: r["value"]
           for r in group_percentiles(pct, "g", "v", [0.5]).collect()}
    assert out[0.5] == 2.0   # median of {1,2,3}, NULL neither ranked nor counted


def test_histogram_honors_partial_bounds(spark):
    """Review regression: a single pinned bound must be honored, not
    silently recomputed."""
    from graph_etl_spark.operators import numeric_histogram

    df = spark.createDataFrame([(float(v),) for v in range(10)], "v double")
    out = sorted(
        numeric_histogram(df, "v", n_bins=2, hi=5.0).collect(),
        key=lambda r: r["bucket"],
    )
    assert out[-1]["hi_edge"] == 5.0       # pinned hi kept
    assert out[0]["lo_edge"] == 0.0        # lo still from data
    assert sum(r["n_rows"] for r in out) == 10  # out-of-band rows clamp in


def test_random_walks_deterministic_and_adjacent(spark):
    from graph_etl_spark.operators import random_walks

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    out1 = random_walks(edges, walk_length=3, walks_per_node=2).collect()
    out2 = random_walks(edges, walk_length=3, walks_per_node=2).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # reproducible
    adj = {1: {2, 3}, 2: {1, 3}, 3: {1, 2, 4}, 4: {3}}
    walks = {}
    for r in out1:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert len(walks) == 8                      # 4 nodes x 2 walks
    for wid, steps in walks.items():
        assert len(steps) == 4                  # step 0..3, no early stop
        for s in range(3):
            assert steps[s + 1] in adj[steps[s]], (wid, steps)
    # different seed -> (almost surely) different walks
    out3 = random_walks(edges, walk_length=3, walks_per_node=2, seed="v2").collect()
    assert sorted(map(tuple, out1)) != sorted(map(tuple, out3))


def test_winsorize_preserves_nulls_and_rows(spark):
    """Second-review regression: NULL values stay NULL (not fabricated
    into the lower bound) and rows in bound-less groups survive."""
    from graph_etl_spark.operators import winsorize

    rows = [("a", float(v)) for v in range(1, 11)] + [("a", None), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "g", "v", lower_p=0.2, upper_p=0.8).collect()
    assert len(out) == 12                      # every row kept
    for r in out:
        if r["v"] is None:
            assert r["winsorized"] is None     # no fabricated bound


def test_embedding_drift_null_components(spark):
    """Second-review regression: NULL vector elements must not
    inflate the mean denominator."""
    from graph_etl_spark.operators import embedding_drift

    old = spark.createDataFrame([([2.0],), ([None],)], "embedding array<double>")
    new = spark.createDataFrame([([2.0],)], "embedding array<double>")
    out = embedding_drift(old, new).collect()[0]
    assert out["mean_old"] == 2.0 and out["abs_delta"] == 0.0


def test_apply_cdc_delete_wins_full_tie(spark):
    """Second-review regression: a U and D with identical seq and
    payload resolve deterministically — the delete wins."""
    from graph_etl_spark.functions import apply_cdc

    cur = spark.createDataFrame([(1, "a")], "id long, v string")
    chg = spark.createDataFrame(
        [(1, "a", "U", 5), (1, "a", "D", 5)], "id long, v string, op string, seq long"
    )
    for _ in range(3):
        assert apply_cdc(cur, chg, "id").count() == 0


def test_random_walks_rejects_bad_params(spark):
    from graph_etl_spark.operators import random_walks

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    for kw in ({"walk_length": 0}, {"walks_per_node": 0}):
        import pytest as _p
        with _p.raises(ValueError):
            random_walks(edges, **kw)
