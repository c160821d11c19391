"""Round-12 additions: ADVICE regression fixes (table_checksum
delimiter escaping, minhash_jaccard_audit broadcast removal,
as_of_join NULL-timestamp handling, louvain_move/modularity
missing-endpoint alignment) plus the round's new operators.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_etl_spark import operators as ops

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_table_checksum_delimiter_and_sentinel_collisions(spark):
    """ADVICE r11: ('a|b','c') vs ('a','b|c') and a literal '<NULL>'
    string vs NULL must checksum differently — the per-value escaping
    makes the '|'-join injective."""
    import graph_etl_spark.functions as fn

    d1 = spark.createDataFrame([("a|b", "c")], "x string, y string")
    d2 = spark.createDataFrame([("a", "b|c")], "x string, y string")
    assert (
        fn.table_checksum(d1, ["x", "y"]).collect()[0]["checksum"]
        != fn.table_checksum(d2, ["x", "y"]).collect()[0]["checksum"]
    )
    d3 = spark.createDataFrame([("<NULL>",)], "x string")
    d4 = spark.createDataFrame([(None,)], "x string")
    assert (
        fn.table_checksum(d3, ["x"]).collect()[0]["checksum"]
        != fn.table_checksum(d4, ["x"]).collect()[0]["checksum"]
    )
    # backslash round-trip: ('a\', 'b') vs ('a', '\b')
    d5 = spark.createDataFrame([("a\\", "b")], "x string, y string")
    d6 = spark.createDataFrame([("a", "\\b")], "x string, y string")
    assert (
        fn.table_checksum(d5, ["x", "y"]).collect()[0]["checksum"]
        != fn.table_checksum(d6, ["x", "y"]).collect()[0]["checksum"]
    )
    # order-freeness survives the escaping
    a = spark.createDataFrame([(1, "p|q"), (2, None)], "k long, s string")
    b = spark.createDataFrame(
        [(2, None), (1, "p|q")], "k long, s string"
    ).repartition(3)
    ca = fn.table_checksum(a, ["k", "s"]).collect()[0]
    cb = fn.table_checksum(b, ["k", "s"]).collect()[0]
    assert (ca["n_rows"], ca["checksum"]) == (cb["n_rows"], cb["checksum"])


def test_minhash_audit_no_forced_broadcast(spark):
    """ADVICE r11: the candidate-pair frame is data-dependent — the
    plan must not carry a forced broadcast hint on it (AQE decides
    from runtime sizes)."""
    df = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog %d" % (i % 3),)
         for i in range(12)],
        "doc_id long, text string",
    )
    out = ops.minhash_jaccard_audit(df, num_perm=8, bands=4)
    # estimates stay exact for identical docs
    rows = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    for (a, b), r in rows.items():
        if a % 3 == b % 3:
            assert r["exact_jaccard"] == 1.0
            assert r["est_jaccard"] == 1.0 and r["abs_err"] == 0.0


def test_asof_join_nearest_null_right_ts_ignored(spark):
    """ADVICE r11: a right row with NULL right_ts must never win a
    'nearest' pick over a real forward match."""
    left = spark.createDataFrame(
        [("k", "2024-01-01 00:00:10")], "k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", None, "phantom"), ("k", "2024-01-01 00:00:12", "real")],
        "k string, ts string, v string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = ops.as_of_join(
        left, right, on="k", direction="nearest"
    ).collect()
    assert len(out) == 1 and out[0]["v_right"] == "real"
    # backward/forward directions also never surface the null-ts row
    for d in ("backward", "forward"):
        got = ops.as_of_join(left, right, on="k", direction=d).collect()[0]
        assert got["v_right"] in (None, "real")


def test_asof_join_null_left_ts_matches_nothing(spark):
    left = spark.createDataFrame(
        [("k", None), ("k", "2024-01-01 00:00:10")], "k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:05", "r1")], "k string, ts string, v string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for d in ("backward", "forward", "nearest"):
        rows = {
            (r["ts"] is None): r["v_right"]
            for r in ops.as_of_join(left, right, on="k", direction=d).collect()
        }
        assert rows[True] is None, f"direction={d} matched a NULL-ts left row"


def test_louvain_move_modularity_agree_on_partial_labels(spark):
    """ADVICE r11: the iterate/meter pair must share the
    missing-endpoint convention — unlabeled endpoints keep their edge
    mass in m and degrees; only labeled nodes move."""
    # triangle 1-2-3 labeled A, plus labeled node 4 (B) bridging to the
    # triangle, plus UNLABELED node 9 attached everywhere
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (1, 9), (2, 9), (4, 9)],
        "src long, dst long",
    )
    comm = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B")], "id long, community string"
    )
    moves = ops.louvain_move(edges, comm)
    got = {r["id"]: r for r in moves.collect()}
    # only labeled nodes appear
    assert set(got) == {1, 2, 3, 4}
    # node 4: k_{4,A}=1 (edge 3-4; edge 4-9 offers no candidate),
    # staying scores 2m*0 - k_4*(tot_B - k_4) = 0 with tot_B = k_4 = 2
    # (edge mass from BOTH its edges, incl. the unlabeled neighbor);
    # moving to A scores 2*7*1 - 2*10 = -6 < 0 -> stays put under the
    # aligned convention (the old inner-join m/degrees flipped this)
    assert got[4]["new_community"] == "B" and not got[4]["moved"]
    assert all(not got[i]["moved"] for i in (1, 2, 3))
    # the meter agrees on the masses: m=7, tot_A = deg(1,2,3) = 3+3+3,
    # tot_B = 2 under the same left-join convention
    mod = {r["community"]: r for r in ops.modularity(edges, comm).collect()}
    assert mod["A"]["degree_sum"] == 9 and mod["B"]["degree_sum"] == 2
    assert mod["A"]["inner_edges"] == 3 and mod["B"]["inner_edges"] == 0


def test_louvain_move_labeled_island_keeps_node(spark):
    """A labeled node whose every neighbor is unlabeled used to vanish
    from the output (inner-join); it must now survive and stay put."""
    edges = spark.createDataFrame([(1, 9)], "src long, dst long")
    comm = spark.createDataFrame([(1, "A")], "id long, community string")
    rows = ops.louvain_move(edges, comm).collect()
    assert len(rows) == 1
    assert rows[0]["id"] == 1 and not rows[0]["moved"]


def test_bloom_semi_join_paths_bit_identical(spark):
    """The broadcast/mapInPandas production probe must pass EXACTLY
    the rows the literal-array oracle twin passes (incl. the same
    deterministic false positives) with multiplicity."""
    fact = spark.createDataFrame(
        [(i % 700, i) for i in range(4000)], "k long, payload long"
    )
    dim = spark.createDataFrame([(i * 7,) for i in range(50)], "dk long")
    lit_rows = sorted(
        (r["k"], r["payload"])
        for r in ops.bloom_semi_join(fact, dim, "k", "dk", n_bits=512).collect()
    )
    bc_rows = sorted(
        (r["k"], r["payload"])
        for r in ops.bloom_semi_join(
            fact, dim, "k", "dk", n_bits=512, scale=True
        ).collect()
    )
    assert lit_rows == bc_rows and len(lit_rows) > 0


def test_bloom_semi_join_scale_handles_million_key_dim(spark):
    """VERDICT r11 #2: at 1 M dim keys and ~10 bits/key the literal
    path would serialize a 312 500-long literal array (multi-MB) into
    every task; the broadcast probe carries it executor-side. No false
    negatives; the probe plan is an Arrow map stage with no giant
    literal and no exchange after the build."""
    from graph_etl_spark.plans import plan_string

    n_keys = 1_000_000
    dim = spark.range(n_keys).withColumnRenamed("id", "dk")
    fact = spark.range(50_000).select(
        (F.col("id") * 40).alias("k"), F.col("id").alias("payload")
    )  # k in [0, 2M): half are true dim keys, half misses
    out = ops.bloom_semi_join(
        fact, dim, "k", "dk", n_bits=10_000_000, n_hashes=3, scale=True
    )
    plan = plan_string(out)
    assert "MapInPandas" in plan
    assert len(plan) < 100_000, "plan embeds the filter as literals"
    assert "Exchange" not in plan, "probe must stay map-side"
    got = {r["k"] for r in out.collect()}
    true_keys = {i * 40 for i in range(50_000) if i * 40 < n_keys}
    assert true_keys <= got, "bloom filter produced false negatives"
    # a 10-bits/key filter keeps the false-positive rate tiny
    fp = len(got - true_keys)
    assert fp < 2_500, f"false-positive blowup: {fp} of 25000 misses"


def test_louvain_communities_converges_two_cliques(spark):
    """Full loop: two 4-cliques joined by one bridge, each seeded with
    one defector — the loop must repair both defectors, converge to
    the clean two-community structure, and then hold it (fixed
    point)."""
    c1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]
    edges = spark.createDataFrame(c1 + c2 + [(4, 5)], "src long, dst long")
    # defector seed: node 2 mislabeled into Y, node 6 into X
    seed = spark.createDataFrame(
        [(1, "X"), (2, "Y"), (3, "X"), (4, "X"),
         (5, "Y"), (6, "X"), (7, "Y"), (8, "Y")],
        "id long, community string",
    )
    out = {r["id"]: r["community"] for r in
           ops.louvain_communities(edges, seed, max_rounds=8).collect()}
    assert [out[i] for i in range(1, 5)] == ["X"] * 4, "clique 1 not repaired"
    assert [out[i] for i in range(5, 9)] == ["Y"] * 4, "clique 2 not repaired"
    # the converged labels are a fixed point: a bigger budget is a no-op
    out2 = {r["id"]: r["community"] for r in
            ops.louvain_communities(edges, seed, max_rounds=20).collect()}
    assert out == out2


def test_louvain_communities_budget_bounds_oscillation(spark):
    """A perfectly symmetric alternating 2-coloring is the parallel
    pathology the fixed budget exists for: the loop must terminate at
    the budget deterministically (run-to-run identical labels), even
    though no fixed point is reached."""
    c1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]
    edges = spark.createDataFrame(c1 + c2 + [(4, 5)], "src long, dst long")
    seed = spark.createDataFrame(
        [(i, "X" if i % 2 == 0 else "Y") for i in range(1, 9)],
        "id long, community string",
    )
    one = sorted((r["id"], r["community"]) for r in
                 ops.louvain_communities(edges, seed, max_rounds=5).collect())
    two = sorted((r["id"], r["community"]) for r in
                 ops.louvain_communities(edges, seed, max_rounds=5).collect())
    assert one == two and len(one) == 8


def test_louvain_communities_validates_budget(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seed = spark.createDataFrame([(1, "A"), (2, "B")],
                                 "id long, community string")
    with pytest.raises(ValueError):
        ops.louvain_communities(edges, seed, max_rounds=0)


def test_image_ahash_brightness_invariant_and_structure_sensitive(spark):
    """aHash must be EXACTLY invariant to a uniform brightness shift
    (integer grayscale/mean shift together) and must flip on a
    structural edit — the property that makes it an image-dedup key
    where md5 fails."""
    import numpy as np

    from graph_etl_spark.operators.multimodal import encode_png

    h, w = 10, 12
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(3), indexing="ij"
    )
    base = ((yy * 7 + xx * 3 + cc * 11 + (yy * xx * 3) % 97) % 240).astype(
        np.uint8
    )
    bright = (base + 9).astype(np.uint8)  # uniform shift, no wrap
    structural = base.copy()
    structural[:5] = 255 - structural[:5]  # invert the top half
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_png(w, h, base.tobytes()))),
            (2, bytearray(encode_png(w, h, bright.tobytes()))),
            (3, bytearray(encode_png(w, h, structural.tobytes()))),
            (4, bytearray(b"not a png")),
        ],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in ops.image_ahash(df).collect()}
    k = lambda r: (r["ahash_w0"], r["ahash_w1"])  # noqa: E731
    assert got[1]["media_type"] == "png" and got[1]["width"] == w
    assert k(got[1]) == k(got[2]), "brightness shift changed the hash"
    assert k(got[1]) != k(got[3]), "structural edit did not change it"
    assert got[4]["media_type"] == "stub" and k(got[4]) == (0, 0)


def test_image_ahash_grid_validation(spark):
    df = spark.createDataFrame([(1, bytearray(b""))], "doc_id long, payload binary")
    with pytest.raises(ValueError):
        ops.image_ahash(df, grid=9)
    with pytest.raises(ValueError):
        ops.image_ahash(df, grid=0)


def test_synth_png_variants_group_exactly(spark):
    """Every group of 4 shares an aHash; byte digests all differ
    (md5 dedup finds nothing, the perceptual hash finds the groups)."""
    d = spark.range(32).withColumnRenamed("id", "doc_id")
    pngs = ops.synth_png_variant_column(d, group_size=4)
    hashes = ops.image_ahash(pngs).collect()
    by_group = {}
    for r in hashes:
        by_group.setdefault(r["doc_id"] // 4, set()).add(
            (r["ahash_w0"], r["ahash_w1"])
        )
    assert all(len(v) == 1 for v in by_group.values()), "group hash split"
    assert len({next(iter(v)) for v in by_group.values()}) == len(by_group)
    digs = ops.attach_binary_metadata(pngs).select("content_digest").collect()
    assert len({r["content_digest"] for r in digs}) == 32


def test_hll_distinct_estimates_within_sketch_error(spark):
    """m=64 registers give sd ~= 1.04/sqrt(64) ~= 13%; the estimate
    must land within a generous 3-sigma band of the exact count, and
    exact_distinct must be exact."""
    df = spark.createDataFrame(
        [("a", i) for i in range(5000)] + [("b", i) for i in range(40)],
        "g string, v long",
    )
    got = {r["g"]: r for r in ops.hll_distinct(df, "g", "v", p=6).collect()}
    assert got["a"]["exact_distinct"] == 5000
    assert got["b"]["exact_distinct"] == 40
    assert abs(got["a"]["hll_estimate"] - 5000) / 5000 < 0.4
    assert got["a"]["rel_err"] < 0.4
    # duplicates must not move the sketch: same distinct set, 3x rows
    dup = df.unionAll(df).unionAll(df)
    got2 = {r["g"]: r for r in ops.hll_distinct(dup, "g", "v", p=6).collect()}
    assert got2["a"]["hll_estimate"] == got["a"]["hll_estimate"]
    assert got2["b"]["hll_estimate"] == got["b"]["hll_estimate"]


def test_hll_distinct_validates_p(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError):
        ops.hll_distinct(df, "g", "v", p=0)
    with pytest.raises(ValueError):
        ops.hll_distinct(df, "g", "v", p=13)


def test_betweenness_textbook_graphs(spark):
    """Brandes on P4 (both middle vertices bridge 2 ordered pairs each
    -> 4.0) and on a 3-leaf star (center bridges all 6 ordered leaf
    pairs -> 6.0); endpoints/leaves score 0."""
    p4 = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    all4 = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
    got = {r["id"]: r["betweenness"] for r in
           ops.betweenness_sample(p4, all4, max_hops=3).collect()}
    assert got == {1: 0.0, 2: 4.0, 3: 4.0, 4: 0.0}
    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src long, dst long")
    sall = spark.createDataFrame([(i,) for i in range(4)], "id long")
    got = {r["id"]: r["betweenness"] for r in
           ops.betweenness_sample(star, sall, max_hops=2).collect()}
    assert got == {0: 6.0, 1: 0.0, 2: 0.0, 3: 0.0}


def test_betweenness_hop_budget_and_frontier_early_stop(spark):
    """A budget larger than the diameter is a no-op (the frontier
    empties and the loop stops), and the hop budget truncates honestly
    (hops=1 sees no length-2 paths, so nothing bridges)."""
    p4 = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    all4 = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
    full = {r["id"]: r["betweenness"] for r in
            ops.betweenness_sample(p4, all4, max_hops=10).collect()}
    assert full == {1: 0.0, 2: 4.0, 3: 4.0, 4: 0.0}
    short = {r["id"]: r["betweenness"] for r in
             ops.betweenness_sample(p4, all4, max_hops=1).collect()}
    assert all(v == 0.0 for v in short.values())
    with pytest.raises(ValueError):
        ops.betweenness_sample(p4, all4, max_hops=0)


def test_betweenness_equal_path_splitting(spark):
    """Cycle C4 (1-2-3-4-1): opposite vertices are joined by TWO equal
    shortest paths, so each intermediate vertex gets sigma-fraction
    1/2 per ordered pair -> every vertex scores 2 * (1/2) * 2 = 1.0
    summed over its two bridged pairs... exactly 1.0 each."""
    c4 = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    allv = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
    got = {r["id"]: r["betweenness"] for r in
           ops.betweenness_sample(c4, allv, max_hops=2).collect()}
    assert got == {1: 1.0, 2: 1.0, 3: 1.0, 4: 1.0}


def test_cdc_chunks_shift_resistant(spark):
    """The CDC property: prepend 3 tokens and most chunk hashes
    survive (boundaries are local content), where every fixed window
    would change. Disjoint content shares nothing."""
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa quebec romeo "
        "sierra tango uniform victor whiskey xray yankee zulu one "
        "two three four five six seven eight nine ten eleven twelve"
    )
    df = spark.createDataFrame(
        [
            (1, base),
            (2, "P1 P2 P3 " + base),
            (3, "totally different content with words nobody shares"),
        ],
        "doc_id long, text string",
    )
    rows = ops.cdc_chunk_hashes(df, window=4, mask_bits=3).collect()
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], set()).add(r["chunk_hash"])
    shared = len(per[1] & per[2])
    assert shared >= len(per[1]) - 2, "prefix shift destroyed chunks"
    assert not (per[1] & per[3])
    rep = {r["doc_id"]: r for r in
           ops.cdc_dedup_report(df, window=4, mask_bits=3).collect()}
    assert rep[1]["n_shared_chunks"] == shared
    assert rep[3]["n_shared_chunks"] == 0 and rep[3]["shared_ratio"] == 0.0
    # token accounting: every token lands in exactly one chunk
    assert rep[1]["n_chunk_tokens"] == len(base.split())
    with pytest.raises(ValueError):
        ops.cdc_chunk_hashes(df, window=0)


def test_mad_outliers_robust_where_zscore_breaks(spark):
    """The one-spike stress: a 10^6 spike inflates sigma so the plain
    z-score misses a clear secondary outlier; median/MAD flag both and
    nothing else."""
    rows = [("g", i, 10.0 + (i % 5) * 0.1) for i in range(40)]
    rows += [("g", 100, 1e6), ("g", 101, -500.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {r["id"] for r in
           ops.mad_outliers(df, "g", "v", "id").collect()}
    assert got == {100, 101}
    # degenerate MAD=0: every defector from the median flags, NULL z
    df2 = spark.createDataFrame(
        [("c", i, 5.0) for i in range(10)] + [("c", 99, 6.0)],
        "g string, id long, v double",
    )
    out = ops.mad_outliers(df2, "g", "v", "id").collect()
    assert len(out) == 1 and out[0]["id"] == 99 and out[0]["mod_z"] is None


def test_degree_assortativity_textbook_values(spark):
    """Star graph: perfectly disassortative (r = -1); regular graph:
    zero degree variance -> NULL; a path P3 has r = -1 as well (every
    edge joins the hub to a leaf)."""
    star = spark.createDataFrame([(0, i) for i in range(1, 6)],
                                 "src long, dst long")
    row = ops.degree_assortativity(star).collect()[0]
    assert (row["m_edges"], row["n_nodes"], row["r"]) == (5, 6, -1.0)
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src long, dst long",
    )
    row = ops.degree_assortativity(k4).collect()[0]
    assert row["r"] is None and row["m_edges"] == 6


def test_cohort_ltv_cumulates_exactly(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 10.0),
        (1, "2024-01-09 10:00:00", 5.0),
        (2, "2024-01-09 11:00:00", 7.0),
        (2, "2024-01-16 09:00:00", 3.0),
        (3, "2024-01-09 12:00:00", None),  # null value counts a user
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    got = {
        (r["cohort_period"], r["period_offset"]): r
        for r in ops.cohort_ltv(df, period_days=7).collect()
    }
    c1 = min(k[0] for k in got)
    assert got[(c1, 0)]["period_value"] == 10.0
    assert got[(c1, 1)]["cum_value"] == 15.0
    assert got[(c1 + 1, 0)]["n_users"] == 2  # users 2 and 3
    assert got[(c1 + 1, 0)]["period_value"] == 7.0
    assert got[(c1 + 1, 1)]["cum_value"] == 10.0


def test_dup_rate_by_source_charges_non_canonical(spark):
    """Three identical docs from source B vs unique docs from source A:
    B is charged 2 redundant of 3 (the canonical survivor is free),
    A is charged 0."""
    text_dup = "the same exact duplicated content words repeated here"
    rows = [
        (1, "unique alpha text one of a kind first", "A"),
        (2, "another unique beta text nothing shared", "A"),
        (3, text_dup, "B"),
        (4, text_dup, "B"),
        (5, text_dup, "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in ops.dup_rate_by_source(df).collect()}
    assert got["A"]["n_docs"] == 2 and got["A"]["n_redundant"] == 0
    assert got["B"]["n_docs"] == 3 and got["B"]["n_redundant"] == 2
    assert got["B"]["dup_rate"] == pytest.approx(2 / 3, abs=1e-6)


def test_burstiness_periodic_vs_bursty(spark):
    """Perfectly periodic stream -> B = -1 (sigma = 0); a burst then
    long silence -> B > 0; single-event users are excluded."""
    rows = [(1, f"2024-01-01 00:{m:02d}:00") for m in range(0, 50, 5)]
    rows += [(2, f"2024-01-01 00:00:0{s}") for s in range(5)]
    rows += [(2, "2024-01-01 09:00:00"), (3, "2024-01-01 00:00:00")]
    df = spark.createDataFrame(rows, "user_id long, ts string").selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts"
    )
    got = {r["user_id"]: r for r in ops.burstiness(df).collect()}
    assert set(got) == {1, 2}, "single-event user must be excluded"
    assert got[1]["burstiness"] == -1.0 and got[1]["std_gap_us"] == 0.0
    assert got[2]["burstiness"] > 0.3
    assert got[1]["n_gaps"] == 9 and got[1]["mean_gap_us"] == 300e6
