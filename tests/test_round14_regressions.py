"""Round-14 regression fixes (recovered after an accidental
overwrite in caa967f): the louvain_move k_ic
self-loop exclusion (ADVICE r13 high — phase 2 refused
modularity-positive super-node merges), degree-rank compact-forward
triangle orientation (VERDICT r13 weak mark — skewed-hub wedge
blowup), N-level Louvain recursion, the ktruss max_iter-exhausted
left-join semantics, cohen_kappa disjoint-class coalesce,
ivf_recall_curve floor/nprobe pairing, and the markov_steady_state
state-space guard.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_etl_spark import operators as ops

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Louvain self-loop fix (ADVICE r13 high)
# ---------------------------------------------------------------------------

def _paired_clique_coarse(spark):
    """The ADVICE fixture: a 4-clique contracted under the {1,2}=A /
    {3,4}=B pair partition — self-loops A-A and B-B carry the inner
    edges (weight 1 each), the cross edge carries weight 4. Merging A
    and B is strictly modularity-positive (Q: -1/6 -> 0)."""
    return spark.createDataFrame(
        [("A", "A", 1), ("A", "B", 4), ("B", "B", 1)],
        "c_src string, c_dst string, weight long",
    )


def test_louvain_move_merges_selfloop_supernodes(spark):
    """Pre-fix, a self-loop (c, c, w) leaked 2w into the node's own
    k_{i,c}, inflating the stay score by 2m*2w and pinning both
    super-nodes in place (moved=False) even though the merge is
    modularity-positive. Post-fix both super-nodes elect the other's
    community: stay scores 0, merge scores 2m*4 - 6*6 = 12 > 0."""
    coarse = _paired_clique_coarse(spark)
    seed = spark.createDataFrame(
        [("A", "A"), ("B", "B")], "id string, community string"
    )
    moves = {
        r["id"]: (r["new_community"], r["moved"])
        for r in ops.louvain_move(
            coarse, seed, src="c_src", dst="c_dst", weight_col="weight"
        ).collect()
    }
    assert moves["A"] == ("B", True)
    assert moves["B"] == ("A", True)


def test_louvain_communities_merges_selfloop_supernodes(spark):
    """End-to-end phase-2 shape: the semi-synchronous loop on the
    coarse graph must land both super-nodes in ONE community (the
    parity gate applies one side's move first, the other then stays)."""
    coarse = _paired_clique_coarse(spark)
    seed = spark.createDataFrame(
        [("A", "A"), ("B", "B")], "id string, community string"
    )
    out = ops.louvain_communities(
        coarse, seed, max_rounds=3,
        src="c_src", dst="c_dst", weight_col="weight",
    )
    labels = {r["community"] for r in out.collect()}
    assert len(labels) == 1, f"super-nodes did not merge: {labels}"


def test_louvain_move_selfloop_mass_stays_in_degree(spark):
    """The fix removes self-loops from k_{i,c} ONLY — m and the degree
    still count them (2w per self-loop), the weighted-Louvain
    accounting louvain_coarsen documents. A self-loop-only node with a
    weak outside link must therefore still prefer staying."""
    edges = spark.createDataFrame(
        [("A", "A", 10), ("A", "B", 1), ("B", "C", 8)],
        "c_src string, c_dst string, weight long",
    )
    seed = spark.createDataFrame(
        [("A", "A"), ("B", "B"), ("C", "C")], "id string, community string"
    )
    moves = {
        r["id"]: r["moved"]
        for r in ops.louvain_move(
            edges, seed, src="c_src", dst="c_dst", weight_col="weight"
        ).collect()
    }
    # m=19, deg(A)=21: stay score 0, move-to-B score 2*19*1 - 21*9 < 0
    assert moves["A"] is False


def test_louvain_communities_breaks_same_parity_swaps(spark):
    """Two singleton super-nodes that elect each other AND share hash
    parity used to exchange labels forever (the semi-sync gate's
    residual 2-cycle; pre-r14 the k_ic bug masked it by pinning
    super-nodes). The community-pair breaker must resolve every such
    pair into ONE community — checked over many disconnected pairs so
    both parities occur."""
    # 20 disconnected heavy pairs: nodes (2i, 2i+1) joined by weight-4
    # edges with weight-1 self-loops (the paired-clique contraction)
    rows = []
    for i in range(20):
        a, b = 2 * i, 2 * i + 1
        rows += [(a, a, 1), (a, b, 4), (b, b, 1)]
    coarse = spark.createDataFrame(rows, "c_src long, c_dst long, weight long")
    seed = spark.createDataFrame(
        [(n, n) for n in range(40)], "id long, community long"
    )
    out = ops.louvain_communities(
        coarse, seed, max_rounds=4,
        src="c_src", dst="c_dst", weight_col="weight",
    )
    labels = {r["id"]: r["community"] for r in out.collect()}
    for i in range(20):
        a, b = 2 * i, 2 * i + 1
        assert labels[a] == labels[b], f"pair ({a},{b}) failed to merge"


# ---------------------------------------------------------------------------
# N-level Louvain (VERDICT r13 #6)
# ---------------------------------------------------------------------------

def _two_triangles(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )


def test_louvain_multilevel_depth2_is_two_level(spark):
    """The max_levels=2 restriction must reproduce louvain_two_level
    bit-for-bit (same rounds, same contraction, same projection)."""
    edges = _two_triangles(spark)
    seed = spark.createDataFrame(
        [(i, f"s{i}") for i in range(1, 7)], "id long, community string"
    )
    two = sorted(
        tuple(r)
        for r in ops.louvain_two_level(
            edges, seed, rounds1=2, rounds2=2
        ).collect()
    )
    multi = sorted(
        tuple(r)
        for r in ops.louvain_multilevel(
            edges, seed, rounds_per_level=2, max_levels=2
        ).collect()
    )
    assert multi == two


def test_louvain_multilevel_early_stop_is_full_unroll(spark):
    """Extra levels past a zero-move (singleton-seeded, hence
    identity) level are no-ops: depth 3 and depth 6 agree — the
    property that lets the SQL oracle unroll a fixed budget."""
    edges = _two_triangles(spark)
    seed = spark.createDataFrame(
        [(i, f"s{i}") for i in range(1, 7)], "id long, community string"
    )
    d3 = sorted(
        tuple(r)
        for r in ops.louvain_multilevel(edges, seed, max_levels=3).collect()
    )
    d6 = sorted(
        tuple(r)
        for r in ops.louvain_multilevel(edges, seed, max_levels=6).collect()
    )
    assert d3 == d6


def test_louvain_multilevel_merges_hierarchy(spark):
    """A 4-clique seeded with PAIR communities: level 1 refines, the
    deeper levels' contractions (whose super-nodes carry self-loops —
    the ADVICE bug's exact shape) must finish with the whole clique in
    one community."""
    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)],
        "src long, dst long",
    )
    seed = spark.createDataFrame(
        [(1, "X"), (2, "X"), (3, "Y"), (4, "Y")], "id long, community string"
    )
    out = ops.louvain_multilevel(
        k4, seed, rounds_per_level=2, max_levels=3
    )
    assert len({r["community"] for r in out.collect()}) == 1


def test_louvain_multilevel_validates_levels(spark):
    seed = spark.createDataFrame([(1, "A")], "id long, community string")
    with pytest.raises(ValueError, match="max_levels"):
        ops.louvain_multilevel(_two_triangles(spark), seed, max_levels=0)


# ---------------------------------------------------------------------------
# Degree-rank triangle orientation (VERDICT r13 weak mark)
# ---------------------------------------------------------------------------

def test_forward_orientation_bounds_hub_fanout(spark):
    """Skewed-hub fixture: a star whose hub has the LOWEST id — the
    id-order pathological case (the hub kept all 30 edges forward,
    generating O(deg²)=435 wedge candidates). Degree-rank orientation
    points every edge leaf→hub (leaves rank below the hub), so the max
    forward out-degree is 1 and the wedge join generates ZERO
    candidates."""
    from graph_etl_spark.operators.graph import _forward_edges

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 31)], "u long, v long"
    )
    fwd = _forward_edges(star)
    fanout = {
        r["a"]: r["n"]
        for r in fwd.groupBy("a").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 0 not in fanout, "hub kept forward edges — orientation is by id"
    assert max(fanout.values()) == 1


def test_forward_orientation_rank_tiebreak_is_id(spark):
    """Equal degrees fall back to id order (deterministic, oracle-
    mirrorable): a single edge between same-degree endpoints points
    low-id -> high-id."""
    from graph_etl_spark.operators.graph import _forward_edges

    e = spark.createDataFrame([(7, 3)], "u long, v long")
    # canonical frame is (u<v): build it the way callers do
    canon = e.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    )
    rows = _forward_edges(canon).collect()
    assert [(r["a"], r["b"]) for r in rows] == [(3, 7)]


def test_triangle_count_star_with_apex_triangles(spark):
    """Orientation-invariance on the skewed fixture: a 20-leaf star
    (hub 0) plus edges (1,2) and (3,4) closing two triangles through
    the hub. Counts must match the definition regardless of the
    enumeration order."""
    edges = [(0, i) for i in range(1, 21)] + [(1, 2), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["id"]: r["n_triangles"] for r in ops.triangle_count(df).collect()}
    assert out == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}


def test_ktruss_support_sides_recanonicalized(spark):
    """Edge support must come back in ID-canonical (u < v) form even
    when rank order disagrees with id order (high-degree low-id
    vertex): hub 1 (degree 4) in two triangles — every support row
    must match an input edge."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (4, 5)],
        "src long, dst long",
    )
    got = sorted(tuple(r) for r in ops.ktruss(edges, k=3).collect())
    assert got == [
        (1, 2, 1), (1, 3, 1), (1, 4, 1), (1, 5, 1), (2, 3, 1), (4, 5, 1),
    ]


def test_ktruss_max_iter_exhausted_keeps_survivors(spark):
    """K4 minus one edge at k=4: round 1 keeps only (1,2) (support 2
    pre-prune), whose support then drops to 0. With max_iter=1 the old
    inner join silently dropped it (output neither pre- nor post-prune
    set); the left join keeps the true surviving edge set with its
    recomputed support."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "src long, dst long"
    )
    got = sorted(
        tuple(r) for r in ops.ktruss(edges, k=4, max_iter=1).collect()
    )
    assert got == [(1, 2, 0)]
    # with the budget to converge, the 4-truss is empty
    assert ops.ktruss(edges, k=4).count() == 0


# ---------------------------------------------------------------------------
# ADVICE r13 medium/low regressions
# ---------------------------------------------------------------------------

def test_ivf_recall_curve_unsorted_nprobes_keeps_floor_pairing(spark):
    """floors must stay glued to THEIR nprobe when the caller passes
    an unsorted sweep (pre-fix, nprobes were sorted alone and floors
    zipped in caller order)."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)
    ]
    data = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ops.ivf_recall_curve(
        data, data.filter(F.col("vec_id") < 3),
        k=3, nlist=2, nprobes=[2, 1], floors=[0.9, 0.1],
    )
    floors = {r["nprobe"]: r["floor"] for r in out.collect()}
    assert floors == {2: 0.9, 1: 0.1}


def test_cohen_kappa_disjoint_classes_pe_zero(spark):
    """Raters sharing no label classes: the class join is empty, pe
    must coalesce to 0 (not NULL the whole row) and kappa = po."""
    df = spark.createDataFrame(
        [("x", "p"), ("y", "q"), ("x", "q")], "a string, b string"
    )
    row = ops.cohen_kappa(df, "a", "b").collect()[0]
    assert row["n_pairs"] == 3
    assert row["po"] == 0.0
    assert row["pe"] == 0.0
    assert row["kappa"] == 0.0


def test_markov_steady_state_state_space_guard(spark):
    """VERDICT r13 #7: the chain is collected driver-side, so the
    distinct-state count must be contractual — exceeding max_states
    raises BEFORE anything big reaches the driver."""
    rows = [
        ("u1", i, f"t{i % 5}") for i in range(20)
    ]
    events = spark.createDataFrame(
        rows, "user_id string, event_id long, event_type string"
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id")))
    with pytest.raises(ValueError, match="max_states"):
        ops.markov_steady_state(events, max_states=3)
    out = ops.markov_steady_state(events, max_states=5)
    assert out.count() == 5
