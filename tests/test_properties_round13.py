"""Property-based invariants (hypothesis) for the round-13 operators.
Same budget discipline as test_properties.py: few examples,
adversarial shapes (degenerate graphs, repeated tokens, skewed
groups)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from graph_etl_spark import operators as ops

import pytest

# Spark's Arrow python-worker threads bump the recursion limit while a
# hypothesis example is executing; hypothesis notices and warns that it
# won't reset it — harmless here (the limit only ever grows), and the
# suite's zero-warnings bar is worth keeping.
pytestmark = pytest.mark.filterwarnings(
    "ignore:The recursion limit will not be reset"
    ":hypothesis.errors.HypothesisWarning"
)

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

words = st.text(alphabet="abz", min_size=1, max_size=3)
texts = st.lists(words, min_size=1, max_size=30).map(" ".join)


@given(
    docs=st.lists(texts, min_size=1, max_size=6),
    mn=st.sampled_from([1, 2, 4]),
    mx=st.sampled_from([6, 12, 24]),
)
@SET
def test_cdc_guard_invariants(spark, docs, mn, mx):
    """Guards hold on ANY corpus: no chunk exceeds mx; every chunk
    except each doc's last has >= mn tokens; chunk token counts sum
    back to the doc's token count; chunk_idx is dense from 0."""
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    rows = ops.cdc_chunk_hashes(
        df, min_tokens=mn, max_tokens=mx
    ).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        n_tok = len([t for t in docs[doc_id].split(" ") if t])
        assert sum(c["n_tokens"] for c in chunks) == n_tok
        for c in chunks:
            assert c["n_tokens"] <= mx
        for c in chunks[:-1]:
            assert c["n_tokens"] >= mn


@given(
    rows=st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 400)),
        min_size=1,
        max_size=60,
    )
)
@SET
def test_hll_union_merge_equals_rebuild(spark, rows):
    """Mergeability on ANY grouping: the union estimate from merged
    per-group registers must EQUAL hll_distinct run on the
    concatenated corpus, and the exact columns must be consistent."""
    df = spark.createDataFrame(rows, "g string, v long")
    u = ops.hll_union(df, "g", "v", p=4).collect()[0]
    single = ops.hll_distinct(
        df.withColumn("g", F.lit("all")), "g", "v", p=4
    ).collect()[0]
    assert u["hll_union_estimate"] == single["hll_estimate"]
    assert u["exact_union"] == single["exact_distinct"]
    assert u["sum_group_exact"] >= u["exact_union"]


@given(
    edges=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 8)),
        min_size=1,
        max_size=20,
    ),
    k=st.sampled_from([3, 4]),
)
@SET
def test_ktruss_fixpoint_invariant(spark, edges, k):
    """Every surviving edge's support is >= k-2 WITHIN the surviving
    subgraph (the defining truss property), and the output is a
    subset of the canonical input edges."""
    df = spark.createDataFrame(edges, "src long, dst long")
    out = ops.ktruss(df, k=k).collect()
    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    surv = {(r["u"], r["v"]) for r in out}
    assert surv <= canon
    for r in out:
        assert r["support"] >= k - 2


@given(
    rows=st.lists(
        st.tuples(st.sampled_from("xy"), st.sampled_from("xy")),
        min_size=2,
        max_size=40,
    )
)
@SET
def test_cohen_kappa_bounds(spark, rows):
    """kappa <= 1 always; kappa == 1 iff perfect agreement (unless
    degenerate pe=1 -> NULL); po/pe in [0, 1]."""
    df = spark.createDataFrame(rows, "a string, b string")
    r = ops.cohen_kappa(df, "a", "b").collect()[0]
    assert 0.0 <= r["po"] <= 1.0 and 0.0 <= r["pe"] <= 1.0
    if r["kappa"] is not None:
        assert r["kappa"] <= 1.0 + 1e-9
        if r["po"] == 1.0:
            assert r["kappa"] == 1.0


@given(
    sizes=st.lists(st.integers(1, 12), min_size=1, max_size=10),
    budget=st.sampled_from([1, 10, 40]),
)
@SET
def test_token_budget_fill_invariants(spark, sizes, budget):
    """Admitted token sum is < budget + last-admitted-doc's tokens;
    at least one doc admits per non-empty source; admitted rows are
    exactly the cum_before < budget rows."""
    docs = [
        (i, "s", " ".join(["t"] * n)) for i, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    rows = ops.token_budget_fill(df, budget_tokens=budget).collect()
    admitted = [r for r in rows if r["admitted"]]
    assert admitted, "the first doc always admits (cum_before = 0)"
    tot = sum(r["n_tokens"] for r in admitted)
    assert tot < budget + max(r["n_tokens"] for r in admitted) + 1
    for r in rows:
        assert r["admitted"] == (r["cum_before"] < budget)


@given(
    edges=st.lists(
        st.tuples(st.integers(1, 7), st.integers(1, 7)),
        min_size=1,
        max_size=15,
    )
)
@SET
def test_closeness_bounds(spark, edges):
    """H(s) <= n_reached (each term <= 1) and n_reached < n_vertices;
    seeds with no edges score exactly 0."""
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (99,)], "id long")
    got = {r["id"]: r for r in
           ops.closeness_sample(df, seeds, max_hops=4).collect()}
    verts = {v for e in edges for v in e}
    for r in got.values():
        assert r["harmonic_closeness"] <= r["n_reached"] + 1e-9
        assert r["n_reached"] <= max(len(verts), 1)
    assert got[99]["harmonic_closeness"] == 0.0
