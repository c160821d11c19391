"""Property-based invariants (hypothesis) for the round-15 operators.
Same budget discipline as test_properties.py: few examples,
adversarial shapes (scaled duplicates, degenerate corpora, arbitrary
int16 signals)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from graph_etl_spark import operators as ops

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
texts = st.lists(words, min_size=3, max_size=20).map(" ".join)


@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-4, max_value=4), min_size=4, max_size=4
        ),
        min_size=2,
        max_size=8,
    )
)
@SET
def test_semdedup_survivors_partition_invariants(spark, vecs):
    """For ANY vector corpus: every input id appears exactly once;
    cluster_id is a member of its own cluster (min id); kept rows =
    distinct clusters; cluster_size sums back to the corpus size."""
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ops.semantic_dedup_survivors(
        d, k=min(2, len(rows)), max_iter=1, threshold=0.999
    ).collect()
    assert sorted(r["vec_id"] for r in out) == list(range(len(rows)))
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        ids = [m["vec_id"] for m in members]
        assert cid == min(ids)  # representative is the min member
        assert all(m["cluster_size"] == len(ids) for m in members)
        assert sum(m["keep"] for m in members) == 1
        assert next(m for m in members if m["keep"])["vec_id"] == cid


@given(docs=st.lists(texts, min_size=2, max_size=8))
@SET
def test_cluster_split_is_a_partition_keyed_on_clusters(spark, docs):
    """Every doc gets exactly one split; docs sharing a cluster share
    a split; singleton assignment equals dataset_split's label."""
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = ops.cluster_split(d).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(len(docs)))
    label_by_cluster: dict = {}
    for r in out:
        assert r["split"] in ("train", "val", "test")
        prev = label_by_cluster.setdefault(r["cluster_id"], r["split"])
        assert prev == r["split"]
    base = {
        r["doc_id"]: r["split"] for r in ops.dataset_split(d).collect()
    }
    for r in out:
        if r["cluster_id"] == r["doc_id"]:
            # cluster keyed on this doc's own id -> same hash input
            assert r["split"] == base[r["doc_id"]]


@given(
    sig=st.lists(
        st.integers(min_value=-32767, max_value=32767),
        min_size=1,
        max_size=64,
    )
)
@SET
def test_audio_fingerprint_polarity_invariance_any_signal(spark, sig):
    """For ANY int16 signal (not just the fixture): the phase-inverted
    clip has the identical (n_windows, fingerprint)."""
    from graph_etl_spark.operators.multimodal import encode_wav

    d = spark.createDataFrame(
        [
            (0, bytearray(encode_wav(16000, sig))),
            (1, bytearray(encode_wav(16000, [-s for s in sig]))),
        ],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["fingerprint"])
        for r in ops.audio_fingerprint(d, window_samples=8).collect()
    }
    assert got[0] == got[1]


@given(
    groups=st.lists(
        st.tuples(words, st.integers(min_value=1, max_value=5)),
        min_size=2,
        max_size=4,
        unique_by=lambda t: t[0],
    )
)
@SET
def test_domain_reweight_simplex_and_share_limit(spark, groups):
    """Weights are a probability simplex (sum ~1, all > 0) and at very
    high temperature recover each domain's natural share."""
    rows = []
    i = 0
    for src, n in groups:
        for j in range(n):
            rows.append((i, f"s_{src}", f"w{i} x{j} y{src} " * 3))
            i += 1
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    train = ops.hash_sample(d, permille=500, salt="lm")
    out = ops.domain_reweight(d, train_df=train).collect()
    assert abs(sum(r["weight"] for r in out) - 1.0) < 1e-4
    assert all(r["weight"] > 0 for r in out)
    total = sum(n for _, n in groups)
    flat = {
        r["source"]: r["weight"]
        for r in ops.domain_reweight(d, temperature=1e12, train_df=train).collect()
    }
    for src, n in groups:
        assert abs(flat[f"s_{src}"] - n / total) < 1e-4, (src, n, total)
