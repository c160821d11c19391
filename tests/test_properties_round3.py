"""Property-based invariants (hypothesis) for the round-3 corpus-
quality operators. Same budget discipline as test_properties.py:
few examples, adversarial shapes (empty-ish text, heavy repetition,
unicode, degenerate vectors)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graph_etl_spark import operators as ops

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

words = st.text(alphabet="abé", min_size=1, max_size=3)
texts = st.lists(words, min_size=1, max_size=12).map(" ".join)


@given(docs=st.lists(texts, min_size=1, max_size=8, unique=True))
@SET
def test_repetition_stats_invariants(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = ops.repetition_stats(df).collect()
    assert len(out) == len(docs)
    for r in out:
        n = r["n_tokens"]
        assert 0 <= r["dup_word_frac"] <= 1
        assert 0 < r["top_word_frac"] <= 1
        assert 0 <= r["adjacent_repeat_frac"] <= 1
        # entropy bounded by ln(n); zero iff one distinct token
        assert -1e-9 <= r["token_entropy"] <= math.log(max(n, 1)) + 1e-6
        if r["dup_word_frac"] == 0.0:
            # all distinct -> top word appears once
            assert abs(r["top_word_frac"] - 1.0 / n) < 1e-6


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True),
    permille=st.sampled_from([0, 100, 500, 1000]),
)
@SET
def test_hash_sample_invariants(spark, ids, permille):
    df = spark.createDataFrame([(i, "t") for i in ids], "doc_id long, text string")
    kept = {r["doc_id"] for r in ops.hash_sample(df, permille=permille).collect()}
    assert kept <= set(ids)
    if permille == 0:
        assert kept == set()
    if permille == 1000:
        assert kept == set(ids)
    # membership is per-id deterministic: the kept set is exactly the
    # ids whose hash bucket clears the rate (python-side replica)
    expected = {
        i
        for i in ids
        if int(hashlib.md5(f"sample{i}".encode()).hexdigest()[:14], 16) % 1000
        < permille
    }
    assert kept == expected


@given(
    sizes=st.lists(st.integers(1, 30), min_size=1, max_size=12),
    budget=st.sampled_from([8, 32, 128]),
)
@SET
def test_pack_sequences_invariants(spark, sizes, budget):
    rows = [(i, " ".join(["w"] * s)) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ops.pack_sequences(df, token_budget=budget, n_shards=4).collect()
    assert len(out) == len(sizes)              # every doc exactly once
    by_shard = {}
    for r in out:
        assert r["bin_id"] // 1_000_000_000 == r["shard"]
        by_shard.setdefault(r["shard"], []).append(r)
    for rows_in_shard in by_shard.values():
        rows_in_shard.sort(key=lambda r: r["doc_id"])
        # bin assignment = exclusive-prefix-sum // budget, monotone
        cum = 0
        prev_bin = None
        for r in rows_in_shard:
            assert r["bin_id"] % 1_000_000_000 == cum // budget
            if prev_bin is not None:
                assert r["bin_id"] >= prev_bin
            prev_bin = r["bin_id"]
            cum += r["n_tokens"]


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-8, max_value=8, allow_nan=False, width=32
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=10,
    )
)
@SET
def test_quantize_invariants(spark, vecs):
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<float>"
    )
    out = ops.quantize_embeddings(df).collect()
    assert len(out) == len(vecs)
    for r in out:
        assert all(-127 <= c <= 127 for c in r["qvec"])       # int8 range
        assert r["scale"] > 0
        assert r["mae"] >= 0
        # reconstruction error bounded by half a quantization step
        assert r["mae"] <= 0.5 / r["scale"] + 1e-9


@given(
    docs=st.lists(texts, min_size=1, max_size=6, unique=True),
    chunk=st.integers(2, 8),
    overlap=st.integers(0, 6),
)
@SET
def test_chunk_documents_invariants(spark, docs, chunk, overlap):
    """Chunking invariants for any (chunk, overlap < chunk): chunks
    tile the token stream at stride boundaries, every token is covered,
    the non-overlap prefixes reconstruct the document exactly, and no
    chunk exceeds the width."""
    from hypothesis import assume

    assume(overlap < chunk)
    stride = chunk - overlap
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = ops.chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(docs):
        toks = [t for t in text.split(" ") if t != ""]
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if not toks:
            assert chunks == []
            continue
        import math as _math

        assert len(chunks) == _math.ceil(len(toks) / stride)
        assert [r["chunk_id"] for r in chunks] == list(range(len(chunks)))
        for r in chunks:
            ctoks = [t for t in r["chunk_text"].split(" ") if t != ""]
            assert r["n_tokens"] == len(ctoks) <= chunk
            start = r["chunk_id"] * stride
            assert ctoks == toks[start : start + chunk]
        # the stride-prefixes of all chunks concatenated reconstruct
        # the document (the final chunk may stop overlap short)
        prefix = [t for r in chunks for t in
                  [x for x in r["chunk_text"].split(" ") if x != ""][: stride]]
        assert prefix == toks[: len(prefix)] and len(prefix) >= len(toks) - overlap


# ---------------------------------------------------------------------------
# round-7: duplicate-span scrub + incremental dedup invariants
# ---------------------------------------------------------------------------


@given(docs=st.lists(texts, min_size=1, max_size=6))
@SET
def test_dup_span_scrub_invariants(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = {r["doc_id"]: r for r in ops.dup_span_scrub(df, span_tokens=3).collect()}
    assert len(out) == len(docs)
    for i, text in enumerate(docs):
        r = out[i]
        toks = [t for t in text.split(" ") if t]
        clean = [t for t in r["text_clean"].split(" ") if t]
        # token accounting is exact
        assert r["n_tokens"] == len(toks)
        assert r["n_tokens"] - r["n_removed"] == len(clean)
        # clean text is a subsequence of the original tokens
        it = iter(toks)
        assert all(any(t == o for o in it) for t in clean)
        # spans only exist where something was removed
        assert (r["n_dup_spans"] == 0) == (r["n_removed"] == 0)
    # the lowest-id doc among identical docs is never scrubbed —
    # UNLESS a gram repeats within that doc itself: first-occurrence
    # order is (doc id, token position), so an intra-document repeat
    # (e.g. 'a a a a' with span_tokens=3) is a duplicate of an
    # earlier position in the SAME doc and is scrubbed by design
    first = out[0]
    toks0 = [t for t in docs[0].split(" ") if t]
    grams0 = [tuple(toks0[i : i + 3]) for i in range(len(toks0) - 2)]
    if (
        len(set(docs)) == 1
        and len(toks0) >= 3
        and len(grams0) == len(set(grams0))
    ):
        assert first["n_removed"] == 0


@given(
    idx_texts=st.lists(texts, min_size=1, max_size=5, unique=True),
    bat_texts=st.lists(texts, min_size=1, max_size=5, unique=True),
)
@SET
def test_incremental_dedup_invariants(spark, idx_texts, bat_texts):
    index = spark.createDataFrame(
        list(enumerate(idx_texts)), "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bat_texts)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["verdict"] for r in ops.incremental_dedup(index, batch).collect()}
    assert len(out) == len(bat_texts)  # one verdict per batch doc, always
    norm = lambda s: " ".join(s.lower().split())  # noqa: E731
    idx_norm = {norm(t) for t in idx_texts}
    seen: set = set()
    for i, t in enumerate(bat_texts):
        v = out[100 + i]
        if norm(t) in idx_norm:
            assert v == "exact_index", (t, v)
        elif norm(t) in seen:
            assert v == "exact_batch", (t, v)
        else:
            assert v in ("kept", "near_index"), (t, v)
        seen.add(norm(t))
