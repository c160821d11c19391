"""Round-16 additions: the wide (255-bit) array-of-longs pHash and
its generalized pigeonhole pair join (VERDICT r15 #1), the JVM-side
packed-decimal contamination reduction + eval broadcast gate (VERDICT
r15 #3, code-review r15), the CLIP-score image-text alignment filter
(VERDICT r15 #6), the audio-fingerprint XOR fold, and the
domain_reweight temperature guard (code-review r15)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_etl_spark import operators as ops


# ---------------------------------------------------------------------------
# embedding_contamination: broadcast gate + integral-id contract
# ---------------------------------------------------------------------------


def test_contamination_eval_broadcast_gate_fires(spark):
    """Code-review/VERDICT r15 #3: the eval side is broadcast, so a
    corpus-sized eval_df must fail LOUDLY before the broadcast — the
    markov_steady_state contractual-bound precedent."""
    e = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="max_eval_rows"):
        ops.embedding_contamination(e, e, max_eval_rows=4)
    # at or under the bound (or with the gate disabled) the audit runs
    assert ops.embedding_contamination(e, e, max_eval_rows=8).count() == 8
    assert ops.embedding_contamination(e, e, max_eval_rows=None).count() == 8


def test_contamination_requires_integral_train_ids(spark):
    """The packed-decimal max needs numeric ids; a string id column
    must raise instead of silently NULLing through the decimal cast."""
    ev = spark.createDataFrame(
        [("a", [1.0, 0.0])], "vec_id string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="integral"):
        ops.embedding_contamination(ev, ev, max_eval_rows=None)


def test_contamination_results_unchanged_by_jvm_reduction(spark):
    """The r16 packed-decimal HashAggregate reproduces the r15
    contract exactly: planted copy flags at cos 1.0, ties break to the
    LARGEST train id, rounding matches F.round(cos, 4)."""
    ev = spark.createDataFrame(
        [(1, [3.0, 4.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    train = spark.createDataFrame(
        [
            (10, [6.0, 8.0, 0.0]),   # scaled copy of eval 1 (cos 1.0)
            (11, [1.5, 2.0, 0.0]),   # second copy — tie at cos 1.0
            (12, [0.0, 1.0, 1.0]),   # cos ~0.7071 to eval 2
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["query_id"]: r
        for r in ops.embedding_contamination(train, ev, threshold=0.95).collect()
    }
    assert out[1]["max_cos_sim"] == 1.0 and out[1]["contaminated"]
    assert out[1]["nearest_train_id"] == 11
    assert out[2]["max_cos_sim"] == 0.7071 and not out[2]["contaminated"]
    assert out[2]["nearest_train_id"] == 12


# ---------------------------------------------------------------------------
# domain_reweight: temperature contract
# ---------------------------------------------------------------------------


def test_domain_reweight_rejects_nonpositive_temperature(spark):
    d = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "d e f", "s2")],
        "doc_id long, text string, source string",
    )
    for t in (0.0, -1.0):
        with pytest.raises(ValueError, match="temperature"):
            ops.domain_reweight(d, temperature=t)


# ---------------------------------------------------------------------------
# audio_fingerprint: XOR fold past bit 63
# ---------------------------------------------------------------------------


def _wav_df(spark, clips):
    from graph_etl_spark.operators.multimodal import encode_wav

    rows = [
        (i, bytearray(encode_wav(8000, np.asarray(s, dtype=np.int16))))
        for i, s in clips
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_audio_fingerprint_folds_late_deltas(spark):
    """Code-review r15: two equal-length clips that agree on their
    first 63 energy deltas but diverge later must NOT share a
    fingerprint — the fold XORs late deltas into bit (w-1) % 63
    instead of dropping them."""
    base = [(100 if i % 2 else 50) for i in range(70)]  # alternating up/down
    late = list(base)
    late[68], late[69] = late[69], late[68]  # flip the last two deltas only
    df = _wav_df(spark, [(0, base), (1, late)])
    out = {
        r["doc_id"]: r
        for r in ops.audio_fingerprint(df, window_samples=1).collect()
    }
    assert out[0]["n_windows"] == out[1]["n_windows"] == 70
    assert out[0]["fingerprint"] != out[1]["fingerprint"]


def test_audio_fingerprint_short_clip_pack_unchanged(spark):
    """For <= 63 deltas the fold is bit-identical to the r15 plain
    pack (XOR of disjoint bits IS their sum) — the driver-window
    oracle contract for mm_audio_fingerprint_dedup is untouched."""
    samples = [10, 20, 5, 30, 30, 7]  # ups at deltas 1 and 3
    df = _wav_df(spark, [(0, samples)])
    row = ops.audio_fingerprint(df, window_samples=1).collect()[0]
    assert row["n_windows"] == 6
    assert row["fingerprint"] == (1 << 0) + (1 << 2)  # bits for deltas 1, 3


# ---------------------------------------------------------------------------
# wide pHash: layout, invariance, exactness, pigeonhole plan
# ---------------------------------------------------------------------------


def test_phash_wide_layout_contract():
    assert ops.phash_wide_layout(255, 7) == [37, 37, 37, 36, 36, 36, 36]
    assert ops.phash_wide_layout(255, 5) == [51] * 5
    assert sum(ops.phash_wide_layout(255, 7)) == 255
    with pytest.raises(ValueError, match="n_longs"):
        ops.phash_wide_layout(255, 0)
    with pytest.raises(ValueError, match="63"):
        ops.phash_wide_layout(255, 4)  # 64-bit slices don't fit a long


def test_image_phash_wide_brightness_invariant_and_structured(spark):
    """The 4 brightness variants of each base share the IDENTICAL
    7-long fingerprint (every u>0 row of the k=16 cosine table sums to
    exactly 0); different bases differ in many bits; stubs emit the
    declared all-zero row."""
    d = spark.range(12).withColumnRenamed("id", "doc_id")
    pngs = ops.synth_png_variant_column(d, group_size=4)
    out = {r["doc_id"]: r for r in ops.image_phash_wide(pngs).collect()}
    assert all(len(r["phash"]) == 5 for r in out.values())  # default layout
    for base in range(3):
        hs = {tuple(out[base * 4 + v]["phash"]) for v in range(4)}
        assert len(hs) == 1, f"base {base} variants diverge"
    h0, h4 = out[0]["phash"], out[4]["phash"]
    cross = sum(bin(a ^ b).count("1") for a, b in zip(h0, h4))
    assert cross > 6  # distinct structure, far beyond the pair cap
    stub = spark.createDataFrame(
        [(99, bytearray(b"not-a-png"))], "doc_id long, payload binary"
    )
    srow = ops.image_phash_wide(stub).collect()[0]
    assert srow["media_type"] == "stub" and srow["phash"] == [0] * 5


def test_image_phash_pairs_wide_exact_vs_brute_force(spark):
    """The pigeonhole equi-join over (segment_idx, segment_long)
    reproduces the brute-force Hamming <= d pair set exactly (recall
    1.0 by construction) and plans as an equi-join, not a cartesian."""
    import itertools

    from graph_etl_spark.plans import plan_string

    d = spark.range(24).withColumnRenamed("id", "doc_id")
    pngs = ops.synth_png_variant_column(d, group_size=4)
    wide = ops.image_phash_pairs_wide(pngs, max_hamming=6)
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"]) for r in wide.collect()
    )
    byid = {
        r["doc_id"]: r["phash"]
        for r in ops.image_phash_wide(pngs, n_longs=7).collect()
    }
    bf = sorted(
        (a, b, hm)
        for a, b in itertools.combinations(sorted(byid), 2)
        if (hm := sum(bin(x ^ y).count("1") for x, y in zip(byid[a], byid[b]))) <= 6
    )
    assert got == bf and len(got) == 6 * 6  # 6 groups x C(4,2) triangles
    assert "CartesianProduct" not in plan_string(wide)


def test_image_phash_pairs_warns_on_narrow_segments(spark):
    """VERDICT r15 #1: the 63-bit/d=6 combination (9-bit buckets) now
    warns and points at the wide variant; a wide-bucket setting stays
    silent."""
    import warnings

    d = spark.range(4).withColumnRenamed("id", "doc_id")
    pngs = ops.synth_png_variant_column(d, group_size=4)
    with pytest.warns(UserWarning, match="image_phash_pairs_wide"):
        ops.image_phash_pairs(pngs, max_hamming=6)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ops.image_phash_pairs(pngs, max_hamming=2)  # 21-bit buckets: quiet


# ---------------------------------------------------------------------------
# clip_score_filter: contract + plan
# ---------------------------------------------------------------------------


def test_clip_score_filter_threshold_and_flags(spark):
    """Exact lower-interpolation percentile threshold; aligned pairs
    keep, the planted misaligned pair drops, zero-norm pairs keep
    their row with NULL score and keep=false."""
    rows = [
        (1, [1.0, 0.0], [2.0, 0.0]),    # cos 1.0
        (2, [0.0, 1.0], [0.0, 0.5]),    # cos 1.0
        (3, [1.0, 0.0], [0.0, 1.0]),    # cos 0.0 — misaligned
        (4, [1.0, 1.0], [1.0, 0.0]),    # cos ~0.7071
        (5, [0.0, 0.0], [1.0, 0.0]),    # zero-norm img side
    ]
    pairs = spark.createDataFrame(
        rows,
        "pair_id long, img_embedding array<double>, txt_embedding array<double>",
    )
    out = {
        r["pair_id"]: r
        for r in ops.clip_score_filter(pairs, trim_percentile=0.5).collect()
    }
    assert len(out) == 5  # one row per input pair, zero-norm included
    # sorted non-null scores: [0.0, 0.7071, 1.0, 1.0]; n=4 ->
    # rank floor(0.5*3)+1 = 2 -> threshold 0.7071
    assert out[4]["threshold"] == 0.7071
    assert out[1]["keep"] and out[2]["keep"] and out[4]["keep"]
    assert not out[3]["keep"] and out[3]["clip_score"] == 0.0
    assert out[5]["clip_score"] is None and not out[5]["keep"]
    with pytest.raises(ValueError, match="trim_percentile"):
        ops.clip_score_filter(pairs, trim_percentile=1.0)


def test_clip_score_filter_plan_no_corpus_shuffle_beyond_rank(spark):
    """VERDICT r15 #6 plan guard: scoring is JVM-side (no Python
    eval), the threshold crosses as a 1-row broadcast (never a
    cartesian against the corpus), and ranking is the two-phase shape
    — no unpartitioned non-bucket window."""
    from graph_etl_spark.plans import plan_string

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = e.select(
        F.col("vec_id").alias("pair_id"),
        F.col("embedding").alias("img_embedding"),
        F.col("embedding").alias("txt_embedding"),
    )
    p = plan_string(ops.clip_score_filter(pairs))
    assert "CartesianProduct" not in p
    for py in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert py not in p, py
    # the only window is the bucket-local rank: partitioned by __bkt
    import re

    for spec in re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", p):
        assert "__bkt" in spec, f"unpartitioned window: {spec}"


# ---------------------------------------------------------------------------
# fix_mojibake + embedding_outliers (round-16 post-freeze, r17 lead)
# ---------------------------------------------------------------------------


def test_fix_mojibake_counts_and_repairs(spark):
    """Marker counting before repair, chained literal repair, NULL
    text keeps its row at count 0, clean text passes through."""
    d = spark.createDataFrame(
        [
            (1, "cafÃ© dÃ©jÃ  vu"),          # 3 x 'Ã©'? no: Ã©, Ã©, Ã  — 2 markers
            (2, "itâ€™s â€œquotedâ€œ fine"),
            (3, "plain ascii"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ops.fix_mojibake(d).collect()}
    assert out[1]["n_mojibake"] == 2
    assert out[1]["text_fixed"] == "café déjÃ  vu"  # Ã  not in the map
    assert out[2]["n_mojibake"] == 3
    assert out[2]["text_fixed"] == "it’s “quoted“ fine"
    assert out[3]["n_mojibake"] == 0
    assert out[3]["text_fixed"] == "plain ascii"
    assert out[4]["n_mojibake"] == 0 and out[4]["text_fixed"] is None


def test_mojibake_map_is_true_cp1252_misdecode():
    """Every bad form in the map IS the cp1252 misdecode of its fix —
    the map cannot drift into folklore."""
    for bad, good in ops.MOJIBAKE_MAP:
        assert bad == good.encode("utf-8").decode("cp1252"), (bad, good)


def test_fix_mojibake_plan_is_pure_map(spark):
    from graph_etl_spark.plans import plan_string

    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    p = plan_string(ops.fix_mojibake(d))
    assert "Exchange" not in p and "Window" not in p


def test_embedding_outliers_flags_planted_scale(spark):
    """A 10x-scaled copy sits far off every dimension's corpus scale
    and must flag; in-distribution vectors must not; a zero-variance
    dimension is excluded rather than dividing by zero."""
    base = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(4)] + [1.0])
        for i in range(40)
    ]
    planted = [(100, [50.0, 50.0, 50.0, 50.0, 1.0])]
    e = spark.createDataFrame(
        base + planted, "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in ops.embedding_outliers(e, threshold=4.0).collect()}
    assert out[100]["is_outlier"]
    assert sum(r["is_outlier"] for r in out.values()) == 1
    # the constant 5th dim contributes nothing (sd=0 -> term 0)
    assert all(r["z2"] is not None for r in out.values())


def test_embedding_outliers_max_dims_gate(spark):
    e = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="max_dims"):
        ops.embedding_outliers(e, max_dims=2)


def test_embedding_outliers_scoring_is_map_side(spark):
    """After the dim-bounded stats collect, scoring is a pure map —
    no shuffle, no Python eval in the output plan."""
    from graph_etl_spark.plans import plan_string

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    p = plan_string(ops.embedding_outliers(e))
    assert "Exchange" not in p and "Window" not in p
    for py in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert py not in p, py


# ---------------------------------------------------------------------------
# video_keyframe_signature (round-16 post-freeze, r17 lead)
# ---------------------------------------------------------------------------


def test_video_keyframe_signature_groups_variants(spark):
    """Brightness-shifted variants of one base video share the exact
    signature (diffs and AC coefficients are shift-invariant at %250);
    different bases never collide; scene counts follow the fixture's
    closed form ceil(nf/sl); undecodable payloads are dropped."""
    import math

    d = spark.range(20).withColumnRenamed("id", "doc_id")
    clips = ops.synth_y4m_variant_column(d, group_size=2)
    out = {
        r["doc_id"]: (r["n_scenes"], r["keyframe_sig"])
        for r in ops.video_keyframe_signature(clips).collect()
    }
    assert len(out) == 20
    sigs = {}
    for i, s in out.items():
        sigs.setdefault(s, []).append(i)
        base = i // 2
        nf, sl = 4 + base % 3, 1 + base % 3
        assert out[i][0] == math.ceil(nf / sl), i
    assert sorted(len(v) for v in sigs.values()) == [2] * 10
    assert all(sorted(v)[1] == sorted(v)[0] + 1 for v in sigs.values())
    junk = spark.createDataFrame(
        [(99, bytearray(b"not-a-video"))], "doc_id long, payload binary"
    )
    assert ops.video_keyframe_signature(junk).count() == 0


def test_video_keyframe_signature_detects_content_change(spark):
    """A clip differing from another in ONE scene's luma content gets
    a different signature even with equal scene counts — the dedup
    key sees content, not just structure."""
    from graph_etl_spark.operators.multimodal import encode_y4m
    import numpy as np

    def clip(doc_id, pattern_shift):
        w = h = 8
        frames = []
        for s in range(2):  # 2 scenes x 1 frame, cut between
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            y = ((s * 97 + yy * 11 + xx * (7 + pattern_shift)) % 250).astype(
                np.uint8
            )
            uv = np.zeros((h // 2) * (w // 2), dtype=np.uint8)
            frames.append(y.tobytes() + uv.tobytes() + uv.tobytes())
        return (doc_id, bytearray(encode_y4m(w, h, frames)))

    df = spark.createDataFrame(
        [clip(0, 0), clip(1, 0), clip(2, 150)],
        "doc_id long, payload binary",
    )
    out = {
        r["doc_id"]: r["keyframe_sig"]
        for r in ops.video_keyframe_signature(df).collect()
    }
    assert out[0] == out[1]
    assert out[0] != out[2]


# ---------------------------------------------------------------------------
# minhash_contamination (round-16 post-freeze, r17 lead)
# ---------------------------------------------------------------------------


def test_minhash_contamination_flags_planted_copy(spark):
    """An exact copy of an eval doc in the train corpus collides in
    every band and scores Jaccard 1.0; a lightly-edited near-copy
    scores high; an unrelated eval doc keeps its row (NULL or low max,
    not contaminated); ties break to the largest train id."""
    ev = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "completely different subject matter about spark shuffles"),
            (3, "zebra quantum paradox mountain seventeen violet cascade xylophone"),
        ],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog again today"),
            (11, "the quick brown fox jumps over the lazy dog again today"),
            (12, "spark shuffles are completely different subject matter about"),
            (13, "unrelated corpus document mentioning nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["query_id"]: r
        for r in ops.minhash_contamination(train, ev, threshold=0.8).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["max_jaccard"] == 1.0 and out[1]["contaminated"]
    assert out[1]["nearest_train_id"] == 11  # largest id at the tie
    assert not out[3]["contaminated"]


def test_minhash_contamination_plan_jvm_argmax(spark):
    """The per-eval reduction is the shared packed-decimal
    HashAggregate — no SortAggregate of the candidate stream, no
    Python eval, no cartesian anywhere."""
    from graph_etl_spark.plans import plan_string

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = d.filter(F.col("doc_id") < 5).select("doc_id", "text")
    tr = d.filter(F.col("doc_id") >= 5).select("doc_id", "text")
    p = plan_string(ops.minhash_contamination(tr, ev))
    assert "CartesianProduct" not in p
    assert "SortAggregate" not in p
    for py in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert py not in p, py


def test_packed_max_by_order_and_decode(spark):
    """The shared pack is order-isomorphic to (value, id) with ties to
    the largest id, and the decode reproduces the rounded value
    exactly at both supported scales."""
    from graph_etl_spark.operators.similarity import packed_max_by

    df = spark.createDataFrame(
        [(1, 0.9123, 5), (1, 0.9123, 9), (1, -0.5, 2), (2, 1.0, -7)],
        "g int, v double, tid long",
    )
    for r in (4, 6):
        out = {
            row["g"]: row
            for row in packed_max_by(df, "g", "v", "tid", round_to=r).collect()
        }
        assert out[1]["__tid"] == 9 and out[2]["__tid"] == -7
        assert out[1]["__scaled"] / 10**r == 0.9123
        assert out[2]["__scaled"] / 10**r == 1.0
