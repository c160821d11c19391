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
