"""Round-14 additions: C4-style cross-corpus line dedup, Flesch
readability, the small-file compaction planner, CCNet perplexity
buckets, DCT pHash, and A/B power analysis."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_etl_spark import operators as ops


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    """A line shared by two docs is removed from BOTH (corpus-frequency
    policy, unlike passage_dedup's keep-first); a within-doc repeat
    below min_docs survives; reassembly preserves line order."""
    boiler = " ".join(f"b{i}" for i in range(8))
    uniq1 = " ".join(f"u{i}" for i in range(8))
    uniq2 = " ".join(f"v{i}" for i in range(8))
    d = spark.createDataFrame(
        [
            (1, f"{boiler} {uniq1}"),
            (2, f"{uniq2} {boiler}"),
            # doc 3: same line TWICE within one doc — 1 distinct doc,
            # below min_docs=2, so the repeat is NOT boilerplate
            (3, f"{uniq1.replace('u', 'w')} {uniq1.replace('u', 'w')}"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ops.line_dedup(d, line_tokens=8, min_docs=2).collect()
    }
    assert out[1]["n_removed"] == 1 and out[1]["text_kept"] == uniq1
    assert out[2]["n_removed"] == 1 and out[2]["text_kept"] == uniq2
    assert out[3]["n_removed"] == 0 and out[3]["n_lines"] == 2

    # pure-boilerplate doc survives with empty text (drop is policy)
    d2 = spark.createDataFrame(
        [(1, boiler), (2, boiler)], "doc_id long, text string"
    )
    rows = ops.line_dedup(d2, line_tokens=8, min_docs=2).collect()
    assert all(r["text_kept"] == "" and r["n_removed"] == 1 for r in rows)


def test_readability_flesch_formula(spark):
    """Hand-checked Flesch/FK values; sentence floor at 1; empty doc
    yields NULL scores, not a fake 0.0."""
    d = spark.createDataFrame(
        [(1, "the cat sat. the dog ran!"), (2, "word"), (3, " ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ops.readability_scores(d).collect()}
    r1 = out[1]
    # 6 words, 2 sentences; syllables: the=1 cat=1 sat.=1 dog=1 ran!=1
    # the=1 -> 6
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (6, 2, 6)
    assert r1["flesch"] == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 4)
    assert r1["fk_grade"] == round(0.39 * 3.0 + 11.8 * 1.0 - 15.59, 4)
    assert out[2]["n_sentences"] == 1  # floor: no punctuation
    assert out[3]["n_words"] == 0 and out[3]["flesch"] is None


def test_compaction_plan_actions_and_file_counts(spark, tmp_path):
    """split/tiny/ok thresholds; with count_files=True a partition
    spread over more files than its target flags 'compact'."""
    rows = [("big", "x" * 2000, i) for i in range(30)]  # 60KB >> 4KB
    rows += [("small", "y" * 10, i) for i in range(3)]  # 30B < 512B
    rows += [("mid", "z" * 100, i) for i in range(30)]  # 3KB in [512,4K]
    d = spark.createDataFrame(rows, "part string, payload string, i long")
    plan = {
        r["part"]: r
        for r in ops.compaction_plan(d, ["part"], target_bytes=4096).collect()
    }
    assert plan["big"]["action"] == "split"
    assert plan["big"]["n_files_target"] >= 2
    assert plan["small"]["action"] == "tiny"
    assert plan["mid"]["action"] == "ok"
    # est model: strings by byte length, scalars 8B
    assert plan["small"]["est_bytes"] == 3 * (10 + 8)

    # physical file counting: 8 files for one partition, target 1
    p = str(tmp_path / "frag")
    d.filter(F.col("part") == "mid").repartition(8).write.parquet(p)
    frag = spark.read.parquet(p)
    plan2 = ops.compaction_plan(
        frag, ["part"], target_bytes=4096, count_files=True
    ).collect()[0]
    assert plan2["n_files"] == 8 and plan2["n_files_target"] == 1
    assert plan2["action"] == "compact"


def test_ppl_buckets_per_language_terciles(spark):
    """Buckets are equal-count WITHIN each language (ntile contract:
    sizes differ by at most 1) and ordered by perplexity: every head
    doc's ppl <= every tail doc's ppl in the same language."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = ops.ppl_buckets(
        d, train_df=ops.hash_sample(d, permille=500, salt="lm")
    )
    rows = out.collect()
    assert len(rows) == d.filter(F.length("text") > 0).count()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        sizes = [sum(1 for r in rs if r["bucket"] == b) for b in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        heads = [r["ppl"] for r in rs if r["bucket_label"] == "head"]
        tails = [r["ppl"] for r in rs if r["bucket_label"] == "tail"]
        assert max(heads) <= min(tails), lang


def test_image_phash_brightness_invariant_structure_sensitive(spark):
    """The documented invariance is EXACT: the 4 brightness variants of
    one base image share one pHash; different bases (different
    structure) produce different hashes; a non-PNG payload falls back
    to the stub row."""
    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pngs = ops.synth_png_variant_column(ids, group_size=4)
    got = {r["doc_id"]: r for r in ops.image_phash(pngs).collect()}
    g0 = {got[i]["phash"] for i in range(4)}
    g1 = {got[i]["phash"] for i in range(4, 8)}
    assert len(g0) == 1 and len(g1) == 1 and g0 != g1
    assert all(got[i]["media_type"] == "image/png" for i in range(8))

    junk = spark.createDataFrame(
        [(1, bytearray(b"not a png"))], "doc_id long, payload binary"
    )
    stub = ops.image_phash(junk).collect()[0]
    assert stub["media_type"] == "stub" and stub["phash"] == 0


def test_phash_cos_table_ac_rows_sum_zero():
    """The invariance precondition: every u>0 row of the rounded
    fixed-point DCT basis sums to exactly 0 (so a constant brightness
    shift contributes exactly nothing to any non-DC coefficient)."""
    from graph_etl_spark.operators.multimodal import phash_cos_table

    tab = phash_cos_table(32, 8)
    assert [sum(r) for r in tab[1:]] == [0] * 7
    assert sum(tab[0]) == 32 * (1 << 14)


def test_ab_power_analysis_monotone_and_formula(spark):
    """n_per_arm strictly decreases as MDE grows; the 10% row matches
    the closed form computed by hand from the measured baseline."""
    import math

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = {
        r["mde_rel"]: r
        for r in ops.ab_power_analysis(e, min_events=15).collect()
    }
    ns = [rows[m]["n_per_arm"] for m in sorted(rows)]
    assert ns == sorted(ns, reverse=True) and ns[-1] > 0
    # closed form at mde=0.10 from the base rate
    p = rows[0.1]["base_rate"]
    p2 = p * 1.1
    zsum2 = (1.959964 + 0.841621) ** 2
    expect = math.ceil(zsum2 * (p * (1 - p) + p2 * (1 - p2)) / (p * 0.1) / (p * 0.1))
    assert rows[0.1]["n_per_arm"] == expect


def test_video_scene_cuts_ground_truth(spark):
    """Cuts fire exactly at scene boundaries of the multi-scene
    fixture: doc 0 (scene length 1) cuts at every pair; doc 1
    (length 2) cuts at even frame indices only; doc 2 (length 3)
    cuts at frame 3 only; within-scene diffs are exactly 0. A junk
    payload yields the stub row."""
    ids = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    clips = ops.synth_y4m_scenes_column(ids)
    got = {}
    for r in ops.video_scene_cuts(clips).collect():
        got[(r["doc_id"], r["frame_idx"])] = r
    # doc 0: nf=4, L=1 -> pairs 1..3 all cuts
    assert all(got[(0, f)]["is_cut"] for f in (1, 2, 3))
    # doc 1: nf=5, L=2 -> scenes [0,1],[2,3],[4]: cuts at 2 and 4
    assert [got[(1, f)]["is_cut"] for f in (1, 2, 3, 4)] == [
        False, True, False, True,
    ]
    assert got[(1, 1)]["diff_sum"] == 0 and got[(1, 3)]["diff_sum"] == 0
    # doc 2: nf=6, L=3 -> scenes [0..2],[3..5]: only frame 3 cuts
    assert [got[(2, f)]["is_cut"] for f in (1, 2, 3, 4, 5)] == [
        False, False, True, False, False,
    ]

    junk = spark.createDataFrame(
        [(9, bytearray(b"nope"))], "doc_id long, payload binary"
    )
    stub = ops.video_scene_cuts(junk).collect()[0]
    assert (stub["frame_idx"], stub["diff_sum"], stub["is_cut"]) == (0, 0, False)


def test_ab_diff_in_diff_nets_out_trend_and_baseline(spark):
    """A synthetic panel with a group baseline gap (+10 for
    treatment), a secular trend (+5 post for everyone), and a true
    treatment effect (+3 post, treatment only): DiD recovers exactly
    +3 while the naive post-period gap reads +13."""
    from datetime import datetime

    from graph_etl_spark.operators.text import h56

    users = list(range(40))
    rows = []
    pre, post = datetime(2024, 1, 1), datetime(2024, 1, 9)
    for u in users:
        for period, ts in (("pre", pre), ("post", post)):
            base = 20.0
            rows.append((u, ts, "purchase", base))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    variant = (h56(F.col("user_id").cast("string")) % 2).alias("v")
    flags = df.select("user_id", variant).distinct()
    adj = (
        df.join(flags, "user_id")
        .withColumn(
            "value",
            F.col("value")
            + F.when(F.col("v") == 1, 10.0).otherwise(0.0)       # baseline gap
            + F.when(F.col("ts") >= F.lit(post), 5.0).otherwise(0.0)  # trend
            + F.when(
                (F.col("v") == 1) & (F.col("ts") >= F.lit(post)), 3.0
            ).otherwise(0.0),                                     # true effect
        )
        .drop("v")
    )
    out = ops.ab_diff_in_diff(adj).collect()[0]
    assert out["did"] == pytest.approx(3.0, abs=1e-6)
    naive = out["mean_post_treat"] - out["mean_post_control"]
    assert naive == pytest.approx(13.0, abs=1e-6)
    # empty-cell safety: a stream with no treatment users yields NULL
    # did, never a fake 0
    ctl_only = adj.join(
        flags.filter(F.col("v") == 0).select("user_id"), "user_id", "left_semi"
    )
    out2 = ops.ab_diff_in_diff(ctl_only).collect()[0]
    assert out2["did"] is None and out2["n_pre_treat"] == 0


def test_soft_dedup_weights_mass_conservation(spark):
    """Each near-dup cluster contributes exactly 1.0 total weight
    (up to the 6-dp round); singletons weigh 1; every input doc keeps
    a row (keep-everything contract)."""
    base = " ".join(f"tok{i}" for i in range(60))
    rows = [(i, base) for i in range(3)]          # one 3-copy cluster
    rows += [(10, " ".join(f"a{i}" for i in range(60)))]   # singleton
    rows += [(11, " ".join(f"b{i}" for i in range(60)))]   # singleton
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = ops.soft_dedup_weights(d, num_perm=16, bands=8).collect()
    assert len(out) == 5
    got = {r["doc_id"]: r for r in out}
    assert all(got[i]["cluster_size"] == 3 for i in range(3))
    assert all(got[i]["weight"] == pytest.approx(1 / 3, abs=1e-6) for i in range(3))
    assert got[10]["weight"] == 1.0 and got[11]["weight"] == 1.0
    # cluster mass ~1 each: 3 * round(1/3) + 1 + 1
    total = sum(r["weight"] for r in out)
    assert total == pytest.approx(3.0, abs=1e-5)


def test_minhash_recall_curve_monotone(spark):
    """Recall and candidate count are non-decreasing in the band
    count (looser buckets recover strictly more truth); every hit is
    a truth pair (recall <= 1); the truth count is band-invariant."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(
        ops.minhash_recall_curve(
            d, band_options=(2, 4, 8), threshold=0.12
        ).collect(),
        key=lambda r: r["bands"],
    )
    assert [r["bands"] for r in rows] == [2, 4, 8]
    assert len({r["n_truth"] for r in rows}) == 1
    recalls = [r["recall"] for r in rows]
    cands = [r["n_candidates"] for r in rows]
    assert cands == sorted(cands)
    assert all(r is None or 0.0 <= r <= 1.0 for r in recalls)
    real = [r for r in recalls if r is not None]
    assert real == sorted(real)
