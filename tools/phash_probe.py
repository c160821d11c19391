"""Candidate-volume A/B for the pHash pigeonhole join (VERDICT r15
#1): at web-crawl image counts the 63-bit fingerprint's 7 ~9-bit
segments collide essentially at random (expected distinct candidate
pairs ≈ C(N,2)·(1 − (1 − 2⁻⁹)⁷) ≈ N²·0.0068), while the wide 255-bit
fingerprint's 36/37-bit segments collide only for structurally
near-identical images. This probe measures the thing itself on the
synthetic variant corpus: co-bucket join rows (the shuffle/compare
work the equi-join actually does) and distinct candidate pairs, for
both fingerprints at the same max_hamming, beside the true pair
count.

Usage: python tools/phash_probe.py [sf_dir]   (default sf0.1, 5000
images). Prints one JSON line and (from the repo root) is saved as
PHASH_PROBE.json by the round workflow.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_etl_spark import operators as ops  # noqa: E402
from graph_etl_spark.session import get_spark  # noqa: E402
from graph_etl_spark.sources import read_table  # noqa: E402

MAX_HAMMING = 6


def narrow_segments(sig, bits=63):
    """The image_phash_pairs segment explode (same widths/masks)."""
    n_seg = MAX_HAMMING + 1
    widths = [
        bits // n_seg + (1 if i < bits % n_seg else 0) for i in range(n_seg)
    ]
    segs, off = [], 0
    for i, w in enumerate(widths):
        mask = ((1 << w) - 1) << off
        segs.append(
            F.struct(
                F.lit(i).alias("seg_idx"),
                F.col("phash").bitwiseAND(F.lit(mask)).alias("seg_val"),
            )
        )
        off += w
    return sig.select(
        "doc_id", F.explode(F.array(*segs)).alias("s")
    ).select("doc_id", "s.seg_idx", "s.seg_val")


def wide_segments(sig):
    return sig.select(
        "doc_id", F.posexplode("phash").alias("seg_idx", "seg_val")
    )


def bucket_stats(segged):
    """(co-bucket join rows, distinct candidate pairs) from the
    segment frame — C(n,2) per (seg_idx, seg_val) bucket for the rows,
    a distinct a<b self-join for the pairs."""
    rows = (
        segged.groupBy("seg_idx", "seg_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("c"))
        .collect()[0]["c"]
    )
    a, b = segged.alias("a"), segged.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    return int(rows), int(pairs)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("phash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = read_table(spark, sf_dir, "documents").select("doc_id")
    n_images = d.count()
    pngs = ops.synth_png_variant_column(d, group_size=4).localCheckpoint()

    out = {"n_images": n_images, "max_hamming": MAX_HAMMING, "sf_dir": sf_dir}

    t0 = time.time()
    sig63 = (
        ops.image_phash(pngs)
        .filter(F.col("media_type") != "stub")
        .select("doc_id", "phash")
        .localCheckpoint()
    )
    rows63, pairs63 = bucket_stats(narrow_segments(sig63))
    true63 = ops.image_phash_pairs(pngs, max_hamming=MAX_HAMMING).count()
    out["narrow_63bit"] = {
        "seg_bits": "9",
        "cobucket_rows": rows63,
        "candidate_pairs": pairs63,
        "true_pairs": true63,
        "sec": round(time.time() - t0, 2),
    }

    t0 = time.time()
    sigw = (
        ops.image_phash_wide(pngs, n_longs=MAX_HAMMING + 1)
        .filter(F.col("media_type") != "stub")
        .select("doc_id", "phash")
        .localCheckpoint()
    )
    rowsw, pairsw = bucket_stats(wide_segments(sigw))
    truew = ops.image_phash_pairs_wide(pngs, max_hamming=MAX_HAMMING).count()
    out["wide_255bit"] = {
        "seg_bits": "36-37",
        "cobucket_rows": rowsw,
        "candidate_pairs": pairsw,
        "true_pairs": truew,
        "sec": round(time.time() - t0, 2),
    }
    out["candidate_ratio_narrow_over_wide"] = round(
        pairs63 / max(pairsw, 1), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
