"""Candidate-growth audit for ngram_jaccard_pairs (VERDICT r8 #4).

The r8 scale probe's 9.7 runtime ratio at 10x was read as possible
superlinear candidate growth. This audit measures the thing itself:
the number of CANDIDATE PAIRS the capped inverted index generates
(sum over kept postings of C(|ids|, 2)) at 1x / 10x / 100x
replication, alongside the kept-shingle count and wall time.

Analytic bound, for the record: with ``max_shingle_df = c`` every
kept posting list has at most c ids, so

    candidate_pairs  <=  C(c, 2) * kept_shingles
                     <=  C(c, 2) * distinct_shingles

and distinct shingles are bounded by total shingle OCCURRENCES
(= total tokens), which is linear in corpus bytes. So candidate
pairs are O(corpus) with a constant of at most C(16,2) = 120 —
never quadratic, whatever the duplicate structure, because the cap
drops every hot shingle outright (and posting lists are complete
for every kept shingle, so results are exact for the filtered sets).

The probe below confirms the bound empirically with the same
disjoint-copy replication the scale probe uses (cross-copy shingles
cannot collide, so a linear corpus gives exactly linear pairs — any
superlinearity would be a plan bug, not data).

Usage: python tools/ngram_cap_audit.py [n1 n2 ...]  (default 1 10 100)
Prints one JSON line with per-n {pairs, kept_shingles, sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_etl_spark.operators.dedup import shingles_of  # noqa: E402
from graph_etl_spark.operators.text import tokens_col  # noqa: E402
from graph_etl_spark.session import get_spark  # noqa: E402
from graph_etl_spark.sources import read_table  # noqa: E402
from tools.scale_probe import replicate_docs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
CAP = 16


def audit(spark, docs, n):
    from graph_etl_spark.operators import ngram_jaccard_pairs

    d = replicate_docs(docs, n) if n > 1 else docs
    t0 = time.time()
    n_out = ngram_jaccard_pairs(d, threshold=0.12).count()
    sec = round(time.time() - t0, 2)
    # candidate pairs BEFORE the threshold: C(|ids|,2) over kept postings
    sh = d.withColumn("__toks", tokens_col(F.col("text"))).select(
        "doc_id", F.explode(shingles_of(F.col("__toks"), 3)).alias("sh")
    )
    stats = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= CAP)
        .agg(
            F.count(F.lit(1)).alias("kept_shingles"),
            F.sum(F.col("df") * (F.col("df") - 1) / 2).cast("long").alias("pairs"),
        )
        .collect()[0]
    )
    return {
        "n": n,
        "sec": sec,
        "output_pairs": n_out,
        "candidate_pairs": int(stats["pairs"]),
        "kept_shingles": int(stats["kept_shingles"]),
    }


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("ngram-cap-audit")
    docs = read_table(spark, SF_DIR, "documents").localCheckpoint()
    rows = [audit(spark, docs, n) for n in ns]
    base = rows[0]
    for r in rows[1:]:
        r["pairs_per_copy"] = round(r["candidate_pairs"] / r["n"], 1)
        r["pairs_ratio_vs_linear"] = round(
            r["candidate_pairs"] / (base["candidate_pairs"] * r["n"]), 3
        )
    print(json.dumps({"sf_dir": SF_DIR, "cap": CAP, "rows": rows}))


if __name__ == "__main__":
    main()
