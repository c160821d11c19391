"""Round-15 additions: the two-phase per-language ppl bucketing
(VERDICT r14 #1 — no whole-language single-task sort), the cached
truth frame in minhash_recall_curve, the CDC lister abstraction, and
SemDeDup per-cluster semantic dedup."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from graph_etl_spark import operators as ops


def _skewed_docs(spark):
    """90% of rows in one dominant language + two tiny ones — the
    exact shape the per-language single-task sort choked on."""
    rows = []
    for i in range(180):
        rows.append((i, "en", f"alpha beta gamma doc{i} " * (2 + i % 7)))
    for i in range(180, 192):
        rows.append((i, "fr", f"un deux trois doc{i} " * (2 + i % 5)))
    for i in range(192, 200):
        rows.append((i, "de", f"eins zwei drei doc{i} " * (3 + i % 4)))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


@pytest.mark.parametrize("n_buckets", [3, 4])
def test_ppl_buckets_bit_identical_to_direct_ntile(spark, n_buckets):
    """The two-phase rank reproduces the direct
    ``ntile(n) OVER (PARTITION BY lang ORDER BY ppl, id)`` window
    bit-for-bit on a skewed-language fixture — same (ppl, id)
    tie-break, so the oracle contract is unchanged (VERDICT r14 #1)."""
    from graph_etl_spark.operators.quality import trigram_perplexity

    d = _skewed_docs(spark)
    train = ops.hash_sample(d, permille=500, salt="lm")
    got = {
        r["doc_id"]: (r["bucket"], r["bucket_label"])
        for r in ops.ppl_buckets(d, n_buckets=n_buckets, train_df=train).collect()
    }
    scored = trigram_perplexity(d, train_df=train)
    w = Window.partitionBy("lang").orderBy("ppl", "doc_id")
    direct = (
        scored.join(d.select("doc_id", "lang"), "doc_id")
        .withColumn("bucket", F.ntile(n_buckets).over(w))
        .collect()
    )
    assert len(got) == len(direct) > 0
    for r in direct:
        assert got[r["doc_id"]][0] == r["bucket"], r["doc_id"]
    if n_buckets == 3:
        labels = {1: "head", 2: "middle", 3: "tail"}
        for r in direct:
            assert got[r["doc_id"]][1] == labels[r["bucket"]]
    else:
        for r in direct:
            assert got[r["doc_id"]][1] == f"b{r['bucket']}"


def test_ppl_buckets_dominant_language_spans_shards(spark):
    """The scale property itself: on the skewed fixture the dominant
    language must be split across MULTIPLE sub-bucket shards (the
    per-(lang, shard) windows each sort a fraction of the language,
    never the whole thing)."""
    from graph_etl_spark.operators.quality import trigram_perplexity

    d = _skewed_docs(spark)
    train = ops.hash_sample(d, permille=500, salt="lm")
    # replicate phase 1 exactly: boundaries exist for the dominant
    # language whenever shuffle partitions > 1, which the session sets
    n_parts = max(
        2, int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    )
    probs = [i / n_parts for i in range(1, n_parts)]
    scored = trigram_perplexity(d, train_df=train).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    bounds = (
        scored.filter(F.col("lang") == "en")
        .agg(F.percentile_approx("ppl", probs, 10000).alias("b"))
        .collect()[0]["b"]
    )
    assert len(set(bounds)) >= 2, "dominant language would sort in one task"
