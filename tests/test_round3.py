"""Round-3 additions: corpus-quality operators (repetition, hash
sampling, boilerplate n-grams, scrubbing, TF-IDF) and the bounded
exact-dedup audit view."""

from __future__ import annotations

import pyspark.sql.functions as F

from graph_etl_spark import operators as ops
from graph_etl_spark.plans import assert_no_cartesian, plan_stats, plan_string


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_values(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d"),            # no repetition
            (2, "a a a a"),            # fully repeated, all adjacent
            (3, "x y x y"),            # half distinct, no adjacent pairs
        ],
    )
    out = {r["doc_id"]: r for r in ops.repetition_stats(df).collect()}
    assert out[1]["dup_word_frac"] == 0.0
    assert out[1]["top_word_frac"] == 0.25
    assert out[1]["adjacent_repeat_frac"] == 0.0
    assert out[2]["dup_word_frac"] == 0.75
    assert out[2]["top_word_frac"] == 1.0
    assert out[2]["adjacent_repeat_frac"] == 1.0
    assert out[3]["dup_word_frac"] == 0.5
    assert out[3]["top_word_frac"] == 0.5
    assert out[3]["adjacent_repeat_frac"] == 0.0


def test_hash_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    a = {r["doc_id"] for r in ops.hash_sample(df, permille=100).collect()}
    b = {
        r["doc_id"]
        for r in ops.hash_sample(df.repartition(7), permille=100).collect()
    }
    assert a == b, "hash sample must not depend on partitioning"
    # ~10% with hash slack; exact set is fixed by the salt
    assert 60 <= len(a) <= 140
    # a different salt selects a different (deterministic) set
    c = {r["doc_id"] for r in ops.hash_sample(df, permille=100, salt="other").collect()}
    assert c != a


def test_stratified_hash_sample_rates(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(1000)],
        "doc_id long, lang string",
    )
    out = ops.stratified_hash_sample(
        df, strata_col="lang", rates_permille={"en": 0, "fr": 1000}
    ).collect()
    langs = {r["lang"] for r in out}
    assert langs == {"fr"}            # en rate 0 → none; fr rate 1000 → all
    assert len(out) == 500


def test_boilerplate_ngrams_finds_shared_template(spark):
    template = "this document is provided as is without warranty"
    df = _docs(
        spark,
        [(i, f"unique{i} words here {template}") for i in range(4)]
        + [(99, "completely different content entirely")],
    )
    out = ops.boilerplate_ngrams(df, n=5, min_df=3).collect()
    grams = {r["gram"] for r in out}
    assert any(template.split()[0] in g for g in grams)
    assert all(r["df"] >= 3 for r in out)
    # the unique prefixes must not appear
    assert not any("unique0" in g for g in grams)


def test_scrub_contact_strings(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at bob@example.com or visit https://x.io/a today"),
            (2, "no contact info here"),
        ],
    )
    out = {r["doc_id"]: r for r in ops.scrub_contact_strings(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_urls"] == 1
    assert "<EMAIL>" in out[1]["scrubbed"] and "<URL>" in out[1]["scrubbed"]
    assert "bob@example.com" not in out[1]["scrubbed"]
    assert out[2]["n_emails"] == 0 and out[2]["scrubbed"] == "no contact info here"


def test_tfidf_top_terms_ranks_discriminative_terms(spark):
    df = _docs(
        spark,
        [
            (1, "common common rare1 rare1 rare1"),
            (2, "common zebra"),
            (3, "common yak"),
        ],
    )
    out = ops.tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 'common' has df=3 of N=3 → idf=0 → never outranks a unique term
    assert by_doc[1][0]["term"] == "rare1"
    assert by_doc[2][0]["term"] == "zebra"
    assert by_doc[3][0]["term"] == "yak"
    for rows in by_doc.values():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # plan: no cartesian; the N-count enters via broadcast
    assert_no_cartesian(ops.tfidf_top_terms(df, k=2), allow_broadcast_nested_loop=True)


def test_exact_dup_groups_bounded_members(spark):
    # 5 copies of the same text; cap member_ids at 2
    df = _docs(spark, [(i, "same text") for i in range(5)])
    out = ops.exact_dup_groups(df, max_members=2).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_dups"] == 5          # count stays exact
    assert row["keep_id"] == 0
    assert row["member_ids"] == [0, 1]  # the max_members smallest ids
    # single shuffle: window + groupBy share the hash partitioning
    ps = plan_stats(ops.exact_dup_groups(df, max_members=2))
    assert ps.exchanges == 1


def test_exact_dedup_no_roundrobin_exchange(spark):
    df = _docs(spark, [(i, f"text {i % 3}") for i in range(9)])
    deduped = ops.exact_dedup(df)
    assert "RoundRobinPartitioning" not in plan_string(deduped)
    assert deduped.count() == 3


def test_ngram_jaccard_hot_shingle_prefilter(spark):
    # one shingle shared by ALL docs (hot), plus per-pair unique overlap
    df = _docs(
        spark,
        [(i, f"alpha beta gamma tail{i // 2} tail{i // 2} end{i}") for i in range(8)],
    )
    # cap at 4: 'alpha beta gamma' (df=8) must be dropped from index AND sizes
    pairs = ops.ngram_jaccard_pairs(df, shingle_n=3, threshold=0.01, max_shingle_df=4)
    plan = plan_string(pairs)
    assert "CartesianProduct" not in plan
    rows = pairs.collect()
    # doc pairs sharing tail{k} shingles survive; the hot shingle alone
    # must not connect everything to everything
    assert 0 < len(rows) < 28  # 28 = C(8,2) = all-pairs blowup
