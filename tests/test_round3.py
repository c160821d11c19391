"""Round-3 additions: corpus-quality operators (repetition, hash
sampling, boilerplate n-grams, scrubbing, TF-IDF) and the bounded
exact-dedup audit view."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

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
    # entropy: all-distinct → ln(4); degenerate → 0; two-symbol → ln(2)
    import math

    assert abs(out[1]["token_entropy"] - math.log(4)) < 1e-5
    assert out[2]["token_entropy"] == 0.0
    assert abs(out[3]["token_entropy"] - math.log(2)) < 1e-5


def test_repetition_stats_null_and_empty_text(spark):
    """NULL text must behave like empty text: n_tokens 0 and all
    fractions 0.0 — not the legacy size(NULL) = -1 (and not a NULL the
    DuckDB oracle would emit)."""
    df = _docs(spark, [(1, None), (2, ""), (3, "   ")])
    out = {r["doc_id"]: r for r in ops.repetition_stats(df).collect()}
    for i in (1, 2, 3):
        assert out[i]["n_tokens"] == 0
        assert out[i]["dup_word_frac"] == 0.0
        assert out[i]["top_word_frac"] == 0.0
        assert out[i]["adjacent_repeat_frac"] == 0.0
        assert out[i]["token_entropy"] == 0.0


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


def test_source_quota_cap_deterministic_and_bounded(spark):
    """Per-source quota: every source capped at N, membership invariant
    to partitioning (content-hash order, not arrival order), ranks
    dense 1..cap."""
    df = spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(400)], "doc_id long, source string"
    )
    out = ops.source_quota_cap(df, cap=25).collect()
    per_src: dict = {}
    for r in out:
        per_src.setdefault(r["source"], []).append((r["quota_rank"], r["doc_id"]))
    assert set(per_src) == {"src0", "src1", "src2", "src3"}
    for src, rows in per_src.items():
        assert sorted(rk for rk, _ in rows) == list(range(1, 26)), src
    a = {(r["source"], r["doc_id"]) for r in out}
    b = {
        (r["source"], r["doc_id"])
        for r in ops.source_quota_cap(df.repartition(7), cap=25).collect()
    }
    assert a == b, "quota membership must not depend on partitioning"
    # hash order, not id order: the kept set is NOT simply the lowest ids
    assert {d for _, d in a} != set(range(100))


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


def test_exact_dedup_single_shuffle_no_join(spark):
    df = _docs(spark, [(i, f"text {i % 3}") for i in range(9)])
    deduped = ops.exact_dedup(df)
    assert "RoundRobinPartitioning" not in plan_string(deduped)
    ps = plan_stats(deduped)
    assert ps.exchanges == 1 and ps.joins == 0
    assert deduped.count() == 3
    # survivor is the lowest id per content group
    assert {r["doc_id"] for r in deduped.collect()} == {0, 1, 2}


def test_contamination_report(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with different words"),
            (3, "the quick brown fox appears here too"),
        ],
    )
    benchmark = corpus.filter(F.col("doc_id") == 1)
    out = {r["doc_id"]: r for r in ops.contamination_report(corpus, benchmark).collect()}
    assert out[1]["contamination_frac"] == 1.0     # benchmark doc overlaps itself
    assert out[2]["n_hits"] == 0                   # no shared 3-grams
    assert 0 < out[3]["contamination_frac"] < 1.0  # shares 'the quick brown' etc.
    # benchmark side must broadcast, corpus must not cartesian
    assert_no_cartesian(ops.contamination_report(corpus, benchmark))


def test_pack_sequences_budget_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * 50)) for i in range(40)], "doc_id long, text string"
    )
    out = ops.pack_sequences(df, token_budget=100, n_shards=4).collect()
    assert len(out) == 40
    # within a shard, docs in id order fill bins of <=2 docs (50+50=100)
    by_bin = {}
    for r in out:
        by_bin.setdefault(r["bin_id"], []).append(r)
    assert all(len(rows) <= 2 for rows in by_bin.values())
    # partition-layout invariance (same hash shards regardless of input split)
    out2 = ops.pack_sequences(df.repartition(13), token_budget=100, n_shards=4).collect()
    assert {(r["doc_id"], r["bin_id"]) for r in out} == {
        (r["doc_id"], r["bin_id"]) for r in out2
    }


def test_kmeans_centroids_converges_to_planted_clusters(spark):
    # two tight planted clusters around (0,0,..) and (10,10,..)
    rows = []
    for i in range(10):
        rows.append((i, [float((i % 3) * 0.01)] * 4))
        rows.append((100 + i, [10.0 + (i % 3) * 0.01] * 4))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ops.kmeans_centroids(df, k=2, max_iter=3).collect()
    cents = {}
    for r in out:
        cents.setdefault(r["cent_id"], {})[r["pos"]] = (r["value"], r["n_members"])
    assert len(cents) == 2
    vals = sorted(v[0][0] for v in cents.values())
    # one centroid near 0, one near 10; 10 members each
    assert abs(vals[0] - 0.01) < 0.2 and abs(vals[1] - 10.01) < 0.2
    assert all(v[0][1] == 10 for v in cents.values())
    assert {p for c in cents.values() for p in c} == set(range(4))


def test_kmeans_fit_feeds_ivf(spark):
    # two planted clusters separated by DIRECTION (ivf routes by
    # cosine, which is magnitude-blind)
    rows = [(i, [1.0, (i % 5) * 0.01] + [0.0] * 6) for i in range(20)]
    rows += [(100 + i, [(i % 5) * 0.01, 1.0] + [0.0] * 6) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ops.kmeans_fit(df, k=2, max_iter=2)
    assert set(cents.columns) == {"cent_id", "cent_vec"}
    q = df.filter(F.col("vec_id") == 100)
    out = ops.ivf_topk(df, q, k=3, nprobe=1, centroids=cents).collect()
    assert len(out) == 3
    # all neighbors come from the planted far cluster, never the near one
    assert all(r["neighbor_id"] >= 100 for r in out)


def test_compact_dataset_fixes_small_files(spark, tmp_path, sf_dir):
    """Compaction must collapse a fragmented dataset into the computed
    file budget without losing or duplicating rows."""
    import glob

    from graph_etl_spark.sources import compact_dataset, read_table

    docs = read_table(spark, sf_dir, "documents")
    frag = str(tmp_path / "fragmented")
    docs.repartition(64).write.parquet(frag)     # 64 tiny files
    assert len(glob.glob(f"{frag}/part-*")) == 64
    dst = str(tmp_path / "compacted")
    n = compact_dataset(spark, frag, dst, target_file_mb=128)
    assert n == 1                                 # tiny corpus -> one file
    assert len(glob.glob(f"{dst}/part-*")) == 1
    before = docs.count()
    after = spark.read.parquet(dst).count()
    assert after == before
    # dst==src would destroy the source mid-scan (lazy read) — refused,
    # in any path spelling
    with pytest.raises(ValueError, match="dst_path == src_path"):
        compact_dataset(spark, frag, frag)
    with pytest.raises(ValueError, match="dst_path == src_path"):
        compact_dataset(spark, frag, str(tmp_path) + "/./fragmented")


def test_partitioned_staging_prunes_at_scan(spark, tmp_path, sf_dir):
    """write_chunked(partition_by=['lang']) must yield scans where a
    lang filter becomes a PartitionFilter (directory pruning), not a
    post-scan filter — the data-skipping contract for curated-corpus
    staging at scale."""
    from graph_etl_spark.plans import formatted_plan
    from graph_etl_spark.sources import read_table, write_chunked

    docs = read_table(spark, sf_dir, "documents")
    out = str(tmp_path / "by_lang")
    write_chunked(docs, out, partition_by=["lang"])
    scan = spark.read.parquet(out).filter(F.col("lang") == "en")
    fmt = formatted_plan(scan)
    part_lines = [ln for ln in fmt.splitlines() if "PartitionFilters" in ln]
    assert part_lines and any("lang" in ln for ln in part_lines)
    assert scan.count() == docs.filter(F.col("lang") == "en").count()


def test_quality_plan_shapes(spark):
    """Plan-shape regression guards: the per-row operators must stay
    map-only (zero exchanges), packing must cost exactly its one shard
    window, and contamination must broadcast the benchmark side (never
    sort-merge the corpus)."""
    from graph_etl_spark.plans import plan_stats

    docs = spark.range(0, 100).selectExpr(
        "id as doc_id", "concat('w', id % 7, ' x y z w a b c d e') as text"
    )
    vecs = spark.range(0, 50).selectExpr(
        "id as vec_id", "array(cast(id as float), 1.0f, 2.0f) as embedding"
    )
    assert plan_stats(ops.repetition_stats(docs)).exchanges == 0
    assert plan_stats(ops.quantize_embeddings(vecs)).exchanges == 0
    assert plan_stats(ops.scrub_contact_strings(docs)).exchanges == 0
    assert plan_stats(ops.hash_sample(docs, permille=500)).exchanges == 0
    assert plan_stats(ops.pack_sequences(docs, token_budget=16)).exchanges == 1
    cont = plan_stats(ops.contamination_report(docs, docs.limit(5)))
    assert cont.broadcast_hash_joins >= 1 and cont.sort_merge_joins == 0


def test_streaming_quality_gate(spark, tmp_path):
    """The quality gate must run identically as a batch plan and as a
    Structured Streaming stage (stateless per-row exprs, no state)."""
    from graph_etl_spark.streaming import streaming_quality_gate

    rows = [
        (1, "good document with enough distinct words to pass the quality gate"),
        (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        (3, "short text"),
        (4, "mail a@b.co or c@d.io or https://x.io plus words words2 words3 "
            "words4 words5 words6 words7"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    kept_batch = {r["doc_id"] for r in streaming_quality_gate(batch).collect()}
    assert kept_batch == {1}  # 2: repetition, 3: too short, 4: contact-heavy

    src = str(tmp_path / "stream_src")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    gated = streaming_quality_gate(stream)
    assert gated.isStreaming
    out = str(tmp_path / "stream_out")
    q = (
        gated.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept_stream = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept_stream == kept_batch


def test_pagerank_no_driver_collect_in_loop(spark):
    """The dangling-mass sum must stay in the plan (broadcast 1-row
    aggregate), never round-trip through a per-iteration driver
    collect. Jobs per iteration are broadcast sub-jobs, not actions —
    asserted structurally: no .collect() in the iteration source, and
    the result still matches (graph_pagerank oracle row covers
    values)."""
    import inspect

    src = inspect.getsource(ops.pagerank)
    assert ".collect()" not in src
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")], "src string, dst string"
    )
    ranks = {r["id"]: r["pagerank"] for r in ops.pagerank(edges, max_iter=5).collect()}
    assert set(ranks) == {"a", "b", "c", "d"}
    # d is pure-dangling-fed source: lowest rank; a receives d + c
    assert ranks["d"] == min(ranks.values())
    assert abs(sum(ranks.values()) - 1.0) < 0.05


def test_kmeans_assign_shards(spark):
    rows = [(i, [1.0, (i % 5) * 0.01] + [0.0] * 6) for i in range(20)]
    rows += [(100 + i, [(i % 5) * 0.01, 1.0] + [0.0] * 6) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ops.kmeans_fit(df, k=2, max_iter=2)
    asn = ops.kmeans_assign(df, cents)
    rows_out = asn.collect()
    assert len(rows_out) == 40                     # every vector sharded once
    shards = {}
    for r in rows_out:
        shards.setdefault(r["cent_id"], set()).add(r["vec_id"])
    assert len(shards) == 2
    # each planted direction lands wholly in one shard
    sizes = sorted(len(v) for v in shards.values())
    assert sizes == [20, 20]
    assert all(r["dist"] >= 0 for r in rows_out)


def test_quantize_embeddings_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in ops.quantize_embeddings(df).collect()}
    # max|x|=1.0 → scale 127; components map to round(x*127)
    assert out[1]["scale"] == 127.0
    assert out[1]["qvec"] == [64, -127, 32, 0]
    assert out[1]["mae"] < 0.01            # reconstruction error small
    # zero vector: defined scale, all-zero codes, zero error
    assert out[2]["scale"] == 1.0
    assert out[2]["qvec"] == [0, 0, 0, 0]
    assert out[2]["mae"] == 0.0


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


def test_round6_operators_on_empty_inputs(spark):
    """Degenerate-input battery: the round-6 operators must return
    empty (correctly-typed) results on empty inputs, not throw —
    empty partitions and empty filtered subsets are routine at scale."""
    from graph_etl_spark.operators.similarity import semantic_dedup_pairs
    from graph_etl_spark.streaming import streaming_interval_join

    empty_docs = spark.createDataFrame([], "doc_id long, source string")
    assert ops.source_quota_cap(empty_docs, cap=5).count() == 0

    empty_vecs = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = semantic_dedup_pairs(empty_vecs, k=4, max_iter=1, max_cell_size=10)
    assert out.count() == 0
    assert set(out.columns) == {"id_a", "id_b", "cent_id", "cos_sim"}

    left = spark.range(3).selectExpr(
        "id as user_id", "timestamp_seconds(id*60) as ts", "id as click_id"
    )
    empty_right = spark.createDataFrame(
        [], "user_id long, ts timestamp, error_id long"
    )
    assert streaming_interval_join(left, empty_right, on="user_id").count() == 0


def test_chunk_documents_windows_and_overlap(spark):
    """Hand-checkable chunking: 10 tokens, chunk 4, overlap 2 →
    stride 2, starts 0/2/4/6/8; consecutive chunks share 2 tokens;
    the last chunk is short, not padded."""
    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    rows = (
        ops.chunk_documents(df, chunk_tokens=4, overlap=2)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    # empty / whitespace-only docs contribute no chunks
    assert all(r["doc_id"] == 1 for r in rows)
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3, 4]
    assert [r["chunk_text"] for r in rows] == [
        "t0 t1 t2 t3",
        "t2 t3 t4 t5",
        "t4 t5 t6 t7",
        "t6 t7 t8 t9",
        "t8 t9",
    ]
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 4, 2]

    # zero-shuffle plan: chunking must stay a map-only projection
    plan = (
        ops.chunk_documents(df, chunk_tokens=4, overlap=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ops.chunk_documents(df, chunk_tokens=4, overlap=4)


def test_pair_ops_drop_zero_norm_vectors(spark):
    """Zero-norm vectors make cosine 0/0 = NaN, and Spark ranks NaN
    ABOVE every numeric — so `cos_sim >= threshold` would silently PASS
    such rows in every pair path. All four must drop them instead
    (ADVICE r6): a padding/failed-encoder all-zeros embedding is a
    routine artifact at corpus scale."""
    from graph_etl_spark.operators.similarity import (
        cosine_neardup_pairs,
        lsh_bucketed_neardup_pairs,
        semantic_dedup_pairs,
    )

    dim = 8
    rows = [
        (1, [1.0] * dim),
        (2, [1.0] * dim),  # exact dup of 1 → the one real pair
        (3, [0.0] * dim),  # zero vector: must never appear in a pair
        (4, [0.0] * dim),  # second zero vector (zero-zero pair too)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = cosine_neardup_pairs(vecs, threshold=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in exact} == {(1, 2)}

    lsh = lsh_bucketed_neardup_pairs(
        vecs, threshold=0.9, n_planes=4, dim=dim, n_tables=2
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in lsh} == {(1, 2)}

    # normalize=False exercises the raw zero-norm path in BOTH the
    # exact-cell and the max_cell_size-subdivided join forms
    for cap in (None, 1):
        sem = semantic_dedup_pairs(
            vecs, k=2, max_iter=1, threshold=0.9, normalize=False, max_cell_size=cap
        ).collect()
        assert {(r["id_a"], r["id_b"]) for r in sem} == {(1, 2)}, f"cap={cap}"


def test_round7_operators_on_empty_inputs(spark):
    """Degenerate-input battery for the round-7 session operators:
    empty corpora must yield empty correctly-typed frames, not
    throw."""
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    out = ops.dup_span_scrub(empty_docs, span_tokens=4)
    assert out.count() == 0
    assert set(out.columns) == {
        "doc_id", "n_tokens", "n_removed", "n_dup_spans", "text_clean"
    }

    # empty batch, empty index, and both
    some = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert ops.incremental_dedup(some, empty_docs).count() == 0
    v = ops.incremental_dedup(empty_docs, some).collect()
    assert len(v) == 1 and v[0]["verdict"] == "kept"
    assert ops.incremental_dedup(empty_docs, empty_docs).count() == 0

    empty_src = spark.createDataFrame([], "doc_id long, source string, text string")
    assert ops.mixture_weights(empty_src).count() == 0
    assert ops.mixture_sample(empty_src).count() == 0

    assert ops.bpe_learn_merges(empty_docs, rounds=2).count() == 0

    empty_vecs = spark.createDataFrame([], "vec_id long, embedding array<float>")
    books = ops.pq_train(empty_vecs, m=4, k_codes=4, max_iter=1)
    assert books.count() == 0
    assert ops.pq_encode(empty_vecs, books).count() == 0
    assert ops.pq_adc_topk(empty_vecs, empty_vecs, books, k=3).count() == 0
