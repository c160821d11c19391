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


def test_compaction_plan_all_columns_partitioned(spark):
    """ADVICE r14: every dataframe column listed in partition_cols is
    legal — est_bytes degrades to 0 (row count still drives tiny/ok),
    not an IndexError."""
    d = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1)], "p string, q int"
    )
    rows = {
        (r["p"], r["q"]): r
        for r in ops.compaction_plan(d, ["p", "q"], target_bytes=100).collect()
    }
    assert len(rows) == 3
    assert all(r["est_bytes"] == 0 for r in rows.values())
    assert all(r["action"] == "tiny" for r in rows.values())


def test_compaction_plan_null_array_counts_zero(spark):
    """ADVICE r14: size(NULL array) is -1 on non-ANSI sessions and the
    old coalesce never fired; null arrays must contribute 0 bytes on
    ANSI and non-ANSI sessions alike."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    d = spark.createDataFrame(
        [("a", [1, 2, 3]), ("a", None), ("a", [4])],
        "p string, arr array<int>",
    )
    try:
        for ansi in ("true", "false"):
            spark.conf.set("spark.sql.ansi.enabled", ansi)
            row = ops.compaction_plan(d, ["p"], target_bytes=10**6).collect()[0]
            # 4 non-null elements x 8B
            assert row["est_bytes"] == 32, (ansi, row["est_bytes"])
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_power_analysis_ts_col_knob(spark):
    """ADVICE r14: the timestamp column is a parameter like its
    siblings' — renamed inputs produce the identical feasibility
    table."""
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    base = sorted(map(tuple, ops.ab_power_analysis(e).collect()))
    renamed = sorted(
        map(
            tuple,
            ops.ab_power_analysis(
                e.withColumnRenamed("ts", "event_time"), ts_col="event_time"
            ).collect(),
        )
    )
    assert base == renamed and len(base) == 4


def test_minhash_recall_curve_empty_bands_raises(spark):
    """ADVICE r14: an empty band_options tuple raises instead of
    returning None (which broke DataFrame chaining)."""
    d = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="band_options"):
        ops.minhash_recall_curve(d, band_options=())


def test_compact_cdc_keep_versions_zero_raises(spark, tmp_path):
    """ADVICE r14: keep_versions=0 silently kept ALL versions
    (versions[:-0] is empty); it now refuses up front."""
    from graph_etl_spark.streaming import compact_cdc_index

    with pytest.raises(ValueError, match="keep_versions"):
        compact_cdc_index(spark, str(tmp_path / "c"), keep_versions=0)


class _RecordingLister:
    """Mock lister: wraps the local one and records every call —
    proves CDC maintenance routes ALL its FS traffic through the
    injected lister (VERDICT r14 #4)."""

    def __init__(self):
        from graph_etl_spark.streaming import LocalFsLister

        self.inner = LocalFsLister()
        self.calls: list[tuple[str, str]] = []

    def __getattr__(self, name):
        inner_fn = getattr(self.inner, name)

        def wrapped(path, *a, **kw):
            self.calls.append((name, path))
            return inner_fn(path, *a, **kw)

        return wrapped


def test_cdc_maintenance_routes_through_injected_lister(spark, tmp_path):
    """compact + prune + the sink's tail listing all go through the
    injected lister, and behavior matches the default local path."""
    from graph_etl_spark.streaming import (
        cdc_ingest_sink,
        compact_cdc_index,
        prune_cdc_raw,
    )

    chunk_dir = str(tmp_path / "chunks")
    rec = _RecordingLister()
    sink = cdc_ingest_sink(chunk_dir, lister=rec)
    texts = [" ".join(f"t{b}_{j}" for j in range(30)) for b in range(3)]
    for b in range(3):
        sink(
            spark.createDataFrame([(b, texts[b])], "doc_id long, text string"),
            b,
        )
    r = compact_cdc_index(spark, chunk_dir, up_to_batch=1, lister=rec)
    assert r["wrote"] and r["high_water"] == 1
    assert prune_cdc_raw(chunk_dir, lister=rec) == [0, 1]
    ops_seen = {c[0] for c in rec.calls}
    assert {"list", "is_file", "read_text", "write_text", "remove_dir"} <= ops_seen
    # replayed doc against the compact index still flags
    sink(
        spark.createDataFrame([(9, texts[0])], "doc_id long, text string"), 3
    )
    got = (
        spark.read.parquet(chunk_dir)
        .filter(F.col("doc_id") == 9)
        .collect()
    )
    assert got and all(r2["shared_with_index"] for r2 in got)


def test_hadoop_fs_lister_matches_local(tmp_path, spark):
    """The Hadoop FileSystem lister (the object-store production swap)
    agrees with the local lister on every operation, exercised through
    the local Hadoop FS."""
    from graph_etl_spark.streaming import HadoopFsLister, LocalFsLister

    h, loc = HadoopFsLister(spark), LocalFsLister()
    d = tmp_path / "hfs"
    (d / "sub").mkdir(parents=True)
    (d / "f.json").write_text('{"k": 1}')
    p = str(d)
    assert sorted(h.list(p)) == sorted(loc.list(p)) == ["f.json", "sub"]
    assert h.is_dir(p) and h.is_dir(str(d / "sub"))
    assert h.is_file(str(d / "f.json")) and not h.is_file(str(d / "sub"))
    assert h.read_text(str(d / "f.json")) == '{"k": 1}'
    h.write_text(str(d / "g.txt"), "hello")
    assert loc.read_text(str(d / "g.txt")) == "hello"
    h.remove_dir(str(d / "sub"))
    assert not loc.is_dir(str(d / "sub"))
    assert h.list(str(d / "missing")) == []


def test_records_gate_catches_truncation(tmp_path):
    """VERDICT r14 #5: the preflight records gate passes on an intact
    generated record, fails when the working copy shrinks or stops
    parsing, and tolerates a brand-new (uncommitted) record."""
    import json
    import subprocess

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from preflight import run_records_gate

    repo = str(tmp_path)
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    subprocess.run(["git", "-c", "user.email=t@t", "-c", "user.name=t",
                    "commit", "-q", "--allow-empty", "-m", "root"],
                   cwd=repo, check=True)
    rec = tmp_path / "R.json"
    guarded = {"R.json": [("queries",)]}
    rec.write_text(json.dumps({"queries": {"a": 1, "b": 2}}))
    # new record, nothing at HEAD: parses -> ok
    assert run_records_gate(repo, guarded)["ok"]
    subprocess.run(["git", "add", "R.json"], cwd=repo, check=True)
    subprocess.run(["git", "-c", "user.email=t@t", "-c", "user.name=t",
                    "commit", "-q", "-m", "rec"], cwd=repo, check=True)
    # unchanged and grown records pass
    assert run_records_gate(repo, guarded)["ok"]
    rec.write_text(json.dumps({"queries": {"a": 1, "b": 2, "c": 3}}))
    assert run_records_gate(repo, guarded)["ok"]
    # truncated record fails with the shrink spelled out
    rec.write_text(json.dumps({"queries": {"a": 1}}))
    out = run_records_gate(repo, guarded)
    assert not out["ok"] and "shrank 2 -> 1" in out["R.json"]["error"]
    # unparseable record fails
    rec.write_text("{not json")
    assert not run_records_gate(repo, guarded)["ok"]


def test_semdedup_keeps_one_per_group(spark):
    """SemDeDup end-to-end: scaled copies (cosine exactly 1.0 after L2
    normalization) collapse into one group per source; exactly one
    member keeps (the min id); singletons keep; keep-count equals
    cluster-count (mass conservation of representatives)."""
    import random

    rng = random.Random(7)
    rows = []
    # 6 base directions, each with 2 scaled copies -> groups of 3
    for g in range(6):
        base = [rng.gauss(0, 1) for _ in range(8)]
        for c, scale in enumerate((1.0, 2.0, 4.0)):
            rows.append((g * 10 + c, [x * scale for x in base]))
    # 4 singletons far from everything
    for s in range(4):
        v = [0.0] * 8
        v[s] = 1.0
        rows.append((100 + s, v))
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in ops.semantic_dedup_survivors(
            d, k=4, max_iter=2, threshold=0.999
        ).collect()
    }
    assert len(out) == 22
    for g in range(6):
        ids = [g * 10 + c for c in range(3)]
        cl = {out[i]["cluster_id"] for i in ids}
        assert cl == {g * 10}, (g, cl)  # min id of the group
        assert [out[i]["keep"] for i in ids] == [True, False, False]
        assert all(out[i]["cluster_size"] == 3 for i in ids)
    for s in range(4):
        r = out[100 + s]
        assert r["keep"] and r["cluster_size"] == 1 and r["cluster_id"] == 100 + s
    n_clusters = len({r["cluster_id"] for r in out.values()})
    assert sum(r["keep"] for r in out.values()) == n_clusters == 10


def test_embedding_contamination_flags_planted_copy(spark):
    """A scaled copy of an eval vector in the train corpus yields max
    cosine 1.0 and the contaminated flag; an orthogonal eval vector
    reports its true (low) max; ties break to the largest train id."""
    ev = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    train = spark.createDataFrame(
        [
            (10, [2.0, 0.0, 0.0, 0.0]),   # scaled copy of eval 1
            (11, [0.5, 0.0, 0.0, 0.0]),   # another copy — tie at cos 1.0
            (12, [1.0, 1.0, 0.0, 0.0]),
            (13, [0.0, 1.0, 1.0, 0.0]),   # orthogonal to eval 2
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["query_id"]: r
        for r in ops.embedding_contamination(train, ev, threshold=0.95).collect()
    }
    assert out[1]["max_cos_sim"] == 1.0 and out[1]["contaminated"]
    assert out[1]["nearest_train_id"] == 11  # largest id at the tie
    assert out[2]["max_cos_sim"] < 0.95 and not out[2]["contaminated"]


def test_embedding_contamination_no_corpus_window(spark):
    """Scale posture (tightened r16, code-review r15): the per-eval
    max is ONE JVM hash aggregation over the packed (cos, id) decimal
    — map-side combining, no window/top-k over the streamed corpus, no
    SortAggregate sort of the scored stream, and no Arrow round-trip
    of the n_train x n_eval scored rows through Python."""
    from graph_etl_spark.plans import plan_string

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = ops.embedding_contamination(
        e.filter(F.col("vec_id") >= 20), e.filter(F.col("vec_id") < 5)
    )
    p = plan_string(df)
    assert "Window" not in p
    assert "HashAggregate" in p
    assert "SortAggregate" not in p
    for py in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert py not in p, py


def test_image_phash_pairs_groups_and_stubs(spark):
    """Brightness variants of one base pair up at hamming 0; different
    bases don't pair (distance ~32 bits >> 6); stub payloads are
    excluded rather than colliding in the zero bucket."""
    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pngs = ops.synth_png_variant_column(ids, group_size=4)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ops.image_phash_pairs(pngs, max_hamming=6).collect()
    }
    expect = {
        (a, b)
        for g in (0, 1)
        for a in range(g * 4, g * 4 + 4)
        for b in range(a + 1, g * 4 + 4)
    }
    assert set(got) == expect
    assert all(h == 0 for h in got.values())

    junk = spark.createDataFrame(
        [(1, bytearray(b"nope")), (2, bytearray(b"also nope"))],
        "doc_id long, payload binary",
    )
    assert ops.image_phash_pairs(junk).count() == 0


def test_domain_reweight_upweights_hard_domains(spark):
    """Two domains, one full of repetitive easy text, one of diverse
    hard text: weights sum to ~1; the hard domain's weight exceeds its
    natural share at T=1; at very high temperature the weights recover
    the natural shares."""
    rows = []
    for i in range(30):
        rows.append((i, "easy", "the the the cat sat mat " * 4))
    for i in range(30, 40):
        rows.append((i, "hard", f"zq{i} wf{i * 7} xr{i * 13} vb{i * 29} " * 3))
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    train = ops.hash_sample(d, permille=500, salt="lm")
    out = {r["source"]: r for r in ops.domain_reweight(d, train_df=train).collect()}
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-5
    assert out["hard"]["excess"] > 0 > out["easy"]["excess"]
    assert out["hard"]["weight"] > 10 / 40  # above natural share
    flat = {
        r["source"]: r
        for r in ops.domain_reweight(d, temperature=1e9, train_df=train).collect()
    }
    assert abs(flat["hard"]["weight"] - 0.25) < 1e-5
    assert abs(flat["easy"]["weight"] - 0.75) < 1e-5


def test_cluster_split_keeps_near_dups_together(spark):
    """Leakage-free split: exact copies share a cluster and therefore
    a split label; every document is labeled; on a duplicate-free
    corpus the assignment equals dataset_split's per-doc formula."""
    base = [" ".join(f"w{i}_{j}" for j in range(20)) for i in range(30)]
    rows = [(i, base[i]) for i in range(30)]
    rows += [(100 + i, base[i]) for i in range(10)]  # exact near-dups
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ops.cluster_split(d).collect()}
    assert len(out) == 40
    for i in range(10):
        assert out[100 + i]["cluster_id"] == out[i]["cluster_id"] == i
        assert out[100 + i]["split"] == out[i]["split"]

    uniq = spark.createDataFrame(
        [(i, " ".join(f"u{i}_{j}" for j in range(20))) for i in range(40)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["split"] for r in ops.cluster_split(uniq).collect()}
    want = {
        r["doc_id"]: r["split"] for r in ops.dataset_split(uniq).collect()
    }
    assert got == want

    with pytest.raises(ValueError, match="sum to 1000"):
        ops.cluster_split(uniq, ratios_permille={"train": 500})


def test_audio_fingerprint_polarity_invariant(spark):
    """The planted phase-inverted duplicate of every base clip shares
    its fingerprint EXACTLY (energy is sign-blind — provable, not
    statistical); distinct bases mostly separate; a short clip with a
    single window packs fingerprint 0 with n_windows 1."""
    ids = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    wavs = ops.synth_wav_polarity_column(ids, group_size=2)
    fp = {
        r["doc_id"]: (r["n_windows"], r["fingerprint"])
        for r in ops.audio_fingerprint(wavs, window_samples=8).collect()
    }
    assert len(fp) == 40
    for b in range(20):
        assert fp[2 * b] == fp[2 * b + 1], b
    assert len(set(fp.values())) >= 15  # bases separate

    # raw payload check: variants really are sample-negated, not equal
    pays = {r["doc_id"]: bytes(r["payload"]) for r in wavs.collect()}
    assert pays[0] != pays[1]

    # single-window clip: 8-sample WAV -> n_windows 1, fingerprint 0
    from graph_etl_spark.operators.multimodal import encode_wav

    tiny = spark.createDataFrame(
        [(7, bytearray(encode_wav(16000, list(range(8)))))],
        "doc_id long, payload binary",
    )
    row = ops.audio_fingerprint(tiny, window_samples=8).collect()[0]
    assert row["n_windows"] == 1 and row["fingerprint"] == 0


def test_contamination_zero_norm_eval_keeps_its_row(spark):
    """Code-review r15: an eval vector with NO scoreable pair (all-zero
    embedding -> NaN cosine everywhere) still emits its audit row with
    NULL max/nearest and contaminated=false — the output never shrinks
    below the eval set."""
    ev = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    train = spark.createDataFrame(
        [(10, [2.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = {
        r["query_id"]: r
        for r in ops.embedding_contamination(train, ev, threshold=0.9).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["contaminated"] and out[1]["max_cos_sim"] == 1.0
    z = out[2]
    assert z["max_cos_sim"] is None and z["nearest_train_id"] is None
    assert z["contaminated"] is False
    # empty train corpus: every eval row survives, none contaminated
    empty = train.filter("vec_id < 0")
    rows = ops.embedding_contamination(empty, ev).collect()
    assert len(rows) == 2 and not any(r["contaminated"] for r in rows)


def test_cdc_lister_scheme_routing(spark):
    """Code-review r15 (tightened r16): cdc_fs_lister routes EVERY
    scheme-qualified path — including file: URIs, which os.path.isdir
    cannot see — through the Hadoop FS when spark is given; bare paths
    stay on os; an explicit lister always wins; and a scheme-qualified
    path with neither spark nor lister RAISES instead of silently
    listing empty (the prune-nothing failure mode)."""
    import inspect

    import pytest

    from graph_etl_spark.streaming import (
        HadoopFsLister,
        LocalFsLister,
        cdc_fs_lister,
        prune_cdc_raw,
    )

    assert isinstance(cdc_fs_lister("/tmp/x", spark), LocalFsLister)
    assert isinstance(cdc_fs_lister("/tmp/x"), LocalFsLister)
    assert isinstance(cdc_fs_lister("file:/tmp/x", spark), HadoopFsLister)
    assert isinstance(cdc_fs_lister("file:///tmp/x", spark), HadoopFsLister)
    assert isinstance(cdc_fs_lister("s3a://b/chunks", spark), HadoopFsLister)
    marker = object()
    assert cdc_fs_lister("s3a://b/chunks", spark, marker) is marker
    assert cdc_fs_lister("file:/tmp/x", None, marker) is marker
    for bad in ("s3a://b/chunks", "file:/tmp/x"):
        with pytest.raises(ValueError, match="scheme-qualified"):
            cdc_fs_lister(bad)
    assert "spark" in inspect.signature(prune_cdc_raw).parameters
