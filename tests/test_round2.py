"""Round-2 behavior tests: pigeonhole SimHash pairs, stop-shingle cap,
keyless broadcast range join, mapped_from collision guard, sequential
J1→J2 mapping, parser arity, CC pointer-jump convergence."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

import graph_etl_spark as getl
from graph_etl_spark import operators as ops
from graph_etl_spark.catalog import get_store
from graph_etl_spark.context import Context
from graph_etl_spark.functions import coalesce_remap

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


# -- pigeonhole simhash pairs ---------------------------------------------------


def test_simhash_pairs_pigeonhole_matches_bruteforce(spark, docs):
    """The equi-join pigeonhole path must reproduce the exhaustive
    pairwise-Hamming result exactly (recall 1.0 by construction)."""
    sigs = {r["doc_id"]: r["simhash"] for r in ops.simhash(docs, bits=16).collect()}
    ids = sorted(sigs)
    expected = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 2
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in ops.simhash_pairs(docs, bits=16, max_hamming=2).collect()
    }
    assert got == expected and expected  # non-trivial on this corpus


def test_simhash_pairs_plan_has_no_theta_selfjoin(spark, docs):
    plan = (
        ops.simhash_pairs(docs, bits=16, max_hamming=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# -- stop-shingle cap -----------------------------------------------------------


def test_ngram_jaccard_stop_shingle_cap(spark):
    """A shingle shared by more docs than the cap stops generating
    candidate pairs; genuinely-duplicate docs (rare shingles) survive."""
    boiler = "alpha beta gamma"  # one 3-shingle, present in every doc
    rows = [(i, f"{boiler} filler{i} filler{i} filler{i}") for i in range(10)]
    rows += [(100, "unique rare duplicate content here"), (101, "unique rare duplicate content here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ops.ngram_jaccard_pairs(
            df, threshold=0.01, max_shingle_df=5
        ).collect()
    }
    # the identical pair survives at jaccard 1.0 (its shingles are rare)
    assert pairs.get((100, 101)) == 1.0
    # boilerplate-only overlaps are gone: no pair among docs 0..9
    assert not any(a < 100 and b < 100 for (a, b) in pairs)
    # with the cap disabled those pairs exist
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in ops.ngram_jaccard_pairs(
            df, threshold=0.01, max_shingle_df=None
        ).collect()
    }
    assert any(a < 100 and b < 100 for (a, b) in uncapped)


# -- keyless broadcast range join -----------------------------------------------


def test_range_join_keyless_broadcasts(spark):
    points = spark.createDataFrame([(i,) for i in range(100)], ["v"])
    bins = spark.createDataFrame(
        [("lo", 0, 50), ("hi", 50, 100)], ["bucket", "lo", "hi"]
    )
    joined = ops.range_join(points, bins, on=None, point="v", lower="lo", upper="hi")
    counts = {r["bucket"]: r["n"] for r in joined.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"lo": 50, "hi": 50}
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # bins broadcast, no fake key


# -- mapped_from collision guard -------------------------------------------------


def test_coalesce_remap_mapped_from_collision(spark):
    edges = spark.createDataFrame([("a", "b")], ["start", "end"])
    mapping = spark.createDataFrame([("a", "A")], ["old_value", "new_value"])
    once = coalesce_remap(edges, mapping, "start")
    with pytest.raises(ValueError, match="mapped_from"):
        coalesce_remap(once, mapping.withColumnRenamed("old_value", "x").withColumnRenamed("x", "old_value"), "end")
    both = coalesce_remap(
        once, mapping, "end", mapped_from_col="mapped_from_end"
    )
    assert "mapped_from" in both.columns and "mapped_from_end" in both.columns


# -- J1 then J2 sequential (reference pipeline.py:52-114) ------------------------


def test_j1_remap_then_j2_automap(spark, output_dir):
    """A J1-remapped endpoint whose declared prop is a natural key gets
    the J2 pk resolution applied on the remapped values, and the catalog
    decl is rewritten to Label:pk — loaders then MATCH on the pk."""
    getl.init(spark, output_folder=output_dir)

    @getl.Parser(source="seq")
    def parse_all(ctx):
        ctx.save_nodes(
            [{"id": 101, "name": "Tom"}, {"id": 102, "name": "Marie"}],
            label="Person",
        )
        ctx.save_edges(
            [{"start": 1, "end": "t-code"}, {"start": 2, "end": "m-code"}],
            edge_type="KNOWS",
            start_id="Car:id",
            end_id="Person:name",
        )
        # J1: raw codes -> person names (still natural keys, not pks)
        ctx.map_ids(
            [
                {"old_value": "t-code", "new_value": "Tom"},
                {"old_value": "m-code", "new_value": "Marie"},
            ],
            target="Person:name",
        )

    getl.parse()
    store = get_store()
    ctx = Context(store, {})
    rows = []
    for f in store._configs["edges"]["KNOWS"]:
        rows += [r.asDict() for r in ctx.read_staged("edges", f).collect()]
    ends = sorted(str(r["end"]) for r in rows if r["start"] is not None)
    assert ends == ["101", "102"]  # J1 names then J2-resolved to pks
    (info,) = store._configs["edges"]["KNOWS"].values()
    assert info["end"] == "Person:id"  # decl rewritten after the J1 remap


# -- parser arity ----------------------------------------------------------------


def test_parser_rejects_wrong_arity(spark, output_dir):
    getl.init(spark, output_folder=output_dir)
    with pytest.raises(TypeError, match="exactly 1 argument"):

        @getl.Parser(source="bad")
        def no_args():
            pass

    with pytest.raises(TypeError, match="exactly 1 argument"):

        @getl.Parser(source="bad")
        def two_args(ctx, extra):
            pass

    with pytest.raises(TypeError, match="exactly 1 argument"):

        @getl.Parser(source="bad")
        def var_args(*ctx):
            pass


# -- connected components: pointer jumping ---------------------------------------


def test_cc_pointer_jump_converges_on_long_chain(spark):
    """A 64-node path has diameter 63; plain min-label propagation needs
    ~63 rounds. Pointer jumping must converge in ≲ 2·log2(64) rounds."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["src", "dst"]
    )
    out = ops.connected_components(edges, max_iter=14)
    comps = {r["component"] for r in out.collect()}
    assert comps == {0}


def test_cc_raises_on_exhausted_iterations(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(63)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        ops.connected_components(edges, max_iter=2)


# -- winnowing fingerprints -------------------------------------------------------


def test_winnow_fingerprints_edit_robustness(spark):
    """Identical docs share the fingerprint; a doc sharing a long
    substring shares selected hashes (the winnowing guarantee), while
    the whole-document md5 differs."""
    a = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, a), (2, a), (3, "PREFIX EDIT " + a), (4, "completely different text with nothing in common zzz")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in ops.winnow_fingerprints(df).collect()}
    assert out[1]["winnow_fp"] == out[2]["winnow_fp"]  # identical docs
    assert out[1]["winnow_fp"] != out[4]["winnow_fp"]
    # the edited doc's fingerprint differs but n_selected is close and
    # > 0 — local edit, not total change
    assert out[3]["winnow_fp"] != out[1]["winnow_fp"]
    assert out[1]["n_selected"] > 0 and out[3]["n_grams"] > out[1]["n_grams"]


# -- streaming dedup with bounded state -------------------------------------------


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicates arriving across micro-batches inside the watermark
    window are dropped; state is bounded by the watermark."""
    import pandas as pd

    from graph_etl_spark.streaming import streaming_dedup

    src = str(tmp_path / "dd_src")
    ckpt = str(tmp_path / "dd_ckpt")
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows1 = pd.DataFrame(
        [(1, base), (2, base + pd.Timedelta(minutes=1)), (1, base + pd.Timedelta(minutes=2))],
        columns=["event_id", "ts"],
    )
    spark.createDataFrame(rows1).write.mode("append").parquet(src)
    results: list = []

    def run_once():
        stream = spark.readStream.schema("event_id long, ts timestamp").parquet(src)
        q = (
            streaming_dedup(stream, keys=["event_id"], watermark="1 hour")
            .writeStream.foreachBatch(
                lambda bdf, bid: results.extend(r.asDict() for r in bdf.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(r["event_id"] for r in results) == [1, 2]  # in-batch dup dropped

    # second micro-batch re-sends event 1 within the watermark → dropped
    rows2 = pd.DataFrame([(1, base + pd.Timedelta(minutes=3)), (3, base + pd.Timedelta(minutes=4))], columns=["event_id", "ts"])
    spark.createDataFrame(rows2).write.mode("append").parquet(src)
    results.clear()
    run_once()
    assert sorted(r["event_id"] for r in results) == [3]  # only the new key

    # batch-mode degradation: plain dropDuplicates
    batch = spark.createDataFrame(rows1)
    assert streaming_dedup(batch, keys=["event_id"]).count() == 2


# -- source adapters: ORC / text round trips --------------------------------------


def test_resize_image_stub_bounded_output(spark, docs):
    """Resize plumbing: Arrow-batched binary→binary with a FIXED output
    row size (w*h*3), independent of input payload size."""
    b = docs.limit(20).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    out = ops.resize_image_stub(b, target_width=8, target_height=8).collect()
    assert len(out) == 20
    for r in out:
        assert r["n_bytes_out"] == 8 * 8 * 3
        assert len(r["resized"]) == 8 * 8 * 3
    # deterministic: same input → same bytes
    again = ops.resize_image_stub(b, target_width=8, target_height=8).collect()
    assert {r["doc_id"]: bytes(r["resized"]) for r in out} == {
        r["doc_id"]: bytes(r["resized"]) for r in again
    }


def test_lsh_neardup_plan_equijoin_only(spark, embeddings=None):
    """The LSH near-dup candidate join must be an equi-join on
    (table_id, bucket) — never a cartesian/broadcast nested loop."""
    from graph_etl_spark.plans import assert_no_cartesian

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert_no_cartesian(ops.lsh_bucketed_neardup_pairs(e, threshold=0.9))


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from graph_etl_spark.sources import read_orc

    path = str(tmp_path / "orc_tbl")
    src = spark.read.parquet(f"{SF}/nation.parquet")
    src.write.mode("overwrite").orc(path)
    back = read_orc(spark, path)
    assert back.count() == src.count()
    filtered = back.filter(F.col("n_regionkey") == 0).select("n_name")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert filtered.count() > 0
    assert "n_regionkey" in plan  # predicate reaches the ORC scan


def test_text_source_line_and_wholefile(spark, tmp_path):
    from graph_etl_spark.sources import read_text

    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("solo line\n")
    lines = read_text(spark, str(d))
    assert lines.count() == 3 and lines.columns == ["value"]
    files = read_text(spark, str(d), whole_file=True)
    assert files.count() == 2
    assert any("line one\nline two" in r["value"] for r in files.collect())
