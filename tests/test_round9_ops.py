"""Round-9 additions: advice-finding regression tests (expectations
NULL uniqueness, string-id random walks, negative-timestamp OHLC
buckets, late-data threshold alerts) and the two-phase
quantile_normalize equivalence check."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_check_expectations_unique_counts_null_duplicates(spark):
    """'NULLs count as one value': the second and third NULL rows are
    uniqueness violations, exactly like duplicate non-null values."""
    from graph_etl_spark.operators import check_expectations

    df = spark.createDataFrame(
        [(1,), (2,), (2,), (None,), (None,), (None,)], "id long"
    )
    out = {r["kind"]: r for r in check_expectations(
        df, [{"col": "id", "kind": "unique"}]
    ).collect()}
    # one duplicate of 2, two duplicates of NULL
    assert out["unique"]["n_violations"] == 3
    assert not out["unique"]["passed"]

    all_null = spark.createDataFrame([(None,)], "id long")
    solo = check_expectations(all_null, [{"col": "id", "kind": "unique"}]).collect()
    assert solo[0]["n_violations"] == 0 and solo[0]["passed"]


def test_random_walks_string_ids(spark):
    """String vertex ids must not silently NULL the walk_id (integer
    arithmetic on a string casts to NULL and merges every walk into
    one window partition): the string-key branch keeps walks unique
    and deterministic."""
    from graph_etl_spark.operators import random_walks

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], "src string, dst string"
    )
    out = random_walks(edges, walk_length=3, walks_per_node=2).collect()
    walk_ids = {r["walk_id"] for r in out}
    assert None not in walk_ids
    # 4 vertices x 2 walks, each with steps 0..3
    assert len(walk_ids) == 8
    assert len(out) == 8 * 4
    by_walk_step = {(r["walk_id"], r["step"]) for r in out}
    assert len(by_walk_step) == len(out)  # unique (walk, step)
    # every step moves along a real (symmetrized) edge
    adj = {("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")}
    adj |= {(b, a) for a, b in adj}
    pos = {}
    for r in out:
        pos.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    for steps in pos.values():
        for s in range(1, 4):
            assert (steps[s - 1], steps[s]) in adj
    # deterministic across runs
    again = {(r["walk_id"], r["step"], r["node"])
             for r in random_walks(edges, walk_length=3, walks_per_node=2).collect()}
    assert again == {(r["walk_id"], r["step"], r["node"]) for r in out}


def test_random_walks_integer_ids_keep_arithmetic_walk_id(spark):
    from graph_etl_spark.operators import random_walks

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = random_walks(edges, walk_length=1, walks_per_node=2).collect()
    # walk_id = node * 2 + w for nodes {1,2,3}, w in {0,1}
    assert {r["walk_id"] for r in out} == {2, 3, 4, 5, 6, 7}


def test_resample_ohlc_negative_ts_floor_bucket(spark):
    """Pre-1970 timestamps must floor to the bucket BELOW zero, not
    truncate toward it: ts=-100s with 1h buckets belongs to
    bucket_start=-3600, and ts=-3600 exactly to -3600."""
    from graph_etl_spark.operators import resample_ohlc

    df = spark.createDataFrame(
        [("k", -100, 1, 5.0), ("k", -3600, 2, 7.0), ("k", 100, 3, 9.0)],
        "key string, ts long, event_id long, value double",
    )
    out = {r["bucket_start"]: r for r in resample_ohlc(
        df, "key", "ts", "value", "event_id", bucket_seconds=3600
    ).collect()}
    assert set(out) == {-3600, 0}
    assert out[-3600]["n_rows"] == 2
    assert out[-3600]["high"] == 7.0 and out[-3600]["low"] == 5.0
    assert out[0]["open"] == 9.0 and out[0]["close"] == 9.0


def test_quantile_normalize_matches_global_window_reference(spark):
    """The two-phase bucketed rank must be bit-identical to the
    single-window formulation it replaced — including ties on the
    value (broken by the tiebreak) and a value equal to a bucket
    boundary."""
    from graph_etl_spark.operators import quantile_normalize

    rows = [(i, float(v)) for i, v in enumerate(
        [5, 3, 3, 8, 1, 9, 3, 5, 2, 7, 7, 7, 0, 4, 6] * 10
    )]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r["id"]: r["quantile"]
           for r in quantile_normalize(df, "v", "id", num_partitions=4).collect()}
    w = Window.orderBy(F.col("v"), F.col("id"))
    ref = {r["id"]: r["q"] for r in df.withColumn(
        "q",
        F.round(
            (F.row_number().over(w) - F.lit(1)).cast("double")
            / F.greatest(
                F.count(F.lit(1)).over(Window.partitionBy()) - 1, F.lit(1)
            ),
            6,
        ),
    ).select("id", F.col("q")).collect()}
    assert got == ref


def test_quantile_normalize_null_values_rank_first(spark):
    from graph_etl_spark.operators import quantile_normalize

    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, 1.0)], "id long, v double"
    )
    got = {r["id"]: r["quantile"]
           for r in quantile_normalize(df, "v", "id", num_partitions=2).collect()}
    # Spark windows sort NULLS FIRST on ASC: null ranks 1 -> 0.0
    assert got == {1: 0.0, 3: 0.5, 2: 1.0}


def test_quantile_normalize_single_row(spark):
    from graph_etl_spark.operators import quantile_normalize

    df = spark.createDataFrame([(1, 3.0)], "id long, v double")
    assert quantile_normalize(df, "v", "id").collect()[0]["quantile"] == 0.0


def test_streaming_threshold_alerts_late_data_across_batches(spark, tmp_path):
    """Out-of-order arrival across micro-batches: the alert timestamp
    must be the threshold-th SMALLEST timestamp seen so far (what the
    batch twin computes), not the arrival-order threshold-th."""
    import pandas as pd

    from graph_etl_spark.streaming import (
        streaming_threshold_alerts,
        threshold_crossings,
    )

    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    base = pd.Timestamp("2024-01-01 10:00:00")

    def write_batch(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
        spark.createDataFrame(pdf).write.mode("append").parquet(src)

    results: list = []

    def run_once():
        stream = spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts timestamp"
        ).parquet(src)
        q = (
            streaming_threshold_alerts(stream, threshold=3)
            .writeStream.foreachBatch(
                lambda bdf, bid: results.extend(r.asDict() for r in bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: events at 10:00 and 10:04 (below threshold)
    write_batch([
        (1, 7, "click", base),
        (2, 7, "click", base + pd.Timedelta(minutes=4)),
    ])
    run_once()
    assert results == []

    # batch 2: a LATE event at 10:01 plus one at 10:05 -> crossing.
    # Smallest three of {10:00, 10:01, 10:04, 10:05} -> third is
    # 10:04 — arrival order would have claimed 10:01.
    write_batch([
        (3, 7, "click", base + pd.Timedelta(minutes=1)),
        (4, 7, "click", base + pd.Timedelta(minutes=5)),
    ])
    results.clear()
    run_once()
    assert len(results) == 1
    assert results[0]["crossed_at"] == (base + pd.Timedelta(minutes=4)).timestamp()

    # the batch twin agrees (it orders globally by ts, event_id)
    twin = {
        (r["user_id"], r["event_type"]): r["crossed_at"]
        for r in threshold_crossings(
            spark.read.parquet(src), threshold=3
        ).collect()
    }
    assert twin[(7, "click")] == results[0]["crossed_at"]


def test_zorder_layout_prunes_row_groups_on_read(spark, tmp_path):
    """The I/O win Z-ordering exists for, measured end-to-end: write
    the SAME rows in a natural layout and a Z-ordered layout
    (repartitionByRange(zkey) + local sort), read both back with a
    2-D range predicate, and assert the Z-ordered scan actually READ
    fewer rows (parquet row-group pruning from the executed plan's
    scan metric) and needs fewer FILES opened (footer min/max
    disjoint from the predicate box) — while returning the identical
    result set (VERDICT r8 #6)."""
    import glob

    import pyarrow.parquet as pq

    import os

    from graph_etl_spark.operators import zorder_key

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    natural = str(tmp_path / "natural")
    li.repartition(8).write.parquet(natural)
    zsorted = str(tmp_path / "zsorted")
    (
        zorder_key(li, ["l_extendedprice", "l_quantity"], bits=8)
        .repartitionByRange(8, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.parquet(zsorted)
    )
    box = [("l_extendedprice", 1000, 5000), ("l_quantity", 1, 10)]
    pred = (F.col("l_extendedprice").between(1000, 5000)) & (
        F.col("l_quantity").between(1, 10)
    )

    def scan_rows(path):
        """Rows the parquet reader actually produced (post row-group
        pruning), from the executed scan's numOutputRows metric."""
        df = spark.read.parquet(path).filter(pred)
        res = df.collect()
        leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
        tot = 0
        for i in range(leaves.size()):
            m = leaves.apply(i).metrics()
            if m.contains("numOutputRows"):
                tot += m.apply("numOutputRows").value()
        return tot, {tuple(r) for r in res}

    def files_needed(path):
        """Files a footer-pruning reader must open: row-group min/max
        intersects the predicate box on every dimension."""
        n_open = n_total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            n_total += 1
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            hit = True
            for col, lo, hi in box:
                mn = min(md.row_group(g).column(idx[col]).statistics.min
                         for g in range(md.num_row_groups))
                mx = max(md.row_group(g).column(idx[col]).statistics.max
                         for g in range(md.num_row_groups))
                if mx < lo or mn > hi:
                    hit = False
            n_open += hit
        return n_open, n_total

    nat_rows, nat_res = scan_rows(natural)
    z_rows, z_res = scan_rows(zsorted)
    assert z_res == nat_res          # identical answers...
    assert z_rows < nat_rows / 2     # ...from less than half the I/O
    nat_open, nat_files = files_needed(natural)
    z_open, z_files = files_needed(zsorted)
    assert nat_files == z_files == 8
    assert z_open < nat_open         # whole files become skippable
