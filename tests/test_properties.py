"""Property-based invariants (hypothesis) for the normalization and
dedup/remap cores. Bounded example counts — each example runs Spark
jobs, so keep them small but adversarial (None, control chars,
duplicate keys, unicode)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from graph_etl_spark.functions import coalesce_remap, dedup_by_key
from graph_etl_spark.operators.dedup import h56

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.integers(min_value=0, max_value=5)
vals = st.one_of(st.none(), st.text(alphabet="ab\r\n\\é", max_size=4))


@given(rows=st.lists(st.tuples(keys, vals), min_size=1, max_size=12))
@SET
def test_dedup_by_key_properties(spark, rows):
    df = spark.createDataFrame(rows, "k int, v string")
    out = dedup_by_key(df, ["k"])
    got = out.collect()
    # one row per key, keys preserved
    assert len(got) == len({r[0] for r in rows})
    assert {r["k"] for r in got} == {r[0] for r in rows}
    # deterministic: running twice gives identical rows
    again = dedup_by_key(df, ["k"]).collect()
    assert sorted(map(tuple, got), key=str) == sorted(map(tuple, again), key=str)
    # survivor's value must be one of that key's input values
    by_key = {}
    for k, v in rows:
        by_key.setdefault(k, set()).add(v)
    for r in got:
        assert r["v"] in by_key[r["k"]]


@given(
    edges=st.lists(st.tuples(keys, keys), min_size=1, max_size=10),
    mapping=st.lists(st.tuples(keys, st.integers(100, 105)), min_size=0, max_size=6),
)
@SET
def test_coalesce_remap_outer_invariants(spark, edges, mapping):
    e = spark.createDataFrame(edges, "start int, end int")
    m = spark.createDataFrame(mapping, "old_value int, new_value int") if mapping else (
        spark.createDataFrame([], "old_value int, new_value int")
    )
    out = coalesce_remap(e, m, "start").collect()
    mapped = {o for o, _ in mapping}
    # row count = edge fan-out + unmatched mapping rows (full-outer law)
    fanout = sum(max(1, sum(1 for o, _ in mapping if o == s)) for s, _ in edges)
    # duplicates among unmatched mapping rows all survive (full-outer law)
    unmatched = sum(1 for o, _ in mapping if o not in {s for s, _ in edges})
    assert len(out) == fanout + unmatched
    # every matched edge start is rewritten; unmatched edges keep theirs
    for r in out:
        if r["mapped_from"] is not None and r["mapped_from"] in mapped:
            assert r["start"] in {n for o, n in mapping if o == r["mapped_from"]}
        if r["end"] is None:  # unmatched-mapping row
            assert r["start"] in {n for _, n in mapping}


@given(s=st.text(max_size=20))
@SET
def test_h56_matches_hashlib(spark, s):
    df = spark.createDataFrame([(s,)], "s string")
    got = df.select(h56(F.col("s")).alias("h")).collect()[0]["h"]
    expect = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:14], 16)
    assert got == expect


asof_ts = st.integers(min_value=0, max_value=20)
asof_key = st.integers(min_value=0, max_value=2)


@given(
    lefts=st.lists(st.tuples(asof_key, asof_ts), min_size=1, max_size=10),
    rights=st.lists(st.tuples(asof_key, asof_ts, st.integers(0, 99)), min_size=0, max_size=10),
)
@SET
def test_as_of_join_matches_pandas_merge_asof(spark, lefts, rights):
    """as_of_join must agree with pandas merge_asof (backward,
    allow_exact_matches=True) on every generated case — including
    duplicate timestamps, empty right side, keys with no right rows.
    Tie rule: at equal right_ts the LATEST right row wins; pandas
    merge_asof picks the last row among equal keys in sort order, so
    rights are pre-reduced to one row per (key, ts) on both engines to
    keep the comparison well-defined."""
    import pandas as pd

    from graph_etl_spark.operators.asof import as_of_join

    # one value per (key, ts): max val wins — dedup on both sides
    reduced: dict = {}
    for k, ts, v in rights:
        reduced[(k, ts)] = max(v, reduced.get((k, ts), -1))
    r_rows = [(k, ts, v) for (k, ts), v in sorted(reduced.items())]

    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(lefts)], "k int, ts int, lid int"
    )
    right = (
        spark.createDataFrame(r_rows, "k int, ts int, val int")
        if r_rows
        else spark.createDataFrame([], "k int, ts int, val int")
    )
    got = {
        r["lid"]: r["val_right"]
        for r in as_of_join(left, right, on="k").collect()
    }

    lp = pd.DataFrame([(k, ts, i) for i, (k, ts) in enumerate(lefts)], columns=["k", "ts", "lid"]).sort_values(["ts", "lid"])
    rp = pd.DataFrame(r_rows, columns=["k", "ts", "val"]).sort_values(["ts", "k"])
    if len(rp):
        exp_df = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
        expected = {
            int(row.lid): (None if pd.isna(row.val) else int(row.val))
            for row in exp_df.itertuples()
        }
    else:
        expected = {int(row.lid): None for row in lp.itertuples()}
    assert got == expected
