"""Bucketed co-located joins: same-bucketed tables must join without
an Exchange (the write-time pre-partitioning lever for 100 TB joins)."""

from __future__ import annotations

import pyspark.sql.functions as F

from graph_etl_spark.plans import plan_stats
from graph_etl_spark.sources import write_bucketed


def test_bucketed_join_no_shuffle(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucket_test")
    spark.sql("USE bucket_test")
    try:
        orders = spark.range(0, 10_000).selectExpr(
            "id as o_orderkey", "id % 500 as o_custkey", "cast(id * 1.5 as double) as price"
        )
        lines = spark.range(0, 30_000).selectExpr(
            "id % 10000 as o_orderkey", "cast(id as double) as qty"
        )
        write_bucketed(orders, "orders_b", "o_orderkey", num_buckets=8)
        write_bucketed(lines, "lines_b", "o_orderkey", num_buckets=8)

        # disable broadcast so the sort-merge path (where bucketing
        # matters) is exercised — at real scale neither side broadcasts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("orders_b").join(spark.table("lines_b"), "o_orderkey")
            st = plan_stats(joined)
            # co-located: the join itself needs NO exchange
            assert st.exchanges == 0, f"expected shuffle-free bucketed join, got {st}"
            assert joined.count() == 30_000

            # contrast: the same join over plain parquet shuffles both sides
            p1, p2 = str(tmp_path / "o"), str(tmp_path / "l")
            orders.write.parquet(p1)
            lines.write.parquet(p2)
            plain = spark.read.parquet(p1).join(spark.read.parquet(p2), "o_orderkey")
            st2 = plan_stats(plain)
            assert st2.exchanges >= 2
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucket_test CASCADE")
        spark.sql("USE default")
