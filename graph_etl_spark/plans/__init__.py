"""Plan introspection utilities — the engine's scale-review tooling.

Used in tests and during development to assert that a query compiles
to the physical plan we want (broadcasts where intended, no cartesian
products, pushed-down scans) rather than eyeballing `.explain` output.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanStats:
    broadcast_hash_joins: int
    sort_merge_joins: int
    shuffled_hash_joins: int
    nested_loop_joins: int
    exchanges: int
    pushed_filters: list[str]
    read_schemas: list[str]

    @property
    def joins(self) -> int:
        return (
            self.broadcast_hash_joins
            + self.sort_merge_joins
            + self.shuffled_hash_joins
            + self.nested_loop_joins
        )


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(df: DataFrame) -> PlanStats:
    """Physical-plan shape summary for a DataFrame."""
    p = plan_string(df)
    fmt = formatted_plan(df)
    pushed = [
        line.strip()
        for line in fmt.splitlines()
        if "PushedFilters" in line and "PushedFilters: []" not in line
    ]
    schemas = [line.strip() for line in fmt.splitlines() if "ReadSchema" in line]
    return PlanStats(
        broadcast_hash_joins=p.count("BroadcastHashJoin"),
        sort_merge_joins=p.count("SortMergeJoin"),
        shuffled_hash_joins=p.count("ShuffledHashJoin"),
        nested_loop_joins=p.count("BroadcastNestedLoopJoin") + p.count("CartesianProduct"),
        exchanges=p.count("Exchange"),
        pushed_filters=pushed,
        read_schemas=schemas,
    )


def assert_no_cartesian(df: DataFrame, allow_broadcast_nested_loop: bool = False) -> None:
    """Raise if the plan contains an unbounded cartesian product.
    Broadcast-nested-loop against a deliberately tiny side (e.g. the
    query set of a top-k search) can be allowed explicitly."""
    p = plan_string(df)
    if "CartesianProduct" in p:
        raise AssertionError("plan contains CartesianProduct:\n" + p)
    if not allow_broadcast_nested_loop and "BroadcastNestedLoopJoin" in p:
        raise AssertionError("plan contains BroadcastNestedLoopJoin:\n" + p)
