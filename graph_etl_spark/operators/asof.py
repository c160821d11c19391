"""Temporal joins Spark lacks natively: as-of join and range join.

as_of_join: for each left row, the latest right row with
right.ts <= left.ts (per key) — the TimescaleDB/kdb 'asof' semantics,
composed from a union + window (one shuffle on the key, no theta
join): tag both sides, sort within key by (ts, side), and carry the
last-seen right row forward with ``last(..., ignorenulls)``.

range_join: equi-key + interval containment, expressed so Catalyst
can use its optimized range-join strategy (equi part shuffles, range
part filters post-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right_ts <= left_ts, matching on ``on``. Null right columns when
    no prior right row exists.

    Implementation: union both sides with a side tag, one window
    sorted by (ts, side) per key, forward-fill the right payload, keep
    left rows. Exactly one shuffle (on ``on``) regardless of data
    size; no O(n·m) theta join.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    l_tag = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r_payload = F.struct(*[F.col(c) for c in right_cols])
    r_tag = (
        right.select(
            on,
            F.col(right_ts).alias("__ts"),
            r_payload.alias("__payload"),
        )
        .withColumn("__side", F.lit(0))
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at equal ts → <= semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__last_payload", F.last("__payload", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1)
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__last_payload")[c])
    return out.drop("__side", "__ts", "__payload", "__last_payload")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    point: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Rows where left.point ∈ [right.lower, right.upper) with equal
    ``on`` keys. The equi-key keeps this a hash/sort-merge join; the
    interval predicate is applied as a join condition so AQE can still
    pick broadcast for a small right side."""
    l, r = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"l.{point}") >= F.col(f"r.{lower}"))
        & (F.col(f"l.{point}") < F.col(f"r.{upper}"))
    )
    return l.join(r, cond, how).drop(F.col(f"r.{on}"))
