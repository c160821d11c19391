"""Skew-handling tooling for large joins.

AQE's skew-join splitting covers sort-merge joins automatically; these
helpers cover the cases AQE can't: aggregations over skewed keys
(two-phase salted aggregation) and explicit salting when one side of a
join must be replicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over
    ``salt_buckets`` partitions: left rows get a random-ish salt
    (deterministic: hash of the full row), the right side is replicated
    ``salt_buckets`` times. Use when the LEFT side has hot keys and the
    right side is small enough to replicate (but too big / ineligible
    to broadcast).

    Cost model: right side ×salt_buckets vs eliminating the straggler
    task holding the hot key — worth it when key frequency skew is
    ≫ salt_buckets.
    """
    lsalt = left.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)),
    )
    rsalt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return lsalt.join(rsalt, [on, "__salt"], how).drop("__salt")


def salted_count(
    df: DataFrame, key: str, salt_buckets: int = 32
) -> DataFrame:
    """Two-phase count per key for heavily skewed keys: partial count
    per (key, salt), then final sum per key. Identical result to a
    plain groupBy-count; the first shuffle spreads a hot key over
    ``salt_buckets`` reducers instead of one straggler.

    (Plain count/sum/min/max already partial-aggregate map-side, so
    this matters when upstream partitioning concentrates a hot key —
    e.g. right after an explode of a few huge documents.)
    """
    return (
        df.withColumn("__salt", F.pmod(F.hash(F.rand(seed=42)), F.lit(salt_buckets)))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").cast("long").alias("cnt"))
    )


def key_skew_report(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnose skew: top-N keys by frequency with their share of all
    rows — the 'should I salt this join?' report."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("t")).collect()[0]["t"] or 1
    return (
        counts.orderBy(F.col("cnt").desc(), F.col(key))
        .limit(top)
        .withColumn("share", F.round(F.col("cnt") / F.lit(float(total)), 6))
    )
