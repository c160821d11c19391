"""SparkSession factory tuned for the graph-ETL workload.

Single place to encode the scale posture: AQE on (runtime join-strategy
selection + skew-join splitting for the remap joins), modest shuffle
partitioning for local runs (overridable via env for cluster runs),
Arrow enabled for the pandas-UDF extension operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "graph-etl-spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    On a real cluster the master/shuffle settings come from spark-submit;
    everything set here is safe to override externally. ``extra_confs``
    lets a caller layer session-construction-time confs (e.g. bench's
    UI hygiene) without duplicating this builder.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        # AQE: runtime coalescing of shuffle partitions, broadcast-join
        # conversion, and skew-join splitting — critical for the J1/J2
        # remap joins whose mapping side size is data-dependent.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
        # Arrow for pandas_udf / applyInPandas extension operators.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Runtime bloom-filter join pruning: for selective joins whose
        # small side is too big to broadcast (e.g. a mid-size remap
        # table against the edge corpus), the big side gets a bloom
        # filter pushed into its scan — at 100 TB this skips shuffling
        # rows that would be dropped by the join anyway.
        # (Do NOT also enable runtimeFilter.semiJoinReduction: on this
        # PySpark 4.1 build it hangs session queries outright.)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Generated-class cache: the default 100 entries thrashes under
        # this workload's many distinct codegen stages — an evicted
        # class is recompiled by janino inside whatever query touches
        # it next (measured as bimodal 1.4 s vs 17 s timings on an
        # unchanged plan; see BENCH_NOTES round 6). Static conf: only
        # effective when THIS builder creates the session.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        # Reference semantics rely on permissive casts (polars-style), not
        # ANSI error-on-overflow; Spark 4 defaults ANSI on.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet carries TIMESTAMP(NANOS); Spark has no
        # nanos timestamp — read as long and convert via ns_to_timestamp()
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
