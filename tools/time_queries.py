"""Isolated per-query timing with the noop sink (guide §1.4).

Usage: python tools/time_queries.py query [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_TIME_RUNS (default 3).

Prints per-query min/all samples plus the Spark job count per run
(jobs = actions; iterative operators' per-round materializations show
up here even though the final plan is one checkpoint scan).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobid(spark) -> int:
    v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    try:
        return int(v.get())
    except AttributeError:
        return int(v)


def main() -> None:
    names = sys.argv[1:]
    import __spark_entry__ as entrymod
    from graph_etl_spark.session import get_spark

    spark = get_spark("graph-etl-time", extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # warm-up (same as bench)
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(50)
        .select(F.md5(F.array_join(F.filter(F.split("text", " "), lambda t: t != ""), " ")))
        .write.format("noop").mode("overwrite").save()
    )
    runs = int(os.environ.get("SPARK_GRAFT_TIME_RUNS", "3"))
    tracker = spark.sparkContext.statusTracker()
    for name in names:
        samples = []
        jobs = []
        for _ in range(runs):
            n0 = _jobid(spark)
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            n1 = _jobid(spark)
            jobs.append(n1 - n0)
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            spark.catalog.clearCache()
        print(
            f"{name}: min {min(samples):.2f}s  samples "
            f"[{', '.join(f'{s:.2f}' for s in samples)}]  jobs/run {jobs}"
        )


if __name__ == "__main__":
    main()
