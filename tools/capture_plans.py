"""Capture .explain("formatted") for declared queries into plans/r<N>/.

Usage: python tools/capture_plans.py <suffix> query [query ...]
  suffix: "before" or "after" — writes plans/r<N>/<query>_<suffix>.txt

Env:
  SPARK_GRAFT_PLAN_ROUND   round dir number (default 18)
  SPARK_GRAFT_PLAN_UNROLL  "1" → monkeypatch DataFrame.localCheckpoint
                           (and stats_free_checkpoint) to identity so
                           ITERATIVE operators expose their loop-body
                           plan instead of a post-checkpoint
                           `Scan ExistingRDD` leaf (VERDICT r17 #3:
                           the r17 pagerank dumps showed nothing about
                           the loop the commit rewrote). Unrolled
                           captures re-execute driver-side probes
                           (counts/collects) against full lineage —
                           slower, evidence-only, never a bench path.

Runs on the bench session settings (sf0.1 by default) so the plan
matches what the bench times. Plans are captured WITHOUT executing
the final query action (AdaptiveSparkPlan isFinalPlan=false is
expected).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as entrymod
    from graph_etl_spark.session import get_spark

    spark = get_spark("graph-etl-plan-capture", extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    unroll = os.environ.get("SPARK_GRAFT_PLAN_UNROLL") == "1"
    if unroll:
        from pyspark.sql import DataFrame

        import graph_etl_spark.session as sess

        # patch the CONCRETE class of a live frame — on Spark 4 the
        # classic session's DataFrame subclass shadows a patch on the
        # pyspark.sql.DataFrame base
        cls = type(spark.range(1))
        cls.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
        DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
        sess.stats_free_checkpoint = lambda df: df
        # operators bind these by name at import time — patch them too
        import graph_etl_spark.operators.graph as gmod

        gmod.stats_free_checkpoint = lambda df: df

    qs = entrymod.queries()
    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "18")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{rnd}",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
