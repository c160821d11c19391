"""Capture .explain("formatted") for declared queries into plans/r17/.

Usage: python tools/capture_plans.py <suffix> query [query ...]
  suffix: "before" or "after" — writes plans/r17/<query>_<suffix>.txt

Runs on the bench session settings (sf0.1 by default) so the plan
matches what the bench times. Plans are captured WITHOUT executing
the query (AdaptiveSparkPlan isFinalPlan=false is expected).
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
    qs = entrymod.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
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
