"""Loop-BODY plan capture for the iterative graph operators.

VERDICT r17 #3: the final plan of an iterative operator is a
post-checkpoint `Scan ExistingRDD` leaf that proves nothing about the
loop the optimization changed. This tool captures the plan of ONE
round's body instead: it monkeypatches `DataFrame.localCheckpoint`
(and `stats_free_checkpoint`) to identity and runs each operator with
`max_iter=1` on the SAME graph the declared query uses, so the
explained plan is exactly one round of the loop — joins, aggregates
and exchanges visible, no exponential unrolling.

Usage: python tools/capture_loop_plans.py <suffix>
  writes plans/r<N>/<name>_loopbody_<suffix>.txt
Env: SPARK_GRAFT_PLAN_ROUND (default 18), SPARK_GRAFT_SF_DIR.
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
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    import graph_etl_spark.operators as ops
    import graph_etl_spark.operators.graph as gmod
    import graph_etl_spark.session as sess
    from graph_etl_spark.session import get_spark

    spark = get_spark(
        "graph-etl-loop-plan-capture", extra_confs={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    # identity checkpoints: the loop body stays IN the plan. Patch the
    # CONCRETE class of a live frame — on Spark 4 the classic session
    # returns pyspark.sql.classic.dataframe.DataFrame, whose own
    # method shadows a patch on the pyspark.sql.DataFrame base.
    cls = type(spark.range(1))
    cls.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
    DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
    sess.stats_free_checkpoint = lambda df: df
    gmod.stats_free_checkpoint = lambda df: df

    import __spark_entry__ as entrymod

    def nation_graph():
        return entrymod._nation_graph(spark, SF_DIR)

    def copurchase():
        return entrymod._copurchase_1995(spark, SF_DIR)

    def louvain_inputs():
        li = (
            entrymod._t(spark, SF_DIR, "lineitem")
            .filter(F.year("l_shipdate") == 1995)
            .select("l_orderkey", "l_partkey")
        )
        a, b = li.alias("a"), li.alias("b")
        edges = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(
                F.col("a.l_partkey").alias("src"),
                F.col("b.l_partkey").alias("dst"),
            )
            .distinct()
        )
        comm = entrymod._t(spark, SF_DIR, "part").select(
            F.col("p_partkey").alias("id"), F.col("p_brand").alias("community")
        )
        return edges, comm

    bodies = {
        "graph_pagerank": lambda: ops.pagerank(nation_graph(), max_iter=1),
        "graph_personalized_pagerank": lambda: ops.personalized_pagerank(
            nation_graph(),
            entrymod._t(spark, SF_DIR, "customer")
            .filter(F.col("c_custkey") < 20)
            .select(F.concat(F.lit("c"), F.col("c_custkey")).alias("id")),
            max_iter=1,
        ),
        "graph_hits": lambda: ops.hits(copurchase(), max_iter=1),
        "graph_ktruss": lambda: ops.ktruss(copurchase(), k=4, max_iter=1),
        "graph_louvain_move": lambda: ops.louvain_move(*louvain_inputs()),
    }
    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "18")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{rnd}",
    )
    os.makedirs(outdir, exist_ok=True)
    for name, build in bodies.items():
        df = build()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_loopbody_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
