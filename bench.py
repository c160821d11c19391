"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a full-result action (count on the
final plan) after a warm-up of the session; timings include plan
optimization + execution, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the §2 ETL core + analytics + every extension family.
HEADLINE = [
    "etl_normalize_nodes",
    "etl_dedup_pk",
    "etl_remap_j1",
    "etl_automap_j2",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "json_extract_events",
    "win_running_total",
    "topk_orders",
    "events_tumbling_counts",
    "events_sessionize",
    "asof_join_events",
    "dedup_exact_groups",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash_signatures",
    "text_quality_scores",
    "text_lang_id",
    "text_fingerprint",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "mm_binary_metadata",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from graph_etl_spark.session import get_spark

    spark = get_spark("graph-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm up JVM + codegen + higher-order-expression paths (not timed)
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(50)
        .select(F.md5(F.array_join(F.filter(F.split("text", " "), lambda t: t != ""), " ")))
        .write.format("noop").mode("overwrite").save()
    )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        # noop sink: materializes EVERY column of the full plan —
        # count() would let Catalyst prune the expensive expressions
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
