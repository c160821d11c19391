"""Canonical result fingerprints for declared queries — the
equivalence proof harness for optimization rounds.

Usage: python tools/result_hash.py out.json query [query ...]
Env: SPARK_GRAFT_HASH_SFS (comma list, default "0.001,0.01,0.1")

For each query x scale factor: run the query, canonicalize exactly like
tools/check_oracle.py (sorted columns, 9-sig-digit floats, sorted rows)
and store md5(canonical csv) + row count. Before/after files diff to
prove an optimization changed nothing.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind in "fc":
            df[c] = s.map(
                lambda v: "NULL"
                if v is None or (isinstance(v, float) and math.isnan(v))
                else f"{float(v):.9g}"
            )
        elif s.dtype.kind in "iu":
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else str(int(v)))
        elif s.dtype.kind == "M":
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else v.isoformat())
        else:
            df[c] = s.map(
                lambda v: "NULL"
                if v is None or (isinstance(v, float) and math.isnan(v))
                else (f"{float(v):.9g}" if isinstance(v, float) else str(v))
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sfs = os.environ.get("SPARK_GRAFT_HASH_SFS", "0.001,0.01,0.1").split(",")
    import __spark_entry__ as entrymod
    from graph_etl_spark.session import get_spark

    spark = get_spark("graph-etl-result-hash", extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict = {}
    for name in names:
        out[name] = {}
        for sf in sfs:
            sf_dir = f"/root/testdata/sf{sf}"
            pdf = qs[name](spark, sf_dir).toPandas()
            c = canonical(pdf)
            digest = hashlib.md5(
                c.to_csv(index=False).encode("utf-8")
            ).hexdigest()
            out[name][sf] = {"rows": len(c), "md5": digest}
            print(f"{name} sf{sf}: rows={len(c)} md5={digest}")
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            spark.catalog.clearCache()
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
