"""CDC index-compaction probe (VERDICT r13 #5 'Done' clause): show
per-batch prior-index read work is bounded by the DISTINCT-HASH count
under compaction, not by the batch count.

Drives cdc_ingest_sink for N batches twice — raw-tree posture (no
compaction) vs compacted posture (compact_every=8 + prune) — and
times the LAST batch of each, when the raw tree is N-1 dirs deep and
the compacted index is one bucketed parquet read + a short tail.
Also re-times a batch at 2N on the same dirs to show the raw cost
GROWS with history while the compacted cost stays flat.

Prints one JSON line:
  {"n_batches": N, "raw_last_sec": ..., "compacted_last_sec": ...,
   "raw_2n_sec": ..., "compacted_2n_sec": ..., "raw_growth": ...,
   "compacted_growth": ...}

Usage: python tools/cdc_probe.py [N]  (default 24)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_etl_spark.session import get_spark  # noqa: E402
from graph_etl_spark.streaming import (  # noqa: E402
    cdc_ingest_sink,
    compact_cdc_index,
    prune_cdc_raw,
)


def drive(spark, docs, n_batches: int, compact: bool, workdir: str):
    """Run n_batches through the sink; return sec of the LAST batch."""
    chunk_dir = os.path.join(workdir, "chunks")
    sink = cdc_ingest_sink(
        chunk_dir, compact_every=8 if compact else None
    )
    per_batch = len(docs) // n_batches
    last = 0.0
    for b in range(n_batches):
        rows = docs[b * per_batch : (b + 1) * per_batch]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        t0 = time.time()
        sink(df, b)
        last = time.time() - t0
        if compact:
            prune_cdc_raw(chunk_dir)
    return chunk_dir, last


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    spark = get_spark("cdc-probe")
    src = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs = [
        (r["doc_id"], r["text"])
        for r in src.select("doc_id", "text").collect()
    ]
    out = {}
    dirs = {}
    for compact in (False, True):
        workdir = tempfile.mkdtemp(prefix=f"cdc_probe_{compact}_")
        chunk_dir, last = drive(spark, docs, n, compact, workdir)
        key = "compacted" if compact else "raw"
        out[f"{key}_last_sec"] = round(last, 3)
        dirs[key] = (workdir, chunk_dir)
    # growth check: replay ONE more batch on a tree twice as deep —
    # duplicate the existing batch dirs under shifted ids (raw), or
    # fold them (compacted), then time batch 2n
    for key, (workdir, chunk_dir) in dirs.items():
        for name in sorted(os.listdir(chunk_dir)):
            if name.startswith("batch_id="):
                b = int(name.split("=", 1)[1])
                dst = os.path.join(chunk_dir, f"batch_id={b + n}")
                if not os.path.isdir(dst):
                    shutil.copytree(os.path.join(chunk_dir, name), dst)
        sink = cdc_ingest_sink(
            chunk_dir, compact_every=8 if key == "compacted" else None
        )
        if key == "compacted":
            compact_cdc_index(spark, chunk_dir)
            prune_cdc_raw(chunk_dir)
        df = spark.createDataFrame(docs[:20], "doc_id long, text string")
        t0 = time.time()
        sink(df, 2 * n)
        out[f"{key}_2n_sec"] = round(time.time() - t0, 3)
        shutil.rmtree(workdir, ignore_errors=True)
    out["n_batches"] = n
    out["raw_growth"] = round(
        out["raw_2n_sec"] / max(out["raw_last_sec"], 1e-6), 2
    )
    out["compacted_growth"] = round(
        out["compacted_2n_sec"] / max(out["compacted_last_sec"], 1e-6), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
