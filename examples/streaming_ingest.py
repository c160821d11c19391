"""End-to-end STREAMING demo: document feed → quality gate → staged
graph, with replay idempotence.

The streaming surface is a capability beyond the reference (strictly
batch — SURVEY.md §2.9): a file-source stream of documents flows
through ``streaming_quality_gate`` (the same stateless admission plan
the batch oracle certifies) into ``stream_save_nodes``, which routes
each micro-batch through the SAME save_nodes normalization chain as
batch ingest. Running the stream a second time over the same source
is a no-op: the checkpoint + the ``log_stream.txt`` ledger make
micro-batch re-delivery idempotent, and staged file names derive from
(label, batch_id) so even a mid-commit crash cannot double-count.

Run:  python examples/streaming_ingest.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import graph_etl_spark as getl  # noqa: E402
from graph_etl_spark.streaming import (  # noqa: E402
    stream_save_nodes,
    streaming_quality_gate,
)
from pyspark.sql import functions as F  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main(workdir: str | None = None) -> int:
    workdir = workdir or os.path.join(HERE, "_output_stream")
    shutil.rmtree(workdir, ignore_errors=True)
    spark = getl.get_spark("streaming-ingest-example")
    spark.sparkContext.setLogLevel("ERROR")

    # synthesize a small document feed: mostly clean docs, some too
    # short and some stuffed with repeated tokens — the gate's job
    src = os.path.join(workdir, "feed")
    feed = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, F.lit("spam spam spam spam spam spam"))
        .when(F.col("id") % 7 == 0, F.lit("too short"))
        .otherwise(
            F.concat(
                F.lit("document body number "),
                F.col("id"),
                F.lit(" with enough distinct words to pass the "
                      "repetition and length gates easily"),
            )
        )
        .alias("text"),
    )
    feed.write.mode("overwrite").parquet(src)

    getl.init(spark, output_folder=os.path.join(workdir, "output"))

    def run_stream() -> None:
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        admitted = streaming_quality_gate(
            stream, min_tokens=5, max_dup_word_frac=0.5
        ).select(F.col("doc_id").alias("id"), "text", "n_tokens", "dup_word_frac")
        q = stream_save_nodes(
            admitted,
            label="Document",
            checkpoint_dir=os.path.join(workdir, "ck"),
        )
        q.awaitTermination(120)

    run_stream()
    store = getl.get_store()
    files = store._configs["nodes"]["Document"]["files"]
    admitted_rows = sum(f["count"] for f in files.values())
    print(f"admitted {admitted_rows} of 60 docs into {len(files)} staged file(s)")
    assert 0 < admitted_rows < 60, "the gate should admit some and drop some"
    assert all(fn.startswith("FILE_STREAM_Document_") for fn in files)

    # replay: same source, same checkpoint — the engine re-delivers
    # nothing new, and even a forced re-delivery is ledger-guarded
    run_stream()
    files2 = store._configs["nodes"]["Document"]["files"]
    assert len(files2) == len(files), "replay staged new files"
    assert sum(f["count"] for f in files2.values()) == admitted_rows
    print("replay: no new files, counts unchanged (idempotent)")
    return admitted_rows


if __name__ == "__main__":
    n = main()
    print(f"streaming example OK ({n} docs staged)")
