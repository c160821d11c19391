"""Empirical scale probe: run headline operators at 1x and Nx input
and report the runtime ratio. Near-N ratios mean the plan's cost is
linear in input (shuffles sized by data, no hidden quadratics); a
superlinear ratio flags a pair-blowup or a buffer that grows with
corpus size.

The Nx frame is the sf corpus unioned N times with namespaced ids AND
per-copy-suffixed text/vectors, so cross-copy rows are NOT duplicates —
output sizes stay ~linear and the probe measures plan scaling, not
data-dependent pair growth.

Usage: python tools/scale_probe.py [N]   (default 10, sf0.1)
Prints one JSON line: {"n": N, "ops": {name: {"t1": s, "tn": s,
"ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_etl_spark import operators as ops  # noqa: E402
from graph_etl_spark.session import get_spark  # noqa: E402
from graph_etl_spark.sources import read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate_docs(d, n):
    parts = []
    for i in range(n):
        # mutate EVERY token per copy (marker spliced into every gap):
        # one appended tag would leave copies as genuine near-dups and
        # the pair ops would measure quadratic DATA growth, not plan
        # scaling; fully-disjoint token sets keep outputs ~linear
        parts.append(
            d.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.regexp_replace(F.col("text"), " ", f" c{i}_").alias("text"),
                "lang",
                "source",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_vecs(e, n):
    # dim from the data, not a constant: zip_with null-pads the shorter
    # side, so a wrong hardcoded width would silently null vector
    # components instead of failing
    first = e.select("embedding").first()
    dim = len(first["embedding"]) if first else 0
    parts = []
    for i in range(n):
        # per-copy deterministic sign pattern: dot products WITHIN a
        # copy are bit-identical to the original corpus (s_j^2 = 1), so
        # within-copy near-dup structure is preserved, while cross-copy
        # cosines decorrelate — no planted quadratic pair growth (a
        # constant shift would make every copy-i vector collinear).
        # Signs come from md5(copy:j): the earlier arithmetic pattern
        # ((j*31 + k*17) % 2) reduced to k mod 2, making all same-parity
        # copies IDENTICAL vectors — 40k planted dup pairs at n=10, so
        # the pair ops measured quadratic data growth, not plan scaling.
        import hashlib

        signs = F.array(
            *[
                F.lit(
                    1.0
                    if int(hashlib.md5(f"copy{i}:{j}".encode()).hexdigest()[:4], 16) % 2
                    else -1.0
                )
                for j in range(dim)
            ]
        )
        parts.append(
            e.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.zip_with(
                    "embedding", signs, lambda x, s: (x * s).cast("float")
                ).alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(df) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d1 = read_table(spark, SF_DIR, "documents").select("doc_id", "text", "lang", "source")
    e1 = read_table(spark, SF_DIR, "embeddings")
    dn, en = replicate_docs(d1, n), replicate_vecs(e1, n)

    cases = {
        "exact_dedup": lambda d: ops.exact_dedup(d),
        "minhash_lsh_pairs": lambda d: ops.minhash_lsh_pairs(d, num_perm=16, bands=8),
        "simhash_pairs": lambda d: ops.simhash_pairs(d, bits=32, max_hamming=2),
        "ngram_jaccard_pairs": lambda d: ops.ngram_jaccard_pairs(d, threshold=0.12),
        "repetition_stats": lambda d: ops.repetition_stats(d),
        "tfidf_top_terms": lambda d: ops.tfidf_top_terms(d, k=3),
        # r6: sources stay fixed while docs 10x, so the quota window's
        # per-source sort grows 10x — probes the documented skew note
        # (output stays bounded at cap x n_sources)
        "source_quota_cap": lambda d: ops.source_quota_cap(d, cap=10),
    }
    vec_cases = {
        "quantize_embeddings": lambda e: ops.quantize_embeddings(e),
        "lsh_cosine_neardup": lambda e: ops.lsh_bucketed_neardup_pairs(
            e, threshold=0.95, n_planes=12, dim=64, n_tables=4
        ),
        # r6: the registered-form semantic dedup — k fixed at 8 while
        # the corpus 10x's, so cells grow 10x past the cap and the LSH
        # subdivision (not cell count) must hold pair work linear
        "semantic_dedup_pairs": lambda e: ops.semantic_dedup_pairs(
            e, k=8, max_iter=2, threshold=0.95, max_cell_size=150
        ),
    }

    # warm codegen/Arrow paths once (not timed)
    ops.minhash_lsh_pairs(d1.limit(50)).write.format("noop").mode("overwrite").save()

    result: dict[str, dict] = {}
    for name, fn in cases.items():
        t1, tn = timed(fn(d1)), timed(fn(dn))
        result[name] = {"t1": t1, "tn": tn, "ratio": round(tn / max(t1, 1e-6), 1)}
        print(f"# {name}: {t1}s -> {tn}s (x{result[name]['ratio']})", file=sys.stderr)
    for name, fn in vec_cases.items():
        t1, tn = timed(fn(e1)), timed(fn(en))
        result[name] = {"t1": t1, "tn": tn, "ratio": round(tn / max(t1, 1e-6), 1)}
        print(f"# {name}: {t1}s -> {tn}s (x{result[name]['ratio']})", file=sys.stderr)

    print(json.dumps({"n": n, "sf_dir": SF_DIR, "ops": result}))


if __name__ == "__main__":
    main()
