"""End-to-end training-corpus curation demo: the nightly pipeline a
pretraining data team runs, as one Spark-first script over the
synthetic testdata tables.

Stages (each prints a one-line summary):
  1. QUALITY GATE   — heuristic scores + repetition stats; drop the
                      bottom tail (operators.quality / text).
  2. EXACT DEDUP    — normalized content hash, keep lowest doc_id
                      (operators.dedup.exact_dedup).
  3. SPAN SCRUB     — substring-level duplicate-span removal at any
                      offset (operators.dedup.dup_span_scrub): one
                      copy of every duplicated 8-token span survives
                      corpus-wide.
  4. NEAR-DUP       — MinHash LSH pairs → connected components → one
                      canonical survivor per cluster
                      (dedup + graph.dedup_clusters).
  5. INCREMENTAL    — vet a simulated "tomorrow" batch against
                      today's survivors without re-deduping them
                      (operators.dedup.incremental_dedup).
  6. ANN INDEX      — train PQ codebooks over the embeddings, encode
                      the corpus, and answer a query via the ADC
                      shortlist → exact-refine path
                      (operators.similarity.pq_*).
  7. TOKENIZER      — learn the first BPE merge rules from the
                      curated corpus (operators.text.bpe_learn_merges).
  8. NIGHTLY DELTA  — SCD-1 upsert of the admitted new batch into the
                      staged corpus, then a single-scan profile gate
                      (functions.upsert_by_key + operators.profile_table).
  9. SPLIT + SEARCH — leak-proof train/val/test assignment
                      (operators.dataset_split) and a BM25 retrieval
                      sanity probe over the refreshed corpus
                      (operators.bm25_rank).

Every stage is a declarative DataFrame plan — the same operators the
oracle-checked `__spark_entry__` queries run, composed the way a real
pipeline would chain them.

Run:  python examples/corpus_curation.py   (~1 min, local[*])
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_etl_spark import operators as ops  # noqa: E402
from graph_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(spark=None, sf_dir: str | None = None) -> dict:
    own_session = spark is None
    if own_session:
        spark = get_spark("corpus-curation-demo")
        spark.sparkContext.setLogLevel("ERROR")
    sf = sf_dir or SF_DIR

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    n0 = docs.count()
    print(f"[0] corpus: {n0} docs")

    # 1. quality gate: composite heuristic score + repetition signals
    scored = ops.quality_score(docs)
    gated = scored.filter(F.col("quality") >= 0.3).select(
        "doc_id", "text", "lang", "source"
    )
    n1 = gated.count()
    print(f"[1] quality gate: {n1} kept ({n0 - n1} dropped)")

    # 2. exact dedup (normalized content hash, keep-first)
    exact = ops.exact_dedup(gated)
    n2 = exact.count()
    print(f"[2] exact dedup: {n2} kept ({n1 - n2} exact dups)")

    # 3. duplicate-span scrub (substring-level, any offset)
    scrubbed = ops.dup_span_scrub(exact, span_tokens=8)
    stats = scrubbed.agg(
        F.sum("n_removed").alias("tok"), F.sum("n_dup_spans").alias("spans")
    ).collect()[0]
    print(
        f"[3] span scrub: removed {stats['tok']} tokens "
        f"across {stats['spans']} duplicated spans"
    )
    clean = scrubbed.filter(F.length("text_clean") > 0).select(
        "doc_id", F.col("text_clean").alias("text")
    )

    # 4. near-dup clustering: LSH pairs -> CC -> canonical survivors
    pairs = ops.minhash_lsh_pairs(clean, num_perm=16, bands=8)
    clusters = ops.dedup_clusters(pairs, clean.select("doc_id"))
    survivors = clusters.filter(F.col("doc_id") == F.col("cluster_id"))
    n4 = survivors.count()
    print(f"[4] near-dup: {n4} survivors of {clean.count()} docs")

    # 5. incremental vetting of a simulated new batch (every 5th doc
    # re-crawled + genuinely novel ids) against the survivor index
    index = clean.join(survivors.select("doc_id"), "doc_id", "left_semi")
    batch = clean.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    verdicts = ops.incremental_dedup(index, batch)
    counts = {
        r["verdict"]: r["n"]
        for r in verdicts.groupBy("verdict").agg(F.count("*").alias("n")).collect()
    }
    print(f"[5] incremental vetting of {batch.count()} new docs: {counts}")

    # 6. PQ ANN index: train, encode, and query via shortlist+refine
    books = ops.pq_train(emb, m=4, k_codes=16, max_iter=2)
    codes = ops.pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < 3)
    topk = ops.pq_refine_topk(emb, q, books, k=3, shortlist=50)
    n_codes = codes.count()
    print(f"[6] PQ index: {n_codes} vectors -> 4-byte codes; sample ANN results:")
    for r in topk.collect():
        print(
            f"      q{r['query_id']} -> neighbor {r['neighbor_id']} "
            f"(L2² {r['l2_dist']:.4f}, rank {r['rank']})"
        )

    # 7. tokenizer training: BPE merges from the curated text
    merges = ops.bpe_learn_merges(clean, rounds=3).collect()
    rules = ", ".join(
        f"{r['merge_a']}+{r['merge_b']}({r['pair_count']})" for r in merges
    )
    print(f"[7] BPE merges learned on curated corpus: {rules}")

    # 8. nightly delta: SCD-1 refresh of the staged corpus with the
    # admitted new docs (stage 5's 'kept' verdicts replace/extend by
    # doc_id), then a single-scan profile gate over the refreshed
    # table — refuse the refresh if nulls appear or the corpus shrank
    from graph_etl_spark.functions import upsert_by_key

    admitted = batch.join(
        verdicts.filter(F.col("verdict") == "kept"), "doc_id", "left_semi"
    )
    refreshed = upsert_by_key(index, admitted, keys="doc_id")
    n8 = refreshed.count()
    profile = ops.profile_table(refreshed)  # ONE scan, HLL distincts
    prof = {r["column"]: r for r in profile.collect()}
    assert prof["text"]["n_nulls"] == 0, "profile gate: refreshed corpus has NULL text"
    assert n8 >= n4, "profile gate: refresh shrank the corpus"
    print(
        f"[8] nightly delta: {admitted.count()} admitted docs upserted -> "
        f"{n8} docs; profile gate passed "
        f"(text len avg {prof['text']['avg_val']}, ~{prof['doc_id']['n_distinct']} ids)"
    )

    # 9. train/val/test split (decidable per id — leak-proof under any
    # repartition) + a BM25 retrieval probe over the refreshed corpus
    from graph_etl_spark.operators import bm25_rank, dataset_split

    splits = {
        r["split"]: r["n"]
        for r in dataset_split(refreshed)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(splits.values()) == n8, splits
    hits = bm25_rank(refreshed, ["vector", "hash"], k=3).collect()
    print(
        f"[9] split {splits}; BM25 probe top-{len(hits)}: "
        + ", ".join(f"doc {r['doc_id']} ({r['bm25']:.2f})" for r in hits)
    )

    # 10. release hygiene: CDC audit of what the nightly delta changed
    # (snapshot diff old-vs-refreshed) and deterministic masking of the
    # source column before the corpus leaves the pipeline — referential
    # integrity survives (equal sources keep equal tokens)
    from graph_etl_spark.functions import snapshot_diff
    from graph_etl_spark.operators import mask_columns

    changes = {
        r["change_type"]: r["n"]
        for r in snapshot_diff(index, refreshed, "doc_id")
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    with_meta = refreshed.join(docs.select("doc_id", "source"), "doc_id", "left")
    released = mask_columns(with_meta, ["source"], salt="release-1")
    n_masked_sources = released.select("source").distinct().count()
    n_raw_sources = with_meta.select("source").distinct().count()
    assert n_masked_sources == n_raw_sources, "masking broke source cardinality"
    print(
        f"[10] CDC audit {changes or '{no changes}'}; released corpus masks "
        f"source -> {n_masked_sources} pseudonymous tokens"
    )

    # 11. boilerplate LINE removal (round 14): C4-style cross-corpus
    # line dedup on the raw docs — a line in >= 2 distinct documents
    # is chrome, removed everywhere; report how much text it claws out
    from graph_etl_spark.operators import line_dedup

    ld = line_dedup(docs, line_tokens=8, min_docs=2)
    ld_stats = ld.agg(
        F.sum("n_removed").alias("removed"), F.sum("n_lines").alias("lines")
    ).collect()[0]
    print(
        f"[11] line dedup removed {ld_stats['removed']} of "
        f"{ld_stats['lines']} lines corpus-wide"
    )

    # 12. CCNet perplexity bands (round 14): per-language
    # head/middle/tail labels over the held-out trigram LM — the
    # shard labels a consumer mixes from
    from graph_etl_spark.operators import hash_sample, ppl_buckets

    buckets = ppl_buckets(
        docs, train_df=hash_sample(docs, permille=500, salt="lm")
    )
    n_heads = buckets.filter(F.col("bucket_label") == "head").count()
    print(f"[12] CCNet buckets: {n_heads} head docs across languages")

    # 13. SOFT dedup weights (round 14): instead of dropping the near
    # dups stage 4 found, weight every doc by 1/cluster size — total
    # training mass equals the number of distinct contents
    from graph_etl_spark.operators import soft_dedup_weights

    weights = soft_dedup_weights(docs, num_perm=16, bands=8)
    mass = weights.agg(
        F.round(F.sum("weight"), 2).alias("m")
    ).collect()[0]["m"]
    print(f"[13] soft-dedup training mass {mass} over {n0} docs")

    # 14. SEMANTIC dedup (round 15): SemDeDup end-to-end over the
    # embedding table — k-means cells, within-cell exact cosine,
    # connected components, keep ONE representative per semantic group
    from graph_etl_spark.operators import semantic_dedup_survivors

    sem = semantic_dedup_survivors(
        emb, k=8, max_iter=2, threshold=0.95, max_cell_size=150
    )
    n_sem_kept = sem.filter("keep").count()
    print(
        f"[14] SemDeDup: {n_sem_kept} semantic representatives of "
        f"{emb.count()} vectors"
    )

    # 15. LEAKAGE-FREE split (round 15): near-dup clusters move to
    # train/val/test as a UNIT — a test doc can never have a near-copy
    # in train (contrast stage 9's per-id split)
    from graph_etl_spark.operators import cluster_split

    csplit = {
        r["split"]: r["n"]
        for r in cluster_split(docs)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(csplit.values()) == n0, csplit
    print(f"[15] leakage-free cluster split {csplit}")

    # 16. EVAL CONTAMINATION + MIXTURE WEIGHTS (round 15): audit a
    # benchmark slice (first 20 vectors) against the train corpus in
    # embedding space, and compute DoReMi-style per-domain mixture
    # weights from the corpus's own LM signal
    from graph_etl_spark.operators import (
        domain_reweight,
        embedding_contamination,
    )

    cont = embedding_contamination(
        emb.filter(F.col("vec_id") >= 20),
        emb.filter(F.col("vec_id") < 20),
        threshold=0.95,
    )
    n_cont = cont.filter("contaminated").count()
    dw = {
        r["source"]: r["weight"]
        for r in domain_reweight(
            docs, train_df=hash_sample(docs, permille=500, salt="lm")
        ).collect()
    }
    print(
        f"[16] eval contamination {n_cont}/20 flagged; "
        f"mixture weights {dw}"
    )

    if own_session:
        spark.stop()
    print("corpus curation demo complete")
    return {
        "docs_in": n0,
        "after_gate": n1,
        "after_exact": n2,
        "tokens_scrubbed": int(stats["tok"]),
        "dup_spans": int(stats["spans"]),
        "survivors": n4,
        "batch_verdicts": counts,
        "pq_vectors": n_codes,
        "bpe_merges": len(merges),
        "refreshed_docs": n8,
        "profile_columns": len(prof),
        "splits": splits,
        "bm25_hits": len(hits),
        "cdc_changes": changes,
        "masked_sources": n_masked_sources,
        "lines_removed": int(ld_stats["removed"]),
        "head_docs": n_heads,
        "soft_mass": float(mass),
        "semantic_kept": n_sem_kept,
        "cluster_splits": csplit,
        "contaminated_evals": n_cont,
        "mixture_weights": dw,
    }


if __name__ == "__main__":
    main()
