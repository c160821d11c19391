"""Corpus-quality operators for training-data curation: repetition
signals, deterministic (stratified) sampling, boilerplate n-gram
detection, PII scrubbing, and TF-IDF top terms.

These extend the text-analysis family (operators/text.py) with the
filters a 100 TB pre-training pipeline runs between ingest and dedup:
Gopher-style repetition stats decide *drop or keep*, hash sampling
builds reproducible subsets/holdouts, boilerplate detection finds
template text that near-dup methods miss (shared phrases inside
otherwise-distinct documents), scrubbing redacts contact strings, and
TF-IDF surfaces each document's characteristic terms.

Scale design: repetition/scrub are pure per-row JVM column expressions
(zero shuffle). Sampling is a map-side filter on a deterministic hash —
no sort, no global state, reproducible on any cluster layout.
Boilerplate and TF-IDF shuffle only map-side-combined aggregates
(term/gram partial counts), never raw token streams with doc ids
attached to every occurrence.

Cross-engine determinism: every float is rounded at the operator edge
and all hashing is H56 (md5-prefix) — see operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources import fan_out
from .text import h56, tokens_col


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style drop-or-keep features)
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame, text_col: str = "text", round_to: int = 6
) -> DataFrame:
    """Per-document repetition signals (the Gopher/MassiveText repetition
    filters, adapted to word granularity):

    - ``dup_word_frac``: 1 − distinct/total tokens — bulk repetition.
    - ``top_word_frac``: occurrences of the most frequent token / total —
      degenerate-content spike (one word dominating).
    - ``adjacent_repeat_frac``: fraction of adjacent token pairs that are
      equal — stutter/loop artifacts ("foo foo foo").

    All per-row array expressions: zero shuffle, linear in splits. The
    top-word count is O(distinct × n) per row — bounded by document
    length, never by corpus size."""
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    adj = F.size(
        F.filter(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.element_at(toks, i) == F.element_at(toks, i + 1),
        )
    )
    zero = F.lit(0.0)
    return df.select(
        "*",
        n.alias("n_tokens"),
        F.round(F.when(n > 0, 1.0 - n_distinct / n).otherwise(zero), round_to).alias(
            "dup_word_frac"
        ),
        F.round(F.when(n > 0, top_cnt / n).otherwise(zero), round_to).alias(
            "top_word_frac"
        ),
        F.round(F.when(n > 1, adj / (n - 1)).otherwise(zero), round_to).alias(
            "adjacent_repeat_frac"
        ),
    )


# ---------------------------------------------------------------------------
# deterministic hash sampling (reproducible subsets at any scale)
# ---------------------------------------------------------------------------


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    permille: int = 100,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ~permille/1000 sample: rows where
    H56(salt || id) mod 1000 < permille.

    Why not ``df.sample()``: Spark's sampler is seeded per-partition, so
    the selected set changes with partitioning/cluster layout — useless
    for reproducible holdouts or cross-run joins. A content hash selects
    the SAME rows on any engine (the DuckDB oracle reproduces it
    exactly), and membership of one id is decidable without scanning.
    Map-side filter: no shuffle, no sort, prunes before anything else."""
    bucket = F.pmod(h56(F.concat(F.lit(salt), F.col(id_col).cast("string"))), F.lit(1000))
    return df.filter(bucket < permille)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str = "lang",
    rates_permille: dict[str, int] | None = None,
    default_permille: int = 100,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the rebalancing primitive
    (e.g. keep 100% of an underrepresented language, 5% of English).
    ``rates_permille`` maps stratum value → permille; unlisted strata get
    ``default_permille``. The rate table is a tiny literal CASE chain —
    no join, still one map-side filter."""
    rate: Column = F.lit(default_permille)
    for value, pm in sorted((rates_permille or {}).items()):
        rate = F.when(F.col(strata_col) == value, F.lit(pm)).otherwise(rate)
    bucket = F.pmod(h56(F.concat(F.lit(salt), F.col(id_col).cast("string"))), F.lit(1000))
    return df.filter(bucket < rate)


# ---------------------------------------------------------------------------
# boilerplate n-gram detection (template text across documents)
# ---------------------------------------------------------------------------


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_df: int = 3,
) -> DataFrame:
    """(gram, df) for word n-grams appearing in at least ``min_df``
    distinct documents — the boilerplate/template detector (navigation
    chrome, license headers, form letters) that pairwise near-dup
    methods miss when the surrounding document differs.

    One shuffle of map-side-combined (gram, partial count) pairs; the
    per-document distinct-gram step means a gram counts once per doc
    (document frequency, not term frequency). The output is small by
    construction (only grams crossing min_df) and is typically
    broadcast back against the corpus to strip matching spans."""
    from .dedup import shingles_col

    grams = fan_out(df).select(
        F.explode(shingles_col(F.col(text_col), n)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )


# ---------------------------------------------------------------------------
# PII / contact-string scrubbing
# ---------------------------------------------------------------------------

# Conservative, cross-engine-identical patterns (no lookaround, no \b —
# DuckDB RE2-style parity): emails and http(s) URLs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def scrub_contact_strings(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "scrubbed",
) -> DataFrame:
    """Redact emails and URLs, recording per-row redaction counts —
    the cheap PII pass every published corpus pipeline runs. Pure JVM
    regexp (codegen, zero shuffle); counts let downstream filters drop
    contact-heavy documents instead of just masking them."""
    text = F.col(text_col)
    return df.select(
        "*",
        F.regexp_count(text, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(text, F.lit(URL_RE)).alias("n_urls"),
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
        ).alias(out_col),
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Per-document top-``k`` terms by TF-IDF (tf × ln(N/df)); ties
    break on the lexicographically smaller term. Output:
    (id, term, tf, df, tfidf, rank).

    Physical shape: term frequencies are PER-ROW array expressions (no
    (doc, term) shuffle for tf — the classic MapReduce formulation pays
    one). Document frequencies aggregate exploded DISTINCT terms —
    map-side combined, the shuffle carries (term, partial count). The
    df table joins back on the term (shuffle join; at corpus scale the
    vocabulary outgrows a broadcast), and a per-doc window picks top-k.
    N is resolved by a broadcast 1-row count, not a driver collect."""
    toks = tokens_col(F.lower(F.col(text_col)))
    per_doc = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.array_distinct(toks),
                lambda t: F.struct(
                    t.alias("term"),
                    F.size(F.filter(toks, lambda x: x == t)).alias("tf"),
                ),
            )
        ).alias("tt"),
    ).select(id_col, "tt.term", "tt.tf")
    dfreq = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        per_doc.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), round_to),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )
