"""Text-analysis operators for large-scale training-data pipelines.

All pure JVM-side column expressions (no Python UDFs): language-ID
(stopword-hit heuristic), quality scoring (length/punct/stopword
ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting. Every operator is embarrassingly parallel — no
shuffle — so it scales linearly with input splits at 100 TB.

Cross-engine determinism: each transform is chosen to be expressible
in ANSI-ish SQL (DuckDB oracle parity; see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword inventories for the n-gram/stopword
# language heuristic. Deliberately small + deterministic (the point is
# the operator shape, not linguistic accuracy).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "que", "est"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "una", "es"],
    "de": ["der", "die", "und", "das", "ein", "ist", "von", "mit", "den", "zu"],
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empties removed (split parity with DuckDB
    string_split + list_filter)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count."""
    return df.withColumn(out, F.size(tokens_col(F.col(text_col))))


def bpe_ish_token_count(df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens") -> DataFrame:
    """BPE-ish token estimate via word-piece regex: runs of up to 4
    letters, runs of digits, or single non-space symbols each count as
    one token. Approximates subword tokenizer counts without a vocab."""
    return df.withColumn(
        out,
        F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]")),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, mean word length,
    punctuation ratio, English-stopword ratio, and a composite score.
    Mirrors the C4/Gopher-style cheap quality filters."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(LANG_STOPWORDS["en"])))
    mean_word_len = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    score = (
        F.when((n_tok >= 10) & (n_tok <= 100_000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_word_len >= 3) & (mean_word_len <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_word_len", F.round(mean_word_len, 4))
        .withColumn("punct_ratio", F.round(punct_ratio, 4))
        .withColumn("stopword_ratio", F.round(stop_ratio, 4))
        .withColumn("quality", F.round(score, 2))
    )


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-hit language heuristic: the language with the highest
    stopword-hit count wins; ties break lexicographically; no hits →
    'und'. Stays fully vectorized: one pass builds per-language hit
    counts, greatest-of picks the winner."""
    toks = tokens_col(F.lower(F.col(text_col)))

    def _hits(sw: list[str]):
        # closure, not a default arg: PySpark derives lambda arity from
        # the signature, so extra defaulted params break higher-order fns
        return F.size(F.filter(toks, lambda t: t.isin(sw)))

    hit_cols = {lang: _hits(sw) for lang, sw in LANG_STOPWORDS.items()}
    # encode (hits, lang) so greatest() is deterministic: higher hits
    # win; on equal hits the lexicographically-SMALLER lang wins, so
    # invert the lang ordering inside the struct
    best = None
    for lang in sorted(LANG_STOPWORDS):  # later (greater) langs lose ties
        cand = F.struct(
            hit_cols[lang].alias("hits"),
            F.lit(-ord(lang[0]) * 256 - ord(lang[1])).alias("tie"),
            F.lit(lang).alias("lang"),
        )
        best = cand if best is None else F.greatest(best, cand)
    return df.withColumn(
        out, F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 over the sorted distinct
    token set (content fingerprint robust to word order/duplication —
    the batch analog of a winnowed rolling hash)."""
    toks = F.array_sort(F.array_distinct(tokens_col(F.lower(F.col(text_col)))))
    return df.withColumn(out, F.md5(F.array_join(toks, " ")))


def normalized_text(text: Column) -> Column:
    """Canonical text for exact-dedup hashing: lowercase, collapse
    whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
