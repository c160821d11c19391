"""Extension operators beyond the reference surface (SURVEY.md §7.2
step 7): dedup family, similarity search, text analysis, multimodal
plumbing, temporal joins."""

from .asof import as_of_join, range_join
from .graph import connected_components, dedup_clusters, degrees, pagerank
from .dedup import (
    exact_dedup,
    exact_dup_groups,
    h56,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles_col,
    simhash,
    simhash_pairs,
)
from .multimodal import (
    attach_binary_metadata,
    decode_image_stub,
    frame_sample_plan,
    resize_image_stub,
)
from .quality import (
    boilerplate_ngrams,
    contamination_report,
    hash_sample,
    pack_sequences,
    repetition_stats,
    scrub_contact_strings,
    stratified_hash_sample,
    tfidf_top_terms,
)
from .skew import key_skew_report, salted_count, salted_join
from .similarity import (
    brute_force_topk,
    brute_force_topk_scale,
    cosine,
    cosine_neardup_pairs,
    ivf_topk,
    kmeans_assign,
    kmeans_centroids,
    kmeans_fit,
    lsh_bucketed_neardup_pairs,
    quantize_embeddings,
)
from .text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    winnow_fingerprints,
)

__all__ = [
    "as_of_join",
    "attach_binary_metadata",
    "bpe_ish_token_count",
    "brute_force_topk",
    "brute_force_topk_scale",
    "connected_components",
    "cosine",
    "dedup_clusters",
    "degrees",
    "pagerank",
    "cosine_neardup_pairs",
    "decode_image_stub",
    "exact_dedup",
    "exact_dup_groups",
    "fingerprint",
    "frame_sample_plan",
    "h56",
    "ivf_topk",
    "key_skew_report",
    "lang_id",
    "salted_count",
    "salted_join",
    "lsh_bucketed_neardup_pairs",
    "minhash_lsh_pairs",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "quality_score",
    "range_join",
    "resize_image_stub",
    "shingles_col",
    "simhash",
    "simhash_pairs",
    "token_count",
    "winnow_fingerprints",
    "boilerplate_ngrams",
    "contamination_report",
    "hash_sample",
    "kmeans_assign",
    "kmeans_centroids",
    "kmeans_fit",
    "pack_sequences",
    "quantize_embeddings",
    "repetition_stats",
    "scrub_contact_strings",
    "stratified_hash_sample",
    "tfidf_top_terms",
]
