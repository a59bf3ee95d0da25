"""Training-data pipeline functions beyond the reference's surface:
text analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine / decontamination), similarity search (brute,
IVF scan, persisted IVF index), deterministic sampling, broadcast joins,
and mergeable sketches (HLL, DDSketch quantiles). All are Ray-Data-first
batch operators over zero-copy Arrow."""

from tbl_ray.functions.dedup import (
    decontaminate,
    exact_dedup,
    exact_dedup_bucketed,
    exact_dedup_shuffle,
    minhash_dedup,
    minhash_dup_pairs,
    ngram_jaccard,
    simhash,
    simhash_dup_pairs,
)
from tbl_ray.functions.joins import (
    broadcast_asof_join,
    broadcast_join,
    broadcast_range_join,
    broadcast_semi_join,
    join_auto,
    shuffle_join,
)
from tbl_ray.functions.chunking import chunk_fixed, pack_sequences
from tbl_ray.functions.sampling import (
    sample_stratified,
    sample_uniform,
    sample_weighted,
    shuffle_deterministic,
    shuffle_head,
    split_assign,
)
from tbl_ray.functions.scrub import (
    frequent_units,
    line_dedup,
    redact,
    redact_pii,
    repetition_stats,
)
from tbl_ray.functions.similarity import (
    build_ivf_index,
    embedding_centroids,
    kmeans_assign,
    kmeans_fit,
    knn_brute,
    knn_ivf,
    knn_ivf_index,
)
from tbl_ray.functions.sketches import (
    approx_distinct,
    approx_distinct_by,
    approx_quantiles,
    count_distinct_by,
    histogram,
)
from tbl_ray.functions.text import (
    fingerprint,
    normalize_text,
    langid,
    regex_extract,
    term_stats,
    text_stats,
    tfidf_score,
    token_count,
    token_count_bpe,
    top_ngrams,
    top_vocab,
)
from tbl_ray.functions.urls import url_canonicalize, url_parts
from tbl_ray.functions.windows import session_counts, tumbling_window
from tbl_ray.functions.winfns import rolling_range_agg, window_functions

__all__ = [
    "approx_distinct",
    "approx_distinct_by",
    "approx_quantiles",
    "broadcast_asof_join",
    "broadcast_join",
    "broadcast_range_join",
    "broadcast_semi_join",
    "join_auto",
    "kmeans_assign",
    "kmeans_fit",
    "regex_extract",
    "rolling_range_agg",
    "sample_weighted",
    "split_assign",
    "term_stats",
    "tfidf_score",
    "window_functions",
    "count_distinct_by",
    "chunk_fixed",
    "build_ivf_index",
    "decontaminate",
    "embedding_centroids",
    "exact_dedup",
    "exact_dedup_bucketed",
    "exact_dedup_shuffle",
    "fingerprint",
    "frequent_units",
    "histogram",
    "knn_brute",
    "knn_ivf",
    "knn_ivf_index",
    "langid",
    "line_dedup",
    "minhash_dedup",
    "minhash_dup_pairs",
    "ngram_jaccard",
    "normalize_text",
    "pack_sequences",
    "redact",
    "redact_pii",
    "repetition_stats",
    "sample_stratified",
    "sample_uniform",
    "session_counts",
    "shuffle_deterministic",
    "shuffle_head",
    "shuffle_join",
    "simhash",
    "simhash_dup_pairs",
    "text_stats",
    "token_count",
    "token_count_bpe",
    "top_ngrams",
    "top_vocab",
    "tumbling_window",
    "url_canonicalize",
    "url_parts",
]
