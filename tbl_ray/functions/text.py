"""Text analysis operators — language ID, quality scoring, token counting,
document fingerprinting. Vectorized (`pyarrow.compute` regex/string kernels
+ numpy) inside ``map_batches``; no per-row Python in hot paths except the
noted C-call fingerprint.

These extend the reference (which has no string function library,
SURVEY.md §2.8) with the operations a 100 TB training-data pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tbl_ray.codecs.base import binary_parts, segment_reduceat
from tbl_ray.stages.exchange import safe_group_by
from tbl_ray.webtable import _mix

# small built-in marker vocabularies for the n-gram/stopword langid heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "para", "que", "con", "por"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "zhe", "bu", "ren"],
}


def _marker_pattern(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_count_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count: number of ``\\S+`` runs (vectorized regex)."""
    text = t.column(text_col)
    n = pc.count_substring_regex(text, r"\S+")
    return t.append_column("n_tokens", pc.cast(n, pa.int64()))


# GPT-2-style pre-tokenizer split, restricted to RE2 syntax (no
# lookahead), so Arrow and DuckDB — both RE2 — count identically:
# contractions, letter runs, digit runs, punctuation runs, whitespace runs.
BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def token_count_bpe_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-pre-tokenizer token count (:data:`BPE_SPLIT_PATTERN` matches —
    the standard budget estimate for sequence packing; a real BPE merge
    table only splits these further)."""
    text = t.column(text_col)
    n = pc.count_substring_regex(text, BPE_SPLIT_PATTERN)
    return t.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def token_count_bpe(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    return ds.map_batches(
        _wrap(token_count_bpe_batch, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def text_stats_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / digit / stopword statistics + quality score.

    quality = heuristics over length, punctuation density, stopword density
    and mean token length — the usual cheap pre-filters for web text.
    """
    text = t.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[.,!?;:]"), pa.float64())
    n_digit = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.float64())
    n_stop = pc.cast(
        pc.count_substring_regex(text, _marker_pattern(_LANG_MARKERS["en"])),
        pa.float64(),
    )
    safe_tokens = pc.max_element_wise(n_tokens, 1.0)
    safe_chars = pc.max_element_wise(n_chars, 1.0)
    mean_tok_len = pc.divide(n_chars, safe_tokens)
    punct_ratio = pc.divide(n_punct, safe_chars)
    digit_ratio = pc.divide(n_digit, safe_chars)
    stop_ratio = pc.divide(n_stop, safe_tokens)

    # quality in [0,1]: long enough, readable token lengths, some stopwords,
    # not digit/punct-soup
    ln = np.asarray(n_chars)
    q = (
        np.clip(ln / 500.0, 0, 1) * 0.3
        + np.clip(1.0 - np.abs(np.asarray(mean_tok_len) - 5.0) / 5.0, 0, 1) * 0.3
        + np.clip(np.asarray(stop_ratio) * 4.0, 0, 1) * 0.2
        + np.clip(1.0 - np.asarray(digit_ratio) * 5.0, 0, 1) * 0.1
        + np.clip(1.0 - np.asarray(punct_ratio) * 10.0, 0, 1) * 0.1
    )
    out = t
    for name, arr in [
        ("text_len", pc.cast(n_chars, pa.int64())),
        ("n_tokens", pc.cast(n_tokens, pa.int64())),
        ("punct_ratio", punct_ratio),
        ("digit_ratio", digit_ratio),
        ("stopword_ratio", stop_ratio),
        ("quality", pa.array(q, type=pa.float64())),
    ]:
        out = out.append_column(name, arr)
    return out


def langid_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: density of per-language marker words
    (vectorized regex count per language, argmax)."""
    text = t.column(text_col)
    n_tokens = np.maximum(
        np.asarray(pc.count_substring_regex(text, r"\S+"), dtype=np.float64), 1.0
    )
    langs = list(_LANG_MARKERS)
    scores = np.zeros((len(langs), t.num_rows))
    for i, lang in enumerate(langs):
        hits = pc.count_substring_regex(text, _marker_pattern(_LANG_MARKERS[lang]))
        scores[i] = np.asarray(hits, dtype=np.float64) / n_tokens
    best = np.argmax(scores, axis=0)
    confident = scores.max(axis=0) > 0.01
    pred = np.where(confident, np.array(langs, dtype=object)[best], "und")
    return t.append_column("lang_pred", pa.array(pred, type=pa.string()))


def fingerprint_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit content fingerprint per document.

    Vectorized: splitmix64 of every byte mixed with its *in-row* position
    (so the hash is order-sensitive but content-pure — never sees
    neighboring rows), XOR-folded per row via ``np.bitwise_xor.reduceat``.
    O(bytes), no per-row Python."""
    col = t.column(text_col).combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    offsets, data = binary_parts(col)
    n = len(col)
    if len(data) == 0:
        return t.append_column("fingerprint", pa.array([0] * n, type=pa.uint64()))
    pos = np.arange(len(data), dtype=np.uint64)
    row_start = np.repeat(offsets[:-1].astype(np.uint64), np.diff(offsets))
    with np.errstate(over="ignore"):
        h = _mix(
            data.astype(np.uint64)
            + np.uint64(1)
            + (pos - row_start) * np.uint64(0x9E3779B97F4A7C15)
        )
    fp = segment_reduceat(np.bitwise_xor, h, offsets, np.uint64(0))
    return t.append_column("fingerprint", pa.array(fp, type=pa.uint64()))


# ---------------------------------------------------------------------------
# Dataset-level wrappers
# ---------------------------------------------------------------------------


def _wrap(fn, **kw):
    def inner(t: pa.Table) -> pa.Table:
        return fn(t, **kw)

    return inner


def token_count(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    return ds.map_batches(
        _wrap(token_count_batch, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def text_stats(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    return ds.map_batches(
        _wrap(text_stats_batch, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def langid(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    return ds.map_batches(
        _wrap(langid_batch, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def fingerprint(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    return ds.map_batches(
        _wrap(fingerprint_batch, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )



def tokenize_whitespace(col: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """THE engine's whitespace tokenization, shared by every term-level
    operator (top_vocab, top_ngrams, term_stats) so tf/df/vocab counts
    can never desynchronize: fill nulls with "", split on ``\\s+``,
    single chunk. Callers must still drop the ``""`` split artifacts
    after flattening — the SQL mirror is
    ``regexp_extract_all(text, '\\S+')``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # 0/1-chunk normalization
        col = col.chunk(0) if col.num_chunks else pa.array([], pa.string())
    if col.null_count:
        col = pc.fill_null(col, "")
    lists = pc.split_pattern_regex(col, r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    return lists


def top_vocab(
    ds: "ray.data.Dataset", text_col: str = "text", k: int = 100
) -> "ray.data.Dataset":
    """Top-k word vocabulary over the corpus: (word, n) sorted by count
    desc then word asc.

    Scale shape: per-batch word counts via Arrow kernels (split +
    value_counts — one (word, partial) row per distinct word per block),
    keyed groupby sums the partials, and the shuffle-free topk picks the
    head. The all-to-all moves word partials, never documents."""
    from ray.data.aggregate import Sum

    from tbl_ray.stages.slicing import topk

    def partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(tokenize_whitespace(t.column(text_col)))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        words = words.filter(pc.not_equal(words, ""))  # split artifacts
        if len(words) == 0:
            return pa.table(
                {"word": pa.array([], pa.string()),
                 "__n__": pa.array([], pa.int64())}
            )
        vc = words.value_counts()
        return pa.table(
            {"word": vc.field("values"), "__n__": vc.field("counts")}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return _topk_counts(ds, partials, "word", k)


def _topk_counts(
    ds: "ray.data.Dataset",
    partials: "ray.data.Dataset",
    key: str,
    k: int,
) -> "ray.data.Dataset":
    """Merge (key, __n__) partials and keep the top-k by (n desc, key
    asc) — locally when the input is provably small (tbl_ray.sizing),
    via keyed groupby + shuffle-free topk otherwise."""
    from ray.data.aggregate import Sum

    from tbl_ray.sizing import fold_partials_local
    from tbl_ray.stages.slicing import topk

    merged = fold_partials_local(ds, partials, key, [("__n__", "sum")], ["n"])
    if merged is not None:
        top = merged.sort_by(
            [("n", "descending"), (key, "ascending")]
        ).slice(0, k)
        import ray.data as rd

        return rd.from_arrow(top)
    counts = partials.groupby(key).aggregate(Sum("__n__", alias_name="n"))
    return topk(counts, ["n", key], k, descending=[True, False])


def top_ngrams(
    ds: "ray.data.Dataset", text_col: str = "text", n: int = 2, k: int = 100
) -> "ray.data.Dataset":
    """Top-k word n-grams over the corpus: (ngram, n) sorted by count
    desc then ngram asc. n-grams never cross documents; words are
    whitespace-split with empty artifacts dropped (same vocabulary as
    :func:`top_vocab`).

    Vectorized n-gram build: ``n`` shifted zero-copy slices of the
    batch-flat word array joined element-wise, with one boolean mask
    dropping the window positions that would cross a row boundary."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"ngram": pa.array([], pa.string()),
             "__n__": pa.array([], pa.int64())}
        )
        lists = tokenize_whitespace(t.column(text_col))
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        keep = np.asarray(pc.not_equal(flat, ""), dtype=bool)
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        kept_per_row = (
            np.add.reduceat(keep.astype(np.int64), starts)
            if len(keep)
            else np.zeros(len(lens), np.int64)
        )
        kept_per_row[lens == 0] = 0  # reduceat artifact on empty rows
        flat = flat.filter(pa.array(keep))
        L = len(flat)
        if L < n:
            return empty
        # window j valid iff j+n stays inside j's row
        row_ends = np.repeat(np.cumsum(kept_per_row), kept_per_row)
        valid = (np.arange(L, dtype=np.int64) + n) <= row_ends
        valid = valid[: L - n + 1]
        if not valid.any():
            return empty
        parts = [flat.slice(i, L - n + 1) for i in range(n)]
        grams = (
            parts[0]
            if n == 1
            else pc.binary_join_element_wise(*parts, " ")
        )
        vc = grams.filter(pa.array(valid)).value_counts()
        return pa.table({"ngram": vc.field("values"), "__n__": vc.field("counts")})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return _topk_counts(ds, partials, "ngram", k)


def normalize_text_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Canonical text form for dedup/fingerprint pre-processing:
    lowercase, collapse whitespace runs to one space, strip ends — all
    Arrow kernels (SQL: ``lower(trim(regexp_replace(text, '\\s+', ' ',
    'g')))``)."""
    col = t.column(text_col)
    out = pc.utf8_lower(col)
    out = pc.replace_substring_regex(out, r"\s+", " ")
    out = pc.utf8_trim_whitespace(out)
    return t.set_column(
        t.schema.get_field_index(text_col), text_col, out
    )


def normalize_text(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    return ds.map_batches(
        _wrap(normalize_text_batch, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def term_stats(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Per-(doc, term) frequency joined with corpus document frequency:
    (id, term, tf, df) — the exact-integer core of TF-IDF / BM25.

    Scale shape: a document is one row, so its term frequencies are
    exact within a single batch (one vectorized split + local Arrow
    group_by — nothing leaves the node to compute tf). Document
    frequency aggregates the (term, doc) pairs through
    :func:`tbl_ray.stages.aggregate.group_aggregate`'s bucket exchange
    — partials per block, one exchange proportional to the vocabulary,
    never the corpus. The df table then joins back via
    :func:`tbl_ray.functions.joins.join_auto`: it is materialized (a
    vocabulary is orders of magnitude smaller than its corpus), so the
    planner sees its true size — broadcast at survey scale, shuffle
    when a 100 TB crawl's vocabulary outgrows the heap.

    Tokenization matches ``top_vocab`` (split on ``\\s+``, drop empty) —
    SQL mirror ``regexp_extract_all(text, '\\S+')``.
    """

    def doc_terms(t: pa.Table) -> pa.Table:
        split = tokenize_whitespace(t.column(text_col))
        words = pc.list_flatten(split)
        parents = pc.list_parent_indices(split)
        ids = t.column(id_col).take(parents)
        keep = pc.not_equal(words, "")
        pairs = pa.table({id_col: ids, "term": words}).filter(keep)
        tf = safe_group_by(pairs, [id_col, "term"], [("term", "count")])
        return tf.rename_columns([id_col, "term", "tf"])

    tf_ds = ds.map_batches(
        doc_terms, batch_format="pyarrow", zero_copy_batch=True
    )

    from tbl_ray.functions.joins import join_auto
    from tbl_ray.sizing import fits_local
    from tbl_ray.stages.aggregate import group_aggregate

    # tf feeds two full passes (df aggregation + the join back). When the
    # input is provably small, checkpoint it so tokenization runs once;
    # at corpus scale, recomputing the vectorized split streams better
    # than materializing a corpus-sized tf table into the object store.
    if fits_local(ds):
        tf_ds = tf_ds.materialize()

    df_ds = group_aggregate(tf_ds, "term", {id_col: ["count"]})

    def rename_df(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["df" if c == f"count_{id_col}" else c for c in t.schema.names]
        )

    df_ds = df_ds.map_batches(
        rename_df, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # vocabulary-sized: gives the join planner true bytes
    return join_auto(tf_ds, df_ds, "term")


def tfidf_score(
    ds: "ray.data.Dataset",
    n_docs: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """(id, term, tf, df, score) with the classic smoothed
    ``score = tf * ln((1 + n_docs) / (1 + df))``. Float by nature (ln),
    so it is checked rows-only; the integer components are the
    oracle-checked :func:`term_stats`."""
    import numpy as np

    stats = term_stats(ds, id_col=id_col, text_col=text_col)

    def score(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        df = t.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        s = tf * np.log((1.0 + n_docs) / (1.0 + df))
        return t.append_column("score", pa.array(s, pa.float64()))

    return stats.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def regex_extract(
    ds: "ray.data.Dataset",
    col: str,
    pattern: str,
    out_col: str,
) -> "ray.data.Dataset":
    """Append the first capture of an RE2 ``pattern`` over ``col`` —
    DuckDB ``regexp_extract(col, pattern, 1)`` parity by construction
    (both engines are RE2): no match -> ``''``, null input -> null.
    ``pattern`` must contain exactly one capture group. Vectorized
    (one Arrow ``extract_regex`` kernel per batch)."""
    from tbl_ray.functions.urls import _extract, _group1_to_named

    _group1_to_named(pattern)  # driver-side: raise a clear error early

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, _extract(t.column(col), pattern))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
