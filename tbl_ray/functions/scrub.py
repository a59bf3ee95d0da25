"""Corpus scrubbing operators — repetition/quality statistics, regex
redaction (PII presets), and corpus-frequency unit dedup (the line-level
dedup of Falcon/RefinedWeb-style pipelines, generalized over any
separator).

All hot paths are vectorized Arrow/numpy inside ``map_batches``:

- :func:`repetition_stats` — per-document word-repetition metrics in the
  shape of the Gopher quality rules (duplicate-word fraction, most-common
  word fraction). One Arrow ``split_pattern`` + ``dictionary_encode`` +
  a numpy lexsort per batch; no per-row Python.
- :func:`redact` — global regex replacement with an optional match-count
  column; :data:`PII_PATTERNS` / :func:`redact_pii` bundle the standard
  email/IPv4/phone scrub. Arrow's RE2 is the same regex engine DuckDB
  uses, so results are oracle-checkable verbatim.
- :func:`line_dedup` — drop every unit (line, word, sentence — any
  separator) whose corpus-wide frequency reaches ``min_count``. Two-pass:
  per-batch partial counts (the shuffle moves (unit, count) partials,
  never documents), a keyed sum, then the small frequent set is broadcast
  and each batch filters + rejoins locally. The frequent set is bounded
  by construction: at most total_units / min_count entries.

The reference has no string-function library (SURVEY.md §2.8); these
extend it with the scrubbing stages a 100 TB web-text pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


# ---------------------------------------------------------------------------
# repetition / quality statistics
# ---------------------------------------------------------------------------

_STAT_COLS = ("n_words", "n_distinct_words", "dup_word_frac", "top_word_frac")


def _word_lists(col: pa.ChunkedArray | pa.Array, sep: str) -> pa.ListArray:
    """Literal-separator split (matches SQL ``str_split`` exactly — empty
    fragments from doubled separators are counted, unlike ``\\s+``)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    lists = pc.split_pattern(col, sep)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    return lists


def repetition_stats_batch(
    t: pa.Table, text_col: str = "text", sep: str = " "
) -> pa.Table:
    """Append Gopher-style repetition metrics per document:

    - ``n_words`` — unit count after splitting on ``sep`` (≥ 1: splitting
      "" yields one empty unit, matching SQL ``str_split``);
    - ``n_distinct_words`` — distinct units;
    - ``dup_word_frac`` — ``(n_words - n_distinct) / n_words``;
    - ``top_word_frac`` — most-frequent unit count / ``n_words``.

    Vectorized: one ``dictionary_encode`` over the flattened units, then a
    single lexsort keyed (row, code) gives distinct counts and run lengths
    for every row at once."""
    n = t.num_rows
    if n == 0:
        out = t
        for name, typ in zip(
            _STAT_COLS, (pa.int64(), pa.int64(), pa.float64(), pa.float64())
        ):
            out = out.append_column(name, pa.array([], typ))
        return out
    lists = _word_lists(t.column(text_col), sep)
    lens = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    codes = pc.dictionary_encode(flat).indices.to_numpy().astype(np.int64)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    order = np.lexsort((codes, row_idx))
    rc, cc = row_idx[order], codes[order]
    first = np.empty(len(rc), dtype=bool)
    first[0] = True
    first[1:] = (rc[1:] != rc[:-1]) | (cc[1:] != cc[:-1])
    n_distinct = np.bincount(rc[first], minlength=n)
    run_starts = np.flatnonzero(first)
    run_len = np.diff(np.append(run_starts, len(rc)))
    run_row = rc[run_starts]
    # every row has >= 1 unit, so rows partition the run list contiguously
    row_first_run = np.searchsorted(run_row, np.arange(n, dtype=np.int64))
    top = np.maximum.reduceat(run_len, row_first_run)
    n_words = lens.astype(np.float64)
    out = t.append_column("n_words", pa.array(lens))
    out = out.append_column("n_distinct_words", pa.array(n_distinct.astype(np.int64)))
    out = out.append_column(
        "dup_word_frac", pa.array((lens - n_distinct) / n_words)
    )
    out = out.append_column("top_word_frac", pa.array(top / n_words))
    return out


def repetition_stats(
    ds: "ray.data.Dataset", text_col: str = "text", sep: str = " "
) -> "ray.data.Dataset":
    def fn(t: pa.Table) -> pa.Table:
        return repetition_stats_batch(t, text_col=text_col, sep=sep)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# regex redaction (PII presets)
# ---------------------------------------------------------------------------

# RE2-syntax patterns (the regex engine of both Arrow and DuckDB).
# Order matters when composing: emails contain dot-runs a naive phone
# pattern could clip, and IPv4 must run before the digit-run phone rule.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+?\d{1,3}[-. ]?\(?\d{2,4}\)?[-. ]\d{3,4}[-. ]?\d{2,4}\b",
}


def redact_batch(
    t: pa.Table,
    col: str,
    pattern: str,
    replacement: str,
    count_col: str | None = None,
) -> pa.Table:
    """Replace every regex match in ``col``; optionally record the match
    count per row in ``count_col`` (SQL: ``regexp_replace(.., 'g')`` +
    ``len(regexp_extract_all(..))``)."""
    c = t.column(col)
    if count_col is not None:
        t = t.append_column(
            count_col, pc.cast(pc.count_substring_regex(c, pattern), pa.int64())
        )
    out = pc.replace_substring_regex(c, pattern, replacement)
    return t.set_column(t.schema.get_field_index(col), col, out)


def redact(
    ds: "ray.data.Dataset",
    col: str,
    pattern: str,
    replacement: str,
    count_col: str | None = None,
) -> "ray.data.Dataset":
    def fn(t: pa.Table) -> pa.Table:
        return redact_batch(t, col, pattern, replacement, count_col)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def redact_pii(
    ds: "ray.data.Dataset", col: str = "text", count: bool = True
) -> "ray.data.Dataset":
    """Standard PII scrub: email → ``<EMAIL>``, IPv4 → ``<IP>``, phone →
    ``<PHONE>``, applied in that fixed order, with per-category match
    counts (``n_pii_email`` etc.) when ``count``."""

    def fn(t: pa.Table) -> pa.Table:
        for name, pat in PII_PATTERNS.items():
            t = redact_batch(
                t,
                col,
                pat,
                f"<{'IP' if name == 'ipv4' else name.upper()}>",
                f"n_pii_{name}" if count else None,
            )
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# corpus-frequency unit dedup (line-level dedup, generalized)
# ---------------------------------------------------------------------------


class _FilterFrequentUnits:
    """Second pass of :func:`line_dedup`: drop flattened units found in
    the broadcast frequent set, rebuild each document, rejoin on ``sep``.

    ``ray.get`` happens lazily in ``__call__`` — resolving in ``__init__``
    of an instance passed to ``map_batches`` would pull the set onto the
    driver and ship it by value with every task."""

    def __init__(self, drop_ref, text_col: str, sep: str):
        self._ref = drop_ref
        self._text_col = text_col
        self._sep = sep
        self._drop: pa.Array | None = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._drop is None:
            self._drop = ray.get(self._ref)
        lists = _word_lists(t.column(self._text_col), self._sep)
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(self._drop) == 0 or len(flat) == 0:
            return t
        keep = np.asarray(
            pc.invert(pc.is_in(flat, value_set=self._drop)), dtype=bool
        )
        lens = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        # rows always hold >= 1 unit (split of "" is [""]) so starts is
        # strictly increasing and reduceat segments map 1:1 to rows
        kept_per_row = np.add.reduceat(keep.astype(np.int64), starts)
        new_offsets = np.concatenate([[0], np.cumsum(kept_per_row)])
        rebuilt = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), flat.filter(pa.array(keep))
        )
        joined = pc.binary_join(rebuilt, self._sep)
        return t.set_column(
            t.schema.get_field_index(self._text_col), self._text_col, joined
        )


def frequent_units(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    sep: str = "\n",
    min_count: int = 2,
) -> "ray.data.Dataset":
    """(unit, n) for every unit with corpus frequency >= ``min_count``.

    Scale shape (same as :func:`tbl_ray.functions.text.top_vocab`): the
    per-batch ``value_counts`` collapses each block to one row per
    distinct unit, the keyed groupby sums partials — the shuffle moves
    (unit, partial) rows only."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        units = pc.list_flatten(_word_lists(t.column(text_col), sep))
        if isinstance(units, pa.ChunkedArray):
            units = units.combine_chunks()
        if len(units) == 0:
            return pa.table(
                {"unit": pa.array([], pa.string()),
                 "__n__": pa.array([], pa.int64())}
            )
        vc = units.value_counts()
        return pa.table({"unit": vc.field("values"), "__n__": vc.field("counts")})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    from tbl_ray.sizing import fold_partials_local

    merged = fold_partials_local(ds, partials, "unit", [("__n__", "sum")], ["n"])
    if merged is not None:
        keep = pc.greater_equal(merged.column("n"), int(min_count))
        return ray.data.from_arrow(merged.filter(keep))
    counts = partials.groupby("unit").aggregate(Sum("__n__", alias_name="n"))
    return counts.filter(expr=f"n >= {int(min_count)}")


def line_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    sep: str = "\n",
    min_count: int = 2,
) -> "ray.data.Dataset":
    """Remove every unit whose corpus-wide frequency reaches
    ``min_count`` from every document (RefinedWeb-style line dedup when
    ``sep='\\n'``; stopword/boilerplate scrub for other separators).

    Consumes ``ds`` twice (count pass + filter pass) — checkpoint the
    upstream first if it is expensive (see
    :func:`tbl_ray.functions.dedup.exact_dedup` for the contract).

    The driver collects only the frequent-unit strings: bounded by
    total_units / min_count, the same small-side-broadcast shape as the
    dedup drop-sets."""
    freq = frequent_units(ds, text_col, sep, min_count)
    units = pa.concat_arrays(
        [
            b.column("unit").combine_chunks().cast(pa.string())
            for b in freq.select_columns(["unit"]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
            if b.num_rows
        ]
        or [pa.array([], pa.string())]
    )
    drop_ref = ray.put(units)
    return ds.map_batches(
        _FilterFrequentUnits(drop_ref, text_col, sep),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
