"""The engine's ONE keyed exchange: hash-bucket co-partitioning.

Every keyed operator (aggregates, distinct, quantiles, window functions,
sessions, top-n, stratified sampling, shuffle join) moves data through
the same route: append ``__bucket__ = hash(key tuple) % n``, let Ray
group by that small-int column, and run ONE vectorized function per
bucket. Rationale, measured on this engine:

- Ray's ``groupby(keys)`` range-sorts the raw key values — ~5x the cost
  of sorting a 64-value int column at millions of distinct keys, and it
  *crashes* on null keys (``'<' not supported`` between None and str).
  The bucket column is never null, and the per-bucket Arrow/numpy code
  handles null keys as their own group, matching SQL.
- ``groupby(key).map_groups(fn)`` re-enters Python once per distinct
  key; a bucket function runs once per bucket with segment-vectorized
  numpy over all of its keys.

Helpers :func:`key_codes` / :func:`segments` are the shared
segment-vectorization primitives: stable integer group codes (null key
-> -1) and contiguous-run boundaries after a sort.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tbl_ray import sizing
from tbl_ray.functions.dedup import _fingerprint128

DEFAULT_BUCKETS = 64

# Auto-sizing target: one bucket's share of the ESTIMATED INPUT BYTES
# (on-disk / object-store estimate, so in-memory is ~2-4x after decode).
# 256 MiB on-disk -> ~1 GiB in a worker heap, comfortable at 32 workers
# x 128 GiB nodes. Override with TBL_RAY_BUCKET_BYTES (tests use a tiny
# value to exercise the >64-bucket path on small data).
TARGET_BUCKET_BYTES = 256 << 20
MAX_BUCKETS = 1 << 20


def auto_buckets(ds, floor: int = DEFAULT_BUCKETS) -> int:
    """Bucket count sized so no bucket exceeds a byte budget.

    ``ceil(estimated input bytes / TBL_RAY_BUCKET_BYTES)``, clamped to
    ``[floor, MAX_BUCKETS]``. Unknown-size inputs (no file-backed plan
    metadata) fall back to ``floor`` — at true scale the input of a keyed
    exchange is a parquet read (estimable) or a map over one (ditto), so
    the fallback only fires for synthetic in-memory sources. The round-2
    fixed ``DEFAULT_BUCKETS=64`` capped every keyed operator's parallelism
    at 64 tasks and required corpus/64 to fit a worker heap; this derives
    the width from the data instead (VERDICT r02 item 3)."""
    target = int(os.environ.get("TBL_RAY_BUCKET_BYTES", str(TARGET_BUCKET_BYTES)))
    est = sizing.estimate_input_bytes(ds)
    if est is None or target <= 0:
        return floor
    return int(max(floor, min(MAX_BUCKETS, -(-est // target))))


class KeyBucket:
    """Append a deterministic ``__bucket__`` = hash(key tuple) % n column.

    Dispatch on TYPE only (never on null_count): both sides of a join
    must bucket a given value identically, and one side may carry nulls
    where the other does not. Integer/temporal keys hash via a
    vectorized multiply-mix (measured 5x vs the string-cast fingerprint
    path); everything else via the canonical string form. Null keys
    hash as 0/"" — they only ever need co-location with other nulls,
    which this gives them."""

    def __init__(self, keys: list[str], n_buckets: int = DEFAULT_BUCKETS):
        self.keys = keys
        self.n_buckets = n_buckets

    def __call__(self, t: pa.Table) -> pa.Table:
        acc = np.zeros(t.num_rows, dtype=np.uint64)
        for kcol in self.keys:
            col = t.column(kcol).combine_chunks()
            if pa.types.is_integer(col.type) or pa.types.is_temporal(col.type):
                # uint64 must not route through int64 (values over 2^63
                # fail the checked Arrow cast); its numpy view is already
                # the hash input type
                wide = pa.uint64() if pa.types.is_unsigned_integer(
                    col.type
                ) else pa.int64()
                k = (
                    pc.fill_null(pc.cast(col, wide), 0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                )
                with np.errstate(over="ignore"):
                    h1 = (k ^ (k >> np.uint64(33))) * np.uint64(
                        0xFF51AFD7ED558CCD
                    )
            else:
                h1, _ = _fingerprint128(
                    pc.fill_null(col.cast(pa.string()), "")
                )
            with np.errstate(over="ignore"):
                acc = acc * np.uint64(0x9E3779B97F4A7C15) + h1
        bucket = (acc % np.uint64(self.n_buckets)).astype(np.int64)
        return t.append_column("__bucket__", pa.array(bucket))


def bucket_exchange(
    ds: "ray.data.Dataset",
    keys: list[str] | str,
    per_bucket: Callable[[pa.Table], pa.Table],
    *,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """One hash-bucket exchange + one ``per_bucket`` call per bucket.

    ``per_bucket`` receives the bucket's rows WITHOUT the ``__bucket__``
    column (already dropped) and must be pure (it may run anywhere).
    ``n_buckets=None`` (the default) auto-sizes from the input's
    estimated bytes (:func:`auto_buckets`) so bucket size stays bounded
    at any corpus scale; pass an explicit count only when the caller
    has better information (e.g. a provably tiny partials stream).
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if n_buckets is None:
        n_buckets = auto_buckets(ds)

    def run(t: pa.Table) -> pa.Table:
        return per_bucket(t.drop_columns(["__bucket__"]))

    bucketed = ds.map_batches(
        KeyBucket(key_list, n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return bucketed.groupby("__bucket__").map_groups(
        run, batch_format="pyarrow"
    )


def _grouper_bug_prone(t: pa.Table, key_list: list[str]) -> bool:
    """pyarrow 16.x multi-key grouper bug detector: when the key set mixes
    a NULL-containing 32-bit-offset var-length column (string/binary) with
    any fixed-width column, the row encoder fails to merge equal groups
    across its 32-row mini-batches — e.g. 64 rows of (null, i%3) group to
    9 "distinct" keys instead of 3. Verified empirically on pyarrow 16.1.0
    (widening to large_string/large_binary encodes correctly)."""
    if len(key_list) < 2:
        return False
    narrow_null = False
    has_fixed = False
    for k in key_list:
        col = t.column(k)
        typ = col.type
        if pa.types.is_string(typ) or pa.types.is_binary(typ):
            if col.null_count:
                narrow_null = True
        elif not (
            pa.types.is_large_string(typ) or pa.types.is_large_binary(typ)
        ):
            has_fixed = True
    return narrow_null and has_fixed


def safe_group_by(
    t: pa.Table,
    keys: "list[str] | str",
    aggs: "list[tuple] | tuple" = (),
) -> pa.Table:
    """``t.group_by(keys).aggregate(aggs)`` with the pyarrow multi-key
    grouper bug (see :func:`_grouper_bug_prone`) neutralized: affected
    string/binary key columns are widened to their large_* types for the
    grouping and cast back in the output, so callers see the original
    schema. ALL local multi-key Arrow group_bys in the engine must route
    through here — a null URL next to an int64 bucket key is exactly the
    shape web-table pipelines hit."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    casts: dict[str, tuple[pa.DataType, pa.DataType]] = {}
    if _grouper_bug_prone(t, key_list):
        for k in key_list:
            typ = t.column(k).type
            if pa.types.is_string(typ):
                casts[k] = (typ, pa.large_string())
            elif pa.types.is_binary(typ):
                casts[k] = (typ, pa.large_binary())
        for k, (_orig, wide) in casts.items():
            i = t.schema.get_field_index(k)
            t = t.set_column(i, k, pc.cast(t.column(k), wide))
    out = t.group_by(key_list).aggregate(list(aggs))
    for k, (orig, _wide) in casts.items():
        i = out.schema.get_field_index(k)
        out = out.set_column(i, k, pc.cast(out.column(k), orig))
    return out


def single_array(col: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Normalize a (possibly chunked) column to one Array."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # pyarrow version drift
        col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
    return col


def key_codes(t: pa.Table, key_col: str) -> np.ndarray:
    """Stable integer group codes for a key column (grouping only — code
    order is meaningless). Null keys code as -1: one segment of their
    own, exactly SQL's GROUP BY / PARTITION BY null behavior."""
    key = single_array(t.column(key_col))
    d = key.dictionary_encode()
    return (
        pc.fill_null(pc.cast(d.indices, pa.int64()), -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def segments(codes_sorted: np.ndarray):
    """(starts, lens, rep) for contiguous equal-code runs; ``rep[i]`` is
    the segment-start index of row i (the repeat-expanded starts)."""
    n = len(codes_sorted)
    flags = np.empty(n, dtype=bool)
    if n:
        flags[0] = True
        np.not_equal(codes_sorted[1:], codes_sorted[:-1], out=flags[1:])
    starts = np.flatnonzero(flags)
    lens = np.diff(np.append(starts, n))
    rep = np.repeat(starts, lens)
    return starts, lens, rep


def sortable_column(
    t: pa.Table, col: str
) -> tuple[np.ndarray, np.ndarray]:
    """(values, isnull) numpy pair for exact sorting and peer detection.

    Values keep their ORIGINAL dtype (an int64 column with nulls must
    NOT round-trip through float64 — values above 2^53 would collapse);
    nulls are filled with 0 and carried in the separate ``isnull`` flag,
    which the caller sorts as the more significant key (SQL NULLS LAST)
    and uses to treat two nulls as equal peers (NaN != NaN would split
    them)."""
    c = t.column(col)
    if pa.types.is_timestamp(c.type) or pa.types.is_date(c.type):
        c = pc.cast(c, pa.int64())
    isnull = np.asarray(pc.is_null(c))
    fill = "" if (
        pa.types.is_string(c.type) or pa.types.is_large_string(c.type)
    ) else 0
    vals = pc.fill_null(c, fill).to_numpy(zero_copy_only=False)
    return vals, isnull


def known_schema(ds) -> "pa.Schema | None":
    """``ds.schema()`` normalized to a plain pyarrow Schema (Ray may hand
    back a wrapper with ``base_schema``), or None when the plan cannot
    know it (e.g. a row-filtered empty dataset)."""
    sch = ds.schema()
    return getattr(sch, "base_schema", sch)


def order_pairs(
    t: pa.Table, order_cols: list[str]
) -> list[tuple[np.ndarray, np.ndarray]]:
    """(values, isnull) per order column — exact dtypes, for sorting and
    peer detection (see :func:`sortable_column`)."""
    return [sortable_column(t, c) for c in order_cols]


def order_sort_keys(pairs) -> tuple:
    """np.lexsort key tuple for (order cols, SQL NULLS LAST) — least
    significant first; callers append the (most significant) group codes
    after this. THE one home of the nulls-last significance convention."""
    keys: list[np.ndarray] = []
    for vals, isnull in reversed(pairs):
        keys.append(vals)
        keys.append(isnull)  # more significant than the value: nulls last
    return tuple(keys)
