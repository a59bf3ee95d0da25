"""Mergeable sketch aggregates — HyperLogLog approximate distinct count.

The scale pattern for distinct counting (SURVEY.md §2.5 notes the reference
has none): one 2^p-register sketch per batch (vectorized numpy), registers
merged by elementwise max in a tiny reduce — the shuffle moves 4 KiB
sketches, never values. Standard HLL estimator with small-range correction
(public Flajolet et al. algorithm).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tbl_ray.codecs.base import (
    binary_parts,
    is_binary_like,
    segment_reduceat,
    is_fixed_primitive,
    primitive_to_numpy,
)
from tbl_ray.stages.exchange import safe_group_by
from tbl_ray.webtable import _mix

_P = 12  # 4096 registers, ~1.6% relative error
_M = 1 << _P


def _value_hashes(col: pa.Array) -> np.ndarray:
    """64-bit content hash per row (vectorized; strings via positional byte
    fold, primitives via splitmix)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = col.drop_null()
    if len(col) == 0:
        return np.zeros(0, dtype=np.uint64)
    if is_binary_like(col.type):
        offsets, data = binary_parts(col)
        lens = np.diff(offsets)
        if len(data) == 0:
            # all-empty batch: match the main path's per-empty-row value
            return _mix(np.full(len(col), 0xABCD, dtype=np.uint64))
        pos = np.arange(len(data), dtype=np.uint64)
        row_start = np.repeat(offsets[:-1].astype(np.uint64), lens)
        with np.errstate(over="ignore"):
            h = _mix(
                data.astype(np.uint64)
                + np.uint64(1)
                + (pos - row_start) * np.uint64(0x9E3779B97F4A7C15)
            )
        out = segment_reduceat(np.bitwise_xor, h, offsets, np.uint64(0))
        out[lens == 0] = np.uint64(0xABCD)
        return _mix(out)
    if is_fixed_primitive(col.type):
        v = primitive_to_numpy(col)
        if v.dtype.kind == "f":
            v = v.view(f"u{v.dtype.itemsize}")
        return _mix(v.astype(np.uint64))
    raise TypeError(f"unhashable column type {col.type}")


def hll_sketch(col: pa.Array) -> np.ndarray:
    """One batch's HLL registers (uint8[4096])."""
    regs = np.zeros(_M, dtype=np.uint8)
    h = _value_hashes(col)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - _P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - _P)) - 1)
    rank = np.empty(len(h), dtype=np.uint8)
    nz = w > 0
    # rank = number of leading zeros in the (64-p)-bit suffix + 1
    rank[nz] = (64 - _P) - np.floor(np.log2(w[nz].astype(np.float64))).astype(
        np.int64
    )
    rank[~nz] = (64 - _P) + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(_M, dtype=np.uint8)
    for s in sketches:
        np.maximum(out, s, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Flajolet et al. estimator with small-range (linear counting) fix."""
    alpha = 0.7213 / (1 + 1.079 / _M)
    est = alpha * _M * _M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * _M and zeros:
        return _M * np.log(_M / zeros)
    return float(est)


def _merge_sketch_batch(t: pa.Table) -> pa.Table:
    regs = hll_merge(
        [np.frombuffer(s.as_py(), dtype=np.uint8) for s in t.column("sketch")]
    )
    return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})


def approx_distinct(ds: "ray.data.Dataset", column: str) -> float:
    """Approximate distinct count of one column (~1.6% error at p=12).

    Tree merge: one 4 KiB sketch per block, then a coalescing
    ``map_batches`` folds 256 sketches per task, so the driver collects
    ~n_blocks/256 sketches instead of one per block (a 100 TB input with
    10^6 blocks would otherwise ship 4 GB of registers to the driver)."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        regs = hll_sketch(t.column(column))
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    sketches = ds.map_batches(
        sketch_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    coalesced = sketches.map_batches(
        _merge_sketch_batch, batch_format="pyarrow", batch_size=256
    )
    parts = coalesced.take_all()
    merged = hll_merge(
        [np.frombuffer(r["sketch"], dtype=np.uint8) for r in parts]
    )
    return hll_estimate(merged)


def approx_distinct_by(
    ds: "ray.data.Dataset", key: str, column: str
) -> "ray.data.Dataset":
    """Per-key approximate distinct count of ``column`` (GROUP BY ``key``).

    Pre-aggregation pattern: each batch emits ONE (key, 4 KiB sketch) row
    per key it contains (vectorized: rows are Arrow-sorted by key inside
    the batch, then one hll_sketch per key slice); the keyed groupby then
    merges sketches — the shuffle moves sketches, never values. Output:
    (key, approx_distinct int64)."""

    def sketch_per_key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {key: pa.array([], t.schema.field(key).type),
                 "sketch": pa.array([], pa.binary())}
            )
        small = t.select([key, column]).sort_by(key)
        keys = small.column(key)
        # slice boundaries per distinct key value inside the batch
        enc = keys.combine_chunks().dictionary_encode()
        idx = np.asarray(enc.indices)
        bounds = np.concatenate(
            ([0], np.nonzero(np.diff(idx))[0] + 1, [len(idx)])
        )
        out_keys, out_sketch = [], []
        col = small.column(column).combine_chunks()
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            out_keys.append(keys[lo].as_py())
            out_sketch.append(hll_sketch(col.slice(lo, hi - lo)).tobytes())
        return pa.table(
            {
                key: pa.array(out_keys, keys.type),
                "sketch": pa.array(out_sketch, pa.binary()),
            }
        )

    def merge_group(t: pa.Table) -> pa.Table:
        regs = hll_merge(
            [np.frombuffer(s.as_py(), dtype=np.uint8) for s in t.column("sketch")]
        )
        return pa.table(
            {
                key: pa.array([t.column(key)[0].as_py()], t.schema.field(key).type),
                "approx_distinct": pa.array(
                    [int(round(hll_estimate(regs)))], pa.int64()
                ),
            }
        )

    partials = ds.map_batches(
        sketch_per_key, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby(key).map_groups(merge_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# approximate quantiles — DDSketch-style log-bucket histogram (mergeable)
# ---------------------------------------------------------------------------
#
# Public algorithm (Masson et al., "DDSketch", VLDB'19): bucket i holds
# values with ceil(log_gamma(x)) == i, gamma = (1+alpha)/(1-alpha), giving
# a relative-error guarantee alpha on every quantile. Buckets are counts —
# trivially mergeable, so the shuffle moves (bucket, count) partials only.


def _dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def _dd_buckets(values: np.ndarray, alpha: float) -> tuple[np.ndarray, np.ndarray]:
    """(bucket_indices, counts) for one batch; index 0 reserved for zeros,
    positive values map to +i, negatives to -i (i >= 1)."""
    g = np.log(_dd_gamma(alpha))
    out_idx: list[np.ndarray] = []
    nz = values != 0
    pos = values > 0
    neg = values < 0
    if pos.any():
        i = np.ceil(np.log(values[pos]) / g).astype(np.int64)
        out_idx.append(np.maximum(i, 1))
    if neg.any():
        i = np.ceil(np.log(-values[neg]) / g).astype(np.int64)
        out_idx.append(-np.maximum(i, 1))
    if (~nz).any():
        out_idx.append(np.zeros(int((~nz).sum()), np.int64))
    allb = np.concatenate(out_idx) if out_idx else np.zeros(0, np.int64)
    uniq, counts = np.unique(allb, return_counts=True)
    return uniq, counts


def _dd_value(bucket: int, alpha: float) -> float:
    if bucket == 0:
        return 0.0
    g = _dd_gamma(alpha)
    mag = 2.0 * (g ** abs(bucket)) / (g + 1.0)  # bucket midpoint
    return mag if bucket > 0 else -mag


def approx_quantiles(
    ds: "ray.data.Dataset",
    column: str,
    qs: list[float] | None = None,
    *,
    alpha: float = 0.01,
) -> pa.Table:
    """Approximate quantiles with relative error ``alpha``.

    Per-batch bucket partials (vectorized log + bincount), keyed sum of
    (bucket, count) rows — the exchange is O(log range / alpha) rows per
    block — and a driver-side walk over the tiny merged histogram."""
    from ray.data.aggregate import Sum

    qs = qs or [0.5, 0.9, 0.99]

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            col = col.drop_null()
        v = primitive_to_numpy(col).astype(np.float64)
        b, c = _dd_buckets(v, alpha)
        return pa.table({"bucket": b, "__c__": c})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("__c__", alias_name="c"))
        .take_all()
    )
    hist = sorted((r["bucket"], r["c"]) for r in merged)
    total = sum(c for _, c in hist)
    out_q, out_v = [], []
    for q in qs:
        target = q * max(total - 1, 0)
        acc = 0
        est = 0.0
        for b, c in hist:
            acc += c
            if acc > target:
                est = _dd_value(b, alpha)
                break
        out_q.append(q)
        out_v.append(est)
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())}
    )


def histogram(
    ds: "ray.data.Dataset",
    column: str,
    lo: float,
    hi: float,
    nbins: int,
) -> "ray.data.Dataset":
    """Fixed-bin histogram: (bucket, n) for ``nbins`` equal bins over
    [lo, hi), out-of-range values clamped into the edge bins, nulls
    ignored, empty buckets absent (SQL GROUP BY semantics).

    The cheapest possible exchange: each block collapses to at most
    ``nbins`` (bucket, partial) rows via one vectorized ``bincount``;
    the merge is a tiny keyed sum (or a local fold under the
    :mod:`tbl_ray.sizing` gate)."""
    if nbins <= 0:
        raise ValueError(f"nbins must be positive, got {nbins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / nbins

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(column).combine_chunks()
        v = np.asarray(col.drop_null(), dtype=np.float64)
        if len(v) == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 "__n__": pa.array([], pa.int64())}
            )
        b = np.clip(np.floor((v - lo) / width).astype(np.int64), 0, nbins - 1)
        counts = np.bincount(b, minlength=nbins)
        nz = np.flatnonzero(counts)
        return pa.table(
            {"bucket": pa.array(nz.astype(np.int64)),
             "__n__": pa.array(counts[nz].astype(np.int64))}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    from ray.data.aggregate import Sum

    from tbl_ray.sizing import fold_partials_local

    merged = fold_partials_local(ds, partials, "bucket", [("__n__", "sum")], ["n"])
    if merged is not None:
        return ray.data.from_arrow(merged.sort_by([("bucket", "ascending")]))
    counts = partials.groupby("bucket").aggregate(Sum("__n__", alias_name="n"))
    return counts.sort("bucket")


def count_distinct_by(
    ds: "ray.data.Dataset",
    key: str,
    column: str,
) -> "ray.data.Dataset":
    """EXACT distinct-value count per key: (key, n_distinct) —
    the precise sibling of :func:`approx_distinct_by` (HLL). Nulls in
    ``column`` don't count (SQL ``count(DISTINCT col)``); a key whose
    values are all null still appears with 0.

    Scale shape: each block first collapses to its distinct
    (key, value) pairs (Arrow group_by — no rows leave the block twice),
    the pair set dedups globally on ONE keyed exchange, and the final
    per-key count folds pre-aggregated partials. Exact distinct
    inherently moves the distinct pairs; when |distinct| ~ |rows|, use
    the HLL sibling instead."""

    def pairs(t: pa.Table) -> pa.Table:
        return safe_group_by(t.select([key, column]), [key, column])

    p = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)

    from tbl_ray.sizing import collect_local, fits_local

    t = collect_local(p) if fits_local(ds) else None
    if t is not None:
        d = safe_group_by(t, [key, column])
        out = (
            d.group_by(key)
            .aggregate([(column, "count")])
            .rename_columns([key, "n_distinct"])
        )
        return ray.data.from_arrow(out)

    # one null-key-safe bucket exchange on `key`; each bucket holds every
    # pair for its keys, so dedup + per-key count are local Arrow kernels
    # (no per-group Python re-entry, no raw-key range sort)
    from tbl_ray.stages.exchange import bucket_exchange

    def per_bucket(t2: pa.Table) -> pa.Table:
        d = safe_group_by(t2, [key, column])
        return (
            d.group_by(key)
            .aggregate([(column, "count")])
            .rename_columns([key, "n_distinct"])
        )

    return bucket_exchange(p, [key], per_bucket)
