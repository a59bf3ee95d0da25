"""Deterministic distributed sampling — uniform and stratified.

Training-data pipelines need reproducible samples ("same 1M docs every
run"). Randomness here is a pure function of (seed, id): each row gets the
Knuth multiplicative hash ``((id + seed) * 2654435761) mod 2^32`` (seed
INSIDE the multiply — an additive-outside seed would only shift every key
by a constant and leave the ranking unchanged) and the sample is the n
smallest keys — computed with the shuffle-free
:func:`tbl_ray.stages.slicing.topk` (per-block select_k, no global sort),
so the exchange moves at most n rows per block. The key is deliberately
SQL-expressible (DuckDB: ``((id + seed) * 2654435761) % 4294967296``,
BIGINT-safe for ids < ~2^31) so the driver oracle checks the exact same
sample.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tbl_ray.stages.slicing import topk

_KNUTH = 2654435761  # 2^32 / golden ratio, odd


def _sample_key(ids: np.ndarray, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (
            (ids.astype(np.uint64) + np.uint64(seed)) * np.uint64(_KNUTH)
        ) % np.uint64(1 << 32)


def _with_sample_key(
    ds: "ray.data.Dataset", id_col: str, seed: int
) -> "ray.data.Dataset":
    """Append the ``__sk__`` sample-key column (shared by every sampler
    and shuffle here — their relative orders must agree exactly)."""

    def add_key(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        return t.append_column(
            "__sk__", pa.array(_sample_key(ids, seed).astype(np.int64))
        )

    return ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)


def sample_uniform(
    ds: "ray.data.Dataset",
    n: int,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
) -> "ray.data.Dataset":
    """Exactly-n deterministic uniform sample (the n smallest sample keys).

    Output carries the original columns (key column dropped); the sample
    is identical across runs, cluster sizes, and block layouts."""

    keyed = _with_sample_key(ds, id_col, seed)
    picked = topk(keyed, ["__sk__", id_col], n)

    def strip(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__sk__"])

    return picked.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_deterministic(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    seed: int = 0,
) -> "ray.data.Dataset":
    """Seeded pseudo-random global order: sort by (sample key, id).

    The reproducible corpus shuffle before training: the order is a pure
    function of (seed, id) — identical across runs, cluster sizes, and
    block layouts, unlike ``ds.random_shuffle()``. Costs one distributed
    range-partition sort (inherent: a global shuffle must move every
    row). Different epochs = different seeds."""

    keyed = _with_sample_key(ds, id_col, seed)

    def strip(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__sk__"])

    return keyed.sort(["__sk__", id_col]).map_batches(
        strip, batch_format="pyarrow", zero_copy_batch=True
    )


def shuffle_head(
    ds: "ray.data.Dataset",
    n: int,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
) -> "ray.data.Dataset":
    """First ``n`` rows of :func:`shuffle_deterministic`'s order, with an
    explicit ``pos`` column (0-based rank) — shuffle-free via the same
    per-block top-k as :func:`sample_uniform`, then positions assigned in
    the single collapsed block. ``pos`` makes the order itself
    oracle-checkable (SQL: ``row_number() OVER (ORDER BY sk, id) - 1``)."""

    keyed = _with_sample_key(ds, id_col, seed)
    picked = topk(keyed, ["__sk__", id_col], n)

    def number(t: pa.Table) -> pa.Table:
        # topk's final stage emits ONE sorted block; rank = row index
        t = t.append_column("pos", pa.array(np.arange(t.num_rows, dtype=np.int64)))
        return t.drop_columns(["__sk__"])

    return picked.map_batches(
        number, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def sample_stratified(
    ds: "ray.data.Dataset",
    key: str,
    n_per_key: int,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
) -> "ray.data.Dataset":
    """Deterministic per-key sample: the ``n_per_key`` smallest sample keys
    within each ``key`` group. SQL-oracle shape:
    ``row_number() OVER (PARTITION BY key ORDER BY sk, id) <= n``.

    One exchange on ``hash(key) % 64`` coarse buckets (null keys form a
    group; Ray's raw key groupby cannot sort nulls), one lexsort per
    bucket over (key group, sample key, id), one vectorized
    rank-within-segment mask — no per-key Python."""
    from tbl_ray.stages.exchange import bucket_exchange, key_codes, segments

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        codes = key_codes(t, key)
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        sk = _sample_key(ids, seed)
        idx = np.lexsort((ids, sk, codes))
        starts, lens, rep = segments(codes[idx])
        rn = np.arange(len(codes), dtype=np.int64) - rep
        return t.take(pa.array(idx[rn < n_per_key], pa.int64()))

    return bucket_exchange(ds, [key], per_bucket)


def split_assign(
    ds: "ray.data.Dataset",
    fractions: dict[str, float],
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    out_col: str = "split",
) -> "ray.data.Dataset":
    """Deterministic train/val/test assignment: appends ``out_col`` with
    the label whose cumulative-fraction band the row's sample key falls
    in. Pure function of (seed, id) — a row keeps its split across runs,
    cluster sizes, re-partitions, and even re-processing of a subset,
    which is what makes held-out sets trustworthy at corpus scale.

    ``fractions`` is ordered (insertion order defines the bands); they
    must sum to ~1 and the last band absorbs float remainder (threshold
    pinned to 2^32). Band edges are exact integers, so the SQL mirror is
    a CASE over ``((id + seed) * 2654435761) % 4294967296``.
    """
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to ~1 (got {total})")
    labels = list(fractions)
    cums, acc = [], 0.0
    for lbl in labels:
        acc += fractions[lbl]
        cums.append(int(acc * (1 << 32)))
    cums[-1] = 1 << 32  # absorb float remainder: every key gets a label
    thresholds = np.array(cums, dtype=np.int64)
    label_arr = pa.array(labels, pa.string())

    def assign(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        sk = _sample_key(ids, seed).astype(np.int64)
        band = np.searchsorted(thresholds, sk, side="right")
        return t.append_column(
            out_col, label_arr.take(pa.array(band, pa.int64()))
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def sample_weighted(
    ds: "ray.data.Dataset",
    cat_col: str,
    rates: dict[str, float],
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> "ray.data.Dataset":
    """Per-category Bernoulli downsampling — the data-mixing primitive
    (keep 100% of books, 10% of common-crawl, ...). A row is kept iff
    its sample key < ``rate[category] * 2^32``; like every sampler here
    the decision is a pure function of (seed, id), so mixtures are
    reproducible and re-runnable per shard. Unlisted categories keep
    with ``default_rate`` (0 = drop).

    One vectorized pass per batch: batch-unique categories map to
    integer thresholds via dictionary encode, then a single compare —
    no shuffle, no per-row Python. SQL mirror: CASE over the same exact
    integer thresholds.
    """
    thr = {c: int(r * (1 << 32)) for c, r in rates.items()}
    dflt = int(default_rate * (1 << 32))

    def keep(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        sk = _sample_key(ids, seed).astype(np.int64)
        cat = t.column(cat_col).combine_chunks()
        if isinstance(cat, pa.ChunkedArray):
            cat = (
                cat.chunk(0) if cat.num_chunks
                else pa.array([], cat.type)
            )
        d = cat.dictionary_encode()
        uniq = d.dictionary.to_pylist()  # batch-unique categories only
        lut = np.array([thr.get(u, dflt) for u in uniq], dtype=np.int64)
        codes = np.asarray(
            pc.fill_null(pc.cast(d.indices, pa.int64()), -1)
        )
        # null categories code as -1; lut[codes] still evaluates both
        # np.where branches, so guard the empty-dictionary batch
        if len(lut):
            row_thr = np.where(codes >= 0, lut[codes], dflt)
        else:
            row_thr = np.full(len(codes), dflt, dtype=np.int64)
        return t.filter(pa.array(sk < row_thr))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
