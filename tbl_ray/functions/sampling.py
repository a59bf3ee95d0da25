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
    within each ``key`` group (hash shuffle on the key, vectorized select
    inside each group). SQL-oracle shape:
    ``row_number() OVER (PARTITION BY key ORDER BY sk, id) <= n``."""

    def per_group(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        sk = _sample_key(ids, seed)
        order = np.lexsort((ids, sk))[:n_per_key]
        return t.take(np.sort(order))

    return ds.groupby(key).map_groups(per_group, batch_format="pyarrow")
