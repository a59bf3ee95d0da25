"""Ordered row-slice semantics (``--head`` / ``--tail`` / ``--offset``).

The reference slices the multi-file stream in file-concatenation order
*before* any sort (crates/tbl-cli/src/transform.rs:588-607; order fixed at
transform.rs:5-24): ``offset`` = ``slice(n, MAX)``, ``head`` = ``slice(0, n)``,
``tail`` = last n rows.

Ray Data mapping and scale notes:
- ``head`` -> ``ds.limit(n)`` under ``preserve_order`` — streaming, early-stops
  the read; only ~n rows ever materialize.
- ``offset [+ head]`` -> ``ds.limit(offset + head)`` then
  ``split_at_indices([offset])[1]`` — materializes only the window, never the
  full dataset, provided ``head`` is given. A bare ``offset`` (rare) has no
  upper bound and must materialize the remainder.
- ``tail`` -> needs the total row count (one counting pass; free from parquet
  footers when no filter precedes — see
  :func:`tbl_ray.sources.parquet.file_slice_plan` for the metadata-pushdown
  fast path used by the pipeline planner), then ``split_at_indices``.

These semantics are inherently ordered; we flip
``DataContext.execution_options.preserve_order`` on for the slicing run.
"""

from __future__ import annotations

import ray.data
from ray.data import DataContext


def _ensure_ordered() -> None:
    DataContext.get_current().execution_options.preserve_order = True


def ordered_slice(
    ds: "ray.data.Dataset",
    *,
    offset: int | None = None,
    head: int | None = None,
    tail: int | None = None,
) -> "ray.data.Dataset":
    """Apply offset -> head -> tail in the reference's order."""
    _ensure_ordered()

    start = offset or 0
    if head is not None:
        # window [start, start + head): bound the stream first so only the
        # window is ever materialized.
        ds = ds.limit(start + head)
        if start > 0:
            ds = ds.split_at_indices([start])[1]
    elif start > 0:
        ds = ds.split_at_indices([start])[1]

    if tail is not None:
        n = ds.count()
        cut = max(n - tail, 0)
        if cut > 0:
            ds = ds.split_at_indices([cut])[1]
    return ds


def topk(
    ds: "ray.data.Dataset",
    cols: list[str],
    k: int,
    *,
    descending: list[bool] | bool = False,
) -> "ray.data.Dataset":
    """Top-k by sort keys WITHOUT a global range-partition sort.

    ``ds.sort(...).limit(k)`` range-partition-shuffles every block to get k
    rows; here each block keeps only its own k best
    (``pyarrow.compute.select_k_unstable``, O(n log k) per block, no
    exchange), the surviving <= k x n_blocks rows collapse into one block
    (``repartition(1)`` of a tiny set), and a local Arrow sort emits the
    final k — no distributed sort machinery at all (its fixed sample +
    range-partition cost exceeds the whole job for k << n).

    Ties beyond the sort keys are resolved arbitrarily (the keys should
    form a total order for deterministic output, same as any sort+limit).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(descending, bool):
        descending = [descending] * len(cols)
    sort_keys = [
        (c, "descending" if d else "ascending")
        for c, d in zip(cols, descending)
    ]

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.select_k_unstable(t, k=k, sort_keys=sort_keys)
        return t.take(idx)

    def final(t: pa.Table) -> pa.Table:
        return t.sort_by(sort_keys).slice(0, k)

    partials = ds.map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.repartition(1).map_batches(
        final, batch_format="pyarrow", zero_copy_batch=True
    )


def grouped_topn(
    ds: "ray.data.Dataset",
    key: str,
    cols: list[str],
    n: int,
    *,
    descending: list[bool] | bool = False,
) -> "ray.data.Dataset":
    """Top-n rows per ``key`` group by the sort columns (SQL:
    ``row_number() OVER (PARTITION BY key ORDER BY ...) <= n``).

    One exchange on ``hash(key) % 64`` coarse buckets (null-key groups
    work; Ray's raw key groupby cannot sort nulls), then a single Arrow
    sort per bucket — (key, sort cols) — and one vectorized
    rank-within-segment mask keeps each key's n best. No per-key Python:
    the old ``map_groups(per_group)`` re-entered Python once per
    distinct key. The sort keys should extend to a total order for
    deterministic output."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from tbl_ray.stages.exchange import bucket_exchange, key_codes, segments

    if isinstance(descending, bool):
        descending = [descending] * len(cols)
    sort_keys = [
        (c, "descending" if d else "ascending")
        for c, d in zip(cols, descending)
    ]

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        idx = pc.sort_indices(
            t, sort_keys=[(key, "ascending")] + sort_keys
        )
        t = t.take(idx)
        codes = key_codes(t, key)  # sorted by key -> runs are contiguous
        starts, lens, rep = segments(codes)
        rn = np.arange(len(codes), dtype=np.int64) - rep
        return t.filter(pa.array(rn < n))

    return bucket_exchange(ds, [key], per_bucket)
