"""SQL window functions over keyed, ordered data.

The reference engine has no window functions (SURVEY.md §2.9 — it is a
file-transform CLI); these extend the engine with the per-key ordered
analytics a training-data pipeline needs (event ordinals, previous-value
deltas, running totals, sliding time-range rates).

Execution shape: ONE hash shuffle on the partition key
(``groupby(key).map_groups``), then a fully vectorized per-group pass
(``np.lexsort`` + ``cumsum`` / ``searchsorted``). No global sort — the
SQL ``ORDER BY`` inside the window is established independently per key
group, so the exchange cost is the same as any keyed aggregate.
Assumption (documented per the custom-operator contract): one key group
fits in a worker's heap. For Zipf-skewed keys, salt the key first with
:func:`tbl_ray.stages.partition.partition_by_key`'s hash-bucket route.

Oracles: DuckDB ``row_number()/lag()/sum() OVER (PARTITION BY .. ORDER
BY .. ROWS ..)`` and ``RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT
ROW`` — value-exact when the value column is integral (the query layer
floors doubles to int64 first so the running sums are exact, not
float-order-dependent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tbl_ray.functions.windows import _parse_window


def _sort_indices(t: pa.Table, order_cols: list[str]) -> np.ndarray:
    """Stable ascending lexsort indices over ``order_cols`` (first column
    is the primary sort key). Timestamps sort by their int64 epoch."""
    arrs = []
    for c in reversed(order_cols):  # np.lexsort: LAST key is primary
        col = t.column(c)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.int64())
        arrs.append(col.to_numpy(zero_copy_only=False))
    return np.lexsort(arrs)


def window_functions(
    ds: "ray.data.Dataset",
    *,
    key_col: str,
    order_cols: list[str],
    value_col: str,
) -> "ray.data.Dataset":
    """Per-key ordered window functions: appends

    - ``rn`` — ``row_number() OVER (PARTITION BY key ORDER BY order_cols)``
      (int64, 1-based; make ``order_cols`` a total order per key or the
      tie ranks are engine-defined, exactly as in SQL);
    - ``lag_<value_col>`` — previous row's value within the key (null for
      the first row, and wherever the previous value is null);
    - ``cum_<value_col>`` — running ``sum(value) ROWS UNBOUNDED PRECEDING``.
      Nulls are skipped (SQL semantics: the running sum is null until the
      first non-null value, then carries over null rows).

    Rows come back grouped by key and ordered within the key; the global
    inter-key order is engine-defined (same as SQL without an outer
    ORDER BY).
    """

    def per_key(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        t = t.take(_sort_indices(t, order_cols))
        n = t.num_rows
        vals = t.column(value_col).combine_chunks()
        if isinstance(vals, pa.ChunkedArray):  # pyarrow version drift
            vals = (
                vals.chunk(0) if vals.num_chunks
                else pa.array([], vals.type)
            )
        rn = pa.array(np.arange(1, n + 1, dtype=np.int64), pa.int64())
        lag = pa.concat_arrays([pa.nulls(1, vals.type), vals])[:n]
        valid = np.asarray(pc.is_valid(vals))
        v = np.where(valid, vals.to_numpy(zero_copy_only=False), 0)
        cum = np.cumsum(v)
        # null until the first non-null value (SQL: sum of an all-null
        # prefix is NULL, not 0)
        seen = np.cumsum(valid.astype(np.int64)) > 0
        cum_arr = pa.array(cum, type=vals.type, mask=~seen)
        return (
            t.append_column("rn", rn)
            .append_column(f"lag_{value_col}", lag)
            .append_column(f"cum_{value_col}", cum_arr)
        )

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def rolling_range_agg(
    ds: "ray.data.Dataset",
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    window: str | int = "1h",
) -> "ray.data.Dataset":
    """Sliding time-range aggregate per key: for every row, the count and
    sum of ``value_col`` over rows of the same key with
    ``ts in [row.ts - window, row.ts]`` — SQL ``RANGE BETWEEN INTERVAL w
    PRECEDING AND CURRENT ROW`` (peer rows with an equal timestamp are
    all included, per RANGE frame semantics).

    Vectorized two-pointer per group: sort by ts once, then the frame
    bounds for ALL rows are two ``np.searchsorted`` calls and the sums
    are exclusive-prefix-sum differences — O(n log n) per group, no
    per-row Python. ``value_col`` must be integral and non-null so the
    prefix-sum subtraction is exact (the query layer floors doubles
    first); appends ``n_w`` (int64) and ``sum_w`` (same integral type).
    """
    size_us = _parse_window(window)

    def per_key(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        ts_sorted = _sort_indices(t, [ts_col])
        t = t.take(ts_sorted)
        ts = pc.cast(t.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        left = np.searchsorted(ts, ts - size_us, side="left")
        right = np.searchsorted(ts, ts, side="right")
        csum = np.concatenate(([0], np.cumsum(v.astype(np.int64))))
        return t.append_column(
            "n_w", pa.array(right - left, pa.int64())
        ).append_column(
            "sum_w", pa.array(csum[right] - csum[left], pa.int64())
        )

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")
