"""SQL window functions over keyed, ordered data.

The reference engine has no window functions (SURVEY.md §2.9 — it is a
file-transform CLI); these extend the engine with the per-key ordered
analytics a training-data pipeline needs (event ordinals, previous-value
deltas, running totals, sliding time-range rates).

Execution shape: ONE exchange on ``hash(key) % n_buckets`` (so Ray moves
blocks by a small-int column — never range-sorts the raw key, which it
cannot even do for null keys), then a fully **segment-vectorized** pass
per bucket: one lexsort brings each key's rows together in order, and
row numbers / lags / running sums / frame bounds for EVERY key in the
bucket come out of numpy prefix-sum and searchsorted identities over the
segment boundaries. No per-key Python call anywhere — Ray's
``groupby(key).map_groups`` re-enters Python once per distinct key
(measured: tens of thousands of calls on a 15k-key table), while this
shape does a constant number of vector ops per bucket.

Assumption (documented per the custom-operator contract): one bucket
(~1/n_buckets of the keyed data) fits in a worker's heap — raise
``n_buckets`` with the cluster so bucket size stays bounded.

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

from tbl_ray.functions.joins import _KeyBucket
from tbl_ray.functions.windows import _parse_window


def _order_arrays(t: pa.Table, order_cols: list[str]) -> list[np.ndarray]:
    arrs = []
    for c in order_cols:
        col = t.column(c)
        if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
            col = pc.cast(col, pa.int64())
        arrs.append(col.to_numpy(zero_copy_only=False))
    return arrs


def _key_codes(t: pa.Table, key_col: str) -> np.ndarray:
    """Group codes for the key column (grouping only — code order is
    meaningless). Null keys code as -1: one segment of their own, which
    is exactly SQL's PARTITION BY null behavior."""
    key = t.column(key_col).combine_chunks()
    if isinstance(key, pa.ChunkedArray):
        key = (
            key.chunk(0) if key.num_chunks else pa.array([], key.type)
        )
    d = key.dictionary_encode()
    return (
        pc.fill_null(pc.cast(d.indices, pa.int64()), -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def _segments(codes_sorted: np.ndarray):
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


def window_functions(
    ds: "ray.data.Dataset",
    *,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    n_buckets: int = 64,
    ntile: int | None = None,
) -> "ray.data.Dataset":
    """Per-key ordered window functions: appends

    - ``rn`` — ``row_number() OVER (PARTITION BY key ORDER BY order_cols)``
      (int64, 1-based; make ``order_cols`` a total order per key or the
      tie ranks are engine-defined, exactly as in SQL);
    - ``lag_<value_col>`` — previous row's value within the key (null for
      the first row, and wherever the previous value is null);
    - ``cum_<value_col>`` — running ``sum(value) ROWS UNBOUNDED PRECEDING``.
      Nulls are skipped (SQL semantics: the running sum is null until the
      first non-null value, then carries over null rows);
    - ``lead_<value_col>`` — next row's value within the key (null for the
      last row);
    - ``first_<value_col>`` — ``first_value(value)`` over the default
      frame (the partition's first row in order, null if that value is);
    - ``pr`` — ``percent_rank()``: ``(rank - 1) / (rows - 1)`` (RANK, so
      peers share the value), 0.0 for single-row partitions, float64
      with the same IEEE division DuckDB computes;
    - ``nt`` (only when ``ntile`` is set) — ``ntile(k)``: 1-based tile,
      first ``rows % k`` tiles one row larger (SQL convention).

    Rows come back grouped by key and ordered within the key; the global
    inter-key order is engine-defined (same as SQL without an outer
    ORDER BY).
    """

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__bucket__"]).combine_chunks()
        codes = _key_codes(t, key_col)
        order = _order_arrays(t, order_cols)
        # lexsort: LAST key is primary -> (order cols reversed, codes)
        idx = np.lexsort(tuple(reversed(order)) + (codes,))
        t = t.take(idx)
        codes = codes[idx]
        n = t.num_rows
        starts, lens, rep = _segments(codes)

        rn = np.arange(n, dtype=np.int64) - rep + 1

        vals = t.column(value_col).combine_chunks()
        if isinstance(vals, pa.ChunkedArray):
            vals = (
                vals.chunk(0) if vals.num_chunks
                else pa.array([], vals.type)
            )
        lag = pa.concat_arrays([pa.nulls(1, vals.type), vals])[:n]
        lead = pa.concat_arrays([vals, pa.nulls(1, vals.type)])[1:]
        if len(starts):
            first_row = np.zeros(n, dtype=bool)
            first_row[starts] = True
            lag = pc.if_else(
                pa.array(first_row), pa.scalar(None, vals.type), lag
            )
            last_row = np.zeros(n, dtype=bool)
            last_row[starts + lens - 1] = True
            lead = pc.if_else(
                pa.array(last_row), pa.scalar(None, vals.type), lead
            )
        first_val = vals.take(pa.array(rep, pa.int64()))

        valid = np.asarray(pc.is_valid(vals))
        # fill nulls ARROW-side so an int64 column stays int64 — a numpy
        # null-to-NaN conversion would run the cumsum in float64 and
        # silently round values above 2^53
        v = pc.fill_null(vals, 0).to_numpy(zero_copy_only=False)
        c = np.cumsum(v)
        base = (c - v)[starts]  # exclusive prefix at each segment start
        cum = c - np.repeat(base, lens)
        nv = np.cumsum(valid.astype(np.int64))
        nv_base = (nv - valid)[starts]
        seen = (nv - np.repeat(nv_base, lens)) > 0
        cum_arr = pa.array(cum, type=vals.type, mask=~seen)

        # percent_rank uses RANK (peers share a value), not row_number:
        # SQL ties must get identical pr no matter how the engine breaks
        # the sort. A peer run starts where the segment starts or any
        # order column changes.
        order_sorted = [a[idx] for a in order]
        peer_flags = np.zeros(n, dtype=bool)
        if n:
            peer_flags[starts] = True
            for a in order_sorted:
                peer_flags[1:] |= a[1:] != a[:-1]
        peer_starts = np.flatnonzero(peer_flags)
        peer_lens = np.diff(np.append(peer_starts, n))
        rank = np.repeat(peer_starts, peer_lens) - rep + 1
        seg_len = np.repeat(lens, lens)
        pr = np.where(
            seg_len > 1, (rank - 1) / np.maximum(seg_len - 1, 1), 0.0
        )

        out = (
            t.append_column("rn", pa.array(rn))
            .append_column(f"lag_{value_col}", lag)
            .append_column(f"cum_{value_col}", cum_arr)
            .append_column(f"lead_{value_col}", lead)
            .append_column(f"first_{value_col}", first_val)
            .append_column("pr", pa.array(pr, pa.float64()))
        )
        if ntile is not None:
            j = rn - 1
            qq = seg_len // ntile
            rr = seg_len % ntile
            cut = rr * (qq + 1)  # rows covered by the larger tiles
            nt = (
                np.where(
                    j < cut,
                    j // (qq + 1),
                    rr + (j - cut) // np.maximum(qq, 1),
                )
                + 1
            )
            out = out.append_column("nt", pa.array(nt, pa.int64()))
        return out

    bucketed = ds.map_batches(
        _KeyBucket([key_col], n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return bucketed.groupby("__bucket__").map_groups(
        per_bucket, batch_format="pyarrow"
    )


def rolling_range_agg(
    ds: "ray.data.Dataset",
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    window: str | int = "1h",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Sliding time-range aggregate per key: for every row, the count and
    sum of ``value_col`` over rows of the same key with
    ``ts in [row.ts - window, row.ts]`` — SQL ``RANGE BETWEEN INTERVAL w
    PRECEDING AND CURRENT ROW`` (peer rows with an equal timestamp are
    all included, per RANGE frame semantics).

    Vectorized two-pointer over the whole bucket: rows sort by
    (key, ts); each key segment's timestamps are then offset by
    ``segment_id * stride`` with ``stride > bucket ts-range + window``,
    which makes the offset axis globally sorted AND guarantees no frame
    crosses a key boundary — so the frame bounds for every row of every
    key are two ``np.searchsorted`` calls, and the sums are
    exclusive-prefix differences. Falls back to a per-segment loop only
    if the offset would overflow int64 (astronomically wide ts ranges).
    ``value_col`` must be integral and non-null so the prefix-sum
    subtraction is exact (the query layer floors doubles first); appends
    ``n_w`` (int64) and ``sum_w`` (int64).
    """
    size_us = _parse_window(window)

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__bucket__"]).combine_chunks()
        codes = _key_codes(t, key_col)
        ts_col_arr = t.column(ts_col)
        if ts_col_arr.null_count:
            # a null ts would become INT64_MIN below and silently corrupt
            # every frame bound in the bucket — refuse loudly instead
            raise ValueError(
                f"rolling_range_agg: {ts_col!r} contains nulls; filter "
                "them first (a null timestamp has no RANGE frame)"
            )
        ts = (
            pc.cast(ts_col_arr, pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        idx = np.lexsort((ts, codes))
        t = t.take(idx)
        codes, ts = codes[idx], ts[idx]
        n = t.num_rows
        starts, lens, rep = _segments(codes)
        seg_id = np.repeat(
            np.arange(len(starts), dtype=np.int64), lens
        )
        v = (
            t.column(value_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        csum = np.concatenate(([0], np.cumsum(v)))

        span = int(ts.max() - ts.min()) if n else 0
        stride = span + size_us + 1
        if n and len(starts) * stride < (1 << 62):
            adj = ts + seg_id * stride
            left = np.searchsorted(adj, adj - size_us, side="left")
            right = np.searchsorted(adj, adj, side="right")
        else:  # overflow guard: per-segment two-pointer
            left = np.empty(n, dtype=np.int64)
            right = np.empty(n, dtype=np.int64)
            for s, ln in zip(starts, lens):
                seg = ts[s : s + ln]
                left[s : s + ln] = s + np.searchsorted(
                    seg, seg - size_us, side="left"
                )
                right[s : s + ln] = s + np.searchsorted(
                    seg, seg, side="right"
                )
        return t.append_column(
            "n_w", pa.array(right - left, pa.int64())
        ).append_column(
            "sum_w", pa.array(csum[right] - csum[left], pa.int64())
        )

    bucketed = ds.map_batches(
        _KeyBucket([key_col], n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return bucketed.groupby("__bucket__").map_groups(
        per_bucket, batch_format="pyarrow"
    )
