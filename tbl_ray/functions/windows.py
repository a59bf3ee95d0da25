"""Windowed aggregates over event streams (batch windows, no watermarks).

The reference has no streaming concepts (SURVEY.md §2.9); these extend the
engine for event-log processing the way Ray Data expresses it: a tumbling
window is just a computed window-start key, and the aggregate uses the
**pre-aggregation pattern** — partial aggregates per batch inside
``map_batches`` (vectorized Arrow group_by), then a tiny keyed shuffle to
merge partials — so the all-to-all exchange moves one row per
(key, window) per block, never the events themselves.

Oracle: ``GROUP BY key, epoch_us(ts) // size`` is exactly expressible in
SQL, so the driver verifies this operator value-by-value.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tbl_ray.stages.exchange import safe_group_by


def _window_start(ts: pa.ChunkedArray | pa.Array, size_us: int) -> pa.Array:
    """Tumbling-window start (µs since epoch, floored to the window).

    Floor division, not Arrow's truncate-toward-zero ``divide``: pre-epoch
    (negative) timestamps must fall into the window *below* them to match
    the ``// size`` SQL oracle."""
    micros = pc.cast(ts, pa.int64())
    # rem = micros % size with C truncation semantics; shift negative
    # remainders up by one window so the result is a true floor
    rem = pc.subtract(micros, pc.multiply(pc.divide(micros, size_us), size_us))
    rem = pc.if_else(pc.less(rem, 0), pc.add(rem, size_us), rem)
    return pc.subtract(micros, rem)


class _PartialWindowAgg:
    """Per-batch partials: (key, window) -> count/sum/min/max of value."""

    def __init__(self, ts_col: str, key_col: str, value_col: str, size_us: int):
        self.ts_col, self.key_col = ts_col, key_col
        self.value_col, self.size_us = value_col, size_us

    def __call__(self, t: pa.Table) -> pa.Table:
        win = _window_start(t.column(self.ts_col), self.size_us)
        small = pa.table(
            {
                self.key_col: t.column(self.key_col),
                "window_start": win,
                self.value_col: t.column(self.value_col),
            }
        )
        part = safe_group_by(
            small,
            [self.key_col, "window_start"],
            [
                (self.value_col, "count"),
                (self.value_col, "sum"),
                (self.value_col, "min"),
                (self.value_col, "max"),
            ]
        )
        return part.rename_columns(
            [self.key_col, "window_start", "__n", "__sum", "__min", "__max"]
        )


def tumbling_window(
    ds: "ray.data.Dataset",
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str | int = "1h",
) -> "ray.data.Dataset":
    """Tumbling-window aggregate: (key, window_start µs) ->
    n_events, sum_value, min_value, max_value.

    ``window`` is microseconds or a shorthand like ``"15m"``/``"1h"``/``"1d"``.
    """
    from tbl_ray.stages.exchange import bucket_exchange

    size_us = _parse_window(window)
    partials = ds.map_batches(
        _PartialWindowAgg(ts_col, key_col, value_col, size_us),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # merge partials through the hash-bucket exchange: null-safe for the
    # key and O(sort of a 64-value int column), not a range-sort of every
    # (key, window) pair — at 100 TB the pair cardinality is |keys| x
    # |windows| and would dominate the merge
    def per_bucket(t: pa.Table) -> pa.Table:
        mt = safe_group_by(
            t,
            [key_col, "window_start"],
            [
                ("__n", "sum"),
                ("__sum", "sum"),
                ("__min", "min"),
                ("__max", "max"),
            ]
        )
        return mt.rename_columns(
            [key_col, "window_start", "n_events", "sum_value",
             "min_value", "max_value"]
        )

    return bucket_exchange(partials, [key_col, "window_start"], per_bucket)


def session_counts(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str | int = "30m",
) -> "ray.data.Dataset":
    """Per-key session count: events sorted by time within a key belong to
    one session while consecutive gaps stay <= ``gap``.

    Execution: one exchange on ``hash(key) % 64`` coarse buckets, then a
    single lexsort per bucket and one vectorized gap-count over ALL keys
    at once (``reduceat`` across segment boundaries) — the per-key time
    order is established inside the bucket, so no global sort and no
    per-key Python (the old ``map_groups`` shape re-entered Python once
    per distinct key). Null keys form their own group."""
    import numpy as np

    from tbl_ray.stages.exchange import bucket_exchange, key_codes, segments, single_array

    gap_us = _parse_window(gap)

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        codes = key_codes(t, key_col)
        ts_arr = t.column(ts_col)
        if ts_arr.null_count:
            # a null ts would become INT64_MIN below (NaN round-trip) and
            # fabricate a phantom session gap — refuse loudly
            raise ValueError(
                f"session_counts: {ts_col!r} contains nulls; filter them "
                "first (a null timestamp belongs to no session)"
            )
        ts = (
            pc.cast(ts_arr, pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        idx = np.lexsort((ts, codes))
        codes, ts = codes[idx], ts[idx]
        m = len(codes)
        starts, lens, rep = segments(codes)
        flags = np.zeros(m, dtype=bool)
        if m:
            flags[starts] = True
        # row i (i>0) starts a NEW session iff it stays in its segment
        # and the gap from the previous event exceeds the threshold
        new_sess = np.zeros(m, dtype=np.int64)
        if m > 1:
            new_sess[1:] = (
                (~flags[1:]) & ((ts[1:] - ts[:-1]) > gap_us)
            ).astype(np.int64)
        n_sessions = (
            np.add.reduceat(new_sess, starts) + 1
            if len(starts)
            else np.array([], dtype=np.int64)
        )
        kcol = single_array(t.column(key_col))
        return pa.table(
            {
                key_col: kcol.take(pa.array(idx[starts], pa.int64())),
                "n_sessions": pa.array(n_sessions, pa.int64()),
                "n_events": pa.array(lens, pa.int64()),
            }
        )

    return bucket_exchange(ds, [key_col], per_bucket)


def _parse_window(window: str | int) -> int:
    if isinstance(window, int):
        return window
    units = {"s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000,
             "d": 86_400_000_000}
    return int(window[:-1]) * units[window[-1]]
