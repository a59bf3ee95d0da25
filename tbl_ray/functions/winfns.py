"""SQL window functions over keyed, ordered data.

The reference engine has no window functions (SURVEY.md §2.9 — it is a
file-transform CLI); these extend the engine with the per-key ordered
analytics a training-data pipeline needs (event ordinals, previous-value
deltas, running totals, sliding time-range rates).

Execution shape: ONE :func:`tbl_ray.stages.exchange.bucket_exchange`
(hash-bucket co-partitioning — see that module for why Ray's raw-key
groupby is both slower and null-intolerant), then a fully
**segment-vectorized** pass per bucket: one lexsort brings each key's
rows together in order, and row numbers / lags / running sums / frame
bounds for EVERY key in the bucket come out of numpy prefix-sum and
searchsorted identities over the segment boundaries. No per-key Python
call anywhere.

Assumption (documented per the custom-operator contract): one bucket
(~1/n_buckets of the keyed data) fits in a worker's heap. The default
``n_buckets=None`` ENFORCES this by auto-sizing from the input's
estimated bytes (``stages.exchange.auto_buckets``: ceil(bytes / 256 MiB
budget), floor 64) — pass an explicit count only to override.

Oracles: DuckDB ``row_number()/lag()/lead()/first_value()/
percent_rank()/ntile()/sum() OVER (PARTITION BY .. ORDER BY .. ROWS ..)``
and ``RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT ROW`` —
value-exact when the value column is integral (the query layer floors
doubles to int64 first so the running sums are exact, not
float-order-dependent). Known divergence: two *valid* float NaN order
values rank as distinct peers here (NaN != NaN), where SQL treats them
as equal — null order values are handled exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tbl_ray.functions.windows import _parse_window
from tbl_ray.stages.exchange import (
    bucket_exchange,
    key_codes,
    order_pairs as _order_pairs,
    order_sort_keys as _order_sort_keys,
    segments,
    single_array,
)


def _peer_flags(
    pairs, idx: np.ndarray, seg_flags: np.ndarray
) -> np.ndarray:
    """True where a new peer run starts: at segment starts, and wherever
    any order column changes. Two nulls are EQUAL peers (SQL); a float
    NaN-vs-NaN comparison would split them, so nullity is compared
    separately from values."""
    n = len(idx)
    flags = seg_flags.copy()
    for vals, isnull in pairs:
        v, nu = vals[idx], isnull[idx]
        if n > 1:
            both_valid = ~nu[1:] & ~nu[:-1]
            flags[1:] |= (nu[1:] != nu[:-1]) | (
                both_valid & (v[1:] != v[:-1])
            )
    return flags


def window_functions(
    ds: "ray.data.Dataset",
    *,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    n_buckets: int | None = None,
    ntile: int | None = None,
) -> "ray.data.Dataset":
    """Per-key ordered window functions: appends

    - ``rn`` — ``row_number() OVER (PARTITION BY key ORDER BY order_cols)``
      (int64, 1-based; make ``order_cols`` a total order per key or the
      tie ranks are engine-defined, exactly as in SQL);
    - ``lag_<value_col>`` / ``lead_<value_col>`` — previous / next row's
      value within the key (null past the partition edge);
    - ``first_<value_col>`` — ``first_value(value)`` over the default
      frame (the partition's first row in order, null if that value is);
    - ``cum_<value_col>`` — running ``sum(value) ROWS UNBOUNDED PRECEDING``.
      Nulls are skipped (SQL semantics: the running sum is null until the
      first non-null value, then carries over null rows);
    - ``pr`` — ``percent_rank()``: ``(rank - 1) / (rows - 1)`` (RANK, so
      peers — including tied nulls — share the value), 0.0 for
      single-row partitions, float64 with the same IEEE division DuckDB
      computes;
    - ``nt`` (only when ``ntile`` is set) — ``ntile(k)``: 1-based tile,
      first ``rows % k`` tiles one row larger (SQL convention).

    Rows come back grouped by key and ordered within the key; the global
    inter-key order is engine-defined (same as SQL without an outer
    ORDER BY).
    """
    if ntile is not None and ntile < 1:
        raise ValueError(f"ntile must be >= 1 (got {ntile})")

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        codes = key_codes(t, key_col)
        pairs = _order_pairs(t, order_cols)
        # lexsort: LAST key is primary -> (order keys, codes)
        idx = np.lexsort(_order_sort_keys(pairs) + (codes,))
        t_sorted = t.take(idx)
        codes_s = codes[idx]
        n = t_sorted.num_rows
        starts, lens, rep = segments(codes_s)

        rn = np.arange(n, dtype=np.int64) - rep + 1

        vals = single_array(t_sorted.column(value_col))
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

        # percent_rank uses RANK (peers share a value), not row_number
        seg_flags = np.zeros(n, dtype=bool)
        if n:
            seg_flags[starts] = True
        peers = _peer_flags(pairs, idx, seg_flags)
        peer_starts = np.flatnonzero(peers)
        peer_lens = np.diff(np.append(peer_starts, n))
        rank = np.repeat(peer_starts, peer_lens) - rep + 1
        seg_len = np.repeat(lens, lens)
        pr = np.where(
            seg_len > 1, (rank - 1) / np.maximum(seg_len - 1, 1), 0.0
        )

        out = (
            t_sorted.append_column("rn", pa.array(rn))
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

    return bucket_exchange(ds, [key_col], per_bucket, n_buckets=n_buckets)


def rolling_range_agg(
    ds: "ray.data.Dataset",
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    window: str | int = "1h",
    n_buckets: int | None = None,
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
    subtraction is exact (the query layer floors doubles first);
    ``ts_col`` must be non-null (a null timestamp has no RANGE frame —
    refused loudly, a NaN round-trip would silently corrupt every frame
    bound in the bucket). Appends ``n_w`` and ``sum_w`` (int64).
    """
    size_us = _parse_window(window)

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        codes = key_codes(t, key_col)
        ts_col_arr = t.column(ts_col)
        if ts_col_arr.null_count:
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
        starts, lens, rep = segments(codes)
        seg_id = np.repeat(
            np.arange(len(starts), dtype=np.int64), lens
        )
        val_arr = t.column(value_col)
        if val_arr.null_count:
            # a null would round-trip float64-NaN -> astype -> INT64_MIN
            # and silently poison every prefix-sum window in the bucket
            raise ValueError(
                f"rolling_range_agg: {value_col!r} contains nulls; "
                "fill or filter them first (integral non-null required)"
            )
        v = val_arr.to_numpy(zero_copy_only=False).astype(np.int64)
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

    return bucket_exchange(ds, [key_col], per_bucket, n_buckets=n_buckets)
