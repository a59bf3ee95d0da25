"""Aggregation stages — value_counts with per-batch pre-aggregation.

``--value-counts COL`` in the reference is
``group_by(col).agg(col.count().alias("count")).sort("count", desc)``
(crates/tbl-cli/src/transform.rs:609-623). ``count`` counts NON-NULL values,
so a null group reports 0 — we preserve that.

Scale design: a bare ``ds.groupby(col).count()`` shuffles every row. We
pre-aggregate inside ``map_batches`` (one (value, partial_count) row per
distinct value per block), so the all-to-all exchange only moves the tiny
partials table; the final ``groupby().sum()`` is proportional to the number
of distinct values, not the number of rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tbl_ray.stages.exchange import safe_group_by


class _PartialCounts:
    def __init__(self, column: str):
        self.column = column

    def __call__(self, table: pa.Table) -> pa.Table:
        col = self.column
        # pyarrow count aggregation defaults to counting valid (non-null)
        # values, matching polars' col.count() in the reference.
        part = table.select([col]).group_by(col).aggregate([(col, "count")])
        return part.rename_columns([col, "__partial_count__"])


def value_counts(ds: "ray.data.Dataset", column: str) -> "ray.data.Dataset":
    """Distributed value_counts: partials -> small shuffle -> sort desc.

    Cost-based fast path (see :mod:`tbl_ray.sizing`): when the input is
    provably small, the partials fold in one local Arrow ``group_by``
    instead of paying the distributed exchange's fixed cost. Identical
    counts either way."""
    from tbl_ray.sizing import fold_partials_local

    partials = ds.map_batches(
        _PartialCounts(column), batch_format="pyarrow", zero_copy_batch=True
    )
    merged = fold_partials_local(
        ds, partials, column, [("__partial_count__", "sum")], ["count"]
    )
    if merged is not None:
        return ray.data.from_arrow(
            merged.sort_by([("count", "descending")])
        )
    # distributed merge via the hash-bucket exchange (null-safe; Ray's
    # groupby cannot range-sort null values), then one distributed sort
    # of the merged counts — proportional to distinct values, not rows
    from tbl_ray.stages.exchange import bucket_exchange

    def per_bucket(t: pa.Table) -> pa.Table:
        mt = t.group_by([column]).aggregate([("__partial_count__", "sum")])
        return mt.rename_columns([column, "count"])

    counts = bucket_exchange(partials, [column], per_bucket)
    return counts.sort("count", descending=True)


_AGG_FUNCS = ("count", "sum", "min", "max", "mean")


def group_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str] | str,
    aggs: dict[str, list[str]],
) -> "ray.data.Dataset":
    """Generic keyed aggregate with per-batch pre-aggregation.

    ``aggs`` maps value-column -> list of {count,sum,min,max,mean};
    output columns are named ``<func>_<col>`` (the caller's SQL oracle
    must alias identically). ``mean`` is computed as merged sum/count —
    partials stay mergeable so the shuffle moves one row per (key-tuple)
    per block, never the input rows.
    """
    if isinstance(keys, str):
        keys = [keys]
    for col, funcs in aggs.items():
        bad = set(funcs) - set(_AGG_FUNCS)
        if bad:
            raise ValueError(f"unsupported agg funcs for {col}: {sorted(bad)}")

    # per-batch partials: sum/count/min/max per value column (mean derives)
    def partial(t: pa.Table) -> pa.Table:
        plan = []
        for col, funcs in aggs.items():
            need = set(funcs)
            if "mean" in need:
                need |= {"sum", "count"}
            for f in sorted(need - {"mean"}):
                plan.append((col, f))
        part = safe_group_by(
            t.select(keys + sorted({c for c, _ in plan})), keys, plan
        )
        # arrow names results "<col>_<func>"; normalize to "__<func>__<col>"
        names = list(part.schema.names)
        renamed = []
        for n in names:
            if n in keys:
                renamed.append(n)
                continue
            for col, f in plan:
                if n == f"{col}_{f}":
                    renamed.append(f"__{f}__{col}")
                    break
            else:
                renamed.append(n)
        return part.rename_columns(renamed)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    # (partial-name, merge-func, final-name) triples drive both plans
    merge_plan: list[tuple[str, str, str]] = []
    for col, funcs in aggs.items():
        need = set(funcs)
        if "mean" in need:
            need |= {"sum", "count"}
        if "count" in need or "mean" in need:
            merge_plan.append((f"__count__{col}", "sum", f"count_{col}"))
        if "sum" in need or "mean" in need:
            merge_plan.append((f"__sum__{col}", "sum", f"sum_{col}"))
        if "min" in need:
            merge_plan.append((f"__min__{col}", "min", f"min_{col}"))
        if "max" in need:
            merge_plan.append((f"__max__{col}", "max", f"max_{col}"))

    from tbl_ray.sizing import fold_partials_local

    mt = fold_partials_local(
        ds,
        partials,
        keys,
        [(src, f) for src, f, _ in merge_plan],
        [final for _, _, final in merge_plan],
    )
    if mt is not None:
        merged = ray.data.from_arrow(mt)
    else:
        # big input, or a degenerate empty one. The exchange goes through
        # hash(key tuple) % n coarse buckets + one vectorized Arrow
        # group_by per bucket, NOT ray's groupby(keys): range-sorting
        # millions of distinct key values costs ~5x more than sorting a
        # 64-value bucket column (measured 7.5s -> 1.2s on a 6M-row
        # int64-keyed sum), and the local group_by handles null keys,
        # which Ray's sort cannot order
        from tbl_ray.stages.exchange import bucket_exchange

        arrow_aggs = [(src, f) for src, f, _ in merge_plan]
        finals = [final for _, _, final in merge_plan]

        def per_bucket(t: pa.Table) -> pa.Table:
            mt2 = safe_group_by(t, keys, arrow_aggs)
            return mt2.rename_columns(keys + finals)

        merged = bucket_exchange(partials, keys, per_bucket)

    drops: list[str] = []
    means = [(col, funcs) for col, funcs in aggs.items() if "mean" in funcs]
    for col, funcs in aggs.items():
        if "mean" in funcs:
            if "count" not in funcs:
                drops.append(f"count_{col}")
            if "sum" not in funcs:
                drops.append(f"sum_{col}")

    if not means and not drops:
        return merged

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for col, _ in means:
            t = t.append_column(
                f"mean_{col}",
                pc.divide(
                    pc.cast(t.column(f"sum_{col}"), pa.float64()),
                    pc.cast(t.column(f"count_{col}"), pa.float64()),
                ),
            )
        return t.drop_columns(drops) if drops else t

    return merged.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def distinct_rows(
    ds: "ray.data.Dataset", cols: list[str] | str
) -> "ray.data.Dataset":
    """``SELECT DISTINCT cols`` — per-batch local distinct (Arrow
    ``group_by`` with no aggregates) so the exchange moves at most one
    row per distinct tuple per block, then a keyed merge proportional to
    the distinct count, never the input rows. Nulls form their own group
    (SQL DISTINCT treats NULLs as equal)."""
    from tbl_ray.sizing import fold_partials_local

    key_list = [cols] if isinstance(cols, str) else list(cols)

    def partial(t: pa.Table) -> pa.Table:
        return safe_group_by(t.select(key_list), key_list)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    mt = fold_partials_local(ds, partials, key_list, [], [])
    if mt is not None:
        return ray.data.from_arrow(mt)
    # distributed: one hash-bucket exchange — Ray's native groupby
    # range-sorts the key and cannot order null keys; the local Arrow
    # distinct per bucket handles nulls fine
    from tbl_ray.stages.exchange import bucket_exchange

    def per_bucket(t: pa.Table) -> pa.Table:
        return safe_group_by(t, key_list)

    return bucket_exchange(partials, key_list, per_bucket)


def grouped_quantiles(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    quantiles: list[float],
    *,
    interpolate: bool = True,
) -> "ray.data.Dataset":
    """EXACT per-group quantiles: one hash shuffle on the key, then a
    vectorized sort + index/interpolate per group.

    ``interpolate=True`` matches DuckDB ``quantile_cont`` exactly
    (``a + (b - a) * frac`` at rank ``q * (n - 1)`` — that operand order,
    so the float rounding is bit-identical to the oracle, unlike
    ``np.quantile``'s ``(1-g)*a + g*b``); ``False`` matches
    ``quantile_disc`` (the element at ``ceil(q * n) - 1``). Null values
    are dropped first (SQL aggregate semantics); null KEYS form their own
    group (SQL GROUP BY), which is why the exchange goes through the
    hash-bucket route rather than Ray's null-intolerant key sort. Output:
    one row per key with ``q_<label>`` float64 (cont) / value-typed
    (disc) columns.

    Exact distributed quantiles need the key's full value set in one
    place — that is inherently a shuffle; for a shuffle-free approximate
    answer use :func:`tbl_ray.functions.sketches.approx_quantiles`.
    The per-group state is one float per row, so groups of 10^8+ rows
    fit; beyond that, use the sketch.
    """
    import numpy as np

    from tbl_ray.stages.exchange import bucket_exchange, key_codes

    labels = [f"q_{str(q).replace('.', '_')}" for q in quantiles]

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        codes = key_codes(t, key_col)
        vals = t.column(value_col)
        valid = np.asarray(pc.is_valid(vals))
        v = pc.fill_null(vals, 0).to_numpy(zero_copy_only=False)
        # sort by (key group, nullity, value) with the value in its
        # ORIGINAL dtype: a float64 sort key would (a) collapse distinct
        # int64 values above 2^53 into ties and (b) order valid NaN
        # values after the null sentinel, indexing a fabricated 0 into
        # the quantile range. Nullity as its own (more significant) key
        # puts nulls last exactly; valid NaN sorts greatest among real
        # values, matching DuckDB, so a NaN-containing group yields NaN.
        idx = np.lexsort((v, ~valid, codes))  # ~valid: nulls sort last
        codes_s, v_s, valid_s = codes[idx], v[idx], valid[idx]
        flags = np.empty(len(codes_s), dtype=bool)
        if len(codes_s):
            flags[0] = True
            np.not_equal(codes_s[1:], codes_s[:-1], out=flags[1:])
        starts = np.flatnonzero(flags)
        nvalid = (
            np.add.reduceat(valid_s.astype(np.int64), starts)
            if len(starts)
            else np.array([], dtype=np.int64)
        )
        last = np.maximum(nvalid - 1, 0)  # index of the largest valid value
        all_null = nvalid == 0  # SQL: quantile of an all-null group is NULL

        out: dict = {
            key_col: t.column(key_col).take(
                pa.array(idx[starts], pa.int64())
            )
        }
        val_type = t.schema.field(value_col).type
        for q, label in zip(quantiles, labels):
            if interpolate:
                h = q * last
                lo = np.floor(h).astype(np.int64)
                hi = np.minimum(lo + 1, last)
                a = v_s[starts + lo].astype(np.float64)
                b = v_s[starts + hi].astype(np.float64)
                out[label] = pa.array(
                    a + (b - a) * (h - lo), pa.float64(), mask=all_null
                )
            else:
                pos = np.clip(
                    np.ceil(q * nvalid).astype(np.int64) - 1, 0, last
                )
                out[label] = pa.array(
                    v_s[starts + pos], type=val_type, mask=all_null
                )
        return pa.table(out)

    return bucket_exchange(ds, [key_col], per_bucket)


def rollup_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: dict[str, list[str]],
) -> "ray.data.Dataset":
    """``GROUP BY ROLLUP(keys)``: one result set per key prefix —
    (k1..kn), (k1..kn-1), ..., () — rolled-away key columns null-filled,
    plus ``lvl`` = the SQL ``GROUPING(keys...)`` bitmask so real null
    keys stay distinguishable from rollup rows.

    Each level is its own pre-aggregated :func:`group_aggregate` pass
    unioned lazily — n_keys+1 cheap partial-aggregate exchanges instead
    of one, which at corpus scale is still proportional to the distinct
    key counts, never the input rows. (A single-pass rollup would need a
    custom combiner; the reference has nothing comparable and the extra
    passes reuse the audited aggregate path.)
    """
    from tbl_ray.stages.exchange import known_schema

    sch = known_schema(ds)
    if sch is None:
        raise ValueError(
            "rollup_aggregate needs a known input schema (filter-emptied "
            "input?); construct empty inputs with ray.data.from_arrow"
        )
    key_types = {k: sch.field(k).type for k in keys}
    levels = []
    for n_keep in range(len(keys), -1, -1):
        keep = keys[:n_keep]
        rolled = keys[n_keep:]
        # GROUPING bitmask: bit i (from the LEFT key, MSB-first like
        # DuckDB's GROUPING(k1, k2, ...)) set when key i is rolled away
        lvl = 0
        for i in range(len(keys)):
            if i >= n_keep:
                lvl |= 1 << (len(keys) - 1 - i)
        if keep:
            level = group_aggregate(ds, keep, aggs)
        else:
            # global aggregate: constant key, then drop it
            tag = "__all__"

            def add_tag(t: pa.Table, _tag=tag) -> pa.Table:
                return t.append_column(
                    _tag, pa.array([0] * t.num_rows, pa.int8())
                )

            level = group_aggregate(
                ds.map_batches(
                    add_tag, batch_format="pyarrow", zero_copy_batch=True
                ),
                [tag],
                aggs,
            )

        def finalize(
            t: pa.Table,
            _rolled=tuple(rolled),
            _lvl=lvl,
            _keep=tuple(keep),
            _types=key_types,
        ) -> pa.Table:
            if "__all__" in t.schema.names:
                t = t.drop_columns(["__all__"])
            for k in _rolled:
                t = t.append_column(k, pa.nulls(t.num_rows, _types[k]))
            t = t.append_column(
                "lvl", pa.array([_lvl] * t.num_rows, pa.int64())
            )
            # uniform column order across levels for the union
            order = list(_keep) + list(_rolled)
            rest = [c for c in t.schema.names if c not in order]
            return t.select(
                list(dict.fromkeys([*sorted(order, key=keys.index), *rest]))
            )

        levels.append(
            level.map_batches(
                finalize, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def string_agg(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    order_cols: list[str],
    *,
    sep: str = ",",
) -> "ray.data.Dataset":
    """SQL ``string_agg(value, sep ORDER BY order_cols)`` per key: one
    hash-bucket exchange, one lexsort per bucket, then the per-key
    concatenations come from a single vectorized ``binary_join`` over a
    ListArray rebuilt from the segment offsets — no per-key Python, no
    string copies beyond the final join.

    Null values are skipped (SQL string_agg), and a key whose values are
    all null yields a null result. Make ``order_cols`` a total order per
    key for deterministic output (same as SQL).
    """
    import numpy as np

    from tbl_ray.stages.exchange import (
        bucket_exchange,
        key_codes,
        order_pairs,
        order_sort_keys,
        segments,
        single_array,
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        codes = key_codes(t, key_col)
        idx = np.lexsort(order_sort_keys(order_pairs(t, order_cols)) + (codes,))
        t = t.take(idx)
        codes = codes[idx]
        vals = single_array(t.column(value_col))
        valid = np.asarray(pc.is_valid(vals))
        starts, lens, rep = segments(codes)

        # drop null values but keep segment attribution: recompute the
        # per-segment kept-counts, then rebuild list offsets over the
        # filtered flat values
        kept_per_seg = (
            np.add.reduceat(valid.astype(np.int64), starts)
            if len(starts)
            else np.array([], dtype=np.int64)
        )
        flat = vals.filter(pa.array(valid))
        offsets = np.concatenate(
            ([0], np.cumsum(kept_per_seg))
        ).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat
        )
        joined = pc.binary_join(lists, sep)
        # all-null segment -> NULL (SQL), not ""
        joined = pc.if_else(
            pa.array(kept_per_seg > 0), joined, pa.scalar(None, pa.string())
        )
        kcol = single_array(t.column(key_col))
        return pa.table(
            {
                key_col: kcol.take(pa.array(starts, pa.int64())),
                f"agg_{value_col}": joined,
            }
        )

    return bucket_exchange(ds, [key_col], per_bucket)
