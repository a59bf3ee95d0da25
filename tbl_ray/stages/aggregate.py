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
import ray.data
from ray.data.aggregate import Sum


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
    counts = partials.groupby(column).aggregate(
        Sum("__partial_count__", alias_name="count")
    )
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
    from ray.data.aggregate import Max, Min, Sum

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
        part = t.select(
            keys + sorted({c for c, _ in plan})
        ).group_by(keys).aggregate(plan)
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
        # big input, or a degenerate empty one — the exchange is correct
        # (and on empty data, trivially cheap) in both cases
        ray_aggs = {"sum": Sum, "min": Min, "max": Max}
        merged = partials.groupby(keys).aggregate(
            *[ray_aggs[f](src, alias_name=final) for src, f, final in merge_plan]
        )

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
