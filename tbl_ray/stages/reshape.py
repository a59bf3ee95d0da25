"""Reshaping stages: list-column explode (unnest) and categorical pivot.

The reference is a flat-column file engine (no nested-type operators);
these cover the two reshapes an embedding / event pipeline hits
constantly: flattening a ``list<T>`` column into long form, and turning
a (key, category) count into a wide per-category table.

Both are pure per-batch transforms (explode) or pre-aggregated partials
plus a tiny keyed merge (pivot) — no full-data shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def explode_list(
    ds: "ray.data.Dataset",
    list_col: str,
    *,
    id_cols: list[str],
    pos_col: str = "pos",
    value_col: str = "val",
) -> "ray.data.Dataset":
    """Unnest ``list_col`` into long form: one output row per element,
    with its parent's ``id_cols``, a 1-based ``pos_col`` (int64, DuckDB
    ``generate_subscripts`` convention) and the element ``value_col``
    (the list's child type, unchanged — float32 stays float32).

    Null/empty lists emit no rows (SQL ``UNNEST``). Zero-copy per batch:
    the element values come straight from the ListArray's child buffer
    (``flatten``), parents via ``list_parent_indices`` + ``take``, and
    positions from one vectorized arange-minus-repeat.
    """

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(list_col).combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = (
                col.chunk(0)
                if col.num_chunks
                else pa.array([], t.schema.field(list_col).type)
            )
        flat = col.flatten()
        parents = pc.list_parent_indices(col)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        lens = np.where(np.isnan(lens), 0, lens).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        pos = (
            np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(starts, lens)
            + 1
        )
        out = {c: t.column(c).take(parents) for c in id_cols}
        out[pos_col] = pa.array(pos, pa.int64())
        out[value_col] = flat
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pivot_counts(
    ds: "ray.data.Dataset",
    key_col: str,
    cat_col: str,
    categories: list[str],
    *,
    prefix: str = "n_",
) -> "ray.data.Dataset":
    """Wide per-category counts: one row per ``key_col`` value, one int64
    column ``<prefix><category>`` per listed category (unlisted categories
    are ignored — the SQL conditional-aggregation shape
    ``sum(CASE WHEN cat='x' THEN 1 ELSE 0 END)``).

    Pre-aggregation pattern: each batch collapses to one row per key with
    per-category partial counts (one Arrow ``group_by`` over indicator
    columns), so the exchange moves |keys| x |categories| ints per block,
    never the input rows. The category list must be small (it becomes the
    schema); derive it from :func:`tbl_ray.stages.aggregate.value_counts`
    when unknown.
    """
    names = [f"{prefix}{c}" for c in categories]

    def partial(t: pa.Table) -> pa.Table:
        cols = {key_col: t.column(key_col)}
        for cat, name in zip(categories, names):
            # fill_null(0): a NULL category is "not this category" (the
            # SQL CASE's ELSE 0), and it keeps all-null keys at 0, not null
            cols[name] = pc.fill_null(
                pc.cast(pc.equal(t.column(cat_col), cat), pa.int64()), 0
            )
        small = pa.table(cols)
        part = small.group_by([key_col]).aggregate(
            [(n, "sum") for n in names]
        )
        return part.rename_columns([key_col] + names)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    from tbl_ray.sizing import fold_partials_local

    mt = fold_partials_local(
        ds, partials, key_col, [(n, "sum") for n in names], names
    )
    if mt is not None:
        return ray.data.from_arrow(mt)
    # distributed merge through the hash-bucket exchange (same reason as
    # distinct_rows/group_aggregate: Ray's groupby range-sorts the key and
    # cannot order null keys; the local Arrow group_by can)
    from tbl_ray.stages.exchange import bucket_exchange

    def per_bucket(t: pa.Table) -> pa.Table:
        mt2 = t.group_by([key_col]).aggregate([(n, "sum") for n in names])
        return mt2.rename_columns([key_col] + names)

    return bucket_exchange(partials, [key_col], per_bucket)


def union_by_name(
    datasets: list["ray.data.Dataset"],
) -> "ray.data.Dataset":
    """Concatenate datasets whose schemas differ by COLUMN SET (SQL
    ``UNION ALL BY NAME``): the output schema is the name-union in
    first-seen order; each input's missing columns fill with typed
    nulls. Same-named columns must agree on dtype — silently casting
    (int32 -> int64, or worse, string -> int) is how shard corruption
    hides, so a mismatch raises with both types shown.

    Pure per-batch projection + Ray's lazy union: no shuffle, no
    materialization — the exact shape for ingesting crawl shards whose
    writers added or dropped columns over time.
    """
    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")
    from tbl_ray.stages.exchange import known_schema

    fields: dict[str, pa.DataType] = {}
    for i, ds in enumerate(datasets):
        sch = known_schema(ds)
        if sch is None:
            raise ValueError(
                f"dataset {i} has no known schema (filter-emptied?); "
                "construct empty inputs with ray.data.from_arrow"
            )
        for f in sch:
            if f.name in fields and fields[f.name] != f.type:
                raise ValueError(
                    f"column {f.name!r} dtype differs across inputs: "
                    f"{fields[f.name]} vs {f.type} (dataset {i}) — cast "
                    "explicitly before the union"
                )
            fields.setdefault(f.name, f.type)
    names = list(fields)

    def align(t: pa.Table) -> pa.Table:
        cols = {}
        for name in names:
            if name in t.schema.names:
                cols[name] = t.column(name)
            else:
                cols[name] = pa.nulls(t.num_rows, fields[name])
        return pa.table(cols)

    aligned = [
        ds.map_batches(align, batch_format="pyarrow", zero_copy_batch=True)
        for ds in datasets
    ]
    out = aligned[0]
    for ds in aligned[1:]:
        out = out.union(ds)
    return out
