"""tbl's 14-transform chain, re-expressed over ``ray.data.Dataset``.

The reference applies transforms in a FIXED order regardless of CLI flag
order (crates/tbl-cli/src/transform.rs:5-24):

    with_columns -> filter -> drop -> cast -> set -> nullify -> replace
    -> select -> offset -> head -> tail -> value_counts -> sort -> rename

Order semantics preserved here (see SURVEY.md §2):
- filters see the post-``with_columns`` schema;
- ``head``/``tail``/``offset`` slice the stream in file-concatenation order
  *before* any sort;
- ``sort`` applies after ``value_counts`` (sorts the counts table when both
  are given);
- ``rename`` runs last, so every other operator references original names.

Execution plan mapping:
- every stateless columnar op (with_columns .. select) is fused into ONE
  ``map_batches`` stage over zero-copy Arrow batches;
- offset/head/tail -> :mod:`tbl_ray.stages.slicing` (ordered streaming
  limit + bounded ``split_at_indices``);
- value_counts -> per-batch partial counts then a small shuffle
  (:mod:`tbl_ray.stages.aggregate`);
- sort -> ``ds.sort`` (range-partition shuffle);
- rename -> a final metadata-only ``map_batches``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tbl_ray.dtypes import DtypeError, constant_array, parse_dtype, parse_literal
from tbl_ray.filters import Filter, combined_mask, parse_filter


class TransformError(ValueError):
    pass


@dataclass
class TransformSpec:
    """Parsed CLI-equivalent transform arguments.

    String fields use the reference's exact syntax:
    - with_columns: ``NAME:TYPE`` or ``NAME:TYPE:val=VALUE`` (transform.rs:42-59)
    - filter: ``COL=V COL!=V COL>V COL<V COL>=V COL<=V COL.is_null COL.is_not_null``
    - cast: ``COL=TYPE``; set: ``COL=VALUE``; replace: ``COL.OLD=NEW``;
      rename: ``OLD=NEW``; sort: ``COL[:desc]``.
    """

    with_columns: list[str] = field(default_factory=list)
    filter: list[str] = field(default_factory=list)
    drop: list[str] = field(default_factory=list)
    cast: list[str] = field(default_factory=list)
    set: list[str] = field(default_factory=list)
    nullify: list[str] = field(default_factory=list)
    replace: list[str] = field(default_factory=list)
    select: list[str] = field(default_factory=list)
    offset: int | None = None
    head: int | None = None
    tail: int | None = None
    value_counts: str | None = None
    sort: list[str] = field(default_factory=list)
    rename: list[str] = field(default_factory=list)
    # library-only knob: value-less with_columns default-fill empty ""/b""
    # for string/binary instead of nulls, matching the reference's Arrow
    # inserter (parquet_insert.rs:206,221) rather than its CLI LazyFrame
    # path (transform.rs:52-56). Not CLI-reachable in the reference either.
    with_columns_default_fill: bool = False

    # -- parsed views -------------------------------------------------
    def parsed_filters(self) -> list[Filter]:
        return [parse_filter(f) for f in self.filter]

    def parsed_with_columns(self) -> list[tuple[str, pa.DataType, str | None]]:
        out = []
        for spec in self.with_columns:
            parts = spec.split(":", 2)
            if len(parts) < 2:
                raise TransformError(f"invalid format for with_column: {spec!r}")
            name, type_str = parts[0], parts[1]
            value = None
            if len(parts) == 3:
                # third part is like "val=VALUE" or "=VALUE" (transform.rs:50)
                eq_parts = parts[2].split("=", 1)
                value = eq_parts[1] if len(eq_parts) == 2 else None
            out.append((name, parse_dtype(type_str), value))
        return out

    def parsed_casts(self) -> list[tuple[str, pa.DataType]]:
        out = []
        for c in self.cast:
            parts = c.split("=")
            if len(parts) != 2:
                raise TransformError(f"invalid cast format: {c!r}")
            out.append((parts[0], parse_dtype(parts[1])))
        return out

    def parsed_sets(self) -> list[tuple[str, str]]:
        out = []
        for s in self.set:
            parts = s.split("=")
            if len(parts) != 2:
                raise TransformError(f"invalid set format: {s!r}")
            out.append((parts[0], parts[1]))
        return out

    def parsed_replaces(self) -> list[tuple[str, str, str]]:
        out = []
        for r in self.replace:
            col_parts = r.split(".", 1)
            if len(col_parts) != 2:
                raise TransformError(f"invalid replace format: {r!r}")
            column, before_after = col_parts
            val_parts = before_after.split("=")
            if len(val_parts) != 2:
                raise TransformError(f"invalid replace format: {r!r}")
            out.append((column, val_parts[0], val_parts[1]))
        return out

    def parsed_renames(self) -> dict[str, str]:
        out: dict[str, str] = {}
        for r in self.rename:
            parts = r.split("=")
            if len(parts) != 2:
                raise TransformError(f"invalid rename format: {r!r}")
            out[parts[0]] = parts[1]
        return out

    def parsed_sort(self) -> tuple[list[str], list[bool]]:
        """``COL[:desc]`` list -> (columns, descending flags) (transform.rs:549-573)."""
        cols: list[str] = []
        desc: list[bool] = []
        for c in self.sort:
            if c.endswith(":desc"):
                cols.append(c[: -len(":desc")])
                desc.append(True)
            else:
                cols.append(c)
                desc.append(False)
        return cols, desc

    @property
    def has_stateless_ops(self) -> bool:
        return bool(
            self.with_columns
            or self.filter
            or self.drop
            or self.cast
            or self.set
            or self.nullify
            or self.replace
            or self.select
        )


# ----------------------------------------------------------------------
# Per-batch fused stateless chain
# ----------------------------------------------------------------------


def batch_transform(table: pa.Table, spec: TransformSpec) -> pa.Table:
    """Apply with_columns..select (the fully stateless prefix of the chain)
    to one Arrow batch, in the reference's fixed order.

    Pure ``pyarrow.compute`` kernels throughout; no per-row Python.
    """
    n = table.num_rows

    # 1. with_columns — append constant/null columns (transform.rs:26-59)
    for name, dtype, raw in spec.parsed_with_columns():
        table = table.append_column(
            pa.field(name, dtype),
            constant_array(
                raw, dtype, table.num_rows,
                default_fill=spec.with_columns_default_fill,
            ),
        )

    # 2. filter — sees post-with_columns schema (transform.rs:137-155)
    filters = spec.parsed_filters()
    if filters:
        mask = combined_mask(filters, table)
        if mask is not None:
            table = table.filter(mask)

    # 3. drop (transform.rs:352-360)
    if spec.drop:
        table = table.drop_columns(spec.drop)

    # 4. cast (transform.rs:362-379)
    for column, dtype in spec.parsed_casts():
        i = table.schema.get_field_index(column)
        if i < 0:
            raise TransformError(f"Column '{column}' not found")
        table = table.set_column(
            i, pa.field(column, dtype), pc.cast(table.column(i), dtype)
        )

    # 5. set — overwrite entire column with typed constant, cast back to the
    #    original column type (transform.rs:381-413)
    for column, raw in spec.parsed_sets():
        i = table.schema.get_field_index(column)
        if i < 0:
            raise TransformError(f"Column '{column}' not found")
        dtype = table.schema.field(i).type
        table = table.set_column(
            i, table.schema.field(i), constant_array(raw, dtype, table.num_rows)
        )

    # 6. nullify (transform.rs:482-507)
    for column in spec.nullify:
        i = table.schema.get_field_index(column)
        if i < 0:
            raise TransformError(f"Column '{column}' not found")
        dtype = table.schema.field(i).type
        table = table.set_column(
            i, table.schema.field(i), pa.nulls(table.num_rows, type=dtype)
        )

    # 7. replace — value-level replace with typed literals (transform.rs:509-547)
    for column, old_raw, new_raw in spec.parsed_replaces():
        i = table.schema.get_field_index(column)
        if i < 0:
            raise TransformError(f"Column '{column}' not found")
        dtype = table.schema.field(i).type
        try:
            old_v = pa.scalar(parse_literal(old_raw, dtype), type=dtype)
            new_v = pa.scalar(parse_literal(new_raw, dtype), type=dtype)
        except DtypeError as e:
            raise TransformError(str(e))
        col = table.column(i)
        replaced = pc.if_else(pc.equal(col, old_v), new_v, col)
        table = table.set_column(i, table.schema.field(i), replaced)

    # 8. select — keep listed columns in the given order (transform.rs:575-586)
    if spec.select:
        table = table.select(spec.select)

    return table


def rename_batch(table: pa.Table, mapping: dict[str, str]) -> pa.Table:
    """Rename columns (metadata-only, zero-copy) (transform.rs:327-350).

    Unknown source names raise, matching the reference: its
    ``lf.rename(existing, new)`` is polars-strict and errors on a missing
    column — silently ignoring a typo'd ``--rename old=new`` would emit
    the full output under the wrong name with exit 0."""
    missing = [n for n in mapping if n not in table.schema.names]
    if missing:
        raise TransformError(
            f"unknown column(s) in rename: {missing}; "
            f"available: {table.schema.names}"
        )
    names = [mapping.get(n, n) for n in table.schema.names]
    return table.rename_columns(names)


# ----------------------------------------------------------------------
# Dataset-level chain
# ----------------------------------------------------------------------


def apply_transforms(
    ds: "ray.data.Dataset", spec: TransformSpec, *, batch_size: int | None = None
) -> "ray.data.Dataset":
    """Wire the full fixed-order transform chain onto a Dataset.

    The stateless prefix is ONE fused ``map_batches`` (zero-copy pyarrow);
    slices / value_counts / sort add their own stages only when requested.
    """
    from tbl_ray.stages.aggregate import value_counts as _value_counts
    from tbl_ray.stages.slicing import ordered_slice

    if spec.has_stateless_ops:
        ds = ds.map_batches(
            _BatchTransform(spec),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )

    if spec.offset is not None or spec.head is not None or spec.tail is not None:
        ds = ordered_slice(ds, offset=spec.offset, head=spec.head, tail=spec.tail)

    if spec.value_counts is not None:
        ds = _value_counts(ds, spec.value_counts)

    if spec.sort:
        from tbl_ray.stages.slicing import _ensure_ordered

        # the sorted order must survive to the sink: without
        # preserve_order the streaming executor may emit the sorted
        # blocks in completion order (same hazard merge_files hit)
        _ensure_ordered()
        cols, desc = spec.parsed_sort()
        ds = ds.sort(cols, descending=desc)

    renames = spec.parsed_renames()
    if renames:
        ds = ds.map_batches(
            _RenameBatch(renames),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds


class _BatchTransform:
    """Picklable fused stateless-chain callable (plain function -> Ray tasks)."""

    def __init__(self, spec: TransformSpec):
        self.spec = spec

    def __call__(self, table: pa.Table) -> pa.Table:
        return batch_transform(table, self.spec)


class _RenameBatch:
    def __init__(self, mapping: dict[str, str]):
        self.mapping = mapping

    def __call__(self, table: pa.Table) -> pa.Table:
        return rename_batch(table, self.mapping)
