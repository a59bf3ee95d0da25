"""tbl-style filter-string parsing into vectorized Arrow predicates.

Syntax and dispatch mirror the reference (crates/tbl-cli/src/transform.rs:137-325):

- operator detection by substring priority ``!= >= <= = > <`` then
  ``.is_null`` / ``.is_not_null`` (transform.rs:158-182)
- typed right-hand literals resolved against the column dtype:
  binary requires ``0x`` hex (transform.rs:219-246); strings compare
  lexicographically (:247-266); ints parse decimal or ``0x`` hex (:267-294).
- the reference rejects other dtypes (:295-300); as a documented extension we
  additionally accept float / timestamp / date / bool columns (our testdata
  uses them), with literals parsed by :func:`tbl_ray.dtypes.parse_literal`.

A parsed filter compiles to a function ``pa.Table -> pa.BooleanArray`` built
on ``pyarrow.compute`` kernels — applied inside ``map_batches`` so filtering
stays a zero-copy, vectorized batch op (no per-row Python).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from tbl_ray.dtypes import DtypeError, parse_literal


class FilterError(ValueError):
    pass


# substring-priority dispatch order (transform.rs:158-182)
_OPS = ("!=", ">=", "<=", "=", ">", "<")

_OP_KERNEL = {
    "=": pc.equal,
    "!=": pc.not_equal,
    ">": pc.greater,
    "<": pc.less,
    ">=": pc.greater_equal,
    "<=": pc.less_equal,
}


@dataclass(frozen=True)
class Filter:
    """A parsed filter: column, operator (or is_null/is_not_null), raw value."""

    column: str
    op: str  # one of _OPS or "is_null" / "is_not_null"
    raw_value: str | None

    def bind(self, schema: pa.Schema) -> Callable[[pa.Table], pa.ChunkedArray]:
        """Resolve against a schema -> vectorized mask function."""
        if self.column not in schema.names:
            raise FilterError(f"Column '{self.column}' not found")
        if self.op == "is_null":
            return lambda t: pc.is_null(t[self.column])
        if self.op == "is_not_null":
            return lambda t: pc.is_valid(t[self.column])

        dtype = schema.field(self.column).type
        _check_filterable(dtype)
        try:
            value = parse_literal(self.raw_value, dtype)
        except DtypeError as e:
            raise FilterError(str(e))
        scalar = pa.scalar(value, type=dtype)
        kernel = _OP_KERNEL[self.op]
        col = self.column
        return lambda t: kernel(t[col], scalar)

    def mask(self, table: pa.Table) -> pa.ChunkedArray:
        return self.bind(table.schema)(table)


def _check_filterable(dtype: pa.DataType) -> None:
    ok = (
        pa.types.is_integer(dtype)
        or pa.types.is_string(dtype)
        or pa.types.is_large_string(dtype)
        or pa.types.is_binary(dtype)
        or pa.types.is_large_binary(dtype)
        # extensions beyond the reference's {binary,string,int} vocabulary:
        or pa.types.is_floating(dtype)
        or pa.types.is_timestamp(dtype)
        or pa.types.is_date(dtype)
        or pa.types.is_boolean(dtype)
    )
    if not ok:
        raise FilterError(f"Unsupported column type for filter: {dtype}")


def parse_filter(s: str) -> Filter:
    """Parse ``COL<op>V`` / ``COL.is_null`` / ``COL.is_not_null``.

    Dispatch is by substring priority exactly as in the reference
    (transform.rs:158-182): ``!=`` before ``>=``/``<=`` before ``=`` before
    ``>``/``<``; null-checks only if no comparison operator is present.
    """
    for op in _OPS:
        if op in s:
            parts = s.split(op)
            if op == "=":
                # split('=') on "a=b" -> 2 parts; "a==b" would give 3 -> error,
                # matching the reference's parts.len() != 2 check.
                parts = s.split("=")
            if len(parts) != 2:
                raise FilterError(f"Invalid filter format: {s!r}")
            return Filter(column=parts[0], op=op, raw_value=parts[1])
    if s.endswith(".is_not_null"):
        return Filter(column=s[: -len(".is_not_null")], op="is_not_null", raw_value=None)
    if s.endswith(".is_null"):
        return Filter(column=s[: -len(".is_null")], op="is_null", raw_value=None)
    raise FilterError(f"Invalid filter format: {s!r}")


def filters_to_expression(
    filters: list[Filter], schema: pa.Schema
) -> "pc.Expression | None":
    """AND of the filters as a pyarrow dataset expression for row-group
    predicate pushdown at the read ("prune at the read"). Returns None when
    there are no filters; individual filters always also run as batch masks,
    so the expression is a pure optimization."""
    expr = None
    for f in filters:
        if f.column not in schema.names:
            return None  # column created later in the chain — no pushdown
        field = pc.field(f.column)
        if f.op == "is_null":
            e = field.is_null()
        elif f.op == "is_not_null":
            e = ~field.is_null()
        else:
            dtype = schema.field(f.column).type
            try:
                value = parse_literal(f.raw_value, dtype)
            except DtypeError:
                return None
            scalar = pa.scalar(value, type=dtype)
            e = {
                "=": field == scalar,
                "!=": field != scalar,
                ">": field > scalar,
                "<": field < scalar,
                ">=": field >= scalar,
                "<=": field <= scalar,
            }[f.op]
        expr = e if expr is None else expr & e
    return expr


def combined_mask(filters: list[Filter], table: pa.Table) -> pa.ChunkedArray | None:
    """AND of all filter masks over one batch (None when no filters)."""
    mask = None
    for f in filters:
        m = f.mask(table)
        mask = m if mask is None else pc.and_kleene(mask, m)
    return mask
