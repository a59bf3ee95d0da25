"""Parquet scanning for Ray Data, schema enforcement, and metadata slice plans.

- :func:`read_table` — the multi-file lazy scan (reference: one polars
  LazyFrame over all sorted paths, crates/tbl-core/src/parquet/parquet_scan.rs:6-10)
  becomes ``ray.data.read_parquet(paths)`` with column pruning.
- :func:`check_equal_schemas` — merge aborts on the first schema mismatch
  against the first file's schema (parquet_merge.rs:49-58); we do the same
  check driver-side from footers only, before any data moves.
- :func:`file_slice_plan` — metadata-only pushdown for ordered
  offset/head/tail windows when no filter precedes the slice: parquet footers
  give per-file row counts (parquet_summary.rs:8-28), so the window
  ``[offset, offset+len)`` maps to whole middle files plus at most two
  boundary files with local slices. At 100 TB this turns a full scan into a
  read of only the files that intersect the window.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow.parquet as pq
import ray.data


class SchemaMismatch(ValueError):
    pass


def read_table(
    paths: list[str] | str,
    *,
    columns: list[str] | None = None,
    filter_expr=None,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Lazy multi-file parquet scan with column pruning and optional
    row-group predicate pushdown at the read."""
    if isinstance(paths, str):
        paths = [paths]
    kwargs = {}
    if filter_expr is not None:
        kwargs["filter"] = filter_expr
    return ray.data.read_parquet(
        paths, columns=columns, concurrency=concurrency, **kwargs
    )


def spec_projection(spec, schema_names: list[str]) -> "list[str] | None":
    """Columns the transform chain touches, in schema order — None when
    no ``--select`` bounds the output (the whole schema is needed)."""
    if not spec.select:
        return None
    needed = set(spec.select)
    needed.update(f.column for f in spec.parsed_filters())
    needed.update(c for c, _ in spec.parsed_casts())
    needed.update(c for c, _ in spec.parsed_sets())
    needed.update(spec.nullify)
    needed.update(c for c, _, _ in spec.parsed_replaces())
    needed.update(spec.parsed_sort()[0])
    needed.update(spec.drop)
    if spec.value_counts:
        needed.add(spec.value_counts)
    cols = [n for n in schema_names if n in needed]
    if not cols and schema_names:
        # every selected column is chain-CREATED (--with-columns): reading
        # zero columns would lose the row count (Ray yields 0-column
        # blocks as empty), so carry one narrow column; select drops it
        # after the chain adds the created columns
        cols = [schema_names[0]]
    return cols


def read_for_spec(paths: list[str] | str, spec) -> "ray.data.Dataset":
    """Scan planned FROM the transform spec: read only the columns the chain
    touches (when a --select bounds the output) and push the filter
    conjunction into the parquet read as a dataset expression. Semantics are
    unchanged — batch-level masks still run — this prunes I/O.
    """
    from tbl_ray.filters import filters_to_expression

    if isinstance(paths, str):
        paths = [paths]
    schema = pq.read_schema(paths[0])
    # select runs AFTER with_columns in the fixed chain order, so it may
    # legitimately name columns the chain creates; --set only OVERWRITES
    # existing columns (batch_transform raises on a missing one), so set
    # targets do NOT bless a select name
    created = {name for name, _, _ in spec.parsed_with_columns()}
    unknown = [
        c for c in spec.select if c not in schema.names and c not in created
    ]
    if unknown:
        # fail at plan time like the reference (polars select errors on
        # missing columns, tbl-core/src/transform.rs:575-586) — the
        # projection's schema intersection below would otherwise drop the
        # typo'd name and return an EMPTY result with exit 0
        raise KeyError(
            f"unknown column(s) in select: {unknown}; "
            f"available: {schema.names}"
        )
    columns = spec_projection(spec, schema.names)
    expr = filters_to_expression(spec.parsed_filters(), schema)
    return read_table(paths, columns=columns, filter_expr=expr)


def check_equal_schemas(paths: list[str]) -> "pq.ParquetSchema":
    """Fail fast (both schemas shown) if any file deviates from the first."""
    first = pq.read_schema(paths[0])
    for p in paths[1:]:
        s = pq.read_schema(p)
        if not s.equals(first):
            raise SchemaMismatch(
                f"schema of {p} does not match {paths[0]}:\n--- first ---\n"
                f"{first}\n--- {p} ---\n{s}"
            )
    return first


@dataclass(frozen=True)
class FileSlice:
    """One file's contribution to an ordered row window."""

    path: str
    skip: int  # rows to skip at the start of this file
    take: int  # rows to take after skipping (may equal the whole file)
    whole_file: bool  # True when skip == 0 and take == file row count


def file_slice_plan(
    paths: list[str], offset: int, length: int | None
) -> list[FileSlice]:
    """Map window ``[offset, offset+length)`` in file-concat order to per-file
    slices using footer row counts only (no data read)."""
    plan: list[FileSlice] = []
    remaining_skip = offset
    remaining_take = length
    for p in paths:
        nrows = pq.ParquetFile(p).metadata.num_rows
        if remaining_skip >= nrows:
            remaining_skip -= nrows
            continue
        take_here = nrows - remaining_skip
        if remaining_take is not None:
            if remaining_take <= 0:
                break
            take_here = min(take_here, remaining_take)
            remaining_take -= take_here
        plan.append(
            FileSlice(
                path=p,
                skip=remaining_skip,
                take=take_here,
                whole_file=(remaining_skip == 0 and take_here == nrows),
            )
        )
        remaining_skip = 0
    return plan


def total_rows(paths: list[str]) -> int:
    """Σ footer num_rows (parquet_summary.rs:8-28) — no data scan."""
    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)


def read_table_slice(
    paths: list[str],
    offset: int = 0,
    length: int | None = None,
    *,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Ordered window over a multi-file table with metadata pushdown.

    Whole middle files stream through a normal distributed ``read_parquet``;
    the (at most two) boundary files are row-group-read and sliced locally —
    O(row group), not O(file).
    """
    import pyarrow.parquet as _pq
    from ray.data import DataContext

    # ordered-window semantics require ordered execution (union parts must
    # come back in append order)
    DataContext.get_current().execution_options.preserve_order = True

    plan = file_slice_plan(paths, offset, length)
    parts: list[ray.data.Dataset] = []
    # Keep file-concat order: emit segments in plan order, coalescing runs
    # of whole files into single read_parquet calls.
    run: list[str] = []

    def flush_run() -> None:
        if run:
            parts.append(read_table(list(run), columns=columns))
            run.clear()

    for s in plan:
        if s.whole_file:
            run.append(s.path)
        else:
            flush_run()
            t = _pq.read_table(s.path, columns=columns)
            t = t.slice(s.skip, s.take)
            parts.append(ray.data.from_arrow(t))
    flush_run()

    if not parts:
        # empty window — preserve schema
        t = _pq.read_table(paths[0], columns=columns).slice(0, 0)
        return ray.data.from_arrow(t)
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
