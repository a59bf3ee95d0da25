"""Sinks — parquet / csv / json, atomic writes, hex display encoding, merge.

Reference semantics carried over:
- atomic writes: write to ``<name>_tmp`` then ``rename()``
  (crates/tbl-cli/src/output.rs:140-176; parquet_drop.rs:14-28) — the basis
  of resumability;
- hex display encoding of binary columns as ``0x…`` strings for csv/json/
  stdout (output.rs:97-128);
- merge N files -> 1 with schema equality enforced against the first file
  (parquet_merge.rs:12-72). Unlike the reference (which buffers the whole
  output in a ``Vec<u8>``, parquet_merge.rs:25 — a scalability bug we do not
  copy), the Ray path streams batches straight to the writer.

Parquet writes request column statistics like the reference's writer
(min/max/null-count; output.rs:164-170).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data


def _atomic(path: str):
    """Context helper returning (tmp_path, commit) for tmp+rename writes."""
    tmp = f"{path}_tmp"

    def commit() -> None:
        os.replace(tmp, path)

    return tmp, commit


def write_parquet_atomic(
    ds: "ray.data.Dataset", path: str, *, compression: str = "snappy"
) -> None:
    """Write a Dataset to ONE parquet file atomically (single-file output
    mode, output.rs:157-173). Streams batches through a ParquetWriter — the
    dataset is never materialized whole.

    For the directory (multi-file) output mode just use ``ds.write_parquet``;
    this single-file sink exists for tbl's ``--output-file`` semantics and is
    driver-streaming by design (one file = one writer).
    """
    tmp, commit = _atomic(path)
    writer: pq.ParquetWriter | None = None
    try:
        for batch in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
            table = pa.Table.from_batches([batch]) if isinstance(batch, pa.RecordBatch) else batch
            if writer is None:
                writer = pq.ParquetWriter(
                    tmp,
                    table.schema,
                    compression=compression,
                    write_statistics=True,
                )
            writer.write_table(table)
        if writer is None:  # empty dataset — still write a valid file
            schema = ds.schema().base_schema if hasattr(ds.schema(), "base_schema") else None
            if schema is None:
                raise ValueError("cannot write empty dataset with unknown schema")
            writer = pq.ParquetWriter(tmp, schema, compression=compression)
        writer.close()
        writer = None
        commit()
    finally:
        if writer is not None:
            writer.close()
        if os.path.exists(tmp):
            os.remove(tmp)


def hex_encode_binary_columns(table: pa.Table) -> pa.Table:
    """Binary columns -> ``0x…`` string columns for display/csv/json
    (output.rs:97-128). Vectorized: Arrow hex via ascii encoding of
    ``binary_join_element_wise`` is not available for bytes->hex, so we use
    numpy-free python ``bytes.hex`` over the column — display path only,
    never in the hot encode path."""
    for i, fld in enumerate(table.schema):
        if pa.types.is_binary(fld.type) or pa.types.is_large_binary(fld.type):
            col = table.column(i)
            vals = [
                None if v is None else "0x" + v.hex()
                for v in col.to_pylist()
            ]
            table = table.set_column(
                i, pa.field(fld.name, pa.string()), pa.array(vals, type=pa.string())
            )
    return table


def write_csv(ds: "ray.data.Dataset", path: str) -> None:
    """Single-file CSV with hex-encoded binary columns (output.rs:151-153).

    Arrow's writer with ``quoting_style="all_valid"``: every valid value
    is quoted and nulls are unquoted-empty, so NULL and ``""`` stay
    distinguishable — the exact convention
    :func:`tbl_ray.sources.text_formats.read_csv` reads back
    (``strings_can_be_null`` + ``quoted_strings_can_be_null=False``).
    Vectorized (no per-row Python), streaming batch by batch."""
    import pyarrow.csv as pacsv

    from tbl_ray.stages.exchange import known_schema

    tmp, commit = _atomic(path)
    opts = pacsv.WriteOptions(quoting_style="all_valid")
    writer = None
    try:
        for batch in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
            t = hex_encode_binary_columns(batch)
            if writer is None:
                writer = pacsv.CSVWriter(tmp, t.schema, write_options=opts)
            writer.write_table(t)
        if writer is None:  # empty dataset: header-only file needs a schema
            sch = known_schema(ds)
            if sch is None:
                raise ValueError(
                    "cannot write empty dataset with unknown schema"
                )
            writer = pacsv.CSVWriter(tmp, sch, write_options=opts)
        writer.close()
        writer = None
        commit()
    finally:
        if writer is not None:  # failed mid-write: close + drop the tmp
            writer.close()
        if os.path.exists(tmp):
            os.remove(tmp)


def write_json(ds: "ray.data.Dataset", path: str, *, lines: bool = True) -> None:
    """JSON-lines (or array) output with hex-encoded binaries (output.rs:154-156).

    Vectorized: each batch converts to pandas with ``ArrowDtype`` (so
    nullable ints stay exact ints, never 2.0, and int64 above 2^53 never
    rounds) and serializes with one ``to_json`` call — the same path the
    CLI's streaming stdout modes use — instead of per-row ``json.dumps``
    (~10x cheaper inner loop). Conventions: dates as ``YYYY-MM-DD``
    (vectorized strftime), timestamps as ISO-8601, nulls as ``null``.

    Float-bearing batches take the per-row ``json.dumps`` path instead:
    pandas ``to_json`` caps ``double_precision`` at 15 digits, which
    loses the last ulp the repr-faithful ``json.dumps`` round-trips
    exactly — exactness beats speed for numeric payloads."""
    import json

    import pandas as pd
    import pyarrow.compute as pc

    def has_float(typ: pa.DataType) -> bool:
        if pa.types.is_floating(typ):
            return True
        if pa.types.is_list(typ) or pa.types.is_large_list(typ):
            return has_float(typ.value_type)
        if pa.types.is_struct(typ):
            return any(has_float(f.type) for f in typ)
        return False

    def stringify_temporal(t: pa.Table) -> pa.Table:
        """One temporal text form for BOTH serialization paths below:
        pandas to_json would otherwise truncate timestamps to 'ms'
        (its date_unit default) and emit a 'T' separator only on the
        float-free path — a silent microsecond loss AND a format that
        flips with the presence of an unrelated float column."""
        for i, fld in enumerate(t.schema):
            if pa.types.is_date(fld.type):
                t = t.set_column(
                    i,
                    pa.field(fld.name, pa.string()),
                    pc.strftime(t.column(i), "%Y-%m-%d"),
                )
            elif pa.types.is_timestamp(fld.type):
                # Arrow's %S prints the unit's full subsecond digits.
                # tz-aware columns keep their offset (%z) so the instant
                # stays recoverable — strftime without %z would render
                # local wall time and silently drop the zone.
                fmt = "%Y-%m-%d %H:%M:%S"
                if fld.type.tz is not None:
                    fmt += "%z"
                t = t.set_column(
                    i,
                    pa.field(fld.name, pa.string()),
                    pc.strftime(t.column(i), fmt),
                )
        return t

    def records(t: pa.Table) -> "list[str]":
        t = stringify_temporal(hex_encode_binary_columns(t))
        if any(has_float(f.type) for f in t.schema):
            out = []
            for row in t.to_pylist():
                row = {
                    k: (str(v) if hasattr(v, "isoformat") else v)
                    for k, v in row.items()
                }
                out.append(json.dumps(row, default=str))
            return out
        s = t.to_pandas(types_mapper=pd.ArrowDtype).to_json(
            orient="records", lines=True, default_handler=str,
        )
        return s.splitlines() if s else []

    tmp, commit = _atomic(path)
    with open(tmp, "w") as fh:
        first = True
        if not lines:
            fh.write("[")
        for batch in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
            if batch.num_rows == 0:
                continue
            recs = records(batch)
            if lines:
                for r in recs:
                    fh.write(r)
                    fh.write("\n")
            else:
                for r in recs:
                    if not first:
                        fh.write(",")
                    fh.write(r)
                    first = False
        if not lines:
            fh.write("]")
    commit()


def merge_files(paths: list[str], out_path: str, *, compression: str = "snappy") -> None:
    """N parquet files -> 1, schema equality enforced (parquet_merge.rs:12-72),
    streaming batches (never whole files) through the writer."""
    from tbl_ray.sources.parquet import check_equal_schemas, read_table
    from tbl_ray.stages.slicing import _ensure_ordered

    check_equal_schemas(paths)
    # file-concatenation order is part of the merge contract; without
    # preserve_order Ray may emit read blocks in completion order
    _ensure_ordered()
    ds = read_table(sorted(paths))
    write_parquet_atomic(ds, out_path, compression=compression)
