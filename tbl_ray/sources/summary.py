"""Footer-metadata summaries — the ``tbl ls`` / ``tbl schema`` equivalents.

TabularSummary mirrors the reference's per-file metadata aggregate
(crates/tbl-core/src/parquet/parquet_summary.rs:57-87): n_files, n_rows,
compressed (on-disk) bytes, uncompressed (full) bytes, schema, and per-column
byte stats — all read from parquet footers, never from data pages
(parquet_summary.rs:90-149). Summaries combine associatively
(parquet_summary.rs:166-188) and group by exact schema equality
(parquet_summary.rs:221-236).

Execution: footer reads are tiny metadata fetches; for large file counts we
fan them out as a Ray Data ``map_batches`` over the path list, mirroring the
reference's buffered(10) concurrency (parquet_summary.rs:151-164) but
cluster-wide. For small counts a driver loop is used (threshold below).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

_DISTRIBUTED_THRESHOLD = 256  # below this many files, a driver loop is faster


@dataclass
class ColumnSummary:
    name: str
    dtype: str
    compressed_bytes: int = 0
    uncompressed_bytes: int = 0
    null_count: int = 0


@dataclass
class TabularSummary:
    n_files: int = 0
    n_rows: int = 0
    n_bytes_compressed: int = 0  # file sizes on disk
    n_bytes_uncompressed: int = 0  # Σ row-group total_byte_size
    schema: pa.Schema | None = None
    columns: dict[str, ColumnSummary] = field(default_factory=dict)

    def to_row(self) -> dict:
        return {
            "n_files": self.n_files,
            "n_rows": self.n_rows,
            "n_bytes_compressed": self.n_bytes_compressed,
            "n_bytes_uncompressed": self.n_bytes_uncompressed,
            "n_columns": len(self.columns),
        }


def summarize_file(path: str) -> TabularSummary:
    """Footer-only summary of one parquet file (parquet_summary.rs:90-149)."""
    f = pq.ParquetFile(path)
    md = f.metadata
    schema = f.schema_arrow
    cols: dict[str, ColumnSummary] = {
        fld.name: ColumnSummary(name=fld.name, dtype=str(fld.type))
        for fld in schema
    }
    uncompressed = 0
    for rg in range(md.num_row_groups):
        rgm = md.row_group(rg)
        uncompressed += rgm.total_byte_size
        for ci in range(rgm.num_columns):
            cm = rgm.column(ci)
            # leaf column path; nested leaves roll up into their root column
            root = cm.path_in_schema.split(".")[0]
            if root in cols:
                cols[root].compressed_bytes += cm.total_compressed_size
                cols[root].uncompressed_bytes += cm.total_uncompressed_size
                if cm.statistics is not None and cm.statistics.has_null_count:
                    cols[root].null_count += cm.statistics.null_count
    return TabularSummary(
        n_files=1,
        n_rows=md.num_rows,
        n_bytes_compressed=os.path.getsize(path),
        n_bytes_uncompressed=uncompressed,
        schema=schema,
        columns=cols,
    )


def combine_summaries(a: TabularSummary, b: TabularSummary) -> TabularSummary:
    """Associative merge (parquet_summary.rs:166-188): schema from the first;
    column stats zip-added; column-set mismatch is a schema error."""
    if a.schema is None:
        return b
    if b.schema is None:
        return a
    if set(a.columns) != set(b.columns):
        raise ValueError(
            f"cannot combine summaries with different columns: "
            f"{sorted(a.columns)} vs {sorted(b.columns)}"
        )
    out = TabularSummary(
        n_files=a.n_files + b.n_files,
        n_rows=a.n_rows + b.n_rows,
        n_bytes_compressed=a.n_bytes_compressed + b.n_bytes_compressed,
        n_bytes_uncompressed=a.n_bytes_uncompressed + b.n_bytes_uncompressed,
        schema=a.schema,
        columns={},
    )
    for name, ca in a.columns.items():
        cb = b.columns[name]
        out.columns[name] = ColumnSummary(
            name=name,
            dtype=ca.dtype,
            compressed_bytes=ca.compressed_bytes + cb.compressed_bytes,
            uncompressed_bytes=ca.uncompressed_bytes + cb.uncompressed_bytes,
            null_count=ca.null_count + cb.null_count,
        )
    return out


def summarize_files(paths: list[str]) -> list[TabularSummary]:
    """Per-file summaries; distributed via Ray Data above the threshold."""
    if len(paths) < _DISTRIBUTED_THRESHOLD:
        return [summarize_file(p) for p in paths]

    import json as _json

    import ray.data

    def _summarize_batch(batch: pa.Table) -> pa.Table:
        # plain fields, not pickled dataclasses: pickle-by-value modules
        # give workers their own class objects, which don't unpickle back
        # on the driver
        out_paths, schemas, bodies = [], [], []
        for p in batch.column("path").to_pylist():
            s = summarize_file(p)
            out_paths.append(p)
            schemas.append(s.schema.serialize().to_pybytes())
            bodies.append(
                _json.dumps(
                    {
                        "n_rows": s.n_rows,
                        "n_bytes_compressed": s.n_bytes_compressed,
                        "n_bytes_uncompressed": s.n_bytes_uncompressed,
                        "columns": {
                            name: [c.dtype, c.compressed_bytes,
                                   c.uncompressed_bytes, c.null_count]
                            for name, c in s.columns.items()
                        },
                    }
                )
            )
        return pa.table(
            {"path": out_paths,
             "schema_ipc": pa.array(schemas, type=pa.binary()),
             "body": bodies}
        )

    ds = ray.data.from_items([{"path": p} for p in paths]).map_batches(
        _summarize_batch, batch_format="pyarrow", batch_size=64
    )
    by_path: dict[str, TabularSummary] = {}
    for r in ds.take_all():  # one small row per file — safe to collect
        body = _json.loads(r["body"])
        by_path[r["path"]] = TabularSummary(
            n_files=1,
            n_rows=body["n_rows"],
            n_bytes_compressed=body["n_bytes_compressed"],
            n_bytes_uncompressed=body["n_bytes_uncompressed"],
            schema=pa.ipc.read_schema(pa.py_buffer(r["schema_ipc"])),
            columns={
                name: ColumnSummary(
                    name=name, dtype=v[0], compressed_bytes=v[1],
                    uncompressed_bytes=v[2], null_count=v[3],
                )
                for name, v in body["columns"].items()
            },
        )
    return [by_path[p] for p in paths]  # preserve input order


def summarize_by_schema(
    summaries: list[TabularSummary],
) -> dict[str, tuple[pa.Schema, TabularSummary]]:
    """Group by exact schema equality (parquet_summary.rs:221-236)."""
    groups: dict[str, tuple[pa.Schema, TabularSummary]] = {}
    for s in summaries:
        key = str(s.schema)
        if key in groups:
            schema, acc = groups[key]
            groups[key] = (schema, combine_summaries(acc, s))
        else:
            groups[key] = (s.schema, s)
    return groups
