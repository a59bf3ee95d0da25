"""JSONL / CSV sources — ingestion formats beyond parquet.

The reference reads only parquet (CSV gather is commented out at
crates/tbl-core/src/filesystem/gather.rs:39-40); web-crawl pipelines
still land raw data as JSONL or CSV, so the engine accepts both for the
*ingest* step of a convert-to-parquet pipeline. Both readers are thin,
schema-forcing wrappers over Ray's native distributed readers (one read
task per file / block, streaming downstream like any Dataset).

Round-trip contract: a table written by :mod:`tbl_ray.sinks.writers`'
``write_json``/``write_csv`` reads back value-identical for the
JSON/CSV-representable types (ints, floats, strings, bools; timestamps
come back as strings in CSV unless a schema is forced — pass ``schema``
to pin exact dtypes, exactly like a SQL COPY with column types).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.json as pajson
import ray.data


def read_jsonl(
    paths: list[str] | str,
    *,
    schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Distributed JSONL read. ``schema`` (optional) pins column types —
    otherwise pyarrow infers per file (safe for homogeneous shards,
    pass it explicitly when shards may disagree)."""
    if isinstance(paths, str):
        paths = [paths]
    kwargs = {}
    if schema is not None:
        kwargs["parse_options"] = pajson.ParseOptions(
            explicit_schema=schema
        )
    return ray.data.read_json(paths, **kwargs)


def read_csv(
    paths: list[str] | str,
    *,
    schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Distributed CSV read (header row expected, like the sink writes).
    ``schema`` pins column types; unspecified -> pyarrow inference."""
    if isinstance(paths, str):
        paths = [paths]
    # strings_can_be_null: the engine's write_csv emits NULL as an empty
    # UNQUOTED field and "" as a quoted one; reading unquoted empties as
    # null (and quoted ones as "") round-trips both exactly
    convert = pacsv.ConvertOptions(
        strings_can_be_null=True, quoted_strings_can_be_null=False
    )
    if schema is not None:
        convert = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema},
            strings_can_be_null=True,
            quoted_strings_can_be_null=False,
        )
    return ray.data.read_csv(paths, convert_options=convert)
