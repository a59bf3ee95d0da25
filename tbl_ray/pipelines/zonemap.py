"""Zone maps for the encoded container: per-partition column min/max/null
stats folded at encode time into the job manifest, plus manifest-driven
partition pruning at decode time.

Scale rationale: at 100 TB the encoded corpus is tens of thousands of
partition files; a point/range query that decodes every partition moves
the whole corpus through the object store. A zone map turns the filter
into a driver-side manifest scan (~100 B/partition of JSON) that skips
every partition whose [min, max] / null-count stats prove no row can
match — the classic columnar skip-index (parquet row-group statistics,
ClickHouse MinMax indexes) applied at the partition level, where this
engine controls the file boundary. Pruning is CONSERVATIVE by
construction: a partition is skipped only when its stats prove
emptiness for the AND of the filters; the exact filters always also run
on the decoded batches, so results are identical with pruning on or off
(tested). Unknown stats (old manifests, poisoned columns) keep the
partition.

Poisoning (stats dropped for a column, partition always kept):
- float columns containing NaN (``NaN != v`` is TRUE — a NaN row
  matches every ``!=`` filter, so min/max alone cannot prove emptiness);
- string/binary values longer than ``_VAL_CAP`` (a truncated max would
  under-bound the real max and wrongly prune ``>`` filters).

Reference parity: the reference engine (paradigmxyz/tbl) has no
encoded-container statistics; this extends its encode job surface
(SURVEY.md §2.3) with the standard zone-map design.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from tbl_ray.filters import Filter, parse_filter

_VAL_CAP = 256  # max stored string/binary value length (bytes)


# ---------------------------------------------------------------- fold

def _epoch_int64(arr: "pa.ChunkedArray | pa.Array") -> "pa.ChunkedArray | pa.Array":
    """Temporal array -> its epoch integer representation as int64."""
    t = arr.type
    if pa.types.is_date32(t) or pa.types.is_time32(t):
        return pc.cast(pc.cast(arr, pa.int32()), pa.int64())
    return pc.cast(arr, pa.int64())


def _kind_of(dtype: pa.DataType) -> str | None:
    """Stats kind for a column dtype; None = not zone-mappable."""
    if pa.types.is_boolean(dtype) or pa.types.is_integer(dtype):
        return "int"
    if pa.types.is_floating(dtype):
        return "float"
    if pa.types.is_temporal(dtype):
        return "epoch"
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return "str"
    if pa.types.is_binary(dtype) or pa.types.is_large_binary(dtype):
        return "bin"
    return None


def fold_stats(acc: dict, t: pa.Table) -> dict:
    """Fold one input batch into running per-column stats.

    ``acc`` starts as ``{}``; mutate-and-return. One vectorized
    ``min_max`` per column per batch — negligible next to the encode."""
    for name in t.column_names:
        col = t.column(name)
        kind = _kind_of(col.type)
        if kind is None:
            continue
        s = acc.setdefault(
            name,
            {"kind": kind, "t": str(col.type), "min": None, "max": None,
             "nulls": 0, "poisoned": False},
        )
        s["nulls"] += col.null_count
        if s["poisoned"]:
            continue
        valid_n = len(col) - col.null_count
        if valid_n == 0:
            continue
        if kind == "float":
            # NaN rows match every != filter; min/max can't bound them
            if pc.any(pc.is_nan(col)).as_py():
                s["poisoned"] = True
                continue
            mm = pc.min_max(col)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
        elif kind == "int":
            # uint64 must not route through the CHECKED int64 cast
            # (values over 2^63 raise — the same trap KeyBucket fixed);
            # Python ints compare fine either way at prune time
            wide = (
                pa.uint64()
                if pa.types.is_unsigned_integer(col.type)
                else pa.int64()
            )
            mm = pc.min_max(pc.cast(col, wide))
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
        elif kind == "epoch":
            mm = pc.min_max(_epoch_int64(col))
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
        else:  # str / bin — bytewise order == Arrow's compare order
            mm = pc.min_max(col)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            lo_n = len(lo.encode()) if kind == "str" else len(lo)
            hi_n = len(hi.encode()) if kind == "str" else len(hi)
            if lo_n > _VAL_CAP or hi_n > _VAL_CAP:
                # cap is in BYTES (manifest size bound); a truncated max
                # could also under-bound '>' pruning, so drop the map
                s["poisoned"] = True
                continue
        if s["min"] is None or lo < s["min"]:
            s["min"] = lo
        if s["max"] is None or hi > s["max"]:
            s["max"] = hi
    return acc


def finalize_stats(acc: dict) -> dict:
    """JSON-safe manifest form (binary values hex-encoded)."""
    out = {}
    for name, s in acc.items():
        e = dict(s)
        if s["poisoned"]:
            e["min"] = e["max"] = None
        elif s["kind"] == "bin" and s["min"] is not None:
            e["min"] = s["min"].hex()
            e["max"] = s["max"].hex()
        out[name] = e
    return out


# --------------------------------------------------------------- prune

_TS_RE = re.compile(r"^timestamp\[(s|ms|us|ns)(?:, tz=(.+))?\]$")
_SIMPLE_TYPES = {
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
    "int64": pa.int64(), "uint8": pa.uint8(), "uint16": pa.uint16(),
    "uint32": pa.uint32(), "uint64": pa.uint64(),
    "float": pa.float32(), "double": pa.float64(), "halffloat": pa.float16(),
    "bool": pa.bool_(), "string": pa.string(), "large_string": pa.large_string(),
    "binary": pa.binary(), "large_binary": pa.large_binary(),
    "date32[day]": pa.date32(), "date64[ms]": pa.date64(),
    "time32[s]": pa.time32("s"), "time32[ms]": pa.time32("ms"),
    "time64[us]": pa.time64("us"), "time64[ns]": pa.time64("ns"),
}


def _dtype_from_str(s: str) -> pa.DataType | None:
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    m = _TS_RE.match(s)
    if m:
        return pa.timestamp(m.group(1), tz=m.group(2))
    return None


def _literal_as_stat(f: Filter, s: dict):
    """The filter's right-hand literal in the same representation as the
    stored min/max; None = not convertible (caller keeps the partition)."""
    from tbl_ray.dtypes import DtypeError, parse_literal

    dtype = _dtype_from_str(s["t"])
    if dtype is None:
        return None
    try:
        value = parse_literal(f.raw_value, dtype)
    except (DtypeError, ValueError, TypeError):
        return None
    kind = s["kind"]
    try:
        if kind in ("int", "epoch"):
            sc = pa.scalar(value, type=dtype)
            if kind == "epoch":
                if pa.types.is_date32(dtype) or pa.types.is_time32(dtype):
                    return pc.cast(pc.cast(sc, pa.int32()), pa.int64()).as_py()
                return pc.cast(sc, pa.int64()).as_py()
            wide = (
                pa.uint64()
                if pa.types.is_unsigned_integer(dtype)
                else pa.int64()
            )
            return pc.cast(sc, wide).as_py()
        if kind == "float":
            v = float(value)
            return None if v != v else v  # NaN literal: keep partition
        if kind == "str":
            return value if isinstance(value, str) else None
        if kind == "bin":
            return value.hex() if isinstance(value, bytes) else None
    except (pa.ArrowInvalid, ValueError, TypeError, OverflowError):
        return None
    return None


def partition_may_match(entry: dict, filters: "list[Filter]") -> bool:
    """Conservative: False ONLY when the manifest stats prove no row of
    the partition can satisfy the AND of ``filters``."""
    num_rows = entry.get("num_rows")
    if num_rows == 0:
        return False
    stats = entry.get("stats") or {}
    for f in filters:
        s = stats.get(f.column)
        if not s:
            continue  # old manifest / unmapped column type — keep
        nulls = int(s.get("nulls", 0))
        if f.op == "is_null":
            if nulls == 0:
                return False
            continue
        if f.op == "is_not_null":
            if num_rows is not None and nulls >= num_rows:
                return False
            continue
        # comparison operators: a null row never matches (Kleene null
        # drops at the filter), so an all-null partition can't match
        if num_rows is not None and nulls >= num_rows:
            return False
        if s.get("poisoned") or s.get("min") is None:
            continue
        v = _literal_as_stat(f, s)
        if v is None:
            continue
        mn, mx = s["min"], s["max"]
        if f.op == "=" and not (mn <= v <= mx):
            return False
        if f.op == "!=" and mn == v == mx:
            return False  # every non-null row equals v; nulls don't match
        if f.op == ">" and not (mx > v):
            return False
        if f.op == ">=" and not (mx >= v):
            return False
        if f.op == "<" and not (mn < v):
            return False
        if f.op == "<=" and not (mn <= v):
            return False
    return True


def prune_report(out_dir: str, filters: "list[str | Filter]") -> dict:
    """Driver-side prune decision for every manifest partition.

    Returns ``{"kept": [paths...], "skipped": [paths...], "failed":
    [partition ids...]}`` in deterministic (path-sorted) order —
    ``failed`` lists ``on_error="skip"`` failure records, which have no
    output to read. Pure manifest work — no data read."""
    from tbl_ray.pipelines.encode_job import load_manifest

    fs = [parse_filter(f) if isinstance(f, str) else f for f in filters]
    entries = sorted(
        load_manifest(out_dir).values(), key=lambda e: e["out_path"]
    )
    kept, skipped, failed = [], [], []
    for e in entries:
        if e.get("error"):
            failed.append(e.get("partition_id"))
        elif partition_may_match(e, fs):
            kept.append(e["out_path"])
        else:
            skipped.append(e["out_path"])
    return {"kept": kept, "skipped": skipped, "failed": failed}


def decode_filtered(
    out_dir: str,
    filters: "list[str | Filter]",
    columns: "list[str] | None" = None,
    allow_partial: bool = False,
    **decode_kwargs,
) -> "object":
    """Decode a finished encode job's output with zone-map pruning, then
    apply the filters EXACTLY on the decoded batches.

    Result is identical to ``decode_job_output(out_dir)`` + the same
    filters — pruning only skips partitions whose stats prove emptiness.
    When every partition is pruned, one row-bearing partition is still
    decoded (and exact-filtered to zero rows) so the dataset keeps its
    schema.

    A manifest containing ``on_error="skip"`` failure records is a
    PARTIAL job: reading it as if complete would silently return an
    incomplete extract, so this raises unless ``allow_partial=True``
    (resume the encode job to heal it). Note this guard sees
    PARTITION-level failures (recorded in the manifest); a file whose
    footer never parsed fails at planning and appears only in the job
    REPORT + the absent ``_SUCCESS`` marker — check those before
    trusting any in-flight job's directory."""
    import ray.data

    from tbl_ray.filters import combined_mask
    from tbl_ray.pipelines.encode_job import load_manifest
    from tbl_ray.stages.encode import decode_dataset

    fs = [parse_filter(f) if isinstance(f, str) else f for f in filters]
    entries = sorted(
        load_manifest(out_dir).values(), key=lambda e: e["out_path"]
    )
    failed = [e for e in entries if e.get("error")]
    if failed and not allow_partial:
        ids = [e.get("partition_id") for e in failed]
        raise ValueError(
            f"{out_dir!r} is a PARTIAL encode job — {len(failed)} failed "
            f"partition(s) {ids[:5]}{'...' if len(ids) > 5 else ''}; resume "
            "the encode job to heal it, or pass allow_partial=True to read "
            "the incomplete data anyway"
        )
    live = [e for e in entries if not e.get("error")]
    kept = [e["out_path"] for e in live if partition_may_match(e, fs)]
    if not kept:
        # schema carrier: a row-bearing live partition (exact filters
        # drop its rows); a zero-row partition couldn't name the schema
        carriers = [e for e in live if e.get("num_rows")]
        if not carriers:
            raise ValueError(
                f"no decodable rows under {out_dir!r} (empty or failed job)"
            )
        kept = [carriers[0]["out_path"]]
    # projection pushdown INTO the container: decode only the requested
    # columns plus whatever the filters need (dropped again after the mask)
    need = None
    if columns:
        need = list(dict.fromkeys(list(columns) + [f.column for f in fs]))
    if "batch_size" not in decode_kwargs:
        from tbl_ray.pipelines.encode_job import informed_decode_batch_size

        decode_kwargs["batch_size"] = informed_decode_batch_size(out_dir)
    ds = decode_dataset(
        ray.data.read_parquet(kept), columns=need, **decode_kwargs
    )

    def exact(t: pa.Table) -> pa.Table:
        m = combined_mask(fs, t)
        out = t.filter(m) if m is not None else t
        return out.select(columns) if columns else out

    return ds.map_batches(exact, batch_format="pyarrow", zero_copy_batch=True)
