"""User-facing dtype vocabulary and typed-literal parsing.

Mirrors the reference's dtype strings and literal syntax:
- dtype vocabulary: reference crates/tbl-cli/src/transform.rs:61-79
- typed literal parsing (incl. ``0x`` hex for ints and binary, date /
  datetime formats): crates/tbl-cli/src/transform.rs:81-135,415-480
- binary hex literals for defaults: crates/tbl-core/src/parquet/parquet_insert.rs:209-226

All functions are pure and driver-side; the hot path only ever sees
already-built ``pyarrow`` scalars / arrays.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

import pyarrow as pa

# tbl dtype string -> pyarrow type (transform.rs:61-79)
_DTYPE_MAP: dict[str, pa.DataType] = {
    "i8": pa.int8(),
    "i16": pa.int16(),
    "i32": pa.int32(),
    "i64": pa.int64(),
    "u8": pa.uint8(),
    "u16": pa.uint16(),
    "u32": pa.uint32(),
    "u64": pa.uint64(),
    "f32": pa.float32(),
    "f64": pa.float64(),
    "bool": pa.bool_(),
    "str": pa.string(),
    "string": pa.string(),
    "binary": pa.binary(),
    "date": pa.date32(),
    # tbl uses Datetime with microsecond precision (transform.rs:76)
    "datetime": pa.timestamp("us"),
}


class DtypeError(ValueError):
    """Unknown dtype string or unparseable literal."""


def parse_dtype(s: str) -> pa.DataType:
    """``"i64"`` -> ``pa.int64()`` etc. (transform.rs:61-79)."""
    try:
        return _DTYPE_MAP[s.strip()]
    except KeyError:
        raise DtypeError(f"unknown dtype: {s!r} (expected one of {sorted(_DTYPE_MAP)})")


def dtype_name(t: pa.DataType) -> str:
    """Inverse of :func:`parse_dtype` for display; falls back to ``str(t)``."""
    for name, ty in _DTYPE_MAP.items():
        if name in ("string",) :
            continue
        if ty == t:
            return name
    return str(t)


_DATE_FMT = "%Y-%m-%d"
_DATETIME_FMT = "%Y-%m-%d %H:%M:%S"


def parse_literal(raw: str, dtype: pa.DataType) -> Any:
    """Parse a raw string literal into a Python value for ``dtype``.

    Follows the reference's parse rules (transform.rs:81-135,415-480):
    - ints: decimal or ``0x`` hex (transform.rs:267-294)
    - binary: ``0x`` hex required (transform.rs:219-246,460-470)
    - bool: ``true`` / ``false`` (case-insensitive)
    - date: ``%Y-%m-%d``; datetime: ``%Y-%m-%d[ %H:%M:%S]`` (transform.rs:117-132)
    - the literal ``null`` (any dtype) -> None
    """
    raw = raw.strip()
    if raw.lower() == "null":
        return None
    if pa.types.is_integer(dtype):
        try:
            return int(raw, 16) if raw.lower().startswith("0x") else int(raw)
        except ValueError:
            raise DtypeError(f"cannot parse integer literal {raw!r}")
    if pa.types.is_floating(dtype):
        try:
            return float(raw)
        except ValueError:
            raise DtypeError(f"cannot parse float literal {raw!r}")
    if pa.types.is_boolean(dtype):
        low = raw.lower()
        if low in ("true", "1"):
            return True
        if low in ("false", "0"):
            return False
        raise DtypeError(f"cannot parse bool literal {raw!r}")
    if pa.types.is_binary(dtype) or pa.types.is_large_binary(dtype):
        if not raw.lower().startswith("0x"):
            raise DtypeError(f"binary literal must be 0x-hex, got {raw!r}")
        body = raw[2:]
        try:
            return bytes.fromhex(body)
        except ValueError:
            raise DtypeError(f"invalid hex in binary literal {raw!r}")
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return raw
    if pa.types.is_date(dtype):
        try:
            return _dt.datetime.strptime(raw, _DATE_FMT).date()
        except ValueError:
            raise DtypeError(f"cannot parse date literal {raw!r} (want {_DATE_FMT})")
    if pa.types.is_timestamp(dtype):
        for fmt in (_DATETIME_FMT, _DATE_FMT):
            try:
                return _dt.datetime.strptime(raw, fmt)
            except ValueError:
                continue
        raise DtypeError(
            f"cannot parse datetime literal {raw!r} (want {_DATETIME_FMT} or {_DATE_FMT})"
        )
    raise DtypeError(f"unsupported literal dtype {dtype}")


def literal_scalar(raw: str, dtype: pa.DataType) -> pa.Scalar:
    """Typed ``pa.Scalar`` from a raw literal string."""
    return pa.scalar(parse_literal(raw, dtype), type=dtype)


def constant_array(
    raw: str | None,
    dtype: pa.DataType,
    length: int,
    *,
    default_fill: bool = False,
) -> pa.Array:
    """A length-``length`` constant (or null, when ``raw`` is None) array.

    New columns without a value are null-filled with the declared type —
    the reference's CLI LazyFrame path (transform.rs:52-56), which is what
    ``tbl`` actually runs. ``default_fill=True`` instead mirrors the
    reference's *library* inserter (parquet_insert.rs:206,221), which
    default-fills Utf8 with ``""`` and Binary with empty bytes.
    ``--set`` builds a full constant column (transform.rs:381-480).
    """
    if raw is None:
        if default_fill:
            if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
                return pa.array([""] * length, type=dtype)
            if pa.types.is_binary(dtype) or pa.types.is_large_binary(dtype):
                return pa.array([b""] * length, type=dtype)
        return pa.nulls(length, type=dtype)
    value = parse_literal(raw, dtype)
    if value is None:
        return pa.nulls(length, type=dtype)
    return pa.array([value] * length, type=dtype)
