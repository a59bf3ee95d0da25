"""EncodedChunk container, codec registry, and the null-handling wrapper.

Design:

- A **codec** sees only null-free single-chunk ``pa.Array`` values; nulls are
  split off once here (validity bitmap + ``fill_null`` with the first valid
  value so runs/dictionaries stay tight) and re-applied on decode. The
  ``raw`` codec bypasses the split — Arrow IPC preserves anything, including
  nested types, which therefore always have a lossless fallback.
- An **EncodedChunk** serializes to one binary payload:
  ``MAGIC | u32 header_len | header-json | field-ipc | validity | buffers…``
  so an encoded dataset is a plain Arrow/parquet table with a ``payload``
  binary column — streamable through Ray Data and checkpoint manifests.

Round-trip guarantee: ``decode_chunk(encode_array(a, c)).equals(a)`` for every
registered codec on its supported types (enforced by tests/test_codecs.py).
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field as dc_field
from typing import Callable, Protocol

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tbl_ray.codecs.bitutil import pack_mask, unpack_mask

_MAGIC = b"TBLC"
_VERSION = 1


class CodecError(ValueError):
    pass


@dataclass
class EncodedChunk:
    """One encoded column-chunk: codec id + params + opaque buffers."""

    codec: str
    field: pa.Field  # column name + original dtype
    num_rows: int
    params: dict  # json-serializable codec parameters
    buffers: list[bytes] = dc_field(default_factory=list)
    validity: bytes | None = None  # LSB bitmap; None = no nulls
    null_count: int = 0

    @property
    def payload_bytes(self) -> int:
        return (
            sum(len(b) for b in self.buffers)
            + (len(self.validity) if self.validity else 0)
        )

    # -- payload (de)serialization ------------------------------------
    def to_payload(self) -> bytes:
        field_ipc = pa.schema([self.field]).serialize().to_pybytes()
        header = json.dumps(
            {
                "v": _VERSION,
                "codec": self.codec,
                "num_rows": self.num_rows,
                "params": self.params,
                "null_count": self.null_count,
                "field_len": len(field_ipc),
                "validity_len": len(self.validity) if self.validity else 0,
                "buffer_lens": [len(b) for b in self.buffers],
            }
        ).encode()
        parts = [_MAGIC, struct.pack("<I", len(header)), header, field_ipc]
        if self.validity:
            parts.append(self.validity)
        parts.extend(self.buffers)
        return b"".join(parts)

    @classmethod
    def from_payload(cls, payload: bytes) -> "EncodedChunk":
        if payload[:4] != _MAGIC:
            raise CodecError("bad payload magic")
        (hlen,) = struct.unpack_from("<I", payload, 4)
        pos = 8
        header = json.loads(payload[pos : pos + hlen])
        pos += hlen
        fld = pa.ipc.read_schema(pa.py_buffer(payload[pos : pos + header["field_len"]]))[0]
        pos += header["field_len"]
        validity = None
        if header["validity_len"]:
            validity = payload[pos : pos + header["validity_len"]]
            pos += header["validity_len"]
        buffers = []
        for blen in header["buffer_lens"]:
            buffers.append(payload[pos : pos + blen])
            pos += blen
        return cls(
            codec=header["codec"],
            field=fld,
            num_rows=header["num_rows"],
            params=header["params"],
            buffers=buffers,
            validity=validity,
            null_count=header["null_count"],
        )


class Codec(Protocol):
    """Plugin protocol: new codecs register via :func:`register`."""

    name: str

    def supports(self, dtype: pa.DataType) -> bool: ...
    def encode(self, arr: pa.Array) -> tuple[dict, list[bytes]]:
        """Null-free array -> (params, buffers)."""
        ...

    def decode(self, params: dict, buffers: list[bytes], n: int, dtype: pa.DataType) -> pa.Array: ...


CODECS: dict[str, Codec] = {}


def register(codec: Codec) -> Codec:
    CODECS[codec.name] = codec
    return codec


def _combine(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def _fill_value(arr: pa.Array) -> pa.Scalar | None:
    """First valid value (keeps runs/dicts tight under nulls), else None."""
    if arr.null_count == len(arr):
        return None
    return arr.drop_null()[0]


def encode_array(
    arr: pa.Array | pa.ChunkedArray,
    codec_name: str,
    *,
    name: str = "col",
    codec_kwargs: dict | None = None,
) -> EncodedChunk:
    """Encode one column-chunk with the named codec (nulls handled here).

    ``codec_kwargs`` forwards codec-specific options (e.g. a pre-trained
    FSST symbol table for per-partition amortization)."""
    arr = _combine(arr)
    try:
        codec = CODECS[codec_name]
    except KeyError:
        raise CodecError(f"unknown codec {codec_name!r} (have {sorted(CODECS)})")
    fld = pa.field(name, arr.type)
    n = len(arr)
    kw = codec_kwargs or {}

    if codec_name == "raw":
        params, buffers = codec.encode(arr)
        return EncodedChunk(codec_name, fld, n, params, buffers)

    if not codec.supports(arr.type):
        raise CodecError(f"codec {codec_name!r} does not support dtype {arr.type}")

    validity = None
    null_count = arr.null_count
    if null_count:
        mask = np.asarray(pc.is_valid(arr), dtype=bool)
        validity = pack_mask(mask)
        fill = _fill_value(arr)
        if fill is None:  # all-null column: encode zeros-length values
            arr = _combine(pa.nulls(0, type=arr.type))
            params, buffers = codec.encode(arr)
            params["__all_null__"] = True
            return EncodedChunk(
                codec_name, fld, n, params, buffers, validity, null_count
            )
        arr = _combine(pc.fill_null(arr, fill))

    params, buffers = codec.encode(arr, **kw)
    return EncodedChunk(codec_name, fld, n, params, buffers, validity, null_count)


def decode_chunk(chunk: EncodedChunk) -> pa.Array:
    """Bit-identical inverse of :func:`encode_array`."""
    codec = CODECS[chunk.codec]
    dtype = chunk.field.type

    if chunk.codec == "raw":
        return codec.decode(chunk.params, chunk.buffers, chunk.num_rows, dtype)

    if chunk.params.get("__all_null__"):
        return pa.nulls(chunk.num_rows, type=dtype)

    arr = codec.decode(chunk.params, chunk.buffers, chunk.num_rows, dtype)
    if chunk.validity is not None:
        mask = unpack_mask(chunk.validity, chunk.num_rows)
        arr = pc.if_else(
            pa.array(mask), arr, pa.scalar(None, type=dtype)
        )
    return arr


def arrays_identical(a: pa.Array, b: pa.Array) -> bool:
    """Bit-identical comparison: like ``Array.equals`` but NaN == NaN when
    the bit patterns match (Arrow's equals is IEEE, so NaN never equals
    itself). Used by round-trip tests and manifest verification."""
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    if not a.type.equals(b.type) or len(a) != len(b):
        return False
    if a.equals(b):
        return True
    s = storage_type(a.type)
    if not pa.types.is_floating(s):
        return False
    mask_a = np.asarray(pc.is_null(a), dtype=bool)
    mask_b = np.asarray(pc.is_null(b), dtype=bool)
    if not np.array_equal(mask_a, mask_b):
        return False
    fa = pc.fill_null(a, 0.0).to_numpy(zero_copy_only=False)
    fb = pc.fill_null(b, 0.0).to_numpy(zero_copy_only=False)
    u = f"u{fa.dtype.itemsize}"
    return bool(np.array_equal(fa.view(u), fb.view(u)))


# -- numpy <-> arrow primitive views ----------------------------------

_TS_STORAGE = {
    pa.types.is_timestamp: pa.int64,
    pa.types.is_date64: pa.int64,
    pa.types.is_time64: pa.int64,
    pa.types.is_date32: pa.int32,
    pa.types.is_time32: pa.int32,
    pa.types.is_duration: pa.int64,
}


def storage_type(dtype: pa.DataType) -> pa.DataType:
    """The integer storage type behind temporal dtypes (identity otherwise)."""
    for pred, mk in _TS_STORAGE.items():
        if pred(dtype):
            return mk()
    return dtype


def is_fixed_primitive(dtype: pa.DataType) -> bool:
    s = storage_type(dtype)
    return (
        pa.types.is_integer(s)
        or pa.types.is_floating(s)
        or pa.types.is_boolean(s)
    )


def primitive_to_numpy(arr: pa.Array) -> np.ndarray:
    """Null-free primitive Arrow array -> numpy (zero-copy where possible)."""
    s = storage_type(arr.type)
    if not s.equals(arr.type):
        arr = arr.view(s)
    if pa.types.is_boolean(arr.type):
        return np.asarray(arr)  # bit-unpack copy — bools are tiny
    return arr.to_numpy(zero_copy_only=True)


def numpy_to_primitive(values: np.ndarray, dtype: pa.DataType) -> pa.Array:
    s = storage_type(dtype)
    arr = pa.array(np.ascontiguousarray(values), type=s)
    if not s.equals(dtype):
        arr = arr.view(dtype)
    return arr


def is_binary_like(dtype: pa.DataType) -> bool:
    return (
        pa.types.is_string(dtype)
        or pa.types.is_large_string(dtype)
        or pa.types.is_binary(dtype)
        or pa.types.is_large_binary(dtype)
    )


def binary_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Null-free string/binary array -> (offsets int64, data uint8) views."""
    if pa.types.is_string(arr.type):
        arr = arr.cast(pa.large_string())
    elif pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64, count=len(arr) + 1 + arr.offset)[
        arr.offset :
    ]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
    # slice data to the span this array actually covers
    start, end = int(offsets[0]), int(offsets[-1])
    return offsets - start, data[start:end]


def segment_reduceat(
    ufunc: np.ufunc, values: np.ndarray, offsets: np.ndarray, identity
) -> np.ndarray:
    """Per-row ``ufunc.reduceat`` over Arrow variable-length segments.

    ``offsets`` is the (n_rows + 1)-long monotonic offsets array. Empty rows
    may appear anywhere: starts are left MONOTONIC (zeroing them, as a naive
    implementation does, makes the preceding row's reduction collapse to a
    single element — reduceat treats ``indices[i] >= indices[i+1]`` as a
    1-element slice). With monotonic starts an empty row yields one stray
    element, overwritten with ``identity`` below. One ``identity`` sentinel
    is appended to ``values`` so a *trailing* empty row's
    ``start == len(values)`` stays in range; the sentinel also folds into the
    last row's reduction, a no-op by the identity property (0 for xor/add,
    U64_MAX for minimum, ...).
    """
    lens = np.diff(offsets)
    v = np.concatenate([values, np.asarray([identity], dtype=values.dtype)])
    out = ufunc.reduceat(v, offsets[:-1])
    out[lens == 0] = identity
    return out


def binary_from_parts(
    offsets: np.ndarray, data: np.ndarray, dtype: pa.DataType
) -> pa.Array:
    off = pa.py_buffer(np.ascontiguousarray(offsets, dtype=np.int64))
    dat = pa.py_buffer(np.ascontiguousarray(data, dtype=np.uint8))
    big = pa.large_string() if (
        pa.types.is_string(dtype) or pa.types.is_large_string(dtype)
    ) else pa.large_binary()
    arr = pa.Array.from_buffers(big, len(offsets) - 1, [None, off, dat])
    if not big.equals(dtype):
        arr = arr.cast(dtype)
    return arr
