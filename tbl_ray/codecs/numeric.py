"""``bitpack``, ``for`` (frame-of-reference) and ``rle`` codecs.

All three work on numpy views of the Arrow buffers (zero-copy in, one
vectorized pass out):

- **bitpack** — non-negative integers / bools packed at the minimal fixed
  width for the chunk's max value.
- **for** — frame-of-reference: subtract the chunk minimum, bit-pack the
  deltas. Arithmetic runs in uint64 two's-complement wraparound space, so
  signed and unsigned 64-bit extremes round-trip exactly (SURVEY.md §7.4.5).
  Temporal types (timestamp/date/duration) encode via their integer storage
  — the natural codec for near-monotone ``warc_ts`` columns.
- **rle** — run-length: run values (primitives as little-endian numpy bytes,
  strings/binary as an IPC sub-block) + bit-packed run lengths. Wins on
  low-churn columns like ``lang``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tbl_ray.codecs.base import (
    binary_from_parts,
    is_binary_like,
    is_fixed_primitive,
    numpy_to_primitive,
    primitive_to_numpy,
    register,
    storage_type,
)
from tbl_ray.codecs.bitutil import bits_needed, pack, unpack

# little-endian numpy dtype string for each arrow storage type
_NP_LE = {
    "int8": "<i1", "int16": "<i2", "int32": "<i4", "int64": "<i8",
    "uint8": "<u1", "uint16": "<u2", "uint32": "<u4", "uint64": "<u8",
    "float": "<f4", "double": "<f8", "halffloat": "<f2", "bool": "|b1",
}


def _np_le_dtype(dtype: pa.DataType) -> str:
    return _NP_LE[str(storage_type(dtype))]


def _as_u64(values: np.ndarray) -> np.ndarray:
    """Reinterpret any integer/bool array as uint64 (value-preserving bits
    for 64-bit, value-preserving magnitude for narrower types)."""
    if values.dtype == np.bool_:
        return values.astype(np.uint64)
    if values.dtype.itemsize == 8:
        return values.view(np.uint64) if values.dtype.kind in "iu" else values.astype(np.uint64)
    if values.dtype.kind == "i":
        return values.astype(np.int64).view(np.uint64)
    return values.astype(np.uint64)


def _from_u64(u: np.ndarray, dtype: pa.DataType) -> np.ndarray:
    np_dt = np.dtype(_np_le_dtype(dtype))
    if np_dt.kind == "b":
        return u.astype(np.bool_)
    if np_dt.kind == "i":
        return u.view(np.int64).astype(np_dt)
    return u.astype(np_dt)


class BitpackCodec:
    """Fixed-width packing of non-negative integers / bools."""

    name = "bitpack"

    def supports(self, dtype: pa.DataType) -> bool:
        s = storage_type(dtype)
        return pa.types.is_integer(s) or pa.types.is_boolean(s)

    def encode(self, arr: pa.Array) -> tuple[dict, list[bytes]]:
        values = primitive_to_numpy(arr)
        if len(values) == 0:
            return {"width": 0}, [b""]
        u = _as_u64(values)
        if values.dtype.kind == "i" and int(values.min()) < 0:
            raise ValueError("bitpack requires non-negative values (use 'for')")
        width = bits_needed(int(u.max()))
        return {"width": width}, [pack(u, width)]

    def decode(self, params, buffers, n, dtype):
        u = unpack(buffers[0], params["width"], n)
        return numpy_to_primitive(_from_u64(u, dtype), dtype)


class ForCodec:
    """Frame-of-reference + bit-pack; exact under uint64 wraparound."""

    name = "for"

    def supports(self, dtype: pa.DataType) -> bool:
        s = storage_type(dtype)
        return pa.types.is_integer(s) or pa.types.is_boolean(s)

    def encode(self, arr: pa.Array) -> tuple[dict, list[bytes]]:
        values = primitive_to_numpy(arr)
        if len(values) == 0:
            return {"ref": 0, "width": 0}, [b""]
        u = _as_u64(values)
        signed = values.dtype.kind in "ib"
        if values.dtype.kind == "i":
            ref_math = int(values.min())  # mathematical minimum
            ref_u = np.uint64(np.int64(ref_math))
        else:
            ref_math = int(u.min())
            ref_u = np.uint64(ref_math)
        with np.errstate(over="ignore"):
            deltas = u - ref_u  # wraparound-exact: delta = v - min ∈ [0, 2^64)
        width = bits_needed(int(deltas.max()))
        return {"ref": ref_math, "width": width, "signed": signed}, [pack(deltas, width)]

    def decode(self, params, buffers, n, dtype):
        deltas = unpack(buffers[0], params["width"], n)
        if params.get("signed"):
            ref_u = np.uint64(np.int64(params["ref"]))
        else:
            ref_u = np.uint64(params["ref"])
        with np.errstate(over="ignore"):
            u = deltas + ref_u
        return numpy_to_primitive(_from_u64(u, dtype), dtype)


class DeltaCodec:
    """Delta + zigzag + bit-pack: consecutive differences packed at the
    width of the largest |delta|. The natural codec for near-monotone
    sequences (crawl timestamps, auto-increment ids) where FOR must span
    the full value range but deltas stay tiny. Exact under uint64
    wraparound (zigzag maps signed deltas to small unsigned)."""

    name = "delta"

    def supports(self, dtype: pa.DataType) -> bool:
        s = storage_type(dtype)
        return pa.types.is_integer(s)

    def encode(self, arr: pa.Array) -> tuple[dict, list[bytes]]:
        values = primitive_to_numpy(arr)
        n = len(values)
        if n == 0:
            return {"first": 0, "width": 0, "signed": False}, [b""]
        u = _as_u64(values)
        signed = values.dtype.kind == "i"
        first_math = int(values[0])
        with np.errstate(over="ignore"):
            deltas = u[1:] - u[:-1]  # wraparound-exact signed diffs
            # zigzag: interleave +/- so small |delta| stays small unsigned
            zz = (deltas << np.uint64(1)) ^ (
                (deltas.view(np.int64) >> np.int64(63)).view(np.uint64)
            )
        width = bits_needed(int(zz.max())) if len(zz) else 0
        return (
            {"first": first_math, "width": width, "signed": signed},
            [pack(zz, width)],
        )

    def decode(self, params, buffers, n, dtype):
        if n == 0:
            return numpy_to_primitive(np.zeros(0, _np_le_dtype(dtype)), dtype)
        zz = unpack(buffers[0], params["width"], n - 1)
        with np.errstate(over="ignore"):
            deltas = (zz >> np.uint64(1)) ^ (np.uint64(0) - (zz & np.uint64(1)))
            if params.get("signed"):
                first_u = np.uint64(np.int64(params["first"]))
            else:
                first_u = np.uint64(params["first"])
            u = np.empty(n, dtype=np.uint64)
            u[0] = first_u
            u[1:] = first_u + np.cumsum(deltas, dtype=np.uint64)
        return numpy_to_primitive(_from_u64(u, dtype), dtype)


class RleCodec:
    """Run-length encoding for primitives and string/binary columns."""

    name = "rle"

    def supports(self, dtype: pa.DataType) -> bool:
        return is_fixed_primitive(dtype) or is_binary_like(dtype)

    def encode(self, arr: pa.Array) -> tuple[dict, list[bytes]]:
        n = len(arr)
        if n == 0:
            return {"n_runs": 0, "rl_width": 0, "values_kind": "ipc"}, [b"", b""]

        if is_fixed_primitive(arr.type):
            values = primitive_to_numpy(arr)
            # bit-pattern equality for floats: keeps -0.0 vs 0.0 distinct and
            # lets NaN runs merge — bit-identical round trips either way
            cmp = (
                values.view(f"u{values.dtype.itemsize}")
                if values.dtype.kind == "f"
                else values
            )
            starts = np.concatenate(
                ([0], np.flatnonzero(cmp[1:] != cmp[:-1]) + 1)
            )
            run_values = values[starts]
            values_buf = np.ascontiguousarray(
                run_values, dtype=_np_le_dtype(arr.type)
            ).tobytes()
            kind = "prim"
        else:
            neq = np.asarray(
                pc.not_equal(arr.slice(1), arr.slice(0, n - 1)), dtype=bool
            )
            starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
            taken = arr.take(pa.array(starts, type=pa.int64()))
            sink = pa.BufferOutputStream()
            batch = pa.record_batch([taken], names=["v"])
            with pa.ipc.new_stream(sink, batch.schema) as w:
                w.write_batch(batch)
            values_buf = sink.getvalue().to_pybytes()
            kind = "ipc"

        lengths = np.diff(np.append(starts, n)).astype(np.uint64) - 1
        rl_width = bits_needed(int(lengths.max())) if len(lengths) else 0
        return (
            {"n_runs": int(len(starts)), "rl_width": rl_width, "values_kind": kind},
            [values_buf, pack(lengths, rl_width)],
        )

    def decode(self, params, buffers, n, dtype):
        k = params["n_runs"]
        if k == 0:
            return pa.nulls(0, type=dtype).cast(dtype)
        lengths = unpack(buffers[1], params["rl_width"], k).astype(np.int64) + 1
        if params["values_kind"] == "prim":
            run_values = np.frombuffer(buffers[0], dtype=_np_le_dtype(dtype))
            values = np.repeat(run_values, lengths)
            return numpy_to_primitive(values, dtype)
        with pa.ipc.open_stream(pa.py_buffer(buffers[0])) as r:
            run_values = r.read_all().column(0).combine_chunks()
        idx = np.repeat(np.arange(k, dtype=np.int64), lengths)
        out = run_values.take(pa.array(idx, type=pa.int64()))
        if not out.type.equals(dtype):
            out = out.cast(dtype)
        return out


register(BitpackCodec())
register(ForCodec())
register(DeltaCodec())
register(RleCodec())


class BssCodec:
    """Byte-stream split for floats: transpose the value bytes so all
    0th bytes, then all 1st bytes, ... are contiguous. Size-neutral by
    itself, but the container codec (zstd) then sees the highly
    correlated sign/exponent bytes as one run — the standard lightweight
    trick for double columns (same scheme Parquet calls
    BYTE_STREAM_SPLIT)."""

    name = "bss"

    def supports(self, dtype: pa.DataType) -> bool:
        return pa.types.is_floating(storage_type(dtype))

    def encode(self, arr: pa.Array) -> tuple[dict, list[bytes]]:
        values = primitive_to_numpy(arr)
        np_le = np.dtype(_np_le_dtype(arr.type))
        v = np.ascontiguousarray(values.astype(np_le, copy=False))
        w = np_le.itemsize
        if len(v) == 0:
            return {"width": w}, [b""]
        planes = v.view(np.uint8).reshape(-1, w).T  # (w, n)
        return {"width": w}, [np.ascontiguousarray(planes).tobytes()]

    def decode(self, params, buffers, n, dtype):
        w = params["width"]
        np_le = np.dtype(_np_le_dtype(dtype))
        if n == 0:
            return numpy_to_primitive(np.empty(0, np_le), dtype)
        planes = np.frombuffer(buffers[0], dtype=np.uint8).reshape(w, n)
        v = np.ascontiguousarray(planes.T).reshape(-1).view(np_le)
        return numpy_to_primitive(v, dtype)


register(BssCodec())
