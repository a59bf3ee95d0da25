"""Vectorized bit-packing primitives shared by the bitpack / FOR / dict /
RLE codecs.

All functions operate on ``uint64`` numpy arrays and plain ``bytes`` —
no per-element Python. Packing width ``w`` stores each value in exactly
``w`` bits, MSB-first within the stream (the classic fixed-width layout).
"""

from __future__ import annotations

import numpy as np


def bits_needed(max_value: int) -> int:
    """Minimum width that can represent ``max_value`` (0 -> 0 bits)."""
    if max_value < 0:
        raise ValueError("bits_needed requires a non-negative value")
    return int(max_value).bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative uint64 values into a ``width``-bit MSB-first stream.

    Vectorized: big-endian byte view -> unpackbits -> keep low ``width``
    bits -> packbits. O(n * width / 8) output, O(n * width) transient bits.
    """
    if width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    bits = np.unpackbits(v.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
    return np.packbits(bits[:, 64 - width :].ravel()).tobytes()


def unpack(data: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack` -> uint64 array of length ``n``."""
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, 64 - width :] = bits.reshape(n, width)
    return np.packbits(full, axis=1).view(">u8").ravel().astype(np.uint64)


def pack_mask(mask: np.ndarray) -> bytes:
    """Boolean array -> LSB-first bitmap bytes (validity bitmaps)."""
    return np.packbits(mask.astype(np.uint8), bitorder="little").tobytes()


def unpack_mask(data: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`pack_mask` -> bool array of length ``n``."""
    return np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), count=n, bitorder="little"
    ).astype(bool)
