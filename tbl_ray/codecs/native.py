"""Compile-on-demand native kernel loader (``_fsst_native.c``).

The FSST walk is a byte-at-a-time greedy loop — the one shape numpy
cannot vectorize without paying ~30 vector passes per emitted symbol
(measured ~15 MB/s/core). The same loop in C runs at memory speed, so
this module compiles ``_fsst_native.c`` with the system ``cc`` into a
per-host cache directory and binds it via :mod:`ctypes`. Pure build
machinery — every caller must keep the numpy path as fallback:

- no compiler, non-little-endian host, or a failed build → ``LIB`` is
  ``None`` and callers use the numpy implementation (bit-identical by
  construction, verified in ``tests/test_codecs.py``);
- the cache key is the sha256 of the C source, so editing the source
  invalidates stale binaries; the build is atomic (tmp + ``os.replace``)
  so concurrent Ray workers race harmlessly;
- the cache lives under ``/tmp`` (node-local): on a multi-node cluster
  every node builds its own binary on first import — no shipped
  artifacts, no cross-node ABI assumptions;
- ``TBL_RAY_NO_NATIVE=1`` disables the native path entirely (used by
  tests to exercise the numpy fallback).

ctypes releases the GIL for the duration of the C call, so actor-pool
threads overlap freely.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "_fsst_native.c")


def _build_cdll() -> ctypes.CDLL | None:
    if os.environ.get("TBL_RAY_NO_NATIVE"):
        return None
    if sys.byteorder != "little":
        return None
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.environ.get(
        "TBL_RAY_NATIVE_DIR",
        os.path.join(tempfile.gettempdir(), f"tbl_ray_native-{os.getuid()}"),
    )
    lib_path = os.path.join(cache_dir, f"fsst_{tag}.so")
    if not os.path.exists(lib_path):
        try:
            os.makedirs(cache_dir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=cache_dir)
            os.close(fd)
            # -O2, no -march=native: the cache dir may be shared between
            # heterogeneous hosts mounting the same /tmp; the walk is
            # branch/latency-bound so wider vectors buy nothing anyway
            proc = subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                capture_output=True,
                timeout=120,
            )
            if proc.returncode != 0:
                os.unlink(tmp)
                return None
            os.replace(tmp, lib_path)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.fsst_encode.restype = ctypes.c_int64
    lib.fsst_encode.argtypes = [
        ctypes.c_void_p,  # data (padded >= 8 past M)
        ctypes.c_int64,  # M
        ctypes.c_int64,  # seg
        ctypes.c_void_p,  # long_val (2, H) u64
        ctypes.c_void_p,  # long_len (2, H) i32
        ctypes.c_void_p,  # long_code (2, H) u8
        ctypes.c_void_p,  # short2 (65536,) u8
        ctypes.c_void_p,  # short1 (256,) u8
        ctypes.c_int32,  # hash_bits
        ctypes.c_void_p,  # out (>= 2*M)
        ctypes.c_void_p,  # seg_lens (n_segs,) i64
    ]
    lib.minhash_sig.restype = None
    lib.minhash_sig.argtypes = [
        ctypes.c_void_p,  # data (flat utf-8)
        ctypes.c_void_p,  # offsets (n_rows + 1) i64
        ctypes.c_int64,  # n_rows
        ctypes.c_void_p,  # a (n_hashes,) u64
        ctypes.c_void_p,  # b (n_hashes,) u64
        ctypes.c_int32,  # n_hashes (<= 256)
        ctypes.c_int32,  # shingle (callers pass 8; see kernel comment)
        ctypes.c_void_p,  # sig out (n_rows * n_hashes) u64
    ]
    lib.jpeg_decode_blocks.restype = ctypes.c_int64
    lib.jpeg_decode_blocks.argtypes = [
        ctypes.c_void_p,  # data (unstuffed entropy bytes)
        ctypes.c_int64,  # nbytes
        ctypes.c_void_p,  # block_comp (n_blocks,) i32
        ctypes.c_int64,  # n_blocks
        ctypes.c_void_p,  # dcsym (n_comps, 65536) i16
        ctypes.c_void_p,  # dclen (n_comps, 65536) i8
        ctypes.c_void_p,  # acsym (n_comps, 65536) i16
        ctypes.c_void_p,  # aclen (n_comps, 65536) i8
        ctypes.c_void_p,  # preds (n_comps,) i64, zeroed per segment
        ctypes.c_void_p,  # out (n_blocks * 64,) i64, pre-zeroed
    ]
    lib.jpeg_decode_prog_scan.restype = ctypes.c_int64
    lib.jpeg_decode_prog_scan.argtypes = [
        ctypes.c_void_p,  # data (unstuffed entropy bytes)
        ctypes.c_int64,  # nbytes
        ctypes.c_void_p,  # block_comp (n_blocks,) i32 — scan-comp index
        ctypes.c_void_p,  # block_idx (n_blocks,) i64 — flat store block no
        ctypes.c_int64,  # n_blocks
        ctypes.c_void_p,  # dcsym (n_comps, 65536) i16, NULL unless DC first
        ctypes.c_void_p,  # dclen (n_comps, 65536) i8
        ctypes.c_void_p,  # acsym (n_comps, 65536) i16, NULL unless AC scan
        ctypes.c_void_p,  # aclen (n_comps, 65536) i8
        ctypes.c_int32,  # ss
        ctypes.c_int32,  # se
        ctypes.c_int32,  # ah
        ctypes.c_int32,  # al
        ctypes.c_void_p,  # preds (n_comps,) i64, zeroed per segment
        ctypes.c_void_p,  # store (total_blocks * 64,) i64 flat coefficients
    ]
    lib.fsst_decode.restype = ctypes.c_int64
    lib.fsst_decode.argtypes = [
        ctypes.c_void_p,  # enc
        ctypes.c_int64,  # N
        ctypes.c_void_p,  # seg_lens i64
        ctypes.c_int64,  # n_segs
        ctypes.c_void_p,  # sym_bytes (n_syms, 8) u8
        ctypes.c_void_p,  # sym_lens (n_syms,) i64
        ctypes.c_int64,  # n_syms
        ctypes.c_void_p,  # out (out_size + 8 capacity)
        ctypes.c_int64,  # out_size
    ]
    return lib


class _Kernels:
    """Process-local handle around the compiled library.

    A raw ``CDLL`` contains pointers and kills cloudpickle — and Ray
    serializes ``tbl_ray`` functions BY VALUE (the package is loaded from
    the driver's cwd, not site-packages), so every module global they
    reach must pickle. ``__reduce__`` short-circuits traversal: the
    receiving process rebuilds the handle (recompiling into the node-local
    cache if needed) instead of shipping pointers."""

    def __init__(self) -> None:
        self.cdll = _build_cdll()

    def __reduce__(self):
        # rebuild from the class, NOT via _kernels(): reducing to the
        # singleton accessor makes the captured global ``_K`` cyclic with
        # the accessor's own globals and the unpickler dies on NameError;
        # a fresh handle just dlopens the already-cached .so
        return (_Kernels, ())


_K: _Kernels | None = None


def _kernels() -> _Kernels:
    global _K
    if _K is None:
        _K = _Kernels()
    return _K


def lib() -> ctypes.CDLL | None:
    """The compiled kernel library for THIS process, or ``None`` when
    unavailable (no compiler, big-endian host, or ``TBL_RAY_NO_NATIVE``).
    Callers must treat ``None`` as 'use the numpy path'."""
    return _kernels().cdll
