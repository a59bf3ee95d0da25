"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec).

Web-scale multimodal corpora are overwhelmingly JPEG, so the engine
carries a real baseline-profile codec rather than a checksum fake:

- **decoder**: SOI/APPn/COM/DQT/DHT/SOF0/SOF2/DRI/SOS/RSTn/EOI marker
  walk, canonical-Huffman entropy decode (T.81 F.2.2.3, via a
  16-bit-prefix lookup table per Huffman table), dequantize +
  dezigzag, matrix IDCT over all blocks at once, chroma upsampling by
  replication, BT.601 YCbCr->RGB. Baseline sequential (SOF0) AND
  progressive (SOF2: spectral selection + successive approximation per
  T.81 Annex G, DC/AC first and refinement scans, EOB runs, restart
  markers) — arithmetic coding, hierarchical and 12-bit precision
  raise ``ValueError``.
- **encoder**: the inverse pipeline with the Annex K.1/K.2 quantization
  tables (quality-scaled, libjpeg formula) and the Annex K.3 "typical"
  Huffman tables; 4:4:4 / 4:2:0 and grayscale.
  ``encode_jpeg_progressive`` emits a multi-scan SOF2 stream (default
  scan script mirrors the common tooling default: DC Al=1 first, AC
  bands by component, then one-bit refinement passes) with simple flat
  Huffman tables — its purpose is correctness (the decoder's
  progressive paths are verified against baseline round-trips of the
  same quantized coefficients), not ratio.

Throughput note: DCT/quant/color are vectorized numpy; the baseline
entropy pass runs in the compile-on-demand C kernel
(``codecs/_fsst_native.c:jpeg_decode_blocks`` — same loader as the FSST
walk, bit-identical to the Python ``_BitReader``/``_decode_block`` pair
which remains the fallback when no compiler is available or
``TBL_RAY_NO_NATIVE=1``). Progressive scans still walk per symbol in
Python (many small scan types, rarely the corpus bulk); a production
deployment could swap ``decode_jpeg`` for libjpeg-turbo bindings behind
the same signature.
"""

from __future__ import annotations

import ctypes
import os
import struct

import numpy as np

from tbl_ray.codecs.native import lib as _native_lib

SOI, EOI, SOS, DQT, DHT, DRI, COM = 0xD8, 0xD9, 0xDA, 0xDB, 0xC4, 0xDD, 0xFE
SOF0 = 0xC0  # baseline sequential
SOF2 = 0xC2  # progressive (Huffman)

# zigzag scan order: ZIGZAG[i] = raster index of the i-th scanned coef
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 / K.2 quantization tables (luminance / chrominance)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 "typical" Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix A (A[u,x]); forward = A @ B @ A.T,
    inverse = A.T @ F @ A."""
    x = np.arange(8)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    a[0] /= np.sqrt(2.0)
    return a.astype(np.float64)


_A = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> list[tuple[int, int, int]]:
    """(symbol, code, length) triples per T.81 Annex C code assignment.

    Validates the table shape — corrupt DHT segments (random bytes are
    a fact of crawled corpora) must surface as ``ValueError`` so decode
    error policies can catch them, not as an IndexError."""
    if len(bits) < 16 or sum(bits[:16]) > len(vals):
        raise ValueError("corrupt JPEG Huffman table (bits/values mismatch)")
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        if code + bits[length - 1] > (1 << length):
            raise ValueError("corrupt JPEG Huffman table (code overflow)")
        for _ in range(bits[length - 1]):
            out.append((vals[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """16-bit-prefix lookup: peek 16 bits, one table read gives
    (symbol, code length)."""

    def __init__(self, bits: list[int], vals: list[int]):
        lut_sym = np.full(1 << 16, -1, dtype=np.int16)
        lut_len = np.zeros(1 << 16, dtype=np.int8)
        for sym, code, length in _canonical_codes(bits, vals):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            lut_sym[lo:hi] = sym
            lut_len[lo:hi] = length
        # contiguous numpy luts feed the C kernel directly
        self.sym_np = lut_sym
        self.len_np = lut_len
        # plain lists: per-symbol numpy indexing costs more interpreter
        # overhead than the decode math itself (Python fallback path)
        self.lut_sym = lut_sym.tolist()
        self.lut_len = lut_len.tolist()


class _BitReader:
    """MSB-first bit reader over unstuffed entropy-coded bytes.

    Pure Python-int bit buffer (refill a small accumulator byte by
    byte): per-symbol numpy indexing costs ~10x more in interpreter
    overhead than small-int shifts at JPEG symbol sizes."""

    __slots__ = ("data", "n", "bytepos", "acc", "nbits", "lut_sym", "lut_len")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.bytepos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.data[self.bytepos] if self.bytepos < self.n else 0
            self.bytepos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill(n)
        self.nbits -= n
        v = self.acc >> self.nbits
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: _HuffDecoder) -> int:
        p = self.peek16()
        sym = table.lut_sym[p]
        if sym < 0:
            raise ValueError("invalid Huffman code in JPEG stream")
        self.skip(table.lut_len[p])
        return sym


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _unstuff(data: bytes) -> bytes:
    """Remove 0x00 stuffing after 0xFF within an entropy-coded segment."""
    return data.replace(b"\xff\x00", b"\xff")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG bytes -> (H, W, 3) uint8 RGB (or
    (H, W, 1) gray)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}  # (class, id)
    frame = None
    prog = None  # progressive coefficient store, built at first SOS
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == EOI:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == DQT:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    q = np.frombuffer(seg, np.uint8, 64, p).astype(np.int64)
                    p += 64
                else:
                    q = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
                    p += 128
                qtables[tq] = q  # zigzag order
        elif marker == DHT:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                if tc == 0 and any(v > 15 for v in vals):
                    # T.81 Table F.1: DC categories are <= 11 for 8-bit
                    # (15 with margin). A corrupt value byte here would
                    # otherwise demand a 255-bit magnitude read — UB in
                    # the C kernel, OverflowError in the Python walk —
                    # so reject at parse, inside the on_error funnel
                    raise ValueError(
                        "corrupt JPEG Huffman table (DC category > 15)"
                    )
                htables[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + nv
        elif marker == DRI:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker in (SOF0, SOF2):
            if frame is not None:
                # T.81 allows exactly one frame per image. A second SOF
                # after the first SOS would reassign the geometry while
                # the progressive coefficient store (prog) still has the
                # old frame's shape — the native scan schedule would then
                # compute block offsets past prog.flat's allocation, an
                # unbounded C heap write. Reject at parse, inside the
                # on_error funnel, before any scan can mix the two.
                raise ValueError("multiple JPEG SOF markers")
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3):
                # this codec converts exactly the JFIF color models it
                # implements: 1 (gray) and 3 (YCbCr). 2-component frames
                # are malformed; 4-component (Adobe CMYK/YCCK) needs the
                # APP14 transform flag we do not parse — reject rather
                # than decode to wrong colors (and a raw byte allows 255
                # components x ~8*w*h coefficient bytes each, so the
                # bound also stops crafted ~100 GB headers). Checked
                # before parsing the per-component triples so a short
                # segment funnels to ValueError, not struct.error
                raise ValueError(
                    f"JPEG SOF with {nc} components (grayscale and"
                    " YCbCr only)"
                )
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 3 + 3 + 3 * i)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            # validate BEFORE any allocation sized from these fields: a
            # corrupt header must funnel to ValueError (the on_error
            # policy catch), never ZeroDivisionError (h/v = 0) or an
            # attacker-sized MemoryError (65535x65535 coefficient planes)
            for c in comps:
                if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
                    raise ValueError(
                        f"bad JPEG sampling factor {c['h']}x{c['v']}"
                    )
            if w == 0 or h == 0:
                raise ValueError("JPEG SOF with zero dimensions")
            max_px = int(
                os.environ.get("TBL_RAY_MAX_JPEG_PIXELS", "50000000")
            )
            if w * h > max_px:
                raise ValueError(
                    f"JPEG {w}x{h} exceeds pixel budget {max_px}"
                    " (TBL_RAY_MAX_JPEG_PIXELS)"
                )
            frame = {
                "h": h, "w": w, "comps": comps,
                "progressive": marker == SOF2,
            }
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG profile (SOF{marker - 0xC0}); "
                "baseline sequential (SOF0) and progressive (SOF2) only"
            )
        elif marker == SOS:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            if len({id(c) for c, _, _ in scan}) != ns:
                # T.81 B.2.3: scan components must be distinct. With a
                # duplicate, the Python walk shares one DC prediction
                # across both entries (preds keyed by component) while
                # the C kernel keeps per-slot preds — divergent pixels,
                # silently breaking native/Python parity on a stream
                # only a corrupt payload can produce
                raise ValueError("duplicate component in JPEG scan")
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            # entropy-coded data runs until the next non-RST marker
            # (vectorized: the per-byte Python walk dominated whole-image
            # decode once the entropy loop moved to C)
            buf = np.frombuffer(data, dtype=np.uint8)
            ffs = np.flatnonzero(buf[pos:-1] == 0xFF)
            if ffs.size:
                nxt = buf[pos + ffs + 1]
                stop = (nxt != 0x00) & ~((nxt >= 0xD0) & (nxt <= 0xD7))
                hits = ffs[stop]
                end = pos + int(hits[0]) if hits.size else len(data) - 1
            else:
                end = len(data) - 1
            ecs = data[pos:end]
            if not frame["progressive"]:
                if ns != len(frame["comps"]):
                    # baseline files are near-universally single-scan
                    # interleaved; a partial scan (non-interleaved, one
                    # component per SOS) has different MCU geometry —
                    # raise rather than silently decode one plane
                    raise ValueError(
                        "unsupported JPEG: non-interleaved scan"
                        f" ({ns} of {len(frame['comps'])} components)"
                    )
                return _decode_scan(
                    frame, scan, qtables, htables, ecs, restart_interval
                )
            if prog is None:
                prog = _ProgressiveState(frame)
            _decode_progressive_scan(
                frame, scan, htables, prog, ecs, restart_interval,
                ss, se, ah, al,
            )
            pos = end
    if prog is not None:
        return _assemble_progressive(frame, prog, qtables)
    raise ValueError("JPEG contained no scan")


def _decode_scan(frame, scan, qtables, htables, ecs: bytes, restart_interval: int):
    h, w = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcux * mcuy
    # per-component coefficient stores (block grids)
    planes = []
    for c, _, _ in scan:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        planes.append(np.zeros((bh * bw, 64), dtype=np.int64))
    # split on restart markers; each segment decodes restart_interval MCUs
    segments = _split_restarts(ecs)
    # MCU-interleaved block schedule: for each MCU, each scan component
    # contributes v*h blocks in (by, bx) raster order
    pattern = [
        ci for ci, (c, _, _) in enumerate(scan)
        for _ in range(c["v"] * c["h"])
    ]
    native = _native_lib()
    # the stacked 65536-entry Huffman LUTs depend only on (scan,
    # htables): build them ONCE, not per restart segment — a DRI-dense
    # camera JPEG has thousands of segments and re-stacking ~1.2 MB per
    # call would dominate the C kernel's win
    nat_luts = (
        _stack_native_luts(scan, htables) if native is not None else None
    )
    mcu_idx = 0
    for seg in segments:
        unstuffed = _unstuff(seg)
        limit = (
            min(mcu_idx + restart_interval, n_mcu)
            if restart_interval
            else n_mcu
        )
        if native is not None:
            _decode_segment_native(
                native, unstuffed, nat_luts, scan, qtables, planes,
                pattern, mcu_idx, limit, mcux,
            )
            mcu_idx = limit
        else:
            reader = _BitReader(unstuffed)
            preds = [0] * len(scan)
            while mcu_idx < limit:
                my, mx = divmod(mcu_idx, mcux)
                for ci, (c, dc_id, ac_id) in enumerate(scan):
                    dct = qtables[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coefs = _decode_block(
                                reader,
                                htables[(0, dc_id)],
                                htables[(1, ac_id)],
                            )
                            coefs[0] += preds[ci]
                            preds[ci] = coefs[0]
                            row = my * c["v"] + by
                            col = mx * c["h"] + bx
                            planes[ci][row * (mcux * c["h"]) + col] = coefs * dct
                mcu_idx += 1
        if mcu_idx >= n_mcu:
            break
    # IDCT all blocks per component, assemble planes, upsample, convert
    out_planes = []
    for ci, (c, _, _) in enumerate(scan):
        bw, bh = mcux * c["h"], mcuy * c["v"]
        spatial = _idct_blocks(planes[ci])  # (nblocks, 8, 8)
        grid = spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
        plane = grid.reshape(bh * 8, bw * 8)
        # upsample to full resolution by replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    return _planes_to_pixels(out_planes)


def _planes_to_pixels(out_planes: list[np.ndarray]) -> np.ndarray:
    if len(out_planes) == 1:
        return out_planes[0][:, :, None].astype(np.uint8)
    return _ycbcr_to_rgb(*out_planes)


def _stack_native_luts(scan, htables):
    """C-contiguous (n_comps, 65536) symbol/length stacks for the C
    kernel — a function of (scan, htables) only, so callers build them
    once per scan and reuse across restart segments."""
    dcsym = np.ascontiguousarray(
        np.stack([htables[(0, dc_id)].sym_np for (_, dc_id, _) in scan])
    )
    dclen = np.ascontiguousarray(
        np.stack([htables[(0, dc_id)].len_np for (_, dc_id, _) in scan])
    )
    acsym = np.ascontiguousarray(
        np.stack([htables[(1, ac_id)].sym_np for (_, _, ac_id) in scan])
    )
    aclen = np.ascontiguousarray(
        np.stack([htables[(1, ac_id)].len_np for (_, _, ac_id) in scan])
    )
    return dcsym, dclen, acsym, aclen


def _decode_segment_native(
    native, unstuffed: bytes, nat_luts, scan, qtables, planes,
    pattern: list[int], mcu_idx: int, limit: int, mcux: int,
) -> None:
    """One restart segment through the C entropy kernel
    (``_fsst_native.c:jpeg_decode_blocks`` — bit-identical to the Python
    ``_decode_block`` loop, parity-pinned by tests), then a vectorized
    dequantize + scatter into the per-component coefficient planes."""
    count = limit - mcu_idx
    if count <= 0:
        return
    n_blocks = count * len(pattern)
    block_comp = np.ascontiguousarray(
        np.tile(np.asarray(pattern, dtype=np.int32), count)
    )
    dcsym, dclen, acsym, aclen = nat_luts
    preds = np.zeros(len(scan), dtype=np.int64)
    out = np.zeros(n_blocks * 64, dtype=np.int64)
    buf = np.frombuffer(unstuffed, dtype=np.uint8)
    rc = native.jpeg_decode_blocks(
        buf.ctypes.data_as(ctypes.c_void_p) if len(buf) else None,
        len(buf),
        block_comp.ctypes.data_as(ctypes.c_void_p),
        n_blocks,
        dcsym.ctypes.data_as(ctypes.c_void_p),
        dclen.ctypes.data_as(ctypes.c_void_p),
        acsym.ctypes.data_as(ctypes.c_void_p),
        aclen.ctypes.data_as(ctypes.c_void_p),
        preds.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc == -1:
        raise ValueError("invalid Huffman code in JPEG stream")
    if rc == -2:
        raise ValueError("JPEG AC run past end of block")
    if rc == -3:
        raise ValueError("corrupt JPEG Huffman table (DC category > 15)")
    coefs = out.reshape(count, len(pattern), 64)
    g = np.arange(mcu_idx, limit, dtype=np.int64)
    my, mx = np.divmod(g, mcux)
    pat = np.asarray(pattern)
    pos = 0
    for ci, (c, _, _) in enumerate(scan):
        nb = c["v"] * c["h"]  # this component's blocks per MCU (raster)
        by = np.repeat(np.arange(c["v"], dtype=np.int64), c["h"])
        bx = np.tile(np.arange(c["h"], dtype=np.int64), c["v"])
        rows = my[:, None] * c["v"] + by[None, :]
        cols = mx[:, None] * c["h"] + bx[None, :]
        dest = (rows * (mcux * c["h"]) + cols).ravel()
        vals = coefs[:, pos:pos + nb, :].reshape(-1, 64)
        planes[ci][dest] = vals * np.asarray(qtables[c["tq"]])[None, :]
        pos += nb
    assert pos == len(pat)


def _decode_block(reader: _BitReader, dc: _HuffDecoder, ac: _HuffDecoder):
    coefs = [0] * 64
    t = reader.huff(dc)
    if t > 15:  # defense in depth; DHT parse rejects these first
        raise ValueError("corrupt JPEG Huffman table (DC category > 15)")
    coefs[0] = _extend(reader.read(t), t)
    k = 1
    while k < 64:
        rs = reader.huff(ac)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        coefs[k] = _extend(reader.read(s), s)
        k += 1
    return np.asarray(coefs, dtype=np.int64)


# ---------------------------------------------------------------------------
# progressive decoding (T.81 Annex G: spectral selection + successive
# approximation).  Scans accumulate quantized coefficients into a
# per-component store; dequantize + IDCT happen once, at EOI.
# ---------------------------------------------------------------------------


class _ProgressiveState:
    """Per-component coefficient store for a SOF2 frame.

    Blocks live on the MCU-padded grid (row stride ``mcux * h_i``) so
    interleaved DC scans and non-interleaved AC scans address the same
    storage.  The representation follows the scan path, chosen once at
    construction: with the C kernel available, one flat int64 array
    holds every component's grid back-to-back (``base[ci]`` block
    offsets) — the kernel mutates it in place and ``store[ci]`` are
    (n_blocks, 64) views; without it, ``store[ci]`` are plain list
    rows, because the pure-Python refinement walk reads/writes one
    coefficient at a time and list item access beats numpy scalar
    access ~25% end-to-end (measured on a 1080x720 progressive
    decode)."""

    def __init__(self, frame):
        comps = frame["comps"]
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        self.mcux = (frame["w"] + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (frame["h"] + 8 * self.vmax - 1) // (8 * self.vmax)
        counts = [self.mcux * c["h"] * self.mcuy * c["v"] for c in comps]
        self.base = [0] * len(comps)
        for i in range(1, len(comps)):
            self.base[i] = self.base[i - 1] + counts[i - 1]
        self.native = _native_lib() is not None
        if self.native:
            self.flat = np.zeros(sum(counts) * 64, dtype=np.int64)
            self.store = [
                self.flat[b * 64 : (b + n) * 64].reshape(n, 64)
                for b, n in zip(self.base, counts)
            ]
        else:
            self.flat = None
            self.store = [[[0] * 64 for _ in range(n)] for n in counts]


def _split_restarts(ecs: bytes) -> list[bytes]:
    """Split an entropy-coded segment on RSTn markers.

    Vectorized: RST matches cannot overlap (a match's second byte is
    0xD0-0xD7, never 0xFF), so every candidate position is a real split
    — identical to a sequential skip-2 walk."""
    segments = []
    buf = np.frombuffer(ecs, dtype=np.uint8)
    if len(ecs) > 1:
        cand = np.flatnonzero(
            (buf[:-1] == 0xFF) & (buf[1:] >= 0xD0) & (buf[1:] <= 0xD7)
        )
    else:
        cand = np.array([], dtype=np.int64)
    start = 0
    for i in map(int, cand):
        segments.append(ecs[start:i])
        start = i + 2
    segments.append(ecs[start:])
    return segments


def _scan_units(frame, scan, prog):
    """Block visit order for one scan: a list of units, each a list of
    (comp_index, block_index, dc_table_id, ac_table_id).

    Interleaved scans visit MCUs (all padded blocks, T.81 A.2.3);
    single-component scans are non-interleaved and visit only the
    component's real block grid ceil(comp_extent / 8) in raster order
    (T.81 A.2.2) — the MCU-padding blocks are NOT in the stream."""
    comps = frame["comps"]
    sidx = [comps.index(c) for (c, _, _) in scan]
    if len(scan) > 1:
        units = []
        for my in range(prog.mcuy):
            for mx in range(prog.mcux):
                u = []
                for (c, dcid, acid), ci in zip(scan, sidx):
                    bw = prog.mcux * c["h"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            u.append(
                                (ci, (my * c["v"] + by) * bw
                                 + mx * c["h"] + bx, dcid, acid)
                            )
                units.append(u)
        return units
    (c, dcid, acid), ci = scan[0], sidx[0]
    compw = -(-frame["w"] * c["h"] // prog.hmax)
    comph = -(-frame["h"] * c["v"] // prog.vmax)
    rbw, rbh = -(-compw // 8), -(-comph // 8)
    stride = prog.mcux * c["h"]
    return [
        [(ci, r * stride + col, dcid, acid)]
        for r in range(rbh)
        for col in range(rbw)
    ]


def _decode_progressive_scan(
    frame, scan, htables, prog, ecs, restart_interval, ss, se, ah, al
):
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scans must be single-component")
        if se < ss or se > 63:
            raise ValueError(f"bad spectral band {ss}..{se}")
    # path choice is pinned to the store representation picked at
    # _ProgressiveState construction — re-probing _native_lib() here
    # could hand the C kernel a list store (or the list walk a flat
    # array) if availability flipped between scans of one image
    native = _native_lib() if prog.native else None
    if native is not None:
        # the native path never materializes the per-unit Python lists:
        # the schedule is built by numpy broadcasting over the MCU grid
        units = None
        sched = _prog_native_schedule(frame, scan, htables, prog, ss, ah)
        n_units = len(sched[1]) // sched[2]
    else:
        units = _scan_units(frame, scan, prog)
        sched = None
        n_units = len(units)
    ui = 0
    for segdata in _split_restarts(ecs):
        limit = (
            min(ui + restart_interval, n_units)
            if restart_interval
            else n_units
        )
        if sched is not None:
            _decode_prog_segment_native(
                native, _unstuff(segdata), sched, scan, ui, limit,
                prog, ss, se, ah, al,
            )
            ui = limit
            if ui >= n_units:
                break
            continue
        reader = _BitReader(_unstuff(segdata))
        preds = {ci: 0 for ci, _, _, _ in units[0]} if units else {}
        eobrun = 0
        while ui < limit:
            for ci, bi, dcid, acid in units[ui]:
                blk = prog.store[ci][bi]
                if ss == 0:
                    if ah == 0:  # DC first: diff-coded, shifted left Al
                        t = reader.huff(htables[(0, dcid)])
                        preds[ci] = preds.get(ci, 0) + _extend(
                            reader.read(t), t
                        )
                        blk[0] = preds[ci] << al
                    elif reader.read(1):  # DC refinement: one raw bit
                        blk[0] |= 1 << al
                elif ah == 0:
                    eobrun = _ac_first_block(
                        reader, htables[(1, acid)], blk, ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine_block(
                        reader, htables[(1, acid)], blk, ss, se, al, eobrun
                    )
            ui += 1
        if ui >= n_units:
            break
    if ui < n_units:
        raise ValueError("JPEG progressive scan truncated")


def _prog_native_schedule(frame, scan, htables, prog, ss, ah):
    """Per-scan constants for the C progressive kernel: the stream-order
    block schedule flattened to (scan-comp index, flat-store block no)
    arrays, plus the stacked Huffman LUTs the scan kind actually uses
    (DC tables for DC-first scans, the AC table for AC scans, none for
    DC refinement). Built ONCE per scan and sliced per restart segment
    — units are constant-width, so segment boundaries are exact array
    offsets. The block order is numpy broadcasting over the MCU grid,
    value-identical to :func:`_scan_units`' Python walk (parity-pinned
    by the native/Python pixel tests). Raises KeyError for a missing
    Huffman table exactly like the Python walk (decode_image funnels it
    to ValueError)."""
    comps = frame["comps"]
    sidx = [comps.index(c) for (c, _, _) in scan]
    if len(scan) > 1:
        # interleaved (T.81 A.2.3): per-MCU template of (scan pos,
        # store offset at MCU (0,0), per-my / per-mx offset steps)
        t_pos, t_off, t_my, t_mx = [], [], [], []
        for k, (c, _, _) in enumerate(scan):
            bw = prog.mcux * c["h"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    t_pos.append(k)
                    t_off.append(prog.base[sidx[k]] + by * bw + bx)
                    t_my.append(c["v"] * bw)
                    t_mx.append(c["h"])
        my = np.repeat(np.arange(prog.mcuy, dtype=np.int64), prog.mcux)
        mx = np.tile(np.arange(prog.mcux, dtype=np.int64), prog.mcuy)
        bidx = np.ravel(
            np.asarray(t_off, np.int64)[None, :]
            + my[:, None] * np.asarray(t_my, np.int64)[None, :]
            + mx[:, None] * np.asarray(t_mx, np.int64)[None, :]
        )
        bcomp = np.ascontiguousarray(
            np.tile(np.asarray(t_pos, np.int32), prog.mcux * prog.mcuy)
        )
        bpu = len(t_pos)
    else:
        # non-interleaved (T.81 A.2.2): the component's real block grid
        # in raster order on the MCU-padded stride
        c = scan[0][0]
        compw = -(-frame["w"] * c["h"] // prog.hmax)
        comph = -(-frame["h"] * c["v"] // prog.vmax)
        rbw, rbh = -(-compw // 8), -(-comph // 8)
        stride = prog.mcux * c["h"]
        bidx = np.ravel(
            prog.base[sidx[0]]
            + np.arange(rbh, dtype=np.int64)[:, None] * stride
            + np.arange(rbw, dtype=np.int64)[None, :]
        )
        bcomp = np.zeros(len(bidx), dtype=np.int32)
        bpu = 1
    luts = [None, None, None, None]
    if ss == 0 and ah == 0:
        luts[0] = np.ascontiguousarray(
            np.stack([htables[(0, dcid)].sym_np for (_, dcid, _) in scan])
        )
        luts[1] = np.ascontiguousarray(
            np.stack([htables[(0, dcid)].len_np for (_, dcid, _) in scan])
        )
    elif ss > 0:
        luts[2] = np.ascontiguousarray(
            np.stack([htables[(1, acid)].sym_np for (_, _, acid) in scan])
        )
        luts[3] = np.ascontiguousarray(
            np.stack([htables[(1, acid)].len_np for (_, _, acid) in scan])
        )
    return bcomp, bidx, bpu, luts


def _decode_prog_segment_native(
    native, unstuffed: bytes, sched, scan, ui: int, limit: int,
    prog, ss: int, se: int, ah: int, al: int,
) -> None:
    """One restart segment through the C progressive kernel
    (``_fsst_native.c:jpeg_decode_prog_scan`` — bit-identical to the
    Python scan walk, parity-pinned by the progressive test suite).
    Mutates ``prog.flat`` in place; DC predictions and the EOB run
    reset per segment inside the kernel, matching the Python path."""
    count = limit - ui
    if count <= 0:
        return
    bcomp, bidx, bpu, luts = sched
    seg_comp = np.ascontiguousarray(bcomp[ui * bpu : limit * bpu])
    seg_idx = np.ascontiguousarray(bidx[ui * bpu : limit * bpu])
    preds = np.zeros(len(scan), dtype=np.int64)
    buf = np.frombuffer(unstuffed, dtype=np.uint8)

    def _ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None

    rc = native.jpeg_decode_prog_scan(
        buf.ctypes.data_as(ctypes.c_void_p) if len(buf) else None,
        len(buf),
        seg_comp.ctypes.data_as(ctypes.c_void_p),
        seg_idx.ctypes.data_as(ctypes.c_void_p),
        len(seg_comp),
        _ptr(luts[0]), _ptr(luts[1]), _ptr(luts[2]), _ptr(luts[3]),
        ss, se, ah, al,
        preds.ctypes.data_as(ctypes.c_void_p),
        prog.flat.ctypes.data_as(ctypes.c_void_p),
    )
    if rc == -1:
        raise ValueError("invalid Huffman code in JPEG stream")
    if rc == -2:
        raise ValueError("JPEG AC run past band end")
    if rc == -3:
        raise ValueError("corrupt JPEG Huffman table (DC category > 15)")
    if rc == -4:
        raise ValueError("bad JPEG refinement symbol")
    if rc == -5:
        raise ValueError("JPEG refinement ran past band end")


def _ac_first_block(reader, ac, blk, ss, se, al, eobrun):
    """First AC scan of a band (T.81 G.1.2.2): run/size coding like
    baseline plus EOBn symbols that skip runs of all-zero bands."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.huff(ac)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += reader.read(r)
            return eobrun - 1  # current block is part of the run
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        blk[k] = _extend(reader.read(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac, blk, ss, se, al, eobrun):
    """AC refinement scan (T.81 G.1.2.3): newly-nonzero coefficients
    arrive as ±1<<Al; already-nonzero ones receive one correction bit
    each as the scan passes over them."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.huff(ac)
            r, s = rs >> 4, rs & 0xF
            s_val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break
                # r == 15: advance over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad JPEG refinement symbol")
                s_val = p1 if reader.read(1) else m1
            while k <= se:
                v = blk[k]
                if v != 0:
                    if reader.read(1) and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s_val:
                if k > se:
                    raise ValueError("JPEG refinement ran past band end")
                blk[k] = s_val
            k += 1
    if eobrun > 0:
        # inside an EOB run: correct this block's remaining nonzeros
        while k <= se:
            v = blk[k]
            if v != 0 and reader.read(1) and (v & p1) == 0:
                blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _assemble_progressive(frame, prog, qtables):
    h, w = frame["h"], frame["w"]
    out_planes = []
    for ci, c in enumerate(frame["comps"]):
        bw, bh = prog.mcux * c["h"], prog.mcuy * c["v"]
        q = qtables[c["tq"]]
        coef = np.asarray(prog.store[ci], dtype=np.int64) * q[None, :]
        spatial = _idct_blocks(coef)
        grid = spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
        plane = grid.reshape(bh * 8, bw * 8)
        ry, rx = prog.vmax // c["v"], prog.hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    return _planes_to_pixels(out_planes)


# The 2-D IDCT is linear in the 64 coefficients, so the whole transform
# collapses to one (64, 64) matrix — kron(A, A)[ij, uv] = A[i,u]*A[j,v]
# — with the unzigzag permutation folded into the row order. One big
# (n, 64) @ (64, 64) GEMM replaces n small broadcast 8x8 matmuls
# (~6x on whole-image decode). Summation order differs from the
# two-stage A.T @ F @ A at the ulp level pre-round; post-round pixels
# measured identical across 6.4M fuzzed blocks, and the invariants the
# suite pins (native == Python walk, progressive == baseline) are
# structural — every decode path shares this one function.
_IDCT_M = np.kron(_A, _A)[ZIGZAG]


def _idct_blocks(coef_zz: np.ndarray) -> np.ndarray:
    """(n, 64) dequantized zigzag coefficients -> (n, 8, 8) uint8-range
    spatial samples (level-shifted, clipped)."""
    s = coef_zz.astype(np.float64) @ _IDCT_M
    s += 128.0
    np.round(s, out=s)
    np.clip(s, 0, 255, out=s)
    return s.reshape(-1, 8, 8)


def _ycbcr_to_rgb(yp: np.ndarray, cbp: np.ndarray, crp: np.ndarray) -> np.ndarray:
    """Takes the three planes directly (contiguous, no HxWx3 stack —
    profiling showed the stack/slice round-trip dominated assemble).
    The per-channel float64 expressions, round and clip are unchanged,
    so pixels stay bit-identical to the previous stacked form."""
    y = np.asarray(yp, dtype=np.float64)
    cb = np.asarray(cbp, dtype=np.float64) - 128.0
    cr = np.asarray(crp, dtype=np.float64) - 128.0
    out = np.empty((*y.shape, 3), dtype=np.uint8)
    for i, ch in enumerate((
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    )):
        np.round(ch, out=ch)
        np.clip(ch, 0, 255, out=ch)
        out[:, :, i] = ch
    return out


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling, clamped to [1, 255]."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _fdct_quant(plane: np.ndarray, q_raster: np.ndarray) -> np.ndarray:
    """(H8, W8) plane -> (nblocks, 64) quantized zigzag coefficients."""
    h8, w8 = plane.shape
    blocks = (
        plane.reshape(h8 // 8, 8, w8 // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    F = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A, optimize=True)
    q = np.round(F.reshape(-1, 64) / q_raster[None, :]).astype(np.int64)
    return q[:, ZIGZAG]


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_blocks(
    writer: _BitWriter,
    blocks: np.ndarray,
    order: list[tuple[int, int]],
    dc_codes: list[dict],
    ac_codes: list[dict],
    preds: list[int],
) -> None:
    """Interleave pre-quantized blocks in MCU order. ``order`` lists
    (component, block_index) pairs per MCU."""
    for ci, bi in order:
        coefs = blocks[ci][bi]
        dcc, acc = dc_codes[ci], ac_codes[ci]
        diff = int(coefs[0]) - preds[ci]
        preds[ci] = int(coefs[0])
        t = _category(diff)
        code, ln = dcc[t]
        writer.write(code, ln)
        writer.write(_mag_bits(diff, t), t)
        run = 0
        nz = np.nonzero(coefs[1:])[0]
        last = int(nz[-1]) + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(coefs[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = acc[0xF0]
                writer.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = acc[(run << 4) | s]
            writer.write(code, ln)
            writer.write(_mag_bits(v, s), s)
            run = 0
        if last < 63:
            code, ln = acc[0x00]
            writer.write(code, ln)


def _code_map(bits: list[int], vals: list[int]) -> dict:
    return {sym: (code, ln) for sym, code, ln in _canonical_codes(bits, vals)}


class _CountingMap:
    """Stand-in for a code map during the statistics pass of two-pass
    (optimized-table) encoding: every symbol lookup is tallied and
    answered with a zero-length code, so the EXACT emission logic runs
    unchanged while only counting."""

    def __init__(self):
        self.counts: dict[int, int] = {}

    def __getitem__(self, sym: int):
        self.counts[sym] = self.counts.get(sym, 0) + 1
        return (0, 0)


def _optimal_table(counts: dict[int, int]) -> tuple[list[int], list[int]]:
    """Length-limited Huffman table from symbol frequencies per T.81
    Annex K.2 (the classic two-least-merge with an extra pseudo-symbol
    reserving the all-ones code, then the >16-bit adjustment).  Returns
    (bits[1..16], vals) for a DHT segment."""
    if not counts:
        # table declared but never used (e.g. a scan script with no
        # DC-first scan): any 1-entry table is valid
        return [1] + [0] * 15, [0]
    freq = [0] * 257
    for s, f in counts.items():
        freq[s] = f
    freq[256] = 1  # pseudo-symbol: keeps the all-ones code unassigned
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        # two smallest nonzero frequencies; ties -> larger symbol value
        # (matches the Annex K.2 figure; any tie-break yields a valid
        # table, a fixed one keeps encoding deterministic)
        c1 = c2 = -1
        v = None
        for i in range(257):
            if freq[i] and (v is None or freq[i] <= v):
                v = freq[i]
                c1 = i
        v = None
        for i in range(257):
            if freq[i] and i != c1 and (v is None or freq[i] <= v):
                v = freq[i]
                c2 = i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32  # fold lengths beyond 16 back (K.2 adjustment)
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the pseudo-symbol's code (longest, all-ones end)
    vals = [
        s for s in sorted(range(256), key=lambda s: (codesize[s], s))
        if codesize[s]
    ]
    return bits[1:17], vals


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    ph = (plane.shape[0] + mult - 1) // mult * mult
    pw = (plane.shape[1] + mult - 1) // mult * mult
    return np.pad(
        plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
        mode="edge",
    )


def _plan_blocks(pixels: np.ndarray, quality: int, subsample: str):
    """Shared sequential/progressive encode front half: color convert,
    pad, subsample, forward-DCT + quantize.  Returns a plan dict with
    per-component quantized zigzag blocks, the interleaved MCU block
    order, and each component's real (non-padded) block grid."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = pixels.ndim == 2 or pixels.shape[2] == 1
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w = pixels.shape[:2]
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsample!r}")
    # tables are stored in NATURAL (raster) order; the DQT segment and
    # the coefficient stream use ZIGZAG order
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    ql_r = ql.astype(np.float64)
    qc_r = qc.astype(np.float64)
    if gray:
        comps_sof = [(1, 0x11, 0)]
        scan_comp = [(1, 0x00)]
        y = _pad_to(pixels[:, :, 0].astype(np.float64), 8)
        blocks = [_fdct_quant(y, ql_r)]
        orders = [[(0, m)] for m in range(blocks[0].shape[0])]
        grids = [(-(-w // 8), -(-h // 8), y.shape[1] // 8)]
    elif subsample == "420":
        comps_sof = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
        scan_comp = [(1, 0x00), (2, 0x11), (3, 0x11)]
        ycc = _rgb_to_ycbcr(pixels[:, :, :3])
        y = _pad_to(ycc[:, :, 0], 16)
        cb_full = _pad_to(ycc[:, :, 1], 16)
        cr_full = _pad_to(ycc[:, :, 2], 16)
        cb = cb_full.reshape(-1, 2, cb_full.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        cr = cr_full.reshape(-1, 2, cr_full.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        blocks = [
            _fdct_quant(y, ql_r),
            _fdct_quant(cb, qc_r),
            _fdct_quant(cr, qc_r),
        ]
        mcux, mcuy = y.shape[1] // 16, y.shape[0] // 16
        ybw = y.shape[1] // 8
        cbw = cb.shape[1] // 8
        orders = []
        for my in range(mcuy):
            for mx in range(mcux):
                order = [
                    (0, (my * 2 + byy) * ybw + mx * 2 + bxx)
                    for byy in range(2)
                    for bxx in range(2)
                ]
                order.append((1, my * cbw + mx))
                order.append((2, my * cbw + mx))
                orders.append(order)
        cw, ch = -(-w // 2), -(-h // 2)  # chroma extent (ceil)
        cg = (-(-cw // 8), -(-ch // 8), cbw)
        grids = [(-(-w // 8), -(-h // 8), ybw), cg, cg]
    else:
        comps_sof = [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
        scan_comp = [(1, 0x00), (2, 0x11), (3, 0x11)]
        ycc = _rgb_to_ycbcr(pixels[:, :, :3])
        y = _pad_to(ycc[:, :, 0], 8)
        cb = _pad_to(ycc[:, :, 1], 8)
        cr = _pad_to(ycc[:, :, 2], 8)
        blocks = [
            _fdct_quant(y, ql_r),
            _fdct_quant(cb, qc_r),
            _fdct_quant(cr, qc_r),
        ]
        orders = [
            [(0, m), (1, m), (2, m)] for m in range(blocks[0].shape[0])
        ]
        g = (-(-w // 8), -(-h // 8), y.shape[1] // 8)
        grids = [g, g, g]
    return {
        "gray": gray, "h": h, "w": w, "ql": ql, "qc": qc,
        "comps_sof": comps_sof, "scan_comp": scan_comp,
        "blocks": blocks, "orders": orders, "grids": grids,
    }


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
    optimize: bool = False,
) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W)/(H, W, 1) gray -> baseline JFIF
    bytes. ``subsample``: '444' or '420' (color only).
    ``restart_interval``: emit DRI + RSTn markers every N MCUs (0 = off)
    — restart points bound error propagation and allow a decoder to
    parallelize segments. ``optimize``: two-pass per-image Huffman
    tables (T.81 K.2) instead of the Annex K.3 typical tables — smaller
    files for ~2x entropy-pass cost; the quantized coefficients (and
    therefore the decoded pixels) are identical either way."""
    plan = _plan_blocks(pixels, quality, subsample)
    gray, h, w = plan["gray"], plan["h"], plan["w"]
    ql, qc = plan["ql"], plan["qc"]
    blocks, orders = plan["blocks"], plan["orders"]
    comps_sof, scan_comp = plan["comps_sof"], plan["scan_comp"]

    if optimize:
        # statistics pass: identical emission logic, counting code maps
        cdc_l, cac_l = _CountingMap(), _CountingMap()
        cdc_c, cac_c = _CountingMap(), _CountingMap()
        if gray:
            cdcs, cacs = [cdc_l], [cac_l]
        else:
            cdcs = [cdc_l, cdc_c, cdc_c]
            cacs = [cac_l, cac_c, cac_c]
        sink = _BitWriter()
        preds0 = [0] * len(blocks)
        for mi, order in enumerate(orders):
            _encode_blocks(sink, blocks, order, cdcs, cacs, preds0)
            if restart_interval and (mi + 1) % restart_interval == 0:
                preds0 = [0] * len(blocks)
        dc_l_tab = _optimal_table(cdc_l.counts)
        ac_l_tab = _optimal_table(cac_l.counts)
        if not gray:
            dc_c_tab = _optimal_table(cdc_c.counts)
            ac_c_tab = _optimal_table(cac_c.counts)
    else:
        dc_l_tab = (DC_LUMA_BITS, DC_LUMA_VALS)
        ac_l_tab = (AC_LUMA_BITS, AC_LUMA_VALS)
        if not gray:
            dc_c_tab = (DC_CHROMA_BITS, DC_CHROMA_VALS)
            ac_c_tab = (AC_CHROMA_BITS, AC_CHROMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    # DQT
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        ql[ZIGZAG].astype(np.uint8).tolist()
    )
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            qc[ZIGZAG].astype(np.uint8).tolist()
        )

    sof = struct.pack(">BHHB", 8, h, w, len(comps_sof))
    for cid, hv, tq in comps_sof:
        sof += struct.pack(">BBB", cid, hv, tq)
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload

    out += dht(0, 0, *dc_l_tab)
    out += dht(1, 0, *ac_l_tab)
    if not gray:
        out += dht(0, 1, *dc_c_tab)
        out += dht(1, 1, *ac_c_tab)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(scan_comp)])
    for cid, tt in scan_comp:
        sos += bytes([cid, tt])
    sos += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_l = _code_map(*dc_l_tab)
    ac_l = _code_map(*ac_l_tab)
    if gray:
        dcs, acs = [dc_l], [ac_l]
    else:
        dc_c = _code_map(*dc_c_tab)
        ac_c = _code_map(*ac_c_tab)
        dcs, acs = [dc_l, dc_c, dc_c], [ac_l, ac_c, ac_c]

    writer = _BitWriter()
    preds = [0] * len(blocks)
    rst = 0
    for mi, order in enumerate(orders):
        _encode_blocks(writer, blocks, order, dcs, acs, preds)
        if (
            restart_interval
            and (mi + 1) % restart_interval == 0
            and mi + 1 < len(orders)
        ):
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * len(blocks)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G).  Correctness tool: it produces the
# same quantized coefficients as ``encode_jpeg`` for the same inputs, so
# ``decode(progressive) == decode(baseline)`` pixel-exact — the oracle
# the decoder's progressive paths are verified against.  The Huffman
# tables are deliberately flat/simple (every symbol representable,
# including EOBn runs the Annex K baseline tables cannot express).
# ---------------------------------------------------------------------------

# flat tables: DC 12 symbols at 4 bits; AC all 256 symbols at 9/10 bits
# (canonical assignment leaves the all-ones code unassigned, as T.81
# requires)
DC_PROG_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC_PROG_VALS = list(range(12))
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
AC_PROG_VALS = list(range(256))

# default scan script (the common tooling default for YCbCr): DC of all
# components at Al=1; AC bands per component at coarse precision; then
# one-bit refinement passes down to Al=0.  (comp_indices, Ss, Se, Ah, Al)
_PROG_SCRIPT_COLOR = [
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),
]
_PROG_SCRIPT_GRAY = [
    ([0], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]


def _flush_eobrun(writer: _BitWriter, ac_codes: dict, state: dict) -> None:
    """Emit the pending EOBn symbol (+ its extension bits) and any
    correction bits buffered while the run accumulated."""
    eobrun = state["eobrun"]
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, ln = ac_codes[nbits << 4]
        writer.write(code, ln)
        if nbits:
            writer.write(eobrun & ((1 << nbits) - 1), nbits)
        state["eobrun"] = 0
    for b in state["bits"]:
        writer.write(b, 1)
    state["bits"] = []


def _emit_ac_first_block(
    writer: _BitWriter, coefs, ss: int, se: int, al: int,
    ac_codes: dict, state: dict,
) -> None:
    """One block of a first AC scan: sign-magnitude point transform
    (|v| >> Al), run/size symbols, EOB-run accumulation across blocks."""
    r = 0
    emitted = False
    for k in range(ss, se + 1):
        v = int(coefs[k])
        mag = (v if v >= 0 else -v) >> al
        if mag == 0:
            r += 1
            continue
        if state["eobrun"] > 0 or state["bits"]:
            _flush_eobrun(writer, ac_codes, state)
        while r > 15:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            r -= 16
        s = mag.bit_length()
        code, ln = ac_codes[(r << 4) | s]
        writer.write(code, ln)
        writer.write(_mag_bits(mag if v >= 0 else -mag, s), s)
        r = 0
        emitted = True
    if r > 0 or not emitted:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(writer, ac_codes, state)


def _emit_ac_refine_block(
    writer: _BitWriter, coefs, ss: int, se: int, al: int,
    ac_codes: dict, state: dict,
) -> None:
    """One block of an AC refinement scan: newly-nonzero coefficients
    (|v|>>Al == 1) emit run/1 symbols + a sign bit; already-nonzero ones
    buffer one correction bit each, released with the next symbol."""
    absv = [0] * 64
    eob = ss - 1
    for k in range(ss, se + 1):
        v = int(coefs[k])
        m = (v if v >= 0 else -v) >> al
        absv[k] = m
        if m == 1:
            eob = k
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        temp = absv[k]
        if temp == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _flush_eobrun(writer, ac_codes, state)
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            r -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if temp > 1:
            # previously-nonzero coefficient: one correction bit
            br.append(temp & 1)
            continue
        _flush_eobrun(writer, ac_codes, state)
        code, ln = ac_codes[(r << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if int(coefs[k]) >= 0 else 0, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        state["eobrun"] += 1
        state["bits"].extend(br)
        if state["eobrun"] == 0x7FFF or len(state["bits"]) > 937:
            _flush_eobrun(writer, ac_codes, state)


def _emit_progressive_scan(
    writer: _BitWriter, scan_desc, blocks, orders, grids,
    dc_codes, ac_codes,
) -> None:
    """Entropy data for one progressive scan. ``dc_codes``/``ac_codes``
    may be real code maps or ``_CountingMap`` shims (statistics pass)."""
    comp_list, ss, se, ah, al = scan_desc
    if ss == 0:
        # interleaved over MCUs when multi-component, else the
        # component's real block grid (matching the decoder's
        # non-interleaved geometry)
        if len(comp_list) > 1:
            units = [
                [(ci, bi) for ci, bi in order if ci in comp_list]
                for order in orders
            ]
        else:
            ci = comp_list[0]
            rbw, rbh, stride = grids[ci]
            units = [
                [(ci, row * stride + col)]
                for row in range(rbh)
                for col in range(rbw)
            ]
        if ah == 0:
            preds = {ci: 0 for ci in comp_list}
            for unit in units:
                for ci, bi in unit:
                    v = int(blocks[ci][bi][0]) >> al  # arithmetic
                    diff = v - preds[ci]
                    preds[ci] = v
                    t = _category(diff)
                    code, ln = dc_codes[t]
                    writer.write(code, ln)
                    writer.write(_mag_bits(diff, t), t)
        else:
            for unit in units:
                for ci, bi in unit:
                    writer.write((int(blocks[ci][bi][0]) >> al) & 1, 1)
    else:
        ci = comp_list[0]
        rbw, rbh, stride = grids[ci]
        state = {"eobrun": 0, "bits": []}
        for row in range(rbh):
            for col in range(rbw):
                coefs = blocks[ci][row * stride + col]
                if ah == 0:
                    _emit_ac_first_block(
                        writer, coefs, ss, se, al, ac_codes, state
                    )
                else:
                    _emit_ac_refine_block(
                        writer, coefs, ss, se, al, ac_codes, state
                    )
        _flush_eobrun(writer, ac_codes, state)


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    scans: list[tuple[list[int], int, int, int, int]] | None = None,
    optimize: bool = True,
) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W)/(H, W, 1) gray -> progressive
    (SOF2) JFIF bytes.  Same color/subsample/quantization pipeline as
    ``encode_jpeg`` — only the scan structure differs, so decoding
    either stream yields identical pixels.

    ``scans``: optional scan script as (comp_indices, Ss, Se, Ah, Al)
    tuples; the default is the common DC-first + per-component AC-band +
    refinement script.  A partial script (e.g. DC-only) is legal and
    decodes to the matching coarse preview.

    ``optimize`` (default True, as in common tooling for progressive):
    two-pass per-image Huffman tables via T.81 K.2.  ``False`` keeps the
    simple flat tables — every symbol representable, but ~9 bits each."""
    plan = _plan_blocks(pixels, quality, subsample)
    gray, h, w = plan["gray"], plan["h"], plan["w"]
    blocks, orders, grids = plan["blocks"], plan["orders"], plan["grids"]
    if scans is None:
        scans = _PROG_SCRIPT_GRAY if gray else _PROG_SCRIPT_COLOR
    for comp_list, ss, se, ah, al in scans:
        if ss == 0 and se != 0:
            raise ValueError("DC scan requires Se=0")
        if ss > 0 and len(comp_list) != 1:
            raise ValueError("AC scans must be single-component")

    if optimize:
        cdc, cac = _CountingMap(), _CountingMap()
        for scan_desc in scans:
            _emit_progressive_scan(
                _BitWriter(), scan_desc, blocks, orders, grids, cdc, cac
            )
        dc_tab = _optimal_table(cdc.counts)
        ac_tab = _optimal_table(cac.counts)
    else:
        dc_tab = (DC_PROG_BITS, DC_PROG_VALS)
        ac_tab = (AC_PROG_BITS, AC_PROG_VALS)

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        plan["ql"][ZIGZAG].astype(np.uint8).tolist()
    )
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            plan["qc"][ZIGZAG].astype(np.uint8).tolist()
        )
    sof = struct.pack(">BHHB", 8, h, w, len(plan["comps_sof"]))
    for cid, hv, tq in plan["comps_sof"]:
        sof += struct.pack(">BBB", cid, hv, tq)
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    dht_dc = bytes([0x00]) + bytes(dc_tab[0]) + bytes(dc_tab[1])
    out += b"\xff\xc4" + struct.pack(">H", len(dht_dc) + 2) + dht_dc
    dht_ac = bytes([0x10]) + bytes(ac_tab[0]) + bytes(ac_tab[1])
    out += b"\xff\xc4" + struct.pack(">H", len(dht_ac) + 2) + dht_ac

    dc_codes = _code_map(*dc_tab)
    ac_codes = _code_map(*ac_tab)
    comp_ids = [cid for cid, _, _ in plan["comps_sof"]]

    for scan_desc in scans:
        comp_list, ss, se, ah, al = scan_desc
        sos = bytes([len(comp_list)])
        for ci in comp_list:
            sos += bytes([comp_ids[ci], 0x00])  # Td=0, Ta=0
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        writer = _BitWriter()
        _emit_progressive_scan(
            writer, scan_desc, blocks, orders, grids, dc_codes, ac_codes
        )
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
