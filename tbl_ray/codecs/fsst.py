"""``fsst`` codec — Fast Static Symbol Table string compression.

From-scratch implementation of the FSST scheme published by Boncz,
Neumann & Leis (VLDB 2020, public paper): a per-chunk table of up to 255
learned symbols of 1–8 bytes, codes 0–254, with code 255 as an escape
prefix for a literal byte. Natural winner for natural-language ``text`` /
``url`` columns (SURVEY.md §6).

Implementation notes (SURVEY.md §7.4.3 — numpy-vectorized throughout):

- **Training** runs on a bounded sample (≤64 KiB) in plain Python — a few
  greedy-encode generations counting symbol and adjacent-pair gains
  (gain = freq × len), keeping the top 255 (~130 ms once per column per
  actor; tables are reused across chunks, so the cost amortizes to ~0).
- **Encode** concatenates the column's data buffer and splits it into
  fixed-size segments; one cursor per segment advances greedily
  (longest-match-first, lengths 8→1 via per-length sorted uint64 prefix
  tables + ``searchsorted``), so every loop iteration is vectorized over
  *all* segments while iterations are bounded by the segment size.
  Matches may cross string boundaries (harmless — original string offsets
  are stored separately) but never segment boundaries.
- **Decode** is a single vectorized pass: escape positions resolve via the
  255-run parity trick (within a maximal run of 255 bytes, escapes sit at
  even offsets — a run can only start in the escape role because a
  non-255 predecessor is never an escape), then symbol bytes scatter via
  repeat/cumsum offset arithmetic. Segment starts reset the parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tbl_ray.codecs import native
from tbl_ray.codecs.base import (
    binary_from_parts,
    binary_parts,
    is_binary_like,
    register,
)
from tbl_ray.codecs.bitutil import bits_needed, pack, unpack

_ESC = 255
_MAX_SYM = 8
_MAX_TABLE = 255
_SEG = 1024
_TRAIN_SAMPLE = 65536
_TRAIN_GENERATIONS = 4


# ---------------------------------------------------------------------------
# training (python, bounded sample)
# ---------------------------------------------------------------------------


def _admit(candidates: list[bytes]) -> list[bytes]:
    """Admission filter mirroring :func:`_encode_tables`: two hash-slot ways
    per 3-byte prefix, one slot per 2-byte value / single byte. Candidates
    the encoder could never reach don't waste table entries — training and
    encoding see the same symbol set."""
    seen_slots: dict[int, int] = {}
    seen2: set[int] = set()
    seen1: set[int] = set()
    out: list[bytes] = []
    for s in candidates:
        L = len(s)
        if L >= 3:
            first3 = np.uint64(int.from_bytes(s[:3], "little"))
            slot = int(_hash3(np.array([first3], dtype=np.uint64))[0])
            if seen_slots.get(slot, 0) >= 2:
                continue
            seen_slots[slot] = seen_slots.get(slot, 0) + 1
        elif L == 2:
            v = int.from_bytes(s, "little")
            if v in seen2:
                continue
            seen2.add(v)
        else:
            if s[0] in seen1:
                continue
            seen1.add(s[0])
        out.append(s)
        if len(out) == _MAX_TABLE:
            break
    return out


def train_symbols(sample: bytes) -> list[bytes]:
    """Learn up to 255 symbols (1-8 bytes) maximizing freq × len gain,
    with the training greedy matching the ENCODER's reachability (hash-slot
    candidates first, then 2-byte / 1-byte direct hits)."""
    if not sample:
        return []
    sample = sample[:_TRAIN_SAMPLE]
    symbols: list[bytes] = []
    for _ in range(_TRAIN_GENERATIONS):
        # emulate the encoder's match structures in dict form
        by_prefix3: dict[bytes, list[bytes]] = {}
        by2: set[bytes] = set()
        by1: set[bytes] = set()
        for s in symbols:
            if len(s) >= 3:
                by_prefix3.setdefault(s[:3], []).append(s)
            elif len(s) == 2:
                by2.add(s)
            else:
                by1.add(s)
        seq: list[bytes] = []
        pos, n = 0, len(sample)
        while pos < n:
            emitted = None
            for s in by_prefix3.get(sample[pos : pos + 3], ()):
                if sample.startswith(s, pos):
                    emitted = s
                    break
            if emitted is None and sample[pos : pos + 2] in by2:
                emitted = sample[pos : pos + 2]
            if emitted is None:
                emitted = sample[pos : pos + 1]
            seq.append(emitted)
            pos += len(emitted)
        gains: dict[bytes, int] = {}
        for s in seq:
            gains[s] = gains.get(s, 0) + len(s)
        for a, b in zip(seq, seq[1:]):
            pair = a + b
            if len(pair) <= _MAX_SYM:
                gains[pair] = gains.get(pair, 0) + len(pair)
        ranked = [
            s for s, _ in sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))
        ]
        symbols = _admit(ranked)
    return symbols


_HASH_BITS = 14
_HASH_SIZE = 1 << _HASH_BITS


def _hash3(first3: np.ndarray) -> np.ndarray:
    """Fibonacci hash of a 3-byte prefix -> table slot (paper §3.2 style).

    Computed entirely in uint32: the slot is bits 18..31 of the Fibonacci
    product, which survive mod-2^32 wraparound unchanged — 6x cheaper than
    the equivalent uint64 multiply on this host, bit-identical slots."""
    return (
        (first3.astype(np.uint32) & np.uint32(0xFFFFFF)) * np.uint32(2654435769)
    ) >> np.uint32(32 - _HASH_BITS)


def _encode_tables(symbols: list[bytes]):
    """Build the paper-style match structures:

    - ``long``: hash table on the first 3 bytes for symbols of length >= 3
      (one candidate per slot; losers on hash conflict are simply never
      emitted — decode still knows them, compression just loses a little);
    - ``short2``: direct-indexed uint16 -> code for 2-byte symbols;
    - ``short1``: direct-indexed byte -> code for 1-byte symbols.
    """
    # little-endian symbol values: byte 0 of the stream is the LSB, so the
    # length-L prefix of a window w is just ``w & ((1 << 8L) - 1)`` — no
    # byte-swap pass over the data
    # two-way set-associative: gain-ordered insertion, way 2 catches hash
    # conflicts (probed only on way-1 misses — cheap, recovers most of the
    # ratio a 1-way table loses on shared 3-byte prefixes)
    long_val = np.zeros((2, _HASH_SIZE), dtype=np.uint64)  # symbol bytes, LE
    long_len = np.zeros((2, _HASH_SIZE), dtype=np.int32)  # 0 = empty slot
    long_code = np.full((2, _HASH_SIZE), _ESC, dtype=np.uint8)
    short2 = np.full(65536, _ESC, dtype=np.uint8)
    short1 = np.full(256, _ESC, dtype=np.uint8)
    for code, s in enumerate(symbols):
        L = len(s)
        if L >= 3:
            first3 = np.uint64(int.from_bytes(s[:3], "little"))
            slot = int(_hash3(np.array([first3], dtype=np.uint64))[0])
            for way in (0, 1):
                if long_len[way, slot] == 0:
                    long_val[way, slot] = int.from_bytes(s, "little")
                    long_len[way, slot] = L
                    long_code[way, slot] = code
                    break
        elif L == 2:
            short2[int.from_bytes(s, "little")] = code
        else:
            short1[s[0]] = code
    return long_val, long_len, long_code, short2, short1


# ---------------------------------------------------------------------------
# vectorized encode
# ---------------------------------------------------------------------------


def _encode_stream_native(data: np.ndarray, symbols: list[bytes]):
    """C-kernel walk (``_fsst_native.c``) — bit-identical to the numpy
    path (same tables, same priority, same segment structure; verified in
    ``tests/test_codecs.py::test_native_matches_numpy``) at ~20-30x the
    throughput: the greedy byte walk is the one loop numpy can't amortize."""
    M = len(data)
    n_segs = (M + _SEG - 1) // _SEG
    long_val, long_len, long_code, short2, short1 = _encode_tables(symbols)
    _L = native.lib()
    data_p = np.empty(M + 8, np.uint8)
    data_p[:M] = data
    data_p[M:] = 0
    out = np.empty(2 * M + 8, np.uint8)
    seg_lens = np.empty(n_segs, np.int64)
    n = _L.fsst_encode(
        data_p.ctypes.data,
        M,
        _SEG,
        long_val.ctypes.data,
        long_len.ctypes.data,
        long_code.ctypes.data,
        short2.ctypes.data,
        short1.ctypes.data,
        _HASH_BITS,
        out.ctypes.data,
        seg_lens.ctypes.data,
    )
    return out[:n], seg_lens


def _encode_stream(data: np.ndarray, symbols: list[bytes]):
    """uint8 data -> (encoded uint8 stream, per-segment encoded lengths).

    Native C kernel when available (compile-on-demand, see
    :mod:`tbl_ray.codecs.native`); otherwise the numpy walk below: one
    cursor per segment advances greedily; every loop iteration advances all
    still-active segments by one emitted symbol, with matching done by pure
    gathers into the hash/direct tables — work is O(visited positions), i.e.
    O(output symbols), never O(positions × lengths).
    """
    M = len(data)
    n_segs = (M + _SEG - 1) // _SEG
    if M == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.int64)
    if native.lib() is not None:
        return _encode_stream_native(data, symbols)

    long_val, long_len, long_code, short2, short1 = _encode_tables(symbols)
    data_p = np.concatenate([data, np.zeros(_MAX_SYM, np.uint8)])
    # two-tier windows: a 4-byte LE window per position covers hashing,
    # short matches and symbols up to 4 bytes; the high 4 bytes of a long
    # candidate are read as the window at cursor+4, gathered only for the
    # (rare) positions whose hash-slot symbol is longer than 4. Halves the
    # dominant traffic vs materializing 8-byte windows everywhere.
    w32 = (
        np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(data_p, 4)[: M + 4]
        )
        .view(np.uint32)
        .ravel()
    )
    mask32 = np.zeros(5, dtype=np.uint32)
    for L in range(5):
        mask32[L] = np.uint32((1 << (8 * L)) - 1 if L < 4 else 0xFFFFFFFF)
    # per-slot split symbol values: low 4 bytes (masked to min(len,4)) and
    # high bytes 5..8 (masked to len-4); masks pre-gathered per slot so the
    # loop does one gather instead of minimum+index
    lo_len = np.minimum(long_len, 4)
    hi_len = np.maximum(long_len - 4, 0)
    long_lomask = mask32[lo_len]
    long_lo = (long_val & long_lomask.astype(np.uint64)).astype(np.uint32)
    long_hi = ((long_val >> np.uint64(32)) & mask32[hi_len].astype(np.uint64)).astype(
        np.uint32
    )
    long_len_m1 = (long_len - 1).astype(np.uint32)  # 0-len slots wrap to 2^32-1

    # int32 loop state: halves the memory traffic of the greedy walk (the
    # bandwidth-bound part); callers chunk columns < 2 GiB so i32 is safe
    seg_starts = np.arange(n_segs, dtype=np.int32) * np.int32(_SEG)
    seg_ends = np.minimum(
        seg_starts.astype(np.int64) + _SEG, M
    ).astype(np.int32)
    cursors = seg_starts.copy()
    seg_ids_all: list[np.ndarray] = []
    codes_all: list[np.ndarray] = []
    pos_list: list[np.ndarray] = []
    bytepos_all: list[np.ndarray] = []
    # every segment is active contiguously from iteration 0, so a record
    # emitted at iteration k sits at stream position k of its segment; its
    # BYTE position is k + (escapes so far) — tracked incrementally. This
    # replaces the global stable argsort + full-size cumsum with a direct
    # scatter at the end.
    esc_sofar = np.zeros(n_segs, dtype=np.int32)
    iters_active = np.zeros(n_segs, dtype=np.int32)

    k = 0
    active_idx = np.arange(n_segs, dtype=np.int32)
    while len(active_idx):
        cur = cursors[active_idx]
        w = w32[cur]
        room = seg_ends[active_idx] - cur

        # long match: two-way hash-slot candidates on the 3-byte prefix;
        # low 4 bytes compare against the u32 window, the high bytes only
        # gather (cursor+4 window) for the rare len>4 candidates
        slot = _hash3(w)
        sl = long_len[0][slot]
        # (len-1) < room as a single unsigned compare covers both len>0 and
        # len<=room (empty slots wrapped to 2^32-1)
        long_ok = (long_len_m1[0][slot] < room.astype(np.uint32)) & (
            (w & long_lomask[0][slot]) == long_lo[0][slot]
        )
        needhi = np.flatnonzero(long_ok & (sl > 4))
        if len(needhi):
            hi = w32[cur[needhi] + 4]
            hibad = (hi & mask32[sl[needhi] - 4]) != long_hi[0][slot[needhi]]
            long_ok[needhi[hibad]] = False
        lcode = long_code[0][slot]
        miss = np.flatnonzero(~long_ok)
        if len(miss):
            mslot = slot[miss]
            sl2 = long_len[1][mslot]
            ok2 = (long_len_m1[1][mslot] < room[miss].astype(np.uint32)) & (
                (w[miss] & long_lomask[1][mslot]) == long_lo[1][mslot]
            )
            needhi2 = np.flatnonzero(ok2 & (sl2 > 4))
            if len(needhi2):
                hi2 = w32[cur[miss[needhi2]] + 4]
                hibad2 = (hi2 & mask32[sl2[needhi2] - 4]) != long_hi[1][mslot[needhi2]]
                ok2[needhi2[hibad2]] = False
            hit2 = miss[ok2]
            long_ok[hit2] = True
            sl[hit2] = sl2[ok2]
            lcode[hit2] = long_code[1][mslot[ok2]]

        c2 = short2[w & np.uint32(0xFFFF)]
        two_ok = (c2 != _ESC) & (room >= 2)
        c1 = short1[w & np.uint32(0xFF)]
        one_ok = c1 != _ESC

        mcode = np.where(long_ok, lcode, np.where(two_ok, c2, c1))
        # escapes: emit 255 + literal; record code=255, advance 1
        esc = ~(long_ok | two_ok | one_ok)
        mcode[esc] = _ESC
        step = np.where(
            long_ok, sl.astype(np.int32), np.where(two_ok, np.int32(2), np.int32(1))
        )

        seg_ids_all.append(active_idx)
        codes_all.append(mcode)
        pos_list.append(cur)
        bytepos_all.append(np.int32(k) + esc_sofar[active_idx])
        esc_sofar[active_idx] += esc
        iters_active[active_idx] = k + 1

        cursors[active_idx] = cur + step
        still = cursors[active_idx] < seg_ends[active_idx]
        active_idx = active_idx[still]
        k += 1

    seg_ids = np.concatenate(seg_ids_all)
    codes = np.concatenate(codes_all)
    escs = codes == _ESC  # only escapes carry code 255 (symbol codes < 255)
    bytepos = np.concatenate(bytepos_all)

    seg_enc_lens = (iters_active + esc_sofar).astype(np.int64)
    stream_starts = np.concatenate(([0], np.cumsum(seg_enc_lens)))
    out = np.zeros(int(stream_starts[-1]), dtype=np.uint8)
    abs_pos = stream_starts[seg_ids] + bytepos
    out[abs_pos] = codes
    if escs.any():
        esc_positions = np.concatenate(pos_list)[escs]
        out[abs_pos[escs] + 1] = data[esc_positions]
    return out, seg_enc_lens


# ---------------------------------------------------------------------------
# vectorized decode
# ---------------------------------------------------------------------------


def _decode_stream_native(
    enc: np.ndarray, seg_enc_lens: np.ndarray, symbols: list[bytes], out_size: int
) -> np.ndarray:
    sym_bytes = np.zeros((len(symbols), 8), np.uint8)
    sym_lens = np.empty(len(symbols), np.int64)
    for i, s in enumerate(symbols):
        sym_bytes[i, : len(s)] = np.frombuffer(s, np.uint8)
        sym_lens[i] = len(s)
    enc_c = np.ascontiguousarray(enc)
    lens_c = np.ascontiguousarray(seg_enc_lens, dtype=np.int64)
    # +8 capacity: the kernel emits every symbol as one 8-byte store and
    # keeps only its true length
    out = np.empty(out_size + 8, np.uint8)
    n = native.lib().fsst_decode(
        enc_c.ctypes.data,
        len(enc_c),
        lens_c.ctypes.data,
        len(lens_c),
        sym_bytes.ctypes.data,
        sym_lens.ctypes.data,
        len(symbols),
        out.ctypes.data,
        out_size,
    )
    if n != out_size:
        raise ValueError(f"fsst decode size mismatch: {n} != {out_size}")
    return out[:out_size]


def _decode_stream(
    enc: np.ndarray, seg_enc_lens: np.ndarray, symbols: list[bytes], out_size: int
) -> np.ndarray:
    if len(enc) == 0:
        return np.zeros(0, np.uint8)
    if native.lib() is not None:
        return _decode_stream_native(enc, seg_enc_lens, symbols, out_size)
    n = len(enc)
    seg_start_pos = np.concatenate(([0], np.cumsum(seg_enc_lens)))[:-1]
    is_seg_start = np.zeros(n, dtype=bool)
    is_seg_start[seg_start_pos[seg_start_pos < n]] = True

    # escape resolution, sparse: only the (rare) 255-bytes need the run
    # parity; everything here is O(#255s), not O(stream)
    idx255 = np.flatnonzero(enc == _ESC)
    is_escape = np.zeros(n, dtype=bool)
    is_literal = np.zeros(n, dtype=bool)
    if len(idx255):
        prev_is255 = np.zeros(len(idx255), dtype=bool)
        prev_is255[1:] = idx255[1:] - 1 == idx255[:-1]
        run_start = ~prev_is255 | is_seg_start[idx255]
        run_id = np.cumsum(run_start) - 1
        first_of_run = idx255[run_start][run_id]
        esc_local = ((idx255 - first_of_run) % 2) == 0
        esc_pos = idx255[esc_local]
        is_escape[esc_pos] = True
        lit_pos = esc_pos + 1
        lit_pos = lit_pos[lit_pos < n]
        lit_pos = lit_pos[~is_seg_start[lit_pos]]
        is_literal[lit_pos] = True

    # LUT decode: one (8-byte row, length) per code — learned symbols first,
    # then 256 single-byte pseudo-symbols for literals. The whole expansion
    # is one row gather + one boolean compaction (row-major order preserves
    # the stream), with no index-array construction (np.repeat/arange over
    # the output was the decode bottleneck).
    lut = np.zeros((_MAX_TABLE + 256, _MAX_SYM), dtype=np.uint8)
    lens = np.ones(_MAX_TABLE + 256, dtype=np.int64)
    for code, s in enumerate(symbols):
        lut[code, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[code] = len(s)
    lut[_MAX_TABLE :, 0] = np.arange(256, dtype=np.uint8)

    eff_code = enc.astype(np.int64)
    eff_code[is_literal] = enc[is_literal].astype(np.int64) + _MAX_TABLE
    emit = ~is_escape  # literals and symbol codes emit; escape markers don't
    e_codes = eff_code[emit]
    e_lens = lens[e_codes]
    mask_tab = np.arange(_MAX_SYM) < np.arange(_MAX_SYM + 1)[:, None]  # (9,8)
    out = lut[e_codes][mask_tab[e_lens]]
    if len(out) != out_size:
        raise ValueError(f"fsst decode size mismatch: {len(out)} != {out_size}")
    return out


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


def parse_symtab(symtab: bytes, n_syms: int) -> list[bytes]:
    """Inverse of the symtab buffer layout (lens byte per symbol + bodies)."""
    lens = list(symtab[:n_syms])
    body = symtab[n_syms:]
    symbols, off = [], 0
    for L in lens:
        symbols.append(body[off : off + L])
        off += L
    return symbols


class FsstCodec:
    name = "fsst"

    def supports(self, dtype: pa.DataType) -> bool:
        return is_binary_like(dtype)

    def encode(
        self, arr: pa.Array, symbols: list[bytes] | None = None
    ) -> tuple[dict, list[bytes]]:
        """``symbols`` lets callers reuse a table trained on an earlier
        chunk of the same column (per-partition amortization — the table is
        still stored per chunk, so decode never needs external state)."""
        offsets, data = binary_parts(arr)
        n = len(arr)
        if symbols is None:
            symbols = train_symbols(data[:_TRAIN_SAMPLE].tobytes())
        enc, seg_enc_lens = _encode_stream(data, symbols)

        str_lens = np.diff(offsets).astype(np.uint64)
        sl_width = bits_needed(int(str_lens.max())) if n else 0
        el_width = (
            bits_needed(int(seg_enc_lens.max())) if len(seg_enc_lens) else 0
        )
        symtab = bytes([len(s) for s in symbols]) + b"".join(symbols)
        params = {
            "n_syms": len(symbols),
            "seg": _SEG,
            "n_segs": int(len(seg_enc_lens)),
            "data_len": int(len(data)),
            "sl_width": sl_width,
            "el_width": el_width,
        }
        return params, [
            symtab,
            enc.tobytes(),
            pack(seg_enc_lens.astype(np.uint64), el_width),
            pack(str_lens, sl_width),
        ]

    def decode(self, params, buffers, n, dtype):
        symtab, enc_b, seg_b, sl_b = buffers
        symbols = parse_symtab(symtab, params["n_syms"])
        seg_enc_lens = unpack(seg_b, params["el_width"], params["n_segs"]).astype(
            np.int64
        )
        enc = np.frombuffer(enc_b, dtype=np.uint8)
        data = _decode_stream(enc, seg_enc_lens, symbols, params["data_len"])
        str_lens = unpack(sl_b, params["sl_width"], n).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(str_lens)))
        return binary_from_parts(offsets, data, dtype)


register(FsstCodec())
