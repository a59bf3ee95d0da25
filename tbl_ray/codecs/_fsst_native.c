/* Native FSST walk kernels — compiled on demand by tbl_ray.codecs.native.
 *
 * From-scratch C implementation of the same greedy longest-match-first
 * walk as the numpy path in tbl_ray/codecs/fsst.py (_encode_stream):
 * bit-identical output by construction — same Fibonacci hash, same
 * two-way set-associative long table, same short2/short1 direct tables,
 * same match priority (way0 > way1 > 2-byte > 1-byte > escape), same
 * fixed-size segment structure with matches never crossing a segment
 * boundary. The scheme is the public FSST paper (Boncz, Neumann & Leis,
 * VLDB 2020); nothing here derives from /root/reference (the reference
 * has no FSST at all — it delegates compression to parquet codecs).
 *
 * Little-endian hosts only (the Python loader checks sys.byteorder and
 * falls back to the numpy path otherwise): an 8-byte memcpy load IS the
 * little-endian window value the numpy path compares against.
 */

#include <stdint.h>
#include <string.h>

static const uint64_t MASK64[9] = {
    0x0000000000000000ULL, 0x00000000000000FFULL, 0x000000000000FFFFULL,
    0x0000000000FFFFFFULL, 0x00000000FFFFFFFFULL, 0x000000FFFFFFFFFFULL,
    0x0000FFFFFFFFFFFFULL, 0x00FFFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFFFULL,
};

/* Greedy-encode `data[0:M]` (padded by >= 8 readable bytes past M) into
 * `out` (capacity >= 2*M), one contiguous sub-stream per `seg`-byte
 * segment; per-segment encoded lengths land in `seg_lens`. Returns the
 * total encoded length. Tables are the C-contiguous (2, H) arrays built
 * by _encode_tables: index = way * H + slot. */
int64_t fsst_encode(const uint8_t *data, int64_t M, int64_t seg,
                    const uint64_t *long_val, const int32_t *long_len,
                    const uint8_t *long_code, const uint8_t *short2,
                    const uint8_t *short1, int32_t hash_bits, uint8_t *out,
                    int64_t *seg_lens) {
  const uint64_t H = (uint64_t)1 << hash_bits;
  const uint32_t shift = 32 - (uint32_t)hash_bits;
  int64_t o = 0;
  int64_t n_segs = (M + seg - 1) / seg;
  for (int64_t s = 0; s < n_segs; s++) {
    int64_t pos = s * seg;
    int64_t end = pos + seg < M ? pos + seg : M;
    int64_t seg_start_o = o;
    while (pos < end) {
      uint64_t win;
      memcpy(&win, data + pos, 8);
      uint32_t w32 = (uint32_t)win;
      uint64_t slot = ((w32 & 0xFFFFFFu) * 2654435769u) >> shift;
      int64_t room = end - pos;
      int64_t i0 = (int64_t)slot;
      int32_t L = long_len[i0];
      if (L > 0 && L <= room && (win & MASK64[L]) == long_val[i0]) {
        out[o++] = long_code[i0];
        pos += L;
        continue;
      }
      int64_t i1 = (int64_t)(H + slot);
      L = long_len[i1];
      if (L > 0 && L <= room && (win & MASK64[L]) == long_val[i1]) {
        out[o++] = long_code[i1];
        pos += L;
        continue;
      }
      uint8_t c2 = short2[w32 & 0xFFFFu];
      if (c2 != 255 && room >= 2) {
        out[o++] = c2;
        pos += 2;
        continue;
      }
      uint8_t c1 = short1[w32 & 0xFFu];
      if (c1 != 255) {
        out[o++] = c1;
        pos += 1;
        continue;
      }
      out[o++] = 255;
      out[o++] = data[pos];
      pos += 1;
    }
    seg_lens[s] = o - seg_start_o;
  }
  return o;
}

/* Decode `enc[0:N]` (segment lengths in `seg_lens[0:n_segs]`) back into
 * `out` (capacity out_size + 8: symbol emission is an unconditional
 * 8-byte memcpy of which only sym_lens[c] bytes are kept, so the caller
 * must pad the buffer by 8 writable bytes past out_size). `sym_bytes`/
 * `sym_lens` hold the n_syms learned symbols (8 bytes per row,
 * C-contiguous, same LUT layout as the numpy path). Escape parity resets
 * at every segment start, matching _decode_stream. Returns bytes
 * written, or -1 on overflow/corruption. */
int64_t fsst_decode(const uint8_t *enc, int64_t N, const int64_t *seg_lens,
                    int64_t n_segs, const uint8_t *sym_bytes,
                    const int64_t *sym_lens, int64_t n_syms, uint8_t *out,
                    int64_t out_size) {
  int64_t o = 0;
  int64_t p = 0;
  for (int64_t s = 0; s < n_segs; s++) {
    int64_t end = p + seg_lens[s];
    if (end > N)
      return -1;
    while (p < end) {
      uint8_t c = enc[p];
      if (c == 255) {
        if (p + 1 >= end || o >= out_size)
          return -1;
        out[o++] = enc[p + 1];
        p += 2;
      } else {
        if (c >= n_syms)
          return -1;
        int64_t L = sym_lens[c];
        if (o + L > out_size)
          return -1;
        memcpy(out + o, sym_bytes + (int64_t)c * 8, 8);
        o += L;
        p += 1;
      }
    }
  }
  return o;
}

/* MinHash signature kernel — one pass over the flat UTF-8 buffer instead
 * of the numpy path's n_hashes multiply/mask/reduceat passes (each a full
 * sweep of a len(data)-sized uint64 array: ~5 * n_hashes * 8 bytes of
 * memory traffic per input byte; this loop reads each byte once and keeps
 * the whole signature row in registers/L1).
 *
 * Bit-identical to tbl_ray/functions/dedup.py:minhash_signatures by
 * construction: same big-endian 8-byte window, same splitmix64 finalizer
 * (tbl_ray/webtable.py:_mix), same universal hash a[i]*h + b[i] with
 * uint64 wraparound, same U64_MAX masking rules (windows whose mixed
 * value lands on U64_MAX are treated as masked, exactly like the numpy
 * path's hi[h == U64_MAX] = U64_MAX).
 */
static inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

/* sig must be pre-sized n_rows * n_hashes; filled with U64_MAX here.
 * shingle is the window width in bytes (<= 8); rows shorter than it get
 * an all-U64_MAX signature row, matching the numpy path. */
void minhash_sig(const uint8_t *data, const int64_t *offsets, int64_t n_rows,
                 const uint64_t *a, const uint64_t *b, int32_t n_hashes,
                 int32_t shingle, uint64_t *sig) {
  uint64_t row_sig[256];
  if (n_hashes > 256)
    return; /* loader guards; numpy path handles wider signatures */
  for (int64_t r = 0; r < n_rows; r++) {
    for (int32_t i = 0; i < n_hashes; i++)
      row_sig[i] = 0xFFFFFFFFFFFFFFFFULL;
    int64_t start = offsets[r], end = offsets[r + 1];
    for (int64_t p = start; p + shingle <= end; p++) {
      uint64_t w;
      /* p + shingle <= end <= buffer length: always in-bounds for
       * shingle == 8 (the only width the Python caller uses) */
      memcpy(&w, data + p, 8);
      w = __builtin_bswap64(w) >> (8 * (8 - shingle)) << (8 * (8 - shingle));
      uint64_t h = splitmix64(w);
      if (h == 0xFFFFFFFFFFFFFFFFULL)
        continue; /* numpy masks natural U64_MAX hashes too */
      for (int32_t i = 0; i < n_hashes; i++) {
        uint64_t v = a[i] * h + b[i];
        if (v < row_sig[i])
          row_sig[i] = v;
      }
    }
    for (int32_t i = 0; i < n_hashes; i++)
      sig[r * (int64_t)n_hashes + i] = row_sig[i];
  }
}

/* ------------------------------------------------------------------ */
/* JPEG baseline entropy decode (T.81 section F.2) — the per-symbol    */
/* Huffman walk tbl_ray/stages/jpegcodec.py runs in Python otherwise.  */
/* Bit-identical to the Python _BitReader/_decode_block pair by        */
/* construction: MSB-first accumulator over the UNSTUFFED entropy      */
/* bytes, zero-fill past end of data, 16-bit-prefix LUT lookup, F.12   */
/* sign extension, identical ZRL/EOB/run-overflow semantics. Written   */
/* to the public ITU T.81 spec; nothing derives from /root/reference.  */

typedef struct {
  const uint8_t *d;
  int64_t n;
  int64_t pos;
  uint64_t acc;
  int nbits;
} jbits;

static inline void jfill(jbits *r, int need) {
  while (r->nbits < need) {
    uint64_t b = (r->pos < r->n) ? r->d[r->pos] : 0;
    r->pos++;
    r->acc = (r->acc << 8) | b;
    r->nbits += 8;
  }
}

static inline int64_t jread(jbits *r, int n) {
  if (n == 0)
    return 0;
  jfill(r, n);
  r->nbits -= n;
  int64_t v = (int64_t)(r->acc >> r->nbits);
  r->acc &= (((uint64_t)1 << r->nbits) - 1);
  return v;
}

/* T.81 F.12: map a t-bit magnitude to its signed value. */
static inline int64_t jextend(int64_t v, int t) {
  if (t == 0)
    return 0;
  return (v >= ((int64_t)1 << (t - 1))) ? v : v - ((int64_t)1 << t) + 1;
}

/* Decode `n_blocks` 8x8 blocks in stream order from one restart
 * segment. `block_comp[bi]` is the scan-component index of block bi
 * (the MCU-interleaved schedule, built by the caller); per-component
 * 16-bit-prefix LUTs are C-contiguous (n_comps, 65536) arrays (symbol
 * int16, -1 = invalid code; length int8). DC prediction runs across
 * the segment in `preds` (caller zeroes it per segment). Coefficients
 * land in zigzag order in `out` (n_blocks * 64, PRE-ZEROED int64).
 * Returns n_blocks, or -1 (invalid Huffman code) / -2 (AC run past
 * end of block) / -3 (DC category > 15) matching the Python error
 * cases. */
int64_t jpeg_decode_blocks(const uint8_t *data, int64_t nbytes,
                           const int32_t *block_comp, int64_t n_blocks,
                           const int16_t *dcsym, const int8_t *dclen,
                           const int16_t *acsym, const int8_t *aclen,
                           int64_t *preds, int64_t *out) {
  jbits r = {data, nbytes, 0, 0, 0};
  for (int64_t bi = 0; bi < n_blocks; bi++) {
    int64_t ci = block_comp[bi];
    const int16_t *ds = dcsym + ci * 65536;
    const int8_t *dl = dclen + ci * 65536;
    const int16_t *as = acsym + ci * 65536;
    const int8_t *al = aclen + ci * 65536;
    int64_t *blk = out + bi * 64;
    jfill(&r, 16);
    uint32_t p = (uint32_t)((r.acc >> (r.nbits - 16)) & 0xFFFF);
    int sym = ds[p];
    if (sym < 0)
      return -1;
    if (sym > 15) /* DC category past T.81 F.1: jread/jextend would
                     shift >= 64 (UB). Parse-time DHT validation
                     rejects these first; this is defense in depth. */
      return -3;
    r.nbits -= dl[p];
    r.acc &= (((uint64_t)1 << r.nbits) - 1);
    int64_t dc = jextend(jread(&r, sym), sym) + preds[ci];
    preds[ci] = dc;
    blk[0] = dc;
    int k = 1;
    while (k < 64) {
      jfill(&r, 16);
      p = (uint32_t)((r.acc >> (r.nbits - 16)) & 0xFFFF);
      sym = as[p];
      if (sym < 0)
        return -1;
      r.nbits -= al[p];
      r.acc &= (((uint64_t)1 << r.nbits) - 1);
      int run = sym >> 4, s = sym & 0xF;
      if (s == 0) {
        if (run == 15) { /* ZRL: sixteen zeros */
          k += 16;
          continue;
        }
        break; /* EOB */
      }
      k += run;
      if (k > 63)
        return -2;
      blk[k] = jextend(jread(&r, s), s);
      k++;
    }
  }
  return n_blocks;
}

/* Progressive JPEG entropy decode (T.81 Annex G) — one restart segment
 * of ONE scan (any of the four scan kinds: DC first, DC refinement, AC
 * first, AC refinement). Bit-identical to the Python
 * _decode_progressive_scan/_ac_first_block/_ac_refine_block trio by
 * construction (same zero-fill reader, F.12 extend, EOB-run and
 * correction-bit semantics). `block_comp[bi]` indexes the stacked LUTs
 * and `preds` (scan-component order); `block_idx[bi]` is the absolute
 * block number in the flat coefficient store (the caller's MCU-padded
 * per-component grids concatenated). dcsym/dclen are only read when
 * ss==0 && ah==0; acsym/aclen only when ss>0 — pass NULL otherwise.
 * EOB runs and DC predictions reset per restart segment (callers pass
 * zeroed `preds`; eobrun starts at 0 here), matching T.81 and the
 * Python walk. Negative coefficients are scaled by 1<<al via
 * multiplication (left-shifting a negative int64 is UB in C; Python's
 * << is arithmetic). Returns n_blocks, or -1 (invalid Huffman code),
 * -2 (AC run past band end), -3 (DC category > 15), -4 (refinement
 * symbol with size > 1), -5 (refinement ran past band end). */
int64_t jpeg_decode_prog_scan(const uint8_t *data, int64_t nbytes,
                              const int32_t *block_comp,
                              const int64_t *block_idx, int64_t n_blocks,
                              const int16_t *dcsym, const int8_t *dclen,
                              const int16_t *acsym, const int8_t *aclen,
                              int32_t ss, int32_t se, int32_t ah, int32_t al,
                              int64_t *preds, int64_t *store) {
  jbits r = {data, nbytes, 0, 0, 0};
  int64_t eobrun = 0;
  const int64_t p1 = (int64_t)1 << al;
  const int64_t m1 = -((int64_t)1 << al);
  for (int64_t bi = 0; bi < n_blocks; bi++) {
    int64_t ci = block_comp[bi];
    int64_t *blk = store + block_idx[bi] * 64;
    if (ss == 0) {
      if (ah == 0) { /* DC first: diff-coded, scaled by 1<<Al */
        const int16_t *ds = dcsym + ci * 65536;
        const int8_t *dl = dclen + ci * 65536;
        jfill(&r, 16);
        uint32_t p = (uint32_t)((r.acc >> (r.nbits - 16)) & 0xFFFF);
        int sym = ds[p];
        if (sym < 0)
          return -1;
        if (sym > 15)
          return -3;
        r.nbits -= dl[p];
        r.acc &= (((uint64_t)1 << r.nbits) - 1);
        preds[ci] += jextend(jread(&r, sym), sym);
        blk[0] = preds[ci] * p1;
      } else { /* DC refinement: one raw bit per block */
        if (jread(&r, 1))
          blk[0] |= p1;
      }
      continue;
    }
    const int16_t *as = acsym + ci * 65536;
    const int8_t *alen = aclen + ci * 65536;
    if (ah == 0) { /* AC first (G.1.2.2) */
      if (eobrun > 0) {
        eobrun--;
        continue;
      }
      int k = ss;
      while (k <= se) {
        jfill(&r, 16);
        uint32_t p = (uint32_t)((r.acc >> (r.nbits - 16)) & 0xFFFF);
        int sym = as[p];
        if (sym < 0)
          return -1;
        r.nbits -= alen[p];
        r.acc &= (((uint64_t)1 << r.nbits) - 1);
        int run = sym >> 4, s = sym & 0xF;
        if (s == 0) {
          if (run == 15) { /* ZRL */
            k += 16;
            continue;
          }
          eobrun = (int64_t)1 << run;
          if (run)
            eobrun += jread(&r, run);
          eobrun--; /* current block is part of the run */
          break;
        }
        k += run;
        if (k > se)
          return -2;
        blk[k] = jextend(jread(&r, s), s) * p1;
        k++;
      }
      continue;
    }
    /* AC refinement (G.1.2.3) */
    int k = ss;
    if (eobrun == 0) {
      while (k <= se) {
        jfill(&r, 16);
        uint32_t p = (uint32_t)((r.acc >> (r.nbits - 16)) & 0xFFFF);
        int sym = as[p];
        if (sym < 0)
          return -1;
        r.nbits -= alen[p];
        r.acc &= (((uint64_t)1 << r.nbits) - 1);
        int run = sym >> 4, s = sym & 0xF;
        int64_t s_val = 0;
        if (s == 0) {
          if (run != 15) {
            eobrun = (int64_t)1 << run;
            if (run)
              eobrun += jread(&r, run);
            break;
          }
          /* run == 15: advance over 16 zero-history coefficients */
        } else {
          if (s != 1)
            return -4;
          s_val = jread(&r, 1) ? p1 : m1;
        }
        while (k <= se) {
          int64_t v = blk[k];
          if (v != 0) {
            if (jread(&r, 1) && (v & p1) == 0)
              blk[k] = v + (v >= 0 ? p1 : m1);
          } else {
            run--;
            if (run < 0)
              break;
          }
          k++;
        }
        if (s_val) {
          if (k > se)
            return -5;
          blk[k] = s_val;
        }
        k++;
      }
    }
    if (eobrun > 0) { /* inside an EOB run: correction bits only */
      while (k <= se) {
        int64_t v = blk[k];
        if (v != 0 && jread(&r, 1) && (v & p1) == 0)
          blk[k] = v + (v >= 0 ? p1 : m1);
        k++;
      }
      eobrun--;
    }
  }
  return n_blocks;
}
