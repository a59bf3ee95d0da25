"""Deduplication family — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine. Ray-Data-first:

- signatures/sketches are computed **vectorized per batch** (numpy over
  Arrow buffers; per-row Python only over batch-unique words);
- candidate generation is a **bucket groupby** (the only shuffle, moving
  small (id, bucket, signature) rows — never the documents themselves);
- pair verification happens inside the bucket's ``map_groups``;
- final duplicate-group resolution is a driver-side union-find over the
  (small) verified pair list, broadcast back as a drop-set.

This is the standard web-scale shape: O(n) sketch -> bucket shuffle of
sketches only -> tiny pair set. The documents table never moves twice.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from tbl_ray.stages.encode import _default_pool

from tbl_ray.codecs.base import binary_parts, segment_reduceat
from tbl_ray.codecs.native import lib as _native_lib
from tbl_ray.sizing import collect_local as _collect_sketch, fits_local
from tbl_ray.webtable import _mix


_PAIR_BUDGET_ENV = "TBL_RAY_MAX_PAIRS"


def _pair_budget() -> int:
    return int(os.environ.get(_PAIR_BUDGET_ENV, 5_000_000))


def _check_pair_budget(n_pairs: int, op: str, budget: int | None = None) -> None:
    """Driver-side guard on the verified near-duplicate pair list.

    The pair list is tiny BY DESIGN (bucket caps bound candidate
    generation), but a pathological corpus — everything near-duplicate —
    would otherwise materialize O(n^2-ish) pairs on the driver and OOM
    silently. Failing with a clear message beats that; the remedies are
    in the message. Budget via TBL_RAY_MAX_PAIRS (default 5e6 pairs,
    ~a few hundred MB of driver dict). Hot loops pass a pre-read
    `budget` so the check is a single integer compare."""
    if budget is None:
        budget = _pair_budget()
    if n_pairs > budget:
        raise RuntimeError(
            f"{op}: the verified near-duplicate pair list exceeded the"
            f" driver budget ({n_pairs} > {budget} pairs). The corpus is"
            " pathologically duplicate-dense for a driver-side"
            " union-find. Run exact_dedup first to collapse identical"
            " documents, tighten the threshold, or raise"
            f" {_PAIR_BUDGET_ENV} if the driver has the memory."
        )


def _segment_groups(t: pa.Table, keys):
    """Lexsort ``t`` by the two ``keys`` columns and return
    ``(ts, starts, sizes)``: the sorted table plus the row offset and
    length of every multi-member (>= 2 rows) group. The single shared
    segmentation for the LSH pairers — the driver-local fast paths and
    each distributed exchange bucket all group through here."""
    band = np.asarray(t.column(keys[0]))
    bucket = np.asarray(t.column(keys[1]))
    order = np.lexsort((bucket, band))
    ts = t.take(pa.array(order))
    b1, b2 = band[order], bucket[order]
    first = np.empty(len(b1), dtype=bool)
    first[0] = True
    first[1:] = (b1[1:] != b1[:-1]) | (b2[1:] != b2[:-1])
    starts = np.flatnonzero(first)
    sizes = np.diff(np.append(starts, len(b1)))
    multi = sizes >= 2
    return ts, starts[multi], sizes[multi]


def _local_bucket_groups(t: pa.Table | None, group_fn, keys=("band", "bucket")):
    """Apply a per-``keys`` group function over a sketch table: one
    lexsort segments the groups (:func:`_segment_groups`), and only
    multi-member groups (the candidate-bearing ones) reach ``group_fn``
    — the same work a distributed ``groupby(...).map_groups`` does,
    minus the exchange. Yields ``group_fn``'s non-empty outputs. Serves
    both the driver-local fast path (collected sketch) and, via
    :func:`_grouped_pair_exchange`, each exchange bucket on the
    distributed path."""
    if t is None or t.num_rows < 2:
        return
    ts, starts, sizes = _segment_groups(t, keys)
    for s, sz in zip(starts, sizes):
        out = group_fn(ts.slice(int(s), int(sz)))
        if out.num_rows:
            yield out


def _grouped_pair_exchange(sk, keys: list[str], group_fn):
    """Distributed candidate generation as the repo's standard keyed
    route: a bounded hash-bucket exchange (``bucket_exchange``, bucket
    count auto-sized from input bytes) where each task receives MANY
    complete ``keys`` groups and segments them with one lexsort
    (:func:`_local_bucket_groups`) — instead of a Ray sort groupby on
    the unbounded raw key space with one ``map_groups`` call per tiny
    LSH bucket. The per-group function is unchanged, so the pair set is
    identical by construction."""
    # driver-side import: exchange.py imports this module's fingerprint
    # at module level (workers never run this import — the shipped
    # closures carry their own references)
    from tbl_ray.stages.exchange import bucket_exchange

    def per_bucket(t: pa.Table) -> pa.Table:
        outs = list(_local_bucket_groups(t, group_fn, keys=tuple(keys)))
        # group_fn on an empty slice returns its typed empty pair table
        return pa.concat_tables(outs) if outs else group_fn(t.slice(0, 0))

    return bucket_exchange(sk, keys, per_bucket)


_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_SHINGLE = 8  # byte-level shingle width (fits one uint64 window)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_shuffle(
    ds: "ray.data.Dataset", column: str, id_col: str
) -> "ray.data.Dataset":
    """Keep the min-``id_col`` row per distinct ``column`` value by
    hash-partitioning on the key itself (Ray groupby + first-row).

    Semantic baseline / test oracle only: the shuffle moves the FULL
    table keyed on the value column — at web scale with multi-KB documents
    that is an all-to-all of the whole corpus on a skewed key. Use
    :func:`exact_dedup` (two-pass fingerprint) instead."""

    def keep_first(t: pa.Table) -> pa.Table:
        return t.sort_by(id_col).slice(0, 1)

    return ds.groupby(column).map_groups(keep_first, batch_format="pyarrow")


def _fingerprint128(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit content hashes per row (collision odds ~2^-128
    per pair — safe for exact-dedup keys at web scale)."""
    if col.null_count:
        col = pc.fill_null(col, "")
    offsets, data = binary_parts(col)
    lens = np.diff(offsets)
    n = len(col)
    if len(data) == 0:
        # all-empty batch: match the main path's per-empty-row value _mix(0)
        z = _mix(np.zeros(n, np.uint64))
        return z, z.copy()
    pos = np.arange(len(data), dtype=np.uint64)
    row_start = np.repeat(offsets[:-1].astype(np.uint64), lens)
    out = []
    for seed in (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)):
        with np.errstate(over="ignore"):
            h = _mix(data.astype(np.uint64) + np.uint64(1) + (pos - row_start) * seed)
        f = segment_reduceat(np.bitwise_xor, h, offsets, np.uint64(0))
        out.append(_mix(f))
    return out[0], out[1]


def exact_dedup(
    ds: "ray.data.Dataset", column: str, id_col: str
) -> "ray.data.Dataset":
    """Keep the min-``id_col`` row per distinct ``column`` value.

    Two-pass fingerprint plan — the scale path: pass 1 shuffles only
    (fingerprint128, id) pairs (~24 B/row, never the documents), resolves
    min-id winners per fingerprint, and broadcasts the sorted loser-id
    array; pass 2 filters the original stream in place with a vectorized
    ``searchsorted`` membership test.

    Semantically identical to :func:`exact_dedup_shuffle` up to 128-bit
    hash collisions (~2^-128/pair). The broadcast drop-set bounds this
    variant at ~10^8 duplicate rows; beyond that, co-bucket both sides by
    id hash.

    Consumes ``ds`` TWICE (sketch pass + filter pass): a lazy upstream
    re-executes per pass — fine for a deterministic parquet read (re-scan
    beats materializing 100 TB), but materialize() expensive-to-recompute
    upstreams first (see pipelines.webtext for the checkpoint pattern)."""

    def sketch(t: pa.Table) -> pa.Table:
        h1, h2 = _fingerprint128(t.column(column).combine_chunks())
        return pa.table(
            {"f1": h1, "f2": h2, id_col: t.column(id_col)}
        )

    def losers(t: pa.Table) -> pa.Table:
        ids = np.sort(np.asarray(t.column(id_col)))
        return pa.table({"drop": ids[1:].astype(np.int64)})

    pair_ds = ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)
    if fits_local(ds):
        # cost-based fast path: the sketch is ~24 B/row of a small input,
        # so one driver lexsort replaces the distributed groupby and its
        # fixed sample/exchange cost. Winners identical by construction.
        t = _collect_sketch(pair_ds)
        if t is None:
            return ds
        f1 = np.asarray(t.column("f1"))
        f2 = np.asarray(t.column("f2"))
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        order = np.lexsort((ids, f2, f1))
        f1s, f2s, idss = f1[order], f2[order], ids[order]
        dup = np.zeros(len(idss), dtype=bool)
        dup[1:] = (f1s[1:] == f1s[:-1]) & (f2s[1:] == f2s[:-1])
        drop = np.sort(idss[dup])
    else:
        drop_ds = pair_ds.groupby(["f1", "f2"]).map_groups(
            losers, batch_format="pyarrow"
        )
        drop = np.sort(
            np.fromiter((r["drop"] for r in drop_ds.take_all()), dtype=np.int64)
        )
    if drop.size == 0:
        return ds
    drop_ref = ray.put(drop)
    return ds.map_batches(
        _DropIds(drop_ref, id_col), batch_format="pyarrow", zero_copy_batch=True
    )


def _sorted_member_mask(ids: np.ndarray, sorted_drop: np.ndarray) -> np.ndarray:
    """Boolean mask of ``ids`` present in the sorted ``sorted_drop`` array
    (vectorized binary search; no per-row Python)."""
    idx = np.searchsorted(sorted_drop, ids)
    idx_c = np.minimum(idx, len(sorted_drop) - 1)
    return (idx < len(sorted_drop)) & (sorted_drop[idx_c] == ids)


class _DropIds:
    """Filter stage: drop rows whose id is in a broadcast sorted array.

    Holds the ObjectRef (ships by reference); the zero-copy ``ray.get``
    happens lazily in the worker, once per task."""

    def __init__(self, drop_ref, id_col: str):
        self.drop_ref = drop_ref
        self.id_col = id_col
        self._drop: np.ndarray | None = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._drop is None:
            self._drop = ray.get(self.drop_ref)
        ids = np.asarray(t.column(self.id_col), dtype=np.int64)
        return t.filter(pa.array(~_sorted_member_mask(ids, self._drop)))


def exact_dedup_fast(
    ds: "ray.data.Dataset", column: str, id_col: str
) -> "ray.data.Dataset":
    """Alias of :func:`exact_dedup` (the fingerprint plan is the default)."""
    return exact_dedup(ds, column, id_col)


# ---------------------------------------------------------------------------
# minhash
# ---------------------------------------------------------------------------


def _window_hashes(col: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-position 8-byte-shingle hashes + per-row segment starts.

    Windows crossing a row boundary are masked to U64_MAX so per-row
    ``minimum.reduceat`` ignores them. ``h`` carries one trailing U64_MAX
    sentinel (so a trailing empty row's start == len(data) is a valid
    reduceat index); ``starts`` is the raw monotonic offsets — empty rows
    yield a stray element the caller overwrites (see segment_reduceat for
    why zeroing starts instead silently corrupts the preceding row)."""
    offsets, data = binary_parts(col)
    n = len(col)
    lens = np.diff(offsets)
    if len(data) == 0:
        return np.zeros(0, np.uint64), np.zeros(n, np.int64), lens
    pad = np.concatenate([data, np.zeros(_SHINGLE, np.uint8)])
    w64 = (
        np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(pad, _SHINGLE)[: len(data)]
        )
        .view(">u8")
        .ravel()
        .astype(np.uint64)
    )
    h = _mix(w64)
    pos = np.arange(len(data), dtype=np.int64)
    row_start = np.repeat(offsets[:-1], lens)
    row_len = np.repeat(lens, lens)
    invalid = (pos - row_start) > (row_len - _SHINGLE)
    h[invalid] = _U64_MAX
    h = np.concatenate([h, np.asarray([_U64_MAX], dtype=np.uint64)])
    return h, offsets[:-1], lens


def minhash_signatures(col: pa.Array, n_hashes: int = 32, seed: int = 7) -> np.ndarray:
    """(n_rows, n_hashes) uint64 MinHash signature matrix.

    One base shingle hash per position; the i-th permutation is the
    universal-hash ``a_i * h + b_i`` (wraparound), minimized per row.

    Native path (``codecs/_fsst_native.c:minhash_sig``, bit-identical by
    construction, parity-tested): one pass over the bytes with the whole
    signature row in registers. The numpy fallback sweeps a
    len(data)-sized uint64 array ~5x per hash function — at 32 hashes
    that is ~1.3 KB of memory traffic per input byte, which is what makes
    the numpy path bandwidth-bound at scale."""
    n = len(col)
    sig = np.full((n, n_hashes), _U64_MAX, dtype=np.uint64)
    if n == 0:
        return sig
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=n_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=n_hashes, dtype=np.uint64)

    # _native_lib is imported at module top: a function-scoped
    # `from tbl_ray...` import would raise ModuleNotFoundError inside Ray
    # workers, which receive this function by value (guard test ASTs for it)
    nat = _native_lib()
    if nat is not None and n_hashes <= 256:
        arr = col
        if arr.null_count:
            arr = pc.fill_null(arr, "")
        offsets, data = binary_parts(arr)
        offsets = np.ascontiguousarray(offsets, dtype=np.int64)
        data = np.ascontiguousarray(data)
        import ctypes

        nat.minhash_sig(
            data.ctypes.data_as(ctypes.c_void_p),
            offsets.ctypes.data_as(ctypes.c_void_p),
            np.int64(n),
            a.ctypes.data_as(ctypes.c_void_p),
            b.ctypes.data_as(ctypes.c_void_p),
            np.int32(n_hashes),
            np.int32(_SHINGLE),
            sig.ctypes.data_as(ctypes.c_void_p),
        )
        return sig

    h, starts, lens = _window_hashes(col)
    if len(h) == 0:
        return sig
    empty = lens == 0
    with np.errstate(over="ignore"):
        for i in range(n_hashes):
            hi = a[i] * h + b[i]
            hi[h == _U64_MAX] = _U64_MAX  # keep masked windows masked
            mins = np.minimum.reduceat(hi, starts)
            mins[empty] = _U64_MAX
            sig[:, i] = mins
    return sig


def minhash_signature_rows(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    seed: int = 7,
) -> "ray.data.Dataset":
    """Long-format ``(id, hash_index, sig)`` MinHash signatures.

    The driver-checked oracle surface for the MinHash kernel: given
    ASCII text, every step (8-byte big-endian shingle, splitmix64 mix,
    ``a_i*h+b_i mod 2^64`` permutations, per-row min) is exactly
    replayable in ANSI SQL, so the signature values themselves get a
    value-hash-verified driver row (``minhash_sig`` in __ray_entry__)."""

    def to_rows(t: pa.Table) -> pa.Table:
        col = t.column(text_col).combine_chunks()
        sig = minhash_signatures(col, n_hashes=n_hashes, seed=seed)
        n = len(col)
        ids = t.column(id_col).combine_chunks()
        rep_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), n_hashes))
        return pa.table(
            {
                id_col: ids.take(rep_idx),
                "hash_index": pa.array(
                    np.tile(np.arange(n_hashes, dtype=np.int64), n)
                ),
                "sig": pa.array(sig.ravel(), type=pa.uint64()),
            }
        )

    return ds.map_batches(to_rows, batch_format="pyarrow", zero_copy_batch=True)


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_rows, bands) uint64 LSH bucket keys (chained mix over the band)."""
    n, n_hashes = sig.shape
    r = n_hashes // bands
    out = np.empty((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bnd in range(bands):
            acc = np.full(n, np.uint64(bnd + 1), dtype=np.uint64)
            for j in range(bnd * r, (bnd + 1) * r):
                acc = _mix(acc ^ sig[:, j])
            out[:, bnd] = acc
    return out


class _MinhashSketch:
    """map_batches stage: (id, band, bucket, sig) rows — sketches only."""

    def __init__(self, text_col: str, id_col: str, n_hashes: int, bands: int):
        self.text_col, self.id_col = text_col, id_col
        self.n_hashes, self.bands = n_hashes, bands

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column(self.text_col).combine_chunks()
        if pa.types.is_null(col.type):
            # an all-null block arrives as Arrow `null` type — fill_null
            # can't build a string scalar for it, so cast first
            col = col.cast(pa.string())
        if col.null_count:
            col = pc.fill_null(col, "")
        sig = minhash_signatures(col, self.n_hashes)
        bh = band_hashes(sig, self.bands)
        n = t.num_rows
        ids = np.asarray(t.column(self.id_col))
        return pa.table(
            {
                self.id_col: np.repeat(ids, self.bands),
                "band": np.tile(np.arange(self.bands), n),
                "bucket": bh.ravel(),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.repeat(sig, self.bands, axis=0).ravel()),
                    self.n_hashes,
                ),
            }
        )


# per-byte popcount table for the numpy-1.x (no np.bitwise_count) path
_POPCOUNT8 = np.array(
    [bin(i).count("1") for i in range(256)], dtype=np.uint8
)


def _bucket_cap(kind: str, default: int) -> int:
    """Per-sketch bucket cap: ``TBL_RAY_MAX_BUCKET_<KIND>`` overrides the
    shared ``TBL_RAY_MAX_BUCKET`` fallback, which overrides ``default``.
    Distinct names so tuning one sketch does not silently retune the
    others (they have different natural bucket densities). Resolved at
    closure-creation time ON THE DRIVER — map_groups workers do not see
    driver-set env vars."""
    v = os.environ.get(f"TBL_RAY_MAX_BUCKET_{kind.upper()}")
    if v is None:
        v = os.environ.get("TBL_RAY_MAX_BUCKET", str(default))
    # clamp: a cap <= 0 would make the tiled-pairwise tile size
    # non-positive and crash range(); 1 routes every multi-unique bucket
    # through the tiled path instead, which is slow but correct
    return max(1, int(v))


def _hard_bucket_cap(soft_cap: int = 0) -> int:
    """Absolute per-bucket unique-item bound past which the tiled pairwise
    pass refuses to run (``TBL_RAY_HARD_BUCKET``, default 50k ≈ 1.25e9
    pair comparisons — tens of seconds of vectorized work in one task).
    Beyond this the banding is degenerate enough that grinding through
    O(u^2) inside a single bucket would stall the job silently; raising
    loudly with remedies is the safer failure.

    Clamped to at least ``soft_cap``: an explicitly raised
    ``TBL_RAY_MAX_BUCKET`` is a statement that buckets this dense are
    expected, and the hard bound must not silently override it (buckets
    at or under the soft cap never even reach the unique-collapse
    path)."""
    return max(int(os.environ.get("TBL_RAY_HARD_BUCKET", "50000")), soft_cap)


def _tiled_pairwise(u: int, sim_block, keep_mask, tile: int):
    """All-pairs over ``u`` unique items in ``tile`` x ``tile`` blocks so
    peak memory is O(tile^2 * item_width) regardless of bucket size.

    ``sim_block(i0, i1, j0, j1)`` returns the (i1-i0, j1-j0) similarity
    matrix between item ranges; ``keep_mask(sim)`` the boolean keep
    matrix. Returns global ``(i_idx, j_idx, sim)`` arrays with i < j
    (strict upper triangle) — the pair set is identical to a monolithic
    ``triu_indices`` pass, only the evaluation order differs."""
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    for i0 in range(0, u, tile):
        i1 = min(i0 + tile, u)
        for j0 in range(i0, u, tile):
            j1 = min(j0 + tile, u)
            sim = sim_block(i0, i1, j0, j1)
            mask = np.asarray(keep_mask(sim))
            if i0 == j0:
                mask = mask & np.triu(np.ones(sim.shape, dtype=bool), k=1)
            ii, jj = np.nonzero(mask)
            if ii.size:
                out_i.append(ii + i0)
                out_j.append(jj + j0)
                out_s.append(np.asarray(sim)[ii, jj])
    if not out_i:
        z = np.array([], dtype=np.int64)
        return z, z.copy(), np.array([], dtype=np.float64)
    return (
        np.concatenate(out_i),
        np.concatenate(out_j),
        np.concatenate(out_s),
    )


def _bucket_pairs(threshold: float, id_col: str):
    """map_groups over one (band, bucket): verified candidate pairs.

    Buckets up to the minhash cap (``TBL_RAY_MAX_BUCKET_MINHASH``,
    fallback ``TBL_RAY_MAX_BUCKET``, default 1000) rows compare all
    pairs. Larger buckets — a duplicate-dense cluster, or thousands of
    empty/identical texts whose signatures coincide — collapse to UNIQUE
    signatures first: members sharing a signature pair to their min-id
    representative with ``est_jaccard`` exactly 1.0 (identical signatures
    agree at every position), and the representatives compare pairwise —
    in bounded row tiles (:func:`_tiled_pairwise`) when the unique count
    itself exceeds the cap, so a boilerplate-heavy crawl computes instead
    of crashing. The signature estimate is a function of the two
    signatures alone, so the union-find components (and therefore the
    near-dedup output) are IDENTICAL to all-pairs; only the emitted pair
    *list* is smaller (star-per-group instead of a clique), which
    exact-verify consumers like ``jaccard_dedup`` must note: identical
    signatures do NOT imply identical documents, so exact verification
    may reject a proxy pair that an equivalent inherited pair would
    pass; ``jaccard_dedup`` restores brute-force parity by re-expanding
    inherited pairs behind every rejected star or cross-group pair.
    Only past :func:`_hard_bucket_cap` unique signatures (default 50k)
    does the task still raise, with remedies, instead of grinding O(u^2)
    in one task."""

    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "est_jaccard": pa.array([], pa.float64())}
    )

    def _pair_table(a: np.ndarray, b: np.ndarray, est: np.ndarray) -> pa.Table:
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {"id_a": lo.astype(np.int64), "id_b": hi.astype(np.int64),
             "est_jaccard": est.astype(np.float64)}
        )

    cap = _bucket_cap("minhash", 1000)
    hard = _hard_bucket_cap(cap)

    def pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n < 2:
            return empty
        ids = np.asarray(t.column(id_col))
        sig = np.stack(
            [np.asarray(v.values) for v in t.column("sig").combine_chunks()]
        ).astype(np.uint64)
        if n <= cap:
            ia, ib = np.triu_indices(n, k=1)
            est = (sig[ia] == sig[ib]).mean(axis=1)
            keep = est >= threshold
            return _pair_table(ids[ia[keep]], ids[ib[keep]], est[keep])
        uniq, inverse = np.unique(sig, axis=0, return_inverse=True)
        u = len(uniq)
        if u > hard:
            raise ValueError(
                f"LSH bucket holds {u} distinct signatures (> hard cap"
                f" {hard}): degenerate banding — raise n_hashes/bands so"
                " buckets discriminate, pre-filter empty/boilerplate"
                " texts, or raise TBL_RAY_HARD_BUCKET if the corpus"
                " genuinely has this many near-identical distinct"
                " documents"
            )
        inverse = inverse.reshape(-1)
        reps = np.full(u, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(reps, inverse, ids.astype(np.int64))
        member_rep = reps[inverse]
        m = ids != member_rep
        star_a, star_b = member_rep[m], ids[m]
        star_est = np.ones(star_a.shape[0], dtype=np.float64)
        star_keep = star_est >= threshold  # threshold > 1.0 drops exacts too
        if u <= cap:
            ia, ib = np.triu_indices(u, k=1)
            est = (uniq[ia] == uniq[ib]).mean(axis=1)
            keep = est >= threshold
            ua, ub, uest = reps[ia[keep]], reps[ib[keep]], est[keep]
        else:
            # tiled pairwise over the unique signatures: same pair set as
            # a monolithic triu pass, memory bounded to tile^2 * n_hashes
            tile = min(cap, 1024)
            gi, gj, uest = _tiled_pairwise(
                u,
                lambda i0, i1, j0, j1: (
                    uniq[i0:i1, None, :] == uniq[None, j0:j1, :]
                ).mean(axis=2),
                lambda s: s >= threshold,
                tile,
            )
            ua, ub = reps[gi], reps[gj]
        return _pair_table(
            np.concatenate([star_a[star_keep], ua]),
            np.concatenate([star_b[star_keep], ub]),
            np.concatenate([star_est[star_keep], uest]),
        )

    return pairs


def union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """id -> component root (driver-side; the pair list is tiny by design)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _dedup_pair_arrays(a: np.ndarray, b: np.ndarray, e: np.ndarray):
    """Keep the max-``e`` row per (a, b) key, sorted ascending by (a, b)
    — the numpy equivalent of the ``seen`` dict the distributed path
    builds (same keys, same max-wins tie rule, same output order)."""
    if a.size == 0:
        return a, b, e
    order = np.lexsort((-e, b, a))
    a, b, e = a[order], b[order], e[order]
    firsts = np.empty(a.size, dtype=bool)
    firsts[0] = True
    firsts[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return a[firsts], b[firsts], e[firsts]


def _local_minhash_pairs(
    t: pa.Table | None,
    pairs_fn,
    cap: int,
    threshold: float,
    id_col: str,
    budget: int | None = None,
):
    """Vectorized local equivalent of
    ``_local_bucket_groups(t, pairs_fn)`` for the minhash pairer.

    Small buckets (2 <= n <= cap) are batched BY SIZE: one
    (groups, pairs, hashes) equality reduction per distinct bucket size
    — profiling the sf0.1 local path showed ~12k per-bucket numpy
    setups (triu_indices / stack / mean on 2-5 row buckets) dominating
    its wall. Oversized buckets still route through ``pairs_fn`` one at
    a time (the unique-collapse / tiled path). The pair set and the
    estimates are identical: same triu pair order, same boolean-mean
    over the signature columns, same min/max id normalization.

    Returns cross-band-deduplicated (id_a, id_b, est) arrays via
    :func:`_dedup_pair_arrays`; the pair budget is enforced on the
    deduplicated count (matching the dict-based path), with a
    mid-flight dedup pass whenever the raw accumulation crosses it so
    memory stays bounded on duplicate-dense corpora."""
    empty = (
        np.array([], dtype=np.int64),
        np.array([], dtype=np.int64),
        np.array([], dtype=np.float64),
    )
    if t is None or t.num_rows < 2:
        return empty
    ts, starts, sizes = _segment_groups(t, ("band", "bucket"))
    if starts.size == 0:
        return empty
    ids = np.asarray(ts.column(id_col)).astype(np.int64)
    flat = np.asarray(ts.column("sig").combine_chunks().flatten())
    width = flat.size // ts.num_rows
    sig = flat.astype(np.uint64).reshape(ts.num_rows, width)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_e: list[np.ndarray] = []
    if budget is None:
        # resolved here only on the DRIVER (local fast path); the
        # distributed caller pre-resolves and ships it, because
        # map_groups workers do not see driver-set env vars
        budget = _pair_budget()
    kept = 0

    def _flush(force: bool):
        nonlocal out_a, out_b, out_e, kept
        if not force and kept <= budget:
            return
        a, b, e = _dedup_pair_arrays(
            np.concatenate(out_a) if out_a else np.array([], np.int64),
            np.concatenate(out_b) if out_b else np.array([], np.int64),
            np.concatenate(out_e) if out_e else np.array([], np.float64),
        )
        out_a, out_b, out_e = [a], [b], [e]
        kept = a.size
        _check_pair_budget(kept, "minhash_dup_pairs", budget)

    big = sizes > cap
    for s, sz in zip(starts[big], sizes[big]):
        pt = pairs_fn(ts.slice(int(s), int(sz)))
        if pt.num_rows:
            out_a.append(np.asarray(pt.column("id_a")).astype(np.int64))
            out_b.append(np.asarray(pt.column("id_b")).astype(np.int64))
            out_e.append(
                np.asarray(pt.column("est_jaccard")).astype(np.float64)
            )
            kept += pt.num_rows
            _flush(False)
    starts, sizes = starts[~big], sizes[~big]
    for n in np.unique(sizes):
        n = int(n)
        gs = starts[sizes == n]
        ia, ib = np.triu_indices(n, k=1)
        npair = ia.size
        # chunk so the (groups, pairs, hashes) equality tensor stays
        # ~a few hundred MB at worst
        gchunk = max(1, (1 << 24) // max(1, npair * width))
        for c0 in range(0, gs.size, gchunk):
            rows = (
                gs[c0 : c0 + gchunk, None] + np.arange(n)[None, :]
            ).ravel()
            s_n = sig[rows].reshape(-1, n, width)
            i_n = ids[rows].reshape(-1, n)
            est = (s_n[:, ia, :] == s_n[:, ib, :]).mean(axis=2)
            keep = est >= threshold
            g_idx, p_idx = np.nonzero(keep)
            if g_idx.size:
                pa_ = i_n[g_idx, ia[p_idx]]
                pb_ = i_n[g_idx, ib[p_idx]]
                out_a.append(np.minimum(pa_, pb_))
                out_b.append(np.maximum(pa_, pb_))
                out_e.append(est[g_idx, p_idx])
                kept += g_idx.size
                _flush(False)
    _flush(True)
    return out_a[0], out_b[0], out_e[0]


def minhash_dup_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
) -> list[dict]:
    """Verified near-duplicate pairs (deduplicated across bands)."""
    sk = ds.map_batches(
        _MinhashSketch(text_col, id_col, n_hashes, bands),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs_fn = _bucket_pairs(threshold, id_col)
    # the banded sketch is ~bands x (n_hashes + 3) x 8 bytes per row —
    # often 10-20x a short compressed document — so the local gate
    # divides the budget by that amplification (see sizing.fits_local)
    if fits_local(ds, amplification=float(bands * (n_hashes + 3) * 8) / 64.0):
        # cost-based fast path (see tbl_ray.sizing): group the collected
        # sketch locally — bucket membership and pair estimates are
        # identical to the distributed groupby by construction, and
        # small buckets are batched by size (_local_minhash_pairs)
        # instead of one numpy setup per bucket
        a, b, e = _local_minhash_pairs(
            _collect_sketch(sk),
            pairs_fn,
            _bucket_cap("minhash", 1000),
            threshold,
            id_col,
        )
        return [
            {"id_a": int(x), "id_b": int(y), "est_jaccard": float(j)}
            for x, y, j in zip(a, b, e)
        ]
    else:
        # bounded hash exchange (the repo's standard keyed route) instead
        # of a sort groupby on the unbounded (band, bucket) key space:
        # each hash bucket holds MANY complete LSH buckets, and the same
        # by-size batched pairer that serves the local path segments and
        # reduces them in one pass per distinct bucket size — Ray's
        # map_groups would otherwise call pairs_fn once per tiny bucket.
        # Imported here, on the driver, because exchange.py imports this
        # module's fingerprint at module level (workers never run this
        # import — the shipped closures carry their own references)
        from tbl_ray.stages.exchange import bucket_exchange

        # cap AND budget resolve on the DRIVER: map_groups workers do
        # not see driver-set env vars, so a user following the budget
        # error's advice (raise TBL_RAY_MAX_PAIRS) would otherwise be
        # silently ignored inside the exchange tasks
        cap = _bucket_cap("minhash", 1000)
        budget = _pair_budget()

        def per_bucket(t: pa.Table) -> pa.Table:
            a, b, est = _local_minhash_pairs(
                t, pairs_fn, cap, threshold, id_col, budget=budget
            )
            return pa.table(
                {
                    "id_a": pa.array(a, pa.int64()),
                    "id_b": pa.array(b, pa.int64()),
                    "est_jaccard": pa.array(est, pa.float64()),
                }
            )

        pair_ds = bucket_exchange(sk, ["band", "bucket"], per_bucket)
        pair_ds = _coalesce_pairs(pair_ds, "est_jaccard", maximize=True)
        seen: dict[tuple[int, int], float] = {}
        for b in pair_ds.iter_batches(batch_format="pyarrow", batch_size=65536):
            for r in b.to_pylist():
                key = (r["id_a"], r["id_b"])
                if key not in seen or r["est_jaccard"] > seen[key]:
                    seen[key] = r["est_jaccard"]
            _check_pair_budget(len(seen), "minhash_dup_pairs")
    return [
        {"id_a": a, "id_b": b, "est_jaccard": j} for (a, b), j in sorted(seen.items())
    ]


def minhash_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> "ray.data.Dataset":
    """Drop near-duplicates, keeping the min-id doc of each group.

    Consumes ``ds`` twice (sketch + filter pass); see :func:`exact_dedup`
    on when to checkpoint the upstream first."""
    pairs = minhash_dup_pairs(ds, text_col, id_col, **kwargs)
    roots = union_find([(p["id_a"], p["id_b"]) for p in pairs])
    drop = np.sort(
        np.fromiter((x for x, r in roots.items() if x != r), dtype=np.int64)
    )
    if drop.size == 0:
        return ds
    drop_ref = ray.put(drop)
    return ds.map_batches(
        _DropIds(drop_ref, id_col), batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


#: odd multiplier for the SQL-replayable polynomial word hash (FNV-1a's
#: 64-bit prime; any odd constant works — it only has to match the oracle)
_POLY_P = np.uint64(1099511628211)


def _poly_word_hashes(words: pa.Array, seed: int) -> np.ndarray:
    """splitmix64(sum(byte_j * P^j mod 2^64) + seed) per word — vectorized
    over the Arrow buffers and exactly replayable in ANSI SQL (byte values
    via ``ascii(substring(...))`` on ASCII text, powers as a literal
    table, HUGEINT modular arithmetic). Empty words hash to _mix(seed)."""
    offsets, data = binary_parts(words)
    lens = np.diff(offsets)
    with np.errstate(over="ignore"):
        if len(data) == 0:
            h = np.zeros(len(words), np.uint64)
        else:
            pows = np.empty(int(lens.max()), dtype=np.uint64)
            pows[0] = 1
            for j in range(1, len(pows)):
                pows[j] = pows[j - 1] * _POLY_P
            pos = np.arange(len(data), dtype=np.int64) - np.repeat(
                offsets[:-1], lens
            )
            terms = data.astype(np.uint64) * pows[pos]
            h = segment_reduceat(np.add, terms, offsets, np.uint64(0))
        return _mix(h + np.uint64(seed))


def simhash_batch(
    col: pa.Array, seed: int = 11, word_hasher: str = "crc"
) -> np.ndarray:
    """64-bit SimHash per row over word tokens.

    Tokens split with an Arrow kernel; only *batch-unique* words are hashed
    in Python (dictionary-encode first); the ±1 bit accumulation is
    ``np.add.reduceat`` per bit — vectorized over all words.

    ``word_hasher``: ``"crc"`` (default, crc32|adler32<<32 then splitmix)
    or ``"poly"`` (byte-polynomial then splitmix — slightly weaker but
    exactly replayable in SQL, used by the driver-checked oracle row)."""
    if col.null_count:
        col = pc.fill_null(col, "")
    words = pc.split_pattern_regex(col, r"\s+")
    flat = pc.list_flatten(words)
    counts = np.asarray(pc.list_value_length(words), dtype=np.int64)
    n = len(col)
    if len(flat) == 0:
        return np.zeros(n, dtype=np.uint64)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    denc = flat.dictionary_encode()
    if word_hasher == "poly":
        uh = _poly_word_hashes(denc.dictionary, seed)
    else:
        import zlib

        uniq = denc.dictionary.to_pylist()
        uh = np.array(
            [zlib.crc32(w.encode()) | (zlib.adler32(w.encode()) << 32) for w in uniq],
            dtype=np.uint64,
        )
        uh = _mix(uh + np.uint64(seed))
    wh = uh[np.asarray(denc.indices)]
    word_offsets = np.concatenate(([0], np.cumsum(counts)))
    out = np.zeros(n, dtype=np.uint64)
    for b in range(64):
        bit = ((wh >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * 2 - 1
        s = segment_reduceat(np.add, bit, word_offsets, np.int64(0))
        out |= (s > 0).astype(np.uint64) << np.uint64(b)
    return out


def simhash(
    ds: "ray.data.Dataset", text_col: str = "text", word_hasher: str = "crc"
) -> "ray.data.Dataset":
    """Append a ``simhash`` uint64 column."""

    def add(t: pa.Table) -> pa.Table:
        h = simhash_batch(
            t.column(text_col).combine_chunks(), word_hasher=word_hasher
        )
        return t.append_column("simhash", pa.array(h, type=pa.uint64()))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dup_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
) -> list[dict]:
    """Near-dup pairs by SimHash banding (4 x 16-bit bands -> bucket
    groupby -> in-bucket Hamming verification)."""

    def sketch(t: pa.Table) -> pa.Table:
        h = simhash_batch(t.column(text_col).combine_chunks())
        ids = np.asarray(t.column(id_col))
        rows = {
            id_col: np.repeat(ids, 4),
            "band": np.tile(np.arange(4), len(ids)),
            "bucket": np.stack(
                [(h >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)],
                axis=1,
            ).ravel(),
            "simhash": np.repeat(h, 4),
        }
        return pa.table(rows)

    cap = _bucket_cap("simhash", 1000)
    hard = _hard_bucket_cap(cap)

    def _popcount(x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.uint64)
        if hasattr(np, "bitwise_count"):  # numpy >= 2.0
            return np.bitwise_count(x)
        # vectorized byte-table fallback, any shape (numpy 1.x)
        return _POPCOUNT8[x.view(np.uint8).reshape(*x.shape, 8)].sum(
            axis=-1, dtype=np.int64
        )

    def _pair_table(a: np.ndarray, b: np.ndarray, ham: np.ndarray) -> pa.Table:
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {"id_a": lo.astype(np.int64), "id_b": hi.astype(np.int64),
             "hamming": ham.astype(np.int64)}
        )

    def pairs(t: pa.Table) -> pa.Table:
        # oversized buckets collapse to UNIQUE simhash values — hamming
        # is a function of the two 64-bit values alone, so components
        # are identical to all-pairs (same scheme as _bucket_pairs)
        n = t.num_rows
        if n < 2:
            return _pair_table(
                np.array([], np.int64), np.array([], np.int64),
                np.array([], np.int64),
            )
        ids = np.asarray(t.column(id_col))
        h = np.asarray(t.column("simhash")).astype(np.uint64)
        if n <= cap:
            ia, ib = np.triu_indices(n, k=1)
            ham = _popcount(h[ia] ^ h[ib])
            keep = ham <= max_hamming
            return _pair_table(ids[ia[keep]], ids[ib[keep]], ham[keep])
        uniq, inverse = np.unique(h, return_inverse=True)
        u = len(uniq)
        if u > hard:
            raise ValueError(
                f"SimHash bucket holds {u} distinct values (> hard cap"
                f" {hard}): degenerate banding — pre-filter empty/"
                "boilerplate texts or raise TBL_RAY_HARD_BUCKET"
            )
        reps = np.full(u, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(reps, inverse.reshape(-1), ids.astype(np.int64))
        member_rep = reps[inverse.reshape(-1)]
        m = ids != member_rep
        star_a, star_b = member_rep[m], ids[m]
        star_ham = np.zeros(star_a.shape[0], dtype=np.int64)
        if u <= cap:
            ia, ib = np.triu_indices(u, k=1)
            ham = _popcount(uniq[ia] ^ uniq[ib])
            keep = ham <= max_hamming
            ua, ub, uham = reps[ia[keep]], reps[ib[keep]], ham[keep]
        else:
            # tile^2 uint64 xor matrix = 128 MiB max on numpy >= 2
            # (np.bitwise_count); the numpy-1.x byte-table fallback in
            # _popcount materializes ~3x that (uint8 lookup + int64
            # sum), so halve the tile there to keep the same budget
            tile = min(cap, 4096 if hasattr(np, "bitwise_count") else 2048)
            gi, gj, uham = _tiled_pairwise(
                u,
                lambda i0, i1, j0, j1: _popcount(
                    uniq[i0:i1, None] ^ uniq[None, j0:j1]
                ),
                lambda s: s <= max_hamming,
                tile,
            )
            ua, ub = reps[gi], reps[gj]
        return _pair_table(
            np.concatenate([star_a, ua]),
            np.concatenate([star_b, ub]),
            np.concatenate([star_ham, uham.astype(np.int64)]),
        )

    sk = ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)
    seen: dict[tuple[int, int], int] = {}
    # 4 bands x (8B simhash + key/bucket) per row; same amplification
    # guard as the minhash gate, ~2x for short documents
    if fits_local(ds, amplification=2.0):
        for pt in _local_bucket_groups(_collect_sketch(sk), pairs):
            for a, b, h in zip(
                pt.column("id_a").to_pylist(),
                pt.column("id_b").to_pylist(),
                pt.column("hamming").to_pylist(),
            ):
                key = (a, b)
                if key not in seen or h < seen[key]:
                    seen[key] = h
            _check_pair_budget(len(seen), "simhash_dup_pairs")
    else:
        pair_ds = _grouped_pair_exchange(sk, ["band", "bucket"], pairs)
        pair_ds = _coalesce_pairs(pair_ds, "hamming", maximize=False)
        for b in pair_ds.iter_batches(batch_format="pyarrow", batch_size=65536):
            for r in b.to_pylist():
                key = (r["id_a"], r["id_b"])
                if key not in seen or r["hamming"] < seen[key]:
                    seen[key] = r["hamming"]
            _check_pair_budget(len(seen), "simhash_dup_pairs")
    return [{"id_a": a, "id_b": b, "hamming": h} for (a, b), h in sorted(seen.items())]


# ---------------------------------------------------------------------------
# n-gram jaccard (verification primitive)
# ---------------------------------------------------------------------------


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact character-n-gram Jaccard similarity of two strings."""
    if len(a) < n and len(b) < n:
        return 1.0 if a == b else 0.0
    sa = {a[i : i + n] for i in range(max(len(a) - n + 1, 0))}
    sb = {b[i : i + n] for i in range(max(len(b) - n + 1, 0))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _verify_pairs_distributed(
    texts_ds: "ray.data.Dataset",
    pair_list: list[tuple[int, int]],
    *,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
) -> set[tuple[int, int]]:
    """Exact n-gram-Jaccard verification of candidate pairs WITHOUT
    materializing any text on the driver.

    The tiny (id_a, id_b) pair list co-buckets with the candidate texts
    via two :func:`tbl_ray.functions.joins.shuffle_join` exchanges
    (attach text_a, then text_b), and :func:`ngram_jaccard` runs inside
    ``map_batches`` at worker parallelism; only the verified id pairs
    come back. Driver memory is O(pairs), never O(pairs x doc size)."""
    from .joins import shuffle_join

    if not pair_list:
        return set()
    pairs_ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in pair_list], pa.int64()),
                "id_b": pa.array([b for _, b in pair_list], pa.int64()),
            }
        )
    )

    def as_side(key: str, out_text: str):
        def ren(t: pa.Table) -> pa.Table:
            col = t.column(text_col).combine_chunks()
            if pa.types.is_null(col.type):
                col = col.cast(pa.string())
            return pa.table(
                {
                    key: t.column(id_col).cast(pa.int64()),
                    out_text: pc.fill_null(col, ""),
                }
            )

        return ren

    ta = texts_ds.map_batches(
        as_side("id_a", "__text_a"), batch_format="pyarrow", zero_copy_batch=True
    )
    tb = texts_ds.map_batches(
        as_side("id_b", "__text_b"), batch_format="pyarrow", zero_copy_batch=True
    )
    j = shuffle_join(shuffle_join(pairs_ds, ta, "id_a"), tb, "id_b")

    def check(t: pa.Table) -> pa.Table:
        a = t.column("__text_a").to_pylist()
        b = t.column("__text_b").to_pylist()
        # per-pair set Jaccard is inherently per-document work; it runs
        # HERE, spread over the worker pool, not on the driver
        ok = pa.array(
            [ngram_jaccard(x or "", y or "", n=n) >= threshold
             for x, y in zip(a, b)],
            pa.bool_(),
        )
        return pa.table(
            {"id_a": t.column("id_a").filter(ok), "id_b": t.column("id_b").filter(ok)}
        )

    out = j.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)
    passed: set[tuple[int, int]] = set()
    for bt in out.iter_batches(batch_format="pyarrow", batch_size=65536):
        passed.update(
            zip(bt.column("id_a").to_pylist(), bt.column("id_b").to_pylist())
        )
    return passed


def jaccard_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    threshold: float = 0.8,
    n_hashes: int = 32,
    bands: int = 8,
    candidate_threshold: float | None = None,
    verify: str = "auto",
) -> "ray.data.Dataset":
    """EXACT character-n-gram-Jaccard near-dedup: MinHash LSH proposes
    candidate pairs (recall), :func:`ngram_jaccard` verifies each pair
    exactly (precision — no sketch-estimate false positives survive),
    union-find groups the verified pairs, the min-id doc of each group
    is kept.

    ``candidate_threshold`` overrides the sketch-level candidate gate
    (default: ``threshold`` minus 3 sigma of the estimator). Pass ``0.0``
    with high ``bands`` (e.g. ``bands=16`` at ``n_hashes=32``, 2 rows
    per band) to make candidate recall effectively exhaustive — every
    band-bucket cohabitant is exactly verified, so the result equals a
    brute-force pairwise Jaccard dedup up to a ~1e-7/pair LSH miss
    probability. The driver oracle relies on this mode. One bound:
    buckets past ``TBL_RAY_MAX_BUCKET`` rows collapse to unique
    signatures before pairing (see :func:`_bucket_pairs`), so in such a
    bucket only (min-id representative, member) candidate pairs reach
    exact verification rather than the full clique.

    This is the standard production split: the sketch pass never ships
    documents (only the banded signature), and exact verification
    touches ONLY the candidate texts — work is bounded by the
    candidate-pair count, not the corpus. The candidate threshold is
    relaxed below ``threshold`` so sketch variance cannot lose true
    pairs; exact verification then applies ``threshold`` precisely.

    ``verify`` selects where exact verification runs: ``"driver"``
    fetches candidate texts to the driver (fast for small corpora, and
    loudly budget-guarded); ``"distributed"`` co-buckets the tiny pair
    list with the candidate texts via two shuffle joins and runs
    :func:`ngram_jaccard` inside ``map_batches`` — nothing larger than
    the verified id pairs ever reaches the driver, so a duplicate-dense
    100 TB corpus verifies at worker parallelism. ``"auto"`` (default)
    picks driver only when the whole input provably fits the local
    sketch budget (:func:`tbl_ray.sizing.fits_local`; forced distributed
    by ``TBL_RAY_LOCAL_SKETCH_BYTES=0`` like every other operator).

    Oversized-bucket star collapse (see :func:`_bucket_pairs`) is
    exact-verify-safe here: identical signatures give every collapsed
    member the same estimate as its representative against every
    counterparty, so the uncollapsed path's pair proposals are
    reconstructed on demand — member-member pairs inside groups with a
    rejected star pair, full cluster-cross pairs behind a rejected
    cross-group pair, and severed members' inherited checks against
    clusters their rep matched — making the final connected components
    (and therefore the survivor set) equal to brute-force all-pairs.

    Consumes ``ds`` three times (sketch, candidate-text fetch, filter);
    checkpoint expensive upstreams first, as with :func:`exact_dedup`."""
    if verify not in ("auto", "driver", "distributed"):
        raise ValueError(f"verify must be auto|driver|distributed, got {verify!r}")
    if candidate_threshold is not None:
        cand_thr = candidate_threshold
    else:
        # relaxed candidate gate: est_jaccard is a Binomial(n_hashes, J)
        # mean, so ~3 sigma below threshold keeps true pairs in play
        sigma = (threshold * (1.0 - threshold) / n_hashes) ** 0.5
        cand_thr = max(0.0, threshold - 3.0 * sigma)
    cands = minhash_dup_pairs(
        ds, text_col, id_col,
        n_hashes=n_hashes, bands=bands, threshold=cand_thr,
    )
    if not cands:
        return ds
    need = sorted({p["id_a"] for p in cands} | {p["id_b"] for p in cands})
    need_arr = np.asarray(need, dtype=np.int64)
    need_ref = ray.put(need_arr)

    def fetch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        keep = _sorted_member_mask(ids, ray.get(need_ref))
        return pa.table(
            {id_col: t.column(id_col).filter(pa.array(keep)),
             text_col: t.column(text_col).filter(pa.array(keep))}
        )

    use_driver = verify == "driver" or (
        verify == "auto" and fits_local(ds, amplification=1.0)
    )
    if use_driver:
        picked = ds.map_batches(
            fetch, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        # coalesce null texts: null-text docs sketch identically, so they
        # DO arrive as candidates, and ngram_jaccard(None, ...) would raise
        texts = {r[id_col]: (r[text_col] or "") for r in picked}

        def verify_fn(pair_list):
            return {
                (a, b)
                for a, b in pair_list
                if ngram_jaccard(texts.get(a, ""), texts.get(b, ""), n=n)
                >= threshold
            }
    else:
        # candidate texts only (a budget-bounded slice of the corpus),
        # materialized ONCE into the distributed object store — never
        # onto the driver — and joined twice against the tiny pair list
        texts_ds = ds.map_batches(
            fetch, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

        def verify_fn(pair_list):
            return _verify_pairs_distributed(
                texts_ds, pair_list,
                id_col=id_col, text_col=text_col, n=n, threshold=threshold,
            )

    cand_pairs = [(p["id_a"], p["id_b"]) for p in cands]
    passed = verify_fn(cand_pairs)
    # re-expansion (oversized-bucket exact-parity safety): collapsed
    # signature groups surface as star pairs (est exactly 1.0, id_a ==
    # min-id rep). Identical signatures mean every member shares its
    # rep's est with every counterparty, so the uncollapsed path would
    # ALSO have proposed the inherited pairs below — verify them so the
    # final connected components match all-pairs exactly:
    #   1. member-member pairs inside any group with a rejected star
    #      pair (the within-group edge set then matches all-pairs);
    #   2. for a REJECTED cross-group pair (a, b): every cross pair
    #      cluster(a) x cluster(b) — any one passing merges the two
    #      components, as it would uncollapsed;
    #   3. for a PASSED cross pair (a, b): members severed from their
    #      rep (rejected star pair) still get their inherited direct
    #      check against the other side's cluster.
    star_groups: dict[int, set[int]] = {}
    rejected_members: dict[int, set[int]] = {}
    for p in cands:
        if p.get("est_jaccard") == 1.0:
            star_groups.setdefault(p["id_a"], set()).add(p["id_b"])
            if (p["id_a"], p["id_b"]) not in passed:
                rejected_members.setdefault(p["id_a"], set()).add(p["id_b"])
    if star_groups:
        seen_pairs = set(cand_pairs)
        extras: list[tuple[int, int]] = []
        # budget checked INSIDE every proposal: one rejected cross pair
        # between two large collapsed clusters expands |ca|x|cb| pairs,
        # so a guard after the nested loops would fire only once the
        # driver already holds the whole product
        budget = _pair_budget()

        def _propose(x: int, y: int) -> None:
            if x == y:
                return
            pr = (x, y) if x < y else (y, x)
            if pr not in seen_pairs:
                extras.append(pr)
                seen_pairs.add(pr)
                _check_pair_budget(
                    len(seen_pairs), "jaccard_dedup re-expansion", budget
                )

        for rep, members in rejected_members.items():
            ms = sorted(star_groups[rep])
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    _propose(ms[i], ms[j])
        for p in cands:
            if p.get("est_jaccard") == 1.0:
                continue
            a, b = p["id_a"], p["id_b"]
            ca = (a, *star_groups.get(a, ()))
            cb = (b, *star_groups.get(b, ()))
            if len(ca) == 1 and len(cb) == 1:
                continue
            if (a, b) not in passed:
                for x in ca:
                    for y in cb:
                        _propose(x, y)
            else:
                for x in rejected_members.get(a, ()):
                    for y in cb:
                        _propose(x, y)
                for y in rejected_members.get(b, ()):
                    for x in ca:
                        _propose(x, y)
        if extras:
            passed |= verify_fn(extras)
    roots = union_find(sorted(passed))
    drop = np.sort(
        np.fromiter((x for x, r in roots.items() if x != r), dtype=np.int64)
    )
    if drop.size == 0:
        return ds
    drop_ref = ray.put(drop)
    return ds.map_batches(
        _DropIds(drop_ref, id_col), batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.95,
    n_tables: int = 4,
    n_planes: int = 8,
    seed: int = 13,
    dim: int | None = None,
) -> list[dict]:
    """Cosine near-duplicates via random-hyperplane LSH: sign-pattern bucket
    per table (groupby of small sketch rows), exact cosine verification
    inside buckets, pair dedup across tables."""
    if dim is None:
        first = ds.take_batch(16, batch_format="pyarrow")
        valid = first.column(vec_col).combine_chunks().drop_null()
        if len(valid) == 0:
            raise ValueError(
                f"could not infer dim: first rows of {vec_col!r} are all "
                "null — pass dim= explicitly"
            )
        dim = len(valid[0].as_py())
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim)).astype(np.float32)
    planes_ref = ray.put(planes)

    class Sketch:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t.column(vec_col).combine_chunks()
            if col.null_count:
                # a null embedding cannot be a near-duplicate of anything:
                # drop the row rather than crash (crawled corpora contain
                # them) — mirrors jaccard_dedup's null-text policy
                t = t.filter(pc.is_valid(col))
                col = t.column(vec_col).combine_chunks()
            if t.num_rows == 0:
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "table": pa.array([], pa.int64()),
                        "bucket": pa.array([], pa.uint64()),
                        "vec": pa.FixedSizeListArray.from_arrays(
                            pa.array([], pa.float32()), dim
                        ),
                    }
                )
            vecs = np.stack(
                [np.asarray(v.values, dtype=np.float32) for v in col]
            )
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            unit = vecs / np.maximum(norms, 1e-12)
            ids = np.asarray(t.column(id_col))
            out_ids, out_tbl, out_bkt, out_vec = [], [], [], []
            for ti in range(len(self.planes)):
                proj = unit @ self.planes[ti].T  # (n, n_planes)
                bits = (proj > 0).astype(np.uint64)
                bucket = np.zeros(len(ids), dtype=np.uint64)
                for j in range(bits.shape[1]):
                    bucket |= bits[:, j] << np.uint64(j)
                out_ids.append(ids)
                out_tbl.append(np.full(len(ids), ti))
                out_bkt.append(bucket)
                out_vec.append(unit)
            return pa.table(
                {
                    id_col: np.concatenate(out_ids),
                    "table": np.concatenate(out_tbl),
                    "bucket": np.concatenate(out_bkt),
                    "vec": pa.FixedSizeListArray.from_arrays(
                        pa.array(np.concatenate(out_vec).ravel()), dim
                    ),
                }
            )

    cap = _bucket_cap("emb", 2000)
    hard = _hard_bucket_cap(cap)

    def _pair_table(a: np.ndarray, b: np.ndarray, cos: np.ndarray) -> pa.Table:
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {"id_a": lo.astype(np.int64), "id_b": hi.astype(np.int64),
             "cosine": cos.astype(np.float64)}
        )

    def pairs(t: pa.Table) -> pa.Table:
        # oversized buckets collapse to bit-identical unit vectors first
        # (the common degenerate cause: thousands of byte-identical
        # embeddings from duplicated docs); cosine depends only on the
        # two vectors, so components match all-pairs exactly. A bucket
        # with more DISTINCT vectors than the cap is a degenerate LSH
        # region and raises instead of silently dropping pairs.
        n = t.num_rows
        if n < 2:
            return _pair_table(
                np.array([], np.int64), np.array([], np.int64),
                np.array([], np.float64),
            )
        ids = np.asarray(t.column(id_col))
        vecs = np.stack([np.asarray(v.values) for v in t.column("vec").combine_chunks()])
        if n > cap:
            uniq, inverse = np.unique(vecs, axis=0, return_inverse=True)
            u = len(uniq)
            if u > hard:
                raise ValueError(
                    f"embedding LSH bucket holds {u} distinct vectors"
                    f" (> hard cap {hard}): degenerate hyperplane region"
                    " — add LSH bits, pre-filter zero/constant"
                    " embeddings, or raise TBL_RAY_HARD_BUCKET"
                )
            inverse = inverse.reshape(-1)
            reps = np.full(u, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(reps, inverse, ids.astype(np.int64))
            member_rep = reps[inverse]
            m = ids != member_rep
            star_a, star_b = member_rep[m], ids[m]
            star_cos = np.ones(star_a.shape[0], dtype=np.float64)
            star_keep = star_cos >= threshold
            if u <= cap:
                ia, ib = np.triu_indices(u, k=1)
                s = (uniq @ uniq.T)[ia, ib]
                keep = s >= threshold
                ua, ub, us = reps[ia[keep]], reps[ib[keep]], s[keep]
            else:
                tile = min(cap, 2048)
                gi, gj, us = _tiled_pairwise(
                    u,
                    lambda i0, i1, j0, j1: uniq[i0:i1] @ uniq[j0:j1].T,
                    lambda s: s >= threshold,
                    tile,
                )
                ua, ub = reps[gi], reps[gj]
            return _pair_table(
                np.concatenate([star_a[star_keep], ua]),
                np.concatenate([star_b[star_keep], ub]),
                np.concatenate([star_cos[star_keep], us]),
            )
        sims = vecs @ vecs.T
        ia, ib = np.triu_indices(n, k=1)
        s = sims[ia, ib]
        keep = s >= threshold
        return _pair_table(ids[ia[keep]], ids[ib[keep]], s[keep])

    sk = ds.map_batches(Sketch, batch_format="pyarrow", concurrency=_default_pool())
    pair_ds = _grouped_pair_exchange(sk, ["table", "bucket"], pairs)
    pair_ds = _coalesce_pairs(pair_ds, "cosine", maximize=True)
    seen = {}
    for b in pair_ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        for r in b.to_pylist():
            key = (r["id_a"], r["id_b"])
            if key not in seen or r["cosine"] > seen[key]:
                seen[key] = r["cosine"]
        _check_pair_budget(len(seen), "embedding_dup_pairs")
    return [{"id_a": a, "id_b": b, "cosine": c} for (a, b), c in sorted(seen.items())]


def exact_dedup_bucketed(
    ds: "ray.data.Dataset",
    column: str,
    id_col: str,
    *,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Exact dedup for drop-sets too large to broadcast (>~10^8 loser rows,
    where :func:`exact_dedup`'s driver-side set no longer fits).

    Same fingerprint pass 1, but pass 2 replaces the broadcast with a
    co-partitioned anti-join: loser ids and data rows are both tagged with
    ``bucket = mix(id) % n_buckets`` and unioned, one hash shuffle
    co-locates each bucket, and the per-bucket group filters its rows
    against its own (small) slice of the drop-set. Exactly one full-table
    shuffle, zero driver-side state — the standard shape when both join
    sides are huge."""

    def sketch(t: pa.Table) -> pa.Table:
        h1, h2 = _fingerprint128(t.column(column).combine_chunks())
        return pa.table({"f1": h1, "f2": h2, id_col: t.column(id_col)})

    def losers(t: pa.Table) -> pa.Table:
        ids = np.sort(np.asarray(t.column(id_col)))
        return pa.table({"drop": ids[1:].astype(np.int64)})

    drop_ds = (
        ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["f1", "f2"])
        .map_groups(losers, batch_format="pyarrow")
    )

    fields = list(zip(ds.schema().names, ds.schema().types))
    data_names = [n for n, _ in fields]

    def _bucket_of(ids: np.ndarray) -> np.ndarray:
        return (_mix(ids.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)

    def tag_data(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        t = t.append_column("__bucket__", pa.array(_bucket_of(ids)))
        return t.append_column("__drop__", pa.array(np.zeros(len(ids), np.int8)))

    def drop_to_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("drop"), dtype=np.int64)
        cols = {}
        for name, typ in fields:
            cols[name] = (
                pa.array(ids, pa.int64()).cast(typ)
                if name == id_col
                else pa.nulls(len(ids), typ)
            )
        out = pa.table(cols)
        out = out.append_column("__bucket__", pa.array(_bucket_of(ids)))
        return out.append_column("__drop__", pa.array(np.ones(len(ids), np.int8)))

    tagged = ds.map_batches(tag_data, batch_format="pyarrow", zero_copy_batch=True)
    markers = drop_ds.map_batches(drop_to_rows, batch_format="pyarrow")
    both = tagged.union(markers)

    def filter_bucket(t: pa.Table) -> pa.Table:
        is_drop = np.asarray(t.column("__drop__")) == 1
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        local_drop = np.sort(ids[is_drop])
        rows = t.filter(pa.array(~is_drop))
        if local_drop.size:
            keep = ~_sorted_member_mask(
                np.asarray(rows.column(id_col), dtype=np.int64), local_drop
            )
            rows = rows.filter(pa.array(keep))
        return rows.select(data_names)

    return both.groupby("__bucket__").map_groups(
        filter_bucket, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# train/eval decontamination (word n-gram overlap vs a small eval set)
# ---------------------------------------------------------------------------


def _word_ngram_hashes(
    col: pa.Array, n: int, seed: int = 17
) -> tuple[np.ndarray, np.ndarray]:
    """All word-level n-gram hashes of a batch + the per-row window
    offsets (length n_rows+1) — fully vectorized.

    Each window hash combines the n word hashes with per-offset odd
    multipliers, so it is order-sensitive and content-pure (identical
    across batch layouts)."""
    if col.null_count:
        col = pc.fill_null(col, "")
    words = pc.split_pattern_regex(col, r"\s+")
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    counts = np.asarray(pc.list_value_length(words), dtype=np.int64)
    n_rows = len(col)
    if len(flat) == 0:
        return np.zeros(0, np.uint64), np.zeros(n_rows + 1, np.int64)
    mask_nonempty = pc.not_equal(flat, "")
    # empty tokens (split artifacts) removed; recompute per-row counts
    keep = np.asarray(mask_nonempty)
    word_row = np.repeat(np.arange(n_rows), counts)[keep]
    counts = np.bincount(word_row, minlength=n_rows)
    flat = flat.filter(mask_nonempty)
    denc = flat.dictionary_encode()
    uniq = denc.dictionary
    uoff, udata = binary_parts(uniq)
    upos = np.arange(len(udata), dtype=np.uint64)
    ustart = np.repeat(uoff[:-1].astype(np.uint64), np.diff(uoff))
    with np.errstate(over="ignore"):
        uh = _mix(
            udata.astype(np.uint64)
            + np.uint64(1)
            + (upos - ustart) * np.uint64(0x9E3779B97F4A7C15)
        )
    uhash = segment_reduceat(np.bitwise_xor, uh, uoff, np.uint64(0))
    uhash = _mix(uhash + np.uint64(seed))
    wh = uhash[np.asarray(denc.indices)]

    word_offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    n_words = len(wh)
    # window start positions: every word position; windows whose n words
    # cross a row boundary are invalid
    if n_words < n:
        return np.zeros(0, np.uint64), np.zeros(n_rows + 1, np.int64)
    mult = (np.arange(n, dtype=np.uint64) * np.uint64(2) + np.uint64(1)) * np.uint64(
        0xC2B2AE3D27D4EB4F
    )
    with np.errstate(over="ignore"):
        acc = np.zeros(n_words - n + 1, dtype=np.uint64)
        for j in range(n):
            acc ^= _mix(wh[j : n_words - n + 1 + j] * mult[j])
    row_start = np.repeat(word_offsets[:-1], counts)
    row_len = np.repeat(counts, counts)
    pos = np.arange(n_words, dtype=np.int64)
    valid = ((pos - row_start) <= (row_len - n))[: len(acc)]
    # per-row WINDOW offsets: row i owns windows starting at its word
    # positions [off_i, off_i + max(len_i - n + 1, 0))
    wins_per_row = np.maximum(counts - n + 1, 0)
    win_offsets = np.concatenate(([0], np.cumsum(wins_per_row))).astype(np.int64)
    return acc[valid], win_offsets


def decontaminate(
    train_ds: "ray.data.Dataset",
    eval_ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    n: int = 8,
    threshold: int = 1,
    bloom_bits_per_ngram: int | None = None,
) -> "ray.data.Dataset":
    """Drop training docs sharing >= ``threshold`` word ``n``-grams with the
    eval set (the standard benchmark-contamination filter).

    Scale shape: the eval side is small by definition — its shingle
    hashes collect driver-side into one sorted unique array, broadcast
    via ``ray.put``; each train batch counts overlaps with a vectorized
    ``searchsorted`` + per-row ``add.reduceat``. The train table streams
    once; nothing shuffles.

    ``bloom_bits_per_ngram`` (16 -> ~0.24% FP, 32 -> ~0.02%, 4 probes) swaps
    the exact broadcast for a Bloom filter: memory drops from 8 bytes to
    ~2 bytes per eval n-gram (a 10^9-shingle eval suite broadcasts 2 GB
    instead of 8 GB), at the cost of rare false-positive *extra drops* —
    the conservative direction for decontamination. False negatives are
    impossible, so nothing contaminated ever survives that the exact
    filter would have caught."""

    def eval_hashes(t: pa.Table) -> pa.Table:
        h, _ = _word_ngram_hashes(t.column(text_col).combine_chunks(), n)
        return pa.table({"h": np.unique(h)})

    parts = eval_ds.map_batches(
        eval_hashes, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    banned = np.unique(np.fromiter((r["h"] for r in parts), dtype=np.uint64))
    if banned.size == 0:
        return train_ds

    if bloom_bits_per_ngram is not None:
        if bloom_bits_per_ngram < 8:
            # below ~8 bits/element the 4-probe FP rate explodes (at 0 the
            # filter saturates and silently drops the whole corpus)
            raise ValueError(
                "bloom_bits_per_ngram must be >= 8 "
                f"(got {bloom_bits_per_ngram}); 16 -> ~0.24% FP, 32 -> ~0.02%"
            )
        m_bits = int(max(banned.size * bloom_bits_per_ngram, 64))
        bloom = _bloom_build(banned, m_bits)
        bloom_ref = ray.put((bloom, np.uint64(m_bits)))

        def keep_bloom(t: pa.Table) -> pa.Table:
            blm, mb = ray.get(bloom_ref)
            col = t.column(text_col).combine_chunks()
            h, win_offsets = _word_ngram_hashes(col, n)
            if len(h) == 0:
                return t
            hit = _bloom_query(blm, mb, h).astype(np.int64)
            per_row = segment_reduceat(np.add, hit, win_offsets, np.int64(0))
            return t.filter(pa.array(per_row < threshold))

        return train_ds.map_batches(
            keep_bloom, batch_format="pyarrow", zero_copy_batch=True
        )

    banned_ref = ray.put(banned)

    def keep(t: pa.Table) -> pa.Table:
        bad = ray.get(banned_ref)
        col = t.column(text_col).combine_chunks()
        h, win_offsets = _word_ngram_hashes(col, n)
        if len(h) == 0:
            return t
        idx = np.searchsorted(bad, h)
        idx_c = np.minimum(idx, len(bad) - 1)
        hit = ((idx < len(bad)) & (bad[idx_c] == h)).astype(np.int64)
        per_row = segment_reduceat(np.add, hit, win_offsets, np.int64(0))
        return t.filter(pa.array(per_row < threshold))

    return train_ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


_BLOOM_PROBES = 4


def _bloom_probes(h: np.ndarray, m_bits: np.uint64):
    """Probe positions per hash (Kirsch-Mitzenmacher double hashing over
    the already-mixed 64-bit shingle hash): pos_i = h + i*h2 mod m. At 16
    bits/element with 4 probes the FP rate is ~0.24%; 32 bits -> ~0.02%."""
    with np.errstate(over="ignore"):
        h2 = (h ^ (h >> np.uint64(31))) * np.uint64(0x94D049BB133111EB)
        return [
            (h + np.uint64(i) * h2) % m_bits for i in range(_BLOOM_PROBES)
        ]


def _bloom_build(hashes: np.ndarray, m_bits: int) -> np.ndarray:
    """Bit array (uint8-packed), ``_BLOOM_PROBES`` probes per element."""
    bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    for pos in _bloom_probes(hashes.astype(np.uint64), np.uint64(m_bits)):
        np.bitwise_or.at(
            bits, (pos >> np.uint64(3)).astype(np.int64),
            np.left_shift(
                np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
            ),
        )
    return bits


def _bloom_query(
    bits: np.ndarray, m_bits: np.uint64, h: np.ndarray
) -> np.ndarray:
    """Vectorized membership test (True may be a false positive)."""
    out = np.ones(len(h), dtype=bool)
    for pos in _bloom_probes(h.astype(np.uint64), m_bits):
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        out &= (
            byte >> (pos & np.uint64(7)).astype(np.uint8) & np.uint8(1)
        ).astype(bool)
    return out


def _coalesce_pairs(
    pair_ds: "ray.data.Dataset", value_col: str, *, maximize: bool
) -> "ray.data.Dataset":
    """Pre-dedup (id_a, id_b) candidate pairs across bands/tables before
    the driver collect: each merge task keeps the best ``value_col`` per
    pair (vectorized sort + first-of-group mask), cutting the driver's
    row count by ~the band multiplicity."""

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["id_a", "id_b", value_col])
        order = t.select(["id_a", "id_b", value_col]).sort_by(
            [
                ("id_a", "ascending"),
                ("id_b", "ascending"),
                (value_col, "descending" if maximize else "ascending"),
            ]
        )
        a = np.asarray(order.column("id_a"))
        b = np.asarray(order.column("id_b"))
        first = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))
        )
        return order.filter(pa.array(first))

    return pair_ds.map_batches(fold, batch_format="pyarrow", batch_size=65536)
