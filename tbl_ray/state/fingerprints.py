"""Persistent fingerprint store: exact dedup ACROSS ingestion runs.

The webtext use case: a corpus is ingested in increments (weekly crawls,
backfill batches). Within-increment dedup (:func:`tbl_ray.functions.dedup.
exact_dedup`) is not enough — increment N must also drop every document
already kept by increments 1..N-1 without re-reading them. This module
keeps the 128-bit content fingerprints of every kept document in a
directory of sorted parquet "runs" (16 B/row) and filters each new
increment against them.

Scale shape (same discipline as ``exact_dedup``):

- only (f1, f2, id) sketches move — never documents;
- the store loads driver-side and ships to workers ONCE by ObjectRef
  (16 B/doc: 10^9 kept docs = 16 GB, within one node's heap; beyond
  that, shard the store by hash(f1) range and run one
  ``dedup_against_store`` per shard — the run files are already
  hash-prefix-sortable);
- the per-increment drop-id broadcast is bounded by the increment's
  duplicate count (exactly ``exact_dedup``'s documented ~10^8 bound);
- run appends are atomic (tmp + rename) and content-addressed, so a
  crashed/retried ingest cannot corrupt or double-write a run.

Deployment assumption (documented per the custom-operator contract):
the store directory must be visible to the DRIVER (both plans) and —
only for the big-increment distributed update path, where encode
workers append runs directly — to all workers (shared FS / mounted
object store). The small-increment plan reads and writes the store
from the driver only.

Reference parity: the reference engine (paradigmxyz/tbl) has no
cross-run state; this is a training-data-pipeline extension
(SURVEY.md §2 extension set).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from tbl_ray.functions.dedup import _DropIds, _fingerprint128
from tbl_ray.sizing import collect_local

_RUN_PREFIX = "fprun-"


class FingerprintStore:
    """Directory of sorted (f1, f2) uint64 parquet runs."""

    def __init__(self, store_dir: str):
        self.dir = store_dir
        os.makedirs(store_dir, exist_ok=True)

    def _run_paths(self) -> list[str]:
        return sorted(
            os.path.join(self.dir, f)
            for f in os.listdir(self.dir)
            if f.startswith(_RUN_PREFIX) and f.endswith(".parquet")
        )

    def load(self) -> tuple[np.ndarray, np.ndarray]:
        """All stored fingerprints, merged, unique, sorted by (f1, f2)."""
        paths = self._run_paths()
        if not paths:
            z = np.empty(0, np.uint64)
            return z, z
        parts = [pq.read_table(p) for p in paths]
        t = pa.concat_tables(parts)
        f1 = np.asarray(t.column("f1"), dtype=np.uint64)
        f2 = np.asarray(t.column("f2"), dtype=np.uint64)
        order = np.lexsort((f2, f1))
        f1, f2 = f1[order], f2[order]
        if len(f1):
            keep = np.ones(len(f1), bool)
            keep[1:] = (f1[1:] != f1[:-1]) | (f2[1:] != f2[:-1])
            f1, f2 = f1[keep], f2[keep]
        return f1, f2

    def append(self, f1: np.ndarray, f2: np.ndarray) -> str | None:
        """Atomically add one sorted, deduped run; content-addressed name
        makes a crashed-and-retried ingest idempotent."""
        if len(f1) == 0:
            return None
        order = np.lexsort((f2, f1))
        f1, f2 = f1[order], f2[order]
        keep = np.ones(len(f1), bool)
        keep[1:] = (f1[1:] != f1[:-1]) | (f2[1:] != f2[:-1])
        f1, f2 = f1[keep], f2[keep]
        digest = hashlib.sha256(f1.tobytes() + f2.tobytes()).hexdigest()[:20]
        path = os.path.join(self.dir, f"{_RUN_PREFIX}{digest}.parquet")
        if os.path.exists(path):
            return path  # identical run already stored
        tmp = f"{path}_tmp.{os.getpid()}"
        pq.write_table(
            pa.table({"f1": pa.array(f1), "f2": pa.array(f2)}), tmp
        )
        os.replace(tmp, path)
        return path

    def compact(self) -> str | None:
        """Merge all runs into one (idempotent; safe to re-run)."""
        paths = self._run_paths()
        if len(paths) <= 1:
            return paths[0] if paths else None
        f1, f2 = self.load()
        new = self.append(f1, f2)
        for p in paths:
            if p != new:
                os.remove(p)
        return new

    def count(self) -> int:
        return int(len(self.load()[0]))


def _member_mask(
    f1q: np.ndarray, f2q: np.ndarray, sf1: np.ndarray, sf2: np.ndarray
) -> np.ndarray:
    """Vectorized 128-bit membership against a (f1,f2)-sorted store.

    Binary search on f1, then equality probes across the (almost always
    length-1; >1 only on 2^-64 f1 collisions) run of equal f1 values."""
    n = len(sf1)
    found = np.zeros(len(f1q), bool)
    if n == 0 or len(f1q) == 0:
        return found
    lo = np.searchsorted(sf1, f1q, side="left")
    # longest run of equal f1 in the store bounds the probe loop
    if n > 1:
        starts = np.flatnonzero(np.concatenate(([True], sf1[1:] != sf1[:-1])))
        max_run = int(np.diff(np.append(starts, n)).max())
    else:
        max_run = 1
    for k in range(max_run):
        pos = lo + k
        ok = pos < n
        posc = np.minimum(pos, n - 1)
        found |= ok & (sf1[posc] == f1q) & (sf2[posc] == f2q)
    return found


class _StoreHits:
    """Sketch-batch stage: emit ids whose fingerprint is in the store."""

    def __init__(self, store_ref, id_col: str):
        self.store_ref = store_ref
        self.id_col = id_col
        self._store = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._store is None:
            self._store = ray.get(self.store_ref)
        sf1, sf2 = self._store
        hit = _member_mask(
            np.asarray(t.column("f1"), np.uint64),
            np.asarray(t.column("f2"), np.uint64),
            sf1,
            sf2,
        )
        return pa.table({"hit": t.column(self.id_col).filter(pa.array(hit))})


def dedup_against_store(
    ds: "ray.data.Dataset",
    column: str,
    id_col: str,
    store_dir: str,
    *,
    update: bool = True,
) -> "ray.data.Dataset":
    """Keep, from the new increment ``ds``, the min-``id_col`` row per
    distinct ``column`` value NOT already present in the store; when
    ``update``, the kept rows' fingerprints are appended as one atomic
    run so the next increment dedups against them too.

    Both plans consume ``ds`` exactly TWICE (sketch pass + broadcast
    filter pass) and never shuffle documents: small increments resolve
    the 24 B/row sketch on the driver; big ones resolve it in ONE
    bucket exchange whose per-bucket task also checks the broadcast
    store and appends its kept fingerprints. Materialize or checkpoint
    expensive upstreams first, as with ``exact_dedup``."""
    from tbl_ray.sizing import fits_local

    store = FingerprintStore(store_dir)

    def sketch(t: pa.Table) -> pa.Table:
        h1, h2 = _fingerprint128(t.column(column).combine_chunks())
        return pa.table({"f1": h1, "f2": h2, id_col: t.column(id_col)})

    pair_ds = ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)

    if fits_local(ds):
        # small increment: one driver lexsort resolves winners AND store
        # membership — same cost-based fast path as exact_dedup
        sf1, sf2 = store.load()
        t = collect_local(pair_ds)
        if t is None:
            return ds
        f1 = np.asarray(t.column("f1"), np.uint64)
        f2 = np.asarray(t.column("f2"), np.uint64)
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        order = np.lexsort((ids, f2, f1))
        f1s, f2s, idss = f1[order], f2[order], ids[order]
        dup = np.zeros(len(idss), bool)
        if len(idss) > 1:
            dup[1:] = (f1s[1:] == f1s[:-1]) & (f2s[1:] == f2s[:-1])
        # a winner whose fingerprint is already stored is dropped too
        in_store = _member_mask(f1s, f2s, sf1, sf2)
        drop = np.sort(idss[dup | in_store])
        if update:
            kept = ~(dup | in_store)
            store.append(f1s[kept], f2s[kept])
    else:
        # big increment: ONE bucket exchange resolves everything — a
        # fingerprint's rows all land in one bucket, so each bucket task
        # computes its within-increment losers, its store hits (store
        # ships once by ObjectRef), AND appends its kept fingerprints as
        # one content-addressed run (idempotent on task retry). Only the
        # drop ids return to the driver, bounded by the duplicate count —
        # exactly exact_dedup's documented bound.
        # NOTE: no tbl_ray imports inside the worker fn — runtime imports
        # fail from a foreign cwd; module globals ship by value instead.
        from tbl_ray.stages.exchange import bucket_exchange

        store_ref = ray.put(store.load())
        sdir = store.dir
        do_update = update

        def bucket_resolve(t: pa.Table) -> pa.Table:
            f1 = np.asarray(t.column("f1"), np.uint64)
            f2 = np.asarray(t.column("f2"), np.uint64)
            ids = np.asarray(t.column(id_col), dtype=np.int64)
            order = np.lexsort((ids, f2, f1))
            f1s, f2s, idss = f1[order], f2[order], ids[order]
            dup = np.zeros(len(idss), bool)
            if len(idss) > 1:
                dup[1:] = (f1s[1:] == f1s[:-1]) & (f2s[1:] == f2s[:-1])
            sf1, sf2 = ray.get(store_ref)
            hit = _member_mask(f1s, f2s, sf1, sf2)
            drop_mask = dup | hit
            if do_update:
                keep = ~drop_mask
                FingerprintStore(sdir).append(f1s[keep], f2s[keep])
            return pa.table({"drop": pa.array(idss[drop_mask], pa.int64())})

        drop = np.sort(
            np.fromiter(
                (
                    r["drop"]
                    for r in bucket_exchange(
                        pair_ds, ["f1", "f2"], bucket_resolve
                    ).take_all()
                ),
                dtype=np.int64,
            )
        )

    if drop.size == 0:
        return ds
    drop_ref = ray.put(drop)
    return ds.map_batches(
        _DropIds(drop_ref, id_col), batch_format="pyarrow", zero_copy_batch=True
    )


def store_hits(
    ds: "ray.data.Dataset", column: str, id_col: str, store_dir: str
) -> np.ndarray:
    """Distributed store-membership: the ids of rows whose ``column``
    fingerprint is already stored. The store ships by ObjectRef once;
    only hit ids return to the driver (bounded by the duplicate count).
    Building block for sharded-store pipelines where even the sketch is
    too big to collect."""
    store = FingerprintStore(store_dir)
    store_ref = ray.put(store.load())

    def sketch(t: pa.Table) -> pa.Table:
        h1, h2 = _fingerprint128(t.column(column).combine_chunks())
        return pa.table({"f1": h1, "f2": h2, id_col: t.column(id_col)})

    hits = (
        ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            _StoreHits(store_ref, id_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .take_all()
    )
    return np.sort(np.fromiter((r["hit"] for r in hits), dtype=np.int64))
