"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_brute` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch computes a vectorized matmul + partial
  top-k, and the driver merges the (tiny) per-batch candidate lists. The
  dataset streams; nothing materializes.
- :func:`knn_ivf` — the scale path: coarse k-means centroids trained on a
  sample (driver, numpy), broadcast; batches only score rows whose nearest
  centroid is in each query's probe list — a cluster-pruned scan that cuts
  compute by ~n_clusters/n_probe at equal recall for clustered data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data



def _vec_matrix(t: pa.Table, vec_col: str) -> np.ndarray:
    col = t.column(vec_col).combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # fail loud: a null slot has no values in a ListArray's backing
        # buffer, so reshaping around it silently attributes every later
        # row's vector to the WRONG id (and FixedSizeList nulls read as
        # garbage) — misaligned similarities are worse than an error
        raise ValueError(
            f"{vec_col!r} contains {col.null_count} null embeddings; "
            "filter them out (pc.is_valid) before similarity ops"
        )
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        return np.asarray(col.values, dtype=np.float32).reshape(-1, dim)
    # variable list<float>: offsets are uniform for embedding tables
    lens = np.diff(col.offsets)
    dim = int(lens[0]) if len(lens) else 0
    if len(lens) and int(lens.min()) != int(lens.max()):
        raise ValueError(
            f"{vec_col!r} is ragged (lengths {int(lens.min())}.."
            f"{int(lens.max())}); embeddings must be fixed-dimension"
        )
    return np.asarray(col.values, dtype=np.float32).reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _keep_topk_per_query(t: pa.Table, k: int) -> pa.Table:
    """Reduce a (query, id, score) candidate table to each query's k best
    (score desc, id asc) — vectorized sort + per-group rank mask."""
    if t.num_rows == 0:
        return t
    order = t.sort_by(
        [("query", "ascending"), ("score", "descending"), ("id", "ascending")]
    )
    q = np.asarray(order.column("query"))
    starts = np.concatenate(([0], np.flatnonzero(np.diff(q)) + 1))
    group_len = np.diff(np.append(starts, len(q)))
    rank = np.arange(len(q)) - np.repeat(starts, group_len)
    return order.filter(pa.array(rank < k))


def _collect_topk(partials_ds: "ray.data.Dataset", nq: int, k: int) -> list[list[dict]]:
    """Coalesce per-block candidate lists (256 blocks per merge task) so
    the driver collects ~n_blocks/256 * nq * k rows instead of one list
    per block, then finish the merge locally."""
    merged = partials_ds.map_batches(
        lambda t: _keep_topk_per_query(t, k),
        batch_format="pyarrow",
        batch_size=256 * k,
    ).take_all()
    out: list[list[dict]] = []
    for qi in range(nq):
        cand = [(r["score"], r["id"]) for r in merged if r["query"] == qi]
        cand.sort(key=lambda sc: (-sc[0], sc[1]))
        out.append([{"id": i, "score": s} for s, i in cand[:k]])
    return out


def knn_brute(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[dict]]:
    """Exact cosine top-k per query. Returns, per query, a list of
    ``{id, score}`` dicts sorted by descending similarity (ties: id)."""
    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(q)

    # plain function -> elastic TASKS: there is no per-worker init to
    # amortize (the broadcast ray.get is a zero-copy local-object-store
    # read per task), and actor-pool spin-up alone costs ~1s on small
    # inputs. Broadcast still ships ONCE per node via the object store.
    def partial_topk(t: pa.Table) -> pa.Table:
        q_mat = ray.get(q_ref)
        vecs = _normalize(_vec_matrix(t, vec_col))
        ids = np.asarray(t.column(id_col))
        sims = vecs @ q_mat.T  # (n, nq)
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
        nq = q_mat.shape[0]
        out_q = np.repeat(np.arange(nq), kk)
        idx = top.T.ravel()
        return pa.table(
            {
                "query": out_q.astype(np.int64),
                "id": ids[idx].astype(np.int64),
                "score": sims[idx, out_q].astype(np.float64),
            }
        )

    partials = ds.map_batches(
        partial_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return _collect_topk(partials, q.shape[0], k)


def _train_sample(
    ds: "ray.data.Dataset",
    id_col: str,
    sample_rows: int,
    *,
    seed: int = 3,
) -> pa.Table:
    """Deterministic UNBIASED training sample: per-row keep decision from
    a seeded splitmix64 hash of ``id_col`` — never ``ds.limit()``, whose
    first-N rows train collapsed centroids on corpora sorted by
    domain/time/cluster. Costs one ``count()`` (parquet metadata for
    file-backed reads) to size the keep fraction; the sample is
    identical across runs, cluster sizes and block layouts."""
    from tbl_ray.webtable import _mix

    n = ds.count()
    if n == 0:
        raise ValueError("cannot sample an empty dataset")
    if n <= sample_rows:
        return pa.concat_tables(
            ds.iter_batches(batch_format="pyarrow", batch_size=None)
        ).combine_chunks()
    # the sample is the sample_rows SMALLEST hash values: oversample the
    # filter ~25% + slack so enough rows pass w.h.p., then finish the
    # top-k locally — exact, block-layout independent
    frac = min(1.0, (sample_rows * 1.25 + 64.0) / n)
    thr = np.uint64(int(frac * float(2**64 - 1)))
    useed = np.uint64(seed)

    def keep(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = _mix(ids + useed)
        m = h < thr
        return t.filter(pa.array(m)).append_column(
            "__h__", pa.array(h[m], pa.uint64())
        )

    picked = pa.concat_tables(
        ds.map_batches(
            keep, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ).combine_chunks()
    return (
        picked.sort_by([("__h__", "ascending")])
        .slice(0, sample_rows)
        .drop_columns(["__h__"])
    )


def train_centroids(
    sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 3
) -> np.ndarray:
    """Plain k-means on a sample (driver-side, numpy)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample.astype(np.float32))
    cent = sample[rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_rows: int = 5000,
) -> list[list[dict]]:
    """Cluster-pruned approximate cosine top-k (IVF-flat).

    Scan cost per batch ~ n_probe / n_clusters of brute force; recall
    depends on how clustered the data is."""
    sample_t = _train_sample(ds, id_col, sample_rows)
    cent = train_centroids(_vec_matrix(sample_t, vec_col), n_clusters)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    state = ray.put((q, cent, probes))

    def probed_topk(t: pa.Table) -> pa.Table:
        # tasks, not an actor pool: no per-worker init to amortize (see
        # knn_brute); broadcast state read zero-copy per task
        q_mat, cent_m, probes_m = ray.get(state)
        vecs = _normalize(_vec_matrix(t, vec_col))
        ids = np.asarray(t.column(id_col))
        assign = np.argmax(vecs @ cent_m.T, axis=1)
        rows_q, rows_id, rows_s = [], [], []
        for qi in range(q_mat.shape[0]):
            mask = np.isin(assign, probes_m[qi])
            if not mask.any():
                continue
            sub = vecs[mask]
            sims = sub @ q_mat[qi]
            kk = min(k, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk]
            rows_q.append(np.full(kk, qi))
            rows_id.append(ids[mask][top])
            rows_s.append(sims[top])
        if not rows_q:
            return pa.table(
                {"query": pa.array([], pa.int64()), "id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query": np.concatenate(rows_q).astype(np.int64),
                "id": np.concatenate(rows_id).astype(np.int64),
                "score": np.concatenate(rows_s).astype(np.float64),
            }
        )

    partials = ds.map_batches(
        probed_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return _collect_topk(partials, q.shape[0], k)


# ---------------------------------------------------------------------------
# persisted IVF index — build once, prune at the FILE level per query
# ---------------------------------------------------------------------------

IVF_META = "ivf_meta.json"
IVF_CENTROIDS = "centroids.npy"


def build_ivf_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    sample_rows: int = 5000,
    iters: int = 10,
    seed: int = 3,
) -> dict:
    """Build a persisted IVF-flat index: centroids trained on a sample
    (driver numpy, broadcast), every row tagged with its nearest centroid,
    and the table written as hive-partitioned parquet
    (``cluster=<c>/...``). Repeated queries then skip non-probed clusters
    at the *file* level — the scan never opens their row groups — instead
    of filtering batches after a full read.

    Returns the meta dict (also stored at ``<index_dir>/ivf_meta.json``)."""
    import json
    import os

    sample_t = _train_sample(ds, id_col, sample_rows, seed=seed)
    sample = _vec_matrix(sample_t, vec_col)
    cent = train_centroids(sample, n_clusters, iters=iters, seed=seed)
    dim = sample.shape[1]
    cent_ref = ray.put(cent)

    def tag(t: pa.Table) -> pa.Table:
        # tasks, not an actor pool (see knn_brute): centroids read
        # zero-copy from the local object store per task
        cent_m = ray.get(cent_ref)
        vecs = _normalize(_vec_matrix(t, vec_col))
        assign = np.argmax(vecs @ cent_m.T, axis=1).astype(np.int64)
        return t.append_column("cluster", pa.array(assign))

    os.makedirs(index_dir, exist_ok=True)
    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    tagged.write_parquet(
        os.path.join(index_dir, "clusters"), partition_cols=["cluster"]
    )
    np.save(os.path.join(index_dir, IVF_CENTROIDS), cent)
    meta = {
        "n_clusters": int(len(cent)),
        "dim": int(dim),
        "vec_col": vec_col,
        "id_col": id_col,
        "version": 1,
    }
    with open(os.path.join(index_dir, IVF_META), "w") as fh:
        json.dump(meta, fh)
    return meta


def knn_ivf_index(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    *,
    n_probe: int = 4,
) -> list[list[dict]]:
    """Approximate cosine top-k against a prebuilt :func:`build_ivf_index`
    directory. Only the parquet partitions of probed clusters are read —
    scan I/O is ~``n_probe / n_clusters`` of the full table."""
    import json
    import os

    with open(os.path.join(index_dir, IVF_META)) as fh:
        meta = json.load(fh)
    cent = np.load(os.path.join(index_dir, IVF_CENTROIDS))
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    import glob

    probed = sorted({int(c) for row in probes for c in row})
    paths = [
        f
        for c in probed
        for f in sorted(
            glob.glob(os.path.join(index_dir, "clusters", f"cluster={c}", "*"))
        )
    ]
    if not paths:
        return [[] for _ in range(q.shape[0])]
    state = ray.put((q, probes))

    def partition_topk(t: pa.Table) -> pa.Table:
        # tasks, not an actor pool (see knn_brute)
        q_mat, probes_m = ray.get(state)
        vecs = _normalize(_vec_matrix(t, vec_col))
        ids = np.asarray(t.column(id_col))
        # hive partitioning re-materializes `cluster` as a STRING column
        clusters = np.asarray(
            t.column("cluster").combine_chunks().cast(pa.int64())
        )
        rows_q, rows_id, rows_s = [], [], []
        for qi in range(q_mat.shape[0]):
            mask = np.isin(clusters, probes_m[qi])
            if not mask.any():
                continue
            sims = vecs[mask] @ q_mat[qi]
            kk = min(k, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk]
            rows_q.append(np.full(kk, qi))
            rows_id.append(ids[mask][top])
            rows_s.append(sims[top])
        if not rows_q:
            return pa.table(
                {"query": pa.array([], pa.int64()),
                 "id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query": np.concatenate(rows_q).astype(np.int64),
                "id": np.concatenate(rows_id).astype(np.int64),
                "score": np.concatenate(rows_s).astype(np.float64),
            }
        )

    partials = ray.data.read_parquet(paths).map_batches(
        partition_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return _collect_topk(partials, q.shape[0], k)


def embedding_centroids(
    ds: "ray.data.Dataset",
    key: str = "label",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Per-key mean embedding, long form: (key, pos, value, n) with
    ``pos`` the 1-based vector component — SQL-comparable via aligned
    ``unnest`` + ``avg``.

    Scale shape: each block collapses to one (key, sum-vector, count)
    row per batch-distinct key (a sorted ``reduceat`` over the vector
    matrix — no per-row Python), so the exchange moves one d-dim partial
    per key per block; the merge sums partials per key and divides once."""

    def partial(t: pa.Table) -> pa.Table:
        m = _vec_matrix(t, vec_col).astype(np.float64)
        d = m.shape[1]
        keys = t.column(key).combine_chunks()
        denc = pc.dictionary_encode(keys)
        codes = np.asarray(denc.indices.cast(pa.int64()))
        order = np.argsort(codes, kind="stable")
        starts = np.flatnonzero(
            np.concatenate(([True], codes[order][1:] != codes[order][:-1]))
        )
        sums = np.add.reduceat(m[order], starts, axis=0)
        counts = np.bincount(codes, minlength=len(denc.dictionary))
        uniq_codes = codes[order][starts]
        return pa.table(
            {
                key: denc.dictionary.take(pa.array(uniq_codes)),
                "__sum__": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel()), d
                ),
                "__n__": pa.array(counts[uniq_codes].astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        """One key's partials -> long-form centroid rows."""
        vecs = np.asarray(
            t.column("__sum__").combine_chunks().values, dtype=np.float64
        ).reshape(t.num_rows, -1)
        total = vecs.sum(axis=0)
        n = int(np.asarray(t.column("__n__")).sum())
        d = len(total)
        return pa.table(
            {
                key: t.column(key).take(pa.array([0] * d)),
                "pos": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "value": pa.array(total / n),
                "n": pa.array([n] * d, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    from tbl_ray.sizing import collect_local, fits_local

    t = collect_local(partials) if fits_local(ds) else None
    if t is not None:
        keys_arr = t.column(key).combine_chunks()
        denc = pc.dictionary_encode(keys_arr)
        codes = np.asarray(denc.indices.cast(pa.int64()))
        outs = [
            fold(t.take(pa.array(np.flatnonzero(codes == c))))
            for c in np.unique(codes)
        ]
        return ray.data.from_arrow(pa.concat_tables(outs))
    return partials.groupby(key).map_groups(fold, batch_format="pyarrow")


def kmeans_fit(
    ds: "ray.data.Dataset",
    n_clusters: int,
    *,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, list[float]]:
    """Distributed Lloyd k-means over the FULL dataset (cosine geometry:
    rows and centroids unit-normalized, assignment by max dot product).

    The canonical Ray iterative-algorithm shape: per iteration the
    centroid matrix ships once via ``ray.put``; every batch computes one
    vectorized matmul + a scatter-add, emitting a single mergeable
    partial row (per-cluster float64 sum-vectors, counts, and the batch
    inertia — k x (d + 2) numbers, independent of batch rows); the
    driver reduces the tiny partial stream and renormalizes. Per-pass
    data movement is O(blocks x k x d), never the vectors themselves.
    Init is deterministic: the ``n_clusters`` rows with the smallest
    ``id_col`` values. Returns (centroids [k, d] float32, per-iteration
    mean inertia) — inertia here is mean(1 - cos_sim to the assigned
    centroid), monotone non-increasing up to float noise.

    Empty clusters keep their previous centroid (standard Lloyd fix).
    Each iteration re-reads ``ds`` — inherent to Lloyd; pass a
    materialized dataset to amortize the scan when it fits.
    """
    from tbl_ray.sizing import collect_local, fits_local
    from tbl_ray.stages.slicing import topk as _topk

    # cost-based local resolve (tbl_ray.sizing): Lloyd is iters+1 full
    # passes, each paying the distributed pipeline's fixed cost — when
    # the input is PROVABLY small, collect once and run the identical
    # math in-process (same init, same argmax/mean updates). The
    # distributed path below remains the scale plan; both are exercised
    # by the tests via TBL_RAY_LOCAL_SKETCH_BYTES.
    if fits_local(ds):
        t = collect_local(ds)
        if t is None:
            raise ValueError("kmeans_fit: empty input")
        order = np.argsort(
            np.asarray(t.column(id_col), dtype=np.int64), kind="stable"
        )[:n_clusters]
        v_all = _normalize(_vec_matrix(t, vec_col)).astype(np.float64)
        # order (an argsort by id) already lists rows in ascending-id
        # order — taking np.sort(order) would seed in ROW order instead
        # and permute the clusters vs the distributed plan
        cent = _normalize(_vec_matrix(t.take(pa.array(order)), vec_col)
                          .astype(np.float64))
        history: list[float] = []
        for _ in range(iters):
            sims = v_all @ cent.T
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(v_all)), assign]
            history.append(float((len(v_all) - best.sum()) / max(len(v_all), 1)))
            sums = np.zeros_like(cent)
            np.add.at(sums, assign, v_all)
            counts = np.bincount(assign, minlength=len(cent)).astype(np.float64)
            nonempty = counts > 0
            cent[nonempty] = _normalize(sums[nonempty] / counts[nonempty, None])
        return cent.astype(np.float32), history

    seed_rows = _topk(ds, [id_col], n_clusters)
    seed_t = pa.concat_tables(
        seed_rows.iter_batches(batch_format="pyarrow", batch_size=None)
    ).combine_chunks()
    cent = _normalize(_vec_matrix(seed_t, vec_col).astype(np.float64))
    k, d = cent.shape
    history: list[float] = []

    for _ in range(iters):
        cent_ref = ray.put(cent.astype(np.float32))

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            if not t.num_rows:  # before _vec_matrix: it indexes lens[0]
                z = np.zeros(len(c) * c.shape[1] + len(c) + 2)
                return pa.table({"acc": pa.array([z.tolist()])})
            v = _normalize(_vec_matrix(t, vec_col))
            sims = v @ c.T
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(v)), assign]
            sums = np.zeros((len(c), c.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, v.astype(np.float64))
            counts = np.bincount(assign, minlength=len(c)).astype(
                np.float64
            )
            acc = np.concatenate(
                [
                    sums.ravel(),
                    counts,
                    [float(len(v) - best.sum()), float(len(v))],
                ]
            )
            return pa.table({"acc": pa.array([acc.tolist()])})

        partials = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        total = np.zeros(k * d + k + 2, dtype=np.float64)
        for b in partials.iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            for row in b.column("acc").to_pylist():
                total += np.asarray(row)
        sums = total[: k * d].reshape(k, d)
        counts = total[k * d : k * d + k]
        n_rows = total[-1]
        history.append(float(total[-2] / max(n_rows, 1.0)))
        nonempty = counts > 0
        cent[nonempty] = _normalize(
            sums[nonempty] / counts[nonempty, None]
        )
    return cent.astype(np.float32), history


def kmeans_assign(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> "ray.data.Dataset":
    """Append the nearest-centroid id (cosine) — one broadcast + one
    matmul per batch, streaming."""
    cent_ref = ray.put(_normalize(centroids.astype(np.float32)))

    def assign(t: pa.Table) -> pa.Table:
        if not t.num_rows:  # before _vec_matrix: it indexes lens[0]
            return t.append_column(
                out_col, pa.array([], pa.int64())
            )
        c = ray.get(cent_ref)
        v = _normalize(_vec_matrix(t, vec_col))
        lbl = np.argmax(v @ c.T, axis=1).astype(np.int64)
        return t.append_column(out_col, pa.array(lbl))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
