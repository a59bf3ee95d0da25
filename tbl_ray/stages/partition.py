"""Partitioned output — implements the reference's *stubbed* partition modes.

The reference declares ``--partition COL``, ``--partition-by-rows``,
``--partition-by-bytes`` (crates/tbl-cli/src/cli/args.rs:385-419) but the
implementation returns "partition functionality not implemented"
(crates/tbl-cli/src/output.rs:181-189). These are central to the north rule,
so we build them Ray-Data-first:

- **partition_by_key** — one output directory per key value (hive-style
  ``col=value/``), with **salted fan-out for hot keys**: a two-pass plan
  (cheap pre-aggregated key counts -> driver plan -> broadcast) splits any
  key whose row count exceeds the budget into round-robin shards, so a
  Zipfian ``lang``/host distribution can never produce an over-budget
  partition (SURVEY.md §7.4.7). The data shuffle is a single
  ``groupby(shard).map_groups`` whose groups are budget-bounded by
  construction.
- **partition_by_rows / partition_by_bytes** — size-budget repartition +
  write, row/byte budgets from parquet metadata (no extra data pass).

Duplicate-output collision checks mirror
crates/tbl-core/src/filesystem/outputs.rs:296-306 (plan-level, before any
work runs).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from tbl_ray.stages.encode import _default_pool


class PartitionError(ValueError):
    pass


def _key_counts(ds: "ray.data.Dataset", column: str) -> dict:
    """Per-key row counts via per-batch partial aggregation (the all-to-all
    exchange only moves one row per distinct value per block)."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([column]).group_by(column).aggregate([(column, "count")])
        return g.rename_columns([column, "__partial__"])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # null-safe bucket merge (Ray's groupby cannot range-sort null keys,
    # and a null partition value is legal input)
    from tbl_ray.stages.exchange import bucket_exchange

    def per_bucket(t: pa.Table) -> pa.Table:
        mt = t.group_by([column]).aggregate([("__partial__", "sum")])
        return mt.rename_columns([column, "rows"])

    agg = bucket_exchange(parts, [column], per_bucket, n_buckets=16)
    return {r[column]: r["rows"] for r in agg.take_all()}


def plan_key_partitions(
    key_rows: dict, max_rows_per_file: int | None
) -> dict[object, int]:
    """key -> shard fan-out; every (key, shard) stays under the budget."""
    plan: dict[object, int] = {}
    for key, rows in key_rows.items():
        if max_rows_per_file and rows > max_rows_per_file:
            plan[key] = int(np.ceil(rows / max_rows_per_file))
        else:
            plan[key] = 1
    return plan


def _sanitize(value: object) -> str:
    s = "null" if value is None else str(value)
    return "".join(c if (c.isalnum() or c in "-_.") else "_" for c in s)[:128]


def partition_by_key(
    ds: "ray.data.Dataset",
    column: str,
    out_dir: str,
    *,
    max_rows_per_file: int | None = None,
    max_keys: int = 100_000,
    compression: str = "snappy",
) -> list[dict]:
    """Write ``out_dir/{column}={value}/part-NNNN.parquet`` per key (salted
    shards for over-budget keys). Returns one manifest row per file.

    One-directory-per-value is a low-cardinality layout; ``max_keys`` guards
    against planning a per-key output for near-unique columns (url, id) —
    use :func:`partition_by_hash` for those."""
    key_rows = _key_counts(ds, column)
    if len(key_rows) > max_keys:
        raise PartitionError(
            f"{column} has {len(key_rows)} distinct values (> {max_keys}); "
            "one-file-per-value is the wrong layout — use partition_by_hash"
        )
    fanout = plan_key_partitions(key_rows, max_rows_per_file)

    # deterministic shard index space: sorted keys, contiguous shard ranges
    keys_sorted = sorted(fanout, key=lambda k: (k is None, str(k)))
    shard_base: dict[object, int] = {}
    next_shard = 0
    for k in keys_sorted:
        shard_base[k] = next_shard
        next_shard += fanout[k]

    # collision check before any work (outputs.rs:296-306 semantics)
    out_paths = set()
    for k in keys_sorted:
        for s in range(fanout[k]):
            p = os.path.join(out_dir, f"{column}={_sanitize(k)}", f"part-{s:04d}.parquet")
            if p in out_paths:
                raise PartitionError(f"duplicate output path {p}")
            out_paths.add(p)

    import ray

    plan_ref = ray.put((shard_base, fanout))

    class Tag:
        """Adds __shard__: base[key] + round-robin salt for hot keys.

        Vectorized: dictionary-encode the batch's key column (hash kernel in
        Arrow C++), look the *unique* values up in the broadcast plan, then
        gather; hot-key salt = per-key occurrence index (argsort/cumsum) mod
        fan-out. Per-row Python only over batch-unique values."""

        def __init__(self):
            self.base, self.fanout = ray.get(plan_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t.column(column).combine_chunks()
            denc = col.dictionary_encode()
            uniq = denc.dictionary.to_pylist()
            base_u = np.array([self.base[k] for k in uniq] + [0], dtype=np.int64)
            fan_u = np.array([self.fanout[k] for k in uniq] + [1], dtype=np.int64)
            null_slot = len(uniq)
            idx = np.asarray(
                pc.fill_null(denc.indices.cast(pa.int64()), null_slot)
            )
            if None in self.base:
                base_u[null_slot] = self.base[None]
                fan_u[null_slot] = self.fanout[None]
            shards = base_u[idx]
            fans = fan_u[idx]
            hot = fans > 1
            if hot.any():
                h_idx = idx[hot]
                order = np.argsort(h_idx, kind="stable")
                s_idx = h_idx[order]
                starts = np.concatenate(
                    ([0], np.flatnonzero(s_idx[1:] != s_idx[:-1]) + 1)
                )
                group_len = np.diff(np.append(starts, len(s_idx)))
                occ_sorted = np.arange(len(s_idx)) - np.repeat(starts, group_len)
                occ = np.empty(len(s_idx), dtype=np.int64)
                occ[order] = occ_sorted
                shards[hot] += occ % fans[hot]
            return t.append_column("__shard__", pa.array(shards))

    shard_to_path = {}
    for k in keys_sorted:
        for s in range(fanout[k]):
            shard_to_path[shard_base[k] + s] = os.path.join(
                out_dir, f"{column}={_sanitize(k)}", f"part-{s:04d}.parquet"
            )
    paths_ref = ray.put(shard_to_path)

    def write_group(t: pa.Table) -> pa.Table:
        shard = t.column("__shard__")[0].as_py()
        path = ray.get(paths_ref)[shard]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        body = t.drop_columns(["__shard__"])
        # the per-batch round-robin salt balances shards only to within
        # one row per input block, so a shard can exceed the budget by up
        # to the block count; enforce the budget exactly by splitting the
        # overflow into `<path minus .parquet>.N.parquet` siblings
        if max_rows_per_file and body.num_rows > max_rows_per_file:
            pieces = [
                body.slice(i, max_rows_per_file)
                for i in range(0, body.num_rows, max_rows_per_file)
            ]
        else:
            pieces = [body]
        out_rows = []
        stem = path[: -len(".parquet")]
        for i, piece in enumerate(pieces):
            p = path if i == 0 else f"{stem}.{i}.parquet"
            pq.write_table(piece, p + "_tmp", compression=compression)
            os.replace(p + "_tmp", p)
            out_rows.append(
                {"path": p, "rows": piece.num_rows, "bytes": os.path.getsize(p)}
            )
        return pa.Table.from_pylist(out_rows)

    tagged = ds.map_batches(Tag, batch_format="pyarrow", concurrency=_default_pool())
    manifest = tagged.groupby("__shard__").map_groups(
        write_group, batch_format="pyarrow"
    )
    rows = manifest.take_all()
    if max_rows_per_file:
        for r in rows:
            if r["rows"] > max_rows_per_file:
                raise PartitionError(
                    f"partition {r['path']} exceeds budget: {r['rows']}"
                )
    return rows


def partition_by_hash(
    ds: "ray.data.Dataset",
    column: str,
    out_dir: str,
    n_buckets: int,
    *,
    compression: str = "snappy",
) -> list[dict]:
    """High-cardinality co-location: ``bucket = content_hash(key) % n``.

    The scale path for near-unique keys (url): no per-key plan, no driver
    state — one vectorized hash per batch, one ``groupby(bucket)`` shuffle,
    one file per bucket. The same bucketing reused across datasets
    co-locates equal keys for downstream merge/join-style work."""
    from tbl_ray.functions.sketches import _value_hashes

    def tag(t: pa.Table) -> pa.Table:
        col = t.column(column).combine_chunks()
        if col.null_count:
            # nulls hash to bucket 0 deterministically
            import pyarrow.compute as _pc

            mask = np.asarray(_pc.is_null(col), dtype=bool)
            h = np.zeros(len(col), dtype=np.uint64)
            h[~mask] = _value_hashes(col.drop_null())
        else:
            h = _value_hashes(col)
        return t.append_column(
            "__shard__", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    def write_group(t: pa.Table) -> pa.Table:
        b = t.column("__shard__")[0].as_py()
        path = os.path.join(out_dir, f"bucket-{b:05d}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        body = t.drop_columns(["__shard__"])
        pq.write_table(body, path + "_tmp", compression=compression)
        os.replace(path + "_tmp", path)
        return pa.table(
            {"path": [path], "rows": [body.num_rows],
             "bytes": [os.path.getsize(path)]}
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("__shard__").map_groups(
        write_group, batch_format="pyarrow"
    ).take_all()


def partition_by_value(
    ds: "ray.data.Dataset",
    column: str,
    out_dir: str,
    values_per_partition: int,
    *,
    compression: str = "snappy",
) -> list[dict]:
    """``--partition-by-value SIZE`` semantics (args.rs:397-401): sort the
    distinct key values, group them into ranges of ``values_per_partition``
    values, one output file per range (``range-{i:04d}.parquet``)."""
    key_rows = _key_counts(ds, column)
    if len(key_rows) > 1_000_000:
        raise PartitionError(
            f"{column} has {len(key_rows)} distinct values; range planning "
            "is driver-side — use partition_by_hash for near-unique keys"
        )
    keys_sorted = sorted(key_rows, key=lambda k: (k is None, k))
    range_of_key = {
        k: i // values_per_partition for i, k in enumerate(keys_sorted)
    }
    n_ranges = (len(keys_sorted) + values_per_partition - 1) // values_per_partition

    import ray

    plan_ref = ray.put(range_of_key)

    class Tag:
        def __init__(self):
            self.ranges = ray.get(plan_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t.column(column).combine_chunks()
            denc = col.dictionary_encode()
            uniq = denc.dictionary.to_pylist()
            range_u = np.array(
                [self.ranges[k] for k in uniq] + [self.ranges.get(None, 0)],
                dtype=np.int64,
            )
            idx = np.asarray(
                pc.fill_null(denc.indices.cast(pa.int64()), len(uniq))
            )
            return t.append_column("__shard__", pa.array(range_u[idx]))

    def write_group(t: pa.Table) -> pa.Table:
        rid = t.column("__shard__")[0].as_py()
        path = os.path.join(out_dir, f"range-{rid:04d}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        body = t.drop_columns(["__shard__"]).sort_by(column)
        pq.write_table(body, path + "_tmp", compression=compression)
        os.replace(path + "_tmp", path)
        return pa.table(
            {"path": [path], "rows": [body.num_rows],
             "bytes": [os.path.getsize(path)]}
        )

    tagged = ds.map_batches(Tag, batch_format="pyarrow", concurrency=_default_pool())
    rows = tagged.groupby("__shard__").map_groups(
        write_group, batch_format="pyarrow"
    ).take_all()
    assert len(rows) <= n_ranges
    return rows


def partition_by_rows(
    ds: "ray.data.Dataset", out_dir: str, rows_per_file: int, **write_kwargs
) -> None:
    """Re-chunk to ~rows_per_file rows per output file and write."""
    n = ds.count()
    blocks = max(1, int(np.ceil(n / rows_per_file)))
    ds.repartition(blocks).write_parquet(out_dir, **write_kwargs)


def partition_by_bytes(
    ds: "ray.data.Dataset", out_dir: str, bytes_per_file: int, **write_kwargs
) -> None:
    """Byte-budget variant: bytes/row estimated from a sample batch."""
    sample = ds.limit(1000).take_batch(1000, batch_format="pyarrow")
    bpr = max(1, sample.nbytes // max(sample.num_rows, 1))
    partition_by_rows(ds, out_dir, max(1, bytes_per_file // bpr), **write_kwargs)
