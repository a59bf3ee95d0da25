"""Auto-sized bucket exchange (VERDICT r02 item 3): the keyed-exchange
width derives from estimated input bytes instead of a fixed 64, so one
bucket never outgrows a worker heap at corpus scale — and results are
identical at any width."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from tbl_ray.stages.exchange import (
    DEFAULT_BUCKETS,
    MAX_BUCKETS,
    auto_buckets,
    bucket_exchange,
)


def _docs(sf_dir):
    from tbl_ray.sources import read_table

    return read_table(os.path.join(sf_dir, "documents.parquet"))


def test_small_input_keeps_floor(sf_dir):
    assert auto_buckets(_docs(sf_dir)) == DEFAULT_BUCKETS


def test_large_input_scales_buckets(sf_dir, monkeypatch):
    # shrink the per-bucket budget so the small test file plays the role
    # of a multi-TB input: expected = ceil(file_bytes / budget) > 64
    path = os.path.join(sf_dir, "documents.parquet")
    size = os.path.getsize(path)
    budget = max(size // 500, 1)
    monkeypatch.setenv("TBL_RAY_BUCKET_BYTES", str(budget))
    n = auto_buckets(_docs(sf_dir))
    assert n == min(MAX_BUCKETS, -(-size // budget))
    assert n > DEFAULT_BUCKETS


def test_unknown_size_falls_back_to_floor():
    import pyarrow as pa
    import ray.data

    # a lazy map over a non-file source exposes no input files and no
    # materialized size -> "assume huge" is unknowable, keep the floor
    lazy = ray.data.from_arrow(pa.table({"x": [1, 2, 3]})).flat_map(
        lambda r: [r]
    )
    assert auto_buckets(lazy) == DEFAULT_BUCKETS


@pytest.mark.parametrize("width_env", [None, "tiny"])
def test_keyed_aggregate_identical_across_widths(sf_dir, monkeypatch, width_env):
    """The same keyed aggregate at the 64 floor and at a forced >64 width
    must produce identical rows (bucket count is a pure partitioning
    choice, never a semantics choice)."""
    from tbl_ray.stages.aggregate import group_aggregate

    if width_env == "tiny":
        size = os.path.getsize(os.path.join(sf_dir, "documents.parquet"))
        monkeypatch.setenv("TBL_RAY_BUCKET_BYTES", str(max(size // 200, 1)))
        assert auto_buckets(_docs(sf_dir)) > DEFAULT_BUCKETS
    out = (
        group_aggregate(_docs(sf_dir), "lang", {"n_chars": ["sum", "count"]})
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    want = (
        pq.read_table(os.path.join(sf_dir, "documents.parquet"))
        .to_pandas()
        .groupby("lang", dropna=False)
        .agg(sum_n_chars=("n_chars", "sum"), count_n_chars=("n_chars", "count"))
        .reset_index()
        .sort_values("lang", ignore_index=True)
    )
    assert list(out["lang"]) == list(want["lang"])
    assert list(out["sum_n_chars"]) == list(want["sum_n_chars"])
    assert list(out["count_n_chars"]) == list(want["count_n_chars"])


def test_shuffle_join_identical_across_widths(sf_dir, monkeypatch):
    from tbl_ray.functions.joins import shuffle_join

    def run():
        from tbl_ray.sources import read_table

        left = read_table(os.path.join(sf_dir, "orders.parquet"))
        right = read_table(os.path.join(sf_dir, "customer.parquet")).map_batches(
            lambda t: t.rename_columns(
                ["o_custkey" if c == "c_custkey" else c for c in t.schema.names]
            ),
            batch_format="pyarrow",
        )
        out = shuffle_join(left, right, "o_custkey").to_pandas()
        return out.sort_values(list(out.columns), ignore_index=True)

    base = run()
    monkeypatch.setenv("TBL_RAY_BUCKET_BYTES", "2048")
    wide = run()
    pd.testing.assert_frame_equal(base, wide)


def test_uint64_keys_above_int63_bucket_safely(ray_session):
    # uint64 keys over 2^63 must not route through a checked int64 cast
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tbl_ray.stages.exchange import bucket_exchange

    keys = np.array(
        [2**63 + 7, 5, 2**64 - 1, 2**63 + 7, 5], dtype=np.uint64
    )
    t = pa.table({"k": pa.array(keys), "v": pa.array([1, 2, 3, 4, 5])})

    def per_bucket(bt):
        ks = np.asarray(bt.column("k"), dtype=np.uint64)
        vs = np.asarray(bt.column("v"), dtype=np.int64)
        out_k, out_s = [], []
        for u in np.unique(ks):
            out_k.append(int(u))
            out_s.append(int(vs[ks == u].sum()))
        return pa.table(
            {"k": pa.array(np.array(out_k, np.uint64)),
             "s": pa.array(out_s, type=pa.int64())}
        )

    rows = bucket_exchange(
        ray.data.from_arrow(t), ["k"], per_bucket, n_buckets=8
    ).take_all()
    got = {r["k"]: r["s"] for r in rows}
    assert got == {2**63 + 7: 5, 5: 7, 2**64 - 1: 3}
