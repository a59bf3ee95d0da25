"""Skew-salted shuffle join: a hot key's rows spread over skew_salt
sub-buckets (instead of all landing one task) while the join result is
unchanged — the standard replicate-the-build-side skew join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from tbl_ray.functions.joins import _shuffle_join_plan, shuffle_join


def _tables(n_left=10_000, hot_frac=0.9, seed=7):
    rng = np.random.default_rng(seed)
    hot = rng.random(n_left) < hot_frac
    keys = np.where(hot, "hot.example.com",
                    rng.choice([f"site{i}.net" for i in range(40)], n_left))
    left = pa.table({
        "domain": pa.array(keys.tolist()),
        "doc": pa.array(np.arange(n_left, dtype=np.int64)),
    })
    right = pa.table({
        "domain": pa.array(["hot.example.com"] + [f"site{i}.net" for i in range(40)]),
        "rank": pa.array(np.arange(41, dtype=np.int64)),
    })
    return left, right


def _join_df(left, right, **kw):
    out = shuffle_join(
        ray.data.from_arrow(left).repartition(8),
        ray.data.from_arrow(right).repartition(2),
        "domain",
        **kw,
    ).to_pandas()
    return out.sort_values(list(out.columns), ignore_index=True)


def test_skew_join_matches_unsalted():
    left, right = _tables()
    base = _join_df(left, right)
    salted = _join_df(
        left, right, skew_keys=["hot.example.com"], skew_salt=8
    )
    pd.testing.assert_frame_equal(base, salted)


def test_skew_join_left_outer_unmatched_hot():
    left, right = _tables()
    # drop the hot key from the right side: every hot row must still come
    # back exactly once with null right columns
    right = right.filter(
        pa.compute.not_equal(right.column("domain"), "hot.example.com")
    )
    base = _join_df(left, right, join_type="left outer")
    salted = _join_df(
        left, right, join_type="left outer",
        skew_keys=["hot.example.com"], skew_salt=8,
    )
    assert len(base) == left.num_rows
    pd.testing.assert_frame_equal(base, salted)


def _bucket_sizes(left, right, **kw):
    u, _ = _shuffle_join_plan(
        ray.data.from_arrow(left).repartition(8),
        ray.data.from_arrow(right).repartition(2),
        "domain",
        join_type="inner", rsuffix="_r", **kw,
    )
    t = pa.table(u.to_pandas())
    # probe-side rows are the skew concern (build side replicates by design)
    probe = t.filter(pa.compute.equal(t.column("__side__"), 0))
    counts = (
        probe.group_by("__bucket__").aggregate([("__side__", "count")])
    )
    return np.asarray(counts.column("__side___count"))


def test_skew_salting_spreads_sparse_per_batch_hot_key():
    """A key hot in AGGREGATE but sparse per block (few hot rows per
    batch) must still fan out: the per-batch random offset prevents every
    block's lone hot row drawing salt 0."""
    rng = np.random.default_rng(3)
    n = 4000
    # ~1 hot row per 40-row block after a 100-block repartition
    hot = rng.random(n) < 0.025
    keys = np.where(hot, "hot.example.com", "cold.net")
    left = pa.table({"domain": pa.array(keys.tolist()),
                     "doc": pa.array(np.arange(n, dtype=np.int64))})
    right = pa.table({"domain": pa.array(["hot.example.com", "cold.net"]),
                      "rank": pa.array([0, 1], pa.int64())})
    u, _ = _shuffle_join_plan(
        ray.data.from_arrow(left).repartition(100),
        ray.data.from_arrow(right),
        "domain",
        join_type="inner", rsuffix="_r", n_buckets=64,
        skew_keys=["hot.example.com"], skew_salt=8,
    )
    t = pa.table(u.to_pandas())
    probe = t.filter(pa.compute.equal(t.column("__side__"), 0))
    hot_rows = probe.filter(
        pa.compute.equal(probe.column("domain"), "hot.example.com")
    )
    buckets = np.asarray(hot_rows.column("__bucket__"))
    n_sub = len(np.unique(buckets))
    assert n_sub >= 6, f"hot key used only {n_sub} of 8 sub-buckets"


def test_skew_salting_balances_buckets():
    left, right = _tables()
    unsalted = _bucket_sizes(left, right, n_buckets=8, skew_keys=None,
                             skew_salt=16)
    # without salting the hot key concentrates ~90% of rows in ONE bucket
    assert unsalted.max() >= 0.9 * left.num_rows

    salted = _bucket_sizes(
        left, right, n_buckets=8,
        skew_keys=["hot.example.com"], skew_salt=16,
    )
    mean = salted.sum() / len(salted)
    assert salted.max() <= 2 * mean, (salted.max(), mean, sorted(salted))
    assert salted.sum() == left.num_rows  # fan-out never duplicates probes


def test_skew_salting_spreads_regular_layout_hot_key():
    """Adversarial REGULAR layout: the hot key at position 0 of every
    fixed-size block, cold keys constant. A salt offset derived from the
    first hot value/position is identical across batches here and the
    fan-out silently collapses; the full-content hash keeps spreading
    because the payload column differs per block."""
    n = 4000
    block = 40
    keys = np.array(["cold.net"] * n, dtype=object)
    keys[::block] = "hot.example.com"  # same offset in every block
    left = pa.table({"domain": pa.array(keys.tolist()),
                     "doc": pa.array(np.arange(n, dtype=np.int64))})
    right = pa.table({"domain": pa.array(["hot.example.com", "cold.net"]),
                      "rank": pa.array([0, 1], pa.int64())})
    u, _ = _shuffle_join_plan(
        ray.data.from_arrow(left).repartition(n // block),
        ray.data.from_arrow(right),
        "domain",
        join_type="inner", rsuffix="_r", n_buckets=64,
        skew_keys=["hot.example.com"], skew_salt=8,
    )
    t = pa.table(u.to_pandas())
    probe = t.filter(pa.compute.equal(t.column("__side__"), 0))
    hot_rows = probe.filter(
        pa.compute.equal(probe.column("domain"), "hot.example.com")
    )
    buckets = np.asarray(hot_rows.column("__bucket__"))
    n_sub = len(np.unique(buckets))
    assert n_sub >= 6, f"hot key used only {n_sub} of 8 sub-buckets"


def test_batch_content_hash_is_value_pure():
    """The salt hash must be a pure function of LOGICAL values: a
    zero-copy slice (exposing the parent's full buffers plus offsets)
    and a deep copy of the same rows must hash identically, with and
    without nulls (validity-bitmap trailing bits are unspecified)."""
    from tbl_ray.functions.joins import _batch_content_hash

    big = pa.table({
        "domain": pa.array(["a", "b", None, "d", "e", "f", "g"]),
        "doc": pa.array([1, None, 3, 4, 5, 6, 7], pa.int64()),
        "score": pa.array([0.5, 1.5, None, 3.5, 4.5, 5.5, 6.5]),
    })
    sliced = big.slice(2, 4)  # zero-copy: buffers belong to `big`
    # deep copy via serialization round-trip: fresh, tight buffers
    import pyarrow as _pa
    sink = _pa.BufferOutputStream()
    with _pa.ipc.new_stream(sink, sliced.schema) as w:
        w.write_table(sliced)
    copied = _pa.ipc.open_stream(sink.getvalue()).read_all()
    assert _batch_content_hash(sliced) == _batch_content_hash(copied)
    # different logical content must (overwhelmingly) hash differently
    other = copied.set_column(
        1, "doc", pa.array([30, 40, 50, 61], pa.int64())
    )
    assert _batch_content_hash(sliced) != _batch_content_hash(other)
    # row order matters (position-mixed)
    perm = copied.take(pa.array([3, 2, 1, 0]))
    assert _batch_content_hash(sliced) != _batch_content_hash(perm)


def test_batch_content_hash_handles_32bit_temporal_types():
    """date32/time32 have no direct Arrow cast to int64; the hash must
    reinterpret their fixed-width storage instead of crashing (regression:
    parquet DATE columns killed the skew-salt path)."""
    import datetime as dt

    from tbl_ray.functions.joins import _batch_content_hash

    t = pa.table({
        "d32": pa.array(
            [dt.date(2020, 1, 1), None, dt.date(2021, 5, 5)], pa.date32()
        ),
        "t32": pa.array([1000, 2000, None], pa.time32("ms")),
        "ts": pa.array(
            [dt.datetime(2020, 1, 1), None, dt.datetime(2022, 2, 2)],
            pa.timestamp("us"),
        ),
        "dur": pa.array([5, None, 9], pa.duration("s")),
        "k": pa.array([1, 2, 3], pa.int64()),
    })
    h = _batch_content_hash(t)
    # value-pure across a zero-copy slice of a larger parent
    big = pa.concat_tables([t, t]).combine_chunks()
    assert _batch_content_hash(big.slice(0, 3)) == h
    # sensitive to the temporal values themselves
    other = t.set_column(
        0,
        "d32",
        pa.array(
            [dt.date(1999, 1, 1), None, dt.date(2021, 5, 5)], pa.date32()
        ),
    )
    assert _batch_content_hash(other) != h
