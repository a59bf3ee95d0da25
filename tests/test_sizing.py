"""Cost-based plan selection (tbl_ray.sizing): the local sketch-resolve
fast path must produce results identical to the distributed exchange."""

import pyarrow as pa
import pytest
import ray.data

from tbl_ray.functions.dedup import (
    exact_dedup,
    minhash_dup_pairs,
    simhash_dup_pairs,
)
from tbl_ray.sizing import estimate_input_bytes, fits_local


def test_estimate_read_parquet(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    est = estimate_input_bytes(ds)
    assert est is not None and est > 0
    assert fits_local(ds)


def test_estimate_sees_through_rowwise_transforms(sf_dir):
    import os

    plain = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    ds = plain.map_batches(lambda t: t, batch_format="pyarrow")
    # input_files() goes blank through a map; the plan walk recovers the
    # source's own (in-memory, i.e. larger) estimate
    est = estimate_input_bytes(ds)
    assert est is not None
    assert est >= os.path.getsize(f"{sf_dir}/documents.parquet")
    assert fits_local(ds)


def test_estimate_unknown_for_non_file_transform():
    ds = ray.data.from_items([{"a": 1}, {"a": 2}]).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    # no file-backed Read at the bottom of the plan -> assume huge
    assert estimate_input_bytes(ds) is None
    assert not fits_local(ds)


def test_estimate_blocked_by_multi_input_op(sf_dir):
    a = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    b = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    u = a.union(b).map_batches(lambda t: t, batch_format="pyarrow")
    assert estimate_input_bytes(u) is None


def test_estimate_materialized():
    ds = ray.data.from_arrow(pa.table({"x": list(range(10))})).materialize()
    est = estimate_input_bytes(ds)
    assert est is not None and est > 0
    assert fits_local(ds)


def test_env_zero_disables_local(sf_dir, monkeypatch):
    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", "0")
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    assert not fits_local(ds)


@pytest.fixture()
def dup_docs():
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about columnar encoding",
        "the quick brown fox jumps over the lazy dog again and again!",
        "another unrelated text talking about ray data pipelines",
    ]
    return pa.table({"doc_id": list(range(5)), "text": texts})


def _both_paths(monkeypatch, fn):
    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", str(1 << 30))
    local = fn()
    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", "0")
    dist = fn()
    return local, dist


def test_exact_dedup_paths_identical(dup_docs, monkeypatch, tmp_path):
    import pyarrow.parquet as pq

    p = str(tmp_path / "docs.parquet")
    pq.write_table(dup_docs, p)

    def run():
        ds = ray.data.read_parquet(p)
        out = exact_dedup(ds, "text", "doc_id").take_all()
        return sorted(r["doc_id"] for r in out)

    local, dist = _both_paths(monkeypatch, run)
    assert local == dist == [0, 2, 3, 4]


def test_minhash_pairs_paths_identical(dup_docs, monkeypatch, tmp_path):
    import pyarrow.parquet as pq

    p = str(tmp_path / "docs.parquet")
    pq.write_table(dup_docs, p)

    def run():
        ds = ray.data.read_parquet(p)
        return minhash_dup_pairs(ds, "text", "doc_id", threshold=0.5)

    local, dist = _both_paths(monkeypatch, run)
    assert local == dist
    assert {(p["id_a"], p["id_b"]) for p in local} >= {(0, 1)}


def test_value_counts_paths_identical(sf_dir, monkeypatch):
    from tbl_ray.stages.aggregate import value_counts

    def run():
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
        rows = value_counts(ds, "lang").take_all()
        return sorted((r["lang"], r["count"]) for r in rows)

    local, dist = _both_paths(monkeypatch, run)
    assert local == dist and len(local) > 0


def test_group_aggregate_paths_identical(sf_dir, monkeypatch):
    from tbl_ray.stages.aggregate import group_aggregate

    def run():
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
        rows = group_aggregate(
            ds, "lang", {"n_chars": ["count", "sum", "min", "max", "mean"]}
        ).take_all()
        return sorted(
            (r["lang"], r["count_n_chars"], r["sum_n_chars"],
             r["min_n_chars"], r["max_n_chars"], r["mean_n_chars"])
            for r in rows
        )

    local, dist = _both_paths(monkeypatch, run)
    assert local == dist and len(local) > 0


def test_top_vocab_paths_identical(sf_dir, monkeypatch):
    from tbl_ray.functions.text import top_vocab

    def run():
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
        return [
            (r["word"], r["n"]) for r in top_vocab(ds, "text", k=10).take_all()
        ]

    local, dist = _both_paths(monkeypatch, run)
    assert local == dist and len(local) == 10


def test_frequent_units_paths_identical(sf_dir, monkeypatch):
    from tbl_ray.functions.scrub import frequent_units

    def run():
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
        rows = frequent_units(ds, "text", " ", 50).take_all()
        return sorted((r["unit"], r["n"]) for r in rows)

    local, dist = _both_paths(monkeypatch, run)
    assert local == dist and len(local) > 0


def test_simhash_pairs_paths_identical(dup_docs, monkeypatch, tmp_path):
    import pyarrow.parquet as pq

    p = str(tmp_path / "docs.parquet")
    pq.write_table(dup_docs, p)

    def run():
        ds = ray.data.read_parquet(p)
        return simhash_dup_pairs(ds, "text", "doc_id", max_hamming=3)

    local, dist = _both_paths(monkeypatch, run)
    assert local == dist
    assert {(p["id_a"], p["id_b"]) for p in local} >= {(0, 1)}


def test_shuffle_deterministic_and_head(sf_dir):
    import numpy as np

    from tbl_ray.functions.sampling import (
        _sample_key,
        shuffle_deterministic,
        shuffle_head,
    )

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    ids = np.array(
        [r["doc_id"] for r in ds.select_columns(["doc_id"]).take_all()],
        dtype=np.int64,
    )
    keys = _sample_key(ids, 7)
    expected = ids[np.lexsort((ids, keys))]

    got = [
        r["doc_id"]
        for r in shuffle_deterministic(ds, seed=7).select_columns(["doc_id"]).take_all()
    ]
    assert got == expected.tolist()

    head = shuffle_head(ds, 10, seed=7).take_all()
    assert [r["pos"] for r in head] == list(range(10))
    assert [r["doc_id"] for r in head] == expected[:10].tolist()
    assert "__sk__" not in head[0]


def test_histogram_paths_identical_and_semantics(sf_dir, monkeypatch):
    from tbl_ray.functions.sketches import histogram

    def run():
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
        return [(r["bucket"], r["n"]) for r in
                histogram(ds, "n_chars", 100.0, 600.0, 10).take_all()]

    local, dist = _both_paths(monkeypatch, run)
    assert local == dist and len(local) > 1
    assert local == sorted(local)  # bucket ascending
    # clamping + nulls
    d = ray.data.from_arrow(
        pa.table({"v": pa.array([-5.0, 0.0, 4.9, 5.0, 99.0, None], pa.float64())})
    )
    got = {r["bucket"]: r["n"] for r in histogram(d, "v", 0.0, 10.0, 2).take_all()}
    assert got == {0: 3, 1: 2}  # -5 clamps low, 99 clamps high, null dropped


def test_count_distinct_by_paths_identical(sf_dir, monkeypatch):
    from tbl_ray.functions.sketches import count_distinct_by

    def run():
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
        return sorted(
            (r["lang"], r["n_distinct"])
            for r in count_distinct_by(ds, "lang", "source").take_all()
        )

    local, dist = _both_paths(monkeypatch, run)
    assert local == dist and len(local) > 0
    # nulls don't count; all-null keys still appear with 0
    t = pa.table({
        "k": ["a", "a", "a", "b", "b"],
        "v": pa.array(["x", "x", None, None, None], pa.string()),
    })
    d = ray.data.from_arrow(t)
    got = {r["k"]: r["n_distinct"] for r in count_distinct_by(d, "k", "v").take_all()}
    assert got == {"a": 1, "b": 0}
