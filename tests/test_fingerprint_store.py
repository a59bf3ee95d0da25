"""Persistent fingerprint store: incremental exact dedup across runs
(state/fingerprints.py)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from tbl_ray.state.fingerprints import (
    FingerprintStore,
    _member_mask,
    dedup_against_store,
    store_hits,
)


def test_store_append_load_unique_sorted(tmp_path):
    st = FingerprintStore(str(tmp_path / "st"))
    f1 = np.array([9, 3, 3, 7], np.uint64)
    f2 = np.array([1, 2, 2, 0], np.uint64)
    st.append(f1, f2)
    a, b = st.load()
    assert a.tolist() == [3, 7, 9] and b.tolist() == [2, 0, 1]
    # second identical append is a no-op (content-addressed)
    p1 = st.append(f1, f2)
    assert len(st._run_paths()) == 1 and os.path.exists(p1)
    # overlapping run: load() uniques across runs
    st.append(np.array([3, 5], np.uint64), np.array([2, 5], np.uint64))
    a, b = st.load()
    assert a.tolist() == [3, 5, 7, 9]
    assert st.count() == 4


def test_store_compact(tmp_path):
    st = FingerprintStore(str(tmp_path / "st"))
    st.append(np.array([1], np.uint64), np.array([1], np.uint64))
    st.append(np.array([2], np.uint64), np.array([2], np.uint64))
    assert len(st._run_paths()) == 2
    st.compact()
    assert len(st._run_paths()) == 1
    a, _ = st.load()
    assert a.tolist() == [1, 2]


def test_member_mask_with_f1_collisions():
    # store has an f1-run of length 3 (same f1, distinct f2)
    sf1 = np.array([4, 4, 4, 9], np.uint64)
    sf2 = np.array([1, 5, 8, 0], np.uint64)
    q1 = np.array([4, 4, 4, 9, 3], np.uint64)
    q2 = np.array([5, 8, 9, 0, 1], np.uint64)
    got = _member_mask(q1, q2, sf1, sf2)
    assert got.tolist() == [True, True, False, True, False]
    # empty store / empty query
    e = np.empty(0, np.uint64)
    assert _member_mask(q1, q2, e, e).tolist() == [False] * 5
    assert _member_mask(e, e, sf1, sf2).tolist() == []


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
    )


def test_incremental_dedup_two_increments(ray_session, tmp_path):
    sdir = str(tmp_path / "fp")
    inc1 = _docs([(1, "aa"), (2, "bb"), (3, "aa"), (4, "cc")])
    out1 = dedup_against_store(inc1, "text", "doc_id", sdir)
    got1 = sorted(r["doc_id"] for r in out1.take_all())
    assert got1 == [1, 2, 4]  # min-id winner per text
    # increment 2 overlaps increment 1 AND itself
    inc2 = _docs([(10, "bb"), (11, "dd"), (12, "dd"), (13, "ee")])
    out2 = dedup_against_store(inc2, "text", "doc_id", sdir)
    got2 = sorted(r["doc_id"] for r in out2.take_all())
    assert got2 == [11, 13]  # bb already stored; dd self-dups; ee new
    # increment 3 against the accumulated store
    inc3 = _docs([(20, "ee"), (21, "aa"), (22, "ff")])
    out3 = dedup_against_store(inc3, "text", "doc_id", sdir)
    assert sorted(r["doc_id"] for r in out3.take_all()) == [22]
    assert FingerprintStore(sdir).count() == 6  # aa bb cc dd ee ff


def test_update_false_does_not_grow_store(ray_session, tmp_path):
    sdir = str(tmp_path / "fp")
    inc = _docs([(1, "aa"), (2, "bb")])
    dedup_against_store(inc, "text", "doc_id", sdir, update=False)
    assert FingerprintStore(sdir).count() == 0
    # so a rerun keeps everything again
    out = dedup_against_store(inc, "text", "doc_id", sdir, update=False)
    assert sorted(r["doc_id"] for r in out.take_all()) == [1, 2]


def test_both_plans_equivalent(ray_session, tmp_path, monkeypatch):
    rows1 = [(i, f"t{i % 7}") for i in range(40)]
    rows2 = [(100 + i, f"t{i % 11}") for i in range(40)]

    results = {}
    for plan, budget in (("local", str(1 << 30)), ("dist", "0")):
        monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", budget)
        sdir = str(tmp_path / f"fp_{plan}")
        dedup_against_store(_docs(rows1), "text", "doc_id", sdir).count()
        out = dedup_against_store(_docs(rows2), "text", "doc_id", sdir)
        results[plan] = (
            sorted(r["doc_id"] for r in out.take_all()),
            FingerprintStore(sdir).count(),
        )
    assert results["local"] == results["dist"]
    ids, stored = results["local"]
    # texts t0..t6 stored by inc1; inc2 contributes t7..t10 (first ids)
    assert ids == [107, 108, 109, 110]
    assert stored == 11


def test_store_hits_distributed(ray_session, tmp_path):
    sdir = str(tmp_path / "fp")
    dedup_against_store(
        _docs([(1, "aa"), (2, "bb")]), "text", "doc_id", sdir
    ).count()
    hits = store_hits(
        _docs([(5, "aa"), (6, "zz"), (7, "bb")]), "text", "doc_id", sdir
    )
    assert hits.tolist() == [5, 7]
