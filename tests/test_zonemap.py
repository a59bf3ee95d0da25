"""Zone-map stats + manifest-driven partition pruning (pipelines/zonemap.py)."""

import math
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tbl_ray.filters import parse_filter
from tbl_ray.pipelines.encode_job import decode_job_output, run_encode_job
from tbl_ray.pipelines.zonemap import (
    decode_filtered,
    finalize_stats,
    fold_stats,
    partition_may_match,
    prune_report,
)


def _stats_for(t: pa.Table) -> dict:
    return finalize_stats(fold_stats({}, t))


def test_fold_stats_kinds_and_bounds():
    t = pa.table(
        {
            "i": pa.array([3, -7, None, 12], pa.int64()),
            "f": pa.array([1.5, -2.0, 0.25, None], pa.float64()),
            "fn": pa.array([1.0, float("nan"), 2.0, 3.0], pa.float64()),
            "s": pa.array(["b", "aa", None, "zz"]),
            "ts": pa.array([10_000, 20_000, 15_000, None], pa.timestamp("us")),
            "b": pa.array([True, False, True, None]),
            "bin": pa.array([b"\x01", b"\xff", None, b"\x10"], pa.binary()),
            "allnull": pa.array([None] * 4, pa.int64()),
            "lst": pa.array([[1], [2], [3], [4]]),  # unmapped type
        }
    )
    s = _stats_for(t)
    assert s["i"] == {
        "kind": "int", "t": "int64", "min": -7, "max": 12, "nulls": 1,
        "poisoned": False,
    }
    assert s["f"]["min"] == -2.0 and s["f"]["max"] == 1.5
    assert s["fn"]["poisoned"] and s["fn"]["min"] is None
    assert s["s"]["min"] == "aa" and s["s"]["max"] == "zz" and s["s"]["nulls"] == 1
    assert s["ts"]["kind"] == "epoch" and s["ts"]["min"] == 10_000
    assert s["b"] == {
        "kind": "int", "t": "bool", "min": 0, "max": 1, "nulls": 1,
        "poisoned": False,
    }
    assert s["bin"]["min"] == "01" and s["bin"]["max"] == "ff"
    assert s["allnull"]["min"] is None and s["allnull"]["nulls"] == 4
    assert "lst" not in s


def test_fold_stats_multi_batch_and_string_cap():
    acc = {}
    fold_stats(acc, pa.table({"x": [5, 9], "s": ["m", "n"]}))
    fold_stats(acc, pa.table({"x": [1, 20], "s": ["a", "y" * 300]}))
    s = finalize_stats(acc)
    assert s["x"]["min"] == 1 and s["x"]["max"] == 20
    assert s["s"]["poisoned"]  # an over-cap value voids the column's map


def _entry(stats, num_rows=100):
    return {"num_rows": num_rows, "stats": stats}


INT_STATS = {"x": {"kind": "int", "t": "int64", "min": 10, "max": 20,
                   "nulls": 5, "poisoned": False}}


@pytest.mark.parametrize(
    "flt,expect",
    [
        ("x=15", True), ("x=9", False), ("x=10", True), ("x=21", False),
        ("x!=15", True), ("x>19", True), ("x>20", False), ("x>=20", True),
        ("x>=21", False), ("x<11", True), ("x<10", False), ("x<=10", True),
        ("x<=9", False), ("x.is_null", True), ("x.is_not_null", True),
    ],
)
def test_partition_may_match_ops(flt, expect):
    assert partition_may_match(_entry(INT_STATS), [parse_filter(flt)]) is expect


def test_partition_may_match_edge_cases():
    f_eq = [parse_filter("x=15")]
    # old manifest (no stats) and poisoned stats: always keep
    assert partition_may_match({"num_rows": 10}, f_eq)
    poisoned = {"x": {"kind": "int", "t": "int64", "min": None, "max": None,
                      "nulls": 0, "poisoned": True}}
    assert partition_may_match(_entry(poisoned), f_eq)
    # zero-row partition: never matches anything
    assert not partition_may_match(_entry(INT_STATS, num_rows=0), f_eq)
    # all-null column: no comparison matches; is_null does; is_not_null not
    allnull = {"x": {"kind": "int", "t": "int64", "min": None, "max": None,
                     "nulls": 7, "poisoned": False}}
    e = _entry(allnull, num_rows=7)
    assert not partition_may_match(e, f_eq)
    assert not partition_may_match(e, [parse_filter("x!=3")])
    assert partition_may_match(e, [parse_filter("x.is_null")])
    assert not partition_may_match(e, [parse_filter("x.is_not_null")])
    # no-nulls column: is_null can't match
    nonull = {"x": {**INT_STATS["x"], "nulls": 0}}
    assert not partition_may_match(_entry(nonull), [parse_filter("x.is_null")])
    # != skips only the constant partition
    const = {"x": {**INT_STATS["x"], "min": 4, "max": 4}}
    assert not partition_may_match(_entry(const), [parse_filter("x!=4")])
    assert partition_may_match(_entry(const), [parse_filter("x!=5")])
    # AND of filters: one provably-empty filter prunes
    assert not partition_may_match(
        _entry(INT_STATS), [parse_filter("x>=10"), parse_filter("x>25")]
    )


def test_partition_may_match_typed_literals():
    ts = {"d": {"kind": "epoch", "t": "timestamp[us]",
                "min": 1_600_000_000_000_000, "max": 1_700_000_000_000_000,
                "nulls": 0, "poisoned": False}}
    assert partition_may_match(_entry(ts), [parse_filter("d>=2020-09-14")])
    assert not partition_may_match(_entry(ts), [parse_filter("d>2024-01-01")])
    bn = {"p": {"kind": "bin", "t": "binary", "min": "0a10", "max": "0aff",
                "nulls": 0, "poisoned": False}}
    assert partition_may_match(_entry(bn), [parse_filter("p=0x0a80")])
    assert not partition_may_match(_entry(bn), [parse_filter("p=0x0b00")])
    st = {"s": {"kind": "str", "t": "string", "min": "dog", "max": "fox",
                "nulls": 0, "poisoned": False}}
    assert partition_may_match(_entry(st), [parse_filter("s=emu")])
    assert not partition_may_match(_entry(st), [parse_filter("s<dog")])


@pytest.fixture(scope="module")
def clustered_job(ray_session, tmp_path_factory):
    """lineitem sorted by l_orderkey, sharded into 6 files, encoded."""
    base = tmp_path_factory.mktemp("zonemap")
    src = pq.read_table("/root/testdata/sf0.001/lineitem.parquet")
    src = src.sort_by("l_orderkey")
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir)
    n, k = src.num_rows, 6
    step = (n + k - 1) // k
    paths = []
    for i in range(k):
        p = os.path.join(shard_dir, f"part-{i:02d}.parquet")
        pq.write_table(src.slice(i * step, step), p)
        paths.append(p)
    out_dir = os.path.join(base, "encoded")
    run_encode_job(paths, out_dir)
    return src, out_dir


def test_prune_skips_partitions_and_result_is_exact(clustered_job):
    src, out_dir = clustered_job
    cut = int(0.9 * pc.max(src.column("l_orderkey")).as_py())
    filt = [f"l_orderkey>={cut}"]
    rep = prune_report(out_dir, filt)
    assert len(rep["skipped"]) >= 4, rep  # clustered: ~5 of 6 shards skip
    assert len(rep["kept"]) >= 1

    got = (
        decode_filtered(out_dir, filt)
        .to_pandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    exp = (
        src.filter(pc.greater_equal(src.column("l_orderkey"), cut))
        .to_pandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    assert got.equals(exp)


def test_prune_identical_to_unpruned(clustered_job):
    src, out_dir = clustered_job
    mid = int(pc.max(src.column("l_orderkey")).as_py() // 2)
    filt = [f"l_orderkey<={mid}", "l_quantity>25"]
    a = (
        decode_filtered(out_dir, filt)
        .to_pandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    flt = [parse_filter(f) for f in filt]
    from tbl_ray.filters import combined_mask

    def exact(t):
        return t.filter(combined_mask(flt, t))

    b = (
        decode_job_output(out_dir)
        .map_batches(exact, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    assert a.equals(b) and len(a) > 0


def test_all_pruned_keeps_schema(clustered_job):
    src, out_dir = clustered_job
    ds = decode_filtered(out_dir, ["l_orderkey<-1"])
    assert ds.count() == 0
    assert set(ds.schema().names) == set(src.column_names)


def test_columns_projection(clustered_job):
    src, out_dir = clustered_job
    ds = decode_filtered(
        out_dir, ["l_orderkey=1"], columns=["l_orderkey", "l_quantity"]
    )
    t = ds.to_pandas()
    assert list(t.columns) == ["l_orderkey", "l_quantity"]
    assert (t["l_orderkey"] == 1).all()


# ---- property: pruning is conservative on arbitrary data/filters ----

from hypothesis import given, settings
from hypothesis import strategies as st

_vals = st.one_of(
    st.none(),
    st.integers(min_value=-50, max_value=50),
)
_strs = st.one_of(st.none(), st.text(alphabet="abcxyz", max_size=4))


@settings(max_examples=120, deadline=None)
@given(
    ints=st.lists(_vals, min_size=0, max_size=30),
    strs=st.data(),
    op=st.sampled_from(["=", "!=", ">", ">=", "<", "<=", "is_null", "is_not_null"]),
    lit=st.integers(min_value=-55, max_value=55),
    on_str=st.booleans(),
    slit=st.text(alphabet="abcxyz", max_size=4),
)
def test_prune_never_drops_a_matching_row(ints, strs, op, lit, on_str, slit):
    n = len(ints)
    svals = strs.draw(st.lists(_strs, min_size=n, max_size=n))
    t = pa.table(
        {
            "x": pa.array(ints, pa.int64()),
            "s": pa.array(svals, pa.string()),
        }
    )
    col = "s" if on_str else "x"
    if op in ("is_null", "is_not_null"):
        fstr = f"{col}.{op}"
    elif on_str:
        fstr = f"{col}{op}{slit}"
    else:
        fstr = f"{col}{op}{lit}"
    f = parse_filter(fstr)
    entry = {"num_rows": n, "stats": _stats_for(t)}
    may = partition_may_match(entry, [f])
    if not may:
        # the claim partition_may_match makes: NO row matches
        if n:
            mask = f.mask(t)
            assert pc.sum(mask).as_py() in (0, None), (
                fstr, entry["stats"], t.to_pydict()
            )


def test_resume_with_stats_less_manifest_entries(ray_session, tmp_path):
    """A job resumed over partitions encoded before zone maps existed
    (manifest entries without 'stats') must still decode and prune
    correctly: stats-less partitions are always kept."""
    import json

    src = pq.read_table("/root/testdata/sf0.001/lineitem.parquet").sort_by(
        "l_orderkey"
    )
    shards = []
    step = (src.num_rows + 1) // 2
    for i in range(2):
        p = str(tmp_path / f"s{i}.parquet")
        pq.write_table(src.slice(i * step, step), p)
        shards.append(p)
    out = str(tmp_path / "enc")
    run_encode_job(shards, out)

    # simulate an old-engine partition: strip stats from the first entry
    mpath = os.path.join(out, "manifest.jsonl")
    lines = [json.loads(ln) for ln in open(mpath) if ln.strip()]
    assert all("stats" in e for e in lines)
    lines[0].pop("stats")
    with open(mpath, "w") as fh:
        for e in lines:
            fh.write(json.dumps(e) + "\n")

    hi = int(pc.max(src.column("l_orderkey")).as_py())
    rep = prune_report(out, [f"l_orderkey>={hi}"])
    # the stats-less partition is kept unconditionally; the second
    # (stats-bearing, covers the top range) is kept on merit
    assert len(rep["kept"]) == 2 and not rep["skipped"]
    rep_lo = prune_report(out, ["l_orderkey<0"])
    # only the stats-bearing partition can be proven empty
    assert len(rep_lo["kept"]) == 1 and len(rep_lo["skipped"]) == 1
    got = decode_filtered(out, [f"l_orderkey>={hi}"]).count()
    exp = src.filter(
        pc.greater_equal(src.column("l_orderkey"), hi)
    ).num_rows
    assert got == exp

    # resume over the stripped manifest must not re-encode (sha+size
    # still verify) and must leave results intact
    rep2 = run_encode_job(shards, out, resume=True)
    assert rep2["skipped"] == 2
    assert decode_job_output(out).count() == src.num_rows


def test_fold_stats_uint64_above_int63():
    t = pa.table({"u": pa.array([2**63 + 5, 7, 2**64 - 1], pa.uint64())})
    s = _stats_for(t)
    assert s["u"]["min"] == 7 and s["u"]["max"] == 2**64 - 1
    entry = {"num_rows": 3, "stats": s}
    assert partition_may_match(entry, [parse_filter(f"u={2**63 + 5}")])
    assert not partition_may_match(entry, [parse_filter("u<7")])


def test_string_cap_is_bytes_not_chars():
    # 200 CJK chars = 600 UTF-8 bytes: over the 256-BYTE cap -> poisoned
    acc = fold_stats({}, pa.table({"s": ["中" * 200, "a"]}))
    assert finalize_stats(acc)["s"]["poisoned"]


def test_decode_filtered_partial_job_guard(ray_session, tmp_path):
    src = pq.read_table("/root/testdata/sf0.001/lineitem.parquet")
    good = str(tmp_path / "g.parquet")
    bad = str(tmp_path / "a_bad.parquet")  # sorts FIRST among outputs
    pq.write_table(src.slice(0, 1000), good)
    # footer intact, data pages corrupt: fails at ENCODE time, so the
    # failure record lands in the manifest (a corrupt FOOTER fails at
    # planning and is report-only — the manifest guard can't see it)
    pq.write_table(src.slice(1000, 1000), bad)
    raw = bytearray(open(bad, "rb").read())
    raw[len(raw) // 4 : len(raw) // 4 + 256] = b"\x00" * 256
    with open(bad, "wb") as fh:
        fh.write(bytes(raw))
    out = str(tmp_path / "enc")
    rep = run_encode_job([good, bad], out, on_error="skip")
    if rep["failed"] != 1:
        pytest.skip("data-page corruption not detected by this reader")
    # partial job refused by default, readable with allow_partial
    with pytest.raises(ValueError, match="PARTIAL"):
        decode_filtered(out, ["l_orderkey>=0"])
    ds = decode_filtered(out, ["l_orderkey>=0"], allow_partial=True)
    assert ds.count() == 1000
    # all-pruned fallback must pick a LIVE row-bearing partition, never
    # the failure record (whose output file does not exist)
    ds0 = decode_filtered(out, ["l_orderkey<-1"], allow_partial=True)
    assert ds0.count() == 0
    assert set(ds0.schema().names) == set(src.column_names)
    rep2 = prune_report(out, ["l_orderkey>=0"])
    assert rep2["failed"] and len(rep2["kept"]) == 1
