"""Edge cases for the wave-3 operators (window functions, rolling
range frames, explode, pivot, distinct, exact quantiles, range join).

The happy paths run through the driver-contract parametrization in
test_entry_contract.py (every entry has a DuckDB oracle); these tests pin
the semantics the oracle data never exercises: nulls in the value column,
equal-timestamp RANGE peers, empty/null lists, null categories, both
sizing plans, and interval overlaps."""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest
import ray.data

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tbl_ray.functions.joins import broadcast_range_join  # noqa: E402
from tbl_ray.functions.winfns import (  # noqa: E402
    rolling_range_agg,
    window_functions,
)
from tbl_ray.stages.aggregate import (  # noqa: E402
    distinct_rows,
    grouped_quantiles,
)
from tbl_ray.stages.reshape import explode_list, pivot_counts  # noqa: E402


def _ds(table: pa.Table, blocks: int = 3) -> "ray.data.Dataset":
    return ray.data.from_arrow(table).repartition(blocks)


def _collect(ds) -> pa.Table:
    t = pa.concat_tables(
        b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return t.combine_chunks()


# -- window_functions ---------------------------------------------------


def test_window_fns_null_values_sql_semantics():
    # SQL: lag propagates nulls; running sum is NULL until the first
    # non-null value, then skips nulls but carries the total forward
    t = pa.table(
        {
            "k": ["a"] * 4 + ["b"] * 2,
            "o": [1, 2, 3, 4, 1, 2],
            "v": pa.array([None, 5, None, 7, None, None], pa.int64()),
        }
    )
    out = _collect(
        window_functions(_ds(t), key_col="k", order_cols=["o"], value_col="v")
    ).sort_by([("k", "ascending"), ("o", "ascending")])
    assert out.column("rn").to_pylist() == [1, 2, 3, 4, 1, 2]
    assert out.column("lag_v").to_pylist() == [None, None, 5, None, None, None]
    assert out.column("cum_v").to_pylist() == [None, 5, 5, 12, None, None]


def test_window_fns_single_row_groups_and_ties():
    t = pa.table(
        {
            "k": ["x", "y", "y"],
            "o": [9, 1, 1],  # tie inside y: rank order engine-defined...
            "id": [1, 2, 3],  # ...so break it with a second order col
            "v": pa.array([10, 20, 30], pa.int64()),
        }
    )
    out = _collect(
        window_functions(
            _ds(t, 2), key_col="k", order_cols=["o", "id"], value_col="v"
        )
    ).sort_by([("k", "ascending"), ("rn", "ascending")])
    assert out.column("cum_v").to_pylist() == [10, 20, 50]


# -- rolling_range_agg --------------------------------------------------


def test_rolling_range_includes_equal_ts_peers():
    # RANGE frames include ALL peer rows with the current timestamp —
    # including ones that sort after the current row
    base = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table(
        {
            "k": [1, 1, 1, 1],
            "ts": pa.array(
                [base, base, base + np.timedelta64(30, "m"),
                 base + np.timedelta64(200, "m")],
                pa.timestamp("us"),
            ),
            "v": pa.array([1, 2, 4, 8], pa.int64()),
        }
    )
    out = _collect(
        rolling_range_agg(
            _ds(t, 2), key_col="k", ts_col="ts", value_col="v", window="1h"
        )
    ).sort_by([("ts", "ascending"), ("v", "ascending")])
    # both t=0 rows see each other (peers): n=2, sum=3
    assert out.column("n_w").to_pylist() == [2, 2, 3, 1]
    assert out.column("sum_w").to_pylist() == [3, 3, 7, 8]


# -- explode_list -------------------------------------------------------


def test_explode_skips_null_and_empty_lists():
    t = pa.table(
        {
            "id": [1, 2, 3, 4],
            "xs": pa.array(
                [[1.5, 2.5], None, [], [9.0]],
                pa.list_(pa.float32()),
            ),
        }
    )
    out = _collect(explode_list(_ds(t, 2), "xs", id_cols=["id"])).sort_by(
        [("id", "ascending"), ("pos", "ascending")]
    )
    assert out.column("id").to_pylist() == [1, 1, 4]
    assert out.column("pos").to_pylist() == [1, 2, 1]
    assert out.column("val").to_pylist() == [1.5, 2.5, 9.0]
    assert out.schema.field("val").type == pa.float32()


# -- pivot_counts -------------------------------------------------------


def test_pivot_counts_null_category_counts_zero():
    t = pa.table(
        {
            "k": ["a", "a", "b", "b", "b"],
            "c": ["x", None, "y", "x", "z"],  # z unlisted -> ignored
        }
    )
    out = _collect(pivot_counts(_ds(t, 2), "k", "c", ["x", "y"])).sort_by(
        [("k", "ascending")]
    )
    assert out.column("n_x").to_pylist() == [1, 1]
    assert out.column("n_y").to_pylist() == [0, 1]


# -- distinct_rows ------------------------------------------------------


@pytest.mark.parametrize("local_bytes", ["0", str(128 << 20)])
def test_distinct_rows_both_plans_null_group(local_bytes, monkeypatch):
    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", local_bytes)
    t = pa.table(
        {
            "a": ["p", "p", None, None, "q"],
            "b": [1, 1, 2, 2, None],
        }
    )
    out = _collect(distinct_rows(_ds(t, 2), ["a", "b"]))
    rows = sorted(
        out.to_pylist(), key=lambda r: (str(r["a"]), str(r["b"]))
    )
    assert rows == [
        {"a": None, "b": 2},
        {"a": "p", "b": 1},
        {"a": "q", "b": None},
    ]


# -- grouped_quantiles --------------------------------------------------


def test_grouped_quantiles_matches_duck_disc_and_nulls(duck):
    import duckdb  # noqa: F401

    t = pa.table(
        {
            "k": ["a"] * 5 + ["b"] * 3,
            "v": pa.array([1.0, 2, 3, 7, None, 10, None, 30], pa.float64()),
        }
    )
    con = __import__("duckdb").connect()
    con.register("t", t)
    for interp in (True, False):
        fn = "quantile_cont" if interp else "quantile_disc"
        want = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                f"SELECT k, {fn}(v, 0.5), {fn}(v, 0.9) FROM t GROUP BY k"
            ).fetchall()
        }
        out = _collect(
            grouped_quantiles(
                _ds(t, 2), "k", "v", [0.5, 0.9], interpolate=interp
            )
        )
        got = {
            r["k"]: (r["q_0_5"], r["q_0_9"]) for r in out.to_pylist()
        }
        assert got == want, (interp, got, want)


# -- broadcast_range_join -----------------------------------------------


def test_range_join_overlaps_and_no_match():
    big = pa.table(
        {
            "id": [1, 2, 3],
            "g": ["a", "a", "b"],
            "x": pa.array([5, 50, 5], pa.int64()),
        }
    )
    ranges = pa.table(
        {
            "g": ["a", "a", "c"],
            "lo": pa.array([0, 4, 0], pa.int64()),
            "hi": pa.array([10, 6, 100], pa.int64()),
            "tag": ["r1", "r2", "r3"],
        }
    )
    out = _collect(
        broadcast_range_join(
            _ds(big, 2), ranges, by="g", on="x", start_col="lo", end_col="hi"
        )
    )
    pairs = sorted((r["id"], r["tag"]) for r in out.to_pylist())
    # id=1 overlaps both a-ranges; id=2 outside; id=3 has no b-range
    assert pairs == [(1, "r1"), (1, "r2")]


def test_range_join_missing_column_raises():
    big = _ds(pa.table({"g": ["a"], "x": [1]}), 1)
    ranges = pa.table({"g": ["a"], "lo": [0]})
    with pytest.raises(ValueError, match="missing"):
        broadcast_range_join(
            big, ranges, by="g", on="x", start_col="lo", end_col="hi"
        )


# -- join_auto ----------------------------------------------------------


def _right_table() -> pa.Table:
    return pa.table(
        {
            "rk": pa.array([1, 2, 2], pa.int64()),
            "tag": ["a", "b", "c"],
        }
    )


@pytest.mark.parametrize("local_bytes", ["0", str(128 << 20)])
def test_join_auto_both_plans_right_on(local_bytes, monkeypatch):
    from tbl_ray.functions.joins import join_auto

    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", local_bytes)
    left = _ds(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": [10, 20, 30]}),
        2,
    )
    right = ray.data.from_arrow(_right_table()).repartition(2)
    out = _collect(join_auto(left, right, "k", right_on="rk"))
    pairs = sorted((r["k"], r["tag"]) for r in out.to_pylist())
    assert pairs == [(1, "a"), (2, "b"), (2, "c")]
    assert "rk" not in out.schema.names

    semi = _collect(join_auto(left, right, "k", right_on="rk", semi=True))
    assert sorted(semi.column("k").to_pylist()) == [1, 2]  # no duplication


def test_join_auto_anti_small_and_big():
    from tbl_ray.functions.joins import join_auto

    left = _ds(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": [10, 20, 30]}),
        2,
    )
    right = ray.data.from_arrow(_right_table())
    out = _collect(join_auto(left, right, "k", right_on="rk", anti=True))
    assert out.column("k").to_pylist() == [3]
    # big right side (forced distributed): routes to the co-bucketed
    # shuffle anti plan (round 4) — same answer as the broadcast plan
    os.environ["TBL_RAY_LOCAL_SKETCH_BYTES"] = "0"
    try:
        big = _collect(join_auto(left, right, "k", right_on="rk", anti=True))
        assert big.column("k").to_pylist() == [3]
        assert sorted(big.schema.names) == sorted(["k", "v"])
    finally:
        del os.environ["TBL_RAY_LOCAL_SKETCH_BYTES"]


@pytest.mark.parametrize("local_bytes", ["0", str(128 << 20)])
def test_group_aggregate_null_keys_both_plans(local_bytes, monkeypatch):
    from tbl_ray.stages.aggregate import group_aggregate

    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", local_bytes)
    t = pa.table(
        {
            "k": ["a", None, "a", None],
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    out = _collect(group_aggregate(_ds(t, 2), "k", {"v": ["sum"]}))
    got = {r["k"]: r["sum_v"] for r in out.to_pylist()}
    assert got == {"a": 4, None: 6}


# -- split_assign / sample_weighted -------------------------------------


def test_split_assign_deterministic_across_layouts():
    from tbl_ray.functions.sampling import split_assign

    t = pa.table({"doc_id": pa.array(range(500), pa.int64())})
    frac = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = _collect(split_assign(_ds(t, 1), frac)).sort_by("doc_id")
    b = _collect(split_assign(_ds(t, 7), frac)).sort_by("doc_id")
    assert a.column("split").to_pylist() == b.column("split").to_pylist()
    counts = a.column("split").to_pylist()
    # rough proportions (hash-uniform over 500 ids)
    assert 330 <= counts.count("train") <= 470
    assert counts.count("train") + counts.count("val") + counts.count(
        "test"
    ) == 500
    # different seed -> different assignment
    c = _collect(split_assign(_ds(t, 3), frac, seed=1)).sort_by("doc_id")
    assert c.column("split").to_pylist() != a.column("split").to_pylist()


def test_split_assign_rejects_bad_fractions():
    from tbl_ray.functions.sampling import split_assign

    with pytest.raises(ValueError, match="sum to ~1"):
        split_assign(
            _ds(pa.table({"doc_id": [1]}), 1), {"a": 0.5, "b": 0.1}
        )


def test_sample_weighted_rates_and_null_category():
    from tbl_ray.functions.sampling import sample_weighted

    n = 2000
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "cat": pa.array(
                ["keep_all", "half", "drop", None] * (n // 4)
            ),
        }
    )
    out = _collect(
        sample_weighted(
            _ds(t, 3), "cat", {"keep_all": 1.0, "half": 0.5}, id_col="doc_id"
        )
    )
    cats = out.column("cat").to_pylist()
    assert cats.count("keep_all") == n // 4  # rate 1.0 keeps everything
    assert 150 <= cats.count("half") <= 350  # ~250 of 500
    assert cats.count("drop") == 0 and cats.count(None) == 0
    # deterministic: same call -> identical ids
    out2 = _collect(
        sample_weighted(
            _ds(t, 8), "cat", {"keep_all": 1.0, "half": 0.5}, id_col="doc_id"
        )
    )
    assert sorted(out.column("doc_id").to_pylist()) == sorted(
        out2.column("doc_id").to_pylist()
    )


# -- term_stats / tfidf -------------------------------------------------


@pytest.mark.parametrize("local_bytes", ["0", str(128 << 20)])
def test_term_stats_both_plans_nulls_and_empty(local_bytes, monkeypatch):
    from tbl_ray.functions.text import term_stats

    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", local_bytes)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["a b a", "b  c", None, ""],
        }
    )
    out = _collect(term_stats(_ds(t, 2))).sort_by(
        [("doc_id", "ascending"), ("term", "ascending")]
    )
    rows = [
        (r["doc_id"], r["term"], r["tf"], r["df"]) for r in out.to_pylist()
    ]
    assert rows == [
        (1, "a", 2, 1),
        (1, "b", 1, 2),
        (2, "b", 1, 2),
        (2, "c", 1, 1),
    ]


def test_tfidf_score_values():
    from tbl_ray.functions.text import tfidf_score

    t = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": ["x x y", "y"]}
    )
    out = _collect(tfidf_score(_ds(t, 1), 2)).sort_by(
        [("doc_id", "ascending"), ("term", "ascending")]
    )
    got = {
        (r["doc_id"], r["term"]): r["score"] for r in out.to_pylist()
    }
    assert got[(1, "x")] == pytest.approx(2 * np.log(3 / 2))
    assert got[(1, "y")] == pytest.approx(1 * np.log(3 / 3))
    assert got[(2, "y")] == pytest.approx(0.0)


# -- distributed k-means ------------------------------------------------


def test_kmeans_converges_and_assignment_consistent(sf_dir):
    from tbl_ray.functions.similarity import kmeans_assign, kmeans_fit
    from tbl_ray.sources import read_table

    ds = read_table(os.path.join(sf_dir, "embeddings.parquet"))
    cent, hist = kmeans_fit(ds, 4, iters=4)
    assert cent.shape[1] > 0 and len(cent) == 4
    # inertia non-increasing (allow float noise)
    assert all(b <= a + 1e-6 for a, b in zip(hist, hist[1:])), hist
    # centroids unit-normalized
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-5)
    out = _collect(kmeans_assign(ds, cent))
    labels = out.column("cluster").to_pylist()
    assert set(labels) <= set(range(4))
    # every row labeled, and the label is the true argmax for a sample row
    assert len(labels) == ds.count()


def test_kmeans_separates_synthetic_clusters():
    from tbl_ray.functions.similarity import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(0)
    a = rng.normal((5, 0, 0), 0.05, (50, 3))
    b = rng.normal((0, 5, 0), 0.05, (50, 3))
    t = pa.table(
        {
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in np.vstack([a, b])],
                pa.list_(pa.float32()),
            ),
        }
    )
    ds = _ds(t, 4)
    cent, hist = kmeans_fit(ds, 2, iters=5)
    out = _collect(kmeans_assign(ds, cent)).sort_by("vec_id")
    lbl = np.array(out.column("cluster").to_pylist())
    # the two blobs land in two distinct pure clusters
    assert len(set(lbl[:50])) == 1 and len(set(lbl[50:])) == 1
    assert lbl[0] != lbl[50]


# -- review-pass regressions --------------------------------------------


def test_percent_rank_ties_share_value():
    from tbl_ray.functions.winfns import window_functions

    t = pa.table(
        {
            "k": ["a"] * 4,
            "o": [1, 1, 2, 3],  # tie on the order key
            "v": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    out = _collect(
        window_functions(_ds(t, 2), key_col="k", order_cols=["o"], value_col="v")
    ).sort_by([("rn", "ascending")])
    # DuckDB: percent_rank for [1,1,2,3] = [0, 0, 2/3, 1]
    assert out.column("pr").to_pylist() == [0.0, 0.0, 2 / 3, 1.0]


def test_window_cumsum_exact_above_2_53_with_nulls():
    from tbl_ray.functions.winfns import window_functions

    big = 1 << 60
    t = pa.table(
        {
            "k": ["a"] * 3,
            "o": [1, 2, 3],
            "v": pa.array([big + 1, None, big + 3], pa.int64()),
        }
    )
    out = _collect(
        window_functions(_ds(t, 1), key_col="k", order_cols=["o"], value_col="v")
    ).sort_by([("o", "ascending")])
    assert out.column("cum_v").to_pylist() == [big + 1, big + 1, 2 * big + 4]


def test_rolling_range_null_ts_raises():
    from tbl_ray.functions.winfns import rolling_range_agg

    t = pa.table(
        {
            "k": [1, 1],
            "ts": pa.array(
                [np.datetime64("2024-01-01", "us"), None], pa.timestamp("us")
            ),
            "v": pa.array([1, 2], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="nulls"):
        _collect(
            rolling_range_agg(
                _ds(t, 1), key_col="k", ts_col="ts", value_col="v", window="1h"
            )
        )


@pytest.mark.parametrize("local_bytes", ["0", str(128 << 20)])
def test_join_auto_collision_schema_same_both_plans(local_bytes, monkeypatch):
    from tbl_ray.functions.joins import join_auto

    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", local_bytes)
    left = _ds(
        pa.table(
            {"k": pa.array([1, 2], pa.int64()), "v": ["l1", "l2"]}
        ),
        2,
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "v": ["r1"]})
    )
    out = _collect(join_auto(left, right, "k"))
    assert sorted(out.schema.names) == ["k", "v", "v_r"]
    assert out.to_pylist() == [{"k": 1, "v": "l1", "v_r": "r1"}]


@pytest.mark.parametrize("local_bytes", ["0", str(128 << 20)])
def test_grouped_quantiles_null_keys_both_plans(local_bytes, monkeypatch):
    from tbl_ray.stages.aggregate import grouped_quantiles

    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", local_bytes)
    t = pa.table(
        {
            "k": ["a", "a", None, None, "b"],
            "v": pa.array([1.0, 3.0, 10.0, 20.0, None], pa.float64()),
        }
    )
    out = _collect(grouped_quantiles(_ds(t, 2), "k", "v", [0.5]))
    got = {r["k"]: r["q_0_5"] for r in out.to_pylist()}
    # null key forms its own group; all-null-value group -> NULL quantile
    assert got == {"a": 2.0, None: 15.0, "b": None}


@pytest.mark.parametrize("local_bytes", ["0", str(128 << 20)])
def test_pivot_counts_null_key_both_plans(local_bytes, monkeypatch):
    from tbl_ray.stages.reshape import pivot_counts

    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", local_bytes)
    t = pa.table(
        {
            "k": ["a", None, None],
            "c": ["x", "x", "y"],
        }
    )
    out = _collect(pivot_counts(_ds(t, 2), "k", "c", ["x", "y"]))
    got = {r["k"]: (r["n_x"], r["n_y"]) for r in out.to_pylist()}
    assert got == {"a": (1, 0), None: (1, 1)}


def test_range_join_big_side_missing_column_raises():
    from tbl_ray.functions.joins import broadcast_range_join

    big = _ds(pa.table({"g": ["a"], "x": pa.array([1], pa.int64())}), 1)
    ranges = pa.table(
        {
            "g": ["a"],
            "lo": pa.array([0], pa.int64()),
            "hi": pa.array([5], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="big side"):
        broadcast_range_join(
            big, ranges, by="g", on="nope", start_col="lo", end_col="hi"
        )


# -- rollup_aggregate ---------------------------------------------------


def test_rollup_levels_and_grouping_bitmask():
    from tbl_ray.stages.aggregate import rollup_aggregate

    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "a": ["x", "x", "y", "y"],
            "b": ["p", "q", "p", None],  # real null key vs rollup null
        }
    )
    out = _collect(rollup_aggregate(_ds(t, 2), ["a", "b"], {"id": ["count"]}))
    rows = {
        (r["a"], r["b"], r["lvl"]): r["count_id"] for r in out.to_pylist()
    }
    # detail level (lvl 0): real null key kept, distinguishable via lvl
    assert rows[("y", None, 0)] == 1
    assert rows[("x", "p", 0)] == 1
    # b rolled away (lvl 1)
    assert rows[("x", None, 1)] == 2 and rows[("y", None, 1)] == 2
    # grand total (lvl 3)
    assert rows[(None, None, 3)] == 4
    assert len(rows) == 4 + 2 + 1  # 4 detail + 2 subtotal + 1 total


# -- bucket-exchange migrations (null keys everywhere) ------------------


@pytest.mark.parametrize("local_bytes", ["0", str(128 << 20)])
def test_value_counts_null_group_both_plans(local_bytes, monkeypatch):
    from tbl_ray.stages.aggregate import value_counts

    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", local_bytes)
    t = pa.table({"c": ["a", "a", None, "b", None, None]})
    out = _collect(value_counts(_ds(t, 2), "c"))
    got = {r["c"]: r["count"] for r in out.to_pylist()}
    # count counts NON-NULL values (reference semantics): null group = 0
    assert got == {"a": 2, "b": 1, None: 0}


def test_grouped_topn_null_key_group():
    from tbl_ray.stages.slicing import grouped_topn

    t = pa.table(
        {
            "k": ["a", "a", "a", None, None],
            "v": pa.array([3, 1, 2, 9, 8], pa.int64()),
        }
    )
    out = _collect(grouped_topn(_ds(t, 2), "k", ["v"], 2, descending=True))
    got = sorted(
        [(r["k"], r["v"]) for r in out.to_pylist()],
        key=lambda x: (str(x[0]), -x[1]),
    )
    assert got == [(None, 9), (None, 8), ("a", 3), ("a", 2)]


def test_session_counts_null_key_and_gaps():
    from tbl_ray.functions.windows import session_counts

    base = np.datetime64("2024-01-01T00:00:00", "us")
    mins = lambda m: base + np.timedelta64(m, "m")  # noqa: E731
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, None, None], pa.int64()),
            "ts": pa.array(
                [mins(0), mins(10), mins(120), mins(0), mins(300)],
                pa.timestamp("us"),
            ),
        }
    )
    out = _collect(session_counts(_ds(t, 2), key_col="user_id", gap="30m"))
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in out.to_pylist()
    }
    assert got == {1: (2, 3), None: (2, 2)}


def test_sample_stratified_null_key_deterministic_layouts():
    from tbl_ray.functions.sampling import sample_stratified

    t = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "lang": pa.array((["en"] * 3 + [None]) * 10),
        }
    )
    a = _collect(sample_stratified(_ds(t, 1), "lang", 5))
    b = _collect(sample_stratified(_ds(t, 7), "lang", 5))
    ids_a = sorted(a.column("doc_id").to_pylist())
    assert ids_a == sorted(b.column("doc_id").to_pylist())
    langs = a.column("lang").to_pylist()
    assert langs.count("en") == 5 and langs.count(None) == 5


# -- union_by_name ------------------------------------------------------


def test_union_by_name_aligns_and_rejects_dtype_drift():
    from tbl_ray.stages.reshape import union_by_name

    a = _ds(pa.table({"x": pa.array([1, 2], pa.int64()), "s": ["p", "q"]}), 2)
    b = _ds(pa.table({"x": pa.array([3], pa.int64()), "t": [1.5]}), 1)
    out = _collect(union_by_name([a, b])).sort_by("x")
    assert out.schema.names == ["x", "s", "t"]
    assert out.column("s").to_pylist() == ["p", "q", None]
    assert out.column("t").to_pylist() == [None, None, 1.5]

    c = _ds(pa.table({"x": pa.array([1], pa.int32())}), 1)
    with pytest.raises(ValueError, match="dtype differs"):
        union_by_name([a, c])


# -- review round-2 regressions -----------------------------------------


def test_grouped_quantiles_nan_plus_null_matches_duck():
    from tbl_ray.stages.aggregate import grouped_quantiles

    t = pa.table(
        {
            "k": ["a", "a", "a"],
            "v": pa.array([1.0, float("nan"), None], pa.float64()),
        }
    )
    for interp in (True, False):
        out = _collect(
            grouped_quantiles(_ds(t, 1), "k", "v", [1.0], interpolate=interp)
        )
        val = out.column("q_1_0").to_pylist()[0]
        assert val != val, (interp, val)  # NaN, like DuckDB — never 0.0


def test_grouped_quantiles_disc_exact_above_2_53():
    from tbl_ray.stages.aggregate import grouped_quantiles

    big = 1 << 60
    t = pa.table(
        {
            "k": ["a"] * 3,
            "v": pa.array([big + 3, big + 1, big + 2], pa.int64()),
        }
    )
    out = _collect(
        grouped_quantiles(_ds(t, 1), "k", "v", [0.5], interpolate=False)
    )
    assert out.column("q_0_5").to_pylist() == [big + 2]


def test_percent_rank_null_order_ties_share_value():
    from tbl_ray.functions.winfns import window_functions

    t = pa.table(
        {
            "k": ["a"] * 3,
            "o": pa.array([1, None, None], pa.int64()),
            "v": pa.array([1, 2, 3], pa.int64()),
        }
    )
    out = _collect(
        window_functions(_ds(t, 1), key_col="k", order_cols=["o"], value_col="v")
    ).sort_by([("rn", "ascending")])
    # DuckDB: nulls sort last as EQUAL peers -> pr [0, 0.5, 0.5]
    assert out.column("pr").to_pylist() == [0.0, 0.5, 0.5]


def test_session_counts_null_ts_raises():
    from tbl_ray.functions.windows import session_counts

    t = pa.table(
        {
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": pa.array(
                [np.datetime64("2024-01-01", "us"), None], pa.timestamp("us")
            ),
        }
    )
    with pytest.raises(Exception, match="nulls"):
        _collect(session_counts(_ds(t, 1), key_col="user_id"))


def test_ntile_zero_raises():
    from tbl_ray.functions.winfns import window_functions

    with pytest.raises(ValueError, match="ntile"):
        window_functions(
            _ds(pa.table({"k": ["a"], "o": [1], "v": [1]}), 1),
            key_col="k", order_cols=["o"], value_col="v", ntile=0,
        )


def test_csv_roundtrip_null_vs_empty_string(tmp_path):
    from tbl_ray.sinks.writers import write_csv
    from tbl_ray.sources import read_csv

    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "s": pa.array(["x", None, ""], pa.string()),
        }
    )
    path = str(tmp_path / "t.csv")
    write_csv(_ds(t, 1), path)
    back = _collect(
        read_csv(
            path,
            schema=pa.schema([("id", pa.int64()), ("s", pa.string())]),
        )
    ).sort_by("id")
    assert back.column("s").to_pylist() == ["x", None, ""]


@pytest.mark.parametrize("local_bytes", ["0", str(128 << 20)])
def test_kmeans_both_plans_equivalent(local_bytes, monkeypatch, sf_dir):
    from tbl_ray.functions.similarity import kmeans_fit
    from tbl_ray.sources import read_table

    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", local_bytes)
    ds = read_table(os.path.join(sf_dir, "embeddings.parquet"))
    cent, hist = kmeans_fit(ds, 4, iters=3)
    assert cent.shape[0] == 4
    assert all(b <= a + 1e-6 for a, b in zip(hist, hist[1:])), hist
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-5)


# -- Bloom decontaminate ------------------------------------------------


def test_decontaminate_bloom_supersets_exact_drops():
    from tbl_ray.functions.dedup import (
        _bloom_build,
        _bloom_query,
        decontaminate,
    )

    words = lambda i: " ".join(f"w{i}_{j}" for j in range(10))  # noqa: E731
    train = pa.table(
        {
            "doc_id": pa.array(range(50), pa.int64()),
            "text": pa.array(
                [words(i) for i in range(40)]
                + [words(1000 + i) for i in range(10)]
            ),
        }
    )
    # eval set shares the first 5 docs' text
    ev = pa.table(
        {"doc_id": pa.array(range(5), pa.int64()),
         "text": pa.array([words(i) for i in range(5)])}
    )
    exact = _collect(
        decontaminate(_ds(train, 3), _ds(ev, 1), n=4)
    ).column("doc_id").to_pylist()
    bloom = _collect(
        decontaminate(_ds(train, 3), _ds(ev, 1), n=4, bloom_bits_per_ngram=32)
    ).column("doc_id").to_pylist()
    # bloom never keeps anything exact would drop (no false negatives)
    assert set(bloom) <= set(exact)
    # at 32 bits/ngram on this tiny set there should be no FPs (deterministic)
    assert set(bloom) == set(exact)
    assert set(range(5)).isdisjoint(exact)

    # unit: every inserted hash queries positive
    h = np.array([3, 9, 2**63 + 5, 12345], dtype=np.uint64)
    bits = _bloom_build(h, 1024)
    assert _bloom_query(bits, np.uint64(1024), h).all()
    miss = np.array([777, 888], dtype=np.uint64)
    assert not _bloom_query(bits, np.uint64(1024), miss).all()


def test_pipeline_exposes_wave3_ops():
    from tbl_ray.pipeline import Pipeline

    t = pa.table(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "k": pa.array(["a", "b"] * 10),
            "v": pa.array(range(20), pa.int64()),
        }
    )
    out = _collect(
        Pipeline()
        .step("split_assign", fractions={"train": 0.8, "test": 0.2})
        .step("distinct", cols=["k", "split"])(_ds(t, 2))
    )
    assert set(out.schema.names) == {"k", "split"}
    assert 2 <= out.num_rows <= 4


# -- string_agg ---------------------------------------------------------


def test_string_agg_nulls_and_ordering():
    from tbl_ray.stages.aggregate import string_agg

    t = pa.table(
        {
            "k": ["a", "a", "a", "b", None],
            "o": pa.array([3, 1, 2, 1, 1], pa.int64()),
            "v": ["z", "x", None, None, "n"],
        }
    )
    out = _collect(
        string_agg(_ds(t, 2), "k", "v", ["o"], sep="|")
    )
    got = {r["k"]: r["agg_v"] for r in out.to_pylist()}
    # ordered by o, null values skipped; all-null group -> NULL
    assert got == {"a": "x|z", "b": None, None: "n"}


# -- review round-3 regressions -----------------------------------------


@pytest.mark.parametrize("local_bytes", ["0", str(128 << 20)])
def test_kmeans_seed_identical_on_unsorted_ids(local_bytes, monkeypatch):
    from tbl_ray.functions.similarity import kmeans_fit

    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", local_bytes)
    rng = np.random.default_rng(7)
    vecs = rng.normal(0, 1, (40, 4)).astype(np.float32)
    t = pa.table(
        {
            # ids REVERSED vs row order: seeding must still be id order
            "vec_id": pa.array(list(range(39, -1, -1)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in vecs], pa.list_(pa.float32())
            ),
        }
    )
    cent, _ = kmeans_fit(_ds(t, 2), 3, iters=0)
    # iters=0: centroids == normalized vectors of ids 0,1,2 in id order
    want = vecs[[39, 38, 37]]  # rows holding vec_id 0,1,2
    want = want / np.linalg.norm(want, axis=1, keepdims=True)
    assert np.allclose(cent, want, atol=1e-6), (cent, want)


def test_write_csv_empty_unknown_schema_raises(tmp_path):
    from tbl_ray.sinks.writers import write_csv

    ds = ray.data.from_items([{"x": 1}]).filter(lambda r: False)
    path = str(tmp_path / "e.csv")
    with pytest.raises(ValueError, match="unknown schema"):
        write_csv(ds, path)
    assert not os.path.exists(path + "_tmp")  # no stale tmp left behind


def test_bloom_bits_validated():
    from tbl_ray.functions.dedup import decontaminate

    t = _ds(pa.table({"doc_id": [1], "text": ["a b c d e"]}), 1)
    with pytest.raises(ValueError, match="bloom_bits_per_ngram"):
        decontaminate(t, t, n=2, bloom_bits_per_ngram=0)


def test_regex_extract_semantics_and_validation():
    from tbl_ray.functions.text import regex_extract

    t = pa.table(
        {"id": [1, 2, 3], "s": ["abc123x", "nope", None]}
    )
    out = _collect(
        regex_extract(_ds(t, 2), "s", r"([0-9]+)", "num")
    ).sort_by("id")
    assert out.column("num").to_pylist() == ["123", "", None]
    with pytest.raises(ValueError, match="capture group"):
        regex_extract(_ds(t, 1), "s", r"(?:x)[0-9]+", "num")


def test_read_jsonl_schema_pinned(tmp_path):
    from tbl_ray.sinks.writers import write_json
    from tbl_ray.sources import read_jsonl

    t = pa.table(
        {"id": pa.array([1, 2], pa.int64()), "x": pa.array([1.5, None])}
    )
    path = str(tmp_path / "t.jsonl")
    write_json(_ds(t, 1), path, lines=True)
    schema = pa.schema([("id", pa.int64()), ("x", pa.float64())])
    back = _collect(read_jsonl(path, schema=schema)).sort_by("id")
    assert back.schema.field("x").type == pa.float64()
    assert back.column("x").to_pylist() == [1.5, None]


def test_union_by_name_three_way():
    from tbl_ray.stages.reshape import union_by_name

    a = _ds(pa.table({"x": pa.array([1], pa.int64())}), 1)
    b = _ds(pa.table({"y": ["p"]}), 1)
    c = _ds(pa.table({"x": pa.array([2], pa.int64()), "z": [0.5]}), 1)
    out = _collect(union_by_name([a, b, c])).sort_by(
        [("x", "ascending")]
    )
    assert out.schema.names == ["x", "y", "z"]
    assert out.num_rows == 3


def test_regex_extract_char_class_paren(ray_session, duck):
    """A '(' inside a character class is a literal — the group-1 rewrite
    must skip it and name the REAL capture (r'[(](\\d+)[)]' crashed every
    worker batch before the scanner fix)."""
    import ray.data

    from tbl_ray.functions.text import regex_extract

    t = pa.table({"s": ["a(42)b", "no parens", None, "(7)"]})
    out = pa.concat_tables(
        regex_extract(
            ray.data.from_arrow(t), "s", r"[(](\d+)[)]", out_col="num"
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    want = duck.execute(
        "SELECT regexp_extract(s, '[(](\\d+)[)]', 1) AS num"
        " FROM (VALUES ('a(42)b'), ('no parens'), (NULL), ('(7)')) v(s)"
    ).fetchall()
    got = sorted(
        x if x is not None else "<null>"
        for x in out.column("num").to_pylist()
    )
    exp = sorted(x[0] if x[0] is not None else "<null>" for x in want)
    assert got == exp == sorted(["42", "7", "", "<null>"])
