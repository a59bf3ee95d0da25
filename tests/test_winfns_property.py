"""Property tests: window functions and RANGE frames against DuckDB on
randomized tables — keys (with nulls), tie-heavy order columns, null
values. Complements the fixed oracle queries with adversarial shapes."""

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tbl_ray.functions.winfns import (  # noqa: E402
    rolling_range_agg,
    window_functions,
)


def _rows(draw_keys_null: bool):
    key = st.one_of(st.sampled_from(["a", "b", "c"]), st.none()) \
        if draw_keys_null else st.sampled_from(["a", "b", "c"])
    return st.lists(
        st.tuples(
            key,
            st.integers(min_value=0, max_value=5),  # tie-heavy order col
            st.one_of(st.integers(min_value=-100, max_value=100), st.none()),
        ),
        min_size=1,
        max_size=30,
    )


@settings(max_examples=15, deadline=None)
@given(rows=_rows(draw_keys_null=False))
def test_window_functions_match_duckdb(rows):
    t = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.string()),
            "o": pa.array([r[1] for r in rows], pa.int64()),
            "id": pa.array(range(len(rows)), pa.int64()),  # total order
            "v": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(min(3, len(rows)))
    out = (
        pa.concat_tables(
            window_functions(
                ds, key_col="k", order_cols=["o", "id"], value_col="v",
                ntile=3,
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        )
        .combine_chunks()
        .sort_by([("k", "ascending"), ("o", "ascending"), ("id", "ascending")])
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """
        SELECT k, o, id, v,
          row_number() OVER w AS rn,
          lag(v) OVER w AS lag_v,
          sum(v) OVER (PARTITION BY k ORDER BY o, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_v,
          lead(v) OVER w AS lead_v,
          first_value(v) OVER w AS first_v,
          percent_rank() OVER w AS pr,
          CAST(ntile(3) OVER w AS BIGINT) AS nt
        FROM t WINDOW w AS (PARTITION BY k ORDER BY o, id)
        ORDER BY k, o, id
        """
    ).fetch_arrow_table()
    for col in ["rn", "lag_v", "cum_v", "lead_v", "first_v", "pr", "nt"]:
        got = out.column(col).to_pylist()
        exp = want.column(col).to_pylist()
        assert got == exp, (col, got, exp)


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # key
            st.integers(min_value=0, max_value=7200),  # seconds offset
            st.integers(min_value=-5, max_value=5),  # value
        ),
        min_size=1,
        max_size=30,
    )
)
def test_rolling_range_matches_duckdb(rows):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + np.timedelta64(r[1], "s") for r in rows],
                pa.timestamp("us"),
            ),
            "id": pa.array(range(len(rows)), pa.int64()),
            "v": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(min(3, len(rows)))
    out = (
        pa.concat_tables(
            rolling_range_agg(
                ds, key_col="k", ts_col="ts", value_col="v", window="30m"
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        )
        .combine_chunks()
        .sort_by([("id", "ascending")])
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """
        SELECT id, count(*) OVER w AS n_w, sum(v) OVER w AS sum_w
        FROM t WINDOW w AS (PARTITION BY k ORDER BY ts
          RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
        ORDER BY id
        """
    ).fetch_arrow_table()
    assert out.column("n_w").to_pylist() == want.column("n_w").to_pylist()
    assert out.column("sum_w").to_pylist() == want.column("sum_w").to_pylist()


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.sampled_from(["a", "b", "c"]), st.none()),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
    n=st.integers(min_value=1, max_value=4),
)
def test_grouped_topn_matches_duckdb(rows, n):
    from tbl_ray.stages.slicing import grouped_topn

    t = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.string()),
            "v": pa.array([r[1] for r in rows], pa.int64()),
            "id": pa.array(range(len(rows)), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(min(3, len(rows)))
    out = (
        pa.concat_tables(
            grouped_topn(
                ds, "k", ["v", "id"], n, descending=[True, False]
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        )
        .combine_chunks()
        .sort_by([("id", "ascending")])
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        f"""
        SELECT k, v, id FROM (
          SELECT *, row_number() OVER
            (PARTITION BY k ORDER BY v DESC, id) AS rn FROM t
        ) WHERE rn <= {n} ORDER BY id
        """
    ).fetch_arrow_table()
    assert out.column("id").to_pylist() == want.column("id").to_pylist()
