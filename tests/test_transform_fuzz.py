"""Property fuzz: random transform chains vs equivalent DuckDB SQL.

Exercises ``batch_transform`` (the pure fused batch function — the same
code the distributed pipeline fuses into one map_batches) on a fixed
lineitem sample against SQL generated from the same random spec. The
chain's fixed operator order (filter sees the original schema; drop ->
cast -> select -> rename apply after) maps to one SELECT.
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from tbl_ray.transforms import TransformSpec, batch_transform, rename_batch

TABLE = pq.read_table("/root/testdata/sf0.001/lineitem.parquet").slice(0, 2000)

NUM_COLS = {
    "l_orderkey": int,
    "l_partkey": int,
    "l_suppkey": int,
    "l_linenumber": int,
    "l_quantity": float,
    "l_extendedprice": float,
}
STR_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"]}
ALL_COLS = [*NUM_COLS, *STR_COLS, "l_shipdate"]


@st.composite
def specs(draw):
    # filters over numeric + string columns
    filters = []
    for _ in range(draw(st.integers(0, 3))):
        if draw(st.booleans()):
            col = draw(st.sampled_from(sorted(NUM_COLS)))
            op = draw(st.sampled_from([">", "<", ">=", "<=", "=", "!="]))
            val = draw(st.integers(0, 60000))
            if NUM_COLS[col] is float:
                filters.append((f"{col}{op}{val}.0", f"{col} {op} {val}.0"))
            else:
                filters.append((f"{col}{op}{val}", f"{col} {op} {val}"))
        else:
            col = draw(st.sampled_from(sorted(STR_COLS)))
            op = draw(st.sampled_from(["=", "!="]))
            val = draw(st.sampled_from(STR_COLS[col]))
            filters.append((f"{col}{op}{val}", f"{col} {op} '{val}'"))
    # keep a non-empty projection
    keep = draw(
        st.lists(st.sampled_from(ALL_COLS), min_size=1, max_size=5, unique=True)
    )
    # cast one kept int column to i64 sometimes
    cast = []
    int_kept = [c for c in keep if c in NUM_COLS and NUM_COLS[c] is int]
    if int_kept and draw(st.booleans()):
        cast = [f"{int_kept[0]}=i64"]
    # rename one kept column sometimes
    rename = []
    if draw(st.booleans()):
        rename = [f"{keep[0]}=renamed_{keep[0]}"]
    return filters, keep, cast, rename


def _sql_name(col: str, cast: list[str], rename: list[str]) -> str:
    expr = col
    for c in cast:
        src, _ = c.split("=")
        if src == col:
            expr = f"CAST({col} AS BIGINT)"
    out = col
    for r in rename:
        src, dst = r.split("=")
        if src == col:
            out = dst
    return f"{expr} AS {out}" if (expr != col or out != col) else col


@given(specs())
@settings(max_examples=60, deadline=None)
def test_random_chain_matches_sql(spec):
    filters, keep, cast, rename = spec
    ts = TransformSpec(
        filter=[f for f, _ in filters],
        select=keep,
        cast=cast,
        rename=rename,
    )
    got = batch_transform(TABLE, ts)
    if rename:  # rename is the chain's separate final stage
        got = rename_batch(got, ts.parsed_renames())

    con = duckdb.connect()
    con.register("t", TABLE)
    proj = ", ".join(_sql_name(c, cast, rename) for c in keep)
    where = " AND ".join(s for _, s in filters) or "TRUE"
    want = con.execute(f"SELECT {proj} FROM t WHERE {where}").arrow()

    assert got.schema.names == want.schema.names, (
        got.schema.names,
        want.schema.names,
    )
    assert got.num_rows == want.num_rows
    if got.num_rows:
        keys = [(n, "ascending") for n in got.schema.names]
        assert got.sort_by(keys).equals(want.cast(got.schema).sort_by(keys))
