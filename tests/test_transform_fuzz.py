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


@st.composite
def mutation_specs(draw):
    # with_columns (typed const), set, nullify, replace on a kept column
    wc = []
    if draw(st.booleans()):
        v = draw(st.integers(0, 99))
        wc = [f"extra:i64:val={v}"]
    keep = draw(
        st.lists(
            st.sampled_from(["l_orderkey", "l_returnflag", "l_linestatus"]),
            min_size=1, max_size=3, unique=True,
        )
    )
    set_ = []
    if "l_returnflag" in keep and draw(st.booleans()):
        set_ = [f"l_returnflag={draw(st.sampled_from(['X', 'Y']))}"]
    nullify = []
    if "l_linestatus" in keep and draw(st.booleans()):
        nullify = ["l_linestatus"]
    replace = []
    if "l_returnflag" in keep and not set_ and draw(st.booleans()):
        replace = [f"l_returnflag.A={draw(st.sampled_from(['Q', 'W']))}"]
    return wc, keep, set_, nullify, replace


@given(mutation_specs())
@settings(max_examples=40, deadline=None)
def test_mutation_chain_matches_sql(spec):
    wc, keep, set_, nullify, replace = spec
    sel = [*keep, *(["extra"] if wc else [])]
    ts = TransformSpec(
        with_columns=wc, set=set_, nullify=nullify, replace=replace, select=sel
    )
    got = batch_transform(TABLE, ts)

    def sql_col(c: str) -> str:
        if c == "extra":
            return f"CAST({wc[0].split('=')[-1]} AS BIGINT) AS extra"
        for s_ in set_:
            src, val = s_.split("=")
            if src == c:
                return f"'{val}' AS {c}"
        if c in nullify:
            return f"CAST(NULL AS VARCHAR) AS {c}"
        for r_ in replace:
            colold, new = r_.split("=")
            col, old = colold.rsplit(".", 1)
            if col == c:
                return f"CASE WHEN {c} = '{old}' THEN '{new}' ELSE {c} END AS {c}"
        return c

    con = duckdb.connect()
    con.register("t", TABLE)
    want = con.execute(
        "SELECT " + ", ".join(sql_col(c) for c in sel) + " FROM t"
    ).arrow()
    assert got.schema.names == want.schema.names
    assert got.num_rows == want.num_rows
    keys = [(n, "ascending") for n in got.schema.names]
    assert got.sort_by(keys).equals(want.cast(got.schema).sort_by(keys))
