"""Transform-chain conformance: batch-level semantics + Dataset chain vs DuckDB."""

import os

import pyarrow as pa
import pytest

from tbl_ray.sources.parquet import read_table
from tbl_ray.transforms import TransformSpec, apply_transforms, batch_transform


@pytest.fixture
def t():
    return pa.table(
        {
            "a": pa.array([1, 2, 3, 4], type=pa.int64()),
            "s": pa.array(["p", "q", "r", "s"]),
            "f": pa.array([1.5, 2.5, 3.5, 4.5], type=pa.float64()),
        }
    )


class TestBatchChain:
    def test_with_columns_null_and_value(self, t):
        out = batch_transform(t, TransformSpec(with_columns=["z:i32", "w:str:v=hi"]))
        assert out.column("z").null_count == 4
        assert out.schema.field("z").type == pa.int32()
        assert out.column("w").to_pylist() == ["hi"] * 4

    def test_filter_sees_with_columns(self, t):
        spec = TransformSpec(with_columns=["z:i64:v=9"], filter=["z=9", "a>2"])
        out = batch_transform(t, spec)
        assert out.column("a").to_pylist() == [3, 4]

    def test_drop_cast_select_order(self, t):
        spec = TransformSpec(drop=["f"], cast=["a=f32"], select=["s", "a"])
        out = batch_transform(t, spec)
        assert out.schema.names == ["s", "a"]
        assert out.schema.field("a").type == pa.float32()

    def test_set_keeps_dtype(self, t):
        out = batch_transform(t, TransformSpec(set=["a=7"]))
        assert out.column("a").to_pylist() == [7] * 4
        assert out.schema.field("a").type == pa.int64()

    def test_nullify(self, t):
        out = batch_transform(t, TransformSpec(nullify=["s"]))
        assert out.column("s").null_count == 4
        assert out.schema.field("s").type == pa.string()

    def test_replace(self, t):
        out = batch_transform(t, TransformSpec(replace=["s.q=QQ"]))
        assert out.column("s").to_pylist() == ["p", "QQ", "r", "s"]

    def test_replace_int(self, t):
        out = batch_transform(t, TransformSpec(replace=["a.2=20"]))
        assert out.column("a").to_pylist() == [1, 20, 3, 4]

    def test_rename_runs_last_other_ops_see_old_names(self, t):
        # rename is applied at the END of the chain: select refers to old name
        spec = TransformSpec(select=["a"], rename=["a=renamed"])
        ds_like = batch_transform(t, spec)  # stateless prefix only
        assert ds_like.schema.names == ["a"]


class TestDatasetChain:
    def test_full_chain_vs_duckdb(self, sf_dir, duck):
        path = os.path.join(sf_dir, "lineitem.parquet")
        spec = TransformSpec(
            filter=["l_returnflag=A", "l_quantity>25"],
            select=["l_orderkey", "l_quantity", "l_returnflag"],
            sort=["l_quantity:desc", "l_orderkey"],
            rename=["l_quantity=qty"],
        )
        got = apply_transforms(read_table(path), spec).to_pandas()
        want = duck.execute(
            "SELECT l_orderkey, l_quantity AS qty, l_returnflag FROM lineitem "
            "WHERE l_returnflag='A' AND l_quantity>25 "
            "ORDER BY qty DESC, l_orderkey"
        ).df()[["l_orderkey", "qty", "l_returnflag"]]
        # same rows in same order (column order: select then rename)
        got = got.reset_index(drop=True)
        want = want.reset_index(drop=True)
        assert got.columns.tolist() == ["l_orderkey", "qty", "l_returnflag"]
        assert got.equals(want)

    def test_value_counts(self, sf_dir, duck):
        path = os.path.join(sf_dir, "lineitem.parquet")
        got = apply_transforms(
            read_table(path), TransformSpec(value_counts="l_returnflag")
        ).to_pandas()
        want = duck.execute(
            "SELECT l_returnflag, COUNT(l_returnflag) AS count FROM lineitem "
            "GROUP BY l_returnflag ORDER BY count DESC"
        ).df()
        assert got.columns.tolist() == ["l_returnflag", "count"]
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

    @pytest.mark.parametrize(
        "offset,head,tail",
        [(None, 10, None), (5, 7, None), (3, None, None), (None, None, 9), (2, 50, 6)],
    )
    def test_ordered_slices(self, sf_dir, duck, offset, head, tail):
        path = os.path.join(sf_dir, "orders.parquet")
        spec = TransformSpec(offset=offset, head=head, tail=tail)
        got = apply_transforms(read_table(path), spec).to_pandas()
        n = duck.execute("SELECT count(*) FROM orders").fetchone()[0]
        start = offset or 0
        stop = n if head is None else min(n, start + head)
        if tail is not None:
            start = max(start, stop - tail)
        want = duck.execute(
            f"SELECT * FROM orders LIMIT {stop - start} OFFSET {start}"
        ).df()
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

    def test_multifile_concat_order(self, tmp_path, duck):
        import pyarrow.parquet as pq

        # three shards; sorted-path order defines concatenation order
        for i, lo in enumerate([0, 10, 20]):
            pq.write_table(
                pa.table({"x": pa.array(range(lo, lo + 10), type=pa.int64())}),
                str(tmp_path / f"part{i}.parquet"),
            )
        paths = sorted(str(p) for p in tmp_path.glob("*.parquet"))
        got = apply_transforms(
            read_table(paths), TransformSpec(offset=8, head=5)
        ).to_pandas()
        assert got["x"].tolist() == [8, 9, 10, 11, 12]


def test_value_counts_null_group(ray_session):
    """Nulls form a group whose count is 0 (polars col.count() counts
    non-null — reference transform.rs:609-623 semantics)."""
    import pyarrow as pa
    import ray.data

    from tbl_ray.stages.aggregate import value_counts

    t = pa.table({"c": pa.array(["a", "a", None, "b", None], pa.string())})
    out = {r["c"]: r["count"] for r in value_counts(ray.data.from_arrow(t), "c").take_all()}
    assert out == {"a": 2, "b": 1, None: 0}


def test_topk_matches_full_sort(ray_session):
    import pyarrow as pa
    import ray.data

    from tbl_ray.stages.slicing import topk

    ds = ray.data.read_parquet("/root/testdata/sf0.001/lineitem.parquet").repartition(8)
    got = pa.Table.from_pylist(
        topk(
            ds, ["l_extendedprice", "l_orderkey", "l_linenumber"], 25,
            descending=[True, False, False],
        ).take_all()
    )
    want = pa.Table.from_pylist(
        ds.sort(
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            descending=[True, False, False],
        ).limit(25).take_all()
    )
    assert got.column("l_orderkey").to_pylist() == want.column("l_orderkey").to_pylist()
    assert got.column("l_extendedprice").to_pylist() == want.column(
        "l_extendedprice"
    ).to_pylist()


def test_topk_k_larger_than_dataset(ray_session):
    import pyarrow as pa
    import ray.data

    from tbl_ray.stages.slicing import topk

    t = pa.table({"x": [3, 1, 2]})
    out = topk(ray.data.from_arrow(t), ["x"], 10).take_all()
    assert [r["x"] for r in out] == [1, 2, 3]


def test_with_columns_default_fill_knob():
    # library knob mirroring the reference's Arrow inserter
    # (parquet_insert.rs:206,221): Utf8 -> "", Binary -> b"" instead of null
    import pyarrow as pa

    from tbl_ray.transforms import TransformSpec, batch_transform

    t = pa.table({"a": [1, 2]})
    spec = TransformSpec(
        with_columns=["s:str", "b:binary", "i:i64"],
        with_columns_default_fill=True,
    )
    out = batch_transform(t, spec)
    assert out.column("s").to_pylist() == ["", ""]
    assert out.column("b").to_pylist() == [b"", b""]
    assert out.column("i").to_pylist() == [None, None]  # non-text stays null
    # default (CLI-faithful) path still null-fills
    out2 = batch_transform(t, TransformSpec(with_columns=["s:str"]))
    assert out2.column("s").to_pylist() == [None, None]


def test_group_aggregate_matches_duck(ray_session, sf_dir, duck):
    import pyarrow as pa
    import ray.data

    from tbl_ray.stages.aggregate import group_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet").repartition(6)
    got = (
        pa.Table.from_pylist(
            group_aggregate(
                ds,
                "o_orderstatus",
                {"o_totalprice": ["count", "sum", "min", "max", "mean"]},
            ).take_all()
        )
        .sort_by("o_orderstatus")
    )
    want = duck.execute(
        "SELECT o_orderstatus, count(o_totalprice) c, sum(o_totalprice) s,"
        " min(o_totalprice) mn, max(o_totalprice) mx, avg(o_totalprice) av"
        " FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    ).fetch_arrow_table()
    assert got.column("count_o_totalprice").to_pylist() == want.column("c").to_pylist()
    for a, b in zip(got.column("sum_o_totalprice").to_pylist(), want.column("s").to_pylist()):
        assert abs(a - float(b)) < 1e-6 * max(abs(float(b)), 1)
    assert got.column("min_o_totalprice").to_pylist() == [float(v) for v in want.column("mn").to_pylist()]
    for a, b in zip(got.column("mean_o_totalprice").to_pylist(), want.column("av").to_pylist()):
        assert abs(a - float(b)) < 1e-9 * max(abs(float(b)), 1)


def test_group_aggregate_rejects_bad_func(ray_session):
    import pyarrow as pa
    import ray.data
    import pytest as _pytest

    from tbl_ray.stages.aggregate import group_aggregate

    ds = ray.data.from_arrow(pa.table({"k": [1], "v": [2]}))
    with _pytest.raises(ValueError):
        group_aggregate(ds, "k", {"v": ["median"]})


def test_grouped_topn_matches_duck(ray_session, sf_dir, duck):
    import pyarrow as pa
    import ray.data

    from tbl_ray.stages.slicing import grouped_topn

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    got = pa.Table.from_pylist(
        grouped_topn(
            ds, "lang", ["doc_id"], 5, descending=[True]
        ).take_all()
    ).select(["lang", "doc_id"]).sort_by(
        [("lang", "ascending"), ("doc_id", "ascending")]
    )
    want = duck.execute(
        "SELECT lang, doc_id FROM (SELECT lang, doc_id, row_number() OVER ("
        "PARTITION BY lang ORDER BY doc_id DESC) rn FROM documents)"
        " WHERE rn <= 5 ORDER BY lang, doc_id"
    ).fetch_arrow_table()
    assert got.equals(want.cast(got.schema))


def test_rename_unknown_column_raises():
    # reference parity: polars-strict lf.rename errors on a missing source
    # column; silently ignoring a typo'd --rename would emit the whole
    # output under the wrong name with exit 0
    import pyarrow as pa
    import pytest

    from tbl_ray.transforms import TransformError, rename_batch

    t = pa.table({"a": [1], "b": [2]})
    with pytest.raises(TransformError, match="unknown column.*nope"):
        rename_batch(t, {"nope": "x"})
    assert rename_batch(t, {"a": "z"}).schema.names == ["z", "b"]
