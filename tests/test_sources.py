"""Source-layer suite: path gather, footer summaries, metadata slice plans."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tbl_ray.sources.inputs import gather_paths, is_tabular_file
from tbl_ray.sources.parquet import (
    FileSlice,
    check_equal_schemas,
    file_slice_plan,
    read_table_slice,
    total_rows,
)
from tbl_ray.sources.summary import (
    combine_summaries,
    summarize_by_schema,
    summarize_file,
    summarize_files,
)


@pytest.fixture()
def three_files(tmp_path):
    paths = []
    for i, n in enumerate((10, 20, 30)):
        p = str(tmp_path / f"f{i}.parquet")
        pq.write_table(pa.table({"x": list(range(n))}), p)
        paths.append(p)
    return paths


def test_gather_paths_sorted_and_filtered(tmp_path):
    (tmp_path / "b.parquet").write_bytes(b"")
    (tmp_path / "a.parquet").write_bytes(b"")
    (tmp_path / "skip.txt").write_bytes(b"")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.parquet").write_bytes(b"")
    flat = gather_paths([str(tmp_path)], tree=False)
    assert [os.path.basename(p) for p in flat] == ["a.parquet", "b.parquet"]
    tree = gather_paths([str(tmp_path)], tree=True)
    assert [os.path.basename(p) for p in tree] == [
        "a.parquet", "b.parquet", "c.parquet",
    ]
    # glob pattern
    globbed = gather_paths([str(tmp_path / "*.parquet")])
    assert len(globbed) == 2


def test_is_tabular():
    assert is_tabular_file("x.parquet") and not is_tabular_file("x.csv")


def test_total_rows_and_slice_plan(three_files):
    assert total_rows(three_files) == 60
    # window [5, 35): tail of file0, all of file1, head of file2
    plan = file_slice_plan(three_files, 5, 30)
    assert plan == [
        FileSlice(three_files[0], skip=5, take=5, whole_file=False),
        FileSlice(three_files[1], skip=0, take=20, whole_file=True),
        FileSlice(three_files[2], skip=0, take=5, whole_file=False),
    ]
    # empty window past the end
    assert file_slice_plan(three_files, 100, 5) == []


def test_read_table_slice(three_files):
    ds = read_table_slice(three_files, 5, 30)
    vals = [r["x"] for r in ds.take_all()]
    assert vals == list(range(5, 10)) + list(range(20)) + list(range(5))
    assert len(vals) == 30


def test_check_equal_schemas(three_files, tmp_path):
    assert check_equal_schemas(three_files) is not None
    other = str(tmp_path / "other.parquet")
    pq.write_table(pa.table({"y": ["a"]}), other)
    from tbl_ray.sources.parquet import SchemaMismatch

    with pytest.raises(SchemaMismatch):
        check_equal_schemas([three_files[0], other])


def test_summaries_combine(three_files):
    summaries = summarize_files(three_files)
    assert [s.n_rows for s in summaries] == [10, 20, 30]
    combined = summaries[0]
    for s in summaries[1:]:
        combined = combine_summaries(combined, s)
    assert combined.n_rows == 60 and combined.n_files == 3
    assert combined.columns["x"].compressed_bytes > 0


def test_summarize_by_schema_groups(three_files, tmp_path):
    other = str(tmp_path / "zz.parquet")
    pq.write_table(pa.table({"y": ["a", "b"]}), other)
    groups = summarize_by_schema(summarize_files(three_files + [other]))
    assert len(groups) == 2
    sizes = sorted(s.n_rows for _schema, s in groups.values())
    assert sizes == [2, 60]


def test_read_for_spec_pushdown(sf_dir, duck):
    """Predicate + projection pushdown at the read: same results, fewer
    columns scanned."""
    from tbl_ray import TransformSpec, apply_transforms
    from tbl_ray.sources.parquet import read_for_spec

    path = os.path.join(sf_dir, "lineitem.parquet")
    spec = TransformSpec(
        filter=["l_returnflag=A", "l_quantity>20.0"],
        select=["l_orderkey", "l_quantity", "l_returnflag"],
    )
    ds = read_for_spec([path], spec)
    assert set(ds.schema().names) == {"l_orderkey", "l_quantity", "l_returnflag"}
    got = apply_transforms(ds, spec).to_pandas().sort_values(
        ["l_orderkey", "l_quantity"], ignore_index=True
    )
    want = duck.execute(
        "SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem "
        "WHERE l_returnflag='A' AND l_quantity>20.0 "
        "ORDER BY l_orderkey, l_quantity"
    ).df()
    assert len(got) == len(want)
    assert (got["l_orderkey"].values == want["l_orderkey"].values).all()


def test_filters_to_expression_unpushable():
    import pyarrow as pa

    from tbl_ray.filters import filters_to_expression, parse_filter

    schema = pa.schema([("x", pa.int64())])
    # column not in schema (created later in chain) -> no pushdown
    assert filters_to_expression([parse_filter("y=1")], schema) is None
    assert filters_to_expression([], schema) is None
    e = filters_to_expression([parse_filter("x>3"), parse_filter("x.is_not_null")], schema)
    assert e is not None


def test_summarize_files_distributed_branch(tmp_path):
    """>=256 files takes the Ray fan-out path; results match driver loop."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    paths = []
    for i in range(260):
        p = str(tmp_path / f"f{i:03d}.parquet")
        pq.write_table(pa.table({"x": [i, i + 1]}), p)
        paths.append(p)
    summaries = summarize_files(paths)
    assert len(summaries) == 260
    assert sum(s.n_rows for s in summaries) == 520
    assert summaries[0].columns["x"].dtype == "int64"


def test_read_for_spec_unknown_select_column_raises(tmp_path):
    # a typo'd --select column must fail at plan time (reference parity:
    # polars select errors) — the projection intersection would otherwise
    # silently return an empty result
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from tbl_ray import TransformSpec
    from tbl_ray.sources.parquet import read_for_spec

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}), p)
    with pytest.raises(KeyError, match="unknown column.*nope"):
        read_for_spec([p], TransformSpec(select=["a", "nope"]))
    # valid selects still plan
    ds = read_for_spec([p], TransformSpec(select=["a"]))
    assert ds.schema().names == ["a"]
