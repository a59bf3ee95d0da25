"""Port of the reference's path-mapping test matrix (SURVEY.md §5.1;
reference crates/tbl-core/src/filesystem/outputs.rs:311-354 doc cases over
the synthetic tree at outputs.rs:361-386)."""

import os

import pytest

from tbl_ray.sources.outputs import (
    OutputPathError,
    OutputPathSpec,
    convert_file_path,
    get_common_prefix,
    get_output_paths,
)


@pytest.fixture()
def tree(tmp_path):
    """The reference's test tree: root/{super_data_a,b}, data1/{a,b,
    sub_data1_1/{a,b}}, data2/{a,b} (+ a non-tabular file to skip)."""
    root = tmp_path / "root"
    for rel in [
        "super_data_a.parquet",
        "super_data_b.parquet",
        "data1/data1_a.parquet",
        "data1/data1_b.parquet",
        "data1/sub_data1_1/sub_data1_a.parquet",
        "data1/sub_data1_1/sub_data1_b.parquet",
        "data2/data2_a.parquet",
        "data2/data2_b.parquet",
        "data1/notes.txt",
    ]:
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"")
    (tmp_path / "other_root").mkdir()
    os.chdir(tmp_path)
    return str(tmp_path)


def _rel(paths, base):
    return [os.path.relpath(p, base) for p in paths]


CASES = [
    # (inputs, output_dir, tree_flag, expected outputs relative to tmp)
    (["root"], None, False,
     ["root/super_data_a.parquet", "root/super_data_b.parquet"]),
    (["root"], None, True,
     ["root/super_data_a.parquet", "root/super_data_b.parquet",
      "root/data1/data1_a.parquet", "root/data1/data1_b.parquet",
      "root/data1/sub_data1_1/sub_data1_a.parquet",
      "root/data1/sub_data1_1/sub_data1_b.parquet",
      "root/data2/data2_a.parquet", "root/data2/data2_b.parquet"]),
    (["root"], "root", False,
     ["root/super_data_a.parquet", "root/super_data_b.parquet"]),
    (["root"], "other_root", False,
     ["other_root/super_data_a.parquet", "other_root/super_data_b.parquet"]),
    (["root"], "other_root", True,
     ["other_root/super_data_a.parquet", "other_root/super_data_b.parquet",
      "other_root/data1/data1_a.parquet", "other_root/data1/data1_b.parquet",
      "other_root/data1/sub_data1_1/sub_data1_a.parquet",
      "other_root/data1/sub_data1_1/sub_data1_b.parquet",
      "other_root/data2/data2_a.parquet", "other_root/data2/data2_b.parquet"]),
    (["root/data1"], None, False,
     ["root/data1/data1_a.parquet", "root/data1/data1_b.parquet"]),
    (["root/data1"], None, True,
     ["root/data1/data1_a.parquet", "root/data1/data1_b.parquet",
      "root/data1/sub_data1_1/sub_data1_a.parquet",
      "root/data1/sub_data1_1/sub_data1_b.parquet"]),
    (["root/data1"], "other_root", False,
     ["other_root/data1_a.parquet", "other_root/data1_b.parquet"]),
    (["root/data1"], "other_root", True,
     ["other_root/data1_a.parquet", "other_root/data1_b.parquet",
      "other_root/sub_data1_1/sub_data1_a.parquet",
      "other_root/sub_data1_1/sub_data1_b.parquet"]),
    (["root/data1", "root/data2"], None, False,
     ["root/data1/data1_a.parquet", "root/data1/data1_b.parquet",
      "root/data2/data2_a.parquet", "root/data2/data2_b.parquet"]),
    (["root/data1", "root/data2"], "other_root", False,
     ["other_root/data1_a.parquet", "other_root/data1_b.parquet",
      "other_root/data2_a.parquet", "other_root/data2_b.parquet"]),
    (["root/data1/data1_a.parquet", "root/super_data_a.parquet"], None, False,
     ["root/data1/data1_a.parquet", "root/super_data_a.parquet"]),
    (["root/data1/data1_a.parquet", "root/super_data_a.parquet"], "other_root",
     False,
     ["other_root/data1_a.parquet", "other_root/super_data_a.parquet"]),
    # tree flag irrelevant for file inputs
    (["root/data1/data1_a.parquet", "root/super_data_a.parquet"], "other_root",
     True,
     ["other_root/data1_a.parquet", "other_root/super_data_a.parquet"]),
]


@pytest.mark.parametrize("inputs,output_dir,tree_flag,expected", CASES)
def test_output_path_matrix(tree, inputs, output_dir, tree_flag, expected):
    ins, outs = get_output_paths(
        OutputPathSpec(
            inputs=inputs, output_dir=output_dir, tree=tree_flag, sort=True
        )
    )
    assert sorted(_rel(outs, ".")) == sorted(expected)
    assert len(ins) == len(outs)


def test_prefix_postfix(tree):
    _, outs = get_output_paths(
        OutputPathSpec(
            inputs=["root/data1"],
            output_dir="other_root",
            file_prefix="pre_",
            file_postfix="_post",
            sort=True,
        )
    )
    assert _rel(outs, ".") == [
        "other_root/pre_data1_a_post.parquet",
        "other_root/pre_data1_b_post.parquet",
    ]


def test_inplace_identity(tree):
    ins, outs = get_output_paths(OutputPathSpec(inputs=["root/data1"], sort=True))
    assert ins == outs  # no output_dir, no prefix -> in-place semantics


def test_duplicate_collision(tree):
    # two same-named files from different dirs into one output dir
    with pytest.raises(OutputPathError, match="Duplicate output path"):
        get_output_paths(
            OutputPathSpec(
                inputs=["root/data1/data1_a.parquet", "root/data1/data1_a.parquet"],
                output_dir="other_root",
            )
        )


def test_nontabular_skipped(tree):
    _, outs = get_output_paths(OutputPathSpec(inputs=["root/data1"]))
    assert all(o.endswith(".parquet") for o in outs)


def test_missing_input(tree):
    with pytest.raises(OutputPathError, match="does not exist"):
        get_output_paths(OutputPathSpec(inputs=["nope"]))


def test_common_prefix():
    assert get_common_prefix(["/a/b/c/x.parquet", "/a/b/d/y.parquet"]) == "/a/b"
    assert get_common_prefix(["/a/b/c"]) == "/a/b/c"


def test_convert_file_path():
    assert convert_file_path("/x/y/f.parquet", "/o") == "/o/f.parquet"
    assert (
        convert_file_path("/x/f.parquet", None, "p_", "_s") == "/x/p_f_s.parquet"
    )
