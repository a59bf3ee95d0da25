"""Encoded-dir as a first-class transform input (sources/encoded.py + CLI)."""

import os
import subprocess
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tbl_ray.pipelines.encode_job import run_encode_job
from tbl_ray.sources.encoded import (
    encoded_schema_names,
    is_encoded_dir,
    read_encoded_for_spec,
)
from tbl_ray.transforms import TransformSpec, apply_transforms

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001/lineitem.parquet"


@pytest.fixture(scope="module")
def encoded_dir(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("encsrc")
    src = pq.read_table(SRC).sort_by("l_orderkey")
    shards = []
    step = (src.num_rows + 3) // 4
    for i in range(4):
        p = os.path.join(base, f"s{i}.parquet")
        pq.write_table(src.slice(i * step, step), p)
        shards.append(p)
    out = os.path.join(base, "enc")
    run_encode_job(shards, out)
    return src, str(out)


def test_is_encoded_dir(encoded_dir, tmp_path):
    _, out = encoded_dir
    assert is_encoded_dir(out)
    assert not is_encoded_dir(str(tmp_path))
    assert not is_encoded_dir(SRC)


def test_encoded_schema_names(encoded_dir):
    src, out = encoded_dir
    assert encoded_schema_names(out) == src.column_names


def test_read_encoded_for_spec_matches_parquet_path(encoded_dir):
    src, out = encoded_dir
    spec = TransformSpec(
        filter=["l_quantity>40", "l_returnflag=A"],
        select=["l_orderkey", "l_linenumber", "l_quantity"],
        sort=["l_orderkey", "l_linenumber"],
    )
    got = apply_transforms(read_encoded_for_spec(out, spec), spec).to_pandas()
    m = pc.and_(
        pc.greater(src.column("l_quantity"), 40),
        pc.equal(src.column("l_returnflag"), "A"),
    )
    exp = (
        src.filter(m)
        .select(["l_orderkey", "l_linenumber", "l_quantity"])
        .sort_by([("l_orderkey", "ascending"), ("l_linenumber", "ascending")])
        .to_pandas()
    )
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


def test_filter_on_created_column_not_pushed(encoded_dir):
    src, out = encoded_dir
    # flag exists only after --with-columns; the source must not try to
    # prune or mask on it (it would raise Column not found)
    spec = TransformSpec(
        with_columns=["flag:i64:=50"],
        filter=["flag<60", "l_quantity>45"],
    )
    got = apply_transforms(read_encoded_for_spec(out, spec), spec)
    n = got.count()
    exp = src.filter(pc.greater(src.column("l_quantity"), 45)).num_rows
    assert n == exp > 0


@pytest.mark.slow
def test_cli_encoded_dir_single_file(encoded_dir, tmp_path):
    src, out = encoded_dir
    dst = str(tmp_path / "out.parquet")
    r = subprocess.run(
        [
            sys.executable, "-m", "tbl_ray.cli", out,
            "--filter", "l_quantity>45",
            "--columns", "l_orderkey", "l_quantity",
            "--output-file", dst, "--confirm", "--no-summary",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env=dict(os.environ, RAY_ADDRESS="local"),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    back = pq.read_table(dst)
    exp = src.filter(pc.greater(src.column("l_quantity"), 45)).select(
        ["l_orderkey", "l_quantity"]
    )
    assert back.sort_by("l_orderkey").equals(exp.sort_by("l_orderkey"))


def test_cli_encoded_dir_rejects_directory_mode(encoded_dir, tmp_path):
    _, out = encoded_dir
    r = subprocess.run(
        [
            sys.executable, "-m", "tbl_ray.cli", out,
            "--output-dir", str(tmp_path / "d"), "--confirm",
        ],
        capture_output=True, text=True, timeout=240, cwd=REPO,
        env=dict(os.environ, RAY_ADDRESS="local"),
    )
    assert r.returncode != 0
    assert "encoded-dir input" in (r.stderr + r.stdout)


def test_cli_ls_and_schema_on_encoded_dir(encoded_dir):
    _, out = encoded_dir
    r = subprocess.run(
        [sys.executable, "-m", "tbl_ray.cli", "ls", out],
        capture_output=True, text=True, timeout=240, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "encoded partitions" in r.stdout and "rows" in r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "tbl_ray.cli", "schema", out],
        capture_output=True, text=True, timeout=240, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "l_orderkey" in r.stdout and "zone-map" in r.stdout
