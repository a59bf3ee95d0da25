"""CLI surface: output-mode router, data command end-to-end, ls/schema."""

import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from tbl_ray.cli import _build_parser, decide_output_mode

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINEITEM = "/root/testdata/sf0.001/lineitem.parquet"


def _mode(argv):
    return decide_output_mode(_build_parser().parse_args(argv))


def test_output_mode_router():
    assert _mode([LINEITEM]) == "stdout"
    assert _mode([LINEITEM, "--output-file", "/tmp/x.parquet"]) == "single_file"
    assert _mode([LINEITEM, "--output-dir", "/tmp/d"]) == "directory"
    assert _mode([LINEITEM, "--inplace"]) == "inplace"
    assert _mode([LINEITEM, "--partition", "lang"]) == "partition"
    assert _mode([LINEITEM, "--encode", "--output-dir", "/tmp/d"]) == "encode"
    with pytest.raises(SystemExit):
        _mode([LINEITEM, "--inplace", "--output-file", "/tmp/x.parquet"])


def _run_cli(args, timeout=600):
    # generous: each CLI run owns a fresh Ray session (~15-30s on a quiet
    # box) but the full suite time-shares 32 CPUs with other Ray sessions
    # — 240s has flaked once under full-suite contention
    return subprocess.run(
        [sys.executable, "-m", "tbl_ray.cli", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
        env=dict(os.environ, RAY_ADDRESS="local"),
    )


@pytest.mark.slow
def test_cli_single_file(tmp_path):
    out = str(tmp_path / "out.parquet")
    r = _run_cli(
        [LINEITEM, "--filter", "l_returnflag=A", "--columns", "l_orderkey",
         "l_returnflag", "--output-file", out, "--confirm"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    t = pq.read_table(out)
    assert t.schema.names == ["l_orderkey", "l_returnflag"]
    assert set(t.column("l_returnflag").to_pylist()) == {"A"}


@pytest.mark.slow
def test_cli_stdout_and_dry(tmp_path):
    r = _run_cli([LINEITEM, "--head", "5", "-n", "3"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "l_orderkey" in r.stdout
    assert "2 rows omitted" in r.stdout
    # dry never writes
    out = str(tmp_path / "never.parquet")
    r2 = _run_cli([LINEITEM, "--output-file", out, "--dry"])
    assert r2.returncode == 0 and not os.path.exists(out)
    # no --confirm refuses
    r3 = _run_cli([LINEITEM, "--output-file", out])
    assert r3.returncode == 0 and not os.path.exists(out)


@pytest.mark.slow
def test_cli_ls_and_schema():
    r = _run_cli(["ls", "/root/testdata/sf0.001"])
    assert r.returncode == 0 and "lineitem.parquet" in r.stdout
    assert "files," in r.stdout
    r2 = _run_cli(["schema", LINEITEM])
    assert r2.returncode == 0 and "schema group 0" in r2.stdout
    assert "l_orderkey" in r2.stdout


@pytest.mark.slow
def test_cli_output_dir(tmp_path):
    out_dir = str(tmp_path / "outd")
    r = _run_cli(
        ["/root/testdata/sf0.001/region.parquet",
         "/root/testdata/sf0.001/nation.parquet",
         "--drop", "n_comment" if False else "r_comment", "--output-dir", out_dir,
         "--output-postfix", "_v2", "--confirm"]
    )
    # r_comment only exists in region; drop on nation would fail -> use no drop
    if r.returncode != 0:
        r = _run_cli(
            ["/root/testdata/sf0.001/region.parquet",
             "/root/testdata/sf0.001/nation.parquet",
             "--output-dir", out_dir, "--output-postfix", "_v2", "--confirm"]
        )
    assert r.returncode == 0, r.stderr[-2000:]
    files = sorted(os.listdir(out_dir))
    assert files == ["nation_v2.parquet", "region_v2.parquet"]


def test_format_bytes():
    from tbl_ray.formats import format_bytes, format_with_commas

    # reference semantics (formats.rs:4): /1024 steps, 2 decimals
    assert format_bytes(0) == "0.00 B"
    assert format_bytes(1023) == "1023.00 B"
    assert format_bytes(1024) == "1.00 KB"
    assert format_bytes(1536) == "1.50 KB"
    assert format_bytes(5 * 1024**3) == "5.00 GB"
    assert format_bytes(1024**7) == "1024.00 EB"  # clamps at EB
    assert format_with_commas(1234567) == "1,234,567"
    assert format_with_commas(7) == "7"


def test_interactive_codegen():
    from tbl_ray.python_repl import interactive_code

    code = interactive_code(["/a.parquet", "/b.parquet"], lazy=True)
    assert "read_parquet(inputs)" in code and "'/a.parquet'" in code
    compile(code, "<repl>", "exec")  # generated code must be valid python
    code_df = interactive_code(["/a.parquet"], lazy=False)
    assert "to_pandas()" in code_df
    compile(code_df, "<repl>", "exec")


@pytest.mark.slow
def test_cli_encode_decode_roundtrip(tmp_path):
    enc_dir = str(tmp_path / "enc")
    r = _run_cli(
        ["/root/testdata/sf0.001/documents.parquet", "--encode",
         "--output-dir", enc_dir, "--confirm"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(enc_dir, "manifest.jsonl"))
    out_file = str(tmp_path / "decoded.parquet")
    r2 = _run_cli(
        ["--decode", "--output-dir", enc_dir, "--output-file", out_file,
         "--confirm"]
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    got = pq.read_table(out_file).sort_by("doc_id")
    want = pq.read_table("/root/testdata/sf0.001/documents.parquet").sort_by("doc_id")
    assert got.equals(want)


@pytest.mark.slow
def test_cli_partition_mode(tmp_path):
    out_dir = str(tmp_path / "parts")
    r = _run_cli(
        ["/root/testdata/sf0.001/orders.parquet", "--partition", "o_orderstatus",
         "--output-dir", out_dir, "--confirm"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    dirs = sorted(os.listdir(out_dir))
    assert any(d.startswith("o_orderstatus=") for d in dirs)
    total = 0
    for d in dirs:
        for f in os.listdir(os.path.join(out_dir, d)):
            total += pq.ParquetFile(os.path.join(out_dir, d, f)).metadata.num_rows
    assert total == 1500


@pytest.mark.slow
def test_cli_streaming_csv_json_match_collected(tmp_path):
    # csv / json / jsonl stdout now stream batch-wise; output must equal
    # the collected form (header once, valid JSON array, one obj per line)
    import json as _json

    import duckdb

    r = _run_cli([LINEITEM, "--head", "120", "--csv", "-n", "all"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l]
    assert lines[0].startswith("l_orderkey,")
    assert len(lines) == 121  # header + 120 rows
    assert sum(1 for l in lines if l.startswith("l_orderkey,")) == 1

    r2 = _run_cli([LINEITEM, "--head", "120", "--json"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    arr = _json.loads(r2.stdout)
    assert len(arr) == 120 and arr[0]["l_orderkey"] is not None

    r3 = _run_cli([LINEITEM, "--head", "120", "--jsonl"])
    assert r3.returncode == 0, r3.stderr[-2000:]
    objs = [_json.loads(l) for l in r3.stdout.splitlines() if l.strip()]
    assert len(objs) == 120
    want = duckdb.execute(
        f"SELECT l_orderkey FROM read_parquet('{LINEITEM}') LIMIT 120"
    ).fetchall()
    assert sorted(o["l_orderkey"] for o in objs) == sorted(w[0] for w in want)


@pytest.mark.slow
def test_ray_job_submit_entry_point(tmp_path):
    # the `ray job submit` script runs standalone from a foreign cwd,
    # encodes with manifest lineage, deep-verifies, and resumes on rerun
    import json as _json

    out = str(tmp_path / "jobout")
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "encode_job.py"),
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out, "--verify"],
        cwd="/tmp", capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = _json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["encoded"] == 1 and rep["verify"]["corrupt"] == 0
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "encode_job.py"),
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out],
        cwd="/tmp", capture_output=True, text=True, timeout=300, env=env,
    )
    rep2 = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert rep2["skipped"] == 1 and rep2["encoded"] == 0
