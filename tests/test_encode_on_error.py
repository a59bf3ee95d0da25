"""Poison-pill containment in the encode job (on_error='skip')."""

import json
import os

import pyarrow.parquet as pq
import pytest

from tbl_ray.pipelines.encode_job import (
    SUCCESS,
    decode_job_output,
    run_encode_job,
)

SRC = "/root/testdata/sf0.001/lineitem.parquet"


def _shards(tmp_path, k=3):
    src = pq.read_table(SRC)
    step = (src.num_rows + k - 1) // k
    paths = []
    for i in range(k):
        p = str(tmp_path / f"s{i}.parquet")
        pq.write_table(src.slice(i * step, step), p)
        paths.append(p)
    return src, paths


def test_default_raises_on_corrupt_file(ray_session, tmp_path):
    src, paths = _shards(tmp_path)
    with open(paths[1], "wb") as fh:
        fh.write(b"not a parquet file")
    with pytest.raises(Exception):
        run_encode_job(paths, str(tmp_path / "enc"))


def test_skip_mode_contains_corrupt_file_and_resume_heals(
    ray_session, tmp_path
):
    src, paths = _shards(tmp_path)
    good_rows = src.num_rows - pq.ParquetFile(paths[1]).metadata.num_rows
    orig = open(paths[1], "rb").read()
    with open(paths[1], "wb") as fh:
        fh.write(b"not a parquet file")

    out = str(tmp_path / "enc")
    rep = run_encode_job(paths, out, on_error="skip")
    assert rep["failed"] == 1
    assert rep["encoded"] == 2
    assert rep["failed_partitions"][0]["input_path"] == paths[1]
    assert "error" in rep["failed_partitions"][0]
    # partial job: no _SUCCESS marker
    assert not os.path.exists(os.path.join(out, SUCCESS))
    # the good partitions decode fine
    assert decode_job_output(out).count() == good_rows

    # fix the input; resume retries exactly the failed file
    with open(paths[1], "wb") as fh:
        fh.write(orig)
    rep2 = run_encode_job(paths, out, on_error="skip")
    assert rep2["failed"] == 0
    assert rep2["skipped"] == 2 and rep2["encoded"] == 1
    assert os.path.exists(os.path.join(out, SUCCESS))
    assert decode_job_output(out).count() == src.num_rows


def test_skip_mode_records_partition_level_failure(ray_session, tmp_path):
    """A file whose FOOTER parses but whose data pages are corrupt fails
    at encode time (not planning); the failure record lands in the
    manifest and never verifies on resume."""
    src, paths = _shards(tmp_path)
    raw = bytearray(open(paths[2], "rb").read())
    # corrupt data pages mid-file; footer (tail) stays intact
    start = len(raw) // 4
    raw[start : start + 256] = b"\x00" * 256
    with open(paths[2], "wb") as fh:
        fh.write(bytes(raw))

    out = str(tmp_path / "enc")
    rep = run_encode_job(paths, out, on_error="skip")
    if rep["failed"] == 0:
        pytest.skip("corruption not detected by this reader version")
    entries = [
        json.loads(ln)
        for ln in open(os.path.join(out, "manifest.jsonl"))
        if ln.strip()
    ]
    failed = [e for e in entries if e.get("error")]
    assert failed and failed[0]["input_path"] == paths[2]
    assert not os.path.exists(os.path.join(out, SUCCESS))


def test_on_error_validated():
    with pytest.raises(ValueError):
        run_encode_job([SRC], "/tmp/never", on_error="ignore")


def test_plan_cache_keys_on_error_policy(ray_session, tmp_path):
    """A plan computed under on_error='skip' must never be served to a
    job requesting on_error='raise' (and vice versa): the cache key
    carries the policy. Regression: the skip-derived plan tolerated the
    corrupt shard, so a later raise-mode job cache-hit it and proceeded
    instead of raising."""
    src, paths = _shards(tmp_path)
    with open(paths[1], "wb") as fh:
        fh.write(b"not a parquet file")
    from tbl_ray.pipelines.encode_job import warm_plan_cache

    warm_plan_cache(paths, on_error="skip")  # caches the skip plan
    with pytest.raises(Exception):
        run_encode_job(paths, str(tmp_path / "enc"))  # raise-mode job
