"""Driver-contract conformance: every queries() entry runs; every
oracle_sql() entry matches the Ray result (row count + order-insensitive
value comparison at sf0.001 in-suite; the driver re-runs at sf0.01)."""

import os
import sys

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod  # noqa: E402


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        # normalize date representations: Arrow date32 -> datetime.date
        # objects, duckdb .df() -> datetime64[us]; the driver compares
        # Arrow-to-Arrow where both are date32 (verified), so the pandas
        # harness canonicalizes to ISO strings
        if str(df[c].dtype).startswith("datetime64"):
            all_midnight = (df[c].dt.time == pd.Timestamp(0).time()).all()
            fmt = "%Y-%m-%d" if all_midnight else "%Y-%m-%d %H:%M:%S"
            df[c] = df[c].dt.strftime(fmt)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(name, sf_dir):
    df = _to_pandas(QUERIES[name](sf_dir))
    assert df.shape[0] >= 0 and df.shape[1] >= 1


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, sf_dir, duck):
    got = _canon(_to_pandas(QUERIES[name](sf_dir)))
    want = _canon(duck.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False)


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) >= 1
    assert "codec" in df.columns


def test_worker_side_codec_probes_from_foreign_cwd(tmp_path):
    # regression (round 2): probe_fsst/bss_container_gain had runtime
    # `from tbl_ray...` imports; they execute inside Ray map workers and
    # crashed with ModuleNotFoundError when the driver ran from a cwd
    # without the repo on sys.path. Run a worker-probing encode from /tmp.
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = f"""
import ray, sys
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, {repo!r})
import numpy as np, pyarrow as pa, ray.data
from tbl_ray.stages.encode import encode_dataset, decode_dataset
rng = np.random.default_rng(0)
words = ["the quick brown fox", "compression engines", "ray data streams"]
t = pa.table({{
    "text": pa.array([" ".join(words[i % 3] for _ in range(40)) for i in range(2000)]),
    "score": pa.array(rng.normal(100.0, 3.0, 2000)),
}})
# no pre-planned decisions -> every actor probes (fsst for text, bss for
# the float column) INSIDE the worker
enc = encode_dataset(ray.data.from_arrow(t).repartition(4), batch_size=500, concurrency=2)
back = decode_dataset(enc)
assert back.count() == 2000
print("FOREIGN_CWD_PROBE_OK")
ray.shutdown()
"""
    r = subprocess.run(
        [_sys.executable, "-c", script],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=300,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "FOREIGN_CWD_PROBE_OK" in r.stdout
