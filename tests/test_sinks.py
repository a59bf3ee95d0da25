"""Sink suite: csv/json writers, hex display encoding, schema-checked merge."""

import csv
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from tbl_ray.sinks.writers import (
    hex_encode_binary_columns,
    merge_files,
    write_csv,
    write_json,
    write_parquet_atomic,
)
from tbl_ray.sources.parquet import SchemaMismatch


@pytest.fixture()
def small_ds():
    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "blob": pa.array([b"\x00\xff", b"", None], pa.binary()),
            "name": ["a", "b", None],
        }
    )
    return ray.data.from_arrow(t), t


def test_hex_encode():
    t = pa.table({"b": pa.array([b"\x01\xab", None], pa.binary()), "x": [1, 2]})
    out = hex_encode_binary_columns(t)
    assert out.column("b").to_pylist() == ["0x01ab", None]
    assert out.schema.field("b").type == pa.string()
    assert out.column("x").to_pylist() == [1, 2]


def test_write_csv(small_ds, tmp_path):
    ds, t = small_ds
    path = str(tmp_path / "out.csv")
    write_csv(ds, path)
    with open(path) as fh:
        rows = list(csv.reader(fh))
    assert rows[0] == ["id", "blob", "name"]
    assert rows[1][1] == "0x00ff"  # binary hex-encoded (output.rs:97-128)


def test_write_jsonl(small_ds, tmp_path):
    ds, t = small_ds
    path = str(tmp_path / "out.jsonl")
    write_json(ds, path, lines=True)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 3
    assert lines[0]["blob"] == "0x00ff"
    assert lines[2]["name"] is None


def test_write_json_array(small_ds, tmp_path):
    ds, t = small_ds
    path = str(tmp_path / "out.json")
    write_json(ds, path, lines=False)
    data = json.load(open(path))
    assert isinstance(data, list) and len(data) == 3


def test_write_parquet_atomic_no_tmp_left(small_ds, tmp_path):
    ds, t = small_ds
    path = str(tmp_path / "out.parquet")
    write_parquet_atomic(ds, path)
    assert pq.read_table(path).num_rows == 3
    assert not os.path.exists(path + "_tmp")


def test_merge_files(tmp_path):
    a = pa.table({"x": [1, 2], "y": ["a", "b"]})
    b = pa.table({"x": [3], "y": ["c"]})
    pa_, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(a, pa_)
    pq.write_table(b, pb)
    out = str(tmp_path / "merged.parquet")
    merge_files([pa_, pb], out)
    m = pq.read_table(out)
    assert m.num_rows == 3
    assert m.column("x").to_pylist() == [1, 2, 3]  # sorted-path concat order


def test_merge_schema_mismatch(tmp_path):
    a = pa.table({"x": [1]})
    b = pa.table({"x": ["not an int"]})
    pa_, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(a, pa_)
    pq.write_table(b, pb)
    with pytest.raises(SchemaMismatch):
        merge_files([pa_, pb], str(tmp_path / "m.parquet"))


def test_write_jsonl_float_exact_roundtrip(tmp_path):
    """Floats must round-trip exactly (repr-faithful) — pandas to_json
    caps at 15 significant digits, so float batches take the exact path."""
    import ray.data

    vals = [0.1234567890123456789, 123456789.987654321, 1e-300, None]
    t = pa.table({"x": pa.array(vals, pa.float64()), "i": [1, 2, 3, 4]})
    path = str(tmp_path / "f.jsonl")
    write_json(ray.data.from_arrow(t), path, lines=True)
    got = [json.loads(l)["x"] for l in open(path)]
    assert got == [v for v in vals]
    ints = [json.loads(l)["i"] for l in open(path)]
    assert ints == [1, 2, 3, 4]


def test_write_json_timestamp_microseconds_and_path_consistency(
    ray_session, tmp_path
):
    """Both JSONL serialization paths (vectorized float-free, per-row
    float-bearing) must emit the SAME microsecond-exact timestamp text —
    pandas to_json alone would truncate to ms on one path only."""
    import datetime
    import json as _json

    import ray.data

    from tbl_ray.sinks.writers import write_json

    ts = [
        datetime.datetime(2020, 1, 1, 12, 30, 45, 123456),
        datetime.datetime(2021, 2, 3),
    ]
    a = str(tmp_path / "nofloat.jsonl")
    b = str(tmp_path / "float.jsonl")
    write_json(
        ray.data.from_arrow(
            pa.table({"ts": pa.array(ts, pa.timestamp("us")), "x": [1, 2]})
        ),
        a, lines=True,
    )
    write_json(
        ray.data.from_arrow(
            pa.table({"ts": pa.array(ts, pa.timestamp("us")), "x": [1.5, 2.5]})
        ),
        b, lines=True,
    )
    ta = [_json.loads(ln)["ts"] for ln in open(a)]
    tb = [_json.loads(ln)["ts"] for ln in open(b)]
    assert ta == tb == [
        "2020-01-01 12:30:45.123456", "2021-02-03 00:00:00.000000"
    ]


def test_write_json_tz_aware_keeps_offset(ray_session, tmp_path):
    """tz-aware timestamp columns must keep their UTC offset in JSON —
    bare strftime would render wall time and drop the zone, making the
    instant unrecoverable."""
    import datetime
    import json as _json

    import ray.data

    from tbl_ray.sinks.writers import write_json

    ts = [datetime.datetime(2021, 1, 2, 3, 4, 5, 123456)]
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us", tz="UTC")), "x": [1]})
    path = str(tmp_path / "tz.jsonl")
    write_json(ray.data.from_arrow(t), path, lines=True)
    got = _json.loads(open(path).read())["ts"]
    assert got == "2021-01-02 03:04:05.123456+0000"
    # the instant round-trips
    back = datetime.datetime.strptime(got, "%Y-%m-%d %H:%M:%S.%f%z")
    assert back == ts[0].replace(tzinfo=datetime.timezone.utc)
