"""Manifest-resume suite (SURVEY.md §5.4): interrupted runs resume exactly."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tbl_ray.pipelines.encode_job import (
    MANIFEST,
    SUCCESS,
    decode_job_output,
    load_manifest,
    plan_partitions,
    run_encode_job,
)
from tbl_ray.webtable import generate_batch, write_webtable


@pytest.fixture(scope="module")
def web_shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("webshards")
    paths = write_webtable(str(d), 12000, seed=42, batch_rows=2000, files=3)
    return paths


def test_plan_partitions_deterministic(web_shards, tmp_path):
    a = plan_partitions(web_shards, str(tmp_path), max_rows_per_partition=3000)
    b = plan_partitions(web_shards, str(tmp_path), max_rows_per_partition=3000)
    assert a == b
    assert sum(p.num_rows for p in a) == 12000
    assert len({p.partition_id for p in a}) == len(a)


def test_job_roundtrip_and_footprint(web_shards, tmp_path):
    out = str(tmp_path / "enc")
    report = run_encode_job(web_shards, out, batch_rows=2000)
    assert report["encoded"] == report["partitions"] > 0
    assert report["num_rows"] == 12000
    assert os.path.exists(os.path.join(out, SUCCESS))
    assert len(load_manifest(out)) == report["partitions"]

    got = pa.Table.from_pylist(decode_job_output(out, concurrency=2).take_all())
    want = pa.concat_tables([pq.read_table(p) for p in web_shards])
    got = got.sort_by("url")
    want = want.sort_by("url")
    for name in want.schema.names:
        assert got.column(name).combine_chunks().equals(
            want.column(name).combine_chunks()
        ), name

    snappy_bytes = sum(os.path.getsize(p) for p in web_shards)
    assert report["file_bytes"] <= snappy_bytes, (
        f"encoded {report['file_bytes']} > reference snappy {snappy_bytes}"
    )


def test_job_ratio_effort_roundtrip(web_shards, tmp_path):
    # effort="ratio" = smallest container file (zstd-12, probed codecs);
    # the FSST codec-level path is exercised via forced codecs below
    out = str(tmp_path / "enc_ratio")
    report = run_encode_job(web_shards, out, batch_rows=2000, effort="ratio")
    bal = run_encode_job(
        web_shards, str(tmp_path / "enc_bal"), batch_rows=2000
    )
    assert report["file_bytes"] < bal["file_bytes"], (
        report["file_bytes"], bal["file_bytes"],
    )
    got = pa.Table.from_pylist(decode_job_output(out, concurrency=2).take_all())
    want = pa.concat_tables([pq.read_table(p) for p in web_shards])
    assert got.sort_by("url").select(want.schema.names).cast(want.schema).equals(
        want.sort_by("url")
    )


def test_job_resume_skips_verified(web_shards, tmp_path):
    out = str(tmp_path / "enc")
    r1 = run_encode_job(web_shards, out, batch_rows=2000)
    r2 = run_encode_job(web_shards, out, batch_rows=2000)
    assert r2["encoded"] == 0
    assert r2["skipped"] == r1["partitions"]
    assert r2["num_rows"] == r1["num_rows"]
    assert r2["file_bytes"] == r1["file_bytes"]


def test_job_resume_after_partial_failure(web_shards, tmp_path):
    out = str(tmp_path / "enc")
    clean = run_encode_job(web_shards, out, batch_rows=2000)
    manifest = load_manifest(out)
    # simulate a crash: one output vanished, one truncated mid-write
    victims = sorted(manifest)[:2]
    os.remove(manifest[victims[0]]["out_path"])
    with open(manifest[victims[1]]["out_path"], "wb") as fh:
        fh.write(b"partial")
    mtimes = {
        pid: os.path.getmtime(e["out_path"])
        for pid, e in manifest.items()
        if pid not in victims
    }

    r = run_encode_job(web_shards, out, batch_rows=2000)
    assert r["encoded"] == 2 and r["skipped"] == clean["partitions"] - 2
    # untouched partitions were not rewritten
    for pid, mt in mtimes.items():
        assert os.path.getmtime(manifest[pid]["out_path"]) == mt
    # final state identical to a clean run
    assert r["num_rows"] == clean["num_rows"]
    got = pa.Table.from_pylist(decode_job_output(out, concurrency=2).take_all())
    want = pa.concat_tables([pq.read_table(p) for p in web_shards])
    assert got.sort_by("url").column("text").combine_chunks().equals(
        want.sort_by("url").column("text").combine_chunks()
    )


def test_manifest_lineage_fields(web_shards, tmp_path):
    out = str(tmp_path / "enc")
    run_encode_job(web_shards, out, batch_rows=2000)
    entry = next(iter(load_manifest(out).values()))
    for key in (
        "partition_id input_path row_groups num_rows input_bytes "
        "encoded_bytes file_bytes sha256 codecs out_path wall_s"
    ).split():
        assert key in entry, key
    assert entry["codecs"]  # per-column codec usage recorded


def test_adaptive_batch_rows(tmp_path):
    """Wide binary rows shrink the chunk row budget (footer-only estimate)."""
    import numpy as np

    from tbl_ray.pipelines.encode_job import _adaptive_batch_rows

    rng = np.random.default_rng(0)
    wide = pa.table({"blob": [rng.bytes(1 << 20) for _ in range(32)]})
    p = str(tmp_path / "wide.parquet")
    pq.write_table(wide, p)
    rows = _adaptive_batch_rows(pq.ParquetFile(p), 65536)
    assert rows <= 256  # 1 MB rows -> 64 MB budget -> 64 rows, floor 256
    narrow = pa.table({"x": list(range(10000))})
    p2 = str(tmp_path / "narrow.parquet")
    pq.write_table(narrow, p2)
    assert _adaptive_batch_rows(pq.ParquetFile(p2), 65536) == 65536


def test_state_package_reexports():
    from tbl_ray.state import MANIFEST, PartitionSpec, load_manifest

    assert MANIFEST == "manifest.jsonl"


def test_multi_rowgroup_file_splits_into_partitions(tmp_path):
    """A single large file with many row groups splits into several
    partitions, each encodable and resumable independently."""
    from tbl_ray.pipelines.encode_job import run_encode_job
    from tbl_ray.webtable import generate_batch

    src = str(tmp_path / "big.parquet")
    t = generate_batch(0, 8000, seed=9)
    pq.write_table(t, src, row_group_size=1000)
    assert pq.ParquetFile(src).metadata.num_row_groups == 8

    out = str(tmp_path / "enc")
    report = run_encode_job([src], out, batch_rows=1000,
                            max_rows_per_partition=2000)
    assert report["partitions"] == 4  # 8 rgs x 1000 rows / 2000 budget
    assert report["num_rows"] == 8000

    from tbl_ray.pipelines.encode_job import decode_job_output

    got = pa.Table.from_pylist(decode_job_output(out).take_all()).sort_by("url")
    want = t.sort_by("url")
    assert got.column("text").combine_chunks().equals(
        want.column("text").combine_chunks()
    )


def test_manifest_tolerates_torn_line(web_shards, tmp_path):
    """A crash mid-append leaves a partial JSON line; resume must skip it
    and re-encode only that partition."""
    out = str(tmp_path / "enc")
    clean = run_encode_job(web_shards, out, batch_rows=2000)
    mpath = os.path.join(out, MANIFEST)
    lines = open(mpath).read().splitlines()
    victim = json.loads(lines[-1])
    os.remove(victim["out_path"])
    with open(mpath, "w") as fh:
        fh.write("\n".join(lines[:-1]) + "\n" + lines[-1][: len(lines[-1]) // 2])
    r = run_encode_job(web_shards, out, batch_rows=2000)
    assert r["encoded"] == 1 and r["skipped"] == clean["partitions"] - 1
    assert r["num_rows"] == clean["num_rows"]


def test_embeddings_nested_list_roundtrip(tmp_path):
    """list<float> columns pass through the raw codec losslessly."""
    src = "/root/testdata/sf0.001/embeddings.parquet"
    out = str(tmp_path / "emb_enc")
    r = run_encode_job([src], out)
    assert r["num_rows"] == pq.ParquetFile(src).metadata.num_rows
    # preserve exact Arrow types (to_pylist would re-infer float32 -> float64)
    batches = list(
        decode_job_output(out).iter_batches(batch_format="pyarrow", batch_size=10**6)
    )
    got = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b]) for b in batches]
    ).sort_by("vec_id")
    want = pq.read_table(src).sort_by("vec_id")
    assert got.schema.equals(want.schema)
    for n in want.schema.names:
        assert got.column(n).combine_chunks().equals(
            want.column(n).combine_chunks()
        ), n


def test_kill_process_resume(web_shards, tmp_path):
    """Hard-kill an encode job mid-run (SIGKILL), rerun, final state equals
    a clean run (SURVEY.md §5.4)."""
    import subprocess
    import sys
    import time as _time

    out = str(tmp_path / "entombed")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = f"""
import ray, sys
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
sys.path.insert(0, {repo!r})
from tbl_ray.pipelines.encode_job import run_encode_job
run_encode_job({web_shards!r}, {out!r}, batch_rows=500, max_rows_per_partition=1000)
"""
    proc = subprocess.Popen([sys.executable, "-c", script])
    # let it finish some (but not all) partitions, then kill -9
    deadline = _time.time() + 60
    while _time.time() < deadline:
        done = len(load_manifest(out)) if os.path.exists(out) else 0
        if done >= 2:
            break
        _time.sleep(0.25)
    proc.kill()
    proc.wait()
    partial = len(load_manifest(out))
    assert partial >= 1, "job never wrote a manifest entry before the kill"

    r = run_encode_job(web_shards, out, batch_rows=500, max_rows_per_partition=1000)
    assert r["skipped"] >= 1  # verified pre-kill work was not redone
    assert r["num_rows"] == 12000
    got = pa.Table.from_pylist(decode_job_output(out).take_all())
    want = pa.concat_tables([pq.read_table(p) for p in web_shards])
    assert got.sort_by("url").column("text").combine_chunks().equals(
        want.sort_by("url").column("text").combine_chunks()
    )


def test_verify_job_detects_corruption(web_shards, tmp_path):
    from tbl_ray.pipelines.encode_job import verify_job

    out = str(tmp_path / "enc")
    run_encode_job(web_shards, out, batch_rows=2000)
    v = verify_job(out)
    assert v["verified"] > 0 and not v["missing"] and not v["corrupt"]
    # silent corruption (same size, flipped bytes) is caught by the sha
    victim = next(iter(load_manifest(out).values()))
    data = bytearray(open(victim["out_path"], "rb").read())
    data[len(data) // 2] ^= 0xFF
    open(victim["out_path"], "wb").write(bytes(data))
    v2 = verify_job(out)
    assert victim["partition_id"] in v2["corrupt"]


def test_zero_row_partition_writes_empty_container(tmp_path):
    # a parquet file whose only row group has 0 rows must not fail the job
    # (round-2 ADVICE, low: writer stayed None -> os.replace on missing tmp)
    src = str(tmp_path / "empty.parquet")
    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    pq.write_table(schema.empty_table(), src)
    out = str(tmp_path / "enc")
    report = run_encode_job([src], out)
    assert report["encoded"] == report["partitions"] == 1
    assert report["num_rows"] == 0
    # output file exists, is valid parquet, and resume sees it as done
    m = load_manifest(out)
    assert len(m) == 1
    e = next(iter(m.values()))
    assert os.path.exists(e["out_path"])
    assert pq.read_table(e["out_path"]).num_rows == 0
    report2 = run_encode_job([src], out)
    assert report2["skipped"] == 1 and report2["encoded"] == 0


def test_job_survives_planned_bitpack_on_late_negatives(tmp_path):
    # end-to-end ADVICE scenario: the driver plans codecs from early
    # samples; a later chunk with negatives must not fail the partition
    import numpy as np

    src = str(tmp_path / "late_neg.parquet")
    w = pq.ParquetWriter(src, pa.schema([("v", pa.int64()), ("s", pa.string())]))
    # row group 1: non-negative sample (planner picks bitpack-family)
    w.write_table(pa.table({"v": np.arange(5000), "s": ["x"] * 5000}))
    # row group 2: negatives appear
    w.write_table(pa.table({"v": np.arange(-5000, 0), "s": ["y"] * 5000}))
    w.close()
    out = str(tmp_path / "enc")
    report = run_encode_job([src], out, batch_rows=5000)
    assert report["encoded"] >= 1
    back = decode_job_output(out)
    vals = sorted(r["v"] for r in back.take_all())
    assert vals[0] == -5000 and vals[-1] == 4999 and len(vals) == 10000


def test_planned_fsst_symbols_skip_retraining_and_stay_deterministic(
    web_shards, tmp_path, monkeypatch
):
    """The driver plans each FSST column's symbol table once
    (plan_fsst_symbols); workers seeded with the plan never retrain, the
    reused table round-trips bit-identically, and partition bytes are
    deterministic across attempts (the tmp-rename race invariant)."""
    import tbl_ray.codecs.fsst as fsst_mod
    from tbl_ray.pipelines.encode_job import (
        encode_partition,
        plan_codec_decisions,
        plan_fsst_symbols,
    )

    # force FSST for text: no effort level picks it for web text anymore
    # (the container captures its redundancy), but users can force it and
    # the symbol-planning invariants must hold for them
    decisions = {
        **plan_codec_decisions(web_shards, codecs={"text": "fsst"}),
        "text": "fsst",
    }
    symbols = plan_fsst_symbols(web_shards, decisions)
    fsst_cols = [c for c, codec in decisions.items() if codec == "fsst"]
    assert fsst_cols and set(symbols) == set(fsst_cols)

    calls = {"n": 0}
    real_train = fsst_mod.train_symbols

    def counting_train(sample):
        calls["n"] += 1
        return real_train(sample)

    monkeypatch.setattr(fsst_mod, "train_symbols", counting_train)

    specs = plan_partitions(
        web_shards, str(tmp_path / "enc"), max_rows_per_partition=3000
    )
    assert len(specs) >= 2
    os.makedirs(str(tmp_path / "enc"), exist_ok=True)
    e1 = encode_partition(
        specs[0], effort="ratio", decisions=decisions,
        fsst_symbols=symbols, batch_rows=1000,
    )
    e2 = encode_partition(
        specs[1], effort="ratio", decisions=decisions,
        fsst_symbols=symbols, batch_rows=1000,
    )
    assert calls["n"] == 0, "planned columns must never retrain in workers"
    assert e1["num_rows"] + e2["num_rows"] == (
        specs[0].num_rows + specs[1].num_rows
    )

    # deterministic bytes: a second attempt at the same partition with the
    # same plan produces the identical file (sha256 from the manifest entry)
    e2b = encode_partition(
        specs[1], effort="ratio", decisions=decisions,
        fsst_symbols=symbols, batch_rows=1000,
    )
    assert e2b["sha256"] == e2["sha256"]

    # the reused table must still round-trip bit-identically
    from tbl_ray.stages.encode import decode_table

    dec = decode_table(pq.read_table(specs[1].out_path))
    src = pq.ParquetFile(specs[1].input_path)
    want = pa.Table.from_batches(
        [b for b in src.iter_batches(batch_size=10**9,
                                     row_groups=list(specs[1].row_groups))]
    )
    assert dec.sort_by("url").cast(want.schema).equals(want.sort_by("url"))


def test_resume_plan_is_pure_function_of_input_set(ray_session, tmp_path):
    """A mid-job resume must encode retried/remaining partitions to the
    SAME bytes a clean full run produces: the codec/FSST plan derives
    from the sorted FULL input set, never the pending subset (and the
    plan cache is keyed by input-set identity, so a warm driver that
    just encoded a same-schema dataset cannot leak its symbol tables)."""
    import json

    from tbl_ray.pipelines import encode_job as ej
    from tbl_ray.webtable import generate_batch

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(generate_batch(0, 3000, seed=21), a)
    pq.write_table(generate_batch(3000, 3000, seed=21), b)

    def shas(out):
        return {
            e["partition_id"]: e["sha256"]
            for e in (
                json.loads(ln)
                for ln in open(os.path.join(out, "manifest.jsonl"))
                if ln.strip()
            )
            if not e.get("error")
        }

    clean = str(tmp_path / "clean")
    ej._PLAN_CACHE.clear()
    run_encode_job([a, b], clean)
    want = shas(clean)

    resumed = str(tmp_path / "resumed")
    ej._PLAN_CACHE.clear()
    run_encode_job([a], resumed)          # partial ingest: plan over [a]
    ej._PLAN_CACHE.clear()                # fresh driver for the resume
    run_encode_job([a, b], resumed, resume=True)
    got = shas(resumed)

    # b's partitions (encoded by the RESUME, pending=[b]) must be
    # byte-identical to the clean run's
    b_parts = [p for p in want if p.startswith("b.")]
    assert b_parts
    for p in b_parts:
        assert got[p] == want[p]


def test_warm_plan_cache_is_hit_by_the_job(ray_session, tmp_path, monkeypatch):
    """warm_plan_cache(paths) must prime the exact key run_encode_job
    looks up, so a benchmark's untimed warmup keeps the one-time
    driver-side planning pass out of the timed window (a ~1 s
    parallelism-independent cost that corrupts N-vs-4N scaling ratios
    if re-paid per timed run). Also pins that warming a different
    input SUBSET does NOT satisfy the full-set key — that near-miss is
    what put planning back into round-4's timed scaling legs."""
    import tbl_ray.pipelines.encode_job as ej
    from tbl_ray.webtable import generate_batch

    paths = []
    for i in range(3):
        p = str(tmp_path / f"s{i}.parquet")
        pq.write_table(generate_batch(i * 200, 200, seed=5), p)
        paths.append(p)

    calls = []
    real = ej.plan_codec_decisions

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(ej, "plan_codec_decisions", counting)

    ej._PLAN_CACHE.clear()
    ej.warm_plan_cache(paths[:1])  # subset plan: a DIFFERENT key
    ej.warm_plan_cache(paths)
    assert len(calls) == 2
    out = str(tmp_path / "out")
    ej.run_encode_job(paths, out)  # must cache-hit the full-set plan
    assert len(calls) == 2
