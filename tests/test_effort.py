"""Effort-policy tests: container-aware codec selection.

``balanced`` (the default) probes FSST-candidate columns through the zstd
container codec and pays FSST's CPU only when it shrinks the on-disk
footprint by >= 10%; ``ratio`` runs the same probe at its own container
level (zstd-12) — the old trust-the-codec-estimate definition was
measured strictly worse at ~1 MiB chunks; ``speed`` never considers
FSST. Decision stickiness (one probe per column per
cache) and lossless round-trips at every level are covered here.
"""

import numpy as np
import pyarrow as pa

from tbl_ray.codecs import decode_chunk, encode_auto
from tbl_ray.codecs.base import EncodedChunk
from tbl_ray.codecs.select import (
    choose_codec,
    default_effort,
    probe_fsst_container_gain,
)
from tbl_ray.stages.encode import ColumnEncoder, decode_table
from tbl_ray.webtable import generate_batch

rng = np.random.default_rng(7)


def _web_text(n=4000):
    return generate_batch(0, n, seed=42)["text"].combine_chunks()


def test_default_effort_is_balanced(monkeypatch):
    monkeypatch.delenv("TBL_RAY_CODEC_EFFORT", raising=False)
    assert default_effort() == "balanced"
    monkeypatch.setenv("TBL_RAY_CODEC_EFFORT", "ratio")
    assert default_effort() == "ratio"
    monkeypatch.setenv("TBL_RAY_CODEC_EFFORT", "bogus")
    assert default_effort() == "balanced"


def test_ratio_effort_probes_fsst_on_text():
    text = _web_text()
    # the stats-level estimate still proposes fsst...
    assert choose_codec(text, effort="ratio") == "fsst"
    # ...but ratio now verifies it against its container level (zstd-12),
    # where raw wins on natural-language web text (the container already
    # captures FSST's redundancy, and per-chunk symbol tables scramble
    # cross-document matches)
    chunk = encode_auto(text, effort="ratio")
    assert chunk.codec == "raw"


def test_ratio_container_level():
    from tbl_ray.codecs.select import container_zstd_level

    assert container_zstd_level("ratio") == 12
    assert container_zstd_level("balanced") == 2
    assert container_zstd_level("speed") == 2


def test_ratio_effort_on_disk_beats_balanced(tmp_path):
    # the point of effort="ratio" is the smallest container file; since
    # 2026-08-20 it must beat balanced on disk (it did NOT under the old
    # definition once chunks shrank to ~1 MiB)
    import os

    import pyarrow.parquet as pq

    from tbl_ray.pipelines.encode_job import run_encode_job

    t = generate_batch(0, 12000, seed=42)
    src = str(tmp_path / "src.parquet")
    pq.write_table(t, src, compression="snappy")
    sizes = {}
    for effort in ("balanced", "ratio"):
        out = str(tmp_path / effort)
        rep = run_encode_job([src], out, effort=effort, batch_rows=4096)
        sizes[effort] = rep["file_bytes"]
    assert sizes["ratio"] < sizes["balanced"], sizes
    assert sizes["ratio"] < os.path.getsize(src)


def test_speed_effort_never_picks_fsst():
    text = _web_text()
    assert choose_codec(text, effort="speed") != "fsst"
    chunk = encode_auto(text, effort="speed")
    assert chunk.codec != "fsst"


def test_balanced_probe_rejects_zstd_redundant_text():
    # natural-language web text: zstd-6 already captures FSST's gains
    # (measured ~5-8% container savings, under the 10% bar) -> raw
    text = _web_text()
    chunk = encode_auto(text, effort="balanced")
    assert chunk.codec == "raw"
    back = decode_chunk(EncodedChunk.from_payload(chunk.to_payload()))
    assert back.equals(text)


def test_probe_savings_negative_on_high_entropy():
    blobs = pa.array([rng.bytes(48) for _ in range(4000)], type=pa.binary())
    savings, symbols = probe_fsst_container_gain(blobs)
    assert savings < 0.10
    assert isinstance(symbols, list)


def test_decision_cache_sticky():
    text = _web_text()
    cache: dict[str, str] = {}
    c1 = encode_auto(text, name="text", effort="balanced", decision_cache=cache)
    assert cache == {"text": c1.codec}
    # poison the cache: the second call must follow it, not re-probe
    cache["text"] = "fsst"
    c2 = encode_auto(text, name="text", effort="balanced", decision_cache=cache)
    assert c2.codec == "fsst"


def test_column_encoder_effort_roundtrip():
    table = generate_batch(0, 2000, seed=42)
    for effort in ("ratio", "balanced", "speed"):
        enc = ColumnEncoder(effort=effort)
        out = enc.encode_table(table)
        back = decode_table(out)
        assert back.select(table.column_names).cast(table.schema).equals(table)


def test_plan_codec_decisions_majority(tmp_path):
    import pyarrow.parquet as pq

    from tbl_ray.pipelines.encode_job import plan_codec_decisions

    paths = []
    for i in range(3):
        t = generate_batch(i * 2000, 2000, seed=42)
        p = str(tmp_path / f"s{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    decisions = plan_codec_decisions(paths, effort="balanced")
    assert set(decisions) == {"url", "warc_ts", "html", "text", "lang"}
    assert decisions["lang"] in ("dict", "rle")
    # forced columns are excluded from planning
    d2 = plan_codec_decisions(paths, codecs={"lang": "raw"}, effort="balanced")
    assert "lang" not in d2


def test_column_encoder_shared_decisions():
    table = generate_batch(0, 2000, seed=42)
    shared: dict[str, str] = {}
    ColumnEncoder(effort="balanced", decisions=shared).encode_table(table)
    first = dict(shared)
    assert first  # every auto column decided
    # a second encoder instance sharing the dict must not change decisions
    ColumnEncoder(effort="balanced", decisions=shared).encode_table(table)
    assert shared == first
