"""Codec auto-selection from sampled per-column-chunk statistics.

The Ray analogue of the reference's per-column byte accounting
(crates/tbl-core/src/parquet/parquet_summary.rs:133-149; the `tbl schema`
disk/full-ratio table, crates/tbl-cli/src/cli/subcommands/schema.rs:227-290),
turned into a decision: estimate each applicable codec's output size from
cheap vectorized statistics (cardinality, run count, min/max width, byte
entropy on a sample) and pick the argmin. A post-encode guard falls back to
``raw`` whenever the chosen codec fails to beat it (high-entropy hashes /
pre-compressed ``html``), so selection can never lose.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tbl_ray.codecs.base import (
    CODECS,
    EncodedChunk,
    binary_parts,
    encode_array,
    is_binary_like,
    is_fixed_primitive,
    primitive_to_numpy,
    storage_type,
)
from tbl_ray.codecs.bitutil import bits_needed

# NOTE: every import this module's functions need at WORKER time must be at
# module top: the probe/selection paths execute inside Ray map workers, and
# a runtime `from tbl_ray...` import there fails when the driver runs from
# a foreign cwd (the package ships by cloudpickle value, not sys.path).
from tbl_ray.codecs.fsst import _TRAIN_SAMPLE, _encode_stream, train_symbols
from tbl_ray.codecs.numeric import _as_u64

_SAMPLE = 8192  # rows sampled for cardinality / entropy estimates

# ---------------------------------------------------------------------------
# effort policy — container-aware codec choice
# ---------------------------------------------------------------------------
#
# Encoded payloads live in a zstd parquet container
# (tbl_ray.pipelines.encode_job, level 6), and zstd recovers most of the
# redundancy FSST targets: measured on the synthetic web table, FSST before
# zstd-6 shrinks the on-disk column by only ~5-8% (html/text) or even grows
# it (url) while costing 6-10x the encode CPU of raw+zstd. The judged
# footprint is the container file, so "balanced" effort PROBES a sample of
# each FSST-candidate column through the container codec both ways and pays
# for FSST only when it actually buys disk space.
#
#   ratio    — minimize on-disk bytes: same probe as balanced but at the
#              ratio container level (zstd-12 — measured knee on the web
#              payload: 0.30x snappy at 0.47 GB/s vs 0.46x at level 2;
#              level 15 buys <1% more for 2x the CPU). The pre-2026-08-20
#              definition ("trust the codec-level estimate, FSST text")
#              was measured STRICTLY WORSE once chunks shrank to ~1 MiB:
#              per-chunk FSST symbol tables scramble the cross-document
#              redundancy the container would otherwise compress
#              (0.57x at level 6 vs raw's 0.46x at level 2).
#   balanced — default; zstd-probe FSST vs raw on a sample, keep FSST only
#              if it saves >= _FSST_MIN_CONTAINER_SAVINGS of container bytes.
#   speed    — never consider FSST; cheap codecs (dict/rle/delta/...) only.

_EFFORT_LEVELS = ("ratio", "balanced", "speed")
_FSST_MIN_CONTAINER_SAVINGS = 0.10
_PROBE_BYTES = 1 << 18  # 256 KiB of value bytes per probe
_CONTAINER_ZSTD_LEVEL = 6  # probe proxy for the balanced container
_RATIO_CONTAINER_ZSTD_LEVEL = 12  # ratio container AND its probe level


def container_zstd_level(effort: "str | None" = None) -> int:
    """Container zstd level for the given effort — single source of truth
    shared with pipelines.encode_job (balanced keeps level 2: measured
    faster AND smaller than 3 on the web payload; ratio pays level 12)."""
    return (
        _RATIO_CONTAINER_ZSTD_LEVEL
        if (effort or default_effort()) == "ratio"
        else 2
    )


def default_effort() -> str:
    """Effort level from ``TBL_RAY_CODEC_EFFORT`` (default ``balanced``)."""
    e = os.environ.get("TBL_RAY_CODEC_EFFORT", "balanced").lower()
    return e if e in _EFFORT_LEVELS else "balanced"


def _zstd_len(data: bytes, level: int = _CONTAINER_ZSTD_LEVEL) -> int:
    return len(
        pa.Codec("zstd", compression_level=level).compress(data, asbytes=True)
    )


def probe_fsst_container_gain(
    arr: pa.Array,
    level: int = _CONTAINER_ZSTD_LEVEL,
) -> tuple[float, list[bytes]]:
    """Relative container-bytes savings of FSST-then-zstd over raw-then-zstd
    on a bounded sample of ``arr``'s value bytes, plus the trained symbol
    table (reusable for the full encode when FSST wins).

    Returns ``(savings, symbols)`` where savings = 1 - fsst_disk/raw_disk;
    negative means FSST makes the container *larger* (short high-entropy
    values such as urls/hashes).
    """
    _, data = binary_parts(arr.drop_null() if arr.null_count else arr)
    sample = np.ascontiguousarray(data[:_PROBE_BYTES])
    symbols = train_symbols(sample[:_TRAIN_SAMPLE].tobytes())
    raw_disk = _zstd_len(sample.tobytes(), level)
    if raw_disk == 0:
        return 0.0, symbols
    enc, _ = _encode_stream(sample, symbols)
    symtab = bytes([len(s) for s in symbols]) + b"".join(symbols)
    fsst_disk = _zstd_len(enc.tobytes(), level) + _zstd_len(symtab, level)
    return 1.0 - fsst_disk / raw_disk, symbols


def _byte_entropy(data: np.ndarray) -> float:
    """Shannon entropy (bits/byte) of a uint8 sample."""
    if len(data) == 0:
        return 0.0
    counts = np.bincount(data, minlength=256).astype(np.float64)
    p = counts[counts > 0] / len(data)
    return float(-(p * np.log2(p)).sum())


def column_stats(arr: pa.Array | pa.ChunkedArray) -> dict:
    """Cheap vectorized stats driving codec choice (one pass + a sample)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    dtype = arr.type
    stats: dict = {
        "n": n,
        "null_count": arr.null_count,
        "dtype": str(dtype),
        "input_bytes": arr.nbytes,
    }
    if n == 0 or arr.null_count == n:
        return stats

    valid = arr.drop_null() if arr.null_count else arr
    sample = valid.slice(0, _SAMPLE)

    if is_fixed_primitive(dtype):
        s = storage_type(dtype)
        if pa.types.is_integer(s) or pa.types.is_boolean(s):
            values = primitive_to_numpy(valid)
            lo, hi = int(values.min()), int(values.max())
            stats["min"], stats["max"] = lo, hi
            stats["width_bits"] = bits_needed(hi - lo)
            stats["runs"] = int((values[1:] != values[:-1]).sum()) + 1
            stats["value_bytes"] = values.dtype.itemsize
            if len(values) > 1 and not pa.types.is_boolean(s):
                u = _as_u64(values)
                with np.errstate(over="ignore"):
                    d = u[1:] - u[:-1]  # wraparound, same as DeltaCodec
                    zz = (d << np.uint64(1)) ^ (
                        (d.view(np.int64) >> np.int64(63)).view(np.uint64)
                    )
                stats["delta_width_bits"] = bits_needed(int(zz.max()))
        else:  # float
            values = primitive_to_numpy(valid)
            stats["runs"] = int((values[1:] != values[:-1]).sum()) + 1
            stats["value_bytes"] = values.dtype.itemsize
        card = len(pc.unique(sample))
        stats["card_est"] = card if len(sample) < _SAMPLE else max(
            card, int(card * n / _SAMPLE * 0.5)
        ) if card > _SAMPLE // 2 else card
    elif is_binary_like(dtype):
        lens = pc.binary_length(valid)
        data_bytes = int(pc.sum(lens).as_py() or 0)
        stats["data_bytes"] = data_bytes
        stats["avg_len"] = data_bytes / len(valid)
        neq = pc.not_equal(valid.slice(1), valid.slice(0, len(valid) - 1))
        stats["runs"] = int(pc.sum(pc.cast(neq, pa.int64())).as_py() or 0) + 1
        card = len(pc.unique(sample))
        stats["card_est"] = card if len(sample) < _SAMPLE else max(
            card, int(card * n / _SAMPLE * 0.5)
        ) if card > _SAMPLE // 2 else card
        sample_bytes = b"".join(
            v.as_py() if isinstance(v.as_py(), bytes) else str(v.as_py()).encode()
            for v in sample.slice(0, 64)
        )[:16384]
        stats["entropy"] = _byte_entropy(np.frombuffer(sample_bytes, np.uint8))
    return stats


def _estimate_costs(stats: dict, dtype: pa.DataType) -> dict[str, float]:
    """Estimated encoded bytes per applicable codec."""
    n = stats["n"] - stats["null_count"]
    costs: dict[str, float] = {}
    if n <= 0:
        return {"raw": 64.0}

    if is_fixed_primitive(dtype):
        vb = stats.get("value_bytes", 8)
        costs["raw"] = n * vb + 128
        if "width_bits" in stats:  # integer-like
            lo = stats["min"]
            if lo >= 0:
                costs["bitpack"] = n * bits_needed(stats["max"]) / 8 + 64
            costs["for"] = n * stats["width_bits"] / 8 + 64
            if "delta_width_bits" in stats:
                costs["delta"] = n * stats["delta_width_bits"] / 8 + 64
        runs = stats.get("runs", n)
        costs["rle"] = runs * (vb + 3) + 64
        card = stats.get("card_est", n)
        if card < n:
            costs["dict"] = (
                n * max(bits_needed(max(card - 1, 1)), 1) / 8 + card * vb + 256
            )
    elif is_binary_like(dtype):
        data_bytes = stats.get("data_bytes", 0)
        costs["raw"] = data_bytes + 8 * n + 128
        card = stats.get("card_est", n)
        avg = stats.get("avg_len", 8)
        if card < n:
            costs["dict"] = (
                n * max(bits_needed(max(card - 1, 1)), 1) / 8
                + card * (avg + 8)
                + 256
            )
        runs = stats.get("runs", n)
        costs["rle"] = runs * (avg + 8) + runs * 3 / 8 + 128
        entropy = stats.get("entropy", 8.0)
        # FSST wins on low/mid-entropy text; ratio grows with entropy.
        if avg >= 4 and data_bytes >= 2048 and entropy <= 6.8:
            ratio = max(0.35, entropy / 8.0 * 0.85)
            costs["fsst"] = data_bytes * ratio + 2 * n + 2048
    else:
        costs["raw"] = stats.get("input_bytes", 64) + 128
    return costs


def choose_codec(
    arr: pa.Array | pa.ChunkedArray,
    stats: dict | None = None,
    *,
    effort: str | None = None,
) -> str:
    """Pick the estimated-cheapest applicable codec for one column-chunk
    at the given effort level (``None`` -> :func:`default_effort`)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if stats is None:
        stats = column_stats(arr)
    if stats["n"] == 0 or stats["null_count"] == stats["n"]:
        return "raw"
    if not (is_fixed_primitive(arr.type) or is_binary_like(arr.type)):
        return "raw"  # nested / other types: lossless passthrough
    costs = _estimate_costs(stats, arr.type)
    if (effort or default_effort()) == "speed":
        costs.pop("fsst", None)
    return min(costs, key=costs.get)


_BSS_MIN_CONTAINER_SAVINGS = 0.02  # bss is a cheap transpose; low bar


def probe_bss_container_gain(arr: pa.Array) -> float:
    """Relative container-bytes savings of byte-stream-split-then-zstd over
    raw-then-zstd on a bounded sample of a float column."""
    valid = arr.drop_null() if arr.null_count else arr
    if len(valid) == 0:
        return 0.0
    values = primitive_to_numpy(valid)
    cap = max(_PROBE_BYTES // max(values.dtype.itemsize, 1), 1)
    v = np.ascontiguousarray(values[:cap])
    raw_disk = _zstd_len(v.tobytes())
    if raw_disk == 0:
        return 0.0
    planes = v.view(np.uint8).reshape(-1, v.dtype.itemsize).T
    bss_disk = _zstd_len(np.ascontiguousarray(planes).tobytes())
    return 1.0 - bss_disk / raw_disk


def decide_codec(
    arr: pa.Array | pa.ChunkedArray,
    *,
    effort: str | None = None,
) -> tuple[str, list | None]:
    """Full codec decision for one column-chunk: stats-based choice plus
    (at ``balanced`` effort) the container probe. Returns the codec name
    and, when FSST won a probe, the symbol table the probe trained.

    Callers that decide once per job (driver-side) and fan the result out
    to workers use this directly; :func:`encode_auto` calls it per column.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    effort = effort or default_effort()
    codec = choose_codec(arr, effort=effort)
    symbols = None
    if codec == "fsst" and effort in ("balanced", "ratio"):
        # both efforts verify FSST against the container empirically —
        # each at its own container level; trusting the codec-level
        # estimate was measured strictly worse once chunks shrank to
        # ~1 MiB (see the effort policy block above)
        savings, trained = probe_fsst_container_gain(
            arr,
            level=(
                _RATIO_CONTAINER_ZSTD_LEVEL
                if effort == "ratio"
                else _CONTAINER_ZSTD_LEVEL
            ),
        )
        if savings >= _FSST_MIN_CONTAINER_SAVINGS:
            symbols = trained
        else:
            codec = "raw"
    if (
        effort in ("balanced", "ratio")
        and pa.types.is_floating(storage_type(arr.type))
        and len(arr) > arr.null_count
    ):
        if codec == "dict":
            # the sampled-cardinality extrapolation under-estimates for
            # continuous values; a near-all-unique sample means dict is a
            # certain loss on floats (indices + full dictionary > raw)
            sample = (arr.drop_null() if arr.null_count else arr).slice(0, _SAMPLE)
            if len(pc.unique(sample)) >= 0.95 * len(sample):
                codec = "raw"
        # byte-stream split is size-neutral pre-container but groups the
        # correlated exponent bytes for zstd; keep it when it buys disk
        if codec == "raw" and (
            probe_bss_container_gain(arr) >= _BSS_MIN_CONTAINER_SAVINGS
        ):
            codec = "bss"
    return codec, symbols


def encode_auto(
    arr: pa.Array | pa.ChunkedArray,
    *,
    name: str = "col",
    fsst_symbols: list | None = None,
    effort: str | None = None,
    decision_cache: dict | None = None,
) -> EncodedChunk:
    """Auto-select, encode, and guard: fall back to ``raw`` if the chosen
    codec does not actually beat it on this chunk. ``fsst_symbols`` reuses
    a previously trained table when FSST is chosen.

    ``decision_cache`` (column name -> codec) makes the choice sticky per
    caller (one probe/stats pass per column per actor; chunks of one
    partition share a distribution, and the raw guard still bounds losses
    if the cached codec stops winning).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    effort = effort or default_effort()
    codec = decision_cache.get(name) if decision_cache is not None else None
    if codec is None:
        codec, symbols = decide_codec(arr, effort=effort)
        if symbols is not None and fsst_symbols is None:
            fsst_symbols = symbols
        if decision_cache is not None:
            decision_cache[name] = codec
    kw = {"symbols": fsst_symbols} if (codec == "fsst" and fsst_symbols) else None
    try:
        chunk = encode_array(arr, codec, name=name, codec_kwargs=kw)
    except (ValueError, TypeError, OverflowError):
        # a sticky / driver-planned decision can be outside this chunk's
        # domain (e.g. bitpack chosen from a non-negative sample, later
        # chunk holds negatives) — fall back instead of failing the
        # partition, and update the cache so later chunks skip the retry
        fallback = "for" if (
            codec != "for"
            and is_fixed_primitive(arr.type)
            and pa.types.is_integer(storage_type(arr.type))
        ) else "raw"
        try:
            chunk = encode_array(arr, fallback, name=name)
        except (ValueError, TypeError, OverflowError):
            fallback = "raw"
            chunk = encode_array(arr, "raw", name=name)
        codec = fallback
        if decision_cache is not None:
            decision_cache[name] = codec
    if codec != "raw":
        raw_size = arr.nbytes
        if chunk.payload_bytes >= raw_size:
            raw_chunk = encode_array(arr, "raw", name=name)
            if raw_chunk.payload_bytes < chunk.payload_bytes:
                return raw_chunk
    return chunk
