"""Multimodal column stages — opaque ``binary`` payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with sidecar metadata columns
(mime, width/height/duration). Decode / feature-extraction / resize /
frame-sampling are **actor-pool** ``map_batches`` stages: the Ray-side
plumbing (schema, batch sizing, actor signature, output layout) is real and
tested; the codec call itself is STUBBED because no image/audio libraries
exist in this environment — each stub either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
derived from the payload bytes (plumbing-test mode).

Batch-size note (SURVEY.md §4 memory row): multi-MB payloads need small
row-count batches; callers size ``batch_size`` so
``batch_size × concurrency × avg_payload`` fits the worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from tbl_ray.codecs.base import binary_parts, segment_reduceat
from tbl_ray.webtable import _mix

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.large_binary()),
        pa.field("mime", pa.string()),
        pa.field("meta", pa.string()),  # json sidecar metadata
    ]
)


def _payload_stats(payloads: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic per-payload (checksum, length) — the fake 'decode'."""
    offsets, data = binary_parts(payloads)
    lens = np.diff(offsets)
    if len(data) == 0:
        return np.zeros(len(lens), np.uint64), lens
    pos = np.arange(len(data), dtype=np.uint64)
    row_start = np.repeat(offsets[:-1].astype(np.uint64), lens)
    with np.errstate(over="ignore"):
        h = _mix(data.astype(np.uint64) + (pos - row_start))
    acc = segment_reduceat(np.bitwise_xor, h, offsets, np.uint64(0))
    return acc, lens


class ImageDecode:
    """Actor-pool stage: binary payload -> decoded feature columns.

    ``strict=True`` raises NotImplementedError at the decode call (the real
    codec is not available in this container); ``strict=False`` emits a
    deterministic fake (checksum-derived pseudo-dimensions + a fixed-size
    float feature vector) so the Ray plumbing is fully testable.
    """

    FEATURE_DIM = 16

    def __init__(self, *, strict: bool = False, payload_col: str = "payload"):
        self.strict = strict
        self.payload_col = payload_col
        # real implementation would load the codec/model ONCE here
        # (per-actor init), e.g. PIL/libvips/ffmpeg handles

    def _decode(self, payloads: pa.Array) -> dict[str, pa.Array]:
        if self.strict:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "environment; run with strict=False for the deterministic stub"
            )
        checksum, lens = _payload_stats(payloads)
        width = (checksum % np.uint64(1920)).astype(np.int32) + 1
        height = ((checksum >> np.uint64(17)) % np.uint64(1080)).astype(np.int32) + 1
        feat = np.empty((len(lens), self.FEATURE_DIM), dtype=np.float32)
        for j in range(self.FEATURE_DIM):
            feat[:, j] = (
                ((checksum >> np.uint64(j * 4)) & np.uint64(0xFFFF)).astype(np.float32)
                / 65535.0
            )
        return {
            "width": pa.array(width),
            "height": pa.array(height),
            "n_bytes": pa.array(lens, type=pa.int64()),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feat.ravel()), self.FEATURE_DIM
            ),
        }

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column(self.payload_col).combine_chunks()
        cols = self._decode(payloads)
        out = t.drop_columns([self.payload_col])
        for name, arr in cols.items():
            out = out.append_column(name, arr)
        return out


def decode_images(
    ds: "ray.data.Dataset",
    *,
    strict: bool = False,
    batch_size: int = 64,
    concurrency=None,
) -> "ray.data.Dataset":
    """Actor-pool image decode over small batches (large-payload safe)."""
    from tbl_ray.stages.encode import _default_pool

    return ds.map_batches(
        ImageDecode,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency or _default_pool(),
    )


def fake_media_table(n: int, *, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for plumbing tests/benchmarks."""
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(payload_bytes) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime": pa.array(["image/fake"] * n),
            "meta": pa.array(["{}"] * n),
        },
        schema=MEDIA_SCHEMA,
    )
