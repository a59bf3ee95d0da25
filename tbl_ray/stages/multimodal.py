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
from tbl_ray.stages.imagecodec import (
    decode_image,
    encode_bmp,
    encode_png,
    image_features,
    resize_nearest,
)
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

    The decode is REAL for BMP and 8-bit PNG payloads (pure-numpy codecs in
    :mod:`tbl_ray.stages.imagecodec` — no external image library needed):
    width/height come from the actual pixel grid and ``features`` is a
    16-float [channel means, luma std, luma histogram] vector.

    Formats this environment cannot decode (JPEG & co.): ``strict=True``
    raises ``ValueError`` naming the payload; ``strict=False`` falls back to
    a deterministic checksum-derived fake for those rows only, keeping the
    plumbing testable with arbitrary bytes.
    """

    FEATURE_DIM = 16

    def __init__(self, *, strict: bool = False, payload_col: str = "payload"):
        self.strict = strict
        self.payload_col = payload_col
        # per-actor init: nothing heavy for the numpy codecs; a real
        # model/codec handle (PIL/libvips/ffmpeg) would load ONCE here

    def _decode(self, payloads: pa.Array) -> dict[str, pa.Array]:
        checksum, lens = _payload_stats(payloads)
        n = len(lens)
        width = np.zeros(n, np.int32)
        height = np.zeros(n, np.int32)
        feat = np.zeros((n, self.FEATURE_DIM), dtype=np.float32)
        for i in range(n):
            data = payloads[i].as_py() or b""
            try:
                pixels = decode_image(data)
            except ValueError:
                if self.strict:
                    raise
                # unknown format: deterministic checksum-derived fake
                width[i] = int(checksum[i] % np.uint64(1920)) + 1
                height[i] = int((checksum[i] >> np.uint64(17)) % np.uint64(1080)) + 1
                for j in range(self.FEATURE_DIM):
                    feat[i, j] = float(
                        (checksum[i] >> np.uint64(j * 4)) & np.uint64(0xFFFF)
                    ) / 65535.0
                continue
            height[i], width[i] = pixels.shape[0], pixels.shape[1]
            feat[i] = image_features(pixels, self.FEATURE_DIM)
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


class ImageResize:
    """Actor-pool stage: decode -> nearest-neighbor resize -> re-encode BMP.

    Real end-to-end pixel path (decode and resize are pure numpy); output
    replaces the payload column with the resized image and stamps the new
    dimensions. Unknown formats pass through untouched with width/height -1
    (strict=True raises instead)."""

    def __init__(
        self,
        out_w: int,
        out_h: int,
        *,
        strict: bool = False,
        payload_col: str = "payload",
    ):
        self.out_w, self.out_h = out_w, out_h
        self.strict = strict
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column(self.payload_col).combine_chunks()
        out_payloads: list[bytes] = []
        widths = np.full(t.num_rows, -1, np.int32)
        heights = np.full(t.num_rows, -1, np.int32)
        for i in range(t.num_rows):
            data = payloads[i].as_py() or b""
            try:
                pixels = decode_image(data)
            except ValueError:
                if self.strict:
                    raise
                out_payloads.append(data)
                continue
            if pixels.shape[2] == 1:
                pixels = np.repeat(pixels, 3, axis=2)
            resized = resize_nearest(pixels[:, :, :3], self.out_w, self.out_h)
            out_payloads.append(encode_bmp(np.ascontiguousarray(resized)))
            widths[i], heights[i] = self.out_w, self.out_h
        out = t.set_column(
            t.schema.get_field_index(self.payload_col),
            self.payload_col,
            pa.array(out_payloads, type=pa.large_binary()),
        )
        out = out.append_column("width", pa.array(widths))
        return out.append_column("height", pa.array(heights))


def resize_images(
    ds: "ray.data.Dataset",
    out_w: int,
    out_h: int,
    *,
    strict: bool = False,
    batch_size: int = 64,
    concurrency=None,
) -> "ray.data.Dataset":
    """Actor-pool resize over small batches (large-payload safe)."""
    from tbl_ray.stages.encode import _default_pool

    return ds.map_batches(
        ImageResize,
        fn_constructor_args=(out_w, out_h),
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency or _default_pool(),
    )


def synthetic_image_table(n: int, *, seed: int = 42, fmt: str = "bmp") -> pa.Table:
    """Media rows whose payloads are REAL decodable images (gradient +
    noise patterns, deterministic per (seed, id))."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        yy, xx = np.mgrid[0:h, 0:w]
        base = ((xx * 255) // max(w - 1, 1)).astype(np.uint8)
        pixels = np.stack(
            [
                base,
                ((yy * 255) // max(h - 1, 1)).astype(np.uint8),
                rng.integers(0, 256, size=(h, w), dtype=np.uint8),
            ],
            axis=2,
        )
        rows.append(encode_bmp(pixels) if fmt == "bmp" else encode_png(pixels))
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(rows, type=pa.large_binary()),
            "mime": pa.array([f"image/{fmt}"] * n),
            "meta": pa.array(["{}"] * n),
        },
        schema=MEDIA_SCHEMA,
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
