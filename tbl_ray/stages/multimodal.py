"""Multimodal column stages — opaque ``binary`` payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with sidecar metadata columns
(mime, width/height/duration). Decode / feature-extraction / resize /
frame-sampling are **actor-pool** ``map_batches`` stages, and the decodes
are REAL for the formats implementable from public specs with numpy alone:
BMP + 8-bit PNG images (:mod:`tbl_ray.stages.imagecodec`), baseline AND
progressive JPEG (:mod:`tbl_ray.stages.jpegcodec`, ITU-T T.81 incl.
Annex G), RIFF/PCM16 WAV audio, and a length-prefixed frame container
for video sampling. Formats needing external codecs (MP3/AAC/H.264)
plug in through :mod:`tbl_ray.stages.mediaplugins` — the decode stages
probe the registered chain before the built-ins, so a libmpg123/pyav
binding slots in without forking any stage; payloads no decoder claims
raise in strict mode or fall back per the ``on_error`` policy (the
checksum fake lives ONLY behind ``on_error="fake"``).

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
    audio_features,
    decode_image,
    decode_wav,
    encode_bmp,
    encode_jpeg,
    encode_png,
    encode_wav,
    image_features,
    resize_nearest,
)
from tbl_ray.stages.mediaplugins import (
    MediaDecoder,
    pick_decoder,
    registered_decoders,
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


def unpack_all_frames(data: bytes) -> list[bytes]:
    """All frames of a frame-container payload (the builtin video
    'decode' for the plugin chain; samplers that skip frames use
    :func:`unpack_frame` for O(1) seeks instead)."""
    import struct as _struct

    if data[:4] != FRAMES_MAGIC or len(data) < 8:
        raise ValueError("not a frame container")
    (count,) = _struct.unpack_from("<I", data, 4)
    if len(data) < 8 + 4 * count:
        raise ValueError("corrupt frame container (truncated length table)")
    # one linear pass: unpack the length table once and walk a running
    # offset (per-index unpack_frame calls would re-unpack the table and
    # re-sum the prefix per frame — O(frames^2) on long containers)
    lens = _struct.unpack_from(f"<{count}I", data, 8)
    frames, pos = [], 8 + 4 * count
    for ln in lens:
        frames.append(data[pos : pos + ln])
        pos += ln
    return frames


def resolve_media_decoders(kind: str) -> list[MediaDecoder]:
    """Full decoder chain for ``kind``: env plugins + registrations
    (:func:`tbl_ray.stages.mediaplugins.registered_decoders`) first, the
    pure-numpy built-ins last — so an external binding (libjpeg-turbo,
    libmpg123, pyav) takes over its format without forking a stage.
    Resolve on the DRIVER (the stage wrappers do) and ship the list via
    actor constructor args; worker processes never re-read plugin env."""
    chain = list(registered_decoders(kind))
    if kind == "image":
        chain.append(
            # decode_image sniffs BMP/PNG/JPEG itself and raises
            # ValueError for anything else — same on_error funnel
            MediaDecoder("builtin-image", "image", lambda d, m: True, decode_image)
        )
    elif kind == "audio":
        chain.append(
            MediaDecoder(
                "builtin-wav", "audio",
                lambda d, m: d[:4] == b"RIFF", decode_wav,
            )
        )
    elif kind == "video":
        chain.append(
            MediaDecoder(
                "builtin-frames", "video",
                lambda d, m: d[:4] == FRAMES_MAGIC, unpack_all_frames,
            )
        )
    return chain


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

    The decode is REAL for BMP, 8-bit PNG and baseline JPEG payloads
    (pure-numpy codecs in :mod:`tbl_ray.stages.imagecodec` /
    :mod:`tbl_ray.stages.jpegcodec` — no external image library needed):
    width/height come from the actual pixel grid and ``features`` is a
    16-float [channel means, luma std, luma histogram] vector.

    Undecodable payloads (corrupt bytes — common in real crawls — or
    formats this environment cannot decode, e.g. arithmetic-coded
    JPEG): ``on_error`` picks the policy —

    - ``"raise"``: fail the task (``strict=True`` shorthand);
    - ``"fake"``: deterministic checksum-derived fake dims/features
      (``strict=False`` shorthand — plumbing-test mode);
    - ``"null"``: the production policy — width/height/features/sum_px
      are NULL for the bad rows and a ``decode_error`` string column
      carries the per-row reason, so a 100 TB decode job neither dies
      on one corrupt payload nor fabricates data.
    """

    FEATURE_DIM = 16

    def __init__(
        self,
        *,
        strict: bool = False,
        payload_col: str = "payload",
        emit_sum: bool = False,
        on_error: str | None = None,
        decoders=None,
    ):
        if on_error is None:
            on_error = "raise" if strict else "fake"
        if on_error not in ("raise", "fake", "null"):
            raise ValueError(f"unsupported on_error {on_error!r}")
        self.on_error = on_error
        self.payload_col = payload_col
        # exact int64 sum of all decoded channel values — an
        # independently-computable pixel checksum (the driver oracle
        # replays it analytically for formula-generated images)
        self.emit_sum = emit_sum
        # pluggable decoder chain (stages/mediaplugins.py): wrappers
        # resolve it on the DRIVER and pass it here; resolving in this
        # constructor is the direct-use fallback (this __init__ runs on
        # the actor, where plugin env vars may not exist)
        if decoders is None:
            decoders = resolve_media_decoders("image")
        self.decoders = decoders
        # per-actor init: nothing heavy for the numpy codecs; a real
        # model/codec handle (PIL/libvips/ffmpeg) would load ONCE here

    def _decode(
        self, payloads: pa.Array, mimes: "list | None" = None
    ) -> dict[str, pa.Array]:
        checksum, lens = _payload_stats(payloads)
        n = len(lens)
        width = np.zeros(n, np.int32)
        height = np.zeros(n, np.int32)
        sum_px = np.zeros(n, np.int64)
        feat = np.zeros((n, self.FEATURE_DIM), dtype=np.float32)
        bad = np.zeros(n, bool)
        errs: list[str | None] = [None] * n
        for i in range(n):
            data = payloads[i].as_py() or b""
            try:
                mime = mimes[i] if mimes is not None else None
                pixels = pick_decoder(self.decoders, data, mime).decode(data)
            except ValueError as e:
                if self.on_error == "raise":
                    raise
                if self.on_error == "null":
                    bad[i] = True
                    errs[i] = str(e)
                    continue
                # "fake": deterministic checksum-derived dims/features
                width[i] = int(checksum[i] % np.uint64(1920)) + 1
                height[i] = int((checksum[i] >> np.uint64(17)) % np.uint64(1080)) + 1
                for j in range(self.FEATURE_DIM):
                    feat[i, j] = float(
                        (checksum[i] >> np.uint64(j * 4)) & np.uint64(0xFFFF)
                    ) / 65535.0
                continue
            height[i], width[i] = pixels.shape[0], pixels.shape[1]
            if self.emit_sum:
                sum_px[i] = int(pixels.astype(np.int64).sum())
            feat[i] = image_features(pixels, self.FEATURE_DIM)
        nullable = self.on_error == "null"
        mask = bad if nullable else None
        out = {
            "width": pa.array(width, mask=mask),
            "height": pa.array(height, mask=mask),
            "n_bytes": pa.array(lens, type=pa.int64()),
            "features": pa.array(
                [None if bad[i] else feat[i].tolist() for i in range(n)],
                type=pa.list_(pa.float32(), self.FEATURE_DIM),
            )
            if nullable
            else pa.FixedSizeListArray.from_arrays(
                pa.array(feat.ravel()), self.FEATURE_DIM
            ),
        }
        if self.emit_sum:
            out["sum_px"] = pa.array(sum_px, type=pa.int64(), mask=mask)
        if nullable:
            out["decode_error"] = pa.array(errs, type=pa.string())
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column(self.payload_col).combine_chunks()
        mimes = (
            t.column("mime").to_pylist() if "mime" in t.schema.names else None
        )
        cols = self._decode(payloads, mimes)
        out = t.drop_columns([self.payload_col])
        for name, arr in cols.items():
            out = out.append_column(name, arr)
        return out


def decode_images(
    ds: "ray.data.Dataset",
    *,
    strict: bool = False,
    emit_sum: bool = False,
    batch_size: int = 64,
    concurrency=None,
    on_error: str | None = None,
    decoders: "list[MediaDecoder] | None" = None,
) -> "ray.data.Dataset":
    """Actor-pool image decode over small batches (large-payload safe).

    ``on_error="null"`` is the production corrupt-corpus policy: bad
    payloads yield NULL dims/features plus a ``decode_error`` column
    instead of failing the job or fabricating values. ``decoders``
    overrides the plugin chain (default: driver-side
    :func:`resolve_media_decoders`)."""
    from tbl_ray.stages.encode import _default_pool

    return ds.map_batches(
        ImageDecode,
        fn_constructor_kwargs={
            "strict": strict,
            "emit_sum": emit_sum,
            "on_error": on_error,
            # resolved HERE on the driver: env plugins must not depend
            # on worker-process environment
            "decoders": (
                decoders if decoders is not None
                else resolve_media_decoders("image")
            ),
        },
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
        out_format: str = "bmp",
        jpeg_quality: int = 85,
    ):
        if out_format not in ("bmp", "jpeg"):
            raise ValueError(f"unsupported out_format {out_format!r}")
        self.out_w, self.out_h = out_w, out_h
        self.strict = strict
        self.payload_col = payload_col
        self.out_format = out_format
        self.jpeg_quality = jpeg_quality

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
            resized = np.ascontiguousarray(
                resize_nearest(pixels[:, :, :3], self.out_w, self.out_h)
            )
            if self.out_format == "jpeg":
                # encode_jpeg imported at module scope: this runs in Ray
                # workers, where late `from tbl_ray...` imports break
                # under a foreign driver cwd.  optimize=True: at corpus
                # scale the 13-25% smaller payloads dominate the ~2x
                # entropy-pass cost (entropy is a minor share of encode)
                out_payloads.append(
                    encode_jpeg(resized, quality=self.jpeg_quality,
                                subsample="420", optimize=True)
                )
            else:
                out_payloads.append(encode_bmp(resized))
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
    out_format: str = "bmp",
    jpeg_quality: int = 85,
    batch_size: int = 64,
    concurrency=None,
) -> "ray.data.Dataset":
    """Actor-pool resize over small batches (large-payload safe).
    ``out_format='jpeg'`` re-encodes through the baseline JPEG encoder
    (4:2:0) — the realistic thumbnail-pipeline output."""
    from tbl_ray.stages.encode import _default_pool

    return ds.map_batches(
        ImageResize,
        fn_constructor_args=(out_w, out_h),
        fn_constructor_kwargs={
            "strict": strict,
            "out_format": out_format,
            "jpeg_quality": jpeg_quality,
        },
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


def _formula_pixels(w: int, h: int, salt: int) -> np.ndarray:
    """Closed-form RGB grid — every pixel is an integer formula of
    (x, y, salt), so an independent oracle (e.g. SQL ``generate_series``)
    can recompute dimension and pixel-sum expectations without running
    any of this code: R=(x*255)//(w-1), G=(y*255)//(h-1),
    B=(x*y+salt)%256."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            ((xx * 255) // max(w - 1, 1)).astype(np.uint8),
            ((yy * 255) // max(h - 1, 1)).astype(np.uint8),
            ((xx * yy + salt) % 256).astype(np.uint8),
        ],
        axis=2,
    )


def formula_image_table(n: int, *, fmt: str = "bmp") -> pa.Table:
    """Media rows whose payloads are REAL decodable images with
    closed-form dimensions and pixels: image ``i`` is
    ``8+(i*37)%56 x 8+(i*53)%56`` with :func:`_formula_pixels` content.
    Unlike :func:`synthetic_image_table` (rng pixels), everything here is
    replayable by an external oracle."""
    rows = []
    for i in range(n):
        w, h = 8 + (i * 37) % 56, 8 + (i * 53) % 56
        px = _formula_pixels(w, h, i)
        rows.append(encode_bmp(px) if fmt == "bmp" else encode_png(px))
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(rows, type=pa.large_binary()),
            "mime": pa.array([f"image/{fmt}"] * n),
            "meta": pa.array(["{}"] * n),
        },
        schema=MEDIA_SCHEMA,
    )


def formula_audio_table(n: int) -> pa.Table:
    """Media rows whose payloads are REAL WAV clips with closed-form
    samples: clip ``i`` has rate ``[8000,16000,44100][i%3]``, length
    ``500+(i*131)%1500`` and ``pcm[t] = ((t*(t+7)+i*31)%24001)-12000``
    — integer arithmetic only, so an external oracle can recompute
    n_samples and the exact PCM sum."""
    rows = []
    rates = [8000, 16000, 44100]
    for i in range(n):
        rate = rates[i % 3]
        length = 500 + (i * 131) % 1500
        tt = np.arange(length, dtype=np.int64)
        pcm = ((tt * (tt + 7) + i * 31) % 24001 - 12000).astype(np.int16)
        rows.append(encode_wav(pcm, rate))
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(rows, type=pa.large_binary()),
            "mime": pa.array(["audio/wav"] * n),
            "meta": pa.array(["{}"] * n),
        },
        schema=MEDIA_SCHEMA,
    )


def formula_video_table(n: int, *, frames: int = 8) -> pa.Table:
    """Media rows whose payloads are REAL frame containers of BMP frames
    with closed-form dimensions: frame ``j`` of video ``i`` is
    ``8+((i*7+j*37)%56) x 8+((i*11+j*53)%56)``."""
    rows = []
    for i in range(n):
        fr = []
        for j in range(frames):
            w = 8 + (i * 7 + j * 37) % 56
            h = 8 + (i * 11 + j * 53) % 56
            fr.append(encode_bmp(_formula_pixels(w, h, i * 91 + j)))
        rows.append(pack_frames(fr))
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(rows, type=pa.large_binary()),
            "mime": pa.array(["video/x-frames"] * n),
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


# ---------------------------------------------------------------------------
# audio — REAL WAV (RIFF PCM16) decode, pure numpy
# ---------------------------------------------------------------------------


class AudioDecode:
    """Actor-pool stage: audio payload -> (sample_rate, n_samples,
    channels, duration_s, features[8]). Real decode for RIFF/PCM16 via
    :func:`tbl_ray.stages.imagecodec.decode_wav`; other formats go
    through the plugin chain (:mod:`tbl_ray.stages.mediaplugins` — an
    MP3/AAC binding registers there). Payloads no decoder claims raise
    (strict) or emit nulls-with-zero-features (default)."""

    FEATURE_DIM = 8

    def __init__(
        self,
        *,
        strict: bool = False,
        payload_col: str = "payload",
        emit_sum: bool = False,
        decoders: "list[MediaDecoder] | None" = None,
    ):
        self.strict = strict
        self.payload_col = payload_col
        # exact int64 sum of decoded PCM samples — an independently
        # computable checksum for formula-generated clips (driver oracle)
        self.emit_sum = emit_sum
        if decoders is None:  # direct-use fallback; wrappers resolve
            decoders = resolve_media_decoders("audio")  # on the driver
        self.decoders = decoders

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column(self.payload_col).combine_chunks()
        mimes = (
            t.column("mime").to_pylist() if "mime" in t.schema.names else None
        )
        n = t.num_rows
        sr = np.zeros(n, np.int32)
        ns = np.zeros(n, np.int64)
        ch = np.zeros(n, np.int32)
        dur = np.zeros(n, np.float64)
        sum_pcm = np.zeros(n, np.int64)
        feat = np.zeros((n, self.FEATURE_DIM), np.float32)
        for i in range(n):
            data = payloads[i].as_py() or b""
            try:
                mime = mimes[i] if mimes is not None else None
                dec = pick_decoder(self.decoders, data, mime)
                samples, rate = dec.decode(data)
            except ValueError:
                if self.strict:
                    raise
                continue
            sr[i], ns[i], ch[i] = rate, samples.shape[0], samples.shape[1]
            dur[i] = samples.shape[0] / rate
            if self.emit_sum:
                sum_pcm[i] = int(samples.astype(np.int64).sum())
            feat[i] = audio_features(samples, rate, self.FEATURE_DIM)
        out = t.drop_columns([self.payload_col])
        out = out.append_column("sample_rate", pa.array(sr))
        out = out.append_column("n_samples", pa.array(ns))
        out = out.append_column("channels", pa.array(ch))
        out = out.append_column("duration_s", pa.array(dur))
        out = out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(pa.array(feat.ravel()), self.FEATURE_DIM),
        )
        if self.emit_sum:
            out = out.append_column("sum_pcm", pa.array(sum_pcm, pa.int64()))
        return out


def decode_audio(
    ds: "ray.data.Dataset",
    *,
    strict: bool = False,
    emit_sum: bool = False,
    batch_size: int = 64,
    concurrency=None,
    decoders: "list[MediaDecoder] | None" = None,
) -> "ray.data.Dataset":
    from tbl_ray.stages.encode import _default_pool

    return ds.map_batches(
        AudioDecode,
        fn_constructor_kwargs={
            "strict": strict,
            "emit_sum": emit_sum,
            "decoders": (
                decoders if decoders is not None
                else resolve_media_decoders("audio")
            ),
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency or _default_pool(),
    )


def synthetic_audio_table(n: int, *, seed: int = 42) -> pa.Table:
    """Media rows whose payloads are REAL decodable WAV clips."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 9_000_017 + i)
        rate = int(rng.choice([8000, 16000, 44100]))
        length = int(rng.integers(rate // 10, rate // 2))
        tt = np.arange(length, dtype=np.float32) / rate
        tone = np.sin(2 * np.pi * float(rng.integers(100, 2000)) * tt)
        pcm = (tone * 12000 + rng.normal(0, 500, length)).astype(np.int16)
        rows.append(encode_wav(pcm, rate))
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(rows, type=pa.large_binary()),
            "mime": pa.array(["audio/wav"] * n),
            "meta": pa.array(["{}"] * n),
        },
        schema=MEDIA_SCHEMA,
    )


# ---------------------------------------------------------------------------
# video — frame container + sampling without decoding skipped frames
# ---------------------------------------------------------------------------

FRAMES_MAGIC = b"TFRV"  # tbl-ray frame container v1


def pack_frames(frames: list[bytes]) -> bytes:
    """Length-prefixed frame container: magic, u32 count, u32 lengths,
    then the frame payloads (each an independently decodable image)."""
    import struct as _struct

    head = FRAMES_MAGIC + _struct.pack("<I", len(frames))
    head += b"".join(_struct.pack("<I", len(f)) for f in frames)
    return head + b"".join(frames)


def unpack_frame(data: bytes, index: int) -> bytes:
    """O(1)-seek extract of one frame — skipped frames are never touched."""
    import struct as _struct

    if data[:4] != FRAMES_MAGIC or len(data) < 8:
        raise ValueError("not a frame container")
    (count,) = _struct.unpack_from("<I", data, 4)
    if not 0 <= index < count:
        raise IndexError(f"frame {index} of {count}")
    if len(data) < 8 + 4 * count:
        raise ValueError("corrupt frame container (truncated length table)")
    lens = _struct.unpack_from(f"<{count}I", data, 8)
    start = 8 + 4 * count + sum(lens[:index])
    return data[start : start + lens[index]]


class FrameSample:
    """Actor-pool stage: video payload -> ``n_sample`` uniformly spaced
    decoded frames, one output row per (media_id, frame). The builtin
    frame container's length table lets the stage seek — frames outside
    the sample are never read or decoded, so per-payload cost is
    O(sampled frames), not O(frames); external video codecs from the
    plugin chain (:mod:`tbl_ray.stages.mediaplugins`) return the full
    frame list and are sampled after decode."""

    def __init__(
        self,
        n_sample: int = 3,
        *,
        strict: bool = False,
        payload_col: str = "payload",
        id_col: str = "media_id",
        decoders: "list[MediaDecoder] | None" = None,
        frame_decoders: "list[MediaDecoder] | None" = None,
    ):
        self.n_sample = n_sample
        self.strict = strict
        self.payload_col = payload_col
        self.id_col = id_col
        if decoders is None:  # direct-use fallback; wrappers resolve
            decoders = resolve_media_decoders("video")  # on the driver
        self.decoders = decoders
        if frame_decoders is None:
            frame_decoders = resolve_media_decoders("image")
        self.frame_decoders = frame_decoders

    def __call__(self, t: pa.Table) -> pa.Table:
        import struct as _struct

        payloads = t.column(self.payload_col).combine_chunks()
        mimes = (
            t.column("mime").to_pylist() if "mime" in t.schema.names else None
        )
        ids = t.column(self.id_col).to_pylist()
        out_id, out_fi, out_w, out_h = [], [], [], []
        out_feat = []

        def _picks(count: int) -> list[int]:
            if not count:
                return []
            return sorted(
                {int(j * count / max(self.n_sample, 1)) for j in range(self.n_sample)}
            )

        for i in range(t.num_rows):
            data = payloads[i].as_py() or b""
            mime = mimes[i] if mimes is not None else None
            try:
                dec = pick_decoder(self.decoders, data, mime)
            except ValueError:
                if self.strict:
                    raise ValueError("not a frame container")
                continue
            # identity, not name: a plugin may legally register under any
            # name (even "builtin-frames") — only the builtin container
            # decode has the length table that makes O(1) seeks valid
            if dec.decode is unpack_all_frames:
                if len(data) < 8:
                    if self.strict:
                        raise ValueError("not a frame container")
                    continue
                (count,) = _struct.unpack_from("<I", data, 4)
                frame_at = lambda fi: unpack_frame(data, fi)  # noqa: E731 — O(1) seek
            else:
                try:
                    frames = dec.decode(data)
                except ValueError:
                    if self.strict:
                        raise
                    continue
                count = len(frames)
                frame_at = frames.__getitem__
            for fi in _picks(count):
                try:
                    frame = frame_at(fi)
                    pixels = pick_decoder(
                        self.frame_decoders, frame, None
                    ).decode(frame)
                except ValueError:
                    # corrupt container or frame: strict raises, default
                    # skips the row (crawled corpora contain both)
                    if self.strict:
                        raise
                    continue
                out_id.append(ids[i])
                out_fi.append(fi)
                out_h.append(pixels.shape[0])
                out_w.append(pixels.shape[1])
                out_feat.append(image_features(pixels, ImageDecode.FEATURE_DIM))
        feat = (
            np.stack(out_feat)
            if out_feat
            else np.zeros((0, ImageDecode.FEATURE_DIM), np.float32)
        )
        return pa.table(
            {
                self.id_col: pa.array(out_id, t.schema.field(self.id_col).type),
                "frame_index": pa.array(out_fi, pa.int64()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feat.ravel(), pa.float32()), ImageDecode.FEATURE_DIM
                ),
            }
        )


def sample_frames(
    ds: "ray.data.Dataset",
    n_sample: int = 3,
    *,
    strict: bool = False,
    batch_size: int = 16,
    concurrency=None,
) -> "ray.data.Dataset":
    """Frame sampling over video-like payloads (small batches: multi-frame
    payloads are the largest rows in the pipeline)."""
    from tbl_ray.stages.encode import _default_pool

    return ds.map_batches(
        FrameSample,
        fn_constructor_args=(n_sample,),
        fn_constructor_kwargs={
            "strict": strict,
            "decoders": resolve_media_decoders("video"),
            "frame_decoders": resolve_media_decoders("image"),
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency or _default_pool(),
    )


def synthetic_video_table(n: int, *, seed: int = 42, frames: int = 8) -> pa.Table:
    """Media rows whose payloads are REAL frame containers of BMP frames."""
    img = synthetic_image_table  # reuse the deterministic frame generator
    rows = []
    for i in range(n):
        t = img(frames, seed=seed * 77 + i)
        rows.append(pack_frames([p.as_py() for p in t.column("payload")]))
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(rows, type=pa.large_binary()),
            "mime": pa.array(["video/x-frames"] * n),
            "meta": pa.array(["{}"] * n),
        },
        schema=MEDIA_SCHEMA,
    )
