"""Pure-numpy image codecs backing the multimodal stages.

No image library exists in this environment, so the engine carries its own
decoders for the formats implementable from the public specs alone:

- **BMP** (Windows V3 ``BITMAPINFOHEADER``, uncompressed 24/32-bit,
  bottom-up or top-down) — header parse + one vectorized reshape.
- **PNG** (8-bit gray / RGB / RGBA, non-interlaced or Adam7) — chunk walk, stdlib
  ``zlib`` inflate, and all five scanline unfilters. ``Up`` and ``Sub``
  are vectorized (cumsum along the row for ``Sub``); ``Average``/``Paeth``
  fall back to a per-byte row loop (their left-dependency is nonlinear) —
  our own encoder always emits filter 0, so engine round-trips stay on the
  fast path.
- **JPEG** (baseline sequential, ITU-T T.81) — re-exported from
  :mod:`tbl_ray.stages.jpegcodec`: real Huffman + IDCT decode for the
  format web corpora actually ship. Progressive/arithmetic raise.

Matching encoders (``encode_bmp`` / ``encode_png`` / ``encode_jpeg``)
exist so tests can round-trip real generated payloads.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from tbl_ray.stages.jpegcodec import decode_jpeg, encode_jpeg  # noqa: F401

BMP_MAGIC = b"BM"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8"


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed bottom-up BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte multiples
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    # BMP stores BGR, bottom row first
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    data_offset = 14 + 40
    file_size = data_offset + body.size
    header = struct.pack("<2sIHHI", BMP_MAGIC, file_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, body.size, 2835, 2835, 0, 0
    )
    return header + info + body.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP bytes -> (H, W, 3) uint8 RGB."""
    if data[:2] != BMP_MAGIC or len(data) < 54:
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression not in (0, 3) or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    channels = bpp // 8
    row_bytes = (w * channels + 3) & ~3
    body = np.frombuffer(data, dtype=np.uint8, count=h * row_bytes, offset=data_offset)
    rows = body.reshape(h, row_bytes)[:, : w * channels].reshape(h, w, channels)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, 2::-1])  # BGR(A) -> RGB


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA

# Adam7 interlace passes (PNG spec §8.2): (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def encode_png(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W) or (H, W, {1,3,4}) uint8 -> 8-bit PNG bytes.

    ``interlace=True`` emits Adam7 (seven sub-image passes, PNG §8.2) —
    mainly a correctness oracle for the decoder's interlaced path, since
    PNG is lossless: decode(encode(img, interlace=True)) == img."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0,
                       1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass contributes no scanlines at all
            hp = sub.shape[0]
            parts.append(
                np.concatenate(
                    [np.zeros((hp, 1), np.uint8),
                     sub.reshape(hp, sub.shape[1] * c)],
                    axis=1,
                ).tobytes()
            )
        raw = b"".join(parts)
    else:
        # filter byte 0 prepended to every scanline
        raw = np.concatenate(
            [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * c)], axis=1
        ).tobytes()
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. raw is (h, 1 + stride) filter-typed rows."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up — fully vectorized
            out[y] = (line + prev) & 0xFF
        elif ftype == 1:  # Sub — prefix sum per byte-lane
            lanes = line.reshape(-1, bpp)
            out[y] = (np.cumsum(lanes, axis=0) & 0xFF).reshape(-1)
        elif ftype == 3:  # Average
            row = np.zeros(stride, np.int64)
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
            out[y] = row
        elif ftype == 4:  # Paeth
            row = np.zeros(stride, np.int64)
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                row[i] = (line[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
            out[y] = row
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """8-bit gray/RGB/RGBA PNG (non-interlaced or Adam7) -> (H, W, C)
    uint8 (C in 1/3/4)."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos = len(PNG_MAGIC)
    w = h = None
    channels = 0
    interlace = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace > 1 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color_type}, "
                    f"interlace={interlace})"
                )
            channels = _PNG_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace:
        # Adam7: each non-empty pass is an independently-filtered
        # sub-image; unfilter it, then scatter into the output grid
        out = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp == 0 or hp == 0:
                continue
            stride = wp * channels
            nbytes = hp * (stride + 1)
            if off + nbytes > len(raw):
                raise ValueError("PNG size mismatch after inflate")
            sub = _unfilter(
                raw[off : off + nbytes].reshape(hp, stride + 1),
                hp, stride, channels,
            )
            out[y0::dy, x0::dx] = sub.reshape(hp, wp, channels)
            off += nbytes
        if off != len(raw):
            raise ValueError("PNG size mismatch after inflate")
        return out
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG size mismatch after inflate")
    pixels = _unfilter(raw.reshape(h, stride + 1), h, stride, channels)
    return pixels.reshape(h, w, channels)


# ---------------------------------------------------------------------------
# dispatch + features
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> np.ndarray:
    """Magic-sniffing decode -> (H, W, C) uint8. BMP, 8-bit PNG and
    baseline/progressive JPEG (tbl_ray.stages.jpegcodec, pure-numpy
    ITU T.81) are decoded for real; anything else raises ValueError.

    Every parse failure surfaces as ``ValueError`` — crawled corpora
    contain truncated/corrupt payloads whose garbage can trip any
    exception inside a decoder (short reads, bad zlib streams, out-of-
    range table indices), and error policies key on ValueError."""
    try:
        if data[:2] == BMP_MAGIC:
            return decode_bmp(data)
        if data[:8] == PNG_MAGIC:
            return decode_png(data)
        if data[:2] == JPEG_MAGIC:
            return decode_jpeg(data)
    except ValueError:
        raise
    except (IndexError, KeyError, OverflowError, StopIteration,
            struct.error, zlib.error) as e:
        raise ValueError(
            f"corrupt image payload ({type(e).__name__}: {e})"
        ) from e
    raise ValueError("unknown image format (supported: BMP, PNG, JPEG)")


def image_features(pixels: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic ``dim``-float feature vector from decoded pixels:
    [mean R, mean G, mean B, luma std, 12-bin luma histogram]."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    rgb = pixels[:, :, :3] if pixels.shape[2] >= 3 else np.repeat(
        pixels[:, :, :1], 3, axis=2
    )
    f = np.zeros(dim, dtype=np.float32)
    means = rgb.reshape(-1, 3).mean(axis=0) / 255.0
    luma = rgb.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
    f[0:3] = means
    f[3] = float(luma.std()) / 255.0
    hist, _ = np.histogram(luma, bins=dim - 4, range=(0.0, 255.0))
    f[4:] = hist.astype(np.float32) / max(luma.size, 1)
    return f


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure vectorized indexing."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w = pixels.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return pixels[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) — the audio counterpart, equally spec-pure
# ---------------------------------------------------------------------------

WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 PCM -> RIFF/WAVE bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 PCM")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples).tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return WAV_MAGIC + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE 16-bit PCM bytes -> ((n, channels) int16, sample_rate)."""
    if data[:4] != WAV_MAGIC or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    sample_rate = None
    channels = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks pad to even offsets
        if tag == b"fmt ":
            if len(payload) < 16:
                raise ValueError("corrupt WAV (truncated fmt chunk)")
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt}, bits={bits}); PCM16 only"
                )
            if channels < 1:
                raise ValueError("corrupt WAV (0 channels)")
        elif tag == b"data":
            pcm = np.frombuffer(payload[: len(payload) & ~1], dtype="<i2")
    if sample_rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(pcm) % channels:
        raise ValueError("corrupt WAV (data not divisible by channels)")
    return pcm.reshape(-1, channels), sample_rate


def audio_features(samples: np.ndarray, sample_rate: int, dim: int = 8) -> np.ndarray:
    """[duration_s, rms, zero-crossing rate, peak, 4-band coarse spectrum]
    over the first channel — all vectorized numpy."""
    x = samples[:, 0].astype(np.float32) / 32768.0
    f = np.zeros(dim, dtype=np.float32)
    if len(x) == 0:
        return f
    f[0] = len(x) / sample_rate
    f[1] = float(np.sqrt(np.mean(x * x)))
    f[2] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    f[3] = float(np.abs(x).max())
    spec = np.abs(np.fft.rfft(x[: min(len(x), 1 << 14)]))
    bands = np.array_split(spec, dim - 4)
    denom = spec.sum() + 1e-9
    for i, b in enumerate(bands[: dim - 4]):
        f[4 + i] = float(b.sum() / denom)
    return f
