"""Baseline JPEG codec (tbl_ray/stages/jpegcodec.py, ITU-T T.81).

The hand-crafted fixtures below are assembled byte-by-byte in the test
from the SPEC's rules (canonical code construction worked out by hand,
flat-block DCT closed form), so they validate the decoder independently
of the encoder's serialization path.
"""

import struct

import numpy as np
import pytest

from tbl_ray.stages.imagecodec import decode_image
from tbl_ray.stages.jpegcodec import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    decode_jpeg,
    encode_jpeg,
)


def _handmade_gray_jpeg(entropy: bytes, w: int = 8, h: int = 8) -> bytes:
    """Assemble a minimal single-component baseline JPEG around a given
    entropy-coded segment: all-ones quant table, standard luma Huffman."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for tc, bits, vals in (
        (0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, AC_LUMA_BITS, AC_LUMA_VALS),
    ):
        payload = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_handmade_solid_gray_128():
    """DC diff 0 -> DC category code '00' (the only len-2 DC code);
    EOB is the 4th AC value (0x00) -> canonical code '1010' (len 4).
    Bits 00 1010 padded with 1s = 0x2B. Every pixel must decode to 128
    (level shift of an all-zero block)."""
    img = decode_jpeg(_handmade_gray_jpeg(b"\x2b"))
    assert img.shape == (8, 8, 1)
    assert (img == 128).all()


def test_handmade_solid_gray_136():
    """Flat block at 136: DC coef = 8*(136-128) = 64 with quant 1 ->
    category 7 (DC code '11110' by canonical construction), magnitude
    bits 1000000, then EOB '1010': 11110100 00001010 = F4 0A."""
    img = decode_jpeg(_handmade_gray_jpeg(b"\xf4\x0a"))
    assert img.shape == (8, 8, 1)
    assert (img == 136).all()


def test_roundtrip_gray():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (24, 40, 1)
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    assert err.mean() < 6.0


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("quality", [95, 75])
def test_roundtrip_color(subsample, quality):
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(xx * 255 // (w - 1)), (yy * 255 // (h - 1)), ((xx + yy) % 256)],
        axis=2,
    ).astype(np.uint8)
    data = encode_jpeg(rgb, quality=quality, subsample=subsample)
    out = decode_jpeg(data)
    assert out.shape == rgb.shape
    err = np.abs(out.astype(int) - rgb.astype(int))
    bound = {("444", 95): 1.2, ("444", 75): 2.5,
             ("420", 95): 3.0, ("420", 75): 4.0}[(subsample, quality)]
    assert err.mean() < bound, err.mean()


def test_roundtrip_odd_dimensions():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (33, 27, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(rgb, quality=90, subsample=sub))
        assert out.shape == (33, 27, 3)


def test_restart_markers_roundtrip():
    """DRI/RSTn: encoder emits restarts, decoder resets DC predictors at
    each — the result must equal the restart-free decode exactly."""
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(rgb, quality=85, subsample="420"))
    with_rst = encode_jpeg(
        rgb, quality=85, subsample="420", restart_interval=3
    )
    assert b"\xff\xdd" in with_rst  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in with_rst for i in range(8))
    assert np.array_equal(decode_jpeg(with_rst), plain)


def test_solid_color_exact():
    """Solid colors survive high-quality round-trip near-exactly (DC-only
    blocks; chroma rounding may move values by <=1)."""
    for color in [(255, 0, 0), (0, 128, 255), (17, 200, 90)]:
        rgb = np.full((16, 16, 3), color, np.uint8)
        out = decode_jpeg(encode_jpeg(rgb, quality=100))
        assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2


def test_baseline_scan_relabeled_sof2_rejected():
    """A sequential scan header (Ss=0, Se=63) inside a SOF2 frame is
    malformed progressive — a DC scan must have Se=0 (T.81 G.1.1.1.1);
    it must raise, not mis-decode. (SOF2 itself is supported — see
    tests/test_jpeg_progressive.py.)"""
    rng = np.random.default_rng(1)
    data = bytearray(encode_jpeg(rng.integers(0, 256, (8, 8), np.uint8)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan must have Se=0"):
        decode_jpeg(bytes(data))


def test_arithmetic_and_hierarchical_rejected():
    """SOF9 (arithmetic) and SOF5 (hierarchical) still raise."""
    rng = np.random.default_rng(1)
    base = encode_jpeg(rng.integers(0, 256, (8, 8), np.uint8))
    for sof in (0xC9, 0xC5):
        data = bytearray(base)
        idx = bytes(data).find(b"\xff\xc0")
        data[idx + 1] = sof
        with pytest.raises(ValueError, match="unsupported JPEG profile"):
            decode_jpeg(bytes(data))


def test_non_interleaved_scan_rejected():
    """A 3-component frame with a 1-component SOS (non-interleaved
    baseline) must raise, not silently decode a single plane."""
    rng = np.random.default_rng(4)
    data = bytearray(
        encode_jpeg(rng.integers(0, 256, (16, 16, 3), np.uint8))
    )
    idx = bytes(data).find(b"\xff\xda")
    # rewrite the SOS to name only component 1
    seglen = struct.unpack_from(">H", data, idx + 2)[0]
    new_sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    data[idx : idx + 2 + seglen] = new_sos
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(bytes(data))


def test_truncated_and_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # no scan


def test_decode_image_dispatches_jpeg():
    img = np.full((8, 8), 200, np.uint8)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == (8, 8, 1)
    assert np.abs(out.astype(int) - 200).max() <= 1


def test_resize_to_jpeg_roundtrip(ray_session):
    """resize_images(out_format='jpeg'): payloads come back as decodable
    JPEGs at the target dimensions."""
    import ray.data

    from tbl_ray.stages.multimodal import formula_image_table, resize_images

    ds = ray.data.from_arrow(formula_image_table(8)).repartition(2)
    out = resize_images(
        ds, 20, 14, strict=True, out_format="jpeg", concurrency=2
    ).take_all()
    assert len(out) == 8
    for r in out:
        assert r["payload"][:2] == b"\xff\xd8"
        px = decode_jpeg(r["payload"])
        assert px.shape == (14, 20, 3)
        assert (r["width"], r["height"]) == (20, 14)


def test_image_decode_stage_with_jpeg_payloads(ray_session):
    """The actor-pool decode stage handles real JPEG media rows in
    strict mode (no checksum-fake fallback)."""
    import pyarrow as pa
    import ray.data

    from tbl_ray.stages.multimodal import MEDIA_SCHEMA, decode_images

    rows = []
    for i in range(12):
        w, h = 16 + i, 24 + i
        yy, xx = np.mgrid[0:h, 0:w]
        rgb = np.stack(
            [(xx * 9 + i) % 256, (yy * 7) % 256, (xx + yy) % 256], axis=2
        ).astype(np.uint8)
        rows.append(encode_jpeg(rgb, quality=90, subsample="420"))
    t = pa.table(
        {
            "media_id": pa.array(range(12), pa.int64()),
            "payload": pa.array(rows, pa.large_binary()),
            "mime": pa.array(["image/jpeg"] * 12),
            "meta": pa.array(["{}"] * 12),
        },
        schema=MEDIA_SCHEMA,
    )
    out = decode_images(
        ray.data.from_arrow(t).repartition(3), strict=True, concurrency=2
    ).take_all()
    assert len(out) == 12
    for i, r in enumerate(sorted(out, key=lambda r: r["media_id"])):
        assert (r["width"], r["height"]) == (16 + i, 24 + i)


def test_decode_image_never_escapes_valueerror_on_garbage():
    """Crawled corpora contain truncated/corrupt media: random bytes
    behind each supported magic must either decode or raise ValueError
    — never IndexError/struct.error/zlib.error, which would bypass the
    decode-stage error policies (on_error='null'/'fake')."""
    from tbl_ray.stages.imagecodec import decode_image

    rng = np.random.default_rng(99)
    magics = [b"\xff\xd8", b"\x89PNG\r\n\x1a\n", b"BM"]
    for trial in range(400):
        m = magics[trial % 3]
        n = int(rng.integers(0, 160))
        data = m + bytes(rng.integers(0, 256, n).tolist())
        try:
            decode_image(data)
        except ValueError:
            pass


def test_corrupt_sof_zero_sampling_factor_is_valueerror():
    """A flipped hv byte (h or v = 0) must funnel to ValueError — the
    on_error decode policies catch ValueError, and a ZeroDivisionError
    would kill the task instead of nulling the row."""
    rng = np.random.default_rng(7)
    data = bytearray(encode_jpeg(rng.integers(0, 256, (16, 16, 3), np.uint8)))
    idx = bytes(data).find(b"\xff\xc0")
    assert idx >= 0
    # SOF0: marker(2) len(2), payload prec(1) h(2) w(2) nc(1), comp (id hv tq)
    hv_off = idx + 4 + 6 + 1
    for bad in (0x00, 0x10, 0x01):
        patched = bytearray(data)
        patched[hv_off] = bad
        with pytest.raises(ValueError, match="sampling factor"):
            decode_jpeg(bytes(patched))


def test_corrupt_sof_zero_dims_is_valueerror():
    rng = np.random.default_rng(8)
    data = bytearray(encode_jpeg(rng.integers(0, 256, (8, 8, 3), np.uint8)))
    idx = bytes(data).find(b"\xff\xc0")
    patched = bytearray(data)
    struct.pack_into(">H", patched, idx + 5, 0)  # h = 0
    with pytest.raises(ValueError, match="zero dimensions"):
        decode_jpeg(bytes(patched))


def test_corrupt_sof_component_count_is_valueerror():
    """nc is a raw byte: 255 components x ~8*w*h coefficient bytes each
    would pass the pixel budget yet request ~100 GB — the component
    count must be bounded to JFIF practice (1-4) before any allocation,
    and a short segment must funnel to ValueError, not struct.error."""
    rng = np.random.default_rng(12)
    data = bytearray(encode_jpeg(rng.integers(0, 256, (8, 8, 3), np.uint8)))
    idx = bytes(data).find(b"\xff\xc0")
    # SOF0: marker(2) len(2), payload prec(1) h(2) w(2) nc(1)
    # 2 (malformed) and 4 (Adobe CMYK/YCCK — needs the unparsed APP14
    # transform flag) must also funnel: a fixed 3-plane color convert
    # would otherwise raise TypeError, which the on_error policies do
    # NOT catch
    for bad_nc in (0, 2, 4, 5, 255):
        patched = bytearray(data)
        patched[idx + 9] = bad_nc
        with pytest.raises(ValueError, match="components"):
            decode_jpeg(bytes(patched))


def test_sof_pixel_budget_guard(monkeypatch):
    """Header-claimed dimensions are validated BEFORE any allocation —
    a corrupt 65535x65535 header must raise, not OOM the worker."""
    rng = np.random.default_rng(9)
    data = bytearray(encode_jpeg(rng.integers(0, 256, (16, 16, 3), np.uint8)))
    monkeypatch.setenv("TBL_RAY_MAX_JPEG_PIXELS", "100")
    with pytest.raises(ValueError, match="pixel budget"):
        decode_jpeg(bytes(data))
    monkeypatch.delenv("TBL_RAY_MAX_JPEG_PIXELS")
    idx = bytes(data).find(b"\xff\xc0")
    patched = bytearray(data)
    struct.pack_into(">HH", patched, idx + 5, 0xFFFF, 0xFFFF)
    with pytest.raises(ValueError, match="pixel budget"):
        decode_jpeg(bytes(patched))


def test_corrupt_sof_null_policy_emits_null_row():
    """The full funnel: a zero-sampling-factor JPEG under
    on_error="null" produces a null row with decode_error set, never a
    task-killing exception."""
    from tbl_ray.stages.imagecodec import decode_image

    rng = np.random.default_rng(10)
    data = bytearray(encode_jpeg(rng.integers(0, 256, (16, 16, 3), np.uint8)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 4 + 6 + 1] = 0x00
    with pytest.raises(ValueError):
        decode_image(bytes(data))


def test_native_entropy_parity_large_image(monkeypatch):
    """The C entropy kernel must produce byte-identical pixels to the
    pure-Python _BitReader/_decode_block walk — photo-like 100KB+
    fixture, 4:2:0 subsampling, restart markers, optimized Huffman."""
    from tbl_ray.stages import jpegcodec

    if jpegcodec._native_lib() is None:
        pytest.skip("no C compiler on this host")
    rng = np.random.default_rng(21)
    y, x = np.mgrid[0:360, 0:560]
    img = np.stack(
        [
            (127 + 80 * np.sin(x / 37) + rng.normal(0, 14, x.shape)).clip(0, 255),
            (127 + 60 * np.cos(y / 23) + rng.normal(0, 14, x.shape)).clip(0, 255),
            (127 + 70 * np.sin((x + y) / 41) + rng.normal(0, 14, x.shape)).clip(0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    for kw in (
        dict(quality=85),
        dict(quality=70, subsample="420", restart_interval=5),
        dict(quality=90, optimize=True),
    ):
        data = jpegcodec.encode_jpeg(img, **kw)
        assert len(data) > 100_000 or kw.get("subsample") == "420"
        native_px = jpegcodec.decode_jpeg(data)
        monkeypatch.setattr(jpegcodec, "_native_lib", lambda: None)
        python_px = jpegcodec.decode_jpeg(data)
        monkeypatch.undo()
        assert np.array_equal(native_px, python_px), kw


def test_corrupt_dht_dc_category_is_valueerror():
    """A DC-class DHT value byte > 15 would demand a 255-bit magnitude
    read — undefined-shift territory in the C kernel, OverflowError in
    the numpy walk. Both are forbidden: the table must be rejected at
    parse time as a ValueError inside the on_error funnel."""
    rng = np.random.default_rng(21)
    data = bytearray(encode_jpeg(rng.integers(0, 256, (16, 16, 3), np.uint8)))
    # first DHT segment: marker(2) len(2) tc/th(1) bits(16) values...
    idx = bytes(data).find(b"\xff\xc4")
    assert idx >= 0
    tc = data[idx + 4] >> 4
    assert tc == 0, "expected the first DHT to be a DC table"
    bits = data[idx + 5 : idx + 21]
    assert sum(bits) >= 1
    patched = bytearray(data)
    patched[idx + 21] = 200  # first value byte: absurd DC category
    with pytest.raises(ValueError, match="DC category"):
        decode_jpeg(bytes(patched))


def test_second_sof_is_valueerror():
    """T.81 allows exactly one frame per image. A second SOF after the
    first scan would reassign the geometry while the progressive
    coefficient store still has the old frame's shape — the native
    scan schedule would compute block offsets past the store's
    allocation (an unbounded C heap write). Must reject at parse."""
    rng = np.random.default_rng(31)
    data = bytes(encode_jpeg(rng.integers(0, 256, (16, 16, 3), np.uint8)))
    idx = data.find(b"\xff\xc0")
    assert idx >= 0
    (seglen,) = struct.unpack_from(">H", data, idx + 2)
    sof_seg = bytearray(data[idx : idx + 2 + seglen])
    # claim a much larger frame in the duplicate: the stale-store mix
    # is exactly what the reject must prevent
    struct.pack_into(">HH", sof_seg, 5, 4000, 4000)
    sos = data.find(b"\xff\xda")
    assert sos > idx
    patched = data[:sos] + bytes(sof_seg) + data[sos:]
    with pytest.raises(ValueError, match="multiple JPEG SOF"):
        decode_jpeg(patched)


def test_duplicate_scan_component_is_valueerror():
    """T.81 B.2.3: scan components must be distinct. With a duplicate,
    the Python walk shares one DC prediction across both entries while
    the C kernel keeps per-slot predictions — silently divergent
    pixels. The parser must reject the scan instead."""
    rng = np.random.default_rng(32)
    data = bytes(encode_jpeg(rng.integers(0, 256, (16, 16, 3), np.uint8)))
    idx = data.find(b"\xff\xda")
    assert idx >= 0
    # SOS: marker(2) len(2) ns(1) then (cs tt) pairs
    assert data[idx + 4] == 3
    patched = bytearray(data)
    patched[idx + 7] = patched[idx + 5]  # second cs := first cs
    with pytest.raises(ValueError, match="duplicate component"):
        decode_jpeg(bytes(patched))
