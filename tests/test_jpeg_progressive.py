"""Progressive JPEG (SOF2) decode + encode (tbl_ray/stages/jpegcodec.py).

Verification strategy: ``encode_jpeg_progressive`` shares the whole
color/subsample/quantization front half with the baseline encoder, so a
correct progressive decode must reconstruct EXACTLY the same quantized
coefficients — ``decode(progressive(img)) == decode(baseline(img))``
pixel-for-pixel.  That oracle covers DC first/refine, AC band first
scans with EOB runs, and the correction-bit refinement paths without
any external fixture.  A hand-assembled DC-only fixture pins the bit
layout independently of the encoder.

Reference parity: the reference engine treats media payloads as opaque
binary (SURVEY §8.5); the codec itself follows ITU-T T.81 Annex G.
"""

import numpy as np
import pytest

from tbl_ray.stages.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _rand_rgb(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize(
    "h,w", [(8, 8), (16, 16), (17, 33), (40, 24), (64, 48)]
)
def test_progressive_equals_baseline_color(h, w, subsample):
    img = _rand_rgb(h, w, seed=h * 100 + w)
    base = decode_jpeg(encode_jpeg(img, quality=85, subsample=subsample))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=85, subsample=subsample)
    )
    assert prog.shape == base.shape == (h, w, 3)
    assert np.array_equal(prog, base)


@pytest.mark.parametrize("h,w", [(8, 8), (15, 22), (32, 32)])
def test_progressive_equals_baseline_gray(h, w):
    img = np.random.default_rng(7).integers(0, 256, (h, w), np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=90))
    assert np.array_equal(prog, base)


@pytest.mark.parametrize("quality", [30, 75, 95])
def test_progressive_equals_baseline_quality_sweep(quality):
    img = _rand_rgb(24, 40, seed=quality)
    base = decode_jpeg(encode_jpeg(img, quality=quality, subsample="420"))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=quality, subsample="420")
    )
    assert np.array_equal(prog, base)


def test_progressive_flat_image_exercises_eob_runs():
    """A flat image quantizes every AC coefficient to zero, so the AC
    first scans are one long EOB run spanning all blocks (EOBn with
    n > 0 — symbols the baseline Annex K tables cannot even express)."""
    img = np.full((64, 64, 3), 130, np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=85, subsample="420"))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=85, subsample="420")
    )
    assert np.array_equal(prog, base)


def test_progressive_sparse_blocks_mixed_eob_runs():
    """Mostly-flat image with a few textured blocks: EOB runs interleave
    with coded blocks, covering run-break/resume in both scan kinds."""
    img = np.full((48, 48, 3), 90, np.uint8)
    rng = np.random.default_rng(3)
    img[16:24, 32:40] = rng.integers(0, 256, (8, 8, 3), np.uint8)
    img[40:48, 0:8] = rng.integers(0, 256, (8, 8, 3), np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=85, subsample="444"))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=85, subsample="444")
    )
    assert np.array_equal(prog, base)


def test_progressive_dc_only_script_gives_blockwise_constant_preview():
    """A partial (DC-only) script is a legal progressive stream; the
    decode is the coarse preview: every 8x8 block is constant."""
    img = _rand_rgb(32, 32, seed=11)
    data = encode_jpeg_progressive(
        img, quality=85, subsample="444",
        scans=[([0, 1, 2], 0, 0, 0, 1), ([0, 1, 2], 0, 0, 1, 0)],
    )
    out = decode_jpeg(data)
    assert out.shape == (32, 32, 3)
    blocks = out.reshape(4, 8, 4, 8, 3)
    for by in range(4):
        for bx in range(4):
            blk = blocks[by, :, bx, :, :]
            assert (blk == blk[0, 0]).all()


def test_progressive_custom_single_precision_script():
    """Spectral selection without successive approximation (all Ah=Al=0)
    must also round-trip to the baseline pixels."""
    img = _rand_rgb(16, 24, seed=5)
    scans = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    base = decode_jpeg(encode_jpeg(img, quality=85, subsample="444"))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=85, subsample="444", scans=scans)
    )
    assert np.array_equal(prog, base)


def test_progressive_handmade_dc_fixture():
    """Hand-assembled SOF2 stream, worked bit by bit (independent of our
    encoder): one 8x8 gray block, flat DQT=16, DC-first scan at Al=1
    coding diff=+3 then a DC refinement bit of 1 -> DC = 3*2+1 = 7.
    IDCT of DC-only: round(16*7/8 + 128) = 142 everywhere.

    DC table: category t coded in t+1 '1'-bits-then-0? No — use the
    canonical table bits=[0,1,1,1,...]: cat0='0', cat1='10', cat2='110',
    cat3='1110'.  First scan: cat2 '110' + bits '11' (diff=+3).
    Refinement scan: single raw bit '1'."""
    dqt = bytes([0xFF, 0xDB, 0x00, 0x43, 0x00]) + bytes([16] * 64)
    sof = bytes([0xFF, 0xC2, 0x00, 0x0B, 0x08, 0x00, 0x08, 0x00, 0x08,
                 0x01, 0x01, 0x11, 0x00])
    bits = [1, 1, 1, 1] + [0] * 12
    vals = [0, 1, 2, 3]
    dht = bytes([0xFF, 0xC4, 0x00, 2 + 17 + 4, 0x00]) + bytes(bits) + bytes(
        vals
    )
    sos1 = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00,
                  0x00, 0x00, 0x01])  # Ss=0 Se=0 Ah=0 Al=1
    ecs1 = bytes([0b11011_111])  # '110' cat2, '11' = +3, pad 1s
    sos2 = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00,
                  0x00, 0x00, 0x10])  # Ss=0 Se=0 Ah=1 Al=0
    # refinement bit 1, zero padding (an all-1s pad byte would be 0xFF,
    # which needs stuffing — keep the fixture bytes marker-free)
    ecs2 = bytes([0b1_0000000])
    data = (b"\xff\xd8" + dqt + sof + dht + sos1 + ecs1 + sos2 + ecs2
            + b"\xff\xd9")
    out = decode_jpeg(data)
    assert out.shape == (8, 8, 1)
    assert (out == 142).all()


def test_progressive_negative_dc_refinement():
    """Negative DC successive approximation: first scan codes -2 at
    Al=1 (arithmetic shift of -3), stored as -4; the refinement bit 1
    ORs 2^0 into two's complement -> -3.  DC=-3, DQT=16: pixels =
    round(-3*16/8 + 128) = 122."""
    dqt = bytes([0xFF, 0xDB, 0x00, 0x43, 0x00]) + bytes([16] * 64)
    sof = bytes([0xFF, 0xC2, 0x00, 0x0B, 0x08, 0x00, 0x08, 0x00, 0x08,
                 0x01, 0x01, 0x11, 0x00])
    bits = [1, 1, 1, 1] + [0] * 12
    vals = [0, 1, 2, 3]
    dht = bytes([0xFF, 0xC4, 0x00, 2 + 17 + 4, 0x00]) + bytes(bits) + bytes(
        vals
    )
    sos1 = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00,
                  0x00, 0x00, 0x01])
    # cat2 '110' + mag bits for -2 at t=2: _mag_bits(-2,2) = 01
    ecs1 = bytes([0b11001_111])
    sos2 = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00,
                  0x00, 0x00, 0x10])
    ecs2 = bytes([0b1_0000000])
    data = (b"\xff\xd8" + dqt + sof + dht + sos1 + ecs1 + sos2 + ecs2
            + b"\xff\xd9")
    out = decode_jpeg(data)
    assert (out == 122).all()


def test_progressive_malformed_scans_rejected():
    img = _rand_rgb(16, 16, seed=1)
    with pytest.raises(ValueError, match="single-component"):
        encode_jpeg_progressive(
            img, scans=[([0, 1, 2], 0, 0, 0, 0), ([0, 1], 1, 63, 0, 0)]
        )
    with pytest.raises(ValueError, match="Se=0"):
        encode_jpeg_progressive(img, scans=[([0], 0, 5, 0, 0)])
    # decoder side: interleaved AC scan is malformed
    good = encode_jpeg_progressive(img)
    # build a bogus interleaved AC SOS in a SOF2 frame by hand
    dqt = bytes([0xFF, 0xDB, 0x00, 0x43, 0x00]) + bytes([16] * 64)
    sof = bytes([0xFF, 0xC2, 0x00, 0x11, 0x08, 0x00, 0x10, 0x00, 0x10,
                 0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11,
                 0x00])
    sos = bytes([0xFF, 0xDA, 0x00, 0x0C, 0x03, 0x01, 0x00, 0x02, 0x00,
                 0x03, 0x00, 0x01, 0x3F, 0x00])
    bogus = b"\xff\xd8" + dqt + sof + sos + b"\x00" + b"\xff\xd9"
    with pytest.raises(ValueError, match="single-component"):
        decode_jpeg(bogus)
    assert decode_jpeg(good).shape == (16, 16, 3)


def test_progressive_random_scan_scripts_property():
    """Adversarial coverage: random spectral-band partitions, random
    starting precisions, interleaved per-component scan orders — every
    legal script must reconstruct the exact baseline pixels.

    (Plain randomized rounds rather than hypothesis: the input is a
    compound structure — image x subsample x script — where shrinking
    adds little; seeds are fixed for reproducibility.)"""
    rng = np.random.default_rng(20240818)
    for round_i in range(12):
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        subsample = ["444", "420"][int(rng.integers(0, 2))]
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        ncomp = 3

        # per-component scan chains, then a random legal interleave
        chains = []
        dc_al = int(rng.integers(0, 3))
        dc_chain = [([0, 1, 2], 0, 0, 0, dc_al)]
        for al in range(dc_al - 1, -1, -1):
            dc_chain.append(([0, 1, 2], 0, 0, al + 1, al))
        chains.append(dc_chain)
        for ci in range(ncomp):
            # random contiguous partition of 1..63
            n_splits = int(rng.integers(0, 3))
            cuts = sorted(
                set(rng.integers(2, 63, size=n_splits).tolist())
            )
            bounds = [1] + cuts + [64]
            chain = []
            for b0, b1 in zip(bounds[:-1], bounds[1:]):
                al0 = int(rng.integers(0, 3))
                chain.append(([ci], b0, b1 - 1, 0, al0))
                for al in range(al0 - 1, -1, -1):
                    chain.append(([ci], b0, b1 - 1, al + 1, al))
            chains.append(chain)
        # random merge preserving each chain's internal order
        script = []
        idx = [0] * len(chains)
        while any(i < len(c) for i, c in zip(idx, chains)):
            live = [j for j, c in enumerate(chains) if idx[j] < len(c)]
            j = live[int(rng.integers(0, len(live)))]
            script.append(chains[j][idx[j]])
            idx[j] += 1

        base = decode_jpeg(encode_jpeg(img, quality=80, subsample=subsample))
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, quality=80, subsample=subsample, scans=script
            )
        )
        assert np.array_equal(prog, base), (
            f"round {round_i}: h={h} w={w} sub={subsample} "
            f"script={script}"
        )


def test_progressive_dispatches_through_decode_image():
    from tbl_ray.stages.imagecodec import decode_image

    img = _rand_rgb(20, 28, seed=9)
    out = decode_image(encode_jpeg_progressive(img, quality=90))
    assert out.shape == (20, 28, 3)
    assert np.array_equal(
        out, decode_jpeg(encode_jpeg(img, quality=90))
    )


def test_optimized_huffman_tables():
    """Two-pass optimal tables (T.81 K.2): same quantized coefficients,
    so decode equality holds; the stream must shrink vs the fixed
    Annex K tables (baseline) and the flat tables (progressive)."""
    rng = np.random.default_rng(6)
    for shape, kw in [((48, 40, 3), {"subsample": "420"}),
                      ((33, 17, 3), {"subsample": "444"}),
                      ((24, 24), {})]:
        img = rng.integers(0, 256, shape, np.uint8)
        b0 = encode_jpeg(img, quality=85, **kw)
        b1 = encode_jpeg(img, quality=85, optimize=True, **kw)
        p0 = encode_jpeg_progressive(img, quality=85, optimize=False, **kw)
        p1 = encode_jpeg_progressive(img, quality=85, **kw)  # default on
        d0 = decode_jpeg(b0)
        assert np.array_equal(decode_jpeg(b1), d0)
        assert np.array_equal(decode_jpeg(p0), d0)
        assert np.array_equal(decode_jpeg(p1), d0)
        assert len(b1) < len(b0)
        assert len(p1) < 0.7 * len(p0)
    # restart markers + optimization together
    img = rng.integers(0, 256, (48, 48, 3), np.uint8)
    r = encode_jpeg(img, quality=85, subsample="420",
                    restart_interval=2, optimize=True)
    assert np.array_equal(
        decode_jpeg(r),
        decode_jpeg(encode_jpeg(img, quality=85, subsample="420")),
    )


def test_optimal_table_edge_distributions():
    """Single-symbol and empty frequency maps must yield valid tables
    (the all-ones code stays unassigned per T.81)."""
    from tbl_ray.stages.jpegcodec import _optimal_table

    bits, vals = _optimal_table({5: 1000})
    assert sum(bits) == 1 and vals == [5]
    bits, vals = _optimal_table({})
    assert sum(bits) == len(vals) == 1
    # highly skewed: many symbols, one dominant
    counts = {i: 1 for i in range(200)}
    counts[3] = 10**9
    bits, vals = _optimal_table(counts)
    assert sum(bits) == 200 and sorted(vals) == sorted(counts)
    assert all(0 <= b <= 255 for b in bits) and len(bits) == 16
    # flat image end-to-end: EOB-run dominated tables
    img = np.full((32, 32, 3), 130, np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img, subsample="420")),
        decode_jpeg(encode_jpeg(img, subsample="420")),
    )


def test_mixed_format_batch_through_decode_stage(ray_session):
    """One media table mixing BMP, plain + Adam7 PNG, and baseline +
    progressive JPEG rows, decoded strictly through the Ray actor-pool
    stage — per-row magic-sniff dispatch must get every format right
    in the same batch."""
    import pyarrow as pa
    import ray.data

    from tbl_ray.stages.imagecodec import encode_bmp, encode_png
    from tbl_ray.stages.multimodal import MEDIA_SCHEMA, decode_images

    rng = np.random.default_rng(21)
    payloads, mimes, dims = [], [], []
    for i in range(20):
        h, w = int(rng.integers(9, 30)), int(rng.integers(9, 30))
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        kind = i % 5
        if kind == 0:
            payloads.append(encode_bmp(img))
            mimes.append("image/bmp")
        elif kind == 1:
            payloads.append(encode_png(img))
            mimes.append("image/png")
        elif kind == 2:
            payloads.append(encode_png(img, interlace=True))
            mimes.append("image/png")
        elif kind == 3:
            payloads.append(encode_jpeg(img, quality=90))
            mimes.append("image/jpeg")
        else:
            payloads.append(encode_jpeg_progressive(img, quality=90))
            mimes.append("image/jpeg")
        dims.append((w, h))
    t = pa.table(
        {
            "media_id": pa.array(range(20), pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(mimes),
            "meta": pa.array(["{}"] * 20),
        },
        schema=MEDIA_SCHEMA,
    )
    out = decode_images(
        ray.data.from_arrow(t).repartition(4),
        strict=True,
        batch_size=5,
        concurrency=2,
    ).take_all()
    assert len(out) == 20
    for r in sorted(out, key=lambda r: r["media_id"]):
        w, h = dims[r["media_id"]]
        assert (r["width"], r["height"]) == (w, h), r["media_id"]


def test_progressive_dc_scan_with_restart_markers():
    """RSTn inside a progressive DC scan: the DC predictor must reset
    per restart segment (T.81 G.1.1).  Two 8x8 gray blocks, DRI=1:
    block 1 codes diff=+5, then RST0, then block 2 codes diff=+2
    against a RESET predictor -> DC values 5 and 2 (not 5 and 7).
    DQT=16: pixels round(DC*16/8)+128 = 138 and 132."""
    import struct as _struct

    dqt = bytes([0xFF, 0xDB, 0x00, 0x43, 0x00]) + bytes([16] * 64)
    # 8 rows x 16 cols, 1 component -> 2 MCUs
    sof = bytes([0xFF, 0xC2, 0x00, 0x0B, 0x08, 0x00, 0x08, 0x00, 0x10,
                 0x01, 0x01, 0x11, 0x00])
    bits = [1, 1, 1, 1] + [0] * 12  # cat0='0' cat1='10' cat2='110' cat3='1110'
    vals = [0, 1, 2, 3]
    dht = bytes([0xFF, 0xC4, 0x00, 2 + 17 + 4, 0x00]) + bytes(bits) + bytes(
        vals
    )
    dri = bytes([0xFF, 0xDD]) + _struct.pack(">HH", 4, 1)
    sos = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00,
                 0x00, 0x00, 0x00])  # DC first, Al=0
    ecs1 = bytes([0b1110101_0])  # cat3 '1110' + '101' (+5), pad 0
    rst0 = bytes([0xFF, 0xD0])
    ecs2 = bytes([0b110_10_000])  # cat2 '110' + '10' (+2), pad 0s
    data = (b"\xff\xd8" + dqt + sof + dht + dri + sos + ecs1 + rst0 + ecs2
            + b"\xff\xd9")
    out = decode_jpeg(data)
    assert out.shape == (8, 16, 1)
    assert (out[:, :8] == 138).all()   # DC 5 -> 10 + 128
    assert (out[:, 8:] == 132).all()   # DC 2 (predictor reset) -> 4 + 128


def test_decode_images_on_error_null_policy(ray_session):
    """on_error='null': corrupt payloads yield NULL dims/features plus a
    decode_error reason; good rows in the same batch decode normally —
    the corrupt-corpus policy (neither job death nor fabricated data)."""
    import pyarrow as pa
    import ray.data

    from tbl_ray.stages.multimodal import MEDIA_SCHEMA, decode_images

    rng = np.random.default_rng(31)
    payloads, good_dims = [], {}
    for i in range(12):
        if i % 3 == 2:
            payloads.append(b"\xff\xd8\xff" + bytes(rng.integers(0, 256, 40).tolist()))
        else:
            h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
            payloads.append(encode_jpeg(rng.integers(0, 256, (h, w, 3), np.uint8)))
            good_dims[i] = (w, h)
    t = pa.table(
        {
            "media_id": pa.array(range(12), pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["image/jpeg"] * 12),
            "meta": pa.array(["{}"] * 12),
        },
        schema=MEDIA_SCHEMA,
    )
    out = decode_images(
        ray.data.from_arrow(t), on_error="null", emit_sum=True,
        batch_size=4, concurrency=2,
    ).take_all()
    assert len(out) == 12
    for r in sorted(out, key=lambda r: r["media_id"]):
        i = r["media_id"]
        if i in good_dims:
            assert (r["width"], r["height"]) == good_dims[i]
            assert r["decode_error"] is None and r["sum_px"] is not None
        else:
            assert r["width"] is None and r["height"] is None
            assert r["sum_px"] is None and r["features"] is None
            assert r["decode_error"]  # non-empty reason

    # invalid policy rejected; strict shorthand still raises
    from tbl_ray.stages.multimodal import ImageDecode

    with pytest.raises(ValueError, match="on_error"):
        ImageDecode(on_error="bogus")
    with pytest.raises(Exception):
        decode_images(
            ray.data.from_arrow(t), strict=True, batch_size=4, concurrency=2
        ).take_all()


def test_native_progressive_parity_large_image(monkeypatch):
    """The C progressive-scan kernel must produce byte-identical pixels
    to the pure-Python scan walk across all four scan kinds (DC
    first/refine, AC first with EOB runs, AC refinement) — photo-like
    fixture, both subsample modes, optimized Huffman."""
    from tbl_ray.stages import jpegcodec

    if jpegcodec._native_lib() is None:
        pytest.skip("no C compiler on this host")
    rng = np.random.default_rng(33)
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
        dict(quality=70, subsample="420"),
        dict(quality=90, optimize=False),
    ):
        data = jpegcodec.encode_jpeg_progressive(img, **kw)
        native_px = jpegcodec.decode_jpeg(data)
        monkeypatch.setattr(jpegcodec, "_native_lib", lambda: None)
        python_px = jpegcodec.decode_jpeg(data)
        monkeypatch.undo()
        assert np.array_equal(native_px, python_px), kw
    # gray path + the hand restart fixture cover DRI; also pin a custom
    # partial script (DC-only) through the native path
    gray = img[:, :, 0]
    data = jpegcodec.encode_jpeg_progressive(
        gray, scans=[([0], 0, 0, 0, 0)]
    )
    native_px = jpegcodec.decode_jpeg(data)
    monkeypatch.setattr(jpegcodec, "_native_lib", lambda: None)
    python_px = jpegcodec.decode_jpeg(data)
    monkeypatch.undo()
    assert np.array_equal(native_px, python_px)


def test_second_sof2_after_scan_is_valueerror():
    """A crafted progressive stream with a second, larger SOF2 spliced
    between scans must be rejected at the marker — continuing would mix
    the new frame geometry with the first frame's coefficient store and
    (on the native path) write outside its allocation."""
    import struct

    img = _rand_rgb(24, 24, 33)
    data = bytes(encode_jpeg_progressive(img))
    idx = data.find(b"\xff\xc2")
    assert idx >= 0
    (seglen,) = struct.unpack_from(">H", data, idx + 2)
    sof_seg = bytearray(data[idx : idx + 2 + seglen])
    struct.pack_into(">HH", sof_seg, 5, 4000, 4000)
    # splice before the SECOND scan so the first scan has already run
    first_sos = data.find(b"\xff\xda")
    second_sos = data.find(b"\xff\xda", first_sos + 2)
    assert second_sos > first_sos > idx
    patched = data[:second_sos] + bytes(sof_seg) + data[second_sos:]
    with pytest.raises(ValueError, match="multiple JPEG SOF"):
        decode_jpeg(patched)


@pytest.mark.parametrize("subsample_comps", [
    # (h, v) per component: 4:4:4, 4:2:0, 4:2:2, and an asymmetric 1x2
    [(1, 1), (1, 1), (1, 1)],
    [(2, 2), (1, 1), (1, 1)],
    [(2, 1), (1, 1), (1, 1)],
    [(1, 2), (1, 1), (1, 1)],
])
@pytest.mark.parametrize("w,h", [(8, 8), (17, 9), (24, 40), (33, 31)])
def test_native_schedule_matches_scan_units(subsample_comps, w, h):
    """The C kernel's broadcast-built block schedule and the Python
    walk's per-unit lists are two independent implementations of the
    same T.81 geometry (interleaved A.2.3 + non-interleaved A.2.2).
    Pin them equal directly — across subsample modes and dims that are
    not MCU multiples — rather than only via end-to-end pixel tests.
    DC-refinement scan parameters (ss=0, ah=1) are used so the
    schedule needs no Huffman LUTs."""
    from tbl_ray.stages.jpegcodec import (
        _ProgressiveState,
        _prog_native_schedule,
        _scan_units,
    )

    comps = [
        {"id": i + 1, "h": hh, "v": vv, "tq": 0}
        for i, (hh, vv) in enumerate(subsample_comps)
    ]
    frame = {"h": h, "w": w, "comps": comps, "progressive": True}
    prog = _ProgressiveState(frame)
    scans = [[(c, 0, 0) for c in comps]]  # interleaved DC
    scans += [[(c, 0, 0)] for c in comps]  # one non-interleaved per comp
    for scan in scans:
        bcomp, bidx, bpu, luts = _prog_native_schedule(
            frame, scan, {}, prog, 0, 1
        )
        assert all(l is None for l in luts)
        units = _scan_units(frame, scan, prog)
        flat_py = [
            (k_slot, prog.base[ci] + bi)
            for u in units
            for k_slot, (ci, bi, _, _) in enumerate(u)
        ]
        if len(scan) > 1:
            # interleaved slots repeat per sampling factor; recompute
            # the slot label the schedule uses (scan position)
            flat_py = []
            for u in units:
                pos = 0
                taken = 0
                for ci, bi, _, _ in u:
                    c = scan[pos][0]
                    flat_py.append((pos, prog.base[ci] + bi))
                    taken += 1
                    if taken == c["h"] * c["v"]:
                        pos += 1
                        taken = 0
        assert bpu == len(units[0])
        assert list(bcomp) == [p for p, _ in flat_py]
        assert list(bidx) == [b for _, b in flat_py]
