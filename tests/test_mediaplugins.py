"""Pluggable media-codec seam (tbl_ray/stages/mediaplugins.py): external
decoders slot into the decode stages without forking them; the checksum
fake stays quarantined behind on_error="fake"."""

import struct
import sys

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tbl_ray.stages.imagecodec import encode_bmp, encode_wav
from tbl_ray.stages.mediaplugins import (
    MediaDecoder,
    pick_decoder,
    register_media_decoder,
    registered_decoders,
    unregister_media_decoder,
)
from tbl_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    decode_audio,
    resolve_media_decoders,
    sample_frames,
)


def _toy_encode(pcm: np.ndarray, rate: int) -> bytes:
    return b"TOY1" + struct.pack("<I", rate) + pcm.astype("<i2").tobytes()


def _make_toy() -> MediaDecoder:
    # CLOSURES, not module-level functions: cloudpickle ships closures by
    # value, while test-module top-level functions pickle by reference —
    # and Ray workers cannot import the test module, so a by-reference
    # decoder would kill the actor constructor in a restart loop
    def sniff(data: bytes, mime) -> bool:
        return data[:4] == b"TOY1"

    def decode(data: bytes):
        if data[:4] != b"TOY1" or len(data) < 8:
            raise ValueError("not a TOY1 payload")
        (rate,) = struct.unpack_from("<I", data, 4)
        pcm = np.frombuffer(data, dtype="<i2", offset=8).reshape(-1, 1)
        return pcm, rate

    return MediaDecoder("toy-audio", "audio", sniff, decode)


TOY = _make_toy()


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    unregister_media_decoder("toy-audio")
    unregister_media_decoder("toy-video")
    unregister_media_decoder("img-override")


def _audio_table(payloads: list[bytes]) -> pa.Table:
    n = len(payloads)
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["audio/x-toy"] * n),
            "meta": pa.array(["{}"] * n),
        },
        schema=MEDIA_SCHEMA,
    )


def test_registered_audio_decoder_decodes_through_ray(ray_session):
    """A registered decoder real-decodes its format inside the actor
    pool (the chain ships via constructor args), alongside builtin WAV
    rows in the same dataset."""
    register_media_decoder(TOY)
    rate, length = 8000, 1600
    pcm = (np.sin(np.arange(length) / 20) * 9000).astype(np.int16)
    payloads = [_toy_encode(pcm, rate), encode_wav(pcm, rate)]
    out = decode_audio(
        ray.data.from_arrow(_audio_table(payloads)), strict=True, emit_sum=True
    ).take_all()
    by_id = {r["media_id"]: r for r in out}
    expect = int(pcm.astype(np.int64).sum())
    for i in (0, 1):
        assert by_id[i]["sample_rate"] == rate
        assert by_id[i]["n_samples"] == length
        assert by_id[i]["sum_pcm"] == expect


def test_unclaimed_payload_raises_in_strict_mode(ray_session):
    ds = ray.data.from_arrow(_audio_table([b"TOY1-but-not-registered"]))
    with pytest.raises(Exception, match="no registered decoder"):
        decode_audio(ds, strict=True).take_all()
    # default mode: nulls-with-zero-features, never fabricated values
    out = decode_audio(ds, strict=False).take_all()
    assert out[0]["sample_rate"] == 0 and out[0]["n_samples"] == 0


def test_registration_semantics():
    register_media_decoder(TOY)
    with pytest.raises(ValueError, match="already registered"):
        register_media_decoder(TOY)
    register_media_decoder(TOY, replace=True)  # swap ok
    assert [d.name for d in registered_decoders("audio")] == ["toy-audio"]
    assert unregister_media_decoder("toy-audio")
    assert not unregister_media_decoder("toy-audio")
    with pytest.raises(ValueError, match="kind"):
        MediaDecoder("x", "smell", TOY.sniff, TOY.decode)
    with pytest.raises(TypeError):
        register_media_decoder(lambda d: d)  # the fake can't sneak in


def test_plugin_takes_precedence_over_builtin():
    """A registered image decoder is probed BEFORE the numpy builtin —
    the libjpeg-turbo takeover path."""
    marker = np.full((4, 4, 3), 7, np.uint8)
    override = MediaDecoder(
        "img-override", "image",
        lambda d, m: d[:2] == b"BM", lambda d: marker,
    )
    register_media_decoder(override)
    chain = resolve_media_decoders("image")
    assert [d.name for d in chain] == ["img-override", "builtin-image"]
    bmp = encode_bmp(np.zeros((8, 8, 3), np.uint8))
    picked = pick_decoder(chain, bmp, None)
    assert picked.name == "img-override"
    assert picked.decode(bmp) is marker


def test_env_plugin_module_loading(tmp_path, monkeypatch):
    mod = tmp_path / "fake_media_plugin.py"
    mod.write_text(
        "from tbl_ray.stages.mediaplugins import MediaDecoder\n"
        "MEDIA_DECODERS = [MediaDecoder('plugin-audio', 'audio',\n"
        "    lambda d, m: d[:4] == b'PLUG', lambda d: (None, 1))]\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setenv("TBL_RAY_MEDIA_PLUGINS", "fake_media_plugin")
    names = [d.name for d in resolve_media_decoders("audio")]
    assert names == ["plugin-audio", "builtin-wav"]
    # import failures raise (a silently missing codec would corrupt the
    # run with fake/null rows)
    monkeypatch.setenv("TBL_RAY_MEDIA_PLUGINS", "no_such_plugin_module")
    with pytest.raises(ModuleNotFoundError):
        resolve_media_decoders("audio")
    sys.modules.pop("fake_media_plugin", None)


def _make_tvid() -> MediaDecoder:
    def decode(data: bytes):  # closure: ships by value (see _make_toy)
        if data[:4] != b"TVID":
            raise ValueError("not TVID")
        (count,) = struct.unpack_from("<I", data, 4)
        lens = struct.unpack_from(f"<{count}I", data, 8)
        frames, off = [], 8 + 4 * count
        for ln in lens:
            frames.append(data[off : off + ln])
            off += ln
        return frames

    return MediaDecoder("toy-video", "video", lambda d, m: d[:4] == b"TVID", decode)


def test_video_plugin_named_builtin_frames_uses_own_decode(ray_session):
    """Seek-path routing is by decode-callable IDENTITY, not name: a
    plugin that registers under the name 'builtin-frames' for a foreign
    container must have ITS decode called, not be misrouted through the
    builtin container's O(1)-seek unpack."""
    tvid = _make_tvid()
    register_media_decoder(
        MediaDecoder("builtin-frames", "video", tvid.sniff, tvid.decode)
    )
    try:
        frames = [
            encode_bmp(np.full((4, 3, 3), 20 * i, np.uint8)) for i in range(4)
        ]
        payload = (
            b"TVID" + struct.pack("<I", len(frames))
            + b"".join(struct.pack("<I", len(f)) for f in frames)
            + b"".join(frames)
        )
        t = pa.table(
            {
                "media_id": pa.array([0], pa.int64()),
                "payload": pa.array([payload], pa.large_binary()),
                "mime": pa.array(["video/x-tvid"]),
                "meta": pa.array(["{}"]),
            },
            schema=MEDIA_SCHEMA,
        )
        # strict: the pre-fix name-routed path raised 'not a frame container'
        out = sample_frames(ray.data.from_arrow(t), 2, strict=True).take_all()
        assert sorted(r["frame_index"] for r in out) == [0, 2]
        assert all(r["width"] == 3 and r["height"] == 4 for r in out)
    finally:
        unregister_media_decoder("builtin-frames")


def test_video_plugin_samples_external_format(ray_session):
    """A video-kind plugin decodes a foreign container; FrameSample
    samples its frames through the image chain."""
    register_media_decoder(_make_tvid())
    frames = [
        encode_bmp(np.full((6, 5, 3), 10 * i, np.uint8)) for i in range(6)
    ]
    payload = (
        b"TVID" + struct.pack("<I", len(frames))
        + b"".join(struct.pack("<I", len(f)) for f in frames)
        + b"".join(frames)
    )
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([payload], pa.large_binary()),
            "mime": pa.array(["video/x-tvid"]),
            "meta": pa.array(["{}"]),
        },
        schema=MEDIA_SCHEMA,
    )
    out = sample_frames(ray.data.from_arrow(t), 3, strict=True).take_all()
    assert sorted(r["frame_index"] for r in out) == [0, 2, 4]
    assert all(r["width"] == 5 and r["height"] == 6 for r in out)
