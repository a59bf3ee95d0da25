"""Property-based codec round-trips (hypothesis): any values, any nulls,
any dtype in the supported set — decode(encode(x)) is bit-identical."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from tbl_ray.codecs import CODECS, decode_chunk, encode_array, encode_auto
from tbl_ray.codecs.base import arrays_identical, is_binary_like, is_fixed_primitive


def _roundtrip_ok(arr: pa.Array, codec: str) -> bool:
    chunk = encode_array(arr, codec, name="c")
    back = decode_chunk(type(chunk).from_payload(chunk.to_payload()))
    return arrays_identical(back, arr)


int_lists = st.lists(
    st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    max_size=300,
)
uint_lists = st.lists(
    st.one_of(st.none(), st.integers(min_value=0, max_value=2**64 - 1)),
    max_size=300,
)
float_lists = st.lists(
    st.one_of(
        st.none(),
        st.floats(allow_nan=True, allow_infinity=True, width=64),
    ),
    max_size=300,
)
text_lists = st.lists(st.one_of(st.none(), st.text(max_size=60)), max_size=200)
binary_lists = st.lists(
    st.one_of(st.none(), st.binary(max_size=60)), max_size=200
)
bool_lists = st.lists(st.one_of(st.none(), st.booleans()), max_size=300)


@settings(max_examples=40, deadline=None)
@given(values=int_lists)
def test_int64_all_codecs(values):
    arr = pa.array(values, type=pa.int64())
    for codec in ("for", "delta", "rle", "dict", "raw"):
        assert _roundtrip_ok(arr, codec), codec


@settings(max_examples=30, deadline=None)
@given(values=uint_lists)
def test_uint64_extremes(values):
    arr = pa.array(values, type=pa.uint64())
    for codec in ("for", "delta", "bitpack", "rle", "dict", "raw"):
        assert _roundtrip_ok(arr, codec), codec


@settings(max_examples=30, deadline=None)
@given(values=float_lists)
def test_float64_bit_identical(values):
    arr = pa.array(values, type=pa.float64())
    for codec in ("rle", "dict", "raw"):
        assert _roundtrip_ok(arr, codec), codec


@settings(max_examples=30, deadline=None)
@given(values=text_lists)
def test_strings_all_codecs(values):
    arr = pa.array(values, type=pa.string())
    for codec in ("fsst", "rle", "dict", "raw"):
        assert _roundtrip_ok(arr, codec), codec


@settings(max_examples=30, deadline=None)
@given(values=binary_lists)
def test_binary_fsst_escape_torture(values):
    # binary values exercise the 255-escape path heavily
    arr = pa.array(values, type=pa.binary())
    for codec in ("fsst", "rle", "dict", "raw"):
        assert _roundtrip_ok(arr, codec), codec


@settings(max_examples=25, deadline=None)
@given(values=bool_lists)
def test_bools(values):
    arr = pa.array(values, type=pa.bool_())
    for codec in ("bitpack", "for", "rle", "dict", "raw"):
        assert _roundtrip_ok(arr, codec), codec


@settings(max_examples=25, deadline=None)
@given(
    values=st.lists(
        st.one_of(st.none(), st.integers(0, 2**44)), max_size=200
    )
)
def test_timestamps(values):
    arr = pa.array(values, type=pa.int64()).cast(pa.timestamp("us"))
    for codec in ("for", "rle", "dict", "raw"):
        assert _roundtrip_ok(arr, codec), codec


@settings(max_examples=25, deadline=None)
@given(values=st.one_of(int_lists, text_lists, float_lists, binary_lists))
def test_encode_auto_any(values):
    arr = pa.array(values)
    chunk = encode_auto(arr)
    back = decode_chunk(type(chunk).from_payload(chunk.to_payload()))
    assert arrays_identical(back, arr)


# ---------------------------------------------------------------------------
# media codecs (round 2): BMP / PNG / WAV round-trips under hypothesis
# ---------------------------------------------------------------------------

from hypothesis import strategies as st

from tbl_ray.stages.imagecodec import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
)


@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_bmp_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@given(
    st.integers(1, 32),
    st.integers(1, 32),
    st.sampled_from([1, 3, 4]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_png_roundtrip_property(h, w, c, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


@given(
    st.integers(1, 5000),
    st.sampled_from([1, 2]),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_wav_roundtrip_property(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    back, r = decode_wav(encode_wav(pcm, rate))
    assert r == rate and np.array_equal(back, pcm)
