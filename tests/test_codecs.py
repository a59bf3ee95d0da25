"""Round-trip suite: decode(encode(col)) bit-identical for every codec ×
dtype × null pattern (BASELINE.md correctness target; SURVEY.md §5.2)."""

import numpy as np
import pyarrow as pa
import pytest

from tbl_ray.codecs import (
    CODECS,
    EncodedChunk,
    choose_codec,
    column_stats,
    decode_chunk,
    encode_array,
    encode_auto,
)
from tbl_ray.codecs.base import arrays_identical

rng = np.random.default_rng(42)


def _roundtrip(arr: pa.Array, codec: str) -> EncodedChunk:
    chunk = encode_array(arr, codec, name="c")
    payload = chunk.to_payload()
    back = decode_chunk(EncodedChunk.from_payload(payload))
    assert back.type.equals(arr.type), f"{codec}: {back.type} != {arr.type}"
    assert arrays_identical(back, arr), f"{codec} round-trip mismatch for {arr.type}"
    return chunk


INT_ARRAYS = [
    pa.array([1, 2, 3, 4, 5], type=pa.int64()),
    pa.array([0, 0, 0, 7, 7, 7, 7, 1], type=pa.int32()),
    pa.array([-(2**63), 2**63 - 1, 0, -1, 17], type=pa.int64()),
    pa.array([2**64 - 1, 0, 2**63, 5], type=pa.uint64()),
    pa.array(rng.integers(0, 255, 1000), type=pa.uint8()),
    pa.array(rng.integers(-1000, 1000, 1000), type=pa.int16()),
    pa.array([None, 1, None, 2, None], type=pa.int64()),
    pa.array([None] * 5, type=pa.int64()),
    pa.array([], type=pa.int64()),
    pa.array([42] * 500, type=pa.int64()),
]

TEMPORAL_ARRAYS = [
    pa.array(
        rng.integers(1_500_000_000_000_000, 1_700_000_000_000_000, 100),
        type=pa.int64(),
    ).cast(pa.timestamp("us")),
    pa.array([18000, 18001, None, 18003], type=pa.int32()).cast(pa.date32()),
]

FLOAT_ARRAYS = [
    pa.array([1.5, 2.5, 2.5, 2.5, float("nan"), 0.0, -0.0], type=pa.float64()),
    pa.array(rng.normal(size=500), type=pa.float32()),
    pa.array([None, 1.0, None], type=pa.float64()),
]

STR_ARRAYS = [
    pa.array(["en", "en", "en", "de", "de", "fr"] * 50),
    pa.array(["the quick brown fox jumps over the lazy dog " * 5] * 20),
    pa.array([f"https://example-{i % 17}.com/path/{i}" for i in range(300)]),
    pa.array(["", "a", "", None, "bb", None, ""]),
    pa.array([], type=pa.string()),
    pa.array(["\xff\x00 héllo wörld ünïcode ✓"] * 10),
]

BIN_ARRAYS = [
    pa.array([b"\x00\xff" * 10, b"\xff" * 5, b"", b"abc"], type=pa.binary()),
    pa.array([bytes([255] * 20), bytes([255, 0] * 9), None], type=pa.binary()),
    pa.array([rng.bytes(100) for _ in range(50)], type=pa.binary()),
]

BOOL_ARRAYS = [
    pa.array([True, False, True, None, True]),
    pa.array([True] * 300 + [False] * 300),
]


@pytest.mark.parametrize("arr", INT_ARRAYS + TEMPORAL_ARRAYS + BOOL_ARRAYS)
def test_for_roundtrip(arr):
    _roundtrip(arr, "for")


@pytest.mark.parametrize("arr", INT_ARRAYS + TEMPORAL_ARRAYS)
def test_delta_roundtrip(arr):
    _roundtrip(arr, "delta")


def test_delta_beats_for_on_monotone():
    base = 1_700_000_000_000_000
    ts = pa.array(
        base + np.arange(50000) * 1_000_000 + rng.integers(0, 900_000, 50000),
        type=pa.int64(),
    ).cast(pa.timestamp("us"))
    d = _roundtrip(ts, "delta")
    f = _roundtrip(ts, "for")
    assert d.payload_bytes < 0.65 * f.payload_bytes, (d.payload_bytes, f.payload_bytes)
    assert choose_codec(ts) == "delta"


@pytest.mark.parametrize(
    "arr",
    [a for a in INT_ARRAYS if len(a) == 0 or a.null_count == len(a)
     or (a.null_count < len(a) and min(x.as_py() for x in a.drop_null()) >= 0)]
    + BOOL_ARRAYS,
)
def test_bitpack_roundtrip(arr):
    _roundtrip(arr, "bitpack")


@pytest.mark.parametrize(
    "arr", INT_ARRAYS + TEMPORAL_ARRAYS + FLOAT_ARRAYS + STR_ARRAYS + BIN_ARRAYS + BOOL_ARRAYS
)
def test_rle_roundtrip(arr):
    _roundtrip(arr, "rle")


@pytest.mark.parametrize(
    "arr", INT_ARRAYS + TEMPORAL_ARRAYS + FLOAT_ARRAYS + STR_ARRAYS + BIN_ARRAYS + BOOL_ARRAYS
)
def test_dict_roundtrip(arr):
    _roundtrip(arr, "dict")


@pytest.mark.parametrize("arr", STR_ARRAYS + BIN_ARRAYS)
def test_fsst_roundtrip(arr):
    _roundtrip(arr, "fsst")


@pytest.mark.parametrize(
    "arr",
    INT_ARRAYS
    + TEMPORAL_ARRAYS
    + FLOAT_ARRAYS
    + STR_ARRAYS
    + BIN_ARRAYS
    + BOOL_ARRAYS
    + [pa.array([[1.0, 2.0], [3.0], None], type=pa.list_(pa.float32()))],
)
def test_raw_roundtrip(arr):
    _roundtrip(arr, "raw")


def test_fsst_compresses_text():
    words = ["the", "of", "and", "compression", "ray", "data", "symbol "]
    texts = [
        " ".join(words[int(x) % len(words)] for x in rng.integers(0, 7, 120))
        for _ in range(200)
    ]
    arr = pa.array(texts)
    chunk = _roundtrip(arr, "fsst")
    data_bytes = sum(len(t) for t in texts)
    assert chunk.payload_bytes < 0.6 * data_bytes, (
        f"fsst ratio too weak: {chunk.payload_bytes}/{data_bytes}"
    )


def test_dict_compresses_low_cardinality():
    arr = pa.array(["english", "german", "french"] * 10000)
    chunk = _roundtrip(arr, "dict")
    assert chunk.payload_bytes < 0.1 * arr.nbytes


def test_for_compresses_timestamps():
    base = 1_700_000_000_000_000
    arr = pa.array(
        base + np.sort(rng.integers(0, 86_400_000_000, 10000)), type=pa.int64()
    ).cast(pa.timestamp("us"))
    chunk = _roundtrip(arr, "for")
    assert chunk.payload_bytes < 0.6 * arr.nbytes


def test_choose_codec_sensible():
    lang = pa.array(["en"] * 8000 + ["de"] * 1500 + ["fr"] * 500)
    assert choose_codec(lang) in ("dict", "rle")
    ts = pa.array(
        1_700_000_000 + np.arange(10000), type=pa.int64()
    )
    assert choose_codec(ts) in ("delta", "for", "bitpack")
    high_entropy = pa.array([rng.bytes(64) for _ in range(500)], type=pa.binary())
    assert choose_codec(high_entropy) == "raw"


def test_encode_auto_never_loses():
    arrays = [
        pa.array([rng.bytes(64) for _ in range(200)], type=pa.binary()),
        pa.array(["en", "de"] * 1000),
        pa.array(rng.integers(0, 100, 5000), type=pa.int64()),
    ]
    for arr in arrays:
        chunk = encode_auto(arr)
        back = decode_chunk(EncodedChunk.from_payload(chunk.to_payload()))
        assert back.equals(arr if not isinstance(arr, pa.ChunkedArray) else arr.combine_chunks())
        assert chunk.payload_bytes <= arr.nbytes + 4096


def test_column_stats_keys():
    s = column_stats(pa.array(["aa", "bb", "aa"]))
    assert s["n"] == 3 and "card_est" in s and "entropy" in s
    s2 = column_stats(pa.array([1, 2, 3], type=pa.int64()))
    assert s2["width_bits"] == 2


def test_all_registered():
    assert set(CODECS) == {"raw", "dict", "rle", "bitpack", "for", "delta", "fsst", "bss"}


def test_encode_auto_cached_bitpack_falls_back_on_negatives():
    # a sticky/driver-planned decision may be invalid for a later chunk:
    # bitpack chosen from a non-negative sample must not crash a chunk
    # holding negatives (round-2 ADVICE, medium)
    cache = {"v": "bitpack"}
    arr = pa.array([5, -3, 7, -1], type=pa.int64())
    chunk = encode_auto(arr, name="v", decision_cache=cache)
    back = decode_chunk(EncodedChunk.from_payload(chunk.to_payload()))
    assert back.equals(arr)
    assert cache["v"] in ("for", "raw")  # cache updated past the bad codec
    # and the updated decision encodes the next chunk without a retry
    arr2 = pa.array([-10, 0, 10], type=pa.int64())
    chunk2 = encode_auto(arr2, name="v", decision_cache=cache)
    assert decode_chunk(EncodedChunk.from_payload(chunk2.to_payload())).equals(arr2)


def test_encode_auto_cached_fallback_binary():
    # non-integer column with a bad cached codec falls back to raw
    cache = {"s": "bitpack"}
    arr = pa.array(["x", "yy", "zzz"])
    chunk = encode_auto(arr, name="s", decision_cache=cache)
    back = decode_chunk(EncodedChunk.from_payload(chunk.to_payload()))
    assert back.equals(arr.cast(back.type)) or back.cast(arr.type).equals(arr)


def test_bss_roundtrip_and_selection():
    import numpy as np

    from tbl_ray.codecs.select import decide_codec

    rng2 = np.random.default_rng(3)
    arr = pa.array(rng2.normal(1000.0, 25.0, 20000))
    chunk = encode_array(arr, "bss", name="x")
    back = decode_chunk(EncodedChunk.from_payload(chunk.to_payload()))
    assert back.equals(arr)
    # continuous doubles: near-all-unique sample must not pick dict;
    # bss wins the container probe
    assert decide_codec(arr)[0] == "bss"
    # low-cardinality floats still dict
    assert decide_codec(pa.array([1.5, 2.5] * 10000))[0] == "dict"
    # specials round-trip
    sp = pa.array([float("nan"), float("inf"), -0.0, None, 1e300])
    b2 = decode_chunk(
        EncodedChunk.from_payload(encode_array(sp, "bss", name="s").to_payload())
    )
    from tbl_ray.codecs.base import arrays_identical

    assert arrays_identical(b2, sp)


def test_no_function_scoped_tbl_ray_imports_in_codecs():
    # codecs code executes inside Ray map workers; a runtime
    # `from tbl_ray...` import there raises ModuleNotFoundError when the
    # driver runs from a foreign cwd (the package ships by cloudpickle
    # value, not sys.path). Keep every such import at module top.
    import ast
    import pathlib

    pkg = pathlib.Path(__file__).parent.parent / "tbl_ray" / "codecs"
    offenders = []
    for p in pkg.rglob("*.py"):
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                for sub in ast.walk(node):
                    if (
                        isinstance(sub, ast.ImportFrom)
                        and sub.module
                        and sub.module.startswith("tbl_ray")
                    ):
                        offenders.append(f"{p.name}:{sub.lineno} ({node.name})")
    assert not offenders, offenders


def test_no_tbl_ray_imports_in_worker_shipped_bodies():
    # Wider net over functions/ and stages/: nested functions (closures
    # passed to map_batches) and class methods (actor/callable instances)
    # execute inside Ray workers, where a runtime `from tbl_ray...` import
    # raises ModuleNotFoundError (the package ships by cloudpickle value).
    # Top-level module functions may import lazily — they run on the
    # driver — but anything that ships must resolve its imports at module
    # scope. (Regression: minhash_signatures grew a function-scoped
    # native-kernel import and broke every worker-side sketch.)
    import ast
    import pathlib

    root = pathlib.Path(__file__).parent.parent / "tbl_ray"
    offenders = []
    for pkg in ("functions", "stages"):
        for p in (root / pkg).rglob("*.py"):
            tree = ast.parse(p.read_text())

            def scan(fn_node, where):
                for sub in ast.walk(fn_node):
                    if (
                        isinstance(sub, ast.ImportFrom)
                        and sub.module
                        and sub.module.startswith("tbl_ray")
                    ):
                        offenders.append(f"{p.name}:{sub.lineno} ({where})")

            for node in ast.walk(tree):
                if isinstance(node, ast.ClassDef):
                    for item in node.body:
                        if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)):
                            scan(item, f"{node.name}.{item.name}")
                elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    for inner in ast.walk(node):
                        if inner is not node and isinstance(
                            inner, (ast.FunctionDef, ast.AsyncFunctionDef)
                        ):
                            scan(inner, f"{node.name}.{inner.name}")
    assert not offenders, offenders


def test_unicode_and_nul_bytes_roundtrip():
    # multibyte UTF-8, emoji, embedded NULs, nulls and empties all survive
    # the auto path and FSST bit-exactly
    vals = [
        "héllo wörld", "日本語テキスト", "emoji 🎉🎊", "", None,
        "mixed ascii + 中文", "\x00embedded\x00nul",
    ]
    arr = pa.array(vals * 300)
    ch = encode_auto(arr, name="u")
    assert decode_chunk(EncodedChunk.from_payload(ch.to_payload())).equals(arr)
    fs = encode_array(arr.drop_null(), "fsst", name="u")
    back = decode_chunk(EncodedChunk.from_payload(fs.to_payload()))
    assert back.cast(pa.string()).equals(arr.drop_null().cast(pa.string()))
    b = pa.array([b"\x00\x01\xff" * 50, b"", b"\xfe" * 10] * 200, type=pa.binary())
    ch2 = encode_array(b, "fsst", name="b")
    back2 = decode_chunk(EncodedChunk.from_payload(ch2.to_payload()))
    assert back2.cast(pa.binary()).equals(b)


def test_native_matches_numpy():
    """The C walk kernel must be bit-identical to the numpy path — same
    encoded stream, same segment lengths, same decode — across segment
    boundaries, escapes, embedded NULs, and empty/short inputs."""
    from tbl_ray.codecs import native
    from tbl_ray.codecs.fsst import _SEG, _decode_stream, _encode_stream, train_symbols

    if native.lib() is None:
        pytest.skip("no native kernel on this host")
    rng = np.random.default_rng(11)
    text = (b"the quick brown fox jumps over the lazy dog " * 200)[: _SEG * 3 + 17]
    cases = [
        b"",
        b"a",
        b"\x00" * 37,
        text,
        bytes(rng.integers(0, 256, _SEG * 2, dtype=np.uint8)),  # escape-heavy
        (b"ab" * _SEG)[: _SEG],  # exact one segment
        b"\xff" * 300 + b"abcabcabc" * 50,  # 0xff runs (escape parity)
    ]
    real = native._kernels()
    numpy_only = native._Kernels.__new__(native._Kernels)
    numpy_only.cdll = None
    for raw in cases:
        data = np.frombuffer(raw, dtype=np.uint8)
        symbols = train_symbols(raw[:4096])
        try:
            native._K = numpy_only
            e_np, l_np = _encode_stream(data, symbols)
            native._K = real
            e_c, l_c = _encode_stream(data, symbols)
            assert np.array_equal(e_np, e_c) and np.array_equal(l_np, l_c)
            d_c = _decode_stream(e_c, l_c, symbols, len(data))
            assert bytes(d_c) == raw
            native._K = numpy_only
            d_np = _decode_stream(e_c, l_c, symbols, len(data))
            assert np.array_equal(d_np, d_c)
        finally:
            native._K = real


def test_native_disabled_by_env(monkeypatch):
    """TBL_RAY_NO_NATIVE=1 must keep the loader off entirely."""
    from tbl_ray.codecs import native

    monkeypatch.setenv("TBL_RAY_NO_NATIVE", "1")
    assert native._build_cdll() is None


def test_native_handle_survives_cloudpickle():
    """Ray ships tbl_ray functions by value; every shipped callable must
    cloudpickle even though a live CDLL sits behind the native handle."""
    from ray import cloudpickle

    from tbl_ray.codecs import native
    from tbl_ray.stages.encode import ColumnEncoder, decode_table

    native.lib()  # force the CDLL to exist in this process
    for obj in (ColumnEncoder, ColumnEncoder({}), decode_table):
        clone = cloudpickle.loads(cloudpickle.dumps(obj))
        assert clone is not None
    rebuilt = cloudpickle.loads(cloudpickle.dumps(native._kernels()))
    assert rebuilt.cdll is not None
