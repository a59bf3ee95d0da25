"""Text analysis, dedup family, similarity search, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from tbl_ray.functions.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    minhash_dedup,
    minhash_dup_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash_batch,
    simhash_dup_pairs,
    union_find,
)
from tbl_ray.functions.similarity import knn_brute, knn_ivf, train_centroids
from tbl_ray.functions.text import (
    fingerprint_batch,
    langid_batch,
    text_stats_batch,
    token_count_batch,
)


def docs_ds(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


# -- text ----------------------------------------------------------------


def test_token_count_matches_duck(sf_dir, duck):
    t = token_count_batch(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet").take_batch(
            10**6, batch_format="pyarrow"
        )
    )
    want = duck.execute(
        "SELECT doc_id, len(regexp_extract_all(text, '\\S+')) n FROM documents ORDER BY doc_id"
    ).fetch_arrow_table()
    got = t.select(["doc_id", "n_tokens"]).sort_by("doc_id")
    assert got.column("n_tokens").to_pylist() == want.column("n").to_pylist()


def test_text_stats_quality_range():
    t = pa.table({"text": ["the cat sat on the mat with a hat", "", "1234!!!"]})
    out = text_stats_batch(t)
    q = out.column("quality").to_pylist()
    assert all(0.0 <= v <= 1.0 for v in q)
    assert q[0] > q[2]  # wordy text beats digit/punct soup


def test_langid_heuristic():
    t = pa.table(
        {
            "text": [
                "the cat is in the house and that was for the dog",
                "der hund ist nicht mit der katze und das haus",
                "le chat est dans la maison et les chiens pour une",
            ]
        }
    )
    out = langid_batch(t)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "fr"]


def test_fingerprint_content_pure():
    a = fingerprint_batch(pa.table({"text": ["hello world", "abc", ""]}))
    b = fingerprint_batch(pa.table({"text": ["hello world", "different", ""]}))
    fa, fb = a.column("fingerprint").to_pylist(), b.column("fingerprint").to_pylist()
    assert fa[0] == fb[0]  # same content, same fingerprint (neighbors differ)
    assert fa[1] != fb[1]
    assert fa[2] == 0


# -- dedup ---------------------------------------------------------------


def _dup_docs():
    base = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "compression engines pick codecs from sampled statistics per column",
        "ray data streams arrow batches through actor pools with backpressure",
    ]
    texts, ids = [], []
    i = 0
    for t in base:
        for variant in (t, t, t + " extra", t.replace("the", "a")):
            texts.append(variant)
            ids.append(i)
            i += 1
    # unrelated rows
    for j in range(5):
        texts.append(f"completely unrelated document number {j} about nothing at all")
        ids.append(i)
        i += 1
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})


def test_exact_dedup():
    t = _dup_docs()
    ds = ray.data.from_arrow(t)
    out = pa.Table.from_pylist(exact_dedup(ds, "text", "doc_id").take_all())
    texts = t.column("text").to_pylist()
    # exact dups: each base text appears twice -> one kept (the min id)
    assert out.num_rows == len(set(texts))
    kept = set(out.column("doc_id").to_pylist())
    for i, txt in enumerate(texts):
        first = texts.index(txt)
        assert (i in kept) == (i == first)


def test_minhash_signatures_similarity():
    a = "the quick brown fox jumps over the lazy dog and runs far away today"
    sig = minhash_signatures(pa.array([a, a, a + " x", "zzz completely different text"]))
    same = (sig[0] == sig[1]).mean()
    near = (sig[0] == sig[2]).mean()
    far = (sig[0] == sig[3]).mean()
    assert same == 1.0 and near > 0.5 and far < 0.3


def test_minhash_dedup_pipeline():
    t = _dup_docs()
    ds = ray.data.from_arrow(t)
    pairs = minhash_dup_pairs(ds, "text", "doc_id", threshold=0.9)
    # exact duplicate pairs (0,1), (4,5), (8,9) must be found
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    assert {(0, 1), (4, 5), (8, 9)} <= found
    kept = pa.Table.from_pylist(minhash_dedup(ds, "text", "doc_id", threshold=0.9).take_all())
    assert kept.num_rows < t.num_rows
    # one representative of every exact-dup pair survives
    ids = set(kept.column("doc_id").to_pylist())
    assert 0 in ids and 1 not in ids


def test_union_find():
    roots = union_find([(1, 2), (2, 3), (10, 11)])
    assert roots[3] == 1 and roots[2] == 1 and roots[11] == 10


def test_simhash_near():
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    h = simhash_batch(pa.array([a, a + " ok", "totally different words entirely"]))
    d01 = bin(int(h[0]) ^ int(h[1])).count("1")
    d02 = bin(int(h[0]) ^ int(h[2])).count("1")
    assert d01 < d02


def test_simhash_dup_pairs():
    t = _dup_docs()
    pairs = simhash_dup_pairs(ray.data.from_arrow(t), "text", "doc_id", max_hamming=3)
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    assert {(0, 1), (4, 5), (8, 9)} <= found


def test_null_embeddings_drop_in_dedup_and_raise_in_similarity():
    """Null embeddings: near-dup drops the row (a null can't be a
    near-duplicate); similarity ops fail LOUD — a ListArray null slot
    has no backing values, so reshaping around it silently misaligns
    every later row's vector with the wrong id."""
    import pytest

    from tbl_ray.functions.dedup import embedding_dup_pairs
    from tbl_ray.functions.similarity import _vec_matrix, knn_brute

    v = [0.6, 0.8, 0.0]
    t = pa.table(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": pa.array(
                [v, v, None, [0.0, 0.0, 1.0]], pa.list_(pa.float32())
            ),
        }
    )
    pairs = embedding_dup_pairs(
        ray.data.from_arrow(t), "embedding", "vec_id", threshold=0.99
    )
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(0, 1)}

    with pytest.raises(ValueError, match="null embeddings"):
        _vec_matrix(t, "embedding")
    with pytest.raises(Exception):  # surfaces from the Ray task
        knn_brute(ray.data.from_arrow(t), np.array([v]), k=2)
    ragged = pa.table(
        {"vec_id": [0, 1], "embedding": [[1.0, 2.0], [1.0, 2.0, 3.0]]}
    )
    with pytest.raises(ValueError, match="ragged"):
        _vec_matrix(ragged, "embedding")

    # all-null head: dim inference must fail with guidance, not len(None)
    allnull = pa.table(
        {
            "vec_id": list(range(20)),
            "embedding": pa.array([None] * 20, pa.list_(pa.float32())),
        }
    )
    with pytest.raises(ValueError, match="pass dim"):
        embedding_dup_pairs(ray.data.from_arrow(allnull), "embedding", "vec_id")


def test_poly_word_hashes_match_brute_force():
    from tbl_ray.functions.dedup import _POLY_P, _poly_word_hashes
    from tbl_ray.webtable import _mix

    words = ["", "a", "hello", "x" * 160, "punct!~#", "aa", "ab", "ba"]
    got = _poly_word_hashes(pa.array(words), 11)
    for w, g in zip(words, got):
        h, p = 0, 1
        for byte in w.encode():
            h = (h + byte * p) % (1 << 64)
            p = (p * int(_POLY_P)) % (1 << 64)
        want = int(_mix(np.array([h], np.uint64) + np.uint64(11))[0])
        assert int(g) == want, w
    # order sensitivity (pure sums would collide on anagrams)
    assert got[6] != got[7]


def test_simhash_poly_variant():
    a = "the quick brown fox jumps over the lazy dog near the river today"
    col = pa.array([a, a, a + " ok", "totally different words entirely", None])
    h = simhash_batch(col, word_hasher="poly")
    assert h.dtype == np.uint64
    assert h[0] == h[1]  # deterministic
    d_near = bin(int(h[0]) ^ int(h[2])).count("1")
    d_far = bin(int(h[0]) ^ int(h[3])).count("1")
    assert d_near < d_far
    # a different hash family than the default crc path
    assert not np.array_equal(h, simhash_batch(col))


def test_minhash_signature_rows_long_format():
    from tbl_ray.functions.dedup import minhash_signature_rows

    t = pa.table(
        {"doc_id": [10, 20, 30], "text": ["abcdefghij", "abcdefghij", "qrstuvwxyz"]}
    )
    out = pa.Table.from_pylist(
        minhash_signature_rows(
            ray.data.from_arrow(t), "text", "doc_id", n_hashes=6, seed=7
        ).take_all()
    )
    assert out.num_rows == 18
    sig = minhash_signatures(pa.array(t.column("text").to_pylist()), 6, seed=7)
    by_key = {
        (r["doc_id"], r["hash_index"]): r["sig"] for r in out.to_pylist()
    }
    ids = t.column("doc_id").to_pylist()
    for r in range(3):
        for i in range(6):
            assert by_key[(ids[r], i)] == int(sig[r, i])


def test_ngram_jaccard():
    assert ngram_jaccard("abcdef", "abcdef") == 1.0
    assert ngram_jaccard("abcdef", "zzzzzz") == 0.0
    assert 0.0 < ngram_jaccard("abcdefgh", "abcdefxx") < 1.0


def test_embedding_dup_pairs():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(20, 32)).astype(np.float32)
    vecs = np.concatenate([base, base[:3] + rng.normal(scale=0.001, size=(3, 32)).astype(np.float32)])
    ids = list(range(len(vecs)))
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel()), 32
            ),
        }
    )
    pairs = embedding_dup_pairs(
        ray.data.from_arrow(t), threshold=0.99, n_tables=6, n_planes=6
    )
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    assert {(0, 20), (1, 21), (2, 22)} <= found


# -- similarity search ---------------------------------------------------


def test_knn_brute_matches_numpy(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    t = ds.take_batch(10**6, batch_format="pyarrow")
    vecs = np.stack([np.asarray(v.values) for v in t.column("embedding").combine_chunks()])
    ids = np.asarray(t.column("vec_id"))
    q = vecs[:2]
    res = knn_brute(ds, q, k=5)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qu = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = unit @ qu.T
    for qi in range(2):
        order = sorted(zip(-sims[:, qi], ids))[:5]
        want = [int(i) for _, i in order]
        got = [r["id"] for r in res[qi]]
        assert got == want
        assert res[qi][0]["id"] == int(ids[qi]) # self is nearest


def test_knn_ivf_recall(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    t = ds.take_batch(10**6, batch_format="pyarrow")
    vecs = np.stack([np.asarray(v.values) for v in t.column("embedding").combine_chunks()])
    q = vecs[:3]
    exact = knn_brute(ds, q, k=5)
    approx = knn_ivf(ds, q, k=5, n_clusters=8, n_probe=4)
    recall = np.mean(
        [
            len({r["id"] for r in approx[i]} & {r["id"] for r in exact[i]}) / 5
            for i in range(3)
        ]
    )
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_knn_ivf_recall_on_cluster_sorted_corpus(ray_session):
    """Adversarial layout: the corpus is SORTED by cluster, so first-N
    training (the old ds.limit sample) sees only the first cluster and
    centroids collapse. The seeded hash-sample must keep recall high."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 32)).astype(np.float32) * 4.0
    vecs = np.concatenate(
        [c + rng.normal(size=(500, 32)).astype(np.float32) for c in centers]
    )  # 2000 rows in cluster order
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), 32
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    q = vecs[[10, 600, 1100, 1700]]  # one probe per true cluster
    exact = knn_brute(ds, q, k=10)
    # train on only 300 rows — far fewer than one cluster, so a head
    # sample could not even see clusters 2-4
    approx = knn_ivf(ds, q, k=10, n_clusters=4, n_probe=1, sample_rows=300)
    recall = np.mean(
        [
            len({r["id"] for r in approx[i]} & {r["id"] for r in exact[i]}) / 10
            for i in range(4)
        ]
    )
    assert recall >= 0.9, f"sorted-corpus IVF recall too low: {recall}"


def test_train_sample_is_unbiased_and_deterministic(ray_session):
    from tbl_ray.functions.similarity import _train_sample

    t = pa.table({"vec_id": pa.array(range(10_000), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(8)
    s1 = _train_sample(ds, "vec_id", 1000)
    s2 = _train_sample(ds, "vec_id", 1000)
    ids1 = sorted(np.asarray(s1.column("vec_id")).tolist())
    assert ids1 == sorted(np.asarray(s2.column("vec_id")).tolist())
    assert len(ids1) == 1000
    # unbiased across the id range: mean near the middle, not the head
    m = float(np.mean(ids1))
    assert 4000 < m < 6000, m
    # small inputs: take everything
    small = _train_sample(ray.data.from_arrow(t.slice(0, 50)), "vec_id", 100)
    assert small.num_rows == 50


def test_train_centroids_unit_norm():
    rng = np.random.default_rng(1)
    c = train_centroids(rng.normal(size=(200, 16)), 4)
    assert np.allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-5)


# -- multimodal plumbing -------------------------------------------------


def test_multimodal_stub_pipeline():
    from tbl_ray.stages.multimodal import decode_images, fake_media_table

    t = fake_media_table(64, payload_bytes=1024)
    ds = ray.data.from_arrow(t)
    out = pa.Table.from_pylist(decode_images(ds, batch_size=16, concurrency=2).take_all())
    assert out.num_rows == 64
    assert {"width", "height", "n_bytes", "features"} <= set(out.schema.names)
    assert all(v == 1024 for v in out.column("n_bytes").to_pylist())
    # deterministic: same payloads -> same fake features
    out2 = pa.Table.from_pylist(decode_images(ds, batch_size=32, concurrency=2).take_all())
    assert sorted(out.column("width").to_pylist()) == sorted(out2.column("width").to_pylist())


def test_multimodal_strict_raises_on_unknown_format():
    from tbl_ray.stages.multimodal import ImageDecode, fake_media_table

    # random bytes are not a decodable image: strict names the failure
    with pytest.raises(ValueError):
        ImageDecode(strict=True)(fake_media_table(4))


def test_multimodal_real_decode_strict():
    # strict path is now REAL: BMP/PNG payloads decode to true dimensions
    from tbl_ray.stages.multimodal import (
        ImageDecode,
        decode_images,
        synthetic_image_table,
    )
    from tbl_ray.stages.imagecodec import decode_image

    for fmt in ("bmp", "png"):
        t = synthetic_image_table(12, seed=9, fmt=fmt)
        out = ImageDecode(strict=True)(t)
        for i in range(12):
            pixels = decode_image(t.column("payload")[i].as_py())
            assert out.column("height")[i].as_py() == pixels.shape[0]
            assert out.column("width")[i].as_py() == pixels.shape[1]
            # first three features are the true channel means
            f = out.column("features")[i].as_py()
            want = pixels.reshape(-1, 3).mean(axis=0) / 255.0
            assert abs(f[0] - want[0]) < 1e-5 and abs(f[2] - want[2]) < 1e-5

    # and end-to-end through the Ray actor-pool stage
    ds = ray.data.from_arrow(synthetic_image_table(24, seed=9))
    got = pa.Table.from_pylist(
        decode_images(ds, strict=True, batch_size=8, concurrency=2).take_all()
    )
    assert got.num_rows == 24
    assert all(w >= 8 for w in got.column("width").to_pylist())


def test_image_codec_roundtrips():
    import numpy as np

    from tbl_ray.stages.imagecodec import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
        resize_nearest,
    )

    rng = np.random.default_rng(4)
    pixels = rng.integers(0, 256, size=(33, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(pixels)), pixels)
    assert np.array_equal(decode_png(encode_png(pixels)), pixels.reshape(33, 17, 3))
    gray = rng.integers(0, 256, size=(9, 5), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(gray))[:, :, 0], gray)
    rgba = rng.integers(0, 256, size=(6, 7, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)
    small = resize_nearest(pixels, 8, 8)
    assert small.shape == (8, 8, 3)
    assert np.array_equal(resize_nearest(pixels, 17, 33), pixels)


def test_png_unfilter_all_types():
    # exercise Sub/Up/Average/Paeth against a reference scalar encoder
    import struct
    import zlib

    import numpy as np

    from tbl_ray.stages.imagecodec import PNG_MAGIC, decode_png

    rng = np.random.default_rng(11)
    h, w, c = 6, 5, 3
    pixels = rng.integers(0, 256, size=(h, w, c), dtype=np.int64)
    stride = w * c
    flat = pixels.reshape(h, stride)
    raw = bytearray()
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        ftype = [0, 1, 2, 3, 4, 1][y]
        raw.append(ftype)
        line = flat[y]
        for i in range(stride):
            left = line[i - c] if i >= c else 0
            up = prev[i]
            ul = prev[i - c] if i >= c else 0
            if ftype == 0:
                v = line[i]
            elif ftype == 1:
                v = line[i] - left
            elif ftype == 2:
                v = line[i] - up
            elif ftype == 3:
                v = line[i] - ((left + up) >> 1)
            else:
                p = left + up - ul
                pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc_) else (up if pb <= pc_ else ul)
                v = line[i] - pred
            raw.append(int(v) & 0xFF)
        prev = line

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), pixels.astype(np.uint8))


def test_png_adam7_interlace_roundtrip():
    # PNG is lossless, so decode(encode(img, interlace=True)) == img is
    # an exact oracle for the Adam7 pass geometry; sizes below 8px in
    # either axis make some of the seven passes empty
    import numpy as np

    from tbl_ray.stages.imagecodec import decode_png, encode_png

    rng = np.random.default_rng(12)
    for h, w, c in [(1, 1, 1), (2, 3, 3), (5, 5, 4), (7, 13, 3),
                    (8, 8, 1), (16, 9, 3), (33, 17, 3), (40, 41, 4)]:
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        data = encode_png(img, interlace=True)
        assert np.array_equal(decode_png(data), img), (h, w, c)
        # interlaced and plain encodes of the same image decode equal
        assert np.array_equal(
            decode_png(data), decode_png(encode_png(img))
        )


def test_png_adam7_with_sub_filtered_passes():
    # hand-filter every pass row with Sub (type 1) so per-pass unfilter
    # state (left neighbor WITHIN the pass, prev row WITHIN the pass) is
    # exercised independently of our encoder's filter-0 choice
    import struct
    import zlib

    import numpy as np

    from tbl_ray.stages.imagecodec import PNG_MAGIC, decode_png

    rng = np.random.default_rng(13)
    h, w, c = 11, 10, 3
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        flat = sub.reshape(sub.shape[0], -1).astype(np.int64)
        for y in range(flat.shape[0]):
            raw.append(1)  # Sub
            line = flat[y]
            for i in range(len(line)):
                left = line[i - c] if i >= c else 0
                raw.append(int(line[i] - left) & 0xFF)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    png = (
        PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img)


def test_image_resize_stage():
    from tbl_ray.stages.multimodal import resize_images, synthetic_image_table
    from tbl_ray.stages.imagecodec import decode_bmp

    ds = ray.data.from_arrow(synthetic_image_table(10, seed=3))
    out = pa.Table.from_pylist(
        resize_images(ds, 16, 12, strict=True, batch_size=4, concurrency=2).take_all()
    )
    assert out.num_rows == 10
    for i in range(10):
        px = decode_bmp(out.column("payload")[i].as_py())
        assert px.shape == (12, 16, 3)
    assert set(out.column("width").to_pylist()) == {16}


# -- windowed aggregates -------------------------------------------------


def test_tumbling_window_matches_duck(sf_dir, duck):
    from tbl_ray.functions.windows import tumbling_window

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    got = (
        tumbling_window(ds, window="1h")
        .to_pandas()
        .sort_values(["event_type", "window_start"], ignore_index=True)
    )
    want = duck.execute(
        "SELECT event_type,"
        " (epoch_us(ts) // 3600000000) * 3600000000 AS window_start,"
        " count(value) AS n_events, sum(value) AS sum_value,"
        " min(value) AS min_value, max(value) AS max_value"
        " FROM events GROUP BY event_type, window_start"
        " ORDER BY event_type, window_start"
    ).df()
    assert len(got) == len(want)
    assert (got["n_events"].values == want["n_events"].values).all()
    assert np.allclose(got["sum_value"].values, want["sum_value"].values)


def test_parse_window():
    from tbl_ray.functions.windows import _parse_window

    assert _parse_window("15m") == 15 * 60_000_000
    assert _parse_window("1d") == 86_400_000_000
    assert _parse_window(123) == 123


# -- sketches ------------------------------------------------------------


def test_hll_accuracy(sf_dir, duck):
    from tbl_ray.functions.sketches import approx_distinct

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet")
    est = approx_distinct(ds, "l_orderkey")
    exact = duck.execute("SELECT count(DISTINCT l_orderkey) FROM lineitem").fetchone()[0]
    assert abs(est - exact) / exact < 0.05, (est, exact)
    # low cardinality is exact via linear counting
    est2 = approx_distinct(ds, "l_returnflag")
    assert round(est2) == 3


def test_hll_merge_associative():
    from tbl_ray.functions.sketches import hll_estimate, hll_merge, hll_sketch

    a = pa.array([f"v{i}" for i in range(5000)])
    b = pa.array([f"v{i}" for i in range(2500, 7500)])
    merged = hll_merge([hll_sketch(a), hll_sketch(b)])
    est = hll_estimate(merged)
    assert abs(est - 7500) / 7500 < 0.05


def test_exact_dedup_fast_matches_shuffle_baseline():
    # default (fingerprint plan) vs the full-shuffle semantic baseline
    from tbl_ray.functions.dedup import exact_dedup_shuffle

    t = _dup_docs()
    ds = ray.data.from_arrow(t)
    fast = pa.Table.from_pylist(exact_dedup(ds, "text", "doc_id").take_all())
    exact = pa.Table.from_pylist(
        exact_dedup_shuffle(ds, "text", "doc_id").take_all()
    )
    assert sorted(fast.column("doc_id").to_pylist()) == sorted(
        exact.column("doc_id").to_pylist()
    )


def test_sorted_member_mask():
    import numpy as np

    from tbl_ray.functions.dedup import _sorted_member_mask

    drop = np.array([2, 5, 9], dtype=np.int64)
    ids = np.array([0, 2, 4, 5, 9, 10, 100], dtype=np.int64)
    assert _sorted_member_mask(ids, drop).tolist() == [
        False, True, False, True, True, False, False
    ]


def test_window_start_floors_negative_timestamps():
    # pre-epoch timestamps must floor to the window BELOW (round-2 ADVICE):
    # truncate-toward-zero put -1us into window 0 instead of -size
    import pyarrow as pa
    from tbl_ray.functions.windows import _window_start

    size = 3_600_000_000  # 1h
    ts = pa.array([-1, -size, -size - 1, 0, size - 1, size], pa.int64())
    assert _window_start(ts, size).to_pylist() == [
        -size, -size, -2 * size, 0, 0, size
    ]


def test_ivf_persisted_index(tmp_path, sf_dir):
    import numpy as np

    from tbl_ray.functions.similarity import (
        build_ivf_index,
        knn_brute,
        knn_ivf_index,
    )

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    idx_dir = str(tmp_path / "ivf")
    meta = build_ivf_index(
        ds, idx_dir, n_clusters=8, sample_rows=2000, seed=3
    )
    assert meta["n_clusters"] == 8

    first = ds.take_batch(3, batch_format="pyarrow")
    queries = np.stack(
        [np.asarray(v.values, dtype=np.float32) for v in first.column("embedding")]
    )
    got = knn_ivf_index(idx_dir, queries, k=10, n_probe=4)
    want = knn_brute(ds, queries, k=10)
    # recall@10 of the probed scan vs exact
    hits = sum(
        len({r["id"] for r in g} & {r["id"] for r in w})
        for g, w in zip(got, want)
    )
    assert hits / (10 * len(got)) >= 0.6
    # self-match must always survive (query vectors are table rows and the
    # top probe is the vector's own cluster)
    ids = first.column("vec_id").to_pylist()
    for qi, g in enumerate(got):
        assert g and g[0]["id"] == ids[qi] and g[0]["score"] > 0.999


def test_ivf_index_prunes_files(tmp_path, sf_dir):
    import glob
    import numpy as np

    from tbl_ray.functions.similarity import build_ivf_index, knn_ivf_index

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    idx_dir = str(tmp_path / "ivf")
    build_ivf_index(ds, idx_dir, n_clusters=8, sample_rows=1000)
    # the index is hive-partitioned one dir per cluster
    parts = glob.glob(f"{idx_dir}/clusters/cluster=*")
    assert len(parts) >= 4
    # a 1-probe query must touch exactly one cluster's files: verify via
    # the returned candidates all landing in one partition
    q = ds.take_batch(1, batch_format="pyarrow")
    queries = np.stack(
        [np.asarray(v.values, dtype=np.float32) for v in q.column("embedding")]
    )
    got = knn_ivf_index(idx_dir, queries, k=5, n_probe=1)
    assert len(got[0]) == 5


def test_audio_decode_real():
    import numpy as np

    from tbl_ray.stages.imagecodec import decode_wav
    from tbl_ray.stages.multimodal import decode_audio, synthetic_audio_table

    t = synthetic_audio_table(16, seed=2)
    # ground truth from the codec directly
    want = [decode_wav(p.as_py()) for p in t.column("payload")]
    ds = ray.data.from_arrow(t)
    out = pa.Table.from_pylist(
        decode_audio(ds, strict=True, batch_size=4, concurrency=2).take_all()
    )
    assert out.num_rows == 16
    by_id = {r["media_id"]: r for r in out.to_pylist()}
    for i, (samples, rate) in enumerate(want):
        r = by_id[i]
        assert r["sample_rate"] == rate
        assert r["n_samples"] == samples.shape[0]
        assert abs(r["duration_s"] - samples.shape[0] / rate) < 1e-9
        x = samples[:, 0].astype(np.float32) / 32768.0
        assert abs(r["features"][1] - np.sqrt((x * x).mean())) < 1e-5


def test_audio_decode_strict_rejects_garbage():
    from tbl_ray.stages.multimodal import AudioDecode, fake_media_table

    with pytest.raises(ValueError):
        AudioDecode(strict=True)(fake_media_table(2))


def test_frame_container_and_sampling():
    from tbl_ray.stages.imagecodec import decode_bmp
    from tbl_ray.stages.multimodal import (
        pack_frames,
        sample_frames,
        synthetic_video_table,
        unpack_frame,
    )

    t = synthetic_video_table(6, seed=5, frames=10)
    # container seek extracts the exact original frame bytes
    payload = t.column("payload")[0].as_py()
    f3 = unpack_frame(payload, 3)
    assert decode_bmp(f3).ndim == 3
    ds = ray.data.from_arrow(t)
    out = pa.Table.from_pylist(
        sample_frames(ds, n_sample=3, strict=True, batch_size=2, concurrency=2).take_all()
    )
    # 3 uniform picks per payload, all decoded with real dimensions
    assert out.num_rows == 18
    assert set(out.column("frame_index").to_pylist()) <= {0, 3, 6}
    assert min(out.column("width").to_pylist()) >= 8

    repacked = pack_frames([unpack_frame(payload, i) for i in range(10)])
    assert repacked == payload


def test_exact_dedup_bucketed_matches_broadcast():
    from tbl_ray.functions.dedup import exact_dedup_bucketed

    t = _dup_docs()
    ds = ray.data.from_arrow(t)
    got = pa.Table.from_pylist(
        exact_dedup_bucketed(ds, "text", "doc_id", n_buckets=7).take_all()
    )
    want = pa.Table.from_pylist(exact_dedup(ds, "text", "doc_id").take_all())
    assert sorted(got.column("doc_id").to_pylist()) == sorted(
        want.column("doc_id").to_pylist()
    )
    # schema unchanged (helper columns stripped)
    assert set(got.schema.names) == set(t.schema.names)


def test_approx_distinct_by_matches_exact(sf_dir, duck):
    from tbl_ray.functions.sketches import approx_distinct_by

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["lang"]: r["approx_distinct"]
        for r in approx_distinct_by(ds, "lang", "doc_id").take_all()
    }
    want = {
        k: v
        for k, v in duck.execute(
            "SELECT lang, count(DISTINCT doc_id) FROM documents GROUP BY lang"
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) / max(want[k], 1) < 0.06, (k, got[k], want[k])


def test_top_vocab_matches_duck(sf_dir, duck):
    from tbl_ray.functions.text import top_vocab

    got = top_vocab(docs_ds(sf_dir), "text", k=20).take_all()
    want = duck.execute(
        "SELECT word, count(*) n FROM (SELECT unnest(regexp_extract_all("
        "text, '\\S+')) word FROM documents) GROUP BY word"
        " ORDER BY n DESC, word LIMIT 20"
    ).fetchall()
    assert [(r["word"], r["n"]) for r in got] == [(w, n) for w, n in want]


def test_sample_uniform_deterministic_across_layouts(sf_dir):
    from tbl_ray.functions.sampling import sample_uniform

    a = sorted(
        r["doc_id"]
        for r in sample_uniform(docs_ds(sf_dir), 50, seed=3).take_all()
    )
    b = sorted(
        r["doc_id"]
        for r in sample_uniform(
            docs_ds(sf_dir).repartition(13), 50, seed=3
        ).take_all()
    )
    assert a == b and len(a) == 50
    c = sorted(
        r["doc_id"]
        for r in sample_uniform(docs_ds(sf_dir), 50, seed=4).take_all()
    )
    assert c != a  # different seed, different sample


def test_sample_stratified_counts(sf_dir):
    from collections import Counter

    from tbl_ray.functions.sampling import sample_stratified

    rows = sample_stratified(docs_ds(sf_dir), "lang", 10, seed=1).take_all()
    by_lang = Counter(r["lang"] for r in rows)
    assert all(v == 10 for v in by_lang.values())


def test_word_ngram_hashes_batch_independent():
    from tbl_ray.functions.dedup import _word_ngram_hashes

    rows = [
        "one two three four five six seven eight nine ten",
        "",
        "alpha beta gamma",  # < n words -> zero windows
        "one two three four five six seven eight different tail",
    ]
    whole, off = _word_ngram_hashes(pa.array(rows), 8)
    # per-row window counts: 3, 0, 0, 3
    assert np.diff(off).tolist() == [3, 0, 0, 3]
    for i, r in enumerate(rows):
        alone, aoff = _word_ngram_hashes(pa.array([r]), 8)
        assert np.array_equal(whole[off[i] : off[i + 1]], alone)
    # rows 0 and 3 share their first 8-gram
    assert whole[0] == whole[off[3]]
    assert whole[2] != whole[off[3] + 2]


def test_decontaminate_drops_overlapping_docs():
    from tbl_ray.functions.dedup import decontaminate

    evals = pa.table(
        {"text": ["the capital of france is paris as everyone knows well"]}
    )
    train = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                # contains the eval 8-gram verbatim inside a longer doc
                "trivia: the capital of france is paris as everyone knows well indeed",
                "a completely unrelated training document about compression engines",
                "short doc",
            ],
        }
    )
    out = decontaminate(
        ray.data.from_arrow(train),
        ray.data.from_arrow(evals),
        n=8,
        threshold=1,
    )
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert kept == [1, 2]


def test_broadcast_join_matches_duck(sf_dir, duck):
    import pyarrow.parquet as pq2

    from tbl_ray.functions.joins import broadcast_join, broadcast_semi_join

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet").repartition(4)
    cust = pq2.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    ).rename_columns(["o_custkey", "c_name", "c_nationkey"])
    got = pa.Table.from_pylist(
        broadcast_join(orders, cust, "o_custkey").take_all()
    )
    want = duck.execute(
        "SELECT o.*, c.c_name, c.c_nationkey FROM orders o"
        " JOIN customer c ON o.o_custkey = c.c_custkey"
    ).fetch_arrow_table()
    assert got.num_rows == want.num_rows
    a = got.select(["o_orderkey", "c_name"]).sort_by("o_orderkey")
    b = want.select(["o_orderkey", "c_name"]).sort_by("o_orderkey")
    assert a.equals(b)

    # semi / anti partition the big side exactly
    some = cust.slice(0, 50)
    semi = broadcast_semi_join(orders, some, "o_custkey").count()
    anti = broadcast_semi_join(orders, some, "o_custkey", anti=True).count()
    assert semi + anti == orders.count()
    n_semi = duck.execute(
        "SELECT count(*) FROM orders WHERE o_custkey IN ("
        "SELECT c_custkey FROM customer LIMIT 50)"
    ).fetchone()[0]
    # LIMIT without ORDER BY is nondeterministic in principle; parquet scan
    # order makes it the first 50 rows, same slice as above
    assert semi == n_semi


def test_shuffle_anti_join_matches_broadcast(ray_session):
    """The co-bucketed large-right anti join must equal the broadcast
    anti plan row for row — including null-key semantics (null left
    keys kept, null right keys match nothing) and a skewed hot key."""
    import numpy as np

    from tbl_ray.functions.joins import broadcast_semi_join, shuffle_anti_join

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 50, 5000).astype(object)
    keys[:2500] = 7  # skewed hot key
    keys[::97] = None  # null left keys: kept by anti
    left = pa.table(
        {"k": pa.array(list(keys), pa.int64()),
         "v": pa.array(range(5000), pa.int64())}
    )
    right = pa.table(
        {"k": pa.array([7, 1, 2, 3, None], pa.int64()),
         "extra": pa.array([0, 1, 2, 3, 4], pa.int64())}
    )
    lds = ray.data.from_arrow(left).repartition(6)
    want = pa.Table.from_pylist(
        broadcast_semi_join(lds, right, "k", anti=True).take_all()
    )
    got = pa.Table.from_pylist(
        shuffle_anti_join(
            lds, ray.data.from_arrow(right).repartition(2), "k"
        ).take_all()
    )
    assert got.num_rows == want.num_rows
    a = got.select(["k", "v"]).to_pandas().sort_values("v", ignore_index=True)
    b = want.select(["k", "v"]).to_pandas().sort_values("v", ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    # null left keys survive
    assert a["k"].isna().any()


def test_join_auto_anti_large_right(ray_session, monkeypatch):
    """join_auto(anti=True) must route a non-broadcastable right side to
    the shuffle anti plan (not raise) and match the broadcast answer."""
    from tbl_ray.functions.joins import broadcast_semi_join, join_auto

    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", "0")  # force big-side
    left = pa.table(
        {"k": pa.array([1, 2, 3, 4, 5, 6] * 100, pa.int64()),
         "v": pa.array(range(600), pa.int64())}
    )
    right = pa.table({"k": pa.array([2, 4, 6], pa.int64())})
    got = sorted(
        r["v"]
        for r in join_auto(
            ray.data.from_arrow(left).repartition(4),
            ray.data.from_arrow(right).repartition(2),
            "k",
            anti=True,
        ).take_all()
    )
    monkeypatch.delenv("TBL_RAY_LOCAL_SKETCH_BYTES")
    want = sorted(
        r["v"]
        for r in broadcast_semi_join(
            ray.data.from_arrow(left), right, "k", anti=True
        ).take_all()
    )
    assert got == want and len(got) == 300


def test_broadcast_join_left_outer(ray_session):
    from tbl_ray.functions.joins import broadcast_join

    big = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    small = pa.table({"k": [2, 3, 4], "w": [20, 30, 40]})
    rows = sorted(
        broadcast_join(big, small, "k", join_type="left outer").take_all(),
        key=lambda r: r["k"],
    )
    assert [r["w"] for r in rows] == [None, 20, 30]


def test_approx_quantiles_relative_error(sf_dir):
    import numpy as np

    from tbl_ray.functions.sketches import approx_quantiles

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet").repartition(6)
    got = {
        r["q"]: r["value"]
        for r in approx_quantiles(ds, "l_extendedprice", [0.5, 0.9, 0.99]).to_pylist()
    }
    import pyarrow.parquet as pq2

    exact = np.asarray(
        pq2.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])
        .column("l_extendedprice")
    )
    for q in (0.5, 0.9, 0.99):
        want = np.quantile(exact, q)
        assert abs(got[q] - want) / want < 0.03, (q, got[q], want)


def test_approx_quantiles_signs_and_zero(ray_session):
    import numpy as np

    from tbl_ray.functions.sketches import approx_quantiles

    vals = np.concatenate([-np.ones(100) * 50, np.zeros(100), np.ones(100) * 50])
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(3)
    got = {r["q"]: r["value"] for r in approx_quantiles(ds, "v", [0.1, 0.5, 0.9]).to_pylist()}
    assert got[0.1] < -45 and abs(got[0.5]) < 1e-9 and got[0.9] > 45


def test_broadcast_asof_join_matches_duck(ray_session, duck):
    import numpy as np

    from tbl_ray.functions.joins import broadcast_asof_join

    rng = np.random.default_rng(5)
    left = pa.table(
        {
            "sym": rng.choice(["a", "b", "c"], 400).tolist(),
            "t": rng.integers(0, 1000, 400),
            "qty": rng.integers(1, 50, 400),
        }
    )
    right = pa.table(
        {
            "sym": ["a"] * 5 + ["b"] * 4,  # note: no 'c' quotes at all
            "t": [10, 200, 400, 600, 800, 50, 300, 700, 900],
            "px": [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0, 30.0, 40.0],
        }
    )
    got = pa.Table.from_pylist(
        broadcast_asof_join(
            ray.data.from_arrow(left).repartition(4), right, on="t", by="sym"
        ).take_all()
    ).sort_by([("sym", "ascending"), ("t", "ascending"), ("qty", "ascending")])
    duck.register("asof_l", left)
    duck.register("asof_r", right)
    want = duck.execute(
        "SELECT l.sym, l.t, l.qty, r.px FROM asof_l l"
        " ASOF LEFT JOIN asof_r r ON l.sym = r.sym AND l.t >= r.t"
        " ORDER BY l.sym, l.t, l.qty"
    ).fetch_arrow_table()
    assert got.column("px").to_pylist() == want.column("px").to_pylist()


def test_broadcast_asof_join_no_by(ray_session):
    from tbl_ray.functions.joins import broadcast_asof_join

    left = pa.table({"t": [1, 5, 9, 100]})
    right = pa.table({"t": [2, 6], "v": ["x", "y"]})
    rows = sorted(
        broadcast_asof_join(
            ray.data.from_arrow(left), right, on="t"
        ).take_all(),
        key=lambda r: r["t"],
    )
    assert [r["v"] for r in rows] == [None, "x", "y", "y"]


def test_normalize_text_matches_duck(sf_dir, duck):
    from tbl_ray.functions.text import normalize_text

    got = (
        pa.Table.from_pylist(
            normalize_text(docs_ds(sf_dir)).take_all()
        )
        .select(["doc_id", "text"])
        .sort_by("doc_id")
    )
    want = duck.execute(
        "SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
        " AS text FROM documents ORDER BY doc_id"
    ).fetch_arrow_table()
    assert got.column("text").to_pylist() == want.column("text").to_pylist()


def test_normalize_text_edge_cases(ray_session):
    from tbl_ray.functions.text import normalize_text_batch

    t = pa.table({"text": ["  Mixed CASE \t\n spaces  ", "", "ok"]})
    out = normalize_text_batch(t)
    assert out.column("text").to_pylist() == ["mixed case spaces", "", "ok"]


def test_curate_webtext_funnel(sf_dir, tmp_path):
    from tbl_ray.pipelines.webtext import WebtextConfig, curate_webtext

    docs = docs_ds(sf_dir)

    def head_docs(t):
        import pyarrow.compute as _pc

        return t.filter(_pc.less(t.column("doc_id"), 5))

    eval_ds = docs_ds(sf_dir).map_batches(
        head_docs, batch_format="pyarrow", zero_copy_batch=True
    )
    out_path = str(tmp_path / "curated.parquet")
    kept, report = curate_webtext(
        docs,
        cfg=WebtextConfig(languages=[], min_quality=0.0, sample_n=50),
        eval_ds=eval_ds,
        out_path=out_path,
        audit_counts=True,
    )
    assert report["input_rows"] == 500
    assert (
        report["input_rows"]
        >= report["after_filter"]
        >= report["after_exact_dedup"]
        >= report["after_minhash_dedup"]
        >= report["after_decontaminate"]
        >= report["after_sample"]
    )
    assert report["after_sample"] == 50
    import pyarrow.parquet as pq2

    written = pq2.read_table(out_path)
    assert written.num_rows == 50
    # curated rows carry the analysis columns
    assert {"quality", "lang_pred"} <= set(written.schema.names)


def test_minhash_native_numpy_parity():
    """The C minhash kernel must be bit-identical to the numpy path on
    empties, short rows, unicode, and random payloads."""
    from tbl_ray.codecs import native
    from tbl_ray.functions.dedup import minhash_signatures

    rng = np.random.default_rng(0)
    texts = [
        "",
        "short",
        "exactly8",
        "ninechars",
        "répétition of ünicode ▲▼ and more bytes",
        "the quick brown fox jumps over the lazy dog " * 20,
    ] + [
        "".join(chr(int(c)) for c in rng.integers(32, 900, int(n)))
        for n in rng.integers(0, 200, 200)
    ]
    col = pa.array(texts)
    real = native._kernels()
    if real.cdll is None:
        pytest.skip("no compiler on this host")
    numpy_only = native._Kernels.__new__(native._Kernels)
    numpy_only.cdll = None
    try:
        native._K = real
        sig_c = minhash_signatures(col, 32, 7)
        native._K = numpy_only
        sig_np = minhash_signatures(col, 32, 7)
    finally:
        native._K = real
    assert np.array_equal(sig_c, sig_np)
    # and a different seed/hash-count still agrees
    try:
        native._K = real
        s2_c = minhash_signatures(col, 16, 99)
        native._K = numpy_only
        s2_np = minhash_signatures(col, 16, 99)
    finally:
        native._K = real
    assert np.array_equal(s2_c, s2_np)


def test_top_ngrams_boundaries_and_paths(monkeypatch):
    from tbl_ray.functions.text import top_ngrams

    d = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1, 2], "text": ["a b c", "c  a", ""]})
    )
    # bigrams never cross documents; doubled spaces produce no '' words
    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", "0")
    got = sorted((r["ngram"], r["n"]) for r in top_ngrams(d, n=2, k=10).take_all())
    assert got == [("a b", 1), ("b c", 1), ("c a", 1)]
    tri = [(r["ngram"], r["n"]) for r in top_ngrams(d, n=3, k=10).take_all()]
    assert tri == [("a b c", 1)]
    uni = {r["ngram"]: r["n"] for r in top_ngrams(d, n=1, k=10).take_all()}
    assert uni == {"a": 2, "b": 1, "c": 2}


def test_shuffle_join_inner_and_left_outer():
    from tbl_ray.functions.joins import shuffle_join

    l = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "a": ["x", "y", "z"]}))
    r = ray.data.from_arrow(pa.table({"k": [1, 1, 4], "b": [10, 11, 40]}))
    inner = sorted(
        (row["k"], row["a"], row["b"])
        for row in shuffle_join(l, r, "k").take_all()
    )
    assert inner == [(1, "x", 10), (1, "x", 11)]
    louter = sorted(
        (row["k"], row["a"], row["b"])
        for row in shuffle_join(l, r, "k", join_type="left outer").take_all()
    )
    assert louter == [(1, "x", 10), (1, "x", 11), (2, "y", None), (3, "z", None)]


def test_shuffle_join_collision_suffix_and_key_checks():
    from tbl_ray.functions.joins import shuffle_join

    l = ray.data.from_arrow(pa.table({"k": [1], "v": [5]}))
    r = ray.data.from_arrow(pa.table({"k": [1], "v": [9]}))
    out = shuffle_join(l, r, "k").take_all()
    assert out == [{"k": 1, "v": 5, "v_r": 9}]
    bad = ray.data.from_arrow(pa.table({"k": ["1"], "w": [0]}))
    with pytest.raises(ValueError, match="dtype differs"):
        shuffle_join(l, bad, "k")
    with pytest.raises(ValueError, match="missing"):
        shuffle_join(l, ray.data.from_arrow(pa.table({"z": [1]})), "k")


def test_embedding_centroids_paths_identical(sf_dir, monkeypatch):
    from tbl_ray.functions.similarity import embedding_centroids

    def run():
        ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        return sorted(
            (r["label"], r["pos"], r["value"], r["n"])
            for r in embedding_centroids(ds, "label").take_all()
        )

    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", str(1 << 30))
    local = run()
    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", "0")
    dist = run()
    assert local == dist and len(local) > 0
    # mean of a hand-built table
    t = pa.table({
        "label": [0, 0, 1],
        "embedding": [[1.0, 3.0], [3.0, 5.0], [10.0, 20.0]],
    })
    d = ray.data.from_arrow(t)
    got = {(r["label"], r["pos"]): (r["value"], r["n"])
           for r in embedding_centroids(d, "label").take_all()}
    assert got == {(0, 1): (2.0, 2), (0, 2): (4.0, 2),
                   (1, 1): (10.0, 1), (1, 2): (20.0, 1)}


def test_shuffle_join_null_keys_never_match():
    # SQL equality never matches NULL = NULL (review finding): null-key
    # right rows match nothing; null-key left rows vanish under inner
    # and survive with null right columns under left outer
    from tbl_ray.functions.joins import shuffle_join

    l = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None], pa.int64()), "a": ["x", "y"]})
    )
    r = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None], pa.int64()), "b": [10, 99]})
    )
    inner = sorted(
        (row["k"], row["a"], row["b"]) for row in shuffle_join(l, r, "k").take_all()
    )
    assert inner == [(1, "x", 10)]
    louter = sorted(
        (row["a"], row["k"], row["b"])
        for row in shuffle_join(l, r, "k", join_type="left outer").take_all()
    )
    assert louter == [("x", 1, 10), ("y", None, None)]


def test_shuffle_join_multikey_empty_side_single_bucket():
    from tbl_ray.functions.joins import shuffle_join

    l = ray.data.from_arrow(
        pa.table({"k1": [1, 1, 2], "k2": ["a", "b", "a"], "v": [10, 11, 12]})
    )
    r = ray.data.from_arrow(
        pa.table({"k1": [1, 2, 2], "k2": ["a", "a", "z"], "w": [7, 8, 9]})
    )
    got = sorted(
        (x["k1"], x["k2"], x["v"], x["w"])
        for x in shuffle_join(l, r, ["k1", "k2"], n_buckets=1).take_all()
    )
    assert got == [(1, "a", 10, 7), (2, "a", 12, 8)]
    empty_r = ray.data.from_arrow(
        pa.table({"k1": pa.array([], pa.int64()),
                  "k2": pa.array([], pa.string()),
                  "w": pa.array([], pa.int64())})
    )
    lo = sorted(
        (x["v"], x["w"])
        for x in shuffle_join(l, empty_r, ["k1", "k2"], join_type="left outer").take_all()
    )
    assert lo == [(10, None), (11, None), (12, None)]
    # a schema-less (row-filtered empty) side fails with a clear message
    bad = ray.data.from_arrow(pa.table({"k1": [9]})).filter(lambda row: False)
    with pytest.raises(ValueError, match="known schema"):
        shuffle_join(l, bad, ["k1"])


# ---- round-3 ADVICE regressions ------------------------------------------


def test_asof_join_null_left_on_gets_nulls(ray_session, duck):
    """A null left `on` must join to NOTHING (DuckDB ASOF semantics), not
    silently pin to the last right row (round-3 ADVICE, medium)."""
    from tbl_ray.functions.joins import broadcast_asof_join

    left = pa.table({"t": pa.array([1, None, 9, None, 100], pa.int64())})
    right = pa.table({"t": [2, 6], "v": ["x", "y"]})
    rows = broadcast_asof_join(
        ray.data.from_arrow(left).repartition(2), right, on="t"
    ).take_all()
    got = sorted(
        ((r["t"] if r["t"] is not None else -1), r["v"]) for r in rows
    )
    assert got == [(-1, None), (-1, None), (1, None), (9, "y"), (100, "y")]
    # with `by`: null on inside a matching group also stays null
    l2 = pa.table(
        {"s": ["a", "a", "a"], "t": pa.array([50, None, 900], pa.int64())}
    )
    r2 = pa.table({"s": ["a"], "t": [10], "px": [1.5]})
    rows2 = broadcast_asof_join(
        ray.data.from_arrow(l2), r2, on="t", by="s"
    ).take_all()
    px = {r["t"]: r["px"] for r in rows2}
    assert px == {50: 1.5, None: None, 900: 1.5}


def test_asof_join_null_right_on_dropped(ray_session):
    from tbl_ray.functions.joins import broadcast_asof_join

    left = pa.table({"t": [5]})
    right = pa.table(
        {"t": pa.array([None, 3], pa.int64()), "v": ["bad", "ok"]}
    )
    rows = broadcast_asof_join(ray.data.from_arrow(left), right, on="t").take_all()
    assert rows[0]["v"] == "ok"


def test_regex_extract_escaped_paren(ray_session, duck):
    """r'\\((\\d+)\\)' — escaped literal parens before the capture group
    (round-3 ADVICE: the rewrite used to mangle the first '\\(')."""
    from tbl_ray.functions.text import regex_extract

    tbl = pa.table({"s": ["a(12)b", "(7)", "none", None, "x(?)"]})
    got = (
        pa.Table.from_pylist(
            regex_extract(
                ray.data.from_arrow(tbl), "s", r"\((\d+)\)", "g"
            ).take_all()
        )
        .sort_by([("s", "ascending")])
        .column("g")
        .to_pylist()
    )
    duck.register("rex_esc", tbl)
    want = (
        duck.execute(
            r"SELECT regexp_extract(s, '\((\d+)\)', 1) AS g FROM rex_esc"
            " ORDER BY s"
        )
        .fetch_arrow_table()
        .column("g")
        .to_pylist()
    )
    assert got == want


def test_regex_extract_noncapturing_prefix(ray_session):
    """First '(' is '(?:' — the rewrite must skip to the capturing group."""
    from tbl_ray.functions.text import regex_extract

    tbl = pa.table({"s": ["foobar1", "bazqux2"]})
    got = sorted(
        r["g"]
        for r in regex_extract(
            ray.data.from_arrow(tbl), "s", r"(?:foo|baz)\w+?(\d)", "g"
        ).take_all()
    )
    assert got == ["1", "2"]
    with pytest.raises(ValueError, match="capture group"):
        regex_extract(ray.data.from_arrow(tbl), "s", r"\(\d+\)", "g")


def test_broadcast_join_collision_rsuffix(ray_session):
    """Direct broadcast_join with colliding non-key names must rsuffix,
    not emit duplicate column names (round-3 ADVICE)."""
    from tbl_ray.functions.joins import broadcast_join

    big = ray.data.from_arrow(pa.table({"k": [1, 2], "v": [10, 20]}))
    small = pa.table({"k": [1, 2], "v": [7, 8]})
    out = pa.Table.from_pylist(broadcast_join(big, small, "k").take_all())
    assert sorted(out.schema.names) == ["k", "v", "v_r"]
    m = {r["k"]: (r["v"], r["v_r"]) for r in out.to_pylist()}
    assert m == {1: (10, 7), 2: (20, 8)}


def test_rolling_range_agg_null_value_raises(ray_session):
    from tbl_ray.functions.winfns import rolling_range_agg

    t = pa.table(
        {
            "k": ["a", "a"],
            "ts": pa.array([1000000, 2000000], pa.timestamp("us")),
            "v": pa.array([1, None], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="contains nulls"):
        rolling_range_agg(
            ds, key_col="k", ts_col="ts", value_col="v", window="2s"
        ).take_all()


def test_count_distinct_by_distributed_bucket_path(ray_session, duck, monkeypatch):
    """Force the distributed plan (no local fold) and check null-key and
    null-value semantics against DuckDB."""
    monkeypatch.setenv("TBL_RAY_LOCAL_SKETCH_BYTES", "1")
    from tbl_ray.functions.sketches import count_distinct_by

    rng = np.random.default_rng(11)
    keys = rng.choice(["a", "b", None, "d"], 500).tolist()
    vals = rng.choice([1, 2, 3, None, 5, 6], 500).tolist()
    t = pa.table(
        {"k": pa.array(keys, pa.string()), "v": pa.array(vals, pa.int64())}
    )
    rows = count_distinct_by(
        ray.data.from_arrow(t).repartition(5), "k", "v"
    ).take_all()
    got = sorted(
        ((r["k"], r["n_distinct"]) for r in rows),
        key=lambda x: (x[0] is None, x[0]),
    )
    duck.register("cdb_t", t)
    want = sorted(
        duck.execute(
            "SELECT k, count(DISTINCT v) AS n FROM cdb_t GROUP BY k"
        ).fetchall(),
        key=lambda x: (x[0] is None, x[0]),
    )
    assert got == [(k, n) for k, n in want]


def test_safe_group_by_null_string_plus_int_keys():
    """pyarrow 16.x grouper bug: null-containing string key + fixed-width
    key mis-merges groups across 32-row encoder mini-batches. safe_group_by
    must neutralize it and preserve the original schema."""
    from tbl_ray.stages.exchange import safe_group_by

    n = 200
    ks = pa.array(
        [None if i % 2 else f"s{i % 4}" for i in range(n)], pa.string()
    )
    vs = pa.array([i % 3 for i in range(n)], pa.int64())
    t = pa.table({"k": ks, "v": vs, "x": [1] * n})
    expect = len(set(zip(ks.to_pylist(), vs.to_pylist())))
    assert t.group_by(["k", "v"]).aggregate([]).num_rows != expect  # bug live
    out = safe_group_by(t, ["k", "v"], [("x", "sum")])
    assert out.num_rows == expect
    assert out.schema.field("k").type == pa.string()
    # sums must partition n rows exactly
    assert sum(out.column("x_sum").to_pylist()) == n
    # binary flavor
    tb = pa.table({"k": pc.cast(ks, pa.binary()), "v": vs})
    out2 = safe_group_by(tb, ["k", "v"])
    assert out2.num_rows == expect
    assert out2.schema.field("k").type == pa.binary()
    # single-key and no-null paths stay untouched (no cast)
    assert safe_group_by(t, "v", [("x", "count")]).num_rows == 3


def test_jaccard_dedup_exact_verification(ray_session):
    import ray.data

    from tbl_ray.functions.dedup import jaccard_dedup, ngram_jaccard

    base = "the quick brown fox jumps over the lazy dog " * 4
    near = base[:-8] + "sleeping"          # high trigram overlap
    far = "completely different content with no shared trigrams at all"
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": near},       # near-dup of 1 -> dropped
        {"doc_id": 3, "text": far},
        {"doc_id": 4, "text": base},       # exact dup of 1 -> dropped
    ]
    assert ngram_jaccard(base, near) >= 0.8
    assert ngram_jaccard(base, far) < 0.2
    out = jaccard_dedup(
        ray.data.from_items(rows), "text", "doc_id", threshold=0.8
    )
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert kept == [1, 3]


def test_pair_budget_guard_on_pathological_corpus(ray_session, monkeypatch):
    """A corpus where EVERYTHING is a near-duplicate must hit the pair
    budget with a clear message, not OOM the driver building the list."""
    import pytest as _pytest

    from tbl_ray.functions.dedup import minhash_dup_pairs

    monkeypatch.setenv("TBL_RAY_MAX_PAIRS", "50")
    rows = [{"doc_id": i, "text": "identical duplicate content " * 10}
            for i in range(60)]  # ~1770 pairs, all verified
    with _pytest.raises(RuntimeError, match="TBL_RAY_MAX_PAIRS"):
        minhash_dup_pairs(
            ray.data.from_items(rows), "text", "doc_id", threshold=0.8
        )
    monkeypatch.setenv("TBL_RAY_MAX_PAIRS", "5000")
    pairs = minhash_dup_pairs(
        ray.data.from_items(rows), "text", "doc_id", threshold=0.8
    )
    assert len(pairs) == 60 * 59 // 2


def test_jaccard_dedup_null_texts(ray_session):
    """Null-text docs sketch identically, so they DO reach exact
    verification as candidates; they must be coalesced to '' (and thus
    dedup against each other), not crash ngram_jaccard(None, ...)."""
    import ray.data

    from tbl_ray.functions.dedup import jaccard_dedup

    rows = [
        {"doc_id": 1, "text": None},
        {"doc_id": 2, "text": None},   # null == null -> dropped
        {"doc_id": 3, "text": "real content that is not a duplicate"},
    ]
    out = jaccard_dedup(
        ray.data.from_items(rows), "text", "doc_id", threshold=0.8
    )
    assert sorted(r["doc_id"] for r in out.take_all()) == [1, 3]


def test_jaccard_dedup_rejects_sketch_false_positives(ray_session):
    """Pairs the sketch proposes but exact Jaccard refutes must survive."""
    import ray.data

    from tbl_ray.functions.dedup import jaccard_dedup

    # similar-ish but below the 0.9 exact bar: verification must keep both
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "alpha beta gamma delta epsilon zeta eta iota kappa"
    rows = [{"doc_id": 1, "text": a}, {"doc_id": 2, "text": b}]
    out = jaccard_dedup(
        ray.data.from_items(rows), "text", "doc_id", threshold=0.9
    )
    assert sorted(r["doc_id"] for r in out.take_all()) == [1, 2]


def test_jaccard_dedup_distributed_verify_matches_driver(ray_session):
    """Duplicate-dense corpus: the distributed verification path (pairs
    co-bucketed with candidate texts, ngram_jaccard in map_batches — no
    text ever on the driver) keeps exactly the same documents as the
    driver-side path."""
    import ray.data

    from tbl_ray.functions.dedup import jaccard_dedup

    rng_words = [
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
        "theta", "iota", "kappa",
    ]
    rows = []
    for fam in range(40):
        base = " ".join(rng_words[(fam + k) % 10] for k in range(12)) * 3
        for m in range(5):  # 5 near-identical members per family
            rows.append(
                {"doc_id": fam * 5 + m, "text": base + f" tail{fam}-{m}"}
            )
    ds = ray.data.from_items(rows)
    kw = dict(threshold=0.8, n_hashes=16, bands=8)
    drv = sorted(
        r["doc_id"]
        for r in jaccard_dedup(ds, "text", "doc_id", verify="driver", **kw).take_all()
    )
    dist = sorted(
        r["doc_id"]
        for r in jaccard_dedup(
            ds, "text", "doc_id", verify="distributed", **kw
        ).take_all()
    )
    assert drv == dist
    assert len(drv) < len(rows)  # families actually collapsed


def test_jaccard_dedup_star_reexpansion(ray_session, monkeypatch):
    """When the min-id representative of an identical-signature star
    group fails exact verification, the member-member pairs are still
    verified — members near-identical to EACH OTHER stay connected."""
    import ray.data

    from tbl_ray.functions import dedup as dd

    good = "hello world foo bar baz qux " * 5
    rows = [
        {"doc_id": 1, "text": "totally unrelated gibberish zzz qqq vvv"},
        {"doc_id": 2, "text": good + "tail-a"},
        {"doc_id": 3, "text": good + "tail-b"},
    ]
    ds = ray.data.from_items(rows)

    # craft a star group whose rep (1) fails exact verification against
    # both members while the members pass against each other — the
    # oversized-bucket collapse emits exactly this shape
    fake = [
        {"id_a": 1, "id_b": 2, "est_jaccard": 1.0},
        {"id_a": 1, "id_b": 3, "est_jaccard": 1.0},
    ]
    monkeypatch.setattr(dd, "minhash_dup_pairs", lambda *a, **k: fake)
    out = dd.jaccard_dedup(ds, "text", "doc_id", threshold=0.8)
    kept = sorted(r["doc_id"] for r in out.take_all())
    # without re-expansion: rep pairs both rejected -> nothing dropped
    # with re-expansion: (2, 3) verified and collapses -> 3 dropped
    assert kept == [1, 2]


def test_reexpansion_budget_fires_inside_expansion(ray_session, monkeypatch):
    """The pair budget must trip WHILE a rejected star group expands its
    member-member pairs — not after the full quadratic product has been
    materialized on the driver."""
    import pytest as _pytest
    import ray.data

    from tbl_ray.functions import dedup as dd

    good = "hello world foo bar baz qux " * 5
    rows = [{"doc_id": 1, "text": "totally unrelated gibberish zzz"}]
    rows += [{"doc_id": i, "text": good + f"tail-{i}"} for i in range(2, 82)]
    ds = ray.data.from_items(rows)
    # star group of 80 members whose rep fails verification -> the
    # re-expansion would propose 80*79/2 = 3160 member-member pairs;
    # a budget of 200 must abort the expansion loop itself
    fake = [
        {"id_a": 1, "id_b": i, "est_jaccard": 1.0} for i in range(2, 82)
    ]
    monkeypatch.setattr(dd, "minhash_dup_pairs", lambda *a, **k: fake)
    monkeypatch.setenv("TBL_RAY_MAX_PAIRS", "200")
    with _pytest.raises(RuntimeError, match="re-expansion"):
        dd.jaccard_dedup(ds, "text", "doc_id", threshold=0.8)


def test_jaccard_dedup_cross_group_inheritance(ray_session, monkeypatch):
    """A collapsed member inherits its rep's CROSS-group candidates: when
    the rep's cross pair fails exact verification, the member's
    equivalent pair (identical signature => identical estimate) is still
    verified, matching the uncollapsed all-pairs output."""
    import ray.data

    from tbl_ray.functions import dedup as dd

    good = "hello world foo bar baz qux " * 5
    rows = [
        {"doc_id": 1, "text": "totally unrelated gibberish zzz qqq vvv"},
        {"doc_id": 2, "text": good + "tail-a"},
        {"doc_id": 3, "text": good + "tail-b"},
    ]
    ds = ray.data.from_items(rows)
    # star (1, 2) — rep 1's text is unrelated, so the star AND the
    # cross pair (1, 3) both fail; only the inherited (2, 3) passes
    fake = [
        {"id_a": 1, "id_b": 2, "est_jaccard": 1.0},
        {"id_a": 1, "id_b": 3, "est_jaccard": 0.9},
    ]
    monkeypatch.setattr(dd, "minhash_dup_pairs", lambda *a, **k: fake)
    out = dd.jaccard_dedup(ds, "text", "doc_id", threshold=0.8)
    kept = sorted(r["doc_id"] for r in out.take_all())
    # without cross inheritance nothing is dropped; with it, 2 and 3
    # connect and 3 (the larger id) is dropped
    assert kept == [1, 2]


def test_jaccard_dedup_severed_member_inherits_passed_cross(
    ray_session, monkeypatch
):
    """Case: the rep's cross pair PASSES but its star pair fails — the
    severed member still gets its inherited direct check against the
    other side (j12 < 0.8 <= j23, j13), as all-pairs would propose."""
    import ray.data

    from tbl_ray.functions import dedup as dd

    tokens = [f"w{i:03d}" for i in range(40)]
    shared = [f"w{100 + i:03d}" for i in range(6)]
    rows = [
        {"doc_id": 1, "text": " ".join(tokens + ["uniqa"])},
        {"doc_id": 2, "text": " ".join(
            tokens + shared + [f"uqc{i}" for i in range(5)]
        )},
        {"doc_id": 3, "text": " ".join(tokens + shared + ["uniqb"])},
    ]
    # premises of the scenario, asserted against the real verifier
    j12 = dd.ngram_jaccard(rows[0]["text"], rows[1]["text"])
    j13 = dd.ngram_jaccard(rows[0]["text"], rows[2]["text"])
    j23 = dd.ngram_jaccard(rows[1]["text"], rows[2]["text"])
    assert j12 < 0.8 <= min(j13, j23), (j12, j13, j23)

    ds = ray.data.from_items(rows)
    fake = [
        {"id_a": 1, "id_b": 2, "est_jaccard": 1.0},  # star: fails (j12)
        {"id_a": 1, "id_b": 3, "est_jaccard": 0.9},  # cross: passes (j13)
    ]
    monkeypatch.setattr(dd, "minhash_dup_pairs", lambda *a, **k: fake)
    out = dd.jaccard_dedup(ds, "text", "doc_id", threshold=0.8)
    kept = sorted(r["doc_id"] for r in out.take_all())
    # all-pairs would verify (2, 3) too (est identical to (1, 3)), so
    # all three connect: 1 kept, 2 and 3 dropped
    assert kept == [1]


def test_bucket_cap_clamps_nonpositive(monkeypatch):
    """TBL_RAY_MAX_BUCKET=0 must not produce a zero tile size (range()
    step crash inside the tiled pairwise pass) — it clamps to 1."""
    from tbl_ray.functions.dedup import _bucket_cap

    monkeypatch.setenv("TBL_RAY_MAX_BUCKET", "0")
    assert _bucket_cap("minhash", 1000) == 1
    monkeypatch.setenv("TBL_RAY_MAX_BUCKET", "-5")
    assert _bucket_cap("minhash", 1000) == 1


def test_jaccard_dedup_bad_verify_fails_fast(ray_session):
    """An invalid verify= value raises immediately, even when the corpus
    has no candidate pairs (no silent success on clean dev data)."""
    import pytest
    import ray.data

    from tbl_ray.functions.dedup import jaccard_dedup

    ds = ray.data.from_items(
        [{"doc_id": 1, "text": "alpha"}, {"doc_id": 2, "text": "omega"}]
    )
    with pytest.raises(ValueError, match="verify must be"):
        jaccard_dedup(ds, "text", "doc_id", verify="distrbuted")


def test_broadcast_join_rename_does_not_collide_with_existing_suffix(
    ray_session,
):
    import ray.data

    from tbl_ray.functions.joins import broadcast_join

    big = pa.table({"k": [1, 2], "v": [10, 20], "v_r": [100, 200]})
    small = pa.table({"k": [1, 2], "v": ["a", "b"]})
    out = pa.concat_tables(
        broadcast_join(ray.data.from_arrow(big), small, "k").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    names = out.column_names
    assert len(names) == len(set(names)), names  # no silent duplicates
    assert "v_r_r" in names  # the rename stepped past the taken suffix


def test_wav_and_frame_container_corrupt_payloads_raise_valueerror():
    """Symmetric to the image-side guarantee: corrupt audio/video
    payloads must surface as ValueError (never struct.error/IndexError
    escaping the stage error policies)."""
    import struct

    import numpy as np
    import pytest

    from tbl_ray.stages.imagecodec import decode_wav
    from tbl_ray.stages.multimodal import FRAMES_MAGIC, unpack_frame

    # targeted: truncated fmt chunk, zero channels, odd data length
    short_fmt = (b"RIFF" + b"\x00" * 4 + b"WAVE"
                 + b"fmt " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError, match="truncated fmt"):
        decode_wav(short_fmt)
    zero_ch = (b"RIFF" + b"\x00" * 4 + b"WAVE"
               + b"fmt " + struct.pack("<I", 16)
               + struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
               + b"data" + struct.pack("<I", 4) + b"\x00\x01\x02\x03")
    with pytest.raises(ValueError, match="0 channels"):
        decode_wav(zero_ch)

    # targeted: frame container with a huge count / truncated table
    bogus = FRAMES_MAGIC + struct.pack("<I", 2**31) + b"\x00" * 16
    with pytest.raises(ValueError, match="truncated length table"):
        unpack_frame(bogus, 0)
    with pytest.raises(ValueError):
        unpack_frame(FRAMES_MAGIC, 0)  # only the magic, no count

    # fuzz: random bytes behind each magic
    rng = np.random.default_rng(17)
    for trial in range(400):
        n = int(rng.integers(0, 100))
        tail = bytes(rng.integers(0, 256, n).tolist())
        try:
            decode_wav(b"RIFF" + tail)
        except ValueError:
            pass
        try:
            unpack_frame(FRAMES_MAGIC + tail, 0)
        except (ValueError, IndexError):
            pass  # IndexError only from the in-range API check


def _uf_components(tbl):
    from tbl_ray.functions.dedup import union_find

    pairs = list(zip(tbl.column("id_a").to_pylist(), tbl.column("id_b").to_pylist()))
    root = union_find(pairs)
    comp = {}
    for a, b in pairs:
        for x in (a, b):
            comp.setdefault(root.get(x, x), set()).add(x)
    return {frozenset(v) for v in comp.values()}


def test_oversized_bucket_collapses_to_unique_signatures(monkeypatch):
    """Buckets past TBL_RAY_MAX_BUCKET no longer silently drop pairs:
    they collapse to unique signatures, and the union-find components
    (what near-dedup actually consumes) are IDENTICAL to all-pairs."""
    import pyarrow as pa
    import numpy as np

    from tbl_ray.functions.dedup import _bucket_pairs

    rng = np.random.default_rng(5)
    # 40 docs, 4 distinct signatures; sigs 0/1 agree on 3 of 4 positions
    base = np.array(
        [[1, 2, 3, 4], [1, 2, 3, 9], [7, 7, 7, 7], [8, 9, 10, 11]],
        dtype=np.uint64,
    )
    groups = rng.integers(0, 4, 40)
    sig = base[groups]
    ids = np.arange(100, 140, dtype=np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(ids),
            "sig": pa.array([list(map(int, s)) for s in sig], pa.list_(pa.uint64())),
        }
    )
    monkeypatch.setenv("TBL_RAY_MAX_BUCKET", "1000")
    full = _bucket_pairs(0.7, "doc_id")(t)
    # the cap resolves at closure creation (driver side), so rebuild
    monkeypatch.setenv("TBL_RAY_MAX_BUCKET", "10")
    collapsed = _bucket_pairs(0.7, "doc_id")(t)
    assert collapsed.num_rows < full.num_rows  # star+reps, not a clique
    assert _uf_components(full) == _uf_components(collapsed)
    # est values on the cross-group pairs are preserved exactly
    assert set(collapsed.column("est_jaccard").to_pylist()) <= set(
        full.column("est_jaccard").to_pylist()
    )


def test_oversized_bucket_with_degenerate_hash_raises(monkeypatch):
    """Only past the HARD cap (TBL_RAY_HARD_BUCKET) does a bucket still
    raise; between soft cap and hard cap it computes in tiles."""
    import pyarrow as pa
    import numpy as np
    import pytest

    from tbl_ray.functions.dedup import _bucket_pairs

    n = 30
    sig = np.arange(n * 4, dtype=np.uint64).reshape(n, 4)  # all distinct
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "sig": pa.array([list(map(int, s)) for s in sig], pa.list_(pa.uint64())),
        }
    )
    monkeypatch.setenv("TBL_RAY_MAX_BUCKET", "10")
    monkeypatch.setenv("TBL_RAY_HARD_BUCKET", "20")
    with pytest.raises(ValueError, match="distinct signatures"):
        _bucket_pairs(0.7, "doc_id")(t)
    # same input below the hard cap: computes (all-distinct, no matches
    # above threshold -> empty pair table), no crash
    monkeypatch.setenv("TBL_RAY_HARD_BUCKET", "50000")
    out = _bucket_pairs(0.7, "doc_id")(t)
    assert out.num_rows == 0


def test_hard_cap_never_undercuts_raised_soft_cap(monkeypatch):
    """An explicitly raised TBL_RAY_MAX_BUCKET must not be silently
    overridden by a lower TBL_RAY_HARD_BUCKET: the hard bound clamps to
    at least the soft cap, so following the error message's own remedy
    (raise the soft cap) keeps working."""
    import numpy as np
    import pyarrow as pa

    from tbl_ray.functions.dedup import _bucket_cap, _bucket_pairs, _hard_bucket_cap

    monkeypatch.setenv("TBL_RAY_MAX_BUCKET", "100000")
    monkeypatch.setenv("TBL_RAY_HARD_BUCKET", "50000")
    assert _hard_bucket_cap(_bucket_cap("minhash", 1000)) == 100000

    # end to end: 75 rows / 25 distinct signatures, soft cap 30, hard
    # env 20 — the collapse path runs and must COMPUTE (u=25 <= clamped
    # hard 30), not raise citing a bound below the user's own cap
    n_uniq = 25
    sig = np.repeat(
        np.arange(n_uniq * 4, dtype=np.uint64).reshape(n_uniq, 4), 3, axis=0
    )
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n_uniq * 3, dtype=np.int64)),
            "sig": pa.array([list(map(int, s)) for s in sig], pa.list_(pa.uint64())),
        }
    )
    monkeypatch.setenv("TBL_RAY_MAX_BUCKET", "30")
    monkeypatch.setenv("TBL_RAY_HARD_BUCKET", "20")
    out = _bucket_pairs(0.7, "doc_id")(t)
    # exact-duplicate stars only (distinct sigs share no hash values)
    assert out.num_rows == n_uniq * 2
    assert set(out.column("est_jaccard").to_pylist()) == {1.0}


def test_oversized_bucket_tiled_pairwise_matches_bruteforce(monkeypatch):
    """5,000 DISTINCT signatures in one bucket: the tiled pairwise path
    (unique count > soft cap) emits exactly the brute-force pair set
    instead of raising — the r04 bench crash mode (2,115 distinct sigs
    in one bucket at sf0.1 under the one-hash-band config)."""
    import pyarrow as pa
    import numpy as np

    from tbl_ray.functions.dedup import _bucket_pairs

    n = 5000
    rng = np.random.default_rng(7)
    sig = rng.integers(0, 40, size=(n, 4)).astype(np.uint64)
    sig[:, 0] = np.arange(n, dtype=np.uint64)  # all signatures distinct
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "sig": pa.array(
                [list(map(int, s)) for s in sig], pa.list_(pa.uint64())
            ),
        }
    )

    def pair_set(tbl):
        return set(
            zip(
                tbl.column("id_a").to_pylist(),
                tbl.column("id_b").to_pylist(),
                tbl.column("est_jaccard").to_pylist(),
            )
        )

    monkeypatch.setenv("TBL_RAY_MAX_BUCKET", "100000")
    brute = pair_set(_bucket_pairs(0.7, "doc_id")(t))  # direct triu path
    monkeypatch.setenv("TBL_RAY_MAX_BUCKET", "700")  # force tiled path
    tiled = pair_set(_bucket_pairs(0.7, "doc_id")(t))
    assert brute  # threshold 0.7 => >=3 of 4 agree; planted collisions exist
    assert tiled == brute


def test_simhash_oversized_bucket_collapses(monkeypatch):
    """simhash_dup_pairs' in-bucket pairer: oversized buckets collapse
    to unique simhash values with components identical to all-pairs."""
    import pyarrow as pa
    import numpy as np

    from tbl_ray.functions import dedup as dd

    # reach the inner pairs fn through the public API with tiny docs is
    # slow; instead replicate its construction: 30 rows, 3 unique hashes,
    # two within hamming 2 of each other, one far away
    texts = ["alpha beta gamma"] * 12 + ["alpha beta gamm"] * 10 + ["zzz qqq"] * 8
    ids = list(range(30))
    import ray

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in zip(ids, texts)]
    )
    full = {
        (p["id_a"], p["id_b"])
        for p in dd.simhash_dup_pairs(ds, max_hamming=8)
    }
    monkeypatch.setenv("TBL_RAY_MAX_BUCKET", "5")
    collapsed = {
        (p["id_a"], p["id_b"])
        for p in dd.simhash_dup_pairs(ds, max_hamming=8)
    }
    monkeypatch.delenv("TBL_RAY_MAX_BUCKET")

    from tbl_ray.functions.dedup import union_find

    def comps(pairs):
        root = union_find(list(pairs))
        out = {}
        for a, b in pairs:
            for x in (a, b):
                out.setdefault(root.get(x, x), set()).add(x)
        return {frozenset(v) for v in out.values()}

    assert comps(full) == comps(collapsed)
    assert len(collapsed) <= len(full)


def test_embedding_oversized_bucket_collapses(monkeypatch):
    """embedding_dup_pairs: oversized buckets collapse to bit-identical
    vectors; components match all-pairs, degenerate distinct counts raise."""
    import numpy as np
    import ray
    import pytest

    from tbl_ray.functions.dedup import embedding_dup_pairs, union_find

    rng = np.random.default_rng(11)
    base = rng.normal(size=(3, 8))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # 24 docs over 3 distinct embeddings (bit-identical within a group)
    groups = rng.integers(0, 3, 24)
    rows = [
        {"doc_id": int(i), "emb": base[g].tolist()}
        for i, g in enumerate(groups)
    ]
    ds = ray.data.from_items(rows)
    full = {(p["id_a"], p["id_b"]) for p in embedding_dup_pairs(ds, "emb", "doc_id", threshold=0.95)}
    monkeypatch.setenv("TBL_RAY_MAX_BUCKET", "5")
    collapsed = {(p["id_a"], p["id_b"]) for p in embedding_dup_pairs(ds, "emb", "doc_id", threshold=0.95)}

    def comps(pairs):
        root = union_find(list(pairs))
        out = {}
        for a, b in pairs:
            for x in (a, b):
                out.setdefault(root.get(x, x), set()).add(x)
        return {frozenset(v) for v in out.values()}

    assert comps(full) == comps(collapsed)

    # 24 distinct vectors in one bucket region: between soft cap and
    # hard cap the tiled pairwise path computes (all near-identical, so
    # every pair survives threshold); past the hard cap it raises
    distinct = rng.normal(size=(24, 8))
    distinct /= np.linalg.norm(distinct, axis=1, keepdims=True)
    # force them into one bucket by making them nearly identical but
    # bit-distinct (tiny distinct perturbations of one vector)
    v = distinct[0]
    rows2 = [
        {"doc_id": int(i), "emb": (v + 1e-4 * distinct[i]).tolist()}
        for i in range(24)
    ]
    ds2 = ray.data.from_items(rows2)
    monkeypatch.setenv("TBL_RAY_MAX_BUCKET", "5")
    tiled = {
        (p["id_a"], p["id_b"])
        for p in embedding_dup_pairs(ds2, "emb", "doc_id", threshold=0.95)
    }
    assert len(tiled) == 24 * 23 // 2  # near-identical: full clique survives
    monkeypatch.setenv("TBL_RAY_HARD_BUCKET", "5")
    with pytest.raises(Exception, match="distinct vectors"):
        embedding_dup_pairs(ds2, "emb", "doc_id", threshold=0.95)
