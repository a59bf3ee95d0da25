"""Encode/decode Ray Data stages + synthetic web table invariants."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from tbl_ray.stages.encode import (
    ColumnEncoder,
    decode_table,
    decode_dataset,
    encode_dataset,
)
from tbl_ray.webtable import extract_text, generate_batch, webtable_dataset


def test_generate_batch_deterministic():
    a = generate_batch(1000, 500, seed=7)
    b = generate_batch(1000, 500, seed=7)
    assert a.equals(b)
    c = generate_batch(1000, 500, seed=8)
    assert not a.equals(c)
    assert a.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert a.schema.field("html").type == pa.binary()
    assert a.schema.field("warc_ts").type == pa.timestamp("us")


def test_generate_batch_independent_of_batching():
    whole = generate_batch(0, 400, seed=3)
    parts = pa.concat_tables(
        [generate_batch(0, 200, seed=3), generate_batch(200, 200, seed=3)]
    )
    # rows are a pure function of (seed, global index)
    assert whole.column("url").equals(parts.column("url"))
    assert whole.column("text").equals(parts.column("text"))


def test_extract_text_byte_identical():
    t = generate_batch(0, 1000, seed=42)
    extracted = extract_text(t.column("html").combine_chunks())
    assert extracted.equals(t.column("text").combine_chunks().cast(pa.string()))


def test_lang_skew_zipfian():
    t = generate_batch(0, 20000, seed=42)
    counts = t.column("lang").to_pandas().value_counts()
    assert counts.index[0] == "en" and counts.iloc[0] > 0.4 * 20000


def test_encoder_roundtrip_batch():
    t = generate_batch(0, 2000, seed=42)
    enc = ColumnEncoder()(t)
    # oversized batches split into ~TARGET_CHUNK_BYTES sub-chunks
    # (~3.7 MB of web rows -> several ~1 MiB chunks); total rows conserved
    assert enc.num_rows >= 1
    assert sum(enc.column("num_rows").to_pylist()) == t.num_rows
    assert set(enc.column("columns")[0].as_py()) == set(t.schema.names)
    back = decode_table(enc)
    assert back.select(t.schema.names).equals(t.select(t.schema.names))
    for name in t.schema.names:
        assert back.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), name


def test_encoder_compresses_webtable():
    # force FSST on the text columns to pin the codec-level compression
    # path (no effort level picks FSST for web text anymore: the container
    # captures its redundancy — policy covered in tests/test_effort.py)
    t = generate_batch(0, 5000, seed=42)
    enc = ColumnEncoder(codecs={"text": "fsst", "html": "fsst"})(t)
    import pyarrow.compute as pc

    ratio = (
        pc.sum(enc.column("encoded_bytes")).as_py()
        / pc.sum(enc.column("input_bytes")).as_py()
    )
    assert ratio < 0.7, f"whole-table codec ratio too weak: {ratio:.3f}"
    codecs = dict(
        zip(enc.column("columns")[0].as_py(), enc.column("codecs")[0].as_py())
    )
    assert codecs["lang"] in ("dict", "rle")
    assert codecs["warc_ts"] in ("delta", "for", "bitpack")
    assert codecs["text"] == "fsst"


def test_encode_decode_dataset_pipeline(tmp_path):
    t = generate_batch(0, 6000, seed=5)
    src = str(tmp_path / "src.parquet")
    pq.write_table(t, src)
    ds = ray.data.read_parquet(src)
    enc = encode_dataset(ds, batch_size=1500, concurrency=2)
    out_dir = str(tmp_path / "encoded")
    enc.write_parquet(out_dir, compression="zstd")

    back_ds = decode_dataset(ray.data.read_parquet(out_dir), concurrency=2)
    back = back_ds.take_all()
    assert len(back) == 6000
    got = pa.Table.from_pylist(back).sort_by("url")
    want = t.sort_by("url")
    for name in ("url", "text", "lang"):
        assert got.column(name).combine_chunks().equals(
            want.column(name).combine_chunks()
        ), name
    # encoded parquet (our format) must not exceed plain snappy parquet
    import os

    plain = str(tmp_path / "plain.parquet")
    pq.write_table(t, plain, compression="snappy")
    enc_bytes = sum(
        os.path.getsize(os.path.join(out_dir, f)) for f in os.listdir(out_dir)
    )
    assert enc_bytes <= os.path.getsize(plain), (
        f"encoded {enc_bytes} > snappy parquet {os.path.getsize(plain)}"
    )


def test_webtable_dataset_distributed():
    ds = webtable_dataset(3000, seed=42, batch_rows=1000, concurrency=2)
    assert ds.count() == 3000
    names = ds.schema().names
    assert names == ["url", "warc_ts", "html", "text", "lang"]


def test_edge_case_webtable_roundtrip():
    """FIXTURES.md §1 edge rows: empty text (distinct from null), null html,
    null lang, non-ASCII urls, wide html — codec roundtrip + extraction."""
    base = generate_batch(0, 50, seed=42)
    edge = pa.table(
        {
            "url": pa.array(
                ["https://x.com/%C3%A9t%C3%A9", "https://y.org/a", None,
                 "https://z.net/big", "https://w.io/empty"],
                pa.string(),
            ),
            "warc_ts": pa.array([1, 2, None, 4, 5], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "html": pa.array(
                [b"<html><head><title>t</title></head><body><p></p><footer>crawl</footer></body></html>",
                 None,
                 b"\xff\xfe" * 100,  # undecodable junk
                 b"<html><head><title>big</title></head><body><p>" + b"x" * 300_000 + b"</p><footer>crawl</footer></body></html>",
                 b""],
                pa.binary(),
            ),
            "text": pa.array(["", None, "orphan text", "x" * 300_000, None], pa.string()),
            "lang": pa.array(["fr", None, "en", "en", ""], pa.string()),
        }
    )
    t = pa.concat_tables([base, edge]).combine_chunks()
    enc = ColumnEncoder()(t)
    back = decode_table(enc)
    for name in t.schema.names:
        got = back.column(name).combine_chunks()
        want = t.column(name).combine_chunks()
        assert got.equals(want), name
    # extraction: rows with well-formed html recover text byte-identically
    from tbl_ray.webtable import extract_text

    ext = extract_text(back.column("html").combine_chunks())
    assert ext[50].as_py() == ""          # empty text, not null
    assert ext[51].as_py() is None        # null html -> null
    assert ext[53].as_py() == "x" * 300_000


def test_decode_table_empty_batch_passes_through():
    # an empty encoded block (e.g. downstream of a filter) must not crash
    from tbl_ray.stages.encode import ENCODED_SCHEMA

    out = decode_table(ENCODED_SCHEMA.empty_table())
    assert out.num_rows == 0


def test_decode_dataset_with_empty_blocks(ray_session):
    import ray.data
    from tbl_ray.stages.encode import decode_dataset, encode_dataset

    t = generate_batch(0, 200, seed=5)
    ds = ray.data.from_arrow(t).repartition(4)
    enc = encode_dataset(ds, batch_size=50, concurrency=2)
    # filter drops entire encoded blocks -> decoder sees empty batches
    import pyarrow.compute as _pc

    def drop_some(b):
        keep = _pc.greater(b.column("num_rows"), 1 << 30)  # drop everything
        return b.filter(keep)

    emptied = enc.map_batches(drop_some, batch_format="pyarrow")
    assert decode_dataset(emptied).count() == 0


def test_decode_table_projection_pushdown():
    import pytest

    from tbl_ray.stages.encode import ColumnEncoder, decode_table
    from tbl_ray.webtable import generate_batch

    t = generate_batch(0, 500, seed=7)
    enc = ColumnEncoder()(t)
    proj = decode_table(enc, columns=["text", "url"])
    assert proj.column_names == ["text", "url"]  # requested order, not stored
    assert proj.column("url").combine_chunks().equals(
        t.column("url").combine_chunks()
    )
    assert proj.column("text").combine_chunks().equals(
        t.column("text").combine_chunks()
    )
    with pytest.raises(KeyError):
        decode_table(enc, columns=["nope"])
    with pytest.raises(ValueError):
        decode_table(enc, columns=[])


def test_decode_dataset_projection(ray_session):
    import ray.data

    from tbl_ray.stages.encode import decode_dataset, encode_dataset
    from tbl_ray.webtable import generate_batch

    t = generate_batch(0, 400, seed=11)
    enc = encode_dataset(ray.data.from_arrow(t), batch_size=100)
    back = decode_dataset(enc, columns=["lang", "warc_ts"]).to_pandas()
    assert list(back.columns) == ["lang", "warc_ts"]
    assert sorted(back["lang"]) == sorted(t.column("lang").to_pylist())


def test_chunk_split_rows_conserved_any_budget():
    # the internal batch splitter must conserve rows and round-trip for
    # any chunk budget, including budgets far below one row's width
    t = generate_batch(0, 1200, seed=9)
    for budget in (1, 4096, 1 << 20, 1 << 40):
        enc = ColumnEncoder(chunk_bytes=budget)(t)
        assert sum(enc.column("num_rows").to_pylist()) == t.num_rows
        back = decode_table(enc)
        for name in t.schema.names:
            assert back.column(name).combine_chunks().equals(
                t.column(name).combine_chunks()
            ), (budget, name)


def test_decode_segments_fat_chunks():
    # a legacy corpus with huge on-disk chunks must still decode in
    # byte-bounded segments (row count alone cannot bound decode memory);
    # budgets pass as explicit driver-resolved parameters (module-global
    # monkeypatching is unreliable once workers cache the by-value module)
    t = generate_batch(0, 3000, seed=13)
    # one giant chunk (~5.5 MB), as a 64 MiB-budget build would write
    enc_rows = ColumnEncoder(chunk_bytes=1 << 40)(t)
    assert enc_rows.num_rows == 1
    # segment budget far below the chunk: the wrapper must still decode
    # the whole chunk correctly (a chunk is the atomic decode unit; the
    # segmentation splits BATCHES of chunks, never one chunk)
    back_ds = decode_dataset(
        ray.data.from_arrow(enc_rows), segment_bytes=1 << 20
    )
    back = pa.Table.from_pylist(back_ds.take_all())
    assert back.num_rows == t.num_rows
    got = back.sort_by("url")
    want = t.sort_by("url")
    for name in ("url", "text", "lang"):
        assert got.column(name).combine_chunks().equals(
            want.column(name).combine_chunks().cast(got.column(name).type)
        ), name


def test_decode_segments_split_many_small_chunks():
    # many ~1 MiB chunks in one batch: the segmentation must yield
    # multiple pieces whose concatenation equals the unsegmented decode
    t = generate_batch(0, 2500, seed=17)
    enc_rows = ColumnEncoder()(t)  # several ~1 MiB chunks
    assert enc_rows.num_rows > 2
    back_ds = decode_dataset(
        ray.data.from_arrow(enc_rows), segment_bytes=1 << 20
    )
    back = pa.Table.from_pylist(back_ds.take_all())
    assert back.num_rows == t.num_rows
    got = back.sort_by("url")
    want = t.sort_by("url")
    assert got.column("text").combine_chunks().equals(
        want.column("text").combine_chunks().cast(got.column("text").type)
    )
