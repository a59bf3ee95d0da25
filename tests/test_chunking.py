"""Fixed-size chunking (zero-copy offsets rebuild) + BPE-style token count."""

import numpy as np
import pyarrow as pa
import ray.data

from tbl_ray.functions.chunking import chunk_fixed, chunk_fixed_batch
from tbl_ray.functions.text import token_count_bpe_batch


def test_chunk_hand_case():
    t = pa.table({"doc_id": [0, 1, 2], "text": ["abcdefghij", "xy", ""]})
    out = chunk_fixed_batch(t, size=4)
    assert out.to_pylist() == [
        {"doc_id": 0, "chunk_id": 0, "text": "abcd"},
        {"doc_id": 0, "chunk_id": 1, "text": "efgh"},
        {"doc_id": 0, "chunk_id": 2, "text": "ij"},
        {"doc_id": 1, "chunk_id": 0, "text": "xy"},
        {"doc_id": 2, "chunk_id": 0, "text": ""},
    ]


def test_chunk_utf8_codepoints_not_bytes():
    # é is 2 bytes; chunking must split on characters like SQL substr
    t = pa.table({"doc_id": [0], "text": ["café!é"]})
    out = chunk_fixed_batch(t, size=4)
    assert out.column("text").to_pylist() == ["café", "!é"]


def test_chunk_reassembles_exactly():
    rng = np.random.default_rng(5)
    texts = [
        "".join(chr(97 + int(c)) for c in rng.integers(0, 26, int(n)))
        for n in rng.integers(0, 200, 50)
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = chunk_fixed_batch(t, size=7)
    got = {}
    for r in out.to_pylist():
        got[r["doc_id"]] = got.get(r["doc_id"], "") + r["text"]
    assert [got[i] for i in range(len(texts))] == texts


def test_chunk_null_and_empty_batch():
    t = pa.table({"doc_id": [0], "text": pa.array([None], pa.string())})
    out = chunk_fixed_batch(t, size=4)
    assert out.to_pylist() == [{"doc_id": 0, "chunk_id": 0, "text": ""}]
    empty = chunk_fixed_batch(t.slice(0, 0), size=4)
    assert empty.num_rows == 0
    assert empty.column_names == ["doc_id", "chunk_id", "text"]


def test_chunk_dataset_roundtrip(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    total_chars = sum(
        len(r["text"]) for r in ds.select_columns(["text"]).take_all()
    )
    chunks = chunk_fixed(ds, size=64).take_all()
    assert sum(len(r["text"]) for r in chunks) == total_chars
    assert all(len(r["text"]) <= 64 for r in chunks)


def test_token_count_bpe_hand_case():
    t = pa.table({"text": ["Hello world's 123 ok!", "", None]})
    out = token_count_bpe_batch(t)
    # Hello | world | 's | ' 123' | ' ok' | '!'  -> 6
    assert out.column("n_bpe_tokens").to_pylist() == [6, 0, None]


# -- sequence packing -----------------------------------------------------


def test_pack_hand_case():
    from tbl_ray.functions.chunking import pack_sequences_batch

    t = pa.table(
        {"doc_id": [10, 11, 12, 13],
         "text": ["a b c", "d e", "f g h i j k l m", "one"]}
    )
    out = pack_sequences_batch(t, max_tokens=6, sep=" | ")
    rows = out.to_pylist()
    assert rows[0] == {"seq_id": 10, "text": "a b c | d e", "n_docs": 2, "n_tokens": 5}
    assert rows[1]["seq_id"] == 12 and rows[1]["n_docs"] == 1  # oversize: alone
    assert rows[2] == {"seq_id": 13, "text": "one", "n_docs": 1, "n_tokens": 1}


def test_pack_invariants(sf_dir):
    from tbl_ray.functions.chunking import pack_sequences

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    n_docs = ds.count()
    packs = pack_sequences(ds, max_tokens=200).take_all()
    assert sum(r["n_docs"] for r in packs) == n_docs  # every doc exactly once
    # budget respected except single-doc over-budget packs
    assert all(r["n_tokens"] <= 200 or r["n_docs"] == 1 for r in packs)
    assert len(packs) < n_docs  # actually packs multiple docs together


def test_pack_empty_and_null():
    from tbl_ray.functions.chunking import pack_sequences_batch

    t = pa.table({"doc_id": [0], "text": pa.array([None], pa.string())})
    assert pack_sequences_batch(t, max_tokens=4).to_pylist() == [
        {"seq_id": 0, "text": "", "n_docs": 1, "n_tokens": 0}
    ]
    empty = pack_sequences_batch(t.slice(0, 0))
    assert empty.num_rows == 0
    assert empty.column_names == ["seq_id", "text", "n_docs", "n_tokens"]
