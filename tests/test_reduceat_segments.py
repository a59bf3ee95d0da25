"""Regression tests for the reduceat-monotonicity bug (round-2 ADVICE, high).

Zeroing the start index of empty rows before ``ufunc.reduceat`` made the
indices non-monotonic; reduceat treats ``indices[i] >= indices[i+1]`` as a
single-element slice, so the row *preceding* an empty row was hashed from
only its first byte. Every per-row hash/signature must be content-pure:
identical no matter which neighbors share the batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tbl_ray.codecs.base import segment_reduceat
from tbl_ray.functions.dedup import (
    _fingerprint128,
    minhash_signatures,
    simhash_batch,
)
from tbl_ray.functions.sketches import _value_hashes
from tbl_ray.functions.text import fingerprint_batch
from tbl_ray.stages.multimodal import _payload_stats

# rows with empties in every awkward position: leading, mid, trailing runs
TRICKY = [
    "",
    "the quick brown fox jumps over the lazy dog",
    "",
    "",
    "pack my box with five dozen liquor jugs",
    "xyzzy",
    "",
]


def _arr(rows, typ=pa.string()):
    return pa.array(rows, type=typ)


def test_segment_reduceat_matches_per_row_loop():
    rng = np.random.default_rng(3)
    lens = rng.integers(0, 9, size=50)
    lens[[0, 7, 8, 49]] = 0  # leading / consecutive / trailing empties
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    vals = rng.integers(0, 2**63, size=int(offsets[-1]), dtype=np.uint64)
    got = segment_reduceat(np.bitwise_xor, vals, offsets, np.uint64(0))
    want = np.array(
        [
            np.bitwise_xor.reduce(vals[offsets[i] : offsets[i + 1]])
            if lens[i]
            else np.uint64(0)
            for i in range(len(lens))
        ],
        dtype=np.uint64,
    )
    assert np.array_equal(got, want)


def test_segment_reduceat_minimum_identity():
    U = np.uint64(0xFFFFFFFFFFFFFFFF)
    offsets = np.array([0, 2, 2, 3], dtype=np.int64)
    vals = np.array([5, 9, 7], dtype=np.uint64)
    got = segment_reduceat(np.minimum, vals, offsets, U)
    assert np.array_equal(got, np.array([5, U, 7], dtype=np.uint64))


@pytest.mark.parametrize(
    "fn",
    [
        lambda a: _fingerprint128(a)[0],
        lambda a: _fingerprint128(a)[1],
        lambda a: minhash_signatures(a, n_hashes=8),
        simhash_batch,
        _value_hashes,
    ],
)
def test_row_hash_is_batch_independent(fn):
    whole = np.asarray(fn(_arr(TRICKY)))
    for i, row in enumerate(TRICKY):
        alone = np.asarray(fn(_arr([row])))
        assert np.array_equal(whole[i], alone[0]), f"row {i} ({row!r}) batch-dependent"


def test_distinct_docs_before_empties_do_not_collide():
    # the exact ADVICE reproduction: two different docs each followed by an
    # empty row must not collide in the 128-bit fingerprint
    h1, h2 = _fingerprint128(_arr(["alpha doc", "", "beta doc", ""]))
    assert (h1[0], h2[0]) != (h1[2], h2[2])


def test_equal_docs_in_different_batches_still_collide():
    a1, a2 = _fingerprint128(_arr(["same text", "", "other"]))
    b1, b2 = _fingerprint128(_arr(["noise", "same text"]))
    assert (a1[0], a2[0]) == (b1[1], b2[1])


def test_text_fingerprint_batch_independent():
    t = pa.table({"text": TRICKY})
    whole = np.asarray(fingerprint_batch(t).column("fingerprint"))
    for i, row in enumerate(TRICKY):
        alone = np.asarray(
            fingerprint_batch(pa.table({"text": [row]})).column("fingerprint")
        )
        assert whole[i] == alone[0]


def test_payload_stats_batch_independent():
    payloads = [b"", b"\x01\x02\x03", b"", b"\xff" * 10, b""]
    whole_cs, whole_len = _payload_stats(_arr(payloads, pa.binary()))
    for i, p in enumerate(payloads):
        cs, ln = _payload_stats(_arr([p], pa.binary()))
        assert whole_cs[i] == cs[0] and whole_len[i] == ln[0]


def test_minhash_empty_rows_masked():
    sig = minhash_signatures(_arr(TRICKY), n_hashes=8)
    U = np.uint64(0xFFFFFFFFFFFFFFFF)
    for i, row in enumerate(TRICKY):
        if row == "":
            assert (sig[i] == U).all()
        else:
            # rows >= shingle width must have real minima
            if len(row) >= 8:
                assert (sig[i] != U).all()
