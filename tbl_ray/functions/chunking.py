"""Fixed-size document chunking — the reshaping step before sequence
packing in a training-data pipeline: each document becomes
``ceil(chars / size)`` rows of at most ``size`` characters (one empty
chunk for an empty document, so every document survives).

Fully vectorized AND zero-copy: chunk boundaries within a batch tile the
flat UTF-8 buffer exactly (chunks are contiguous, non-overlapping, and in
row order), so the output string array is rebuilt from the *original data
buffer* with only a new offsets vector — no per-chunk copies, no per-row
Python. Character (codepoint) positions are mapped to byte positions with
one continuation-byte cumsum + searchsorted, which keeps the semantics
identical to SQL ``substr`` on any UTF-8 input, not just ASCII.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tbl_ray.codecs.base import binary_parts


def chunk_fixed_batch(
    t: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 512,
) -> pa.Table:
    """Reshape one batch into (id, chunk_id, text) chunk rows.

    SQL equivalent (DuckDB):
    ``unnest(range(0, greatest(ceil(length(text)/size), 1)))`` +
    ``substr(text, 1 + chunk_id*size, size)``. Nulls chunk as empty
    strings."""
    if size <= 0:
        raise ValueError(f"chunk size must be positive, got {size}")
    n = t.num_rows
    ids = t.column(id_col)
    col = t.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    offsets, data = binary_parts(col)
    offsets = np.asarray(offsets, dtype=np.int64)
    if len(data) > (1 << 31) - 1:  # pragma: no cover - blocks are ~MBs
        raise ValueError("batch too large for int32 string offsets; lower batch_size")

    # codepoints-before-byte-b prefix sum: cp0[b] = #codepoint starts in data[:b]
    is_start = (data & 0xC0) != 0x80
    cp = np.cumsum(is_start)  # cp[b] = codepoints in data[:b+1]
    cp0 = np.concatenate([[0], cp])
    row_cp = cp0[offsets[1:]] - cp0[offsets[:-1]]  # chars per row
    n_chunks = np.maximum((row_cp + size - 1) // size, 1)
    total = int(n_chunks.sum())

    doc_rep = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    seg_start = np.cumsum(n_chunks) - n_chunks
    chunk_id = np.arange(total, dtype=np.int64) - seg_start[doc_rep]
    # global codepoint index where each chunk starts -> byte position
    target_cp = cp0[offsets[:-1]][doc_rep] + chunk_id * size
    start_b = np.searchsorted(cp, target_cp + 1, side="left")
    # empty rows have no codepoint to find; clamp into the row's span
    start_b = np.minimum(start_b, offsets[1:][doc_rep])

    # chunks tile the buffer: the next chunk's start is this chunk's end,
    # and the final sentinel is the buffer length -> one new offsets
    # vector over the ORIGINAL data buffer (zero-copy rebuild)
    new_offsets = np.append(start_b, len(data)).astype(np.int32)
    chunks = pa.StringArray.from_buffers(
        total,
        pa.py_buffer(new_offsets),
        pa.py_buffer(data),
    )
    return pa.table(
        {
            id_col: ids.take(pa.array(doc_rep)),
            "chunk_id": pa.array(chunk_id),
            text_col: chunks,
        }
    )


def chunk_fixed(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 512,
) -> "ray.data.Dataset":
    """Distributed fixed-size chunking; output rows = sum of per-doc
    chunk counts (documents never straddle batches, so no state)."""

    def fn(t: pa.Table) -> pa.Table:
        return chunk_fixed_batch(t, text_col=text_col, id_col=id_col, size=size)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pack_sequences_batch(
    t: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 2048,
    sep: str = "\n\n",
) -> pa.Table:
    """Greedy sequence packing: concatenate consecutive documents (in
    batch order, ``sep``-joined) into sequences whose whitespace-token
    total stays <= ``max_tokens``; a single over-budget document gets its
    own sequence. Output: (seq_id = first doc id, text, n_docs,
    n_tokens).

    Greedy packing is inherently sequential, but the loop here runs per
    SEQUENCE, not per document — each break point is one ``searchsorted``
    into the token cumsum — and the text assembly is one vectorized
    ``binary_join`` over a rebuilt list array."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    n = t.num_rows
    out_schema = {
        "seq_id": pa.int64(), text_col: pa.string(),
        "n_docs": pa.int64(), "n_tokens": pa.int64(),
    }
    if n == 0:
        return pa.table({k: pa.array([], v) for k, v in out_schema.items()})
    col = t.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    toks = np.asarray(
        pc.count_substring_regex(col, r"\S+"), dtype=np.int64
    )
    cum = np.cumsum(toks)
    breaks = [0]
    while breaks[-1] < n:
        start = breaks[-1]
        base = cum[start - 1] if start else 0
        end = int(np.searchsorted(cum, base + max_tokens, side="right"))
        breaks.append(max(end, start + 1))  # over-budget doc: alone
    bounds = np.asarray(breaks, dtype=np.int64)
    seq_starts, seq_ends = bounds[:-1], bounds[1:]
    lists = pa.ListArray.from_arrays(
        pa.array(bounds.astype(np.int32), pa.int32()), col
    )
    joined = pc.binary_join(lists, sep)
    ids = np.asarray(t.column(id_col), dtype=np.int64)
    base_cum = np.concatenate([[0], cum])
    return pa.table(
        {
            "seq_id": pa.array(ids[seq_starts]),
            text_col: joined,
            "n_docs": pa.array(seq_ends - seq_starts),
            "n_tokens": pa.array(base_cum[seq_ends] - base_cum[seq_starts]),
        }
    )


def pack_sequences(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 2048,
    sep: str = "\n\n",
) -> "ray.data.Dataset":
    """Distributed greedy packing, per block: documents never straddle
    blocks, so each block packs independently (the standard distributed
    compromise — a global pack would serialize the whole corpus). Shuffle
    first (:func:`tbl_ray.functions.sampling.shuffle_deterministic`) if
    packing order should be seed-random rather than storage order."""

    def fn(t: pa.Table) -> pa.Table:
        return pack_sequences_batch(
            t, text_col=text_col, id_col=id_col, max_tokens=max_tokens, sep=sep
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
