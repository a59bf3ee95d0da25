"""``dict`` codec — dictionary encoding with bit-packed codes.

``pc.dictionary_encode`` builds the value dictionary (hash-based, C++
vectorized); codes are then packed at ``ceil(log2(cardinality))`` bits.
The dictionary itself rides as an Arrow IPC sub-block so any value type
works. Natural winner for low-cardinality columns (``lang``,
enum-ish strings, repeated hosts).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tbl_ray.codecs.base import is_binary_like, is_fixed_primitive, register
from tbl_ray.codecs.bitutil import bits_needed, pack, unpack


class DictCodec:
    name = "dict"

    def supports(self, dtype: pa.DataType) -> bool:
        return is_fixed_primitive(dtype) or is_binary_like(dtype)

    def encode(self, arr: pa.Array) -> tuple[dict, list[bytes]]:
        if len(arr) == 0:
            return {"card": 0, "idx_width": 0}, [b"", b""]
        denc = arr.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        dictionary = denc.dictionary
        indices = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
        card = len(dictionary)
        idx_width = bits_needed(card - 1) if card > 1 else 0
        sink = pa.BufferOutputStream()
        batch = pa.record_batch([dictionary], names=["v"])
        with pa.ipc.new_stream(sink, batch.schema) as w:
            w.write_batch(batch)
        return (
            {"card": card, "idx_width": idx_width},
            [sink.getvalue().to_pybytes(), pack(indices, idx_width)],
        )

    def decode(self, params, buffers, n, dtype):
        if params["card"] == 0:
            return pa.nulls(0, type=dtype).cast(dtype)
        with pa.ipc.open_stream(pa.py_buffer(buffers[0])) as r:
            dictionary = r.read_all().column(0).combine_chunks()
        idx = unpack(buffers[1], params["idx_width"], n).astype(np.int64)
        out = dictionary.take(pa.array(idx, type=pa.int64()))
        if not out.type.equals(dtype):
            out = out.cast(dtype)
        return out


register(DictCodec())
