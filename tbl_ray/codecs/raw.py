"""``raw`` codec — lossless Arrow IPC passthrough.

The universal fallback: any dtype (nested included), nulls included. Used
when auto-selection finds no lightweight codec that wins — e.g. high-entropy
binary columns like content hashes or already-compressed ``html`` bodies,
mirroring the reference's observation that such columns barely compress
(block_hash 0.988 ratio, /root/reference/README.md:88).
"""

from __future__ import annotations

import pyarrow as pa

from tbl_ray.codecs.base import register


class RawCodec:
    name = "raw"

    def supports(self, dtype: pa.DataType) -> bool:
        return True

    def encode(self, arr: pa.Array) -> tuple[dict, list[bytes]]:
        batch = pa.record_batch([arr], names=["v"])
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, batch.schema) as w:
            w.write_batch(batch)
        return {}, [sink.getvalue().to_pybytes()]

    def decode(
        self, params: dict, buffers: list[bytes], n: int, dtype: pa.DataType
    ) -> pa.Array:
        with pa.ipc.open_stream(pa.py_buffer(buffers[0])) as r:
            table = r.read_all()
        col = table.column(0).combine_chunks()
        if not col.type.equals(dtype):
            col = col.cast(dtype)
        return col


register(RawCodec())
