"""Per-column lightweight-compression engine (the north-rule extension).

Seven codecs over numpy views of Arrow buffers — dictionary, run-length,
bit-pack, frame-of-reference, delta(+zigzag), FSST, raw — with per-column-chunk codec
auto-selection from sampled cardinality / run-length / entropy statistics.
This extends the reference's per-column byte accounting
(crates/tbl-core/src/parquet/parquet_summary.rs:74-87,133-149 and the
`tbl schema` per-column table, crates/tbl-cli/src/cli/subcommands/schema.rs:227-290)
from *measuring* compression to *performing* it.

Every codec implements ``encode(pa.Array) -> EncodedChunk`` and
``decode(EncodedChunk) -> pa.Array`` with a bit-identical round-trip
guarantee (nulls preserved via a separate validity bitmap). Encoded chunks
serialize to a single binary payload so an encoded dataset is itself an
Arrow/parquet table of ``(column, codec, num_rows, payload)`` rows — the
unit that rides through Ray Data pipelines and checkpoint manifests.
"""

from tbl_ray.codecs.base import (
    CODECS,
    CodecError,
    EncodedChunk,
    decode_chunk,
    encode_array,
)

# importing the codec modules registers them
from tbl_ray.codecs import raw as _raw  # noqa: F401
from tbl_ray.codecs import numeric as _numeric  # noqa: F401
from tbl_ray.codecs import dictionary as _dictionary  # noqa: F401
from tbl_ray.codecs import fsst as _fsst  # noqa: F401
from tbl_ray.codecs.select import (
    choose_codec,
    column_stats,
    decide_codec,
    encode_auto,
)

__all__ = [
    "CODECS",
    "CodecError",
    "EncodedChunk",
    "encode_array",
    "decode_chunk",
    "choose_codec",
    "decide_codec",
    "column_stats",
    "encode_auto",
]
