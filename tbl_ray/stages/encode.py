"""Streaming encode/decode stages — the codec engine as Ray Data operators.

Layout decision: ``encode_dataset`` maps every input batch to **one
self-contained encoded row** carrying all column payloads
(``columns: list<string>, codecs: list<string>, payloads: list<binary>``).
Because a row is a complete chunk, ``decode_dataset`` is a pure
``map_batches`` — no shuffle, no group reassembly, and a chunk is also the
natural unit of checkpoint/resume for the partitioned job
(:mod:`tbl_ray.pipelines.encode_job`).

The encoder is an **actor-pool stage** (stateful: reusable scratch and
per-chunk FSST training live in the actor; ``map_batches(ColumnEncoder,
concurrency=N)``), mirroring SURVEY.md §2.3/§7.2.

Scale notes: chunk memory is bounded by ``TARGET_CHUNK_BYTES`` — the
encoder slices oversized batches itself, so callers don't tune
``batch_size`` per row width; encoded rows compress in the container, so
the downstream ``write_parquet`` streams freely.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data

from tbl_ray.codecs import EncodedChunk, decode_chunk, encode_array, encode_auto
from tbl_ray.codecs.fsst import parse_symtab

# Cap on uncompressed bytes per encoded chunk; oversized input batches are
# sliced into sub-chunks of this budget before encoding. ~1 MiB (not tens
# of MB) for two measured reasons on the 8.8 GB web payload (32 CPUs,
# quiet host, 2026-08-20): (1) the container's zstd window (~1 MiB at the
# balanced level) then spans MANY consecutive chunk payloads, so
# cross-document boilerplate compresses — on-disk bytes dropped 13% with
# payload bytes identical; (2) the stats -> codec -> container passes
# stay cache-resident instead of streaming ~29 MB through DRAM three
# times per batch — encode wall dropped 26% at 32 workers and the 8->32
# scaling ratio rose 0.72 -> ~0.76 because the saved traffic is the
# shared-bandwidth term that throttles wide legs. Decode throughput
# measured unchanged; 512 KiB measured slower at both widths. Narrow
# tables are unaffected (the row clamp never exceeds the caller's
# batch size).
TARGET_CHUNK_BYTES = int(os.environ.get("TBL_RAY_CHUNK_BYTES", str(1 << 20)))

# Decoded-bytes budget per decode_table call inside decode_dataset —
# bounds worker memory independently of how large the chunks on disk are.
_DECODE_SEGMENT_BYTES = 128 << 20


def _default_pool() -> tuple[int, int]:
    """Autoscaling actor-pool bounds that always leave CPUs for upstream
    read tasks — a fixed pool equal to the CPU count deadlocks the
    streaming executor (actors pin every CPU, reads never schedule)."""
    import ray

    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:  # noqa: BLE001 - not initialised yet
        total = 4
    # floor > 1 pre-starts a few actors in parallel (demand-driven scale-up
    # from 1 serializes the first minutes of a big encode); ceiling leaves
    # ~1/4 of CPUs for the read/write stages — a total-1 ceiling starves
    # the parquet read and the encode actors idle-wait on input (measured:
    # 12.1s -> 9.2s at 8 CPUs on the 0.55 GB web table)
    cap = max(1, (total * 3) // 4)
    return (min(2, cap), cap)

ENCODED_SCHEMA = pa.schema(
    [
        pa.field("chunk_id", pa.string()),
        pa.field("num_rows", pa.int64()),
        pa.field("input_bytes", pa.int64()),
        pa.field("encoded_bytes", pa.int64()),
        pa.field("columns", pa.list_(pa.string())),
        pa.field("codecs", pa.list_(pa.string())),
        pa.field("payloads", pa.list_(pa.large_binary())),
    ]
)


class ColumnEncoder:
    """Actor-pool encode stage: one encoded row per input batch.

    ``codecs`` maps column name -> codec name; unlisted columns use
    auto-selection (:func:`tbl_ray.codecs.encode_auto`).
    """

    def __init__(
        self,
        codecs: dict[str, str] | None = None,
        effort: str | None = None,
        decisions: dict[str, str] | None = None,
        fsst_symbols: dict[str, list] | None = None,
        chunk_bytes: int | None = None,
    ):
        self.codecs = codecs or {}
        self.effort = effort
        # chunk budget must be DRIVER-resolved and shipped (workers on a
        # real cluster never see driver-set env vars — the _pair_budget /
        # _bucket_cap pitfall), and chunking changes output bytes, so two
        # attempts of one partition under differing worker env would
        # violate the sha-identical re-encode invariant. None = the
        # module global, correct only when constructed driver-side.
        self.chunk_bytes = TARGET_CHUNK_BYTES if chunk_bytes is None else chunk_bytes
        # per-column FSST symbol tables, trained on the first chunk and
        # reused for this actor's lifetime (chunks of one partition share a
        # distribution; the table is still stored in every chunk payload).
        # Callers may seed it with driver-planned tables (the partitioned
        # job ships plan_fsst_symbols output) — training costs ~60
        # ms/column, so the job pays it once, not once per partition, and
        # partition bytes stay deterministic across workers.
        self._fsst_symbols: dict[str, list] = (
            fsst_symbols if fsst_symbols is not None else {}
        )
        # sticky per-column auto-selection (one stats/probe pass per actor);
        # callers may pass a longer-lived dict to share decisions across
        # encoder instances in one worker process (the partitioned job)
        self._decisions: dict[str, str] = decisions if decisions is not None else {}

    def encode_table(self, table: pa.Table) -> pa.Table:
        names, codec_names, payloads = [], [], []
        input_bytes = 0
        encoded_bytes = 0
        for name in table.schema.names:
            col = table.column(name).combine_chunks()
            forced = self.codecs.get(name)
            cached = self._fsst_symbols.get(name)
            if forced:
                kw = {"symbols": cached} if (forced == "fsst" and cached) else None
                chunk = encode_array(col, forced, name=name, codec_kwargs=kw)
            else:
                chunk = encode_auto(
                    col,
                    name=name,
                    fsst_symbols=cached,
                    effort=self.effort,
                    decision_cache=self._decisions,
                )
            if chunk.codec == "fsst" and name not in self._fsst_symbols:
                self._fsst_symbols[name] = parse_symtab(
                    chunk.buffers[0], chunk.params["n_syms"]
                )
            payload = chunk.to_payload()
            names.append(name)
            codec_names.append(chunk.codec)
            payloads.append(payload)
            input_bytes += col.nbytes
            encoded_bytes += len(payload)
        # deterministic content fingerprint (NOT uuid): partition output
        # bytes must be a pure function of (codec plan, input) so a
        # re-encode of the same partition — another attempt, another
        # worker, a crashed run's straggler — produces the identical
        # file; sampled payload bytes keep the hash cheap on big chunks
        h = hashlib.sha256(str(table.num_rows).encode())
        for nm, cd, p in zip(names, codec_names, payloads):
            h.update(nm.encode())
            h.update(cd.encode())
            h.update(str(len(p)).encode())
            h.update(p[:128])
            h.update(p[-128:])
        return pa.Table.from_pydict(
            {
                "chunk_id": [h.hexdigest()[:32]],
                "num_rows": [table.num_rows],
                "input_bytes": [input_bytes],
                "encoded_bytes": [encoded_bytes],
                "columns": [names],
                "codecs": [codec_names],
                "payloads": [payloads],
            },
            schema=ENCODED_SCHEMA,
        )

    def __call__(self, table: pa.Table) -> pa.Table:
        if table.num_rows == 0:
            return ENCODED_SCHEMA.empty_table()
        # slice oversized batches to the chunk byte budget (zero-copy
        # slices; see TARGET_CHUNK_BYTES for why small chunks are both
        # faster and smaller on wide text/binary rows). Floor of 1, not
        # hundreds: Common-Crawl-style rows can be wider than the whole
        # budget (multi-MB html), and a row-count floor would silently
        # multiply chunk memory past it — one giant row per chunk is the
        # correct degenerate case.
        rows = table.num_rows
        row_bytes = max(1, table.nbytes // rows)
        step = max(1, self.chunk_bytes // row_bytes)
        # 1.5x tolerance: callers that already clamp batches to the budget
        # (the partitioned job's footer-average row clamp) land slightly
        # over or under it from per-batch width variance — re-splitting
        # those would shave off tiny runt chunks that cost ratio for no
        # memory benefit. Genuinely skewed batches (a multi-MB row inside
        # a narrow-average partition) still exceed the tolerance and split.
        if rows <= step + step // 2:
            return self.encode_table(table)
        return pa.concat_tables(
            self.encode_table(table.slice(off, step))
            for off in range(0, rows, step)
        )


class ChunkDecoder:
    """Inverse stage: encoded rows -> original tables (pure map, no shuffle)."""

    def __call__(self, table: pa.Table) -> pa.Table:
        return decode_table(table)


def decode_table(table: pa.Table, columns: "list[str] | None" = None) -> pa.Table:
    """Decode a batch of encoded rows back into (concatenated) original rows.

    ``columns`` is projection pushdown INTO the container: only the named
    columns' payloads are parsed and decoded — the others are never even
    copied out of the Arrow batch (the parallel ``columns`` list names
    each payload, so skipping is a name check, not a parse). Output
    column order follows ``columns``. Unknown names raise KeyError, as a
    plain select would."""
    if columns is not None and not columns:
        raise ValueError("decode_table: columns must be non-empty when given")
    pieces: list[pa.Table] = []
    payload_lists = table.column("payloads").combine_chunks()
    name_lists = (
        table.column("columns").combine_chunks() if columns is not None else None
    )
    want = set(columns) if columns is not None else None
    for i in range(table.num_rows):
        arrays = []
        fields = []
        names = name_lists[i].as_py() if want is not None else None
        for j, payload_scalar in enumerate(payload_lists[i].values):
            if want is not None and names[j] not in want:
                continue
            chunk = EncodedChunk.from_payload(payload_scalar.as_py())
            arrays.append(decode_chunk(chunk))
            fields.append(chunk.field)
        piece = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
        pieces.append(piece.select(columns) if columns is not None else piece)
    if not pieces:
        # an empty encoded block (e.g. downstream of a filter) cannot name
        # its decoded schema; Ray's schema unification drops empty
        # zero-column blocks, so pass one through instead of failing
        return pa.table({})
    return pa.concat_tables(pieces)


def encode_dataset(
    ds: "ray.data.Dataset",
    *,
    codecs: dict[str, str] | None = None,
    effort: str | None = None,
    decisions: dict[str, str] | None = None,
    batch_size: int | None = None,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Encode a Dataset column-chunk-wise -> Dataset of encoded rows.

    Pass ``decisions`` (column -> codec, e.g. from
    :func:`tbl_ray.pipelines.encode_job.plan_codec_decisions`) to skip the
    per-actor stats/probe pass — otherwise every pool actor pays it once
    on its first chunk.

    ``batch_size=None`` (the default) encodes each upstream block as-is:
    the encoder slices oversized batches to ``TARGET_CHUNK_BYTES``
    internally, so batch size no longer bounds chunk memory, and
    whole-block batches let Ray fuse a task-based read straight into the
    stateless encode (measured 1.81 -> 2.60 GB/s on the 8.8 GB web
    table, committed bench figure: the fused plan never round-trips raw
    blocks through the object store — pair it with ``read_parquet(...,
    override_num_blocks=len(paths))``, since the reader's default
    block-splitting inserts an un-fusable SplitBlocks step).

    Execution mode: when the plan is complete (every column decided or
    forced) and FSST-free, the encoder holds no state worth amortizing —
    it runs as elastic TASKS, skipping actor-pool spin-up (the pool's
    demand-driven scale-up serializes the first seconds of a short job).
    Otherwise it runs as an actor pool so per-actor FSST symbol tables and
    probe results are reused across chunks."""
    forced = codecs or {}
    planned = {**(decisions or {}), **forced}
    stateless = False
    if decisions is not None and "fsst" not in planned.values():
        try:
            stateless = set(ds.schema().names) <= set(planned)
        except Exception:  # noqa: BLE001 - schema unavailable pre-execution
            stateless = False
    if stateless:
        return ds.map_batches(
            ColumnEncoder(codecs, effort=effort, decisions=dict(planned)),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    return ds.map_batches(
        ColumnEncoder,
        fn_constructor_kwargs={
            "codecs": codecs, "effort": effort, "decisions": decisions,
            # actors construct in workers: resolve the env-tunable budget
            # HERE (driver) so worker env can't skew it
            "chunk_bytes": TARGET_CHUNK_BYTES,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency or _default_pool(),
    )


def decode_dataset(
    ds: "ray.data.Dataset",
    *,
    columns: "list[str] | None" = None,
    concurrency: int | None = None,
    batch_size: int | None = None,
    segment_bytes: int | None = None,
) -> "ray.data.Dataset":
    """Decode an encoded Dataset back to original rows (order = stream order).

    ``columns`` pushes projection into the container (see
    :func:`decode_table`): unrequested columns' payloads are skipped
    entirely — at scale, decoding 2 of 20 columns costs ~2/20ths.

    Decoding is stateless, so this runs as elastic TASKS (no actor-pool
    spin-up cost) unless a concurrency bound is requested."""
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    cols = list(columns) if columns is not None else None
    # resolved on the DRIVER and captured by the closure: worker-side
    # module state (env, by-value module caching across a long session)
    # must not influence segmentation
    seg = _DECODE_SEGMENT_BYTES if segment_bytes is None else segment_bytes

    def fn(t: pa.Table):
        # segment by DECODED bytes (the input_bytes lineage column), not
        # by row count: a ~1 MiB-chunk corpus decodes ~128 chunks per
        # piece, while a legacy 64 MiB-chunk corpus still yields after
        # 2 — batch row count alone cannot bound decode memory. Yielding
        # pieces keeps the streaming executor's backpressure in play.
        sizes = t.column("input_bytes").to_pylist()
        start, acc = 0, 0
        for i, s in enumerate(sizes):
            if i > start and acc + (s or 0) > seg:
                yield decode_table(t.slice(start, i - start), columns=cols)
                start, acc = i, 0
            acc += s or 0
        if start < t.num_rows:
            yield decode_table(t.slice(start), columns=cols)

    # batch_size=None (default) = whole upstream blocks: Ray bounds block
    # bytes (DataContext target block size), so a task never materializes
    # more ENCODED input than one block even on a corpus written with fat
    # chunks — deriving a row count from the LOCAL chunk budget was
    # measured ~11% faster on this engine's own output but could coalesce
    # 128 x 64 MiB legacy chunks (~8 GiB) into one batch. Callers that
    # KNOW their corpus (decode_job_output reads the manifest + a footer)
    # pass an informed batch_size to reclaim the throughput.
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(
        fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        **kwargs,
    )
