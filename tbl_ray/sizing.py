"""Cost-based plan selection helpers.

Ray Data's distributed groupby/sort machinery has a fixed cost (key
sampling, range partitioning, an all-to-all exchange) that dwarfs the
useful work when the data is small — exactly like a SQL engine choosing a
broadcast join over a shuffle join from table statistics. The helpers
here give operators a *free* input-size estimate so they can swap a
distributed exchange for a single local resolve when — and only when —
the input is provably small:

- a ``MaterializedDataset`` knows its exact object-store footprint;
- a lazy dataset whose plan still exposes its input files is bounded by
  the sum of their on-disk sizes (plan metadata — never executes);
- anything else returns ``None`` and callers MUST take the scale-safe
  distributed path.

The switch point is ``LOCAL_SKETCH_BYTES`` (default 128 MiB, override
``TBL_RAY_LOCAL_SKETCH_BYTES``; ``0`` disables local paths entirely).
Both plans are semantically identical by construction — the tests run
each operator through both.
"""

from __future__ import annotations

import os


def local_sketch_bytes() -> int:
    """Read the threshold at call time so tests/users can flip the env
    var without reimporting."""
    return int(os.environ.get("TBL_RAY_LOCAL_SKETCH_BYTES", str(128 << 20)))


def estimate_input_bytes(ds) -> int | None:
    """Best-effort byte estimate of ``ds`` WITHOUT executing its plan.

    Returns ``None`` when the size cannot be known cheaply (e.g. a lazy
    map over a non-file source) — callers must treat ``None`` as "assume
    huge"."""
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(ds, MaterializedDataset):
            return ds.size_bytes()
    except Exception:  # pragma: no cover - defensive against API drift
        pass
    try:
        files = ds.input_files()
    except Exception:
        files = None
    if files:
        total = 0
        for f in files:
            p = f[len("file://"):] if f.startswith("file://") else f
            if not os.path.exists(p):
                return None  # remote scheme — unknown here, assume huge
            total += os.path.getsize(p)
        return total
    return _plan_source_bytes(ds)


# row-wise logical operators a size estimate may see through. A map CAN
# grow the data (container decode, line/chunk exploders), so walked
# estimates carry _WALK_AMPLIFICATION margin: the gate stays safe for
# up to that expansion factor, and anything bigger should not sit
# un-materialized upstream of a driver collect anyway. Joins, unions,
# groupbys, sorts, unknown ops block the walk — caller assumes huge.
_SIZE_TRANSPARENT_OPS = frozenset(
    {"MapBatches", "MapRows", "Filter", "Project", "Limit", "StreamingSplit"}
)
_WALK_AMPLIFICATION = 8


def _plan_source_bytes(ds) -> int | None:
    """Walk a lazy plan through row-wise operators to its single Read and
    return the datasource's own size estimate.

    Ray's ``input_files()`` goes blank as soon as a ``map_batches`` sits
    on top of the read, which forced every *filtered* input onto the
    distributed plan however tiny its source. The logical plan still
    knows the source; ``Datasource.estimate_inmemory_data_size`` is the
    public sizing API (the estimate is in-memory, i.e. LARGER than the
    on-disk number the files path returns — conservative for every
    caller). Best-effort: any surprise (API drift, multi-input op,
    unknown operator) returns None = assume huge."""
    try:
        op = ds._logical_plan.dag
        for _ in range(32):  # depth cap — no real chain is this deep
            deps = op.input_dependencies
            if not deps:
                break
            if type(op).__name__ not in _SIZE_TRANSPARENT_OPS:
                return None
            if len(deps) != 1:
                return None  # union/zip/join — no single source
            op = deps[0]
        else:
            return None
        if type(op).__name__ != "Read":
            return None
        est = op._datasource.estimate_inmemory_data_size()
        # margin for maps that EXPAND data (container decode, exploders):
        # the gate must stay conservative for up to 8x expansion
        return int(est) * _WALK_AMPLIFICATION if est is not None else None
    except Exception:  # noqa: BLE001 - private-plan introspection
        return None


def collect_local(ds) -> "object | None":
    """Pull a (small, size-gated by the caller) dataset into one local
    pyarrow Table; ``None`` when empty. Callers must only use this on
    data they have bounded — a sketch/partials stream derived from a
    :func:`fits_local` input."""
    import pyarrow as pa

    batches = [
        b
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if not batches:
        return None
    return pa.concat_tables(batches).combine_chunks()


def fold_partials_local(
    ds,
    partials,
    keys,
    aggs,
    out_names,
    amplification: float = 1.0,
):
    """Merge a (key..., partial...) dataset with one local Arrow
    ``group_by`` when the sizing gate allows; ``None`` means the caller
    must run its distributed plan (big/unknown input, or empty partials).

    ``aggs`` is the Arrow aggregate spec ``[(src_col, func), ...]``;
    output columns are ``keys + out_names`` — pyarrow emits group keys
    FIRST, an ordering every caller of this helper relies on (pinned by
    tests)."""
    import pyarrow  # noqa: F401 - explicit dependency of the rename below

    key_list = [keys] if isinstance(keys, str) else list(keys)
    t = collect_local(partials) if fits_local(ds, amplification) else None
    if t is None:
        return None
    from tbl_ray.stages.exchange import safe_group_by

    mt = safe_group_by(t, key_list, list(aggs))
    return mt.rename_columns(key_list + list(out_names))


def fits_local(ds, amplification: float = 1.0) -> bool:
    """True when ``ds`` is provably small enough that a sketch over it
    can be resolved in a single local task instead of a distributed
    exchange.

    ``amplification`` divides the budget for operators whose collected
    sketch is LARGER than the input it derives from — e.g. a banded
    MinHash sketch carries ~(bands x (n_hashes + 3) x 8) bytes per row,
    which can be 10-20x a short compressed document; gating such a
    collect on raw input bytes alone would let a 128 MiB parquet pull a
    multi-GiB sketch onto the driver."""
    budget = local_sketch_bytes() / max(amplification, 1.0)
    if budget <= 0:
        return False
    est = estimate_input_bytes(ds)
    return est is not None and est <= budget
