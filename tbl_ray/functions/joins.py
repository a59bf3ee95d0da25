"""Broadcast hash join — the only join shape that belongs in a 100 TB
streaming pipeline without an explicit co-partitioning step.

The reference has no joins (SURVEY.md §2.4); training pipelines still need
dimension enrichment (url -> domain metadata, lang -> config, shard ->
provenance). The small side is bounded by definition: it collects
driver-side once, ships via ``ray.put``, and every batch joins against it
with Arrow's hash join — the big side streams, nothing shuffles.

For big-big joins, co-partition both sides with
``tbl_ray.stages.partition.partition_by_hash`` and join partition-wise;
that path is deliberately explicit (an implicit all-to-all at this scale
should never hide inside an operator).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

_JOIN_TYPES = {"inner", "left outer"}


def broadcast_join(
    ds: "ray.data.Dataset",
    small: pa.Table,
    on: str | list[str],
    *,
    join_type: str = "inner",
) -> "ray.data.Dataset":
    """Join a streaming Dataset against a small in-memory table.

    ``join_type``: ``inner`` or ``left outer`` (the big side is always the
    left/probe side). Key columns must exist on both sides; the small
    side's non-key columns append to the output."""
    if join_type not in _JOIN_TYPES:
        raise ValueError(f"join_type must be one of {sorted(_JOIN_TYPES)}")
    keys = [on] if isinstance(on, str) else list(on)
    for kcol in keys:
        if kcol not in small.schema.names:
            raise ValueError(f"key column {kcol!r} missing from small side")
    small_ref = ray.put(small.combine_chunks())

    def probe(t: pa.Table) -> pa.Table:
        s = ray.get(small_ref)
        return t.join(s, keys=keys, join_type=join_type)

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_semi_join(
    ds: "ray.data.Dataset",
    small: pa.Table,
    on: str | list[str],
    *,
    anti: bool = False,
) -> "ray.data.Dataset":
    """Keep (semi) or drop (anti) big-side rows whose key appears in the
    small side — the filter form of the broadcast join."""
    keys = [on] if isinstance(on, str) else list(on)
    small_ref = ray.put(small.select(keys).combine_chunks())

    def probe(t: pa.Table) -> pa.Table:
        s = ray.get(small_ref)
        jt = "left anti" if anti else "left semi"
        return t.join(s, keys=keys, join_type=jt)

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
