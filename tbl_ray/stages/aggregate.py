"""Aggregation stages — value_counts with per-batch pre-aggregation.

``--value-counts COL`` in the reference is
``group_by(col).agg(col.count().alias("count")).sort("count", desc)``
(crates/tbl-cli/src/transform.rs:609-623). ``count`` counts NON-NULL values,
so a null group reports 0 — we preserve that.

Scale design: a bare ``ds.groupby(col).count()`` shuffles every row. We
pre-aggregate inside ``map_batches`` (one (value, partial_count) row per
distinct value per block), so the all-to-all exchange only moves the tiny
partials table; the final ``groupby().sum()`` is proportional to the number
of distinct values, not the number of rows.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


class _PartialCounts:
    def __init__(self, column: str):
        self.column = column

    def __call__(self, table: pa.Table) -> pa.Table:
        col = self.column
        # pyarrow count aggregation defaults to counting valid (non-null)
        # values, matching polars' col.count() in the reference.
        part = table.select([col]).group_by(col).aggregate([(col, "count")])
        return part.rename_columns([col, "__partial_count__"])


def value_counts(ds: "ray.data.Dataset", column: str) -> "ray.data.Dataset":
    """Distributed value_counts: partials -> small shuffle -> sort desc."""
    partials = ds.map_batches(
        _PartialCounts(column), batch_format="pyarrow", zero_copy_batch=True
    )
    counts = partials.groupby(column).aggregate(
        Sum("__partial_count__", alias_name="count")
    )
    return counts.sort("count", descending=True)
