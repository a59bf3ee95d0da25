"""Encode-job output directories as first-class transform inputs.

An encode job's output (``pipelines/encode_job.py``: ``*.encoded.parquet``
partitions + ``manifest.jsonl``) is a real table a user will want to run
the normal transform surface over — select / filter / sort / sinks —
without first decoding the whole corpus to plain parquet. This source
makes ``tbl <encoded_dir> --filter ... --select ...`` work directly and
push BOTH prune levers into the container:

- zone-map partition pruning (``pipelines/zonemap.py``): partitions
  whose manifest min/max/null stats prove no row can match the filter
  conjunction are never read at all;
- projection pushdown (``stages/encode.py:decode_table(columns=)``):
  only the columns the transform chain touches are parsed and decoded.

Exact filter masks still run in ``apply_transforms`` downstream —
pruning here is an I/O optimization, never a semantic change (the same
contract as ``read_for_spec``'s parquet pushdown).

Without this source, gathering an encoded directory would feed the RAW
encoded rows (payload blobs) into the transform chain — a footgun this
module also closes by giving the CLI a way to detect the directory kind.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from tbl_ray.pipelines.encode_job import MANIFEST


def is_encoded_dir(path: str) -> bool:
    """True when ``path`` is an encode-job output directory."""
    return os.path.isdir(path) and os.path.exists(os.path.join(path, MANIFEST))


def encoded_schema_names(out_dir: str) -> list[str]:
    """Decoded column names, in stored order, from the first non-empty
    partition's ``columns`` list — a single-column footer read, no
    payload decode."""
    files = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".encoded.parquet")
    )
    for p in files:
        t = pq.read_table(p, columns=["columns"])
        if t.num_rows:
            return list(t.column("columns")[0].as_py())
    raise ValueError(f"no non-empty encoded partitions under {out_dir!r}")


def read_encoded_for_spec(out_dir: str, spec) -> "object":
    """Decoded Dataset of ``out_dir`` planned FROM the transform spec:
    zone-map partition pruning from the spec's filters, projection
    pushdown from the columns the chain touches."""
    from tbl_ray.pipelines.zonemap import decode_filtered
    from tbl_ray.sources.parquet import spec_projection

    from tbl_ray.filters import parse_filter

    names = encoded_schema_names(out_dir)
    # same plan-time select validation as the parquet path
    # (read_for_spec): a typo'd --select would otherwise surface as a raw
    # KeyError deep inside a decode worker after paying decode cost
    created = {name for name, _, _ in spec.parsed_with_columns()}
    unknown = [
        c for c in spec.select if c not in set(names) and c not in created
    ]
    if unknown:
        raise KeyError(
            f"unknown column(s) in select: {unknown}; available: {names}"
        )
    # only filters over STORED columns can prune; a filter on a
    # --with-columns-created column runs downstream only (same rule as
    # filters_to_expression on the parquet path)
    filters = [
        f for f in (spec.filter or []) if parse_filter(f).column in set(names)
    ]
    columns = spec_projection(spec, names)
    # decode_filtered applies the exact masks of the pushed filters too —
    # harmless double apply (apply_transforms re-runs them), and it lets
    # the all-pruned case keep a correct schema
    return decode_filtered(out_dir, filters, columns=columns)
