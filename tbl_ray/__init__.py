"""tbl_ray — a Ray-Data-native columnar data-processing + lightweight-compression engine.

A from-scratch reimplementation of the capabilities of paradigmxyz/tbl
(reference at /root/reference) on top of ``ray.data.Dataset`` pipelines:

- parquet multi-file datasets (gather / scan / footer summaries / merge)
- tbl's 14-transform chain with its fixed operator ordering
  (reference: crates/tbl-cli/src/transform.rs:5-24)
- output sinks (parquet / csv / json, atomic tmp+rename writes)
- a per-column lightweight-compression engine (dict, RLE, bit-pack,
  frame-of-reference, FSST, raw) with codec auto-selection, partitioning
  with skew handling, and a checkpoint manifest for exact resume.

Everything is expressed Ray-Data-first: ``read_parquet`` -> ``map_batches``
over zero-copy Arrow batches -> ``write_parquet``; actor pools for stateful
stages (column encoders); ``groupby``/``sort`` only where semantics demand
a shuffle.
"""

# Ray workers do not necessarily have this repo on sys.path (the driver may
# ray.init() from any cwd). Registering the package for pickle-by-value makes
# every tbl_ray callable shipped to workers self-contained — no PYTHONPATH /
# runtime_env coupling.
try:  # pragma: no cover - depends on cloudpickle version
    import sys as _sys

    import ray.cloudpickle as _rcp

    _rcp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; workers sharing cwd still work
    pass

from tbl_ray.dtypes import parse_dtype, parse_literal
from tbl_ray.filters import parse_filter
from tbl_ray.pipeline import Pipeline, register_op
from tbl_ray.transforms import TransformSpec, apply_transforms

__version__ = "0.1.0"

__all__ = [
    "parse_dtype",
    "parse_literal",
    "parse_filter",
    "Pipeline",
    "register_op",
    "TransformSpec",
    "apply_transforms",
]
