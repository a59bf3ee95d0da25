"""Checkpoint / lineage state: the manifest format and resume verification.

The implementations live with the encode job (tbl_ray/pipelines/encode_job.py)
— this package re-exports them as the stable state-management surface.
"""

from tbl_ray.pipelines.encode_job import (
    MANIFEST,
    SUCCESS,
    PartitionSpec,
    load_manifest,
    plan_partitions,
)

__all__ = [
    "MANIFEST",
    "SUCCESS",
    "PartitionSpec",
    "load_manifest",
    "plan_partitions",
]
