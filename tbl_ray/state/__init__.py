"""Cross-run state: checkpoint manifests and the persistent
fingerprint store for incremental dedup.

The manifest implementations live with the encode job
(tbl_ray/pipelines/encode_job.py) and are re-exported here as the
stable state-management surface; the fingerprint store is native to
this package (state/fingerprints.py).
"""

from tbl_ray.pipelines.encode_job import (
    MANIFEST,
    SUCCESS,
    PartitionSpec,
    load_manifest,
    plan_partitions,
)
from tbl_ray.state.fingerprints import (
    FingerprintStore,
    dedup_against_store,
    store_hits,
)

__all__ = [
    "MANIFEST",
    "SUCCESS",
    "PartitionSpec",
    "FingerprintStore",
    "dedup_against_store",
    "load_manifest",
    "plan_partitions",
    "store_hits",
]
