"""`ray job submit` entry point for the partitioned encode job.

On a real cluster (the north-star deployment: fixed-size N / 4N node
clusters), drive the engine with:

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python jobs/encode_job.py \
           --input /data/webtable --output /data/encoded \
           --effort balanced

The job script owns the Ray session (connects to the cluster it was
submitted to), runs the resumable partitioned encode
(:func:`tbl_ray.pipelines.encode_job.run_encode_job` — footer-only
planning, per-partition lineage manifest, atomic writes, exact resume),
prints the report as one JSON line, and exits non-zero on failure so the
job status reflects it. Re-submitting after any failure resumes: finished
partitions verify against the manifest and are skipped.

In this sandbox the same script runs standalone (`python
jobs/encode_job.py ...`) against a local Ray.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# `ray job submit --working-dir .` puts the repo root on sys.path; a
# standalone invocation from elsewhere needs it added explicitly
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="encode-job")
    ap.add_argument("--input", required=True, nargs="+",
                    help="input parquet files/dirs")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--effort", default=None,
                    choices=["ratio", "balanced", "speed"])
    ap.add_argument("--codec", action="append", default=[],
                    metavar="COL=CODEC", help="force a codec per column")
    ap.add_argument("--batch-rows", type=int, default=65536)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--verify", action="store_true",
                    help="deep sha256 audit after encoding")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():  # ray job submit initialises the session
        ray.init(address="auto" if _on_cluster() else "local",
                 include_dashboard=False)

    from tbl_ray.pipelines.encode_job import run_encode_job, verify_job
    from tbl_ray.sources.inputs import gather_paths

    paths = gather_paths(args.input)
    if not paths:
        print(json.dumps({"error": "no input files"}), flush=True)
        return 1
    codecs = dict(c.split("=", 1) for c in args.codec) or None
    report = run_encode_job(
        paths,
        args.output,
        resume=not args.no_resume,
        codecs=codecs,
        effort=args.effort,
        batch_rows=args.batch_rows,
    )
    if args.verify:
        v = verify_job(args.output)
        report["verify"] = {
            "verified": v["verified"],
            "missing": len(v["missing"]),
            "corrupt": len(v["corrupt"]),
        }
        if v["missing"] or v["corrupt"]:
            print(json.dumps(report), flush=True)
            return 1
    print(json.dumps(report), flush=True)
    return 0


def _on_cluster() -> bool:
    return bool(os.environ.get("RAY_ADDRESS") not in (None, "", "local"))


if __name__ == "__main__":
    sys.exit(main())
