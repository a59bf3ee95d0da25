"""Flagship webtext curation pipeline — the 100 TB training-data flow as
one composed, streaming job:

    read -> normalize -> quality/language filter -> exact dedup
         -> MinHash near-dedup -> (optional) eval decontamination
         -> deterministic sample -> columnar-encoded output (resumable)

Every stage is the scale-correct operator built elsewhere in this repo:
vectorized batch maps fuse where stateless, the dedups shuffle sketches
only, the sample needs no shuffle at all, and the final encode job writes
partitioned, manifest-tracked parquet that resumes exactly. The returned
report carries per-stage row counts so a 100 TB run's funnel is auditable.
"""

from __future__ import annotations

import base64
import dataclasses
import glob
import json
import os
import shutil
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from tbl_ray.functions.dedup import decontaminate, exact_dedup, minhash_dedup
from tbl_ray.functions.sampling import sample_uniform
from tbl_ray.functions.text import (
    langid_batch,
    normalize_text_batch,
    text_stats_batch,
)
from tbl_ray.sinks.writers import write_parquet_atomic


@dataclass
class WebtextConfig:
    text_col: str = "text"
    id_col: str = "doc_id"
    languages: list[str] = field(default_factory=lambda: ["en"])
    min_quality: float = 0.2
    normalize: bool = True
    # None skips the near-dedup stage entirely (the remaining funnel —
    # filter, exact dedup, decontaminate, sample — is then fully
    # deterministic and SQL-replayable, which the driver oracle uses)
    minhash_threshold: float | None = 0.9
    decontaminate_ngram: int = 8
    sample_n: int | None = None
    sample_seed: int = 0
    # optional scrub/reshape stages (off by default; see functions.scrub
    # and functions.chunking for semantics)
    redact_pii: bool = False
    line_dedup_min_count: int | None = None
    line_dedup_sep: str = "\n"
    pack_max_tokens: int | None = None


def _prep_batch(t: pa.Table, cfg: WebtextConfig) -> pa.Table:
    """Fused stateless prefix: normalize -> stats/quality -> langid ->
    filter. One pass per block, zero-copy Arrow."""
    import pyarrow.compute as pc

    if cfg.normalize:
        t = normalize_text_batch(t, cfg.text_col)
    t = text_stats_batch(t, cfg.text_col)
    t = langid_batch(t, cfg.text_col)
    mask = pc.greater_equal(t.column("quality"), cfg.min_quality)
    if cfg.languages:
        mask = pc.and_(
            mask, pc.is_in(t.column("lang_pred"), value_set=pa.array(cfg.languages))
        )
    return t.filter(mask)


def _cfg_key(cfg: WebtextConfig) -> str:
    """Deterministic identity of a funnel configuration — a checkpoint is
    only reusable by a rerun with the SAME cfg (a changed threshold must
    recompute). Input identity is the caller's contract: point different
    inputs at different ``checkpoint_dir``s."""
    return json.dumps(dataclasses.asdict(cfg), sort_keys=True, default=str)


def _stage_files(stage_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(stage_dir, "*.parquet")))


def _stage_boundary(compute, stage: str, ckpt_dir: str | None, cfg_key: str):
    """A funnel stage boundary with bounded memory.

    Without ``ckpt_dir``: materialize into the object store (spills under
    pressure) — correct, but at 100 TB the checkpointed form below is the
    resumable, bounded-memory choice. With ``ckpt_dir``: write the stage
    output to ``<ckpt_dir>/<stage>/`` atomically (tmp dir -> ``_DONE``
    marker -> rename, the same publish discipline as
    ``pipelines.encode_job``) and return a STREAMING parquet read of it;
    a rerun whose cfg matches the marker skips the stage's compute —
    including the eager driver-side sketch passes inside the dedups —
    entirely. ``compute`` is a thunk so a skipped stage never even builds
    its plan."""
    if ckpt_dir is None:
        return compute().materialize(), None
    stage_dir = os.path.join(ckpt_dir, stage)
    marker = os.path.join(stage_dir, "_DONE.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            meta = json.load(fh)
        if meta.get("cfg") == cfg_key:
            return _read_stage(stage_dir, meta), meta
        shutil.rmtree(stage_dir)  # cfg changed: stale checkpoint
    elif os.path.isdir(stage_dir):
        shutil.rmtree(stage_dir)  # torn rename with no marker: recompute

    tmp = stage_dir + "_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    out = compute()
    out.write_parquet(tmp)
    rows = sum(pq.read_metadata(f).num_rows for f in _stage_files(tmp))
    schema = getattr(out.schema(), "base_schema", out.schema())
    if not _stage_files(tmp) and schema is None:
        # a 0-row stage with no recoverable schema can never be read back
        shutil.rmtree(tmp)
        raise ValueError(
            f"cannot checkpoint 0-row stage {stage!r} with unknown schema "
            "(a row-filtered empty dataset loses its schema)"
        )
    meta = {
        "cfg": cfg_key,
        "rows": rows,
        "schema_b64": base64.b64encode(schema.serialize().to_pybytes()).decode()
        if schema is not None
        else None,
    }
    with open(os.path.join(tmp, "_DONE.json"), "w") as fh:
        json.dump(meta, fh)
    os.rename(tmp, stage_dir)  # atomic publish: dir exists <=> marker inside
    return _read_stage(stage_dir, meta), meta


def _read_stage(stage_dir: str, meta: dict) -> "ray.data.Dataset":
    files = _stage_files(stage_dir)
    if not files:  # 0-row stage output: rebuild the typed empty dataset
        schema = pa.ipc.read_schema(
            pa.py_buffer(base64.b64decode(meta["schema_b64"]))
        )
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.read_parquet(files)


def curate_webtext(
    ds: "ray.data.Dataset",
    *,
    cfg: WebtextConfig | None = None,
    eval_ds: "ray.data.Dataset | None" = None,
    out_path: str | None = None,
    audit_counts: bool = False,
    checkpoint_dir: str | None = None,
    eval_tag: str | None = None,
) -> tuple["ray.data.Dataset", dict]:
    """Run the curation funnel; returns (curated dataset, stage report).

    ``out_path`` (optional) additionally writes the curated table
    atomically. ``audit_counts=True`` records per-stage row counts —
    each count consumes the stream once, so keep it for small-scale
    audits and rely on the dedup/sample internals at production scale.

    ``checkpoint_dir`` (optional) swaps the object-store stage
    checkpoints for atomic parquet checkpoints under that directory: a
    killed run rerun with the same cfg resumes AFTER the last completed
    stage, and peak object-store usage stays bounded by one stage's
    working set instead of the whole filtered corpus — the production
    form at 100 TB. A changed cfg invalidates (recomputes) every stage;
    a changed *input* needs a fresh directory (documented contract).
    The returned dataset STREAMS from the checkpoint files — consume it
    before rerunning with a different cfg on the same directory.
    ``eval_tag`` names the eval-set version for the decontamination
    checkpoint key (derived from ``eval_ds.input_files()`` when omitted;
    required when the eval set is not file-backed)."""
    cfg = cfg or WebtextConfig()
    ckey = _cfg_key(cfg)
    report: dict = {}
    if checkpoint_dir:
        report["checkpoint_dir"] = checkpoint_dir
    if audit_counts:
        report["input_rows"] = ds.count()

    # checkpoint rationale: each dedup consumes its input TWICE (sketch
    # pass + filter pass); without a stage boundary the lazy upstream
    # re-executes per consumption and the prep stage would run ~4x.
    kept, _ = _stage_boundary(
        lambda: ds.map_batches(
            lambda t: _prep_batch(t, cfg),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "00_filter",
        checkpoint_dir,
        ckey,
    )
    if audit_counts:
        report["after_filter"] = kept.count()

    kept, _ = _stage_boundary(
        lambda: exact_dedup(kept, cfg.text_col, cfg.id_col),
        "01_exact_dedup",
        checkpoint_dir,
        ckey,
    )
    if audit_counts:
        report["after_exact_dedup"] = kept.count()

    if cfg.minhash_threshold is not None:
        kept, _ = _stage_boundary(
            lambda: minhash_dedup(
                kept, cfg.text_col, cfg.id_col, threshold=cfg.minhash_threshold
            ),
            "02_minhash_dedup",
            checkpoint_dir,
            ckey,
        )
        if audit_counts:
            report["after_minhash_dedup"] = kept.count()

    if eval_ds is not None:
        # when a two-pass stage follows, checkpoint the decontaminated
        # corpus (the thunk defers the eval probe: a resume with a
        # complete 03 checkpoint never collects the eval hashes at all).
        # The stage key must identify the EVAL SET too — same cfg with an
        # updated eval suite must recompute, or contaminated docs leak.
        if checkpoint_dir and cfg.line_dedup_min_count is not None:
            etag = eval_tag
            if etag is None:
                try:
                    files = eval_ds.input_files()
                except Exception:
                    files = None
                if not files:
                    raise ValueError(
                        "checkpointing decontamination needs an identifiable"
                        " eval set: pass eval_tag=... when eval_ds is not"
                        " file-backed"
                    )
                # identifies the eval SOURCE files; a changed derivation
                # over the same files needs an explicit eval_tag
                etag = json.dumps(sorted(files))
            prev = kept
            kept, _ = _stage_boundary(
                lambda: decontaminate(
                    prev, eval_ds,
                    text_col=cfg.text_col, n=cfg.decontaminate_ngram,
                ),
                "03_decontaminate",
                checkpoint_dir,
                ckey + "|eval=" + etag,
            )
        else:
            kept = decontaminate(
                kept, eval_ds, text_col=cfg.text_col, n=cfg.decontaminate_ngram
            )
        if audit_counts:
            report["after_decontaminate"] = kept.count()

    if cfg.line_dedup_min_count is not None:
        from ray.data.dataset import MaterializedDataset

        from tbl_ray.functions.scrub import line_dedup

        # two-pass operator: checkpoint first unless the stream is already
        # materialized or file-backed (decontaminate above would otherwise
        # re-run its full n-gram probe once per pass)
        if not checkpoint_dir and not isinstance(kept, MaterializedDataset):
            kept = kept.materialize()
        kept = line_dedup(
            kept, cfg.text_col, sep=cfg.line_dedup_sep,
            min_count=cfg.line_dedup_min_count,
        )

    if cfg.redact_pii:
        from tbl_ray.functions.scrub import redact_pii as _redact

        kept = _redact(kept, cfg.text_col)

    if cfg.sample_n is not None:
        kept = sample_uniform(
            kept, cfg.sample_n, id_col=cfg.id_col, seed=cfg.sample_seed
        )
        if audit_counts:
            report["after_sample"] = kept.count()

    if cfg.pack_max_tokens is not None:
        from tbl_ray.functions.chunking import pack_sequences

        kept = pack_sequences(
            kept, text_col=cfg.text_col, id_col=cfg.id_col,
            max_tokens=cfg.pack_max_tokens,
        )
        if audit_counts:
            report["after_pack"] = kept.count()

    if out_path:
        write_parquet_atomic(kept, out_path)
        report["out_path"] = out_path
        report["out_bytes"] = os.path.getsize(out_path)
    return kept, report
