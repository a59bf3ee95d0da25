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

import os
from dataclasses import dataclass, field

import pyarrow as pa
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
    minhash_threshold: float = 0.9
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


def curate_webtext(
    ds: "ray.data.Dataset",
    *,
    cfg: WebtextConfig | None = None,
    eval_ds: "ray.data.Dataset | None" = None,
    out_path: str | None = None,
    audit_counts: bool = False,
) -> tuple["ray.data.Dataset", dict]:
    """Run the curation funnel; returns (curated dataset, stage report).

    ``out_path`` (optional) additionally writes the curated table
    atomically. ``audit_counts=True`` records per-stage row counts —
    each count consumes the stream once, so keep it for small-scale
    audits and rely on the dedup/sample internals at production scale."""
    cfg = cfg or WebtextConfig()
    report: dict = {}
    if audit_counts:
        report["input_rows"] = ds.count()

    kept = ds.map_batches(
        lambda t: _prep_batch(t, cfg), batch_format="pyarrow", zero_copy_batch=True
    )
    # checkpoint: each dedup consumes its input TWICE (sketch pass +
    # filter pass); without materializing, the lazy upstream re-executes
    # per consumption and the prep stage would run ~4x. The object store
    # holds (and spills) the filtered table instead.
    kept = kept.materialize()
    if audit_counts:
        report["after_filter"] = kept.count()

    kept = exact_dedup(kept, cfg.text_col, cfg.id_col).materialize()
    if audit_counts:
        report["after_exact_dedup"] = kept.count()

    kept = minhash_dedup(
        kept, cfg.text_col, cfg.id_col, threshold=cfg.minhash_threshold
    ).materialize()
    if audit_counts:
        report["after_minhash_dedup"] = kept.count()

    if eval_ds is not None:
        kept = decontaminate(
            kept, eval_ds, text_col=cfg.text_col, n=cfg.decontaminate_ngram
        )
        if audit_counts:
            report["after_decontaminate"] = kept.count()

    if cfg.line_dedup_min_count is not None:
        from ray.data.dataset import MaterializedDataset

        from tbl_ray.functions.scrub import line_dedup

        # two-pass operator: checkpoint first unless the stream is already
        # materialized (decontaminate above leaves it lazy and would
        # otherwise re-run its full n-gram probe once per pass)
        if not isinstance(kept, MaterializedDataset):
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
