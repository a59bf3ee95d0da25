"""Composable pipeline API — the user-extension surface (SURVEY.md §2.10).

The reference's extension story is its Rust library API plus an
interactive polars escape hatch; the idiomatic Python equivalent here is a
named-op registry and a fluent ``Pipeline``:

- a **batch op** is ``Callable[[pa.Table, **kwargs], pa.Table]`` registered
  with :func:`register_op` — users add their own next to the built-ins;
- a **dataset op** is ``Callable[[ray.data.Dataset, **kwargs], Dataset]``
  (anything that must see the whole stream: dedup, sampling, topk);
- ``Pipeline`` chains steps by name. Consecutive BATCH ops fuse into ONE
  ``map_batches`` call (one pass over each block, zero-copy Arrow) —
  the same fusion the CLI transform chain gets — while dataset ops keep
  their own (possibly shuffling) stages.

    Pipeline().step("filter", exprs=["lang=en"]).step("token_count")\
              .step("sample_uniform", n=1000)(ds)
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import ray.data

BATCH_OPS: dict[str, Callable] = {}
DATASET_OPS: dict[str, Callable] = {}


def register_op(name: str, *, kind: str = "batch"):
    """Decorator: register a batch (`pa.Table -> pa.Table`) or dataset
    (`Dataset -> Dataset`) op under ``name``."""
    if kind not in ("batch", "dataset"):
        raise ValueError("kind must be 'batch' or 'dataset'")

    def deco(fn: Callable) -> Callable:
        (BATCH_OPS if kind == "batch" else DATASET_OPS)[name] = fn
        return fn

    return deco


class _FusedBatchRun:
    """Picklable composition of consecutive batch steps (one map_batches)."""

    def __init__(self, steps: list[tuple[str, dict]]):
        self.steps = steps

    def __call__(self, t: pa.Table) -> pa.Table:
        for name, kwargs in self.steps:
            t = BATCH_OPS[name](t, **kwargs)
        return t


class Pipeline:
    """Fluent chain of registered ops; apply with ``pipeline(ds)``."""

    def __init__(self, steps: list[tuple[str, dict]] | None = None):
        self._steps: list[tuple[str, dict]] = list(steps or [])
        for name, _ in self._steps:
            self._check(name)

    @staticmethod
    def _check(name: str) -> None:
        if name not in BATCH_OPS and name not in DATASET_OPS:
            known = sorted([*BATCH_OPS, *DATASET_OPS])
            raise KeyError(f"unknown op {name!r}; registered: {known}")

    def step(self, name: str, **kwargs) -> "Pipeline":
        self._check(name)
        return Pipeline([*self._steps, (name, kwargs)])

    def __call__(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        run: list[tuple[str, dict]] = []

        def flush(d):
            nonlocal run
            if run:
                d = d.map_batches(
                    _FusedBatchRun(run),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                run = []
            return d

        for name, kwargs in self._steps:
            if name in BATCH_OPS:
                run.append((name, kwargs))
            else:
                ds = flush(ds)
                ds = DATASET_OPS[name](ds, **kwargs)
        return flush(ds)


# ---------------------------------------------------------------------------
# built-in ops
# ---------------------------------------------------------------------------


def _register_builtins() -> None:
    import pyarrow.compute as pc

    from tbl_ray.filters import combined_mask, parse_filter
    from tbl_ray.functions.dedup import decontaminate, exact_dedup, minhash_dedup
    from tbl_ray.functions.joins import broadcast_join, broadcast_semi_join
    from tbl_ray.functions.sampling import sample_stratified, sample_uniform
    from tbl_ray.functions.scrub import (
        line_dedup,
        redact_batch,
        redact_pii,
        repetition_stats_batch,
    )
    from tbl_ray.functions.text import (
        fingerprint_batch,
        langid_batch,
        normalize_text_batch,
        text_stats_batch,
        token_count_batch,
    )
    from tbl_ray.stages.slicing import grouped_topn, topk as _topk
    from tbl_ray.transforms import TransformSpec, batch_transform

    @register_op("transform")
    def transform(t: pa.Table, **spec_kwargs) -> pa.Table:
        return batch_transform(t, TransformSpec(**spec_kwargs))

    @register_op("select")
    def select(t: pa.Table, columns: list[str]) -> pa.Table:
        return t.select(columns)

    @register_op("filter")
    def filter_(t: pa.Table, exprs: list[str]) -> pa.Table:
        mask = combined_mask([parse_filter(e) for e in exprs], t)
        return t if mask is None else t.filter(mask)

    register_op("token_count")(token_count_batch)
    register_op("text_stats")(text_stats_batch)
    register_op("langid")(langid_batch)
    register_op("fingerprint")(fingerprint_batch)
    register_op("normalize_text")(normalize_text_batch)
    register_op("repetition_stats")(repetition_stats_batch)
    register_op("redact")(redact_batch)

    from tbl_ray.functions.chunking import chunk_fixed_batch, pack_sequences_batch
    from tbl_ray.functions.text import token_count_bpe_batch

    register_op("token_count_bpe")(token_count_bpe_batch)
    register_op("chunk_fixed")(chunk_fixed_batch)

    from tbl_ray.functions.urls import url_parts_batch

    register_op("url_parts")(url_parts_batch)
    register_op("pack_sequences")(pack_sequences_batch)

    register_op("dedup_exact", kind="dataset")(exact_dedup)
    register_op("dedup_lines", kind="dataset")(line_dedup)
    register_op("redact_pii", kind="dataset")(redact_pii)
    register_op("dedup_minhash", kind="dataset")(minhash_dedup)
    register_op("decontaminate", kind="dataset")(decontaminate)
    register_op("sample_uniform", kind="dataset")(sample_uniform)
    register_op("sample_stratified", kind="dataset")(sample_stratified)

    from tbl_ray.functions.sampling import shuffle_deterministic, shuffle_head

    register_op("shuffle", kind="dataset")(shuffle_deterministic)
    register_op("shuffle_head", kind="dataset")(shuffle_head)
    from tbl_ray.functions.text import top_ngrams, top_vocab

    register_op("top_vocab", kind="dataset")(top_vocab)
    register_op("top_ngrams", kind="dataset")(top_ngrams)
    register_op("topk", kind="dataset")(_topk)
    register_op("grouped_topn", kind="dataset")(grouped_topn)
    register_op("join_broadcast", kind="dataset")(broadcast_join)
    register_op("join_semi", kind="dataset")(broadcast_semi_join)

    from tbl_ray.functions.joins import shuffle_join

    register_op("join_shuffle", kind="dataset")(shuffle_join)

    from tbl_ray.functions.sketches import count_distinct_by, histogram

    register_op("histogram", kind="dataset")(histogram)
    register_op("count_distinct_by", kind="dataset")(count_distinct_by)

    from tbl_ray.functions.similarity import embedding_centroids

    register_op("embedding_centroids", kind="dataset")(embedding_centroids)

    from tbl_ray.functions.sampling import sample_weighted, split_assign
    from tbl_ray.functions.winfns import rolling_range_agg, window_functions
    from tbl_ray.stages.aggregate import (
        distinct_rows,
        group_aggregate,
        grouped_quantiles,
        rollup_aggregate,
    )
    from tbl_ray.stages.reshape import explode_list, pivot_counts

    register_op("window_fns", kind="dataset")(window_functions)
    register_op("rolling_window", kind="dataset")(rolling_range_agg)
    register_op("split_assign", kind="dataset")(split_assign)
    register_op("sample_weighted", kind="dataset")(sample_weighted)
    register_op("distinct", kind="dataset")(distinct_rows)
    register_op("group_aggregate", kind="dataset")(group_aggregate)
    register_op("grouped_quantiles", kind="dataset")(grouped_quantiles)
    register_op("rollup", kind="dataset")(rollup_aggregate)
    register_op("explode", kind="dataset")(explode_list)
    register_op("pivot_counts", kind="dataset")(pivot_counts)

    @register_op("limit", kind="dataset")
    def limit(ds: "ray.data.Dataset", n: int) -> "ray.data.Dataset":
        return ds.limit(n)


_register_builtins()
