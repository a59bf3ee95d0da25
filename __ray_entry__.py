"""Driver contract: entry() smoke, queries() vs oracle_sql() conformance.

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in tbl_ray) calls ray.init()/ray.shutdown().

Every operator from SURVEY.md §2 (the reference's 14-transform chain,
slices, value_counts, sorts, summaries) has a queries() entry with a DuckDB
oracle; the training-data extensions (dedup / similarity / text analysis /
codec round-trip) are included with oracles where SQL can express them and
rows-only checks where it can't. Column names in Ray results and oracle SQL
match exactly (the driver hashes values under sorted column names).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa


def _lineitem(sf_dir: str, spec=None):
    from tbl_ray.sources import read_table
    from tbl_ray.sources.parquet import read_for_spec

    path = os.path.join(sf_dir, "lineitem.parquet")
    return read_table(path) if spec is None else read_for_spec([path], spec)


def _orders(sf_dir: str, spec=None):
    from tbl_ray.sources import read_table
    from tbl_ray.sources.parquet import read_for_spec

    path = os.path.join(sf_dir, "orders.parquet")
    return read_table(path) if spec is None else read_for_spec([path], spec)


def _docs(sf_dir: str):
    from tbl_ray.sources import read_table

    return read_table(os.path.join(sf_dir, "documents.parquet"))


_ASCII_LIMIT = 160


def _ascii_docs(sf_dir: str):
    """(doc_id, text) with text reduced to printable ASCII and truncated
    to _ASCII_LIMIT chars — the byte==character regime where DuckDB's
    character-level string functions replay the engine's byte-level
    hashing exactly (both regex engines are RE2, so the sanitize step
    itself is identical). Used by the minhash_sig / simhash oracles."""
    from tbl_ray.sources import read_table

    ds = read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def prep(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as _pc

        s = _pc.fill_null(t.column("text"), "")
        s = _pc.replace_substring_regex(s, "[^ -~]", "")
        s = _pc.utf8_slice_codeunits(s, 0, _ASCII_LIMIT)
        return t.set_column(t.schema.get_field_index("text"), "text", s)

    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)


def _spec_query(table_fn, **spec_kwargs):
    def run(sf_dir: str):
        from tbl_ray import TransformSpec, apply_transforms

        spec = TransformSpec(**spec_kwargs)
        ds = table_fn(sf_dir, spec)
        return apply_transforms(ds, spec)

    return run


def entry() -> Any:
    """Flagship: auto-selected columnar encode of sf0.001 documents;
    returns the per-column encode-metrics table (the Ray analogue of
    `tbl schema`'s per-column bytes view)."""
    from tbl_ray.sources import read_table
    from tbl_ray.stages.encode import encode_dataset

    ds = read_table("/root/testdata/sf0.001/documents.parquet")
    enc = encode_dataset(ds, batch_size=65536, concurrency=2)

    def explode(t: pa.Table) -> pa.Table:
        rows = []
        for r in t.to_pylist():
            for col, codec, payload in zip(r["columns"], r["codecs"], r["payloads"]):
                rows.append(
                    {
                        "column": col,
                        "codec": codec,
                        "num_rows": r["num_rows"],
                        "encoded_bytes": len(payload),
                    }
                )
        return pa.Table.from_pylist(rows)

    return enc.map_batches(explode, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {}

    # ---- the 14-transform chain (SURVEY.md §2.2/§2.6) ----
    q["select"] = _spec_query(_lineitem, select=["l_orderkey", "l_quantity"])
    q["drop"] = _spec_query(_orders, drop=["o_orderpriority"])
    q["rename"] = _spec_query(_orders, rename=["o_orderkey=okey"])
    q["cast"] = _spec_query(
        _lineitem, cast=["l_linenumber=i64"], select=["l_orderkey", "l_linenumber"]
    )
    q["with_column"] = _spec_query(
        _orders, with_columns=["flag:i32:val=7"], select=["o_orderkey", "flag"]
    )
    q["set_column"] = _spec_query(
        _orders, set=["o_orderstatus=X"], select=["o_orderkey", "o_orderstatus"]
    )
    q["nullify"] = _spec_query(
        _orders, nullify=["o_totalprice"], select=["o_orderkey", "o_totalprice"]
    )
    q["replace"] = _spec_query(
        _lineitem,
        replace=["l_returnflag.A=Z"],
        select=["l_orderkey", "l_linenumber", "l_returnflag"],
    )
    q["filter_eq"] = _spec_query(_lineitem, filter=["l_returnflag=A"])
    q["filter_ne"] = _spec_query(_lineitem, filter=["l_linestatus!=O"])
    q["filter_gt"] = _spec_query(_lineitem, filter=["l_quantity>45.0"])
    q["filter_ge"] = _spec_query(_lineitem, filter=["l_extendedprice>=90000"])
    q["filter_le"] = _spec_query(_orders, filter=["o_totalprice<=30000"])
    q["filter_lt"] = _spec_query(_lineitem, filter=["l_quantity<3"])
    q["filter_not_null"] = _spec_query(_orders, filter=["o_custkey.is_not_null"])
    # with_columns runs BEFORE filter in the fixed chain order
    # (transform.rs:5-24), so the null column is filterable; nullify would
    # run after the filter and match nothing.
    q["filter_is_null"] = _spec_query(
        _orders,
        with_columns=["nullcol:str"],
        filter=["nullcol.is_null"],
        select=["o_orderkey", "nullcol"],
    )
    q["head"] = _spec_query(_lineitem, head=50)
    q["offset_head"] = _spec_query(_lineitem, offset=100, head=50)

    def tail(sf_dir: str):
        from tbl_ray import TransformSpec, apply_transforms
        from tbl_ray.sources import read_table

        ds = read_table(os.path.join(sf_dir, "events.parquet"))
        return apply_transforms(ds, TransformSpec(tail=50))

    q["tail"] = tail
    q["value_counts"] = _spec_query(_lineitem, value_counts="l_returnflag")
    q["value_counts_events"] = _spec_query_events_counts()

    def sort_topk(sf_dir: str):
        """sort+limit(k) plan runs the shuffle-free topk operator:
        per-block select_k (no exchange) + final sort over <= k x blocks
        rows (tbl_ray/stages/slicing.py)."""
        from tbl_ray import TransformSpec, apply_transforms
        from tbl_ray.stages.slicing import topk

        ds = apply_transforms(
            _lineitem(sf_dir),
            TransformSpec(
                select=["l_orderkey", "l_linenumber", "l_extendedprice"]
            ),
        )
        return topk(
            ds,
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            100,
            descending=[True, False, False],
        )

    q["sort_topk"] = sort_topk

    def row_count(sf_dir: str):
        from tbl_ray.sources.parquet import total_rows

        n = total_rows([os.path.join(sf_dir, "lineitem.parquet")])
        return pa.table({"n_rows": pa.array([n], pa.int64())})

    q["row_count"] = row_count

    q["chain"] = _spec_query(
        _lineitem,
        with_columns=["src:str:val=web"],
        filter=["l_quantity>25.0", "l_returnflag!=N"],
        drop=["l_shipdate"],
        select=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "src"],
        rename=["l_quantity=qty"],
    )

    # ---- training-data extensions ----
    def dedup_exact(sf_dir: str):
        from tbl_ray.functions.dedup import exact_dedup

        return exact_dedup(_docs(sf_dir), "text", "doc_id")

    q["dedup_exact"] = dedup_exact

    def dedup_exact_fast(sf_dir: str):
        from tbl_ray.functions.dedup import exact_dedup_fast

        return exact_dedup_fast(_docs(sf_dir), "text", "doc_id")

    q["dedup_exact_fast"] = dedup_exact_fast

    def token_count(sf_dir: str):
        from tbl_ray.functions.text import token_count as tc

        return tc(_docs(sf_dir)).select_columns(["doc_id", "n_tokens"])

    q["token_count"] = token_count

    def text_len(sf_dir: str):
        from tbl_ray.functions.text import text_stats

        return text_stats(_docs(sf_dir)).select_columns(["doc_id", "text_len"])

    q["text_len"] = text_len

    def langid(sf_dir: str):
        from tbl_ray.functions.text import langid as li

        return li(_docs(sf_dir)).select_columns(["doc_id", "lang_pred"])

    q["langid"] = langid

    def quality(sf_dir: str):
        from tbl_ray.functions.text import text_stats

        return text_stats(_docs(sf_dir)).select_columns(["doc_id", "quality"])

    q["quality"] = quality

    def fingerprint(sf_dir: str):
        """Content-fingerprint semantics, oracle-checked: over documents
        UNIONed with an id-shifted copy of itself (so every text has one
        exact duplicate), equal texts MUST fingerprint equal and distinct
        texts distinct (64-bit, ~1e-13 collision odds at this scale) —
        the per-doc count of same-fingerprint rows therefore equals
        ``count(*) OVER (PARTITION BY text)``, which SQL replays."""
        from tbl_ray.functions.text import fingerprint as fp
        from tbl_ray.stages.aggregate import group_aggregate

        def dup(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            idx = t.schema.get_field_index("doc_id")
            shifted = t.set_column(
                idx, "doc_id", _pc.add(t.column("doc_id"), 1_000_000)
            )
            return pa.concat_tables([t, shifted])

        both = _docs(sf_dir).map_batches(
            dup, batch_format="pyarrow", zero_copy_batch=True
        )
        fps = fp(both).select_columns(["doc_id", "fingerprint"])
        counts = group_aggregate(fps, "fingerprint", {"doc_id": ["count"]})
        from tbl_ray.functions.joins import broadcast_join
        from tbl_ray.sizing import collect_local

        ct = collect_local(counts)
        out = broadcast_join(
            fps, ct.rename_columns(["fingerprint", "n_same_fp"]), "fingerprint"
        )
        return out.select_columns(["doc_id", "n_same_fp"])

    q["fingerprint"] = fingerprint

    def dedup_minhash(sf_dir: str):
        """MinHash LSH near-dedup, driver-verifiable configuration: with
        one-hash bands (bands == n_hashes) the bucket key is a bijection
        of the signature value, so candidate recall is exact for every
        pair sharing >= 1 signature position — and pair verification is
        the deterministic agreement fraction (est >= 0.85 <=> k >= 11 of
        12). The result is an exact function of the signatures, which
        the oracle replays from first principles (same SQL signature
        core as minhash_sig, pairwise position join, min-label connected
        components)."""
        from tbl_ray.functions.dedup import minhash_dedup

        return minhash_dedup(
            _ascii_docs(sf_dir), "text", "doc_id",
            n_hashes=12, bands=12, threshold=0.85,
        )

    q["dedup_minhash"] = dedup_minhash

    def simhash_col(sf_dir: str):
        """SimHash with the SQL-replayable polynomial word hash over
        ASCII-sanitized text: the oracle replays tokenization (RE2
        ``\\s+`` split in both engines), the byte-polynomial + splitmix64
        word hash, the per-bit ±1 votes and the sign rule — so the
        64-bit simhash values themselves are value-hash-verified."""
        from tbl_ray.functions.dedup import simhash

        return simhash(
            _ascii_docs(sf_dir), word_hasher="poly"
        ).select_columns(["doc_id", "simhash"])

    q["simhash"] = simhash_col

    def minhash_sig(sf_dir: str):
        """Long-format MinHash signatures over ASCII-sanitized text —
        the value-level driver check for the MinHash kernel (the same
        ``minhash_signatures`` the LSH dedup builds on; native C and
        numpy paths are parity-tested bit-identical)."""
        import pyarrow.compute as _pc

        from tbl_ray.functions.dedup import minhash_signature_rows

        def long_enough(t: pa.Table) -> pa.Table:
            return t.filter(
                _pc.greater_equal(_pc.utf8_length(t.column("text")), 8)
            )

        ds = _ascii_docs(sf_dir).map_batches(
            long_enough, batch_format="pyarrow", zero_copy_batch=True
        )
        return minhash_signature_rows(ds, "text", "doc_id", n_hashes=12, seed=7)

    q["minhash_sig"] = minhash_sig

    def dedup_ngram(sf_dir: str):
        """Exact n-gram-Jaccard near-dedup: MinHash LSH proposes
        candidates, exact character-trigram Jaccard verifies each pair
        (precision), union-find keeps the min-id doc per group.

        High-recall candidate mode (16 bands of 2 rows -> band-miss odds
        ~1e-7/pair; candidate gate 0.5, ~5 sigma below the 0.8 exact
        threshold -> estimator-miss odds ~1e-6/pair) makes the result
        equal to a brute-force pairwise trigram-Jaccard dedup — which
        the DuckDB oracle computes from first principles — while the
        candidate count stays LSH-sized, not O(n^2) (candidate_threshold
        0.0 measured 220k candidates vs 256 on 5000 docs)."""
        from tbl_ray.functions.dedup import jaccard_dedup

        return jaccard_dedup(
            _docs(sf_dir), "text", "doc_id", n=3, threshold=0.8,
            n_hashes=32, bands=16, candidate_threshold=0.5,
        ).select_columns(["doc_id", "lang", "n_chars"])

    q["dedup_ngram"] = dedup_ngram

    def dedup_embed(sf_dir: str):
        """Embedding-cosine near-dup via random-hyperplane LSH: the
        embeddings table unioned with an id-shifted copy of itself, so
        every vector has one exact duplicate — the only pairs at
        cosine>=0.95 (max off-diagonal cosine in this table is ~0.6,
        verified), which identical sign patterns find in every LSH
        table. Oracle: each vec_id pairs with vec_id + 1000000."""
        from tbl_ray.functions.dedup import embedding_dup_pairs
        from tbl_ray.sources import read_table

        ds = read_table(os.path.join(sf_dir, "embeddings.parquet"))

        def dup(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            idx = t.schema.get_field_index("vec_id")
            shifted = t.set_column(
                idx, "vec_id", _pc.add(t.column("vec_id"), 1_000_000)
            )
            return pa.concat_tables([t, shifted])

        both = ds.map_batches(dup, batch_format="pyarrow", zero_copy_batch=True)
        pairs = embedding_dup_pairs(both, threshold=0.95)
        return pa.table(
            {
                "id_a": pa.array([p["id_a"] for p in pairs], pa.int64()),
                "id_b": pa.array([p["id_b"] for p in pairs], pa.int64()),
            }
        )

    q["dedup_embed"] = dedup_embed

    def ann_topk(sf_dir: str):
        from tbl_ray.functions.similarity import knn_brute
        from tbl_ray.sources import read_table

        ds = read_table(os.path.join(sf_dir, "embeddings.parquet"))
        first = ds.take_batch(1, batch_format="pyarrow")
        qv = np.asarray(first.column("embedding")[0].as_py(), dtype=np.float32)[None, :]
        res = knn_brute(ds, qv, k=10)
        return pa.table({"vec_id": pa.array([r["id"] for r in res[0]], pa.int64())})

    q["ann_topk"] = ann_topk

    def ann_ivf(sf_dir: str):
        """IVF ANN with every cluster probed: exercises the full IVF path
        (k-means train, cluster assignment, per-cluster scan) while the
        probe-all setting makes the answer EXACT top-k — so the brute
        cosine SQL is a true oracle. Partial probing (the approximate
        mode) is covered by ann_ivf_index + recall tests."""
        from tbl_ray.functions.similarity import knn_ivf
        from tbl_ray.sources import read_table

        ds = read_table(os.path.join(sf_dir, "embeddings.parquet"))
        first = ds.take_batch(1, batch_format="pyarrow")
        qv = np.asarray(first.column("embedding")[0].as_py(), dtype=np.float32)[None, :]
        res = knn_ivf(ds, qv, k=10, n_clusters=8, n_probe=8)
        return pa.table({"vec_id": pa.array([r["id"] for r in res[0]], pa.int64())})

    q["ann_ivf"] = ann_ivf

    def ann_ivf_index(sf_dir: str):
        """Persisted IVF index: build once into /tmp (hive-partitioned one
        dir per cluster), then answer from the clusters' parquet files.
        Probe-all makes the answer EXACT top-k — so the brute cosine SQL
        is a true oracle for the whole build -> hive write -> file-level
        read-back path (a different code path from the in-memory
        ann_ivf). Partial probing — the approximate mode, where the scan
        opens only the probed clusters' files — is covered by the recall
        tests (tests/test_functions.py) since approximation quality has
        no exact oracle."""
        import shutil
        import tempfile

        from tbl_ray.functions.similarity import build_ivf_index, knn_ivf_index
        from tbl_ray.sources import read_table

        ds = read_table(os.path.join(sf_dir, "embeddings.parquet"))
        first = ds.take_batch(1, batch_format="pyarrow")
        qv = np.asarray(first.column("embedding")[0].as_py(), dtype=np.float32)[None, :]
        idx_dir = tempfile.mkdtemp(prefix="tbl_ray_ivf_")
        try:
            build_ivf_index(ds, idx_dir, n_clusters=8, sample_rows=2000)
            res = knn_ivf_index(idx_dir, qv, k=10, n_probe=8)
        finally:
            shutil.rmtree(idx_dir, ignore_errors=True)
        return pa.table({"vec_id": pa.array([r["id"] for r in res[0]], pa.int64())})

    q["ann_ivf_index"] = ann_ivf_index

    def partition_counts(sf_dir: str):
        """Partition documents by lang (salted, budget 100 rows/file), then
        aggregate per-key row totals back from the written files — equals
        plain GROUP BY counts iff partitioning lost/duplicated nothing."""
        import collections
        import shutil
        import tempfile

        from tbl_ray.stages.partition import partition_by_key

        out = tempfile.mkdtemp(prefix="tblray_part_")
        try:
            rows = partition_by_key(
                _docs(sf_dir), "lang", out, max_rows_per_file=100
            )
            per_key: dict[str, int] = collections.defaultdict(int)
            for r in rows:
                key = os.path.basename(os.path.dirname(r["path"]))
                per_key[key.split("=", 1)[1]] += r["rows"]
            return pa.table(
                {
                    "lang": pa.array(sorted(per_key), pa.string()),
                    "rows": pa.array(
                        [per_key[k] for k in sorted(per_key)], pa.int64()
                    ),
                }
            )
        finally:
            shutil.rmtree(out, ignore_errors=True)

    q["partition_counts"] = partition_counts

    def approx_distinct_orders(sf_dir: str):
        from tbl_ray.functions.sketches import approx_distinct

        est = approx_distinct(_lineitem(sf_dir), "l_orderkey")
        return pa.table({"approx_distinct": pa.array([float(est)], pa.float64())})

    q["approx_distinct"] = approx_distinct_orders

    def group_agg(sf_dir: str):
        """Generic keyed aggregate (pre-aggregated partials, tiny keyed
        shuffle): count/min/max of quantity + sum of an int column per
        returnflag — all hash-exact aggregates (no float-summation-order
        dependence)."""
        from tbl_ray.stages.aggregate import group_aggregate

        return group_aggregate(
            _lineitem(sf_dir),
            "l_returnflag",
            {"l_quantity": ["count", "min", "max"], "l_orderkey": ["sum"]},
        )

    q["group_agg"] = group_agg

    def top_vocab_docs(sf_dir: str):
        """Corpus vocabulary: per-batch Arrow word counts -> keyed partial
        sum -> shuffle-free topk (count desc, word asc)."""
        from tbl_ray.functions.text import top_vocab

        return top_vocab(_docs(sf_dir), "text", k=50)

    q["top_vocab"] = top_vocab_docs

    def sample_uniform_docs(sf_dir: str):
        """Deterministic uniform sample: Knuth-hash keys, n smallest via
        shuffle-free topk; key formula replicated exactly in the oracle."""
        from tbl_ray.functions.sampling import sample_uniform

        return sample_uniform(_docs(sf_dir), 100, id_col="doc_id", seed=7)

    q["sample_uniform"] = sample_uniform_docs

    def sample_stratified_docs(sf_dir: str):
        """Deterministic per-lang sample (20 docs per language)."""
        from tbl_ray.functions.sampling import sample_stratified

        return sample_stratified(
            _docs(sf_dir), "lang", 20, id_col="doc_id", seed=7
        )

    q["sample_stratified"] = sample_stratified_docs

    def decontaminate_docs(sf_dir: str):
        """Benchmark decontamination: docs 0-9 act as the eval set; any
        training doc sharing an 8-word shingle with them is dropped
        (includes the eval docs themselves). Oracle-checked: the SQL side
        rebuilds word 8-grams with lead() windows and anti-joins on
        overlap — exact parity with the engine's full-window shingles."""
        from tbl_ray.functions.dedup import decontaminate

        def head_docs(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.less(t.column("doc_id"), 10))

        docs = _docs(sf_dir)
        eval_ds = _docs(sf_dir).map_batches(
            head_docs, batch_format="pyarrow", zero_copy_batch=True
        )
        return decontaminate(docs, eval_ds, n=8, threshold=1)

    q["decontaminate"] = decontaminate_docs

    def dedup_incremental(sf_dir: str):
        """Cross-run incremental dedup via the persistent fingerprint
        store (state/fingerprints.py): ingest increment 1 (doc_id <
        0.6*max) building the store, then dedup the overlapping
        increment 2 (doc_id >= 0.4*max) against it — overlap rows drop
        as store hits, only genuinely-new documents survive. The oracle
        replays the same two-increment scenario in SQL (NOT EXISTS
        against increment 1's texts)."""
        import math
        import shutil
        import tempfile

        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

        from tbl_ray.sources import read_table
        from tbl_ray.state.fingerprints import dedup_against_store

        ids = _pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        mx = _pc.max(ids.column("doc_id")).as_py()
        c1 = int(math.floor(0.6 * mx))
        c2 = int(math.floor(0.4 * mx))
        path = os.path.join(sf_dir, "documents.parquet")

        def rng(lo, hi):
            def f(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                m = pc.greater_equal(t.column("doc_id"), lo)
                if hi is not None:
                    m = pc.and_(m, pc.less(t.column("doc_id"), hi))
                return t.filter(m)

            return f

        sdir = tempfile.mkdtemp(prefix="tbl_ray_fpstore_")
        try:
            inc1 = read_table(path).map_batches(
                rng(0, c1), batch_format="pyarrow", zero_copy_batch=True
            )
            # ingest increment 1: the store update happens eagerly here
            dedup_against_store(inc1, "text", "doc_id", sdir)
            inc2 = read_table(path).map_batches(
                rng(c2, None), batch_format="pyarrow", zero_copy_batch=True
            )
            out = dedup_against_store(
                inc2, "text", "doc_id", sdir, update=False
            )

            def proj(t: pa.Table) -> pa.Table:
                return t.select(["doc_id", "lang", "n_chars"])

            from tbl_ray.sizing import collect_local

            # collect before the store tempdir is removed (lazy dataset);
            # increment 2's top id range is disjoint from increment 1, so
            # survivors always exist
            return collect_local(
                out.map_batches(
                    proj, batch_format="pyarrow", zero_copy_batch=True
                )
            )
        finally:
            shutil.rmtree(sdir, ignore_errors=True)

    q["dedup_incremental"] = dedup_incremental

    def join_broadcast(sf_dir: str):
        """Dimension enrichment: stream orders, broadcast the customer
        dim table once (ray.put), Arrow hash join per batch — no shuffle."""
        import pyarrow.parquet as pq

        from tbl_ray.functions.joins import broadcast_join

        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name"],
        ).rename_columns(["o_custkey", "c_name"])
        out = broadcast_join(_orders(sf_dir), cust, "o_custkey")
        return out.select_columns(["o_orderkey", "o_custkey", "c_name"])

    q["join_broadcast"] = join_broadcast

    def approx_quantiles_price(sf_dir: str):
        """DDSketch-style mergeable quantiles (relative error 1%): the
        shuffle moves (log-bucket, count) partials only. Rows-only check
        (approximate by construction)."""
        from tbl_ray.functions.sketches import approx_quantiles

        return approx_quantiles(
            _lineitem(sf_dir), "l_extendedprice", [0.5, 0.9, 0.99]
        )

    q["approx_quantiles"] = approx_quantiles_price

    def pipeline_e2e(sf_dir: str):
        """Composite webtext pipeline through the Pipeline API: language
        filter -> token count (fused into one map_batches) -> exact dedup
        (fingerprint plan) -> projection. Oracle: the equivalent SQL."""
        from tbl_ray.pipeline import Pipeline

        return (
            Pipeline()
            .step("filter", exprs=["lang=en"])
            .step("token_count")
            .step("dedup_exact", column="text", id_col="doc_id")
            .step("select", columns=["doc_id", "n_tokens"])
        )(_docs(sf_dir))

    q["pipeline_e2e"] = pipeline_e2e

    def join_asof(sf_dir: str):
        """As-of enrichment: each event picks the latest config version
        (per event_type) whose effective date <= its timestamp. Right side
        is a fixed literal table, identical in the SQL oracle."""
        from tbl_ray.functions.joins import broadcast_asof_join
        from tbl_ray.sources import read_table

        versions = pa.table(
            {
                "event_type": ["click", "click", "view", "purchase"],
                "ts": pa.array(
                    [
                        np.datetime64("2024-01-01T00:00:00", "us"),
                        np.datetime64("2024-01-15T00:00:00", "us"),
                        np.datetime64("2024-01-05T00:00:00", "us"),
                        np.datetime64("2024-02-01T00:00:00", "us"),
                    ],
                    pa.timestamp("us"),
                ),
                "config_ver": pa.array([1, 2, 10, 20], pa.int64()),
            }
        )
        ds = read_table(os.path.join(sf_dir, "events.parquet"))
        out = broadcast_asof_join(ds, versions, on="ts", by="event_type")
        return out.select_columns(["event_id", "event_type", "config_ver"])

    q["join_asof"] = join_asof

    def grouped_topn_docs(sf_dir: str):
        """Top-5 newest docs per language: keyed shuffle, per-group
        select_k (row_number() <= n in SQL)."""
        from tbl_ray.stages.slicing import grouped_topn

        out = grouped_topn(
            _docs(sf_dir), "lang", ["doc_id"], 5, descending=[True]
        )
        return out.select_columns(["lang", "doc_id"])

    q["grouped_topn"] = grouped_topn_docs

    def normalize(sf_dir: str):
        """Canonical text form (lower, collapse whitespace, trim) via
        Arrow kernels — the standard dedup pre-processing step."""
        from tbl_ray.functions.text import normalize_text

        return normalize_text(_docs(sf_dir)).select_columns(["doc_id", "text"])

    q["normalize_text"] = normalize

    def repetition(sf_dir: str):
        """Gopher-style word-repetition quality metrics, one Arrow
        dictionary-encode + numpy lexsort per batch."""
        from tbl_ray.functions.scrub import repetition_stats

        return repetition_stats(_docs(sf_dir)).select_columns(
            ["doc_id", "n_words", "n_distinct_words",
             "dup_word_frac", "top_word_frac"]
        )

    q["repetition_stats"] = repetition

    def redact_terms(sf_dir: str):
        """Vectorized global regex redaction + match count (the PII-scrub
        machinery, exercised on a pattern this corpus actually contains;
        the email/IPv4/phone presets are unit-tested on synthetic PII)."""
        from tbl_ray.functions.scrub import redact

        out = redact(
            _docs(sf_dir), "text", r"\b(spark|dup)\b", "<TOPIC>", "n_redacted"
        )
        return out.select_columns(["doc_id", "text", "n_redacted"])

    q["redact"] = redact_terms

    def dedup_lines(sf_dir: str):
        """Corpus-frequency unit dedup (RefinedWeb line-dedup shape, word
        separator here — the corpus is single-line): drop units appearing
        >= 900 times corpus-wide. Shuffle moves (unit, count) partials
        only; the small frequent set broadcasts back."""
        from tbl_ray.functions.scrub import line_dedup

        out = line_dedup(_docs(sf_dir), "text", sep=" ", min_count=900)
        return out.select_columns(["doc_id", "text"])

    q["dedup_lines"] = dedup_lines

    def bpe_tokens(sf_dir: str):
        """BPE-pre-tokenizer token counts (RE2 pattern shared verbatim
        with the DuckDB oracle)."""
        from tbl_ray.functions.text import token_count_bpe

        return token_count_bpe(_docs(sf_dir)).select_columns(
            ["doc_id", "n_bpe_tokens"]
        )

    q["token_count_bpe"] = bpe_tokens

    def chunk(sf_dir: str):
        """Fixed-size sequence chunking: zero-copy offsets rebuild over
        the batch's flat UTF-8 buffer; char->byte via one cumsum +
        searchsorted."""
        from tbl_ray.functions.chunking import chunk_fixed

        return chunk_fixed(_docs(sf_dir), "text", "doc_id", size=40)

    q["chunk_fixed"] = chunk

    def shuffle_head_q(sf_dir: str):
        """Seeded deterministic shuffle, first 100 rows WITH the 0-based
        rank column — the order itself is oracle-checked (row_number in
        SQL vs the per-block top-k + collapsed-block numbering here)."""
        from tbl_ray.functions.sampling import shuffle_head

        return shuffle_head(_docs(sf_dir), 100, seed=7).select_columns(
            ["doc_id", "pos"]
        )

    q["shuffle_head"] = shuffle_head_q

    def pack(sf_dir: str):
        """Greedy sequence packing, oracle-checked: a single input block
        (packing is per-block by design, so one block makes the break
        points a pure function of doc order) lets a DuckDB recursive CTE
        replay the greedy accumulate-until-budget walk exactly.
        Multi-block packing is exercised by bench + unit tests."""
        import pyarrow.parquet as _pq
        import ray.data

        from tbl_ray.functions.chunking import pack_sequences

        t = _pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        ds = ray.data.from_arrow(t)
        return pack_sequences(ds, max_tokens=256).select_columns(
            ["seq_id", "n_docs", "n_tokens"]
        )

    q["pack_sequences"] = pack

    def bigrams(sf_dir: str):
        """Top-k corpus word bigrams: n shifted zero-copy slices of the
        flat word array joined element-wise; windows crossing a document
        boundary masked out."""
        from tbl_ray.functions.text import top_ngrams

        return top_ngrams(_docs(sf_dir), "text", n=2, k=50)

    q["top_ngrams"] = bigrams

    def join_shuffle_q(sf_dir: str):
        """Large-large co-partitioned hash join: both sides widened to a
        union schema, ONE hash shuffle on the key, per-group local
        match emission."""
        import ray.data

        from tbl_ray.functions.joins import shuffle_join
        from tbl_ray.sources import read_table

        li = read_table(os.path.join(sf_dir, "lineitem.parquet")).select_columns(
            ["l_orderkey", "l_quantity"]
        )
        orders = read_table(os.path.join(sf_dir, "orders.parquet")).select_columns(
            ["o_orderkey", "o_custkey"]
        )

        def rn(t):
            return t.rename_columns(["l_orderkey", "o_custkey"])

        right = orders.map_batches(rn, batch_format="pyarrow")
        return shuffle_join(li, right, "l_orderkey")

    q["join_shuffle"] = join_shuffle_q

    def url_parts_q(sf_dir: str):
        """URL decomposition (scheme/host/path/domain/path-depth) over a
        deterministically constructed url column — both sides build the
        same URLs, then parse with the same RE2 patterns."""
        import pyarrow.compute as pc

        from tbl_ray.functions.urls import url_parts_batch

        def build(t: pa.Table) -> pa.Table:
            url = pc.binary_join_element_wise(
                "https://",
                t.column("source").combine_chunks().cast(pa.string()),
                ".example.com/docs/",
                pc.cast(t.column("doc_id"), pa.string()),
                "",
            )
            out = pa.table({"doc_id": t.column("doc_id"), "url": url})
            return url_parts_batch(out)

        return _docs(sf_dir).map_batches(
            build, batch_format="pyarrow", zero_copy_batch=True
        )

    q["url_parts"] = url_parts_q

    def histogram_q(sf_dir: str):
        """Fixed-bin histogram over n_chars: per-block bincount partials,
        tiny keyed merge."""
        from tbl_ray.functions.sketches import histogram

        return histogram(_docs(sf_dir), "n_chars", 100.0, 600.0, 10)

    q["histogram"] = histogram_q

    def centroids_q(sf_dir: str):
        """Per-label mean embedding (long form): one (key, sum-vec,
        count) partial per key per block, keyed merge, divide once."""
        import ray.data

        from tbl_ray.functions.similarity import embedding_centroids

        ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        return embedding_centroids(ds, "label")

    q["embedding_centroids"] = centroids_q

    def count_distinct_q(sf_dir: str):
        """Exact per-key distinct counts (the precise sibling of the HLL
        approx_distinct_by): per-block distinct pairs, one keyed dedup
        exchange, pre-aggregated count fold."""
        from tbl_ray.functions.sketches import count_distinct_by

        return count_distinct_by(_docs(sf_dir), "lang", "source")

    q["count_distinct_by"] = count_distinct_q

    def curate(sf_dir: str):
        """Flagship composed funnel, oracle-checked: normalize ->
        stats/quality -> exact dedup (min-id per normalized text) ->
        deterministic uniform sample. The near-dedup stage is off
        (minhash_threshold=None) so every step is SQL-replayable; the
        sketch dedups are separately exercised by dedup_minhash /
        dedup_ngram and the full funnel by bench's curate_webtext."""
        from tbl_ray.pipelines.webtext import WebtextConfig, curate_webtext

        kept, _ = curate_webtext(
            _docs(sf_dir),
            cfg=WebtextConfig(
                languages=[], min_quality=0.0, minhash_threshold=None,
                sample_n=100,
            ),
        )
        return kept.select_columns(["doc_id", "lang", "quality"])

    q["curate_webtext"] = curate

    def approx_distinct_by_lang(sf_dir: str):
        """Per-key HLL: one (key, sketch) row per key per batch, keyed
        groupby merges sketches. Estimate is ~1.6% error so no value
        oracle; row count per key is checked."""
        from tbl_ray.functions.sketches import approx_distinct_by

        return approx_distinct_by(_docs(sf_dir), "lang", "doc_id")

    q["approx_distinct_by"] = approx_distinct_by_lang

    def window_agg(sf_dir: str):
        from tbl_ray.functions.windows import tumbling_window
        from tbl_ray.sources import read_table

        ds = read_table(os.path.join(sf_dir, "events.parquet"))
        return tumbling_window(
            ds, ts_col="ts", key_col="event_type", value_col="value",
            window="1d",
        )

    q["window_agg"] = window_agg

    def sessions(sf_dir: str):
        from tbl_ray.functions.windows import session_counts
        from tbl_ray.sources import read_table

        ds = read_table(os.path.join(sf_dir, "events.parquet"))
        return session_counts(ds, key_col="user_id", ts_col="ts", gap="30m")

    q["sessions"] = sessions

    def cast_date(sf_dir: str):
        from tbl_ray import TransformSpec, apply_transforms

        return apply_transforms(
            _lineitem(sf_dir),
            TransformSpec(
                cast=["l_shipdate=date"], select=["l_orderkey", "l_shipdate"]
            ),
        )

    q["cast_date"] = cast_date

    def image_decode(sf_dir: str):
        """Real multimodal decode, oracle-checked: BMP payloads with
        closed-form dimensions AND pixels (formula_image_table), decoded
        by the pure-numpy codec through the actor-pool stage; width,
        height, encoded byte length and the exact int64 pixel sum all
        replay analytically in SQL (generate_series over the same
        formulas) — a corrupted pixel anywhere breaks the hash."""
        import ray.data

        from tbl_ray.stages.multimodal import decode_images, formula_image_table

        ds = ray.data.from_arrow(formula_image_table(200)).repartition(4)
        out = decode_images(
            ds, strict=True, emit_sum=True, batch_size=32, concurrency=2
        )
        return out.select_columns(
            ["media_id", "width", "height", "n_bytes", "sum_px"]
        )

    q["image_decode"] = image_decode

    def audio_decode(sf_dir: str):
        """Real WAV (RIFF/PCM16) decode, oracle-checked: clips with
        closed-form integer PCM (formula_audio_table); rate, sample
        count, channels and the exact sample sum replay in SQL."""
        import ray.data

        from tbl_ray.stages.multimodal import decode_audio, formula_audio_table

        ds = ray.data.from_arrow(formula_audio_table(100)).repartition(4)
        out = decode_audio(
            ds, strict=True, emit_sum=True, batch_size=16, concurrency=2
        )
        return out.select_columns(
            ["media_id", "sample_rate", "n_samples", "channels", "sum_pcm"]
        )

    q["audio_decode"] = audio_decode

    def frame_sample(sf_dir: str):
        """Video frame sampling, oracle-checked: containers of BMP frames
        with closed-form dimensions (formula_video_table); the sampled
        frame indices (0 and 4 of 8) and each frame's decoded dimensions
        replay in SQL."""
        import ray.data

        from tbl_ray.stages.multimodal import formula_video_table, sample_frames

        ds = ray.data.from_arrow(formula_video_table(40, frames=8)).repartition(4)
        out = sample_frames(ds, n_sample=2, strict=True, batch_size=8, concurrency=2)
        return out.select_columns(["media_id", "frame_index", "width", "height"])

    q["frame_sample"] = frame_sample

    def jpeg_decode(sf_dir: str):
        """Real baseline-JPEG decode (pure-numpy ITU T.81 codec) through
        the strict actor-pool stage: formulaic RGB images are
        JPEG-encoded (4:2:0, q=90), decoded back, and each row reports
        the decoded dimensions (oracle: the generating formulas) plus a
        lossy-round-trip fidelity flag computed against the pre-encode
        pixels (oracle: TRUE — aggregate pixel-sum deviation under
        4/pixel at q=90; exact pixel equality is impossible for a lossy
        codec, and the dims come from the real decoded grid)."""
        import ray.data

        from tbl_ray.stages.jpegcodec import encode_jpeg
        from tbl_ray.stages.multimodal import (
            MEDIA_SCHEMA,
            _formula_pixels,
            decode_images,
        )

        n = 60
        rows, sums = [], []
        for i in range(n):
            w, h = 16 + (i * 29) % 48, 16 + (i * 41) % 48
            px = _formula_pixels(w, h, i)
            rows.append(encode_jpeg(px, quality=90, subsample="420"))
            sums.append(int(px.astype(np.int64).sum()))
        t = pa.table(
            {
                "media_id": pa.array(range(n), pa.int64()),
                "payload": pa.array(rows, pa.large_binary()),
                "mime": pa.array(["image/jpeg"] * n),
                "meta": pa.array(["{}"] * n),
            },
            schema=MEDIA_SCHEMA,
        )
        # pool sized to leave CPUs for upstream repartition tasks: at
        # concurrency == num_cpus the actor pool holds every slot and the
        # producer starves (observed deadlock in the 4-CPU test session)
        avail = int(ray.cluster_resources().get("CPU", 8))
        cc = max(1, min(4, avail // 2))
        out = decode_images(
            ray.data.from_arrow(t).repartition(2 * cc),
            strict=True,
            emit_sum=True,
            batch_size=8,
            concurrency=cc,
        ).take_all()
        recs = []
        for r in sorted(out, key=lambda r: r["media_id"]):
            i = r["media_id"]
            npx = int(r["width"]) * int(r["height"]) * 3
            mean_err = abs(int(r["sum_px"]) - sums[i]) / npx
            recs.append(
                {
                    "media_id": i,
                    "width": int(r["width"]),
                    "height": int(r["height"]),
                    "fidelity_ok": bool(mean_err < 4.0),
                }
            )
        return pa.Table.from_pylist(recs)

    q["jpeg_decode"] = jpeg_decode

    def jpeg_progressive(sf_dir: str):
        """Progressive (SOF2) JPEG decode: the same formulaic RGB images
        are encoded with the multi-scan progressive encoder (spectral
        selection + successive approximation, T.81 Annex G) and decoded
        through the strict actor-pool stage. Oracle: the generating
        formulas for dims, plus TRUE for `matches_baseline` — the
        progressive stream carries the SAME quantized coefficients as
        the baseline stream, so the decodes must be pixel-identical
        (checked here against a driver-side baseline decode)."""
        import ray.data

        from tbl_ray.stages.jpegcodec import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )
        from tbl_ray.stages.multimodal import (
            MEDIA_SCHEMA,
            _formula_pixels,
            decode_images,
        )

        n = 40
        rows, base_px = [], []
        for i in range(n):
            w, h = 16 + (i * 23) % 40, 16 + (i * 37) % 40
            px = _formula_pixels(w, h, i)
            rows.append(encode_jpeg_progressive(px, quality=88,
                                                subsample="420"))
            base_px.append(decode_jpeg(encode_jpeg(px, quality=88,
                                                   subsample="420")))
        t = pa.table(
            {
                "media_id": pa.array(range(n), pa.int64()),
                "payload": pa.array(rows, pa.large_binary()),
                "mime": pa.array(["image/jpeg"] * n),
                "meta": pa.array(["{}"] * n),
            },
            schema=MEDIA_SCHEMA,
        )
        avail = int(ray.cluster_resources().get("CPU", 8))
        cc = max(1, min(4, avail // 2))
        out = decode_images(
            ray.data.from_arrow(t).repartition(2 * cc),
            strict=True,
            emit_sum=True,
            batch_size=8,
            concurrency=cc,
        ).take_all()
        recs = []
        for r in sorted(out, key=lambda r: r["media_id"]):
            i = r["media_id"]
            base = base_px[i]
            # pixel-exact vs baseline (driver-side decode of the same
            # progressive payload) AND the distributed stage's dims/sum
            # agree with that decode
            prog = decode_jpeg(rows[i])
            recs.append(
                {
                    "media_id": i,
                    "width": int(r["width"]),
                    "height": int(r["height"]),
                    "matches_baseline": bool(
                        np.array_equal(prog, base)
                        and int(r["sum_px"])
                        == int(prog.astype(np.int64).sum())
                        and (int(r["width"]), int(r["height"]))
                        == (prog.shape[1], prog.shape[0])
                    ),
                }
            )
        return pa.Table.from_pylist(recs)

    q["jpeg_progressive"] = jpeg_progressive

    def url_canon_dedup(sf_dir: str):
        """URL canonicalization + exact dedup by canonical form — the
        normalize-before-dedup step of a crawl pipeline. Three messy
        variants of each logical page (case/www/default-port/trackers/
        fragment differences) are built deterministically from
        o_orderkey; canonicalization collapses them and the fingerprint
        dedup keeps the min key per canonical URL. Oracle: the same URL
        construction in SQL and the same RE2 rule chain via
        `canon_sql_expr` (both engines are RE2), then min-per-group."""
        import pyarrow.compute as pc
        import ray.data  # noqa: F401

        from tbl_ray.functions.dedup import exact_dedup
        from tbl_ray.functions.urls import url_canonicalize
        from tbl_ray.sources import read_table

        ds = read_table(os.path.join(sf_dir, "orders.parquet")).select_columns(
            ["o_orderkey"]
        )

        def build(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey")
            if isinstance(k, pa.ChunkedArray):
                k = k.combine_chunks()
            def _mod(x, n):  # pyarrow.compute has no mod kernel
                return pc.subtract(x, pc.multiply(pc.divide(x, n), n))

            m = pc.divide(k, 3)
            s = pc.cast(_mod(m, 97), pa.string())
            ms = pc.cast(m, pa.string())
            j = pc.binary_join_element_wise
            v0 = j("http://site", s, ".example.com/p/", ms, "?id=", ms, "")
            v1 = j(
                "HTTP://WWW.SITE", s, ".EXAMPLE.COM:80/p/", ms,
                "?utm_source=feed&id=", ms, "#top", "",
            )
            v2 = j(
                "http://site", s, ".example.com:80/p/", ms, "?id=", ms,
                "&utm_campaign=x&gclid=1", "",
            )
            r = _mod(k, 3)
            url = pc.if_else(
                pc.equal(r, 0), v0, pc.if_else(pc.equal(r, 1), v1, v2)
            )
            return t.append_column("url", url)

        ds = ds.map_batches(build, batch_format="pyarrow", zero_copy_batch=True)
        ds = url_canonicalize(ds)
        kept = exact_dedup(ds, "url_canon", "o_orderkey")
        return kept.select_columns(["o_orderkey", "url_canon"])

    q["url_canon_dedup"] = url_canon_dedup

    def encode_roundtrip(sf_dir: str):
        """Codec round-trip, oracle-checked: documents is encoded with
        the full per-column codec engine (dict/rle/fsst/bitpack/for
        auto-select), decoded back, and aggregated per lang — count,
        integer sums and the binary-collated min/max of the TEXT column.
        DuckDB computes the same aggregate over the raw parquet, so any
        decode corruption (a single flipped byte in any row) breaks the
        value hash. Strict bit-identity per column is additionally pinned
        by tests/test_codecs*."""
        import pyarrow.parquet as pq

        from tbl_ray.stages.encode import ColumnEncoder, decode_table

        t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
        back = decode_table(ColumnEncoder()(t))
        agg = (
            back.group_by("lang")
            .aggregate(
                [
                    ("doc_id", "count"),
                    ("doc_id", "sum"),
                    ("n_chars", "sum"),
                    ("text", "min"),
                    ("text", "max"),
                ]
            )
            .rename_columns(
                ["lang", "n", "sum_id", "sum_chars", "min_text", "max_text"]
            )
        )
        return agg.sort_by("lang")

    q["encode_roundtrip"] = encode_roundtrip

    def encode_prune(sf_dir: str):
        """Zone-map partition pruning on the encoded container: shard
        lineitem clustered by l_orderkey, encode (manifest records
        per-partition min/max/null stats), then answer a range filter
        decoding ONLY the partitions whose stats may match — the exact
        filter re-runs on decoded batches, so the result is identical to
        a full decode + filter (pruned-partition count is asserted by
        tests/test_zonemap.py; here the oracle checks exactness)."""
        import math
        import shutil
        import tempfile

        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

        from tbl_ray.pipelines.encode_job import run_encode_job
        from tbl_ray.pipelines.zonemap import decode_filtered

        src = _pq.read_table(os.path.join(sf_dir, "lineitem.parquet"))
        # cluster by the filter column (zone maps prune only clustered
        # data); (orderkey, linenumber) is unique so the sort — and every
        # shard byte — is deterministic
        src = src.sort_by([("l_orderkey", "ascending"), ("l_linenumber", "ascending")])
        base = tempfile.mkdtemp(prefix="tbl_ray_prune_")
        try:
            n, k = src.num_rows, 8
            step = (n + k - 1) // k
            paths = []
            for i in range(k):
                p = os.path.join(base, f"part-{i:02d}.parquet")
                _pq.write_table(src.slice(i * step, step), p)
                paths.append(p)
            out_dir = os.path.join(base, "encoded")
            run_encode_job(paths, out_dir)
            cut = int(math.floor(0.9 * _pc.max(src.column("l_orderkey")).as_py()))
            cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"]
            from tbl_ray.sizing import collect_local

            # collect before the tempdir is removed (the dataset is lazy);
            # cut <= max guarantees at least one surviving row
            return collect_local(
                decode_filtered(out_dir, [f"l_orderkey>={cut}"], columns=cols)
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)

    q["encode_prune"] = encode_prune

    def webtable_invariant(sf_dir: str):
        """Per-row invariant: extract_text(html) byte-identical to text
        after a full encode->decode cycle of the synthetic web table."""
        import pyarrow.compute as pc

        from tbl_ray.stages.encode import ColumnEncoder, decode_table
        from tbl_ray.webtable import extract_text, generate_batch

        t = generate_batch(0, 5000, seed=42)
        back = decode_table(ColumnEncoder()(t))
        extracted = extract_text(back.column("html").combine_chunks())
        ok = extracted.equals(back.column("text").combine_chunks())
        n_bad = int(
            pc.sum(
                pc.cast(
                    pc.not_equal(extracted, back.column("text").combine_chunks()),
                    pa.int64(),
                )
            ).as_py()
            or 0
        )
        return pa.table(
            {
                "rows": pa.array([t.num_rows], pa.int64()),
                "text_identical": pa.array([ok]),
                "mismatches": pa.array([n_bad], pa.int64()),
            }
        )

    q["webtable_invariant"] = webtable_invariant

    def window_fns(sf_dir: str):
        """SQL window functions (row_number / lag / running sum) per
        customer ordered by date: one keyed shuffle + vectorized per-group
        pass. Value floored to int64 so the running sum is exact (not
        float-order-dependent)."""
        from tbl_ray.functions.winfns import window_functions
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "orders.parquet")],
            TransformSpec(
                select=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
            ),
        )

        def floor_price(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return t.append_column(
                "price_fl",
                _pc.cast(_pc.floor(t.column("o_totalprice")), pa.int64()),
            )

        out = window_functions(
            ds.map_batches(
                floor_price, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="o_custkey",
            order_cols=["o_orderdate", "o_orderkey"],
            value_col="price_fl",
            ntile=4,
        )
        return out.select_columns(
            [
                "o_orderkey", "o_custkey", "rn", "lag_price_fl",
                "cum_price_fl", "lead_price_fl", "first_price_fl", "pr",
                "nt",
            ]
        )

    q["window_fns"] = window_fns

    def rolling_window(sf_dir: str):
        """Sliding 1-hour RANGE-frame count/sum per user: two-pointer
        searchsorted + prefix sums per key group, exact int arithmetic."""
        from tbl_ray.functions.winfns import rolling_range_agg
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "events.parquet")],
            TransformSpec(select=["event_id", "user_id", "ts", "value"]),
        )

        def floor_val(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return t.append_column(
                "value_fl", _pc.cast(_pc.floor(t.column("value")), pa.int64())
            )

        out = rolling_range_agg(
            ds.map_batches(
                floor_val, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="user_id",
            ts_col="ts",
            value_col="value_fl",
            window="1h",
        )
        return out.select_columns(["event_id", "n_w", "sum_w"])

    q["rolling_window"] = rolling_window

    def explode(sf_dir: str):
        """Unnest the embedding list column into long form (vec_id, pos,
        val) — zero-copy flatten + parent-index take per batch."""
        from tbl_ray.sources import read_table
        from tbl_ray.stages.reshape import explode_list

        ds = read_table(os.path.join(sf_dir, "embeddings.parquet"))

        def head_vecs(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return t.filter(_pc.less(t.column("vec_id"), 200))

        small = ds.map_batches(
            head_vecs, batch_format="pyarrow", zero_copy_batch=True
        )
        return explode_list(small, "embedding", id_cols=["vec_id"])

    q["explode"] = explode

    def pivot_langs(sf_dir: str):
        """Wide per-source doc counts per language — conditional-
        aggregation pivot with pre-aggregated partials."""
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.stages.reshape import pivot_counts
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "documents.parquet")],
            TransformSpec(select=["lang", "source"]),
        )
        return pivot_counts(
            ds, "lang", "source", ["src0", "src1", "src2", "src3"]
        )

    q["pivot_counts"] = pivot_langs

    def distinct_q(sf_dir: str):
        """SELECT DISTINCT via per-batch local distinct + tiny keyed
        merge."""
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.stages.aggregate import distinct_rows
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "lineitem.parquet")],
            TransformSpec(select=["l_returnflag", "l_linestatus"]),
        )
        return distinct_rows(ds, ["l_returnflag", "l_linestatus"])

    q["distinct"] = distinct_q

    def grouped_quantiles_q(sf_dir: str):
        """EXACT per-group quantiles (DuckDB quantile_cont-identical
        interpolation) — keyed shuffle + vectorized sort per group."""
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.stages.aggregate import grouped_quantiles
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "lineitem.parquet")],
            TransformSpec(select=["l_returnflag", "l_quantity"]),
        )
        return grouped_quantiles(
            ds, "l_returnflag", "l_quantity", [0.5, 0.9]
        )

    q["grouped_quantiles"] = grouped_quantiles_q

    def range_join_q(sf_dir: str):
        """Interval join: each event matched to the broadcast promo
        windows containing its timestamp (BETWEEN semantics)."""
        from tbl_ray.functions.joins import broadcast_range_join
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        promos = pa.table(
            {
                "event_type": ["click", "click", "view", "purchase"],
                "start_ts": pa.array(
                    [
                        np.datetime64("2024-01-03T00:00:00", "us"),
                        np.datetime64("2024-01-10T12:00:00", "us"),
                        np.datetime64("2024-01-05T00:00:00", "us"),
                        np.datetime64("2024-01-01T00:00:00", "us"),
                    ],
                    pa.timestamp("us"),
                ),
                "end_ts": pa.array(
                    [
                        np.datetime64("2024-01-12T00:00:00", "us"),
                        np.datetime64("2024-01-20T00:00:00", "us"),
                        np.datetime64("2024-01-25T00:00:00", "us"),
                        np.datetime64("2024-03-01T00:00:00", "us"),
                    ],
                    pa.timestamp("us"),
                ),
                "promo_id": pa.array([101, 102, 201, 301], pa.int64()),
            }
        )
        ds = read_for_spec(
            [os.path.join(sf_dir, "events.parquet")],
            TransformSpec(select=["event_id", "event_type", "ts"]),
        )
        out = broadcast_range_join(
            ds, promos, by="event_type", on="ts",
            start_col="start_ts", end_col="end_ts",
        )
        return out.select_columns(["event_id", "promo_id"])

    q["range_join"] = range_join_q

    def _urgent_keys(sf_dir: str) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority"],
        )
        return (
            t.filter(pc.equal(t.column("o_orderpriority"), "1-URGENT"))
            .select(["o_orderkey"])
            .rename_columns(["l_orderkey"])
        )

    def join_semi_q(sf_dir: str):
        """Semi join: lineitems of urgent orders (broadcast key filter,
        no shuffle)."""
        from tbl_ray.functions.joins import broadcast_semi_join
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        li = read_for_spec(
            [os.path.join(sf_dir, "lineitem.parquet")],
            TransformSpec(select=["l_orderkey", "l_linenumber"]),
        )
        return broadcast_semi_join(li, _urgent_keys(sf_dir), "l_orderkey")

    q["join_semi"] = join_semi_q

    def join_anti_q(sf_dir: str):
        """Anti join: lineitems NOT belonging to urgent orders."""
        from tbl_ray.functions.joins import broadcast_semi_join
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        li = read_for_spec(
            [os.path.join(sf_dir, "lineitem.parquet")],
            TransformSpec(select=["l_orderkey", "l_linenumber"]),
        )
        return broadcast_semi_join(
            li, _urgent_keys(sf_dir), "l_orderkey", anti=True
        )

    q["join_anti"] = join_anti_q

    def join_anti_large_q(sf_dir: str):
        """Anti join with a LARGE (non-broadcastable) right side: the
        co-bucketed shuffle anti plan — right collapses to per-block
        distinct keys, one key-hash exchange co-partitions both sides,
        Arrow left-anti per bucket. Same answer as the broadcast plan."""
        from tbl_ray.functions.joins import shuffle_anti_join
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        li = read_for_spec(
            [os.path.join(sf_dir, "lineitem.parquet")],
            TransformSpec(select=["l_orderkey", "l_linenumber"]),
        )
        ur = read_for_spec(
            [os.path.join(sf_dir, "orders.parquet")],
            TransformSpec(
                select=["o_orderkey", "o_orderpriority"],
                filter=["o_orderpriority=1-URGENT"],
            ),
        ).map_batches(
            lambda t: t.select(["o_orderkey"]).rename_columns(["l_orderkey"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return shuffle_anti_join(li, ur, "l_orderkey")

    q["join_anti_large"] = join_anti_large_q

    def q3_revenue(sf_dir: str):
        """TPC-H-Q3-shaped composite: revenue per order (exact integer
        cents), semi-joined to urgent orders, top-10 without a global
        sort. Plan quality over literal SQL shape: the aggregate runs
        BELOW the join (valid — the join is a key filter), shrinking
        lineitem to one row per order before any join work, and
        join_auto picks broadcast-vs-shuffle from table statistics."""
        from tbl_ray.functions.joins import join_auto
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.stages.aggregate import group_aggregate
        from tbl_ray.stages.slicing import topk
        from tbl_ray.transforms import TransformSpec

        li = read_for_spec(
            [os.path.join(sf_dir, "lineitem.parquet")],
            TransformSpec(
                select=["l_orderkey", "l_extendedprice", "l_discount"]
            ),
        )

        def revenue(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            cents = _pc.cast(
                _pc.floor(
                    _pc.multiply(
                        _pc.multiply(
                            t.column("l_extendedprice"),
                            _pc.subtract(
                                pa.scalar(1.0), t.column("l_discount")
                            ),
                        ),
                        pa.scalar(100.0),
                    )
                ),
                pa.int64(),
            )
            return pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "revenue_cents": cents,
                }
            )

        # the right side stays UNMAPPED so join_auto's lazy-read size
        # proof holds and it can pick the broadcast plan
        ords = read_for_spec(
            [os.path.join(sf_dir, "orders.parquet")],
            TransformSpec(
                select=["o_orderkey", "o_orderpriority"],
                filter=["o_orderpriority=1-URGENT"],
            ),
        )
        li2 = li.map_batches(
            revenue, batch_format="pyarrow", zero_copy_batch=True
        )
        agg = group_aggregate(
            li2, "l_orderkey", {"revenue_cents": ["sum"]}
        )
        agg = join_auto(
            agg, ords, "l_orderkey", right_on="o_orderkey", semi=True
        )
        return topk(
            agg,
            ["sum_revenue_cents", "l_orderkey"],
            10,
            descending=[True, False],
        )

    q["q3_revenue"] = q3_revenue

    def split_q(sf_dir: str):
        """Deterministic 90/5/5 train/val/test assignment — pure function
        of (seed, id), stable across runs/layouts; exact-integer band
        edges shared with the SQL oracle."""
        from tbl_ray.functions.sampling import split_assign
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "documents.parquet")],
            TransformSpec(select=["doc_id"]),
        )
        out = split_assign(
            ds, {"train": 0.9, "val": 0.05, "test": 0.05}, id_col="doc_id"
        )
        return out.select_columns(["doc_id", "split"])

    q["split_assign"] = split_q

    def sample_weighted_q(sf_dir: str):
        """Data-mixing downsample: per-source keep rates (100% / 50% /
        25%, unlisted sources dropped), deterministic per (seed, id)."""
        from tbl_ray.functions.sampling import sample_weighted
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "documents.parquet")],
            TransformSpec(select=["doc_id", "source"]),
        )
        out = sample_weighted(
            ds,
            "source",
            {"src0": 1.0, "src1": 0.5, "src2": 0.25},
            id_col="doc_id",
        )
        return out.select_columns(["doc_id", "source"])

    q["sample_weighted"] = sample_weighted_q

    def term_stats_q(sf_dir: str):
        """TF-IDF integer core: per-(doc, term) frequency + corpus
        document frequency — tokenize/tf local per batch, df through the
        bucket exchange, cost-based join back."""
        from tbl_ray.functions.text import term_stats
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "documents.parquet")],
            TransformSpec(select=["doc_id", "text"], filter=["doc_id<100"]),
        )
        return term_stats(ds)

    q["term_stats"] = term_stats_q

    def tfidf_q(sf_dir: str):
        """Smoothed TF-IDF scores. Oracle-checked: the integer tf/df core
        is exact; the float score compares at ULP tolerance (np.log and
        DuckDB ln agree to 1 ulp — the same class of difference the
        driver already tolerates for window_agg's distributed sums)."""
        from tbl_ray.functions.text import tfidf_score
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "documents.parquet")],
            TransformSpec(select=["doc_id", "text"], filter=["doc_id<100"]),
        )
        return tfidf_score(ds, 100)

    q["tfidf"] = tfidf_q

    def kmeans_q(sf_dir: str):
        """Distributed Lloyd k-means (iterative: centroids broadcast per
        pass, mergeable sum-vector partials back) + streaming assignment;
        returns per-cluster sizes. Rows-only (float iterative algorithm,
        not SQL-expressible)."""
        from tbl_ray.functions.similarity import kmeans_assign, kmeans_fit
        from tbl_ray.sources import read_table
        from tbl_ray.stages.aggregate import group_aggregate

        ds = read_table(os.path.join(sf_dir, "embeddings.parquet"))
        cent, history = kmeans_fit(ds, 8, iters=3)
        assigned = kmeans_assign(ds, cent)
        sizes = group_aggregate(assigned, "cluster", {"vec_id": ["count"]})
        return sizes

    q["kmeans"] = kmeans_q

    def rollup_q(sf_dir: str):
        """GROUP BY ROLLUP(lang, source) with the SQL GROUPING bitmask —
        per-prefix pre-aggregated passes, lazily unioned."""
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.stages.aggregate import rollup_aggregate
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "documents.parquet")],
            TransformSpec(select=["doc_id", "lang", "source"]),
        )
        return rollup_aggregate(ds, ["lang", "source"], {"doc_id": ["count"]})

    q["rollup"] = rollup_q

    def jsonl_roundtrip(sf_dir: str):
        """JSONL ingest: write a projection with the engine's JSON sink,
        read it back with the distributed JSONL source — values must
        match the parquet original (the oracle reads the parquet)."""
        import tempfile

        from tbl_ray.sinks.writers import write_json
        from tbl_ray.sources import read_jsonl
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "documents.parquet")],
            TransformSpec(select=["doc_id", "lang", "n_chars"]),
        ).map_batches(
            lambda t: t.select(["doc_id", "lang", "n_chars"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        path = os.path.join(
            tempfile.mkdtemp(prefix="tbl_ray_jsonl_"), "docs.jsonl"
        )
        write_json(ds, path, lines=True)
        return read_jsonl(path)

    q["jsonl_roundtrip"] = jsonl_roundtrip

    def csv_roundtrip(sf_dir: str):
        """CSV ingest: engine CSV sink -> distributed CSV source with a
        pinned schema; values must match the parquet original."""
        import tempfile

        from tbl_ray.sinks.writers import write_csv
        from tbl_ray.sources import read_csv
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "documents.parquet")],
            TransformSpec(select=["doc_id", "lang", "n_chars"]),
        ).map_batches(
            lambda t: t.select(["doc_id", "lang", "n_chars"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        path = os.path.join(
            tempfile.mkdtemp(prefix="tbl_ray_csv_"), "docs.csv"
        )
        write_csv(ds, path)
        schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("lang", pa.string()),
                ("n_chars", pa.int64()),
            ]
        )
        return read_csv(path, schema=schema)

    q["csv_roundtrip"] = csv_roundtrip

    def union_by_name_q(sf_dir: str):
        """Schema-evolving shard concat (UNION ALL BY NAME): two
        projections with different column sets align to the name union,
        missing columns null-filled."""
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.stages.reshape import union_by_name
        from tbl_ray.transforms import TransformSpec

        a = read_for_spec(
            [os.path.join(sf_dir, "documents.parquet")],
            TransformSpec(select=["doc_id", "lang"]),
        ).map_batches(
            lambda t: t.select(["doc_id", "lang"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        b = read_for_spec(
            [os.path.join(sf_dir, "documents.parquet")],
            TransformSpec(select=["doc_id", "n_chars"]),
        ).map_batches(
            lambda t: t.select(["doc_id", "n_chars"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return union_by_name([a, b])

    q["union_by_name"] = union_by_name_q

    def string_agg_q(sf_dir: str):
        """Ordered per-key string concatenation — one bucket exchange,
        per-bucket lexsort + single vectorized binary_join over
        segment-rebuilt lists."""
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.stages.aggregate import string_agg
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "orders.parquet")],
            TransformSpec(
                select=["o_orderkey", "o_orderpriority", "o_orderstatus"]
            ),
        )
        return string_agg(
            ds, "o_orderpriority", "o_orderstatus", ["o_orderkey"]
        )

    q["string_agg"] = string_agg_q

    def regex_extract_q(sf_dir: str):
        """Generic group-1 regex extraction (RE2 parity with DuckDB
        regexp_extract: no match '', null null)."""
        from tbl_ray.functions.text import regex_extract
        from tbl_ray.sources.parquet import read_for_spec
        from tbl_ray.transforms import TransformSpec

        ds = read_for_spec(
            [os.path.join(sf_dir, "documents.parquet")],
            TransformSpec(select=["doc_id", "text"]),
        )
        out = regex_extract(ds, "text", r"([0-9]+)", "first_num")
        return out.select_columns(["doc_id", "first_num"])

    q["regex_extract"] = regex_extract_q

    return _rotate_window(q)


# The driver's correctness harness checks the FIRST 50 queries in
# insertion order. Round 2 verified the first 50 registrations (all
# green, CORRECTNESS_r02.json); round 3 rotates the never-driver-checked
# wave-2/3 operators into the window, keeping a handful of
# previously-green high-traffic anchors for regression coverage. The
# registration code above stays in build order (closures read top to
# bottom); only dict insertion order changes.
_WINDOW_FIRST = [
    # round-5 rotation: the 12 rows last green in r03 cycle back in
    # (sort/slicing, the join family, windows/sessions, date casting,
    # text-format round-trips, encoded-dir pruning, incremental dedup) so
    # every contract row is green <= 2 rounds old on current code. The
    # join_shuffle row also re-exercises this round's skew-salt hash
    # change through the driver.
    "sort_topk", "chain", "join_shuffle", "join_semi", "join_asof",
    "window_agg", "sessions", "cast_date", "csv_roundtrip",
    "jsonl_roundtrip", "encode_prune", "dedup_incremental",
    # r04-green anchors kept in-window (high-traffic paths + the
    # operators this round touched: tiled LSH buckets, distributed
    # jaccard verify, JPEG SOF guard)
    "window_fns", "q3_revenue", "rolling_window", "pivot_counts",
    "quality", "langid", "fingerprint", "approx_distinct",
    "approx_quantiles", "encode_roundtrip",
    "audio_decode", "image_decode",
    "pack_sequences", "curate_webtext", "kmeans", "dedup_ngram",
    # cycled out for the r03 returns (all fully green r04, siblings
    # cover their paths): rename/nullify/set_column (share the
    # transforms.py path with select/cast/with_column/replace),
    # filter_lt/gt/ge/not_null (one dispatch with filter_eq/is_null),
    # dedup_exact_fast (dedup_exact stays), approx_distinct_by
    # (approx_distinct stays), frame_sample (formula oracle),
    # ann_ivf (ann_ivf_index supersets it), token_count (3 text rows stay)
    "select", "cast", "with_column", "replace",
    "filter_eq", "filter_is_null",
    "minhash_sig", "simhash", "dedup_minhash",
    "value_counts", "head",
    "partition_counts", "row_count", "dedup_exact",
    "sample_uniform",
    "ann_topk", "ann_ivf_index", "group_agg",
    "join_anti_large", "jpeg_decode", "jpeg_progressive",
    "url_canon_dedup",
]


def _rotate_window(q: dict) -> dict:
    missing = [n for n in _WINDOW_FIRST if n not in q]
    assert not missing, f"window rotation names unknown queries: {missing}"
    # the driver checks EXACTLY the first 50 insertions — an oversized
    # list would silently push wave-2/3 operators out of the window
    assert len(_WINDOW_FIRST) <= 50, (
        f"_WINDOW_FIRST has {len(_WINDOW_FIRST)} entries; the driver "
        "checks only the first 50 — trim it"
    )
    rest = {k: v for k, v in q.items() if k not in set(_WINDOW_FIRST)}
    return {**{k: q[k] for k in _WINDOW_FIRST}, **rest}


def _spec_query_events_counts():
    def run(sf_dir: str):
        from tbl_ray import TransformSpec, apply_transforms
        from tbl_ray.sources import read_table

        ds = read_table(os.path.join(sf_dir, "events.parquet"))
        return apply_transforms(ds, TransformSpec(value_counts="event_type"))

    return run


_M64 = "18446744073709551616"  # 2^64


def _mm64(a: str, b: str) -> str:
    """SQL expression: (a * b) mod 2^64 on UBIGINT operands, via 32-bit
    split so the HUGEINT intermediates never overflow INT128."""
    return (
        f"CAST((CAST(CAST((CAST(({a} & 4294967295) AS HUGEINT)"
        f" * CAST({b} AS HUGEINT)) % {_M64} AS UBIGINT) AS HUGEINT)"
        f" + CAST(CAST((CAST(({a} >> 32) AS HUGEINT)"
        f" * CAST({b} AS HUGEINT)) % 4294967296 AS UBIGINT) AS HUGEINT)"
        f" * 4294967296) % {_M64} AS UBIGINT)"
    )


def _splitmix_ctes(prefix: str, src: str) -> str:
    """CTE chain computing ``h = splitmix64(v)`` (the engine's
    ``tbl_ray.webtable._mix``) for every row of CTE ``src``, which must
    expose a UBIGINT column ``v`` (other columns ride along). The final
    CTE is ``<prefix>h`` with column ``h``."""
    c1, c2 = "13787848793156543929", "10723151780598845931"
    return (
        f"{prefix}0 AS (SELECT *, CAST((CAST(v AS HUGEINT)"
        f" + 11400714819323198485) % {_M64} AS UBIGINT) AS z1 FROM {src}),"
        f" {prefix}1 AS (SELECT *, xor(z1, z1 >> 30) AS x1 FROM {prefix}0),"
        f" {prefix}2 AS (SELECT *, {_mm64('x1', c1)} AS z2 FROM {prefix}1),"
        f" {prefix}3 AS (SELECT *, xor(z2, z2 >> 27) AS x2 FROM {prefix}2),"
        f" {prefix}4 AS (SELECT *, {_mm64('x2', c2)} AS y2 FROM {prefix}3),"
        f" {prefix}h AS (SELECT *, xor(y2, y2 >> 31) AS h FROM {prefix}4)"
    )


#: SQL mirror of __ray_entry__._ascii_docs: printable-ASCII sanitize
#: (both regex engines are RE2) + truncation, the byte==char regime
#: where DuckDB character functions replay the engine's byte hashing
_ASCII_SQL = (
    "substring(regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g'), 1, 160)"
)


def _minhash_sig_ctes(n_hashes: int = 12, seed: int = 7) -> str:
    """Exact replay of tbl_ray.functions.dedup.minhash_signatures over
    ASCII text: hex(8-byte window) IS the big-endian shingle u64
    (dedup.py:_window_hashes views windows as '>u8'), splitmix64 via the
    shared CTE chain, then min over ``a_i*h+b_i mod 2^64`` per row. The
    a/b constants replicate np.random.default_rng(seed) exactly.

    Returns a WITH-body chain ending in ``sigs(doc_id, i, sig)`` for the
    docs with >= 1 shingle window (sanitized length >= 8); ``docs0``
    (doc_id, s) carries every doc for consumers that need the rest."""
    import numpy as _np

    rng = _np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=n_hashes, dtype=_np.uint64) * _np.uint64(
        2
    ) + _np.uint64(1)
    b = rng.integers(0, 2**63, size=n_hashes, dtype=_np.uint64)
    params = ", ".join(
        f"({i}, CAST({a[i]} AS UBIGINT), CAST({b[i]} AS UBIGINT))"
        for i in range(n_hashes)
    )
    return (
        f"docs0 AS (SELECT doc_id, {_ASCII_SQL} AS s FROM documents),"
        " docs AS (SELECT doc_id, s FROM docs0 WHERE length(s) >= 8),"
        " w AS (SELECT doc_id,"
        " unnest(generate_series(1, length(s) - 7)) AS p, s FROM docs),"
        " v0 AS (SELECT doc_id,"
        " CAST('0x' || hex(encode(substring(s, p, 8))) AS UBIGINT) AS v"
        f" FROM w), {_splitmix_ctes('m', 'v0')},"
        f" params(i, pa_, pb_) AS (VALUES {params}),"
        " perm AS (SELECT doc_id, i,"
        f" CAST((CAST({_mm64('pa_', 'h')} AS HUGEINT)"
        f" + CAST(pb_ AS HUGEINT)) % {_M64} AS UBIGINT) AS ph"
        " FROM mh CROSS JOIN params),"
        " sigs AS (SELECT doc_id, i, min(ph) AS sig"
        " FROM perm GROUP BY doc_id, i)"
    )


def _minhash_sig_sql(n_hashes: int = 12, seed: int = 7) -> str:
    return (
        f"WITH {_minhash_sig_ctes(n_hashes, seed)}"
        " SELECT doc_id, CAST(i AS BIGINT) AS hash_index, sig FROM sigs"
    )


def _dedup_minhash_sql(
    n_hashes: int = 12, seed: int = 7, min_agree: int = 11
) -> str:
    """Replay of minhash_dedup with one-hash bands: docs missing from
    ``sigs`` (no shingle window) carry the engine's all-U64_MAX
    signature; candidate pairs are position-value matches (exactly the
    one-hash-band buckets, since the bucket key is a bijection of the
    signature value); edges need >= min_agree agreeing positions
    (est >= threshold as an exact integer compare); components resolve
    to their min id, matching the driver union-find's union-by-min."""
    u64max = "CAST(18446744073709551615 AS UBIGINT)"
    return (
        f"WITH {_minhash_sig_ctes(n_hashes, seed)},"
        f" idxs AS (SELECT unnest(generate_series(0, {n_hashes - 1})) AS i),"
        " allsig AS (SELECT d.doc_id, idxs.i,"
        f" coalesce(sg.sig, {u64max}) AS sig"
        " FROM docs0 d CROSS JOIN idxs LEFT JOIN sigs sg"
        " ON sg.doc_id = d.doc_id AND sg.i = idxs.i),"
        " edges AS (SELECT a.doc_id AS ia, b.doc_id AS ib"
        " FROM allsig a JOIN allsig b"
        " ON a.i = b.i AND a.sig = b.sig AND a.doc_id < b.doc_id"
        f" GROUP BY ia, ib HAVING count(*) >= {min_agree}),"
        " sym AS (SELECT ia AS x, ib AS y FROM edges"
        " UNION ALL SELECT ib, ia FROM edges),"
        " lab AS (WITH RECURSIVE l(id, lo) AS ("
        " SELECT doc_id, doc_id FROM docs0 UNION"
        " SELECT s.y, l.lo FROM l JOIN sym s ON s.x = l.id"
        " WHERE l.lo < s.y)"
        " SELECT id, min(lo) AS root FROM l GROUP BY id)"
        " SELECT d.doc_id, d.s AS text FROM docs0 d"
        " JOIN lab ON lab.id = d.doc_id AND lab.root = d.doc_id"
    )


def _simhash_sql(seed: int = 11) -> str:
    """Exact replay of simhash_batch(word_hasher='poly') over ASCII text:
    RE2 \\s+ split (empty edge tokens INCLUDED, verified identical
    between Arrow and DuckDB), byte-polynomial word hash
    sum(byte_j * P^j) mod 2^64 -> splitmix64(h + seed), per-bit ±1
    votes over every word occurrence, bit set iff votes > 0."""
    P = 1099511628211  # tbl_ray.functions.dedup._POLY_P
    pw, pows = 1, []
    for j in range(1, 161):
        pows.append(f"({j}, CAST({pw} AS UBIGINT))")
        pw = (pw * P) % (1 << 64)
    split = "regexp_split_to_array(s, '\\s+')"
    return (
        f"WITH docs AS (SELECT doc_id, {_ASCII_SQL} AS s FROM documents),"
        f" wl AS (SELECT doc_id, unnest({split}) AS w,"
        f" generate_subscripts({split}, 1) AS wi FROM docs),"
        " ch AS (SELECT doc_id, wi, w,"
        " unnest(generate_series(1, length(w))) AS j FROM wl),"
        f" pows(j, pw) AS (VALUES {', '.join(pows)}),"
        " terms AS (SELECT doc_id, wi,"
        " (CAST(ascii(substring(w, ch.j, 1)) AS HUGEINT)"
        f" * CAST(pw AS HUGEINT)) % {_M64} AS term"
        " FROM ch JOIN pows ON pows.j = ch.j),"
        " wsum AS (SELECT doc_id, wi,"
        f" CAST(sum(term) % {_M64} AS UBIGINT) AS hsum"
        " FROM terms GROUP BY doc_id, wi),"
        " wh0 AS (SELECT wl.doc_id, wl.wi,"
        f" CAST((CAST(coalesce(ws.hsum, 0) AS HUGEINT) + {seed}) % {_M64}"
        " AS UBIGINT) AS v FROM wl LEFT JOIN wsum ws"
        " ON ws.doc_id = wl.doc_id AND ws.wi = wl.wi),"
        f" {_splitmix_ctes('m', 'wh0')},"
        " bits AS (SELECT unnest(generate_series(0, 63)) AS b),"
        " votes AS (SELECT doc_id, b,"
        " sum(CASE WHEN (h >> b) & CAST(1 AS UBIGINT) = CAST(1 AS UBIGINT)"
        " THEN 1 ELSE -1 END) AS v_ FROM mh CROSS JOIN bits"
        " GROUP BY doc_id, b)"
        " SELECT doc_id, CAST(sum(CASE WHEN v_ > 0"
        " THEN CAST(CAST(1 AS UBIGINT) << b AS HUGEINT) ELSE 0 END)"
        " AS UBIGINT) AS simhash FROM votes GROUP BY doc_id"
    )


def _hll_sql(src_select: str, group_cols: str = "") -> str:
    """HLL replay (p=12, the engine's ``tbl_ray.functions.sketches``):
    ``src_select`` must yield column ``v`` (UBIGINT) plus any
    ``group_cols``; returns SQL computing the double ``approx_distinct``
    estimate per group (or globally when ``group_cols`` is '')."""
    p, m = 12, 4096
    gsel = f"{group_cols}, " if group_cols else ""
    gby = f" GROUP BY {group_cols}" if group_cols else ""
    return (
        f"WITH src AS ({src_select}), {_splitmix_ctes('m', 'src')},"
        f" r AS (SELECT {gsel}CAST(h >> (64 - {p}) AS BIGINT) AS idx,"
        f" (h & CAST({(1 << (64 - p)) - 1} AS UBIGINT)) AS w FROM mh),"
        f" regs AS (SELECT {gsel}idx,"
        f" max(CASE WHEN w = 0 THEN {64 - p + 1}"
        f" ELSE {64 - p} - CAST(floor(log2(CAST(w AS DOUBLE))) AS BIGINT)"
        f" END) AS rank FROM r GROUP BY {gsel}idx),"
        f" s AS (SELECT {gsel}sum(pow(2.0, -rank)) AS sp,"
        f" count(*) AS np_ FROM regs{gby}),"
        f" est AS (SELECT {gsel}(0.7213 / (1 + 1.079 / {m})) * {m} * {m}"
        f" / (sp + ({m} - np_) * 1.0) AS e, {m} - np_ AS zeros FROM s)"
        f" SELECT {gsel}CASE WHEN e <= 2.5 * {m} AND zeros > 0"
        f" THEN {m} * ln(CAST({m} AS DOUBLE) / zeros) ELSE e END"
        f" AS approx_distinct FROM est"
    )


def _quality_expr(textcol: str) -> str:
    """The engine's text_stats quality score as one SQL expression over
    ``textcol`` — same float64 expression tree term by term
    (tbl_ray/functions/text.py:text_stats_batch), so values are
    bit-identical given identical counts."""
    stop = r"\b(the|and|of|to|in|is|that|for|with|was)\b"
    nc = f"CAST(length({textcol}) AS DOUBLE)"
    nt = f"CAST(len(regexp_extract_all({textcol}, '\\S+')) AS DOUBLE)"
    np_ = f"CAST(len(regexp_extract_all({textcol}, '[.,!?;:]')) AS DOUBLE)"
    nd = f"CAST(len(regexp_extract_all({textcol}, '[0-9]')) AS DOUBLE)"
    ns = f"CAST(len(regexp_extract_all({textcol}, '{stop}')) AS DOUBLE)"
    st = f"greatest({nt}, 1.0)"  # safe_tokens
    sc = f"greatest({nc}, 1.0)"  # safe_chars
    return (
        f"least(greatest({nc} / 500.0, 0), 1) * 0.3"
        f" + least(greatest(1.0 - abs({nc} / {st} - 5.0) / 5.0, 0), 1) * 0.3"
        f" + least(greatest(({ns} / {st}) * 4.0, 0), 1) * 0.2"
        f" + least(greatest(1.0 - ({nd} / {sc}) * 5.0, 0), 1) * 0.1"
        f" + least(greatest(1.0 - ({np_} / {sc}) * 10.0, 0), 1) * 0.1"
    )


def _langid_sql() -> str:
    """The engine's marker-word langid heuristic replayed in SQL: the
    scores share one denominator, so argmax over hit counts with
    first-in-list tie-break mirrors np.argmax; confidence gate is
    max_score > 0.01 (tbl_ray/functions/text.py:langid_batch)."""
    markers = {
        "en": "the|and|of|to|in|is|that|for|with|was",
        "de": "der|die|das|und|ist|nicht|ein|mit|von|zu",
        "fr": "le|la|les|et|est|une|pour|dans|que|des",
        "es": "el|la|los|y|es|una|para|que|con|por",
        "zh": "de|shi|le|zai|you|wo|ta|zhe|bu|ren",
    }
    hits = ", ".join(
        f"CAST(len(regexp_extract_all(text, '\\b({pat})\\b')) AS DOUBLE)"
        f" AS h_{lang}"
        for lang, pat in markers.items()
    )
    return (
        f"WITH s AS (SELECT doc_id, {hits},"
        " greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE),"
        " 1.0) AS nt FROM documents)"
        " SELECT doc_id, CASE WHEN"
        " greatest(h_en, h_de, h_fr, h_es, h_zh) / nt > 0.01 THEN"
        " CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es"
        " AND h_en >= h_zh THEN 'en'"
        " WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'"
        " WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'"
        " WHEN h_es >= h_zh THEN 'es' ELSE 'zh' END"
        " ELSE 'und' END AS lang_pred FROM s"
    )


def _kmeans_sql(k: int = 8, iters: int = 3) -> str:
    """The engine's Lloyd k-means replayed in SQL (cosine geometry,
    min-id seeding, empty clusters keep their centroid —
    tbl_ray/functions/similarity.py:kmeans_fit). Cosine is scale
    invariant, so SQL never needs to renormalize centroids; assignment
    uses dot(normalized_vec, centroid)/|centroid| with the engine's
    lowest-index tie-break. Output: final-assignment cluster sizes."""
    parts = [
        "WITH comp AS (SELECT vec_id,"
        " generate_subscripts(embedding, 1) AS pos,"
        " unnest(embedding) AS val FROM embeddings),"
        " nrm AS (SELECT vec_id, sqrt(sum(val * val)) AS nv"
        " FROM comp GROUP BY vec_id),"
        " ncomp AS (SELECT c.vec_id, c.pos, c.val / n.nv AS val"
        " FROM comp c JOIN nrm n USING (vec_id)),"
        f" seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,"
        f" vec_id FROM embeddings ORDER BY vec_id LIMIT {k}),"
        " cent0 AS (SELECT s.cid, nc.pos, nc.val"
        " FROM seeds s JOIN ncomp nc USING (vec_id))"
    ]
    for it in range(iters + 1):
        parts.append(
            f", sim{it} AS (SELECT nc.vec_id, ct.cid,"
            f" sum(nc.val * ct.val) AS dot FROM ncomp nc"
            f" JOIN cent{it} ct ON nc.pos = ct.pos GROUP BY nc.vec_id, ct.cid),"
            f" cn{it} AS (SELECT cid, sqrt(sum(val * val)) AS cn"
            f" FROM cent{it} GROUP BY cid),"
            f" a{it} AS (SELECT vec_id, cid FROM (SELECT s.vec_id, s.cid,"
            f" row_number() OVER (PARTITION BY s.vec_id"
            f" ORDER BY s.dot / n.cn DESC, s.cid) AS rn"
            f" FROM sim{it} s JOIN cn{it} n USING (cid)) WHERE rn = 1)"
        )
        if it < iters:
            parts.append(
                f", cent{it + 1} AS (SELECT ct.cid, ct.pos,"
                f" coalesce(u.val, ct.val) AS val FROM cent{it} ct"
                f" LEFT JOIN (SELECT a.cid, nc.pos, avg(nc.val) AS val"
                f" FROM a{it} a JOIN ncomp nc USING (vec_id)"
                f" GROUP BY a.cid, nc.pos) u"
                f" ON u.cid = ct.cid AND u.pos = ct.pos)"
            )
    parts.append(
        f" SELECT cid AS cluster, CAST(count(*) AS BIGINT) AS count_vec_id"
        f" FROM a{iters} GROUP BY cid"
    )
    return "".join(parts)


def _wave4_oracles() -> dict[str, str]:
    """Round-4 oracle conversions: exact SQL replays for operators that
    previously had rows-only checks."""
    out: dict[str, str] = {}
    out["quality"] = (
        f"SELECT doc_id, {_quality_expr('text')} AS quality FROM documents"
    )
    out["langid"] = _langid_sql()
    # fingerprint: over documents UNION an id-shifted copy, equal texts
    # fingerprint equal and distinct texts distinct (64-bit), so the
    # same-fingerprint count equals the same-text count
    out["fingerprint"] = (
        "WITH uni AS (SELECT doc_id, text FROM documents"
        " UNION ALL SELECT doc_id + 1000000, text FROM documents)"
        " SELECT doc_id, count(*) OVER (PARTITION BY text) AS n_same_fp"
        " FROM uni"
    )
    out["approx_distinct"] = _hll_sql(
        "SELECT DISTINCT CAST(l_orderkey AS UBIGINT) AS v FROM lineitem"
    )
    out["approx_distinct_by"] = (
        "SELECT lang, CAST(round(approx_distinct) AS BIGINT)"
        " AS approx_distinct FROM ("
        + _hll_sql(
            "SELECT DISTINCT lang, CAST(doc_id AS UBIGINT) AS v"
            " FROM documents",
            group_cols="lang",
        )
        + ")"
    )
    # DDSketch replay (alpha=0.01): same log-bucket indices, counts,
    # cumulative walk and midpoint formula as functions/sketches.py
    g = "(1.01 / 0.99)"
    out["approx_quantiles"] = (
        "WITH v AS (SELECT l_extendedprice AS x FROM lineitem"
        " WHERE l_extendedprice IS NOT NULL),"
        " b AS (SELECT CASE WHEN x = 0 THEN 0 ELSE"
        f" greatest(CAST(ceil(ln(x) / ln{g}) AS BIGINT), 1) END"
        " AS bucket FROM v),"
        " hist AS (SELECT bucket, count(*) AS c FROM b GROUP BY bucket),"
        " cu AS (SELECT bucket, sum(c) OVER (ORDER BY bucket) AS cum,"
        " (SELECT sum(c) FROM hist) AS total FROM hist),"
        " qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),"
        " CAST(0.99 AS DOUBLE)]) AS q),"
        " pick AS (SELECT q, min(bucket) AS bucket FROM qs JOIN cu"
        " ON CAST(cu.cum AS DOUBLE) > q * greatest(cu.total - 1, 0)"
        " GROUP BY q)"
        " SELECT q, CASE WHEN bucket = 0 THEN 0.0 ELSE"
        f" 2.0 * pow({g}, abs(bucket))"
        f" / ({g} + 1.0) END AS value FROM pick ORDER BY q"
    )
    out["encode_roundtrip"] = (
        "SELECT lang, CAST(count(doc_id) AS BIGINT) AS n,"
        " CAST(sum(doc_id) AS BIGINT) AS sum_id,"
        " CAST(sum(n_chars) AS BIGINT) AS sum_chars,"
        " min(text) AS min_text, max(text) AS max_text"
        " FROM documents GROUP BY lang"
    )
    # probe-all IVF == exact cosine top-k (same oracle as ann_topk)
    out["ann_ivf"] = (
        "WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)"
        " SELECT e.vec_id FROM embeddings e, q"
        " ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,"
        " e.vec_id LIMIT 10"
    )
    # image decode: closed-form dims + analytic pixel sums
    # (formula_image_table: R=(x*255)//(w-1), G=(y*255)//(h-1),
    # B=(x*y+i)%256; BMP size = 54 + h*rowpad4(w*3))
    out["image_decode"] = (
        "WITH img AS (SELECT unnest(generate_series(0, 199)) AS i),"
        " dims AS (SELECT i AS media_id, 8 + (i * 37) % 56 AS w,"
        " 8 + (i * 53) % 56 AS h FROM img),"
        " xs AS (SELECT media_id, w, h,"
        " unnest(generate_series(0, w - 1)) AS x FROM dims),"
        " ys AS (SELECT media_id, w, h,"
        " unnest(generate_series(0, h - 1)) AS y FROM dims),"
        " sr AS (SELECT media_id, max(h) * sum((x * 255) // (w - 1)) AS s"
        " FROM xs GROUP BY media_id),"
        " sg AS (SELECT media_id, max(w) * sum((y * 255) // (h - 1)) AS s"
        " FROM ys GROUP BY media_id),"
        " sb AS (SELECT xs.media_id,"
        " sum((xs.x * ys.y + xs.media_id) % 256) AS s"
        " FROM xs JOIN ys ON xs.media_id = ys.media_id"
        " GROUP BY xs.media_id)"
        " SELECT d.media_id, CAST(d.w AS INTEGER) AS width,"
        " CAST(d.h AS INTEGER) AS height,"
        " CAST(54 + d.h * ((d.w * 3 + 3) // 4 * 4) AS BIGINT) AS n_bytes,"
        " CAST(sr.s + sg.s + sb.s AS BIGINT) AS sum_px"
        " FROM dims d JOIN sr USING (media_id) JOIN sg USING (media_id)"
        " JOIN sb USING (media_id)"
    )
    # audio decode: formula_audio_table's integer PCM replayed exactly
    out["audio_decode"] = (
        "WITH a AS (SELECT unnest(generate_series(0, 99)) AS i),"
        " d AS (SELECT i AS media_id, CASE i % 3 WHEN 0 THEN 8000"
        " WHEN 1 THEN 16000 ELSE 44100 END AS rate,"
        " 500 + (i * 131) % 1500 AS len FROM a),"
        " t AS (SELECT media_id, unnest(generate_series(0, len - 1)) AS tt"
        " FROM d),"
        " s AS (SELECT media_id, CAST(sum((tt * (tt + 7) + media_id * 31)"
        " % 24001 - 12000) AS BIGINT) AS sum_pcm FROM t GROUP BY media_id)"
        " SELECT d.media_id, CAST(d.rate AS INTEGER) AS sample_rate,"
        " CAST(d.len AS BIGINT) AS n_samples,"
        " CAST(1 AS INTEGER) AS channels, s.sum_pcm"
        " FROM d JOIN s USING (media_id)"
    )
    # frame sampling: n_sample=2 of 8 frames picks indices {0, 4};
    # frame dims are formula_video_table's closed forms
    out["frame_sample"] = (
        "WITH v AS (SELECT unnest(generate_series(0, 39)) AS i),"
        " f AS (SELECT i AS media_id, unnest([0, 4]) AS j FROM v)"
        " SELECT media_id, CAST(j AS BIGINT) AS frame_index,"
        " CAST(8 + (media_id * 7 + j * 37) % 56 AS INTEGER) AS width,"
        " CAST(8 + (media_id * 11 + j * 53) % 56 AS INTEGER) AS height"
        " FROM f"
    )
    # greedy packing walk (single input block -> pure function of doc
    # order) via a linear recursive CTE
    out["pack_sequences"] = (
        "WITH c AS (SELECT doc_id,"
        " row_number() OVER (ORDER BY doc_id) AS rn,"
        " CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nt"
        " FROM documents),"
        " walk AS (WITH RECURSIVE w(rn, doc_id, nt, seq_id, run) AS ("
        " SELECT rn, doc_id, nt, doc_id, nt FROM c WHERE rn = 1"
        " UNION ALL SELECT c.rn, c.doc_id, c.nt,"
        " CASE WHEN w.run + c.nt <= 256 THEN w.seq_id ELSE c.doc_id END,"
        " CASE WHEN w.run + c.nt <= 256 THEN w.run + c.nt ELSE c.nt END"
        " FROM w JOIN c ON c.rn = w.rn + 1) SELECT * FROM w)"
        " SELECT seq_id, count(*) AS n_docs,"
        " CAST(sum(nt) AS BIGINT) AS n_tokens FROM walk GROUP BY seq_id"
    )
    # curation funnel with near-dedup off: normalize -> exact dedup
    # (min id per normalized text) -> seeded uniform sample of 100;
    # quality replays the engine formula over the NORMALIZED text
    out["curate_webtext"] = (
        "WITH nrm AS (SELECT doc_id, lang,"
        " lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS ntext"
        " FROM documents),"
        " k AS (SELECT min(doc_id) AS doc_id FROM nrm GROUP BY ntext),"
        " kept AS (SELECT n.* FROM nrm n JOIN k ON n.doc_id = k.doc_id),"
        f" sc AS (SELECT doc_id, lang, {_quality_expr('ntext')} AS quality,"
        " (doc_id * 2654435761) % 4294967296 AS sk FROM kept)"
        " SELECT doc_id, lang, quality FROM sc"
        " ORDER BY sk, doc_id LIMIT 100"
    )
    out["kmeans"] = _kmeans_sql(8, 3)
    out["join_anti_large"] = (
        "SELECT l_orderkey, l_linenumber FROM lineitem"
        " WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders"
        " WHERE o_orderpriority='1-URGENT')"
    )
    # JPEG decode: dims replay the generating formulas; fidelity flag is
    # TRUE by the codec's q=90 error bound (lossy, so no exact pixel sum)
    out["jpeg_decode"] = (
        "WITH v AS (SELECT unnest(generate_series(0, 59)) AS i)"
        " SELECT i AS media_id,"
        " CAST(16 + (i * 29) % 48 AS BIGINT) AS width,"
        " CAST(16 + (i * 41) % 48 AS BIGINT) AS height,"
        " TRUE AS fidelity_ok FROM v"
    )
    # URL canonicalization: the SAME url construction in SQL and the
    # SAME RE2 rule chain (canon_sql_expr folds CANON_RULES verbatim —
    # DuckDB and Arrow both run RE2), then min-key-per-canonical-group
    from tbl_ray.functions.urls import canon_sql_expr as _canon_sql

    out["url_canon_dedup"] = (
        "WITH u AS (SELECT o_orderkey AS k,"
        " CASE CAST(o_orderkey % 3 AS INT)"
        " WHEN 0 THEN 'http://site' || CAST((o_orderkey // 3) % 97 AS VARCHAR)"
        "   || '.example.com/p/' || CAST(o_orderkey // 3 AS VARCHAR)"
        "   || '?id=' || CAST(o_orderkey // 3 AS VARCHAR)"
        " WHEN 1 THEN 'HTTP://WWW.SITE' || CAST((o_orderkey // 3) % 97 AS VARCHAR)"
        "   || '.EXAMPLE.COM:80/p/' || CAST(o_orderkey // 3 AS VARCHAR)"
        "   || '?utm_source=feed&id=' || CAST(o_orderkey // 3 AS VARCHAR)"
        "   || '#top'"
        " ELSE 'http://site' || CAST((o_orderkey // 3) % 97 AS VARCHAR)"
        "   || '.example.com:80/p/' || CAST(o_orderkey // 3 AS VARCHAR)"
        "   || '?id=' || CAST(o_orderkey // 3 AS VARCHAR)"
        "   || '&utm_campaign=x&gclid=1'"
        " END AS url FROM orders),"
        f" c AS (SELECT k, {_canon_sql('url')} AS url_canon FROM u),"
        " m AS (SELECT k AS o_orderkey, url_canon,"
        " min(k) OVER (PARTITION BY url_canon) AS mn FROM c)"
        " SELECT o_orderkey, url_canon FROM m WHERE o_orderkey = mn"
    )
    # progressive JPEG: dims from the generating formulas; the
    # progressive stream carries the same quantized coefficients as the
    # baseline stream, so decode equality is exact (TRUE), not a bound
    out["jpeg_progressive"] = (
        "WITH v AS (SELECT unnest(generate_series(0, 39)) AS i)"
        " SELECT i AS media_id,"
        " CAST(16 + (i * 23) % 40 AS BIGINT) AS width,"
        " CAST(16 + (i * 37) % 40 AS BIGINT) AS height,"
        " TRUE AS matches_baseline FROM v"
    )
    # brute-force character-trigram Jaccard dedup from first principles:
    # distinct trigrams per doc, pairwise intersection via a gram join,
    # J >= 0.8 edges, min-label propagation for connected components,
    # keep the component-min doc (the engine's exhaustive-candidate LSH
    # + exact-verify + union-find computes the same set)
    out["dedup_ngram"] = (
        "WITH pos AS (SELECT doc_id, text,"
        " unnest(generate_series(1, length(text) - 2)) AS i"
        " FROM documents),"
        " grams AS (SELECT DISTINCT doc_id, substr(text, i, 3) AS g"
        " FROM pos),"
        " sizes AS (SELECT doc_id, count(*) AS n_g FROM grams"
        " GROUP BY doc_id),"
        " inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib,"
        " count(*) AS i_cnt FROM grams a"
        " JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id"
        " GROUP BY ia, ib),"
        " edges AS (SELECT ia, ib FROM inter"
        " JOIN sizes sa ON sa.doc_id = inter.ia"
        " JOIN sizes sb ON sb.doc_id = inter.ib"
        " WHERE CAST(i_cnt AS DOUBLE) / (sa.n_g + sb.n_g - i_cnt)"
        " >= 0.8),"
        " sym AS (SELECT ia AS x, ib AS y FROM edges"
        " UNION ALL SELECT ib, ia FROM edges),"
        " lab AS (WITH RECURSIVE l(id, lo) AS ("
        " SELECT doc_id, doc_id FROM documents UNION"
        " SELECT s.y, l.lo FROM l JOIN sym s ON s.x = l.id"
        " WHERE l.lo < s.y)"
        " SELECT id, min(lo) AS root FROM l GROUP BY id)"
        " SELECT d.doc_id, d.lang, d.n_chars FROM documents d"
        " JOIN lab ON lab.id = d.doc_id AND lab.root = d.doc_id"
    )
    out["minhash_sig"] = _minhash_sig_sql(n_hashes=12, seed=7)
    out["simhash"] = _simhash_sql(seed=11)
    # threshold 0.85 over 12 hashes <=> k >= ceil(0.85 * 12) = 11
    out["dedup_minhash"] = _dedup_minhash_sql(n_hashes=12, seed=7, min_agree=11)
    return out


def oracle_sql() -> dict[str, str]:
    out = {
        "select": "SELECT l_orderkey, l_quantity FROM lineitem",
        "drop": (
            "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,"
            " o_orderdate FROM orders"
        ),
        "rename": (
            "SELECT o_orderkey AS okey, o_custkey, o_orderstatus, o_totalprice,"
            " o_orderdate, o_orderpriority FROM orders"
        ),
        "cast": (
            "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber"
            " FROM lineitem"
        ),
        "cast_date": (
            "SELECT l_orderkey, CAST(l_shipdate AS DATE) AS l_shipdate"
            " FROM lineitem"
        ),
        "with_column": "SELECT o_orderkey, CAST(7 AS INTEGER) AS flag FROM orders",
        "set_column": "SELECT o_orderkey, 'X' AS o_orderstatus FROM orders",
        "nullify": (
            "SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice FROM orders"
        ),
        "replace": (
            "SELECT l_orderkey, l_linenumber, CASE WHEN l_returnflag='A' THEN 'Z'"
            " ELSE l_returnflag END AS l_returnflag FROM lineitem"
        ),
        "filter_eq": "SELECT * FROM lineitem WHERE l_returnflag = 'A'",
        "filter_ne": "SELECT * FROM lineitem WHERE l_linestatus != 'O'",
        "filter_gt": "SELECT * FROM lineitem WHERE l_quantity > 45.0",
        "filter_ge": "SELECT * FROM lineitem WHERE l_extendedprice >= 90000",
        "filter_le": "SELECT * FROM orders WHERE o_totalprice <= 30000",
        "filter_lt": "SELECT * FROM lineitem WHERE l_quantity < 3",
        "filter_not_null": "SELECT * FROM orders WHERE o_custkey IS NOT NULL",
        "filter_is_null": (
            "SELECT o_orderkey, CAST(NULL AS VARCHAR) AS nullcol FROM orders"
        ),
        "head": "SELECT * FROM lineitem LIMIT 50",
        "offset_head": "SELECT * FROM lineitem LIMIT 50 OFFSET 100",
        "tail": (
            "SELECT * FROM events OFFSET (SELECT count(*) - 50 FROM events)"
        ),
        "value_counts": (
            "SELECT l_returnflag, count(l_returnflag) AS count FROM lineitem"
            " GROUP BY l_returnflag"
        ),
        "value_counts_events": (
            "SELECT event_type, count(event_type) AS count FROM events"
            " GROUP BY event_type"
        ),
        "sort_topk": (
            "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem"
            " ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"
        ),
        "row_count": "SELECT count(*) AS n_rows FROM lineitem",
        "chain": (
            "SELECT l_orderkey, l_linenumber, l_quantity AS qty, l_returnflag,"
            " 'web' AS src FROM lineitem"
            " WHERE l_quantity > 25.0 AND l_returnflag != 'N'"
        ),
        "dedup_exact": (
            "SELECT d.* FROM documents d JOIN (SELECT text, min(doc_id) AS doc_id"
            " FROM documents GROUP BY text) k ON d.doc_id = k.doc_id"
        ),
        "dedup_exact_fast": (
            "SELECT d.* FROM documents d JOIN (SELECT text, min(doc_id) AS doc_id"
            " FROM documents GROUP BY text) k ON d.doc_id = k.doc_id"
        ),
        "token_count": (
            "SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens"
            " FROM documents"
        ),
        "text_len": "SELECT doc_id, length(text) AS text_len FROM documents",
        "partition_counts": (
            "SELECT lang, count(lang) AS rows FROM documents GROUP BY lang"
        ),
        "sessions": (
            "WITH d AS (SELECT user_id, CASE WHEN lag(ts) OVER w IS NULL"
            " OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000"
            " THEN 1 ELSE 0 END AS new_s FROM events"
            " WINDOW w AS (PARTITION BY user_id ORDER BY ts))"
            " SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,"
            " count(*) AS n_events FROM d GROUP BY user_id"
        ),
        "normalize_text": (
            "SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ',"
            " 'g'))) AS text FROM documents"
        ),
        "repetition_stats": (
            "WITH w AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word"
            " FROM documents),"
            " c AS (SELECT doc_id, word, count(*) AS c FROM w"
            " GROUP BY doc_id, word),"
            " per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,"
            " count(*) AS n_distinct_words, CAST(max(c) AS BIGINT) AS top"
            " FROM c GROUP BY doc_id)"
            " SELECT doc_id, n_words, n_distinct_words,"
            " CAST(n_words - n_distinct_words AS DOUBLE) / n_words"
            " AS dup_word_frac,"
            " CAST(top AS DOUBLE) / n_words AS top_word_frac FROM per"
        ),
        "redact": (
            "SELECT doc_id,"
            " regexp_replace(text, '\\b(spark|dup)\\b', '<TOPIC>', 'g')"
            " AS text,"
            " CAST(len(regexp_extract_all(text, '\\b(spark|dup)\\b'))"
            " AS BIGINT) AS n_redacted FROM documents"
        ),
        "count_distinct_by": (
            "SELECT lang, CAST(count(DISTINCT source) AS BIGINT)"
            " AS n_distinct FROM documents GROUP BY lang"
        ),
        "embedding_centroids": (
            "WITH e AS (SELECT label, unnest(embedding) AS v,"
            " unnest(range(1, len(embedding)+1)) AS pos FROM embeddings)"
            " SELECT label, pos, avg(CAST(v AS DOUBLE)) AS value,"
            " count(*) AS n FROM e GROUP BY label, pos"
        ),
        "histogram": (
            "SELECT LEAST(GREATEST(CAST(floor((n_chars - 100.0) / 50.0)"
            " AS BIGINT), 0), 9) AS bucket, count(*) AS n"
            " FROM documents WHERE n_chars IS NOT NULL GROUP BY bucket"
        ),
        "url_parts": (
            "WITH u AS (SELECT doc_id, 'https://' || source ||"
            " '.example.com/docs/' || CAST(doc_id AS VARCHAR) AS url"
            " FROM documents),"
            " h AS (SELECT doc_id, url,"
            " regexp_extract(url, '^([a-z][a-z0-9+.\\-]*)://', 1) AS scheme,"
            " regexp_extract(url, '^[a-z][a-z0-9+.\\-]*://([^/?#]+)', 1)"
            " AS host,"
            " regexp_extract(url,"
            " '^[a-z][a-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1) AS path FROM u)"
            " SELECT doc_id, url, scheme, host, path,"
            " regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,"
            " CAST(len(path) - len(replace(path, '/', '')) AS BIGINT)"
            " AS path_depth FROM h"
        ),
        "join_shuffle": (
            "SELECT l.l_orderkey, l.l_quantity, o.o_custkey"
            " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
        ),
        "top_ngrams": (
            "WITH wl AS (SELECT doc_id, list_filter(str_split_regex(text,"
            " '\\s+'), x -> x <> '') AS ws FROM documents),"
            " w AS (SELECT doc_id, unnest(ws) AS word,"
            " unnest(range(1, len(ws)+1)) AS pos FROM wl)"
            " SELECT w1.word || ' ' || w2.word AS ngram, count(*) AS n"
            " FROM w w1 JOIN w w2 ON w1.doc_id = w2.doc_id"
            " AND w2.pos = w1.pos + 1"
            " GROUP BY ngram ORDER BY n DESC, ngram LIMIT 50"
        ),
        "shuffle_head": (
            "SELECT doc_id, row_number() OVER (ORDER BY"
            " CAST(((doc_id + 7) * 2654435761) % 4294967296 AS BIGINT),"
            " doc_id) - 1 AS pos FROM documents"
            " ORDER BY pos LIMIT 100"
        ),
        "token_count_bpe": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text,"
            " '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+|"
            " ?[^\\s\\p{L}\\p{N}]+|\\s+')) AS BIGINT)"
            " AS n_bpe_tokens FROM documents"
        ),
        "chunk_fixed": (
            "WITH c AS (SELECT doc_id, text, unnest(range(0,"
            " CAST(greatest(ceil(length(text)/40.0), 1) AS BIGINT)))"
            " AS chunk_id FROM documents)"
            " SELECT doc_id, chunk_id,"
            " substr(text, 1 + CAST(chunk_id*40 AS INT), 40) AS text FROM c"
        ),
        "dedup_lines": (
            "WITH l AS (SELECT doc_id,"
            " unnest(str_split(text, ' ')) AS w,"
            " unnest(range(1, len(str_split(text, ' ')) + 1)) AS pos"
            " FROM documents),"
            " f AS (SELECT w, count(*) AS c FROM l GROUP BY w)"
            " SELECT doc_id, coalesce(string_agg(w, ' ' ORDER BY pos)"
            " FILTER (WHERE c < 900), '') AS text"
            " FROM l JOIN f USING (w) GROUP BY doc_id"
        ),
        "grouped_topn": (
            "SELECT lang, doc_id FROM (SELECT lang, doc_id, row_number()"
            " OVER (PARTITION BY lang ORDER BY doc_id DESC) rn"
            " FROM documents) WHERE rn <= 5"
        ),
        "join_asof": (
            "WITH versions(event_type, vts, config_ver) AS (VALUES"
            " ('click', TIMESTAMP '2024-01-01', CAST(1 AS BIGINT)),"
            " ('click', TIMESTAMP '2024-01-15', 2),"
            " ('view', TIMESTAMP '2024-01-05', 10),"
            " ('purchase', TIMESTAMP '2024-02-01', 20))"
            " SELECT e.event_id, e.event_type, v.config_ver FROM events e"
            " ASOF LEFT JOIN versions v"
            " ON e.event_type = v.event_type AND e.ts >= v.vts"
        ),
        "pipeline_e2e": (
            "WITH en AS (SELECT * FROM documents WHERE lang = 'en'),"
            " keep AS (SELECT min(doc_id) AS doc_id FROM en GROUP BY text)"
            " SELECT e.doc_id,"
            " len(regexp_extract_all(e.text, '\\S+')) AS n_tokens"
            " FROM en e JOIN keep k ON e.doc_id = k.doc_id"
        ),
        "join_broadcast": (
            "SELECT o.o_orderkey, o.o_custkey, c.c_name FROM orders o"
            " JOIN customer c ON o.o_custkey = c.c_custkey"
        ),
        "sample_uniform": (
            "SELECT * EXCLUDE (__sk__) FROM ("
            "SELECT d.*, CAST(((doc_id + 7) * 2654435761) % 4294967296 AS BIGINT)"
            " AS __sk__ FROM documents d)"
            " ORDER BY __sk__, doc_id LIMIT 100"
        ),
        "sample_stratified": (
            "SELECT * EXCLUDE (__sk__, __rn__) FROM ("
            "SELECT d.*, CAST(((doc_id + 7) * 2654435761) % 4294967296 AS BIGINT)"
            " AS __sk__,"
            " row_number() OVER (PARTITION BY lang ORDER BY"
            " ((doc_id + 7) * 2654435761) % 4294967296, doc_id) AS __rn__"
            " FROM documents d) WHERE __rn__ <= 20"
        ),
        "top_vocab": (
            "SELECT word, CAST(count(*) AS BIGINT) AS n FROM ("
            "SELECT unnest(regexp_extract_all(text, '\\S+')) AS word"
            " FROM documents) GROUP BY word ORDER BY n DESC, word LIMIT 50"
        ),
        "group_agg": (
            "SELECT l_returnflag,"
            " CAST(count(l_quantity) AS BIGINT) AS count_l_quantity,"
            " min(l_quantity) AS min_l_quantity,"
            " max(l_quantity) AS max_l_quantity,"
            " CAST(sum(l_orderkey) AS BIGINT) AS sum_l_orderkey"
            " FROM lineitem GROUP BY l_returnflag"
        ),
        "window_agg": (
            "SELECT event_type,"
            " (epoch_us(ts) // 86400000000) * 86400000000 AS window_start,"
            " count(value) AS n_events, sum(value) AS sum_value,"
            " min(value) AS min_value, max(value) AS max_value"
            " FROM events GROUP BY event_type, window_start"
        ),
        "ann_topk": (
            "WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)"
            " SELECT e.vec_id FROM embeddings e, q"
            " ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,"
            " e.vec_id LIMIT 10"
        ),
        "window_fns": (
            "WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate,"
            " CAST(floor(o_totalprice) AS BIGINT) AS price_fl FROM orders)"
            " SELECT o_orderkey, o_custkey,"
            " row_number() OVER w AS rn,"
            " lag(price_fl) OVER w AS lag_price_fl,"
            " CAST(sum(price_fl) OVER (PARTITION BY o_custkey ORDER BY"
            " o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND"
            " CURRENT ROW) AS BIGINT) AS cum_price_fl,"
            " lead(price_fl) OVER w AS lead_price_fl,"
            " first_value(price_fl) OVER w AS first_price_fl,"
            " percent_rank() OVER w AS pr,"
            " CAST(ntile(4) OVER w AS BIGINT) AS nt"
            " FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY"
            " o_orderdate, o_orderkey)"
        ),
        "rolling_window": (
            "WITH e AS (SELECT event_id, user_id, ts,"
            " CAST(floor(value) AS BIGINT) AS value_fl FROM events)"
            " SELECT event_id, count(*) OVER w AS n_w,"
            " CAST(sum(value_fl) OVER w AS BIGINT) AS sum_w"
            " FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts"
            " RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ),
        "explode": (
            "SELECT vec_id, generate_subscripts(embedding, 1) AS pos,"
            " unnest(embedding) AS val FROM embeddings WHERE vec_id < 200"
        ),
        "pivot_counts": (
            "SELECT lang,"
            " CAST(sum(CASE WHEN source='src0' THEN 1 ELSE 0 END) AS BIGINT) AS n_src0,"
            " CAST(sum(CASE WHEN source='src1' THEN 1 ELSE 0 END) AS BIGINT) AS n_src1,"
            " CAST(sum(CASE WHEN source='src2' THEN 1 ELSE 0 END) AS BIGINT) AS n_src2,"
            " CAST(sum(CASE WHEN source='src3' THEN 1 ELSE 0 END) AS BIGINT) AS n_src3"
            " FROM documents GROUP BY lang"
        ),
        "distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "grouped_quantiles": (
            "SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS q_0_5,"
            " quantile_cont(l_quantity, 0.9) AS q_0_9"
            " FROM lineitem GROUP BY l_returnflag"
        ),
        "range_join": (
            "SELECT e.event_id, p.promo_id FROM events e JOIN (VALUES"
            " ('click', TIMESTAMP '2024-01-03 00:00:00',"
            "  TIMESTAMP '2024-01-12 00:00:00', 101),"
            " ('click', TIMESTAMP '2024-01-10 12:00:00',"
            "  TIMESTAMP '2024-01-20 00:00:00', 102),"
            " ('view', TIMESTAMP '2024-01-05 00:00:00',"
            "  TIMESTAMP '2024-01-25 00:00:00', 201),"
            " ('purchase', TIMESTAMP '2024-01-01 00:00:00',"
            "  TIMESTAMP '2024-03-01 00:00:00', 301)"
            " ) p(event_type, start_ts, end_ts, promo_id)"
            " ON e.event_type = p.event_type"
            " AND e.ts BETWEEN p.start_ts AND p.end_ts"
        ),
        "join_semi": (
            "SELECT l_orderkey, l_linenumber FROM lineitem"
            " WHERE l_orderkey IN (SELECT o_orderkey FROM orders"
            " WHERE o_orderpriority='1-URGENT')"
        ),
        "join_anti": (
            "SELECT l_orderkey, l_linenumber FROM lineitem"
            " WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders"
            " WHERE o_orderpriority='1-URGENT')"
        ),
        "q3_revenue": (
            "SELECT l_orderkey,"
            " CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)"
            " AS BIGINT)) AS BIGINT) AS sum_revenue_cents"
            " FROM lineitem WHERE l_orderkey IN"
            " (SELECT o_orderkey FROM orders WHERE o_orderpriority='1-URGENT')"
            " GROUP BY l_orderkey"
            " ORDER BY sum_revenue_cents DESC, l_orderkey LIMIT 10"
        ),
        "split_assign": (
            "SELECT doc_id, CASE"
            " WHEN sk < 3865470566 THEN 'train'"
            " WHEN sk < 4080218931 THEN 'val'"
            " ELSE 'test' END AS split"
            " FROM (SELECT doc_id,"
            " (doc_id * 2654435761) % 4294967296 AS sk FROM documents)"
        ),
        "sample_weighted": (
            "SELECT doc_id, source FROM (SELECT doc_id, source,"
            " (doc_id * 2654435761) % 4294967296 AS sk FROM documents)"
            " WHERE CASE"
            " WHEN source='src0' THEN sk < 4294967296"
            " WHEN source='src1' THEN sk < 2147483648"
            " WHEN source='src2' THEN sk < 1073741824"
            " ELSE FALSE END"
        ),
        "regex_extract": (
            "SELECT doc_id, regexp_extract(text, '([0-9]+)', 1)"
            " AS first_num FROM documents"
        ),
        "string_agg": (
            "SELECT o_orderpriority,"
            " string_agg(o_orderstatus, ',' ORDER BY o_orderkey)"
            " AS agg_o_orderstatus FROM orders GROUP BY o_orderpriority"
        ),
        "union_by_name": (
            "SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars"
            " FROM documents UNION ALL"
            " SELECT doc_id, CAST(NULL AS VARCHAR) AS lang, n_chars"
            " FROM documents"
        ),
        "jsonl_roundtrip": "SELECT doc_id, lang, n_chars FROM documents",
        "csv_roundtrip": "SELECT doc_id, lang, n_chars FROM documents",
        "encode_prune": (
            "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag"
            " FROM lineitem WHERE l_orderkey >="
            " (SELECT CAST(floor(0.9 * max(l_orderkey)) AS BIGINT)"
            " FROM lineitem)"
        ),
        "dedup_embed": (
            "SELECT vec_id AS id_a, vec_id + 1000000 AS id_b"
            " FROM embeddings ORDER BY id_a"
        ),
        "dedup_incremental": (
            "WITH b AS (SELECT CAST(floor(0.6 * max(doc_id)) AS BIGINT) c1,"
            " CAST(floor(0.4 * max(doc_id)) AS BIGINT) c2 FROM documents),"
            " inc2 AS (SELECT d.* FROM documents d, b WHERE d.doc_id >= b.c2),"
            " w AS (SELECT min(doc_id) AS doc_id FROM inc2 GROUP BY text)"
            " SELECT i.doc_id, i.lang, i.n_chars FROM inc2 i"
            " JOIN w ON i.doc_id = w.doc_id"
            " WHERE NOT EXISTS (SELECT 1 FROM documents o, b"
            " WHERE o.doc_id < b.c1 AND o.text = i.text)"
        ),
        "rollup": (
            "SELECT lang, source,"
            " CAST(count(doc_id) AS BIGINT) AS count_doc_id,"
            " CAST(grouping(lang, source) AS BIGINT) AS lvl"
            " FROM documents GROUP BY ROLLUP(lang, source)"
        ),
        "term_stats": (
            "WITH words AS (SELECT doc_id,"
            " unnest(regexp_extract_all(text, '\\S+')) AS term"
            " FROM documents WHERE doc_id < 100),"
            " tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf"
            " FROM words GROUP BY doc_id, term),"
            " df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT)"
            " AS df FROM words GROUP BY term)"
            " SELECT tf.doc_id, tf.term, tf.tf, df.df"
            " FROM tf JOIN df USING (term)"
        ),
        # same integer core as term_stats plus the smoothed idf product;
        # ln arguments are built identically ((1.0+N)/(1.0+df), float64)
        # so both engines evaluate the same double expression
        "tfidf": (
            "WITH words AS (SELECT doc_id,"
            " unnest(regexp_extract_all(text, '\\S+')) AS term"
            " FROM documents WHERE doc_id < 100),"
            " tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf"
            " FROM words GROUP BY doc_id, term),"
            " df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT)"
            " AS df FROM words GROUP BY term)"
            " SELECT tf.doc_id, tf.term, tf.tf, df.df,"
            " CAST(tf.tf AS DOUBLE)"
            " * ln((1.0 + 100) / (1.0 + CAST(df.df AS DOUBLE))) AS score"
            " FROM tf JOIN df USING (term)"
        ),
        # word 8-grams via lead() — lead past the row group end is NULL and
        # NULL-concat nulls the gram, so only full windows count (matching
        # the Ray side's n_windows = max(words - n + 1, 0)); docs with no
        # grams can never be contaminated. threshold=1 -> any shared gram
        # with the eval set (doc_id < 10) drops the doc.
        "decontaminate": (
            "WITH toks AS (SELECT doc_id,"
            " unnest(regexp_extract_all(text, '\\S+')) AS term,"
            " generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS pos"
            " FROM documents),"
            " grams AS (SELECT doc_id, term"
            " || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w"
            " || ' ' || lead(term, 3) OVER w || ' ' || lead(term, 4) OVER w"
            " || ' ' || lead(term, 5) OVER w || ' ' || lead(term, 6) OVER w"
            " || ' ' || lead(term, 7) OVER w AS g"
            " FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),"
            " contaminated AS (SELECT DISTINCT grams.doc_id FROM grams"
            " JOIN (SELECT DISTINCT g FROM grams WHERE doc_id < 10"
            " AND g IS NOT NULL) evalg ON grams.g = evalg.g)"
            " SELECT * FROM documents"
            " WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)"
        ),
        # webtable_invariant: genuinely non-SQL-expressible (in-process
        # synthetic input) -> rows-only self-verifying booleans. Every
        # other query has an oracle (the wave-4 conversions live in
        # _wave4_oracles): dedup_minhash via one-hash bands (the LSH
        # result is an exact function of the signatures), ann_ivf_index
        # via probe-all (exact top-k through the persisted-index path;
        # partial-probe recall is pytest-covered, approximation quality
        # has no exact oracle).
        "ann_ivf_index": (
            "WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)"
            " SELECT e.vec_id FROM embeddings e, q"
            " ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,"
            " e.vec_id LIMIT 10"
        ),
    }
    out.update(_wave4_oracles())
    return out
