"""Scale-regression gate: the contract's dedup/LSH queries at 10x their
bench-scale (sf0.1) input rows, on a DUPLICATE-DENSE corpus.

Round 4's lesson: ``dedup_minhash`` was oracle-green at sf0.01 and died
at sf0.1 (one LSH bucket outgrew the cap as the corpus grew). This suite
makes "correct at correctness scale, dead at 10x" unrepresentable for
the operators whose cost is superlinear in duplicate density: each
sf0.1 table is replicated 10x with shifted ids — half the copies
byte-identical (exact-duplicate crowding: the unique-collapse path),
half tail-perturbed (DISTINCT near-duplicate crowding: the tiled
pairwise path that replaced the r04 raise).

Assertions are completion + structural sanity, not value oracles (the
driver's sf0.01 contract run owns value correctness); what this gate
buys is that no bucket cap, pair budget, or driver materialization
blows up when the same configuration meets 10x the rows.
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod  # noqa: E402

SRC = "/root/testdata/sf0.1"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(SRC), reason=f"sf0.1 test fixtures not present at {SRC}"
    ),
]
COPIES = 10


@pytest.fixture(scope="module")
def sf10x(tmp_path_factory):
    out = tmp_path_factory.mktemp("sf10x")

    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    doc_parts = []
    for k in range(COPIES):
        t = docs
        ids = pc.add(t.column("doc_id"), k * 10_000_000)
        t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id", ids)
        if k % 2 == 1:
            # tail-perturbed copy: distinct text -> distinct signatures
            # crowding the same LSH buckets (the r04 crash regime)
            txt = pc.binary_join_element_wise(
                pc.fill_null(t.column("text").combine_chunks(), ""),
                f" v{k}", "",
            )
            t = t.set_column(t.schema.get_field_index("text"), "text", txt)
            t = t.set_column(
                t.schema.get_field_index("n_chars"), "n_chars",
                pc.cast(pc.utf8_length(txt), pa.int64()),
            )
        doc_parts.append(t)
    pq.write_table(pa.concat_tables(doc_parts), str(out / "documents.parquet"))

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vecs = np.stack(
        [np.asarray(v, dtype=np.float32) for v in emb.column("embedding").to_pylist()]
    )
    dim = vecs.shape[1]
    emb_parts = []
    for k in range(COPIES):
        ids = pc.add(emb.column("vec_id"), k * 10_000_000)
        v = vecs.copy()
        if k % 2 == 1:
            v[:, 0] += np.float32(k) * np.float32(1e-5)  # bit-distinct near-dups
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(v.ravel(), pa.float32()), dim
        ).cast(pa.list_(pa.float32()))
        emb_parts.append(
            pa.table({"vec_id": ids, "embedding": arr, "label": emb.column("label")})
        )
    pq.write_table(pa.concat_tables(emb_parts), str(out / "embeddings.parquet"))

    # orders feeds url_canon_dedup (3 URL variants per key): a 50k-key
    # slice x10 copies = 500k keys -> 10x the DUPLICATES-PER-CANONICAL-URL
    # density of bench scale, which is what stresses the broadcast
    # drop-set (the query itself is otherwise linear)
    orders = pq.read_table(
        os.path.join(SRC, "orders.parquet"), columns=["o_orderkey"]
    ).slice(0, 50_000)
    ord_parts = [
        pa.table({"o_orderkey": pc.add(orders.column("o_orderkey"), k * 100_000_000)})
        for k in range(COPIES)
    ]
    pq.write_table(pa.concat_tables(ord_parts), str(out / "orders.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def queries(ray_session):
    return entrymod.queries()


def _rows(res) -> int:
    if isinstance(res, pa.Table):
        return res.num_rows
    if hasattr(res, "count"):
        return res.materialize().count()
    return len(res)


def test_dedup_minhash_at_10x(queries, sf10x):
    n = _rows(queries["dedup_minhash"](sf10x))
    # every original doc has >= 4 byte-identical copies -> heavy collapse,
    # and the survivor count can never exceed the original corpus's
    # near-dedup survivors (4,763 at sf0.1) plus the perturbed variants
    assert 0 < n < COPIES * 50_000
    assert n <= 5 * 4_763 + 5_000  # exact copies collapse; tails may survive


def test_dedup_ngram_at_10x(queries, sf10x):
    n = _rows(queries["dedup_ngram"](sf10x))
    assert 0 < n <= 50_000
    # " v{k}" tails keep trigram jaccard >= 0.8 vs the original: the
    # exact-verified dedup must collapse each 10-copy family too
    assert n < 10_000


def test_simhash_at_10x(queries, sf10x):
    n = _rows(queries["simhash"](sf10x))
    assert n == COPIES * 5_000  # per-row sketch: one simhash per doc


def test_dedup_embed_at_10x(queries, sf10x):
    t = queries["dedup_embed"](sf10x)
    assert isinstance(t, pa.Table)
    # each of the 2000 vectors appears 20x (10 copies x the query's own
    # id-shifted union): at minimum every exact-identical group pairs up
    assert t.num_rows >= 2_000


def test_url_canon_dedup_at_10x(queries, sf10x):
    n = _rows(queries["url_canon_dedup"](sf10x))
    # 3 messy variants per logical page collapse to one canonical URL;
    # keys were id-shifted so distinct copies stay distinct pages
    assert 0 < n <= COPIES * 50_000 // 3 + COPIES
