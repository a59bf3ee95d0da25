"""Property tests: chunking reassembles exactly and packs preserve every
document, over arbitrary unicode payloads."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from tbl_ray.functions.chunking import chunk_fixed_batch, pack_sequences_batch

texts = st.lists(st.text(max_size=120), min_size=0, max_size=30)
sizes = st.integers(min_value=1, max_value=50)


@settings(max_examples=60, deadline=None)
@given(texts=texts, size=sizes)
def test_chunk_reassembles_and_bounds(texts, size):
    t = pa.table(
        {"doc_id": list(range(len(texts))), "text": pa.array(texts, pa.string())}
    )
    out = chunk_fixed_batch(t, size=size)
    parts: dict[int, list[tuple[int, str]]] = {}
    for r in out.to_pylist():
        parts.setdefault(r["doc_id"], []).append((r["chunk_id"], r["text"]))
    assert set(parts) == set(range(len(texts)))
    for i, text in enumerate(texts):
        ordered = [c for _, c in sorted(parts[i])]
        assert "".join(ordered) == text  # exact reassembly (codepoints)
        assert all(len(c) <= size for c in ordered)
        # every chunk except the last is full
        assert all(len(c) == size for c in ordered[:-1])
        assert len(ordered) == max(-(-len(text) // size), 1)


@settings(max_examples=60, deadline=None)
@given(texts=texts, budget=st.integers(min_value=1, max_value=40))
def test_pack_preserves_docs_and_budget(texts, budget):
    t = pa.table(
        {"doc_id": list(range(len(texts))), "text": pa.array(texts, pa.string())}
    )
    out = pack_sequences_batch(t, max_tokens=budget, sep="␞")
    rows = out.to_pylist()
    assert sum(r["n_docs"] for r in rows) == len(texts)
    # budget respected unless a single doc exceeds it alone
    assert all(r["n_tokens"] <= budget or r["n_docs"] == 1 for r in rows)
    # greedy: a sequence only ends when the next doc would not fit
    toks = [r["n_tokens"] for r in rows]
    docs_per = [r["n_docs"] for r in rows]
    idx = 0
    import pyarrow.compute as pc

    doc_toks = pc.count_substring_regex(
        pc.fill_null(t.column("text"), ""), r"\S+"
    ).to_pylist()
    for s, (nt, nd) in enumerate(zip(toks, docs_per)):
        idx += nd
        if idx < len(texts):
            assert nt + doc_toks[idx] > budget  # next doc would overflow
    # sep-joined reassembly preserves every document's text (only
    # meaningful when no doc contains the separator itself)
    if all("␞" not in x for x in texts):
        joined = "␞".join(r["text"] for r in rows).split("␞") if rows else []
        assert joined == list(texts) or (not texts and joined == [])
