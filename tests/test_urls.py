"""URL analysis operators."""
import pyarrow as pa
import ray.data

from tbl_ray.functions.urls import url_parts, url_parts_batch


def test_url_parts_hand_cases():
    t = pa.table({"url": [
        "https://www.example.co.uk/a/b/c?q=1#f",
        "http://sub.domain.org",
        "not a url",
        None,
    ]})
    out = url_parts_batch(t).to_pylist()
    assert out[0]["scheme"] == "https"
    assert out[0]["host"] == "www.example.co.uk"
    assert out[0]["path"] == "/a/b/c"
    assert out[0]["domain"] == "co.uk"
    assert out[0]["path_depth"] == 3
    assert out[1]["path"] == "" and out[1]["path_depth"] == 0
    assert out[1]["domain"] == "domain.org"
    # DuckDB regexp_extract semantics: no-match '', null input null
    assert out[2]["host"] == "" and out[2]["domain"] == ""
    assert out[3]["host"] is None and out[3]["path_depth"] is None


def test_url_parts_dataset_and_domain_cap(sf_dir):
    import pyarrow.compute as pc

    from tbl_ray.stages.slicing import grouped_topn

    def build(t):
        url = pc.binary_join_element_wise(
            "https://", t.column("source").combine_chunks().cast(pa.string()),
            ".example.com/docs/", pc.cast(t.column("doc_id"), pa.string()), "",
        )
        return pa.table({"doc_id": t.column("doc_id"), "url": url})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet").map_batches(
        build, batch_format="pyarrow"
    )
    parts = url_parts(ds)
    capped = grouped_topn(parts, "domain", ["doc_id"], 3)
    rows = capped.take_all()
    from collections import Counter
    per = Counter(r["domain"] for r in rows)
    assert per and all(v <= 3 for v in per.values())
