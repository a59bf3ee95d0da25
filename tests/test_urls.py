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


def test_url_canonicalize_hand_cases():
    import pyarrow as pa

    from tbl_ray.functions.urls import canonicalize_batch

    cases = {
        "HTTP://WWW.Site.COM:80/A/b#frag": "http://site.com/A/b",
        "https://site.com:443/": "https://site.com/",
        "https://site.com": "https://site.com/",
        "http://site.com?utm_source=x": "http://site.com/",
        "http://site.com/p?utm_a=1&utm_b=2&utm_c=3&q=1":
            "http://site.com/p?q=1",
        "http://site.com/p?q=1&utm_a=2&utm_b=3": "http://site.com/p?q=1",
        "http://x.com/path?fbclid=1&msclkid=2&keep=3":
            "http://x.com/path?keep=3",
        "HTTPS://A.B.C:443?gclid=z&x=1#y": "https://a.b.c/?x=1",
        "ftp://Weird.Host/Path": "ftp://weird.host/Path",  # path case kept
        "relative/path?utm_a=1": "relative/path",
        "http://www.site.com:80": "http://site.com/",
        "": "",
    }
    t = pa.table({"url": pa.array(list(cases), pa.string())})
    got = canonicalize_batch(t).column("url_canon").to_pylist()
    for src, want, g in zip(cases, cases.values(), got):
        assert g == want, f"{src!r}: {g!r} != {want!r}"
    # null stays null
    t2 = pa.table({"url": pa.array([None], pa.string())})
    assert canonicalize_batch(t2).column("url_canon").to_pylist() == [None]


def test_url_canonicalize_matches_duckdb_rule_for_rule():
    # the oracle generator must replay the Arrow chain bit-for-bit:
    # fuzz 300 structured-messy URLs through both engines
    import duckdb
    import numpy as np
    import pyarrow as pa

    from tbl_ray.functions.urls import canonicalize_batch, canon_sql_expr

    rng = np.random.default_rng(42)
    schemes = ["http://", "HTTP://", "https://", "HtTpS://"]
    hosts = ["Site.com", "www.site.com", "WWW.SITE.COM", "a.b.c.d"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/p&utm_x=1"]
    queries = ["", "?q=1", "?utm_a=1", "?utm_a=1&utm_b=2&q=1",
               "?q=1&gclid=x", "?fbclid=1&msclkid=2", "?utm_a=1&utm_b=2"]
    frags = ["", "#x", "#frag?utm_a=1"]
    urls = [
        schemes[rng.integers(0, 4)] + hosts[rng.integers(0, 4)]
        + ports[rng.integers(0, 4)] + paths[rng.integers(0, 4)]
        + queries[rng.integers(0, 7)] + frags[rng.integers(0, 3)]
        for _ in range(300)
    ]
    t = pa.table({"url": pa.array(urls, pa.string())})
    got = canonicalize_batch(t).column("url_canon").to_pylist()
    con = duckdb.connect()
    con.register("u", t)
    want = [
        r[0]
        for r in con.execute(
            f"select {canon_sql_expr('url')} from u"
        ).fetchall()
    ]
    assert got == want
    # canonicalization is idempotent: a canonical URL is a fixed point
    t2 = pa.table({"url": pa.array(got, pa.string())})
    assert canonicalize_batch(t2).column("url_canon").to_pylist() == got
