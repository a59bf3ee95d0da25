"""URL analysis operators — the per-page keys a Common-Crawl-style
pipeline groups, caps, and dedups by (the north-rule web table is keyed
``url``). All vectorized ``pyarrow.compute`` RE2 kernels, the same regex
engine DuckDB uses, so every extraction is oracle-checkable verbatim.

Typical composition: ``url_parts`` then per-domain caps via
``tbl_ray.stages.slicing.grouped_topn(ds, ["domain"], n)`` or salted
partitioning via ``tbl_ray.stages.partition`` (domain keys are Zipf —
never hash-partition them unsalted).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# RE2 (shared verbatim with the DuckDB oracles; group 1 = the value)
SCHEME_RE = r"^([a-z][a-z0-9+.\-]*)://"
HOST_RE = r"^[a-z][a-z0-9+.\-]*://([^/?#]+)"
PATH_RE = r"^[a-z][a-z0-9+.\-]*://[^/?#]*([^?#]*)"
DOMAIN_RE = r"([^.]+\.[^.]+)$"  # registrable-domain approximation


def _group1_to_named(pattern: str) -> str:
    """Rewrite the first CAPTURING '(' to '(?P<g>' — Arrow wants named
    groups, DuckDB numbered ones. A single left-to-right scan tracks
    escapes AND character classes, so '\\(' (escaped literal), '[(]'
    (bracketed literal) and '(?' (non-capturing/lookaround) are all
    skipped — a '(' inside a class is a plain character in RE2."""
    i = 0
    n = len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\":
            i += 2  # escaped char: skip it wholesale (also inside a class)
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            # ']' immediately after '[' or '[^' is a literal member
            if pattern.startswith("^", i + 1):
                i += 1
            if pattern.startswith("]", i + 1):
                i += 1
            i += 1
            continue
        if c == "(" and not pattern.startswith("(?", i):
            return pattern[:i] + "(?P<g>" + pattern[i + 1 :]
        i += 1
    raise ValueError(
        f"pattern has no capture group (group 1 required): {pattern!r}"
    )


def _extract(col, pattern: str):
    """Group-1 extraction with DuckDB ``regexp_extract`` semantics:
    no-match -> '', null input -> null."""
    named = _group1_to_named(pattern)
    got = pc.struct_field(pc.extract_regex(col, named), "g")
    return pc.if_else(pc.is_null(col), col, pc.fill_null(got, ""))


def url_parts_batch(t: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``scheme``, ``host``, ``path``, ``domain`` (last two host
    labels) and ``path_depth`` (number of '/' in the path)."""
    col = t.column(url_col)
    host = _extract(col, HOST_RE)
    path = _extract(col, PATH_RE)
    out = t.append_column("scheme", _extract(col, SCHEME_RE))
    out = out.append_column("host", host)
    out = out.append_column("path", path)
    out = out.append_column("domain", _extract(host, DOMAIN_RE))
    out = out.append_column(
        "path_depth", pc.cast(pc.count_substring(path, "/"), pa.int64())
    )
    return out


def url_parts(ds: "ray.data.Dataset", url_col: str = "url") -> "ray.data.Dataset":
    def fn(t: pa.Table) -> pa.Table:
        return url_parts_batch(t, url_col=url_col)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
