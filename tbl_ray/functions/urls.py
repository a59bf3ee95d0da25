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


# ---------------------------------------------------------------------------
# URL canonicalization — the normalize-before-dedup step of a web-crawl
# pipeline: the same page is fetched as HTTP://WWW.Site.com:80/a#top and
# http://site.com/a?utm_source=x, and exact URL dedup only works after
# both collapse to one canonical form.
#
# The whole transform is a chain of RE2 substitutions shared VERBATIM
# with the DuckDB oracle (`canon_sql_expr` folds the same rules into
# nested regexp_replace calls), so canonicalization is value-checkable
# end to end.  Known approximation, documented: a literal '&utm_...='
# inside the PATH would also be stripped (RE2 has no lookbehind to pin
# the match after '?'); tracker runs longer than 3 consecutive params
# survive (the fixpoint is unrolled 3x — global regex replacement does
# not rescan rewritten text).
# ---------------------------------------------------------------------------

_TRACKER = r"(?:utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid)"

# (pattern, replacement), applied in order, each with GLOBAL replacement
# (pyarrow replace_substring_regex semantics == DuckDB 'g' flag)
CANON_RULES: list[tuple[str, str]] = (
    [
        (r"#.*$", ""),  # fragment never reaches the server
        (r"^(https?://)www\.", r"\1"),  # host-alias collapse
        (r"^(http://[^/?#:]*):80([/?#].*)?$", r"\1\2"),  # default ports
        (r"^(https://[^/?#:]*):443([/?#].*)?$", r"\1\2"),
    ]
    # tracker params: leading-with-successor keeps '?', '&'-prefixed
    # drops outright, lone leading drops with its '?'; unrolled 3x
    # because global replacement never rescans its own rewrites
    + [
        rule
        for _ in range(3)
        for rule in [
            (r"\?" + _TRACKER + r"=[^&#]*&", "?"),
            (r"&" + _TRACKER + r"=[^&#]*", ""),
            (r"\?" + _TRACKER + r"=[^&#]*$", ""),
        ]
    ]
    + [
        (r"\?$", ""),  # empty query left over
        (r"^(https?://[^/?#]*)\?", r"\1/?"),  # host?query -> host/?query
        (r"^(https?://[^/?#]*)$", r"\1/"),  # bare host -> host/
    ]
)

# scheme://host prefix (lowered as a unit; RFC 3986 says both are
# case-insensitive, path/query are not)
_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"


def canonicalize_batch(t: pa.Table, url_col: str = "url",
                       out_col: str = "url_canon") -> pa.Table:
    """Append ``out_col`` = canonical form of ``url_col``; vectorized
    RE2 kernels only."""
    u = t.column(url_col)
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    pref = _extract(u, _PREFIX_RE)
    rest = pc.replace_substring_regex(u, pattern=_PREFIX_RE, replacement="")
    lowered = pc.binary_join_element_wise(pc.utf8_lower(pref), rest, "")
    cur = pc.if_else(pc.equal(pref, ""), u, lowered)
    for pat, rep in CANON_RULES:
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=rep)
    return t.append_column(out_col, cur)


def url_canonicalize(
    ds: "ray.data.Dataset", url_col: str = "url", out_col: str = "url_canon"
) -> "ray.data.Dataset":
    def fn(t: pa.Table) -> pa.Table:
        return canonicalize_batch(t, url_col=url_col, out_col=out_col)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def canon_sql_expr(col: str) -> str:
    """The DuckDB expression computing EXACTLY ``canonicalize_batch``:
    the same prefix-lowering and the same ``CANON_RULES`` folded into
    nested ``regexp_replace(..., 'g')`` calls (both engines are RE2)."""

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    pref = f"regexp_extract({col}, {lit(_PREFIX_RE)}, 1)"
    lowered = (
        f"lower({pref}) || regexp_replace({col}, {lit(_PREFIX_RE)}, '')"
    )
    expr = f"CASE WHEN {pref} = '' THEN {col} ELSE {lowered} END"
    for pat, rep in CANON_RULES:
        expr = f"regexp_replace({expr}, {lit(pat)}, {lit(rep)}, 'g')"
    return expr
