"""Deterministic synthetic Common-Crawl-style web table (BASELINE.json
``input_hint``): columns ``(url:string, warc_ts:timestamp[us], html:binary,
text:string, lang:string)``.

Properties engineered to exercise the codec engine the way real web data
would (SURVEY.md §6):

- ``lang`` — Zipfian over 10 languages (dict/RLE territory, skewed keys for
  the partition planner);
- ``url`` — ``https://{zipf-host}/{path}`` with shared prefixes (FSST);
- ``warc_ts`` — near-monotone microsecond timestamps (frame-of-reference);
- ``text`` — natural-language-ish word stream from a per-language seeded
  vocabulary (FSST);
- ``html`` — the text wrapped in a fixed markup template, as ``binary``;
  :func:`extract_text` recovers ``text`` **byte-identically** per row — the
  per-row invariant the driver checks (BASELINE.json ``input_hint``).

Everything is a pure function of ``(seed, row index)``: the same rows come
out regardless of batch boundaries or parallelism, so test fixtures, bench
inputs and resume checks are reproducible. Generation is vectorized
(numpy index sampling + Arrow list-join for word concatenation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

LANGS = ["en", "de", "fr", "es", "zh", "ru", "ja", "pt", "it", "nl"]
_ZIPF_W = 1.0 / np.arange(1, len(LANGS) + 1) ** 1.3
_ZIPF_W /= _ZIPF_W.sum()

_SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du", "ka", "ke",
    "ki", "ko", "ku", "la", "le", "li", "lo", "lu", "ma", "me", "mi", "mo",
    "mu", "na", "ne", "ni", "no", "nu", "ra", "re", "ri", "ro", "ru", "sa",
    "se", "si", "so", "su", "ta", "te", "ti", "to", "tu", "za", "ze", "zi",
]
_VOCAB_SIZE = 512
_N_HOSTS = 1024

_HTML_PRE = b"<html><head><title>"
_HTML_MID = b"</title></head><body><p>"
_HTML_POST = b"</p><footer>crawl</footer></body></html>"


def _vocab(lang: str) -> np.ndarray:
    """Deterministic per-language vocabulary (stable across processes —
    ``zlib.crc32``, not the salted builtin ``hash``)."""
    import zlib

    rng = np.random.default_rng(zlib.crc32(f"vocab:{lang}".encode()))
    syl = np.array(_SYLLABLES)
    words = []
    for i in range(_VOCAB_SIZE):
        n_syl = 1 + int(rng.integers(1, 4))
        words.append(lang[0] + "".join(rng.choice(syl, n_syl)))
    return np.array(words, dtype=object)


_VOCABS = {lang: _vocab(lang) for lang in LANGS}

_HOSTS = np.array(
    [
        f"www{i % 7}.site-{i:04d}.{'com' if i % 3 else 'org'}"
        for i in range(_N_HOSTS)
    ],
    dtype=object,
)
_HOST_W = 1.0 / np.arange(1, _N_HOSTS + 1) ** 1.1
_HOST_W /= _HOST_W.sum()

_BASE_TS = 1_690_000_000_000_000  # microseconds


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — counter-based per-index randomness (uint64)."""
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _stream(idx: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """Independent uint64 stream per (seed, stream id, row index)."""
    with np.errstate(over="ignore"):
        return _mix(
            idx.astype(np.uint64) * np.uint64(0x2545F4914F6CDD1D)
            + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
            + np.uint64(stream)
        )


def _pick_weighted(u: np.ndarray, cum_w: np.ndarray) -> np.ndarray:
    """uint64 stream -> weighted category index (vectorized inverse CDF)."""
    unit = u.astype(np.float64) / float(2**64)
    return np.searchsorted(cum_w, unit, side="right").clip(0, len(cum_w) - 1)


_ZIPF_CUM = np.cumsum(_ZIPF_W)
_HOST_CUM = np.cumsum(_HOST_W)


def generate_batch(
    start: int, n: int, *, seed: int = 42, words_lo: int = 30, words_hi: int = 180
) -> pa.Table:
    """Rows [start, start+n) of the web table.

    Every row is a pure function of ``(seed, global index)`` — identical
    regardless of batch boundaries or parallelism (counter-based hashing,
    no sequential RNG state)."""
    idx_global = np.arange(start, start + n, dtype=np.int64)
    lang_idx = _pick_weighted(_stream(idx_global, seed, 1), _ZIPF_CUM)
    host_idx = _pick_weighted(_stream(idx_global, seed, 2), _HOST_CUM)
    span = words_hi - words_lo
    n_words = (words_lo + _stream(idx_global, seed, 3) % np.uint64(span)).astype(
        np.int64
    )

    # text: per-word index stream mix(row_key, word_j), joined via Arrow
    offsets = np.concatenate(([0], np.cumsum(n_words)))
    total_words = int(offsets[-1])
    word_row = np.repeat(idx_global, n_words)
    word_j = np.arange(total_words, dtype=np.int64) - np.repeat(
        offsets[:-1], n_words
    )
    with np.errstate(over="ignore"):
        word_idx = (
            _mix(
                _stream(word_row, seed, 4)
                + word_j.astype(np.uint64) * np.uint64(0xD1342543DE82EF95)
            )
            % np.uint64(_VOCAB_SIZE)
        ).astype(np.int64)
    flat_words = np.empty(total_words, dtype=object)
    word_lang = np.repeat(lang_idx, n_words)
    for li, lang in enumerate(LANGS):
        sel = word_lang == li
        if sel.any():
            flat_words[sel] = _VOCABS[lang][word_idx[sel]]
    word_arr = pa.array(flat_words, type=pa.string())
    list_arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), word_arr
    )
    text = pc.binary_join(list_arr, " ")

    # url: zipf host + deterministic path
    paths = pa.array(
        [f"/p/{i % 1000}/doc-{i}.html" for i in idx_global], type=pa.string()
    )
    urls = pc.binary_join_element_wise(
        pa.array(["https://"] * n),
        pa.array(_HOSTS[host_idx], type=pa.string()),
        paths,
        "",
    )

    # warc_ts: near-monotone in global row order with small jitter
    jitter = (_stream(idx_global, seed, 5) % np.uint64(900_000)).astype(np.int64)
    ts = _BASE_TS + idx_global * 1_000_000 + jitter
    warc_ts = pa.array(ts, type=pa.int64()).cast(pa.timestamp("us"))

    # html: fixed template around the text; extract_text inverts exactly
    titles = pa.array([f"page {i}" for i in idx_global], type=pa.string())
    html = pc.binary_join_element_wise(
        pa.array([_HTML_PRE] * n, type=pa.binary()),
        titles.cast(pa.binary()),
        pa.array([_HTML_MID] * n, type=pa.binary()),
        text.cast(pa.binary()),
        pa.array([_HTML_POST] * n, type=pa.binary()),
        b"",
    )

    return pa.Table.from_arrays(
        [
            urls,
            warc_ts,
            html,
            text,
            pa.array(np.array(LANGS, dtype=object)[lang_idx], type=pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


def extract_text(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Recover the byte-identical ``text`` from ``html`` (vectorized regex).

    The per-row invariant checked against the source table:
    ``extract_text(html) == text`` for every ``url``. Robust to real-crawl
    junk: rows that are not valid UTF-8 extract as null (fast path is a
    single cast; the per-row repair only runs when a batch actually
    contains junk)."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    try:
        as_str = html.cast(pa.string())
    except pa.ArrowInvalid:
        repaired = [
            None
            if v is None
            else (v.decode("utf-8") if _is_utf8(v) else None)
            for v in html.to_pylist()
        ]
        as_str = pa.array(repaired, type=pa.string())
    hit = pc.extract_regex(as_str, r"(?s)<p>(?P<t>.*)</p>")
    return pc.struct_field(hit, "t")


def _is_utf8(b: bytes) -> bool:
    try:
        b.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


def webtable_dataset(
    n_rows: int,
    *,
    seed: int = 42,
    batch_rows: int = 20_000,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """A lazy, distributed web-table Dataset (generation inside map tasks)."""
    starts = list(range(0, n_rows, batch_rows))

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for s in batch.column("start").to_pylist():
            out.append(
                generate_batch(s, min(batch_rows, n_rows - s), seed=seed)
            )
        return pa.concat_tables(out)

    ds = ray.data.from_arrow(
        pa.table({"start": pa.array(starts, type=pa.int64())})
    ).repartition(len(starts))
    return ds.map_batches(
        gen, batch_format="pyarrow", batch_size=1, concurrency=concurrency
    )


def write_webtable(
    out_dir: str,
    n_rows: int,
    *,
    seed: int = 42,
    batch_rows: int = 20_000,
    files: int | None = None,
) -> list[str]:
    """Materialize the web table to parquet shards; returns sorted paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n_files = files or max(1, n_rows // (batch_rows * 4))
    rows_per_file = (n_rows + n_files - 1) // n_files
    paths = []
    for fi in range(n_files):
        lo = fi * rows_per_file
        hi = min(lo + rows_per_file, n_rows)
        if lo >= hi:
            break
        path = os.path.join(out_dir, f"webtable-{fi:05d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue  # deterministic content — existing shard is identical
        writer = None
        try:
            for s in range(lo, hi, batch_rows):
                t = generate_batch(s, min(batch_rows, hi - s), seed=seed)
                if writer is None:
                    writer = pq.ParquetWriter(path + "_tmp", t.schema, compression="snappy")
                writer.write_table(t)
        finally:
            if writer is not None:
                writer.close()
        os.replace(path + "_tmp", path)
    return sorted(paths)
