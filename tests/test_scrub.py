"""Scrub operators: repetition stats, regex/PII redaction, corpus-frequency
unit dedup (line_dedup)."""

import pyarrow as pa
import ray.data

from tbl_ray.functions.scrub import (
    frequent_units,
    line_dedup,
    redact_batch,
    redact_pii,
    repetition_stats_batch,
)


# -- repetition stats -----------------------------------------------------


def test_repetition_stats_hand_case():
    t = pa.table({"text": ["a a a b", "x y z", "", "q  q"]})
    out = repetition_stats_batch(t)
    assert out.column("n_words").to_pylist() == [4, 3, 1, 3]
    assert out.column("n_distinct_words").to_pylist() == [2, 3, 1, 2]
    # "q  q" splits to ["q", "", "q"]: top unit "q" twice out of 3
    assert out.column("dup_word_frac").to_pylist() == [0.5, 0.0, 0.0, 1 / 3]
    assert out.column("top_word_frac").to_pylist() == [0.75, 1 / 3, 1.0, 2 / 3]


def test_repetition_stats_null_and_empty_batch():
    t = pa.table({"text": pa.array([None, "a"], pa.string())})
    out = repetition_stats_batch(t)
    # null -> "" -> one empty unit
    assert out.column("n_words").to_pylist() == [1, 1]
    empty = repetition_stats_batch(t.slice(0, 0))
    assert empty.num_rows == 0
    assert "top_word_frac" in empty.column_names


def test_repetition_stats_custom_sep():
    t = pa.table({"text": ["l1\nl1\nl2"]})
    out = repetition_stats_batch(t, sep="\n")
    assert out.column("n_words").to_pylist() == [3]
    assert out.column("n_distinct_words").to_pylist() == [2]


# -- redaction ------------------------------------------------------------


def test_redact_batch_counts_and_replaces():
    t = pa.table({"text": ["foo bar foo", "none here", None]})
    out = redact_batch(t, "text", r"foo", "X", "n")
    assert out.column("text").to_pylist() == ["X bar X", "none here", None]
    assert out.column("n").to_pylist() == [2, 0, None]


def test_redact_pii_presets():
    rows = [
        "mail me at jane.doe+x@example.co.uk today",
        "server 192.168.0.1 and 10.0.0.255 up",
        "call +1 555-123-4567 or 020 7946 0958",
        "clean text, no pii",
        "ssn 078-05-1120 on file",
    ]
    ds = ray.data.read_parquet  # noqa: F841  (keep import pattern visible)
    d = ray.data.from_arrow(pa.table({"text": rows}))
    out = redact_pii(d, "text").take_all()
    assert "<EMAIL>" in out[0]["text"] and "@" not in out[0]["text"]
    assert out[0]["n_pii_email"] == 1
    assert out[1]["text"].count("<IP>") == 2 and out[1]["n_pii_ipv4"] == 2
    assert "<PHONE>" in out[2]["text"] and out[2]["n_pii_phone"] >= 1
    assert out[3]["text"] == "clean text, no pii"
    assert out[3]["n_pii_email"] == 0
    # SSN redacts before the phone rule can clip it
    assert out[4]["text"] == "ssn <SSN> on file" and out[4]["n_pii_ssn"] == 1


# -- corpus-frequency unit dedup -----------------------------------------


def _multiline_docs():
    boiler = "cookie notice"
    texts = [
        f"{boiler}\nunique one\nshared line",
        f"{boiler}\nunique two\nshared line",
        "unique three",
        "",
    ]
    return pa.table({"doc_id": list(range(4)), "text": texts})


def test_frequent_units_counts():
    d = ray.data.from_arrow(_multiline_docs())
    freq = {r["unit"]: r["n"] for r in frequent_units(d, "text", "\n", 2).take_all()}
    assert freq == {"cookie notice": 2, "shared line": 2}


def test_line_dedup_removes_frequent_lines():
    d = ray.data.from_arrow(_multiline_docs())
    out = {
        r["doc_id"]: r["text"]
        for r in line_dedup(d, "text", sep="\n", min_count=2).take_all()
    }
    assert out[0] == "unique one"
    assert out[1] == "unique two"
    assert out[2] == "unique three"
    assert out[3] == ""  # the empty unit "" is unique (1 occurrence) here


def test_line_dedup_noop_when_nothing_frequent():
    t = pa.table({"doc_id": [0, 1], "text": ["a\nb", "c\nd"]})
    d = ray.data.from_arrow(t)
    out = {r["doc_id"]: r["text"] for r in line_dedup(d, "text", "\n", 2).take_all()}
    assert out == {0: "a\nb", 1: "c\nd"}


def test_line_dedup_drops_empty_unit_when_frequent():
    # doubled separators create empty units; when frequent they are
    # dropped like any other unit (matches the SQL oracle's str_split)
    t = pa.table({"doc_id": [0, 1], "text": ["a\n\nb", "c\n\nd"]})
    d = ray.data.from_arrow(t)
    out = {r["doc_id"]: r["text"] for r in line_dedup(d, "text", "\n", 2).take_all()}
    assert out == {0: "a\nb", 1: "c\nd"}
