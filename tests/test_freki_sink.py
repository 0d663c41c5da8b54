"""S8 Freki sink: byte-stable round-trip of the reference's own sample
file, and prediction annotation parse-back (main.py:242-277 semantics)."""

from __future__ import annotations

import glob
import os

import pytest

from lgid_spark.sinks.freki_sink import (
    annotate_lines,
    freki_doc_text,
    write_freki,
    write_labelled_freki,
)
from lgid_spark.sources.freki import read_freki

SAMPLE = "/root/reference/sample/input/10.freki"


@pytest.mark.skipif(not os.path.exists(SAMPLE), reason="reference sample absent")
def test_roundtrip_byte_stable(spark, tmp_path):
    original = open(SAMPLE, encoding="utf-8").read()
    lines = read_freki(spark, SAMPLE)
    out = freki_doc_text(lines).collect()
    assert len(out) == 1
    assert out[0].freki_text == original  # byte-for-byte

    # and through the file writer
    write_freki(freki_doc_text(lines), str(tmp_path / "out"))
    back = open(tmp_path / "out" / "10.freki", encoding="utf-8").read()
    assert back == original


@pytest.mark.skipif(not os.path.exists(SAMPLE), reason="reference sample absent")
def test_roundtrip_entire_sample_corpus(spark):
    """EVERY reference sample file must serialize back byte-for-byte —
    including 16.freki, whose page-9 block has ZERO lines (`ttrt 0 0`)
    and only survives via the parser's placeholder rows."""
    files = sorted(glob.glob("/root/reference/sample/input/*.freki"))
    lines = read_freki(spark, "/root/reference/sample/input/*.freki")
    out = {r.doc_id: r.freki_text for r in freki_doc_text(lines).collect()}
    mismatched = [
        f for f in files
        if out[os.path.basename(f)[:-len(".freki")]]
        != open(f, encoding="utf-8").read()
    ]
    assert mismatched == [] and len(files) == 99


FREKI_DOC = """doc_id=d1 page=1 block_id=1-1 bbox=0,0,1,1 label=b 1 4
line=1 tag=O fonts=F0-10.0    :intro text about quenya
line=2 tag=L span_id=s1 lang_name=quenya lang_code=qya:ex am ple
line=3 tag=G span_id=s1       :gloss line
line=4 tag=L span_id=s1 lang_name=valdese lang_code=vld:another l line"""


def test_annotate_and_parse_back(spark, tmp_path):
    src = tmp_path / "in" / "d1.freki"
    src.parent.mkdir()
    src.write_text(FREKI_DOC, encoding="utf-8")
    lines = read_freki(spark, str(src))
    preds = spark.createDataFrame(
        [("d1", "s1", 2, "quenya", "qya"), ("d1", "s1", 4, "valdese", "vld")],
        "doc_id string, span_id string, lineno int, lang_name string, lang_code string",
    )
    out_dir = str(tmp_path / "out")
    write_labelled_freki(lines, preds, out_dir)
    files = glob.glob(os.path.join(out_dir, "*.freki"))
    assert files == [os.path.join(out_dir, "d1.freki")]

    back = {r.lineno: r for r in read_freki(spark, files[0]).collect()}
    # line 1 precedes every L-line → no annotation
    assert back[1].lang_name is None
    # lines 2-3: latest L-line at-or-before is line 2 → quenya (Titled)
    assert (back[2].lang_name, back[2].lang_code) == ("Quenya", "qya")
    assert (back[3].lang_name, back[3].lang_code) == ("Quenya", "qya")
    # line 4: its own L-line prediction overwrites
    assert (back[4].lang_name, back[4].lang_code) == ("Valdese", "vld")
    # non-attr content untouched
    assert back[2].text == "ex am ple"
    assert back[1].text == "intro text about quenya"


def test_annotate_lines_latest_wins(spark):
    rows = [
        ("d", 1, "O", None, None, None, "t", "line=1 tag=O ", "h"),
        ("d", 2, "L", "s1", "quenya", "qya", "t", "line=2 tag=L span_id=s1 ", "h"),
        ("d", 3, "T", "s1", None, None, "t", "line=3 tag=T span_id=s1 ", "h"),
    ]
    lines = spark.createDataFrame(
        rows,
        "doc_id string, lineno int, tag string, span_id string, "
        "lang_name string, lang_code string, text string, "
        "raw_head string, block_header string",
    )
    preds = spark.createDataFrame(
        [("d", "s1", 2, "quenya", "qya")],
        "doc_id string, span_id string, lineno int, lang_name string, lang_code string",
    )
    got = {r.lineno: r.pred_lang_name
           for r in annotate_lines(lines, preds).collect()}
    assert got == {1: None, 2: "Quenya", 3: "Quenya"}


def test_title_case_python_semantics(spark):
    """ADVICE r2: pred[0].title() (main.py:264) capitalizes after ANY
    non-letter — "ma'anyan" → "Ma'Anyan" — which initcap does not."""
    rows = [
        ("d", 1, "L", "s1", "ma'anyan", "mhy", "t",
         "line=1 tag=L span_id=s1 ", "h"),
    ]
    lines = spark.createDataFrame(
        rows,
        "doc_id string, lineno int, tag string, span_id string, "
        "lang_name string, lang_code string, text string, "
        "raw_head string, block_header string",
    )
    preds = spark.createDataFrame(
        [("d", "s1", 1, "ma'anyan", "mhy")],
        "doc_id string, span_id string, lineno int, "
        "lang_name string, lang_code string",
    )
    got = annotate_lines(lines, preds).collect()[0]
    assert got.pred_lang_name == "Ma'Anyan" == "ma'anyan".title()
    raw = annotate_lines(lines, preds, titlecase=False).collect()[0]
    assert raw.pred_lang_name == "ma'anyan"


def test_annotate_lines_duplicate_predictions_no_fanout(spark):
    """A duplicated/tied prediction row (e.g. classify outputs unioned
    across two runs) must not multiply physical lines through the left
    join — exactly one deterministic winner per (doc, span, line)."""
    rows = [
        ("d", 1, "L", "s1", "quenya", "qya", "t",
         "line=1 tag=L span_id=s1 ", "h"),
    ]
    lines = spark.createDataFrame(
        rows,
        "doc_id string, lineno int, tag string, span_id string, "
        "lang_name string, lang_code string, text string, "
        "raw_head string, block_header string",
    )
    preds = spark.createDataFrame(
        [("d", "s1", 1, "quenya", "qya"),
         ("d", "s1", 1, "quenya", "qya"),   # exact duplicate
         ("d", "s1", 1, "sindarin", "sjn")],  # tie on lineno
        "doc_id string, span_id string, lineno int, "
        "lang_name string, lang_code string",
    )
    out = annotate_lines(lines, preds).collect()
    assert len(out) == 1  # no fan-out
    # deterministic tie-break: max (lineno, name, code) → sindarin
    assert (out[0].pred_lang_name, out[0].pred_lang_code) == (
        "Sindarin", "sjn")
