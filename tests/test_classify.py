"""End-to-end classify lifecycle on a crafted corpus: every span's
language is mentioned close to it, so a trained model must recover the
gold labels (the reference's test smoke, main.py:356-423)."""

from __future__ import annotations

import pytest

from lgid_spark.classify import build_instances, classify_documents, write_labelled_lines
from lgid_spark.fixtures import LANG_TABLE

LINES_SCHEMA = (
    "doc_id string, lineno int, tag string, span_id string, "
    "lang_name string, lang_code string, text string"
)


def _corpus():
    """6 docs; each doc discusses one language right before its span."""
    langs = [("quenya", "qya"), ("valdese", "vld"), ("molvani", "mv1")]
    rows = []
    for d in range(6):
        doc = f"doc{d}"
        name, code = langs[d % 3]
        rows += [
            (doc, 1, "O", None, None, None, f"introduction to the {name} language"),
            (doc, 2, "O", None, None, None, f"examples of {name} follow below"),
            (doc, 3, "L", "s1", name, code, "ex am ple li ne"),
            (doc, 4, "G", "s1", None, None, "gloss line here"),
            (doc, 5, "T", "s1", None, None, "the translation line"),
            (doc, 6, "O", None, None, None, "unrelated trailing text"),
        ]
    return rows


@pytest.fixture(scope="module")
def lines(spark):
    return spark.createDataFrame(_corpus(), LINES_SCHEMA)


def test_instances_shape_and_labels(spark, lines):
    inst = build_instances(spark, lines, LANG_TABLE)
    rows = inst.collect()
    assert len(rows) > 6  # multiple candidates per span
    # every span has exactly one positive candidate
    pos = [r for r in rows if r.label]
    assert len(pos) == 6
    for r in pos:
        assert r.feats["w_prev"] or r.feats["w_close"] or r.feats["in_span"]


def test_classify_end_to_end(spark, lines, tmp_path):
    best = classify_documents(spark, lines, LANG_TABLE)
    rows = best.collect()
    assert len(rows) == 6  # one winner per span
    acc = sum(1 for r in rows if r.label) / len(rows)
    assert acc == 1.0  # separable by construction
    # S8 sink: labelled lines roundtrip
    out = str(tmp_path / "labelled")
    write_labelled_lines(lines, best, out)
    back = spark.read.parquet(out)
    assert back.count() == lines.count()
    labelled = back.where("span_id is not null and pred_lang_code is not null")
    assert labelled.count() == 18  # 3 span lines × 6 docs
