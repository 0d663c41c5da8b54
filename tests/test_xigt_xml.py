"""S6 Xigt XML source: parse, tier/state filter, L-tag regex, OLAC lang."""

from __future__ import annotations

from lgid_spark.sources.xigt_xml import (
    l_lines,
    parse_xigt_doc,
    read_xigt_xml,
    synthetic_xigt_xml,
)


def test_parse_filters_and_metadata():
    rows = parse_xigt_doc("w1", synthetic_xigt_xml("w1", n_igts=2))
    # 5 items per normalized tier × 2 igts; raw tier excluded
    assert len(rows) == 10
    assert all(r[4] in ("deu", "fra") for r in rows)
    assert {r[5] for r in rows} == {"german", "french"}
    assert not any("RAW" in r[6] for r in rows)


def test_spark_source_and_l_filter(spark):
    docs = spark.createDataFrame(
        [(f"w{k}", synthetic_xigt_xml(f"w{k}", 3)) for k in range(4)],
        ["doc_id", "xml"],
    )
    lines = read_xigt_xml(spark, docs)
    assert lines.count() == 4 * 3 * 5
    lonly = l_lines(lines)
    rows = lonly.collect()
    # L and L+CR pass, G/T/B rejected (buildlms.py:85 regex)
    assert len(rows) == 4 * 3 * 2
    assert {r.tag for r in rows} == {"L", "L+CR"}


def test_lm_build_from_xml(spark):
    """End-to-end: XML → L lines → LM n-gram table (the reference's
    build-odin-lm lifecycle, SURVEY §3.3)."""
    from lgid_spark.operators.lm import build_lm_ngrams

    docs = spark.createDataFrame(
        [("w0", synthetic_xigt_xml("w0", 3))], ["doc_id", "xml"])
    corpus = l_lines(read_xigt_xml(spark, docs)).selectExpr(
        "lang_code as lang", "text")
    lm = build_lm_ngrams(corpus)
    rows = {(r.lang_code, r.gram_type, r.ngram): r["count"] for r in lm.collect()}
    assert rows[("deu", "word", "wort eins")] == 1
    # morph split breaks the dash; word grams keep it
    assert ("deu", "morph", "drei vier") in rows
