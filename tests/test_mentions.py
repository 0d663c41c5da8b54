"""Golden tests for the mention extractor (reference test strategy:
/root/reference/test/README.md — exact-match diff of extractor output)."""

from __future__ import annotations

import pytest

from lgid_spark.fixtures import LANG_TABLE, doc_lines, lines_rows
from lgid_spark.operators.mentions import (
    NameTable,
    extract_mentions,
    find_mentions,
    mentions_oracle,
    normalize_name,
)

TABLE = NameTable(LANG_TABLE)


def _doc(doc_id):
    return doc_lines()[doc_id]


def test_normalize_name():
    assert normalize_name("Mérenglo") == "merenglo"
    assert normalize_name("Sorbex (Eastern)") == "sorbex"
    assert normalize_name("  Upper   North\tTokri ") == "upper north tokri"


def test_multi_code_fanout():
    ms = find_mentions([(1, "The speakers of Tokri live north of the river.")], TABLE)
    assert len(ms) == 7  # one mention per code
    assert sorted(m.code for m in ms) == ["tk1", "tk2", "tk3", "tk4", "tk5", "tk6", "tk7"]
    assert {m.name for m in ms} == {"tokri"}
    m = ms[0]
    assert (m.startline, m.startcol, m.endline, m.endcol) == (1, 16, 1, 21)


def test_multiword_and_overlaps():
    ms = find_mentions([(2, "Upper North Tokri is a dialect of North Tokri.")], TABLE)
    names = sorted(m.name for m in ms)
    # without single_longest, all embedded names fire:
    # upper north tokri, north tokri(×2 occurrences), tokri(×2 occ ×7 codes)
    assert names.count("upper north tokri") == 1
    assert names.count("north tokri") == 2
    assert names.count("tokri") == 14


def test_single_longest_mention():
    ms = find_mentions(
        [(2, "Upper North Tokri is a dialect of North Tokri.")],
        TABLE,
        single_longest=True,
    )
    got = sorted((m.name, m.startcol) for m in ms)
    # first tokens consumed by the longest match; second occurrence keeps
    # its own longest (north tokri)
    assert got == [("north tokri", 34), ("upper north tokri", 0)]


def test_cross_line_dash_healing():
    ms = find_mentions([(5, "We also consider the Méren-"), (6, "glo language family.")], TABLE)
    assert len(ms) == 1
    m = ms[0]
    assert m.name == "merenglo"
    assert (m.startline, m.endline) == (5, 6)
    assert m.startcol == 21


def test_diacritic_insensitive_match():
    ms = find_mentions([(7, "The merenglo verb system is rich.")], TABLE)
    assert [m.name for m in ms] == ["merenglo"]


def test_short_names_with_punctuation():
    ms = find_mentions([(8, "Examples from Ik, Aer: and Quenya (above).")], TABLE)
    assert sorted(m.name for m in ms) == ["aer", "ik", "quenya"]


def test_case_insensitive():
    ms = find_mentions([(1, "Valdese valdese VALDESE")], TABLE)
    assert len(ms) == 3


def test_wholly_in_line2_not_double_counted():
    # 'quenya' on line 2 is emitted exactly once (by its own line's
    # iteration), never a second time by the (1,2) splice
    # (analyzers.py:272-273 semantics)
    ms = find_mentions([(1, "nothing here"), (2, "Quenya again")], TABLE)
    assert [(m.name, m.startline) for m in ms] == [("quenya", 2)]


@pytest.mark.parametrize("single_longest", [False, True])
def test_spark_matches_oracle(spark, single_longest):
    lines_df = spark.createDataFrame(lines_rows(), ["doc_id", "lineno", "text"])
    got = sorted(
        tuple(r)
        for r in extract_mentions(
            spark, lines_df, LANG_TABLE, single_longest).collect()
    )
    want = mentions_oracle(doc_lines(), LANG_TABLE, single_longest)
    assert got == [tuple(w) for w in want]
    assert len(got) > 10


def test_title_case_mode():
    # P6: capitalization='title' only matches title-cased surfaces
    ms_any = find_mentions([(1, "Valdese valdese VALDESE")], TABLE)
    ms_title = find_mentions(
        [(1, "Valdese valdese VALDESE")], TABLE, capitalization="title")
    assert len(ms_any) == 3
    # 'Valdese' and 'VALDESE' have an uppercase first letter; 'valdese' not
    assert len(ms_title) == 2
    multi = find_mentions(
        [(1, "Upper North Tokri vs upper north tokri")],
        TABLE, capitalization="title")
    assert sorted({m.name for m in multi}) == [
        "north tokri", "tokri", "upper north tokri"]
    assert len([m for m in multi if m.name == "tokri"]) == 7  # only cap'd
