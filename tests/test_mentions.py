"""Golden tests for the mention extractor (reference test strategy:
/root/reference/test/README.md — exact-match diff of extractor output)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_dashed_word_vocabulary_fallback():
    """analyzers.py:105-117: a dashed word retries the lookup with
    dashes removed ('Kabi-ye' ↔ table name 'kabiye'), and edge dashes
    are punctuation ('Quenya-' still matches; '-Quenya' too)."""
    t = NameTable({"kabiye": ["kbp"], "quenya": ["qya"]})
    ms = find_mentions([(1, "the Kabi-ye language")], t)
    assert [(m.name, m.code) for m in ms] == [("kabiye", "kbp")]
    # span covers the dashed surface form
    assert (ms[0].startcol, ms[0].endcol) == (4, 11)
    assert [m.name for m in find_mentions([(1, "the Quenya- word")], t)] \
        == ["quenya"]
    assert [m.name for m in find_mentions([(1, "a -Quenya word")], t)] \
        == ["quenya"]


def test_leading_dash_heals_line_break():
    """analyzers.py:88: healing fires when line2 STARTS with '-', not
    only when line1 ends with one."""
    t = NameTable({"wangaaybuwan-ngiyambaa": ["wyb"]})
    ms = find_mentions(
        [(5, "spoken Wangaaybuwan"), (6, "-Ngiyambaa data")], t)
    assert [(m.name, m.startline, m.endline) for m in ms] == [
        ("wangaaybuwan-ngiyambaa", 5, 6)]
    # and the dash-removed fallback composes with healing
    t2 = NameTable({"mérenglo": ["mrg"]})
    ms2 = find_mentions([(5, "the Méren"), (6, "-glo family")], t2)
    assert [m.name for m in ms2] == ["merenglo"]


def test_dash_space_line_break_does_not_fuse():
    """ADVICE r4 parity: the reference tests the RAW line edges
    (analyzers.py:88 line1.endswith('-') / line2.startswith('-')). A
    'dash+space' line ending takes the space-join path instead, whose
    rstrip(' -') drops the dangling dash — the boundary tokens stay
    separate words."""
    t = NameTable({"quenya": ["qya"]})
    # trailing 'dash+space': NOT healed → no 'quenya' anywhere
    assert find_mentions([(1, "see Quen- "), (2, "ya and more")], t) == []
    # control: the same break without the trailing space DOES heal
    ms = find_mentions([(1, "see Quen-"), (2, "ya and more")], t)
    assert [(m.name, m.startline, m.endline) for m in ms] == [
        ("quenya", 1, 2)]
    # leading 'space+dash' on line 2 likewise does not heal
    t2 = NameTable({"wangaaybuwan-ngiyambaa": ["wyb"]})
    assert find_mentions(
        [(5, "spoken Wangaaybuwan"), (6, "  -Ngiyambaa data")], t2) == []


def test_bare_dash_boundary_chunk_is_not_glued_to_prev_word():
    """'Aer -' + 'Quenya': the reference fuses the raw strings
    (rstrip(' ')+lstrip(' ')), so the healed word is '-Quenya' — whose
    core lies wholly in line 2 — NOT 'aer-quenya'. 'quenya' is counted
    once by line 2's own iteration; multi-word matches still cross the
    boundary through the healed continuation token."""
    t = NameTable({"quenya": ["qya"], "aer quenya": ["aq"]})
    ms = find_mentions([(1, "see Aer -"), (2, "Quenya here")], t)
    got = sorted((m.name, m.startline, m.endline, m.startcol) for m in ms)
    assert got == [
        ("aer quenya", 1, 2, 4),   # crossing match, starts at 'Aer'
        ("quenya", 2, 2, 0),       # counted on line 2 only, once
    ]


def test_splice_respects_block_boundaries():
    """The reference pairs lines within one Freki block only
    (analyzers.py:80) — a dash at a block boundary must not heal."""
    t = NameTable({"mérenglo": ["mrg"]})
    same = find_mentions([(5, "the Méren-", "b1"), (6, "glo family", "b1")], t)
    assert [m.name for m in same] == ["merenglo"]
    split = find_mentions(
        [(5, "the Méren-", "b1"), (6, "glo family", "b2")], t)
    assert split == []


def test_single_longest_vocab_run_sections():
    """analyzers.py:136-186: the section is a maximal run of in-vocab
    words — two matches separated by an unmatched VOCAB word share one
    section (one survivor), while a non-vocab separator splits them."""
    t = NameTable({"even": ["eve"], "day": ["day"], "good day": ["gdd"]})
    # 'good' is in the vocabulary (word of 'good day') but no match
    # covers it alone: one section → only the longest/first survives
    ms = find_mentions([(1, "Even good day")], t, single_longest=True)
    assert [m.name for m in ms] == ["good day"]
    # non-vocab word 'nice' splits the sections → both survive
    ms2 = find_mentions([(1, "Even nice day")], t, single_longest=True)
    assert sorted(m.name for m in ms2) == ["day", "even"]


def test_mention_count_oracle_handles_messy_surface_forms(spark):
    """The DuckDB mention-count oracle must replicate the matcher's
    normalization (case, accents, edge punctuation, dash fallback) —
    raw-token equality would silently diverge on any corpus less
    sanitized than the driver fixture."""
    import duckdb
    import pandas as pd

    from lgid_spark.queries.advanced import (
        _MENTION_TABLE,
        _mention_oracle_sql,
    )
    from lgid_spark.operators.mentions import extract_mentions

    docs = pd.DataFrame({
        "doc_id": ["1", "2", "3", "4"],
        "text": [
            "we use Table, daily",       # capitalized + trailing comma
            "the tablé method",          # accented
            "a ta-ble and fast join",    # dashed + the multi-word name
            "nothing here",
        ],
    })
    lines = spark.createDataFrame(docs).select(
        "doc_id", F.lit(1).alias("lineno"), "text")
    ours = {
        (r["name"], r["code"]): r["n"]
        for r in extract_mentions(spark, lines, _MENTION_TABLE)
        .groupBy("name", "code").agg(F.count("*").alias("n")).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs)
    want = {(n, c): int(cnt)
            for n, c, cnt in con.execute(_mention_oracle_sql()).fetchall()}
    assert ours == want
    assert ours[("table", "tbl")] == 3  # all three messy forms counted
