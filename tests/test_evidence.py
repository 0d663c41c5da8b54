"""Hand-computed expectations for the windowed evidence features
(features.py semantics; window geometry from config.ini:18-33)."""

from __future__ import annotations

import pytest

from lgid_spark.operators.evidence import (
    closest_mentions,
    frequent_mentions,
    in_line_mentions,
    span_bounds,
    window_features,
)

# one doc, span s1 covering lines 30..32 (L/G/T)
LINES = (
    [("d", i, "O", None) for i in range(1, 30)]
    + [("d", 30, "L", "s1"), ("d", 31, "G", "s1"), ("d", 32, "T", "s1")]
    + [("d", i, "O", None) for i in range(33, 61)]
)

# mentions: (name, code, startline)
MENTIONS = [
    ("alpha", "aa", 5),    # w_prev only (30-25=5 .. 29)
    ("alpha", "aa", 29),   # w_prev + w_close (28..29)
    ("beta", "bb", 30),    # in_span, on the L line
    ("alpha", "aa", 40),   # w_after (33..57)
    ("gamma", "gg", 33),   # w_after + w_close_after (33..34)
    ("delta", "dd", 58),   # outside every window
    ("alpha", "aa", 4),    # outside w_prev (< top-25)
]


@pytest.fixture(scope="module")
def dfs(spark):
    lines = spark.createDataFrame(LINES, "doc_id string, lineno int, tag string, span_id string")
    mentions = spark.createDataFrame(
        [("d", s, 0, s, 5, n, c, n) for (n, c, s) in MENTIONS],
        "doc_id string, startline int, startcol int, endline int, endcol int, name string, code string, text string",
    )
    return lines, mentions


def test_span_bounds(spark, dfs):
    lines, _ = dfs
    rows = span_bounds(lines).collect()
    assert [(r.span_id, r.span_top, r.span_bottom) for r in rows] == [("s1", 30, 32)]


def test_window_features(spark, dfs):
    lines, mentions = dfs
    spans = span_bounds(lines)
    got = {
        (r.name, r.code): (r.w_prev, r.w_close, r.w_after, r.w_close_after, r.in_span)
        for r in window_features(mentions, spans).collect()
    }
    assert got[("alpha", "aa")] == (True, True, True, False, False)
    assert got[("beta", "bb")] == (False, False, False, False, True)
    assert got[("gamma", "gg")] == (False, False, True, True, False)
    assert ("delta", "dd") not in got  # line 58 outside all windows


def test_frequent_and_mode(spark, dfs):
    lines, mentions = dfs
    spans = span_bounds(lines)
    counts = {
        (r.name, r.code): (r.n_mentions, r.frequent)
        for r in frequent_mentions(mentions, spans, thresh=3).collect()
    }
    # alpha in window [5..57]: lines 5, 29, 40 → 3 (line 4 outside)
    assert counts[("alpha", "aa")] == (3, True)
    assert counts[("beta", "bb")] == (1, False)
    # thresh=None → only argmax flagged
    mode = {
        (r.name, r.code): r.frequent
        for r in frequent_mentions(mentions, spans, thresh=None).collect()
    }
    assert mode[("alpha", "aa")] is True
    assert mode[("beta", "bb")] is False
    assert mode[("gamma", "gg")] is False


def test_closest_ties_all_flagged(spark, dfs):
    lines, mentions = dfs
    spans = span_bounds(lines)
    got = sorted(
        (r.name, r.startline, r.dist)
        for r in closest_mentions(mentions, spans).collect()
    )
    # distances to span_top=30: alpha@29 → 1, beta@30 → 0 (closest)
    assert got == [("beta", 30, 0)]


def test_in_line_mentions(spark, dfs):
    lines, mentions = dfs
    got = {
        (r.name, r.code): r.n_on_l_lines
        for r in in_line_mentions(mentions, lines, "L").collect()
    }
    assert got == {("beta", "bb"): 1}


def test_adaptive_window_features(spark, dfs):
    from lgid_spark.operators.evidence import adaptive_window_features

    lines, mentions = dfs
    spans = span_bounds(lines)
    # thresholds high → no doc qualifies → empty
    assert adaptive_window_features(mentions, spans, lines).count() == 0
    # lower thresholds: doc 'd' has 4 distinct names and 60 lines
    got = {
        (r.name, r.code)
        for r in adaptive_window_features(
            mentions, spans, lines, window=500,
            min_langs=3, min_lines=50).collect()
    }
    # every mention (incl. line 58, outside normal windows) is in ±500
    assert ("delta", "dd") in got and ("alpha", "aa") in got
