"""Hand-computed expectations for the windowed evidence features
(features.py semantics; window geometry from config.ini:18-33).

Reference geometry (features.py:77-97): boundary lines are INSIDE the
windows — W-prev/W-close = [top-w, top], W-after/W-close-after =
[bottom, bottom+w]; frequent/closest have separate before/after
variants with their own windows and reference lines."""

from __future__ import annotations

import pytest

from lgid_spark.operators.evidence import (
    adaptive_window_features,
    closest_mentions,
    doc_bounds,
    doc_edge_mentions,
    doc_frequent_mentions,
    frequent_mentions,
    in_line_mentions,
    in_line_mentions_by_line,
    span_bounds,
    window_features,
)

# one doc, span s1 covering lines 30..32 (L/G/T)
LINES = (
    [("d", i, "O", None) for i in range(1, 30)]
    + [("d", 30, "L", "s1"), ("d", 31, "G", "s1"), ("d", 32, "T", "s1")]
    + [("d", i, "O", None) for i in range(33, 61)]
)

# mentions: (name, code, startline); span_top=30 span_bottom=32 →
# w_prev=[5,30] w_close=[28,30] w_after=[32,57] w_close_after=[32,34]
MENTIONS = [
    ("alpha", "aa", 5),    # w_prev only (30-25=5 .. 30)
    ("alpha", "aa", 29),   # w_prev + w_close (28..30)
    ("beta", "bb", 30),    # ON the boundary: w_prev + w_close (not after)
    ("alpha", "aa", 40),   # w_after (32..57)
    ("gamma", "gg", 33),   # w_after + w_close_after (32..34)
    ("delta", "dd", 58),   # outside every window (> 57)
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


def test_doc_bounds(spark, dfs):
    lines, _ = dfs
    assert doc_bounds(lines).collect()[0].last_lineno == 60


def test_window_features(spark, dfs):
    lines, mentions = dfs
    spans = span_bounds(lines)
    got = {
        (r.name, r.code): (r.w_prev, r.w_close, r.w_after, r.w_close_after)
        for r in window_features(mentions, spans).collect()
    }
    assert got[("alpha", "aa")] == (True, True, True, False)
    # boundary line 30 == span_top is inside the before-windows
    assert got[("beta", "bb")] == (True, True, False, False)
    assert got[("gamma", "gg")] == (False, False, True, True)
    assert ("delta", "dd") not in got  # line 58 outside all windows


def test_frequent_before_and_after(spark, dfs):
    lines, mentions = dfs
    spans = span_bounds(lines)
    # before window [5, 30]: alpha@5,29 → 2; beta@30 → 1
    counts = {
        (r.name, r.code): (r.n_mentions, r.frequent)
        for r in frequent_mentions(mentions, spans, thresh=2).collect()
    }
    assert counts[("alpha", "aa")] == (2, True)
    assert counts[("beta", "bb")] == (1, False)
    assert ("gamma", "gg") not in counts
    # after window [32, 57]: alpha@40 → 1, gamma@33 → 1
    after = {
        (r.name, r.code): (r.n_mentions, r.frequent)
        for r in frequent_mentions(mentions, spans, thresh=1, after=True).collect()
    }
    assert after == {("alpha", "aa"): (1, True), ("gamma", "gg"): (1, True)}
    # thresh=None → only argmax flagged (features.py:248-252)
    mode = {
        (r.name, r.code): r.frequent
        for r in frequent_mentions(mentions, spans, thresh=None).collect()
    }
    assert mode == {("alpha", "aa"): True, ("beta", "bb"): False}


def test_doc_level_features(spark, dfs):
    lines, mentions = dfs
    bounds = doc_bounds(lines)
    # GL-first-lines [0, 25]: alpha@4,5
    first = {(r.name, r.code) for r in doc_edge_mentions(mentions, bounds).collect()}
    assert first == {("alpha", "aa")}
    # GL-last-lines [35, 60]: alpha@40, delta@58
    last = {(r.name, r.code)
            for r in doc_edge_mentions(mentions, bounds, last=True).collect()}
    assert last == {("alpha", "aa"), ("delta", "dd")}
    # GL-frequent over [0, 60], thresh 3: alpha has 4 mentions
    freq = {
        (r.name, r.code): r.frequent
        for r in doc_frequent_mentions(mentions, bounds, thresh=3).collect()
    }
    assert freq[("alpha", "aa")] is True
    assert freq[("beta", "bb")] is False
    # GL-most-frequent (argmax): alpha only
    most = {
        (r.name, r.code): r.frequent
        for r in doc_frequent_mentions(mentions, bounds, thresh=None).collect()
    }
    assert most[("alpha", "aa")] is True
    assert most[("delta", "dd")] is False


def test_closest_ties_all_flagged(spark, dfs):
    lines, mentions = dfs
    spans = span_bounds(lines)
    got = sorted(
        (r.name, r.startline, r.dist)
        for r in closest_mentions(mentions, spans).collect()
    )
    # before: ref=top=30, window [5,30]: beta@30 → dist 0 (alpha@29 → 1)
    assert got == [("beta", 30, 0)]
    after = sorted(
        (r.name, r.startline, r.dist)
        for r in closest_mentions(mentions, spans, after=True).collect()
    )
    # after: ref=bottom=32, window [32,57]: gamma@33 → 1 (alpha@40 → 8)
    assert after == [("gamma", 33, 1)]


def test_in_line_mentions(spark, dfs):
    lines, mentions = dfs
    got = {
        (r.name, r.code): r.n_on_l_lines
        for r in in_line_mentions(mentions, lines, "L").collect()
    }
    assert got == {("beta", "bb"): 1}
    by_line = {
        (r.name, r.lineno): r.n_on_line
        for r in in_line_mentions_by_line(mentions, lines, "L").collect()
    }
    assert by_line == {("beta", 30): 1}


def test_adaptive_window_features(spark, dfs):
    lines, mentions = dfs
    spans = span_bounds(lines)
    # thresholds high → no doc qualifies → empty
    assert adaptive_window_features(mentions, spans, lines).count() == 0
    # doc 'd' has 4 distinct names, 60 lines → qualify via min_langs=3;
    # before window [top-500, top] = [-470, 30]: alpha(4,5,29)=3, beta=1
    got = {
        (r.name, r.code)
        for r in adaptive_window_features(
            mentions, spans, lines, min_langs=3, min_lines=5000,
            thresh=1).collect()
    }
    assert got == {("alpha", "aa"), ("beta", "bb")}
    # after window [32, 532]: alpha@40, gamma@33, delta@58 all inside
    after = {
        (r.name, r.code)
        for r in adaptive_window_features(
            mentions, spans, lines, min_langs=3, min_lines=5000,
            thresh=1, after=True).collect()
    }
    assert after == {("alpha", "aa"), ("gamma", "gg"), ("delta", "dd")}
    # qualification reason flags ride along
    row = adaptive_window_features(
        mentions, spans, lines, min_langs=3, min_lines=5000, thresh=1).first()
    assert row.by_langs is True and row.by_lines is False
