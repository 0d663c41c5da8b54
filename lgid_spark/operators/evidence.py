"""Windowed mention-evidence features — the reference's feature stage
(/root/reference/lgid/features.py) re-expressed as DataFrame ops.

Covered semantics (SURVEY §2.5), with reference-exact window geometry:
  W1 window_mention   (features.py:216-231): (name,code) mentioned in a
                      line window → range join. Boundary lines are
                      INCLUDED: W-prev/W-close are [top-w, top] and
                      W-after/W-close-after are [bottom, bottom+w]
                      (features.py:78-93 passes t and b themselves).
  W2 closest_mention  (features.py:260-283): min |ref − startline| in a
                      window; ALL ties flagged (rank, not row_number).
                      Separate before ([t-w, t], ref=t) and after
                      ([b, b+w], ref=b) variants, features.py:84,95.
  W3 in_line_mention  (features.py:286-297): mention starting exactly on
                      a span line with a given tag.
  W5 span bounds      (main.py:588-589): min/max lineno per span.
  A1 frequent_mention (features.py:233-257): windowed count ≥ threshold;
                      separate W-frequent [t-w, t] / W-frequent-after
                      [b, b+w] thresholds (config.ini:31-32).
  A2 most-frequent    (features.py:248-252): thresh=None ⇒ threshold
                      becomes the max count so only argmax rows are
                      flagged (ties all flagged).
  GL doc-level        (features.py:32-54): GL-first-lines [0, w],
                      GL-last-lines [last-w, last], GL-frequent
                      (thresh 20 over the whole doc), GL-most-frequent.
  W7 adaptive         (features.py:99-112): docs with >20 candidate
                      languages or >2000 lines get extra ±500-line
                      frequent windows.

Window membership matches get_window (features.py:194-209): mentions are
keyed by startline (get_mention_by_lines, features.py:391-398), so a
mention is in [lo, hi] iff startline ∈ [lo, hi] — the written
`endline >= top` check is vacuous given that keying (endline ≥ startline
always). We filter on startline alone and document it here.

Shapes: every evidence join is an equi-join on doc_id with the
line-window range predicate as a residual filter. The span/bound side
is per-span/per-doc (≪ mentions rows but proportional to corpus size),
so join selection defaults to Catalyst/AQE — AQE broadcasts per stage
where runtime sizes justify it, and degrades to shuffle joins when the
dims outgrow the threshold at 10^6+ docs (evidence_join_strategy below
can force broadcast for cold one-shot small runs).
"""

from __future__ import annotations

from contextlib import contextmanager as _contextmanager

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# config.ini:18-33 defaults
WINDOW_SIZE = 25
CLOSE_WINDOW = 2
AFTER_WINDOW = 25
CLOSE_AFTER = 2
FREQUENT_THRESH = 6           # frequent-mention-threshold
AFTER_FREQUENT_THRESH = 6     # after-frequent-mention-threshold
ARTICLE_FREQUENT_THRESH = 20  # article-frequent-mention-threshold


_BROADCAST_DIMS = False


def _dim(df: DataFrame) -> DataFrame:
    """Join-side wrapper for the span/bound/qualifier frames — per-span
    / per-doc aggregates that grow WITH the corpus, so a forced
    broadcast OOMs the driver at 10^6+ docs. Default leaves them
    unhinted: AQE broadcasts per-stage where runtime sizes justify it
    (measured faster warm at 5k docs than forcing, and the only safe
    plan at scale — see evidence_join_strategy /
    test_build_instances_scale_path_no_forced_broadcast)."""
    return F.broadcast(df) if _BROADCAST_DIMS else df


@_contextmanager
def evidence_join_strategy(strategy: str):
    """'shuffle' (build_instances' default) leaves evidence-join
    selection to Catalyst/AQE; 'broadcast' forces dim-side broadcast —
    slightly faster for cold one-shot small-corpus runs, unsafe at
    10^6+ docs. Context-scoped: plan construction is driver-side and
    synchronous, so the module flag is safe here."""
    global _BROADCAST_DIMS
    old = _BROADCAST_DIMS
    _BROADCAST_DIMS = strategy != "shuffle"
    try:
        yield
    finally:
        _BROADCAST_DIMS = old


def span_bounds(lines: DataFrame) -> DataFrame:
    """W5: per (doc_id, span_id): first/last lineno."""
    return (
        lines.filter(F.col("span_id").isNotNull())
        .groupBy("doc_id", "span_id")
        .agg(
            F.min("lineno").alias("span_top"),
            F.max("lineno").alias("span_bottom"),
        )
    )


def doc_bounds(lines: DataFrame) -> DataFrame:
    """context['last-lineno'] (main.py:558): max lineno per doc."""
    return lines.groupBy("doc_id").agg(F.max("lineno").alias("last_lineno"))


def _window_flag(mentions: DataFrame, spans: DataFrame, lo, hi, flag: str,
                 keys=("doc_id", "span_id")) -> DataFrame:
    """W1: (doc[, span], name, code) whose mention startline ∈ [lo, hi]
    (expressions over the span/doc-bound columns of `spans`)."""
    j = mentions.join(_dim(spans), "doc_id").where(
        (F.col("startline") >= lo) & (F.col("startline") <= hi)
    )
    return (
        j.groupBy(*keys, "name", "code")
        .agg(F.lit(True).alias(flag))
    )


def window_features(mentions: DataFrame, spans: DataFrame) -> DataFrame:
    """The W-prev / W-close / W-after / W-close-after flags of
    w_features (features.py:77-93) as one wide frame. Boundary lines t
    and b are inside the windows, exactly as the reference passes them."""
    top, bottom = F.col("span_top"), F.col("span_bottom")
    flags = [
        ("w_prev", top - WINDOW_SIZE, top),
        ("w_close", top - CLOSE_WINDOW, top),
        ("w_after", bottom, bottom + AFTER_WINDOW),
        ("w_close_after", bottom, bottom + CLOSE_AFTER),
    ]
    out = None
    for flag, lo, hi in flags:
        f = _window_flag(mentions, spans, lo, hi, flag)
        out = f if out is None else out.join(
            f, ["doc_id", "span_id", "name", "code"], "full_outer")
    keys = ["doc_id", "span_id", "name", "code"]
    cols = [F.coalesce(F.col(c), F.lit(False)).alias(c)
            for c in ["w_prev", "w_close", "w_after", "w_close_after"]]
    return out.select(*keys, *cols)


def _counts_in_window(mentions: DataFrame, spans: DataFrame, lo, hi,
                      keys=("doc_id", "span_id")) -> DataFrame:
    windowed = mentions.join(_dim(spans), "doc_id").where(
        (F.col("startline") >= lo) & (F.col("startline") <= hi)
    )
    return windowed.groupBy(*keys, "name", "code").agg(
        F.count("*").alias("n_mentions"))


def _apply_thresh(counts: DataFrame, thresh: int | None,
                  keys=("doc_id", "span_id")) -> DataFrame:
    """features.py:245-255: thresh=None ⇒ becomes the max count, so only
    argmax rows are flagged (ties all flagged)."""
    if thresh is None:
        w = Window.partitionBy(*keys)
        return counts.withColumn(
            "frequent", F.col("n_mentions") == F.max("n_mentions").over(w))
    return counts.withColumn("frequent", F.col("n_mentions") >= thresh)


def frequent_mentions(
    mentions: DataFrame,
    spans: DataFrame,
    thresh: int | None = FREQUENT_THRESH,
    after: bool = False,
    window: int | None = None,
) -> DataFrame:
    """A1/A2: W-frequent over [top-w, top] (before) or W-frequent-after
    over [bottom, bottom+w] (after) — features.py:87,96-97."""
    top, bottom = F.col("span_top"), F.col("span_bottom")
    w = WINDOW_SIZE if window is None else window
    aw = AFTER_WINDOW if window is None else window
    lo, hi = (bottom, bottom + aw) if after else (top - w, top)
    return _apply_thresh(_counts_in_window(mentions, spans, lo, hi), thresh)


def doc_frequent_mentions(
    mentions: DataFrame,
    bounds: DataFrame,
    thresh: int | None = ARTICLE_FREQUENT_THRESH,
) -> DataFrame:
    """GL-frequent / GL-most-frequent (features.py:41-45): frequency over
    the whole document [0, last-lineno]. Keyed by doc only."""
    lo, hi = F.lit(0), F.col("last_lineno")
    counts = _counts_in_window(mentions, bounds, lo, hi, keys=("doc_id",))
    return _apply_thresh(counts, thresh, keys=("doc_id",))


def doc_edge_mentions(mentions: DataFrame, bounds: DataFrame,
                      last: bool = False) -> DataFrame:
    """GL-first-lines [0, wsize] / GL-last-lines [last-wsize, last]
    (features.py:35-39). Keyed by doc only."""
    if last:
        lo, hi = F.col("last_lineno") - WINDOW_SIZE, F.col("last_lineno")
    else:
        lo, hi = F.lit(0), F.lit(WINDOW_SIZE)
    flag = "gl_last_lines" if last else "gl_first_lines"
    return _window_flag(mentions, bounds, lo, hi, flag, keys=("doc_id",))


def closest_mentions(mentions: DataFrame, spans: DataFrame,
                     after: bool = False) -> DataFrame:
    """W2: among the window's mentions, flag those at minimal
    |ref − startline|; ties ALL flagged (rank==1, matching the
    reference's intended sort semantics, features.py:273-277 — the
    upstream code is a SyntaxError, SURVEY §2.11).

    before: window [top-w, top], ref=top (features.py:84);
    after:  window [bottom, bottom+w], ref=bottom (features.py:95)."""
    top, bottom = F.col("span_top"), F.col("span_bottom")
    if after:
        lo, hi, ref = bottom, bottom + AFTER_WINDOW, bottom
    else:
        lo, hi, ref = top - WINDOW_SIZE, top, top
    j = mentions.join(_dim(spans), "doc_id").where(
        (F.col("startline") >= lo) & (F.col("startline") <= hi)
    )
    dist = F.abs(ref - F.col("startline"))
    w = Window.partitionBy("doc_id", "span_id").orderBy(dist.asc())
    return (
        j.withColumn("dist", dist)
        .withColumn("rk", F.rank().over(w))
        .where(F.col("rk") == 1)
        .select("doc_id", "span_id", "name", "code", "startline", "dist")
    )


ADAPTIVE_WINDOW = 500
ADAPTIVE_MIN_LANGS = 20
ADAPTIVE_MIN_LINES = 2000


def adaptive_doc_ids(
    mentions: DataFrame,
    lines: DataFrame,
    min_langs: int = ADAPTIVE_MIN_LANGS,
    min_lines: int = ADAPTIVE_MIN_LINES,
) -> DataFrame:
    """W7 qualifying docs (features.py:99-112): >min_langs distinct
    mentioned NAMES (main.py:570 len(lang_names)) or >min_lines lines.
    Returns (doc_id, by_langs, by_lines) for qualifying docs only."""
    return (
        mentions.groupBy("doc_id")
        .agg(F.countDistinct("name").alias("n_langs"))
        .join(
            lines.groupBy("doc_id").agg(F.count("*").alias("n_lines")),
            "doc_id",
        )
        .where(
            (F.col("n_langs") > min_langs) | (F.col("n_lines") > min_lines))
        .select(
            "doc_id",
            (F.col("n_langs") > min_langs).alias("by_langs"),
            (F.col("n_lines") > min_lines).alias("by_lines"),
        )
    )


def adaptive_window_features(
    mentions: DataFrame,
    spans: DataFrame,
    lines: DataFrame,
    window: int = ADAPTIVE_WINDOW,
    min_langs: int = ADAPTIVE_MIN_LANGS,
    min_lines: int = ADAPTIVE_MIN_LINES,
    thresh: int = FREQUENT_THRESH,
    after: bool = False,
) -> DataFrame:
    """W7 (features.py:99-112): qualifying documents get an extra
    ±`window`-line FREQUENT feature (thresh = frequent-mention-threshold)
    before [top-500, top] / after [bottom, bottom+500]. Returns
    (doc_id, span_id, name, code, frequent, by_langs, by_lines) for
    qualifying docs whose count clears the threshold."""
    qual = adaptive_doc_ids(mentions, lines, min_langs, min_lines)
    m = mentions.join(_dim(qual.select("doc_id")), "doc_id")
    out = frequent_mentions(m, spans, thresh=thresh, after=after,
                            window=window)
    return out.where(F.col("frequent")).join(_dim(qual), "doc_id")


def in_line_mentions(mentions: DataFrame, lines: DataFrame, tag: str) -> DataFrame:
    """W3: mentions starting exactly on a span line carrying the given
    tag (l/g/t/m_features in_line_mention, features.py:115-193,286-297).
    Keyed per span; for per-L-line features use in_line_mentions_by_line."""
    tagged = lines.where(
        F.col("span_id").isNotNull() & F.col("tag").contains(tag)
    ).select("doc_id", "span_id", F.col("lineno").alias("startline"))
    return (
        mentions.join(tagged, ["doc_id", "startline"])
        .groupBy("doc_id", "span_id", "name", "code")
        .agg(F.count("*").alias(f"n_on_{tag.lower()}_lines"))
    )


def in_line_mentions_by_line(mentions: DataFrame, lines: DataFrame,
                             tag: str) -> DataFrame:
    """W3 at line grain: the reference computes L-in-line per L-line
    (l_features is called once per line with context['line'], main.py
    595-598), so the flag is keyed (doc, span, lineno, name, code)."""
    tagged = lines.where(
        F.col("span_id").isNotNull() & F.col("tag").contains(tag)
    ).select("doc_id", "span_id", F.col("lineno").alias("startline"))
    return (
        mentions.join(tagged, ["doc_id", "startline"])
        .groupBy(
            "doc_id", "span_id",
            F.col("startline").alias("lineno"), "name", "code")
        .agg(F.count("*").alias("n_on_line"))
    )
