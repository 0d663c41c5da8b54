"""Windowed mention-evidence features — the reference's feature stage
(/root/reference/lgid/features.py) re-expressed as DataFrame ops.

Covered semantics (SURVEY §2.5):
  W1 window_mention   (features.py:216-230): (name,code) mentioned in a
                      line window relative to the span → range join
  W2 closest_mention  (features.py:260-283): min |ref − startline| in
                      window; ALL ties flagged (rank, not row_number)
  W3 in_line_mention  (features.py:286-297): mention exactly on a line
  W5 span bounds      (main.py:588-589): min/max lineno per span
  A1 frequent_mention (features.py:233-257): windowed count ≥ threshold
  A2 most-frequent    (features.py:248-252): thresh=None ⇒ only argmax
                      rows flagged (ties all flagged)

Shapes: spans and the mention table are both small relative to lines
(mentions ≪ lines rows), so every join here broadcasts the span side;
the range predicates ride on a BroadcastHashJoin over doc_id with the
line-window residual filtered after — no shuffle of the mention fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# config.ini:18-33 defaults
WINDOW_SIZE = 25
CLOSE_WINDOW = 2
AFTER_WINDOW = 25
CLOSE_AFTER = 2
FREQUENT_THRESH = 6


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


def _window_flag(mentions: DataFrame, spans: DataFrame, lo, hi, flag: str) -> DataFrame:
    """W1: (doc, span, name, code) pairs whose mention startline falls in
    [lo, hi] (expressions over span_top/span_bottom)."""
    j = mentions.join(F.broadcast(spans), "doc_id").where(
        (F.col("startline") >= lo) & (F.col("startline") <= hi)
    )
    return (
        j.groupBy("doc_id", "span_id", "name", "code")
        .agg(F.lit(True).alias(flag))
    )


def window_features(mentions: DataFrame, spans: DataFrame) -> DataFrame:
    """The W-prev / W-close / W-after / W-close-after flags of
    gl_features (features.py:77-93) as one wide frame."""
    top, bottom = F.col("span_top"), F.col("span_bottom")
    flags = [
        ("w_prev", top - WINDOW_SIZE, top - 1),
        ("w_close", top - CLOSE_WINDOW, top - 1),
        ("w_after", bottom + 1, bottom + AFTER_WINDOW),
        ("w_close_after", bottom + 1, bottom + CLOSE_AFTER),
        ("in_span", top, bottom),
    ]
    out = None
    for flag, lo, hi in flags:
        f = _window_flag(mentions, spans, lo, hi, flag)
        out = f if out is None else out.join(
            f, ["doc_id", "span_id", "name", "code"], "full_outer")
    keys = ["doc_id", "span_id", "name", "code"]
    cols = [F.coalesce(F.col(c), F.lit(False)).alias(c)
            for c in ["w_prev", "w_close", "w_after", "w_close_after", "in_span"]]
    return out.select(*keys, *cols)


def frequent_mentions(
    mentions: DataFrame,
    spans: DataFrame,
    thresh: int | None = FREQUENT_THRESH,
) -> DataFrame:
    """A1/A2: windowed mention counts per (span, name, code); flag
    count ≥ thresh, or — reference quirk — when thresh is None the
    threshold becomes the max count so only argmax rows are flagged
    (ties all flagged, features.py:248-252)."""
    top, bottom = F.col("span_top"), F.col("span_bottom")
    windowed = mentions.join(F.broadcast(spans), "doc_id").where(
        (F.col("startline") >= top - WINDOW_SIZE)
        & (F.col("startline") <= bottom + AFTER_WINDOW)
    )
    counts = windowed.groupBy("doc_id", "span_id", "name", "code").agg(
        F.count("*").alias("n_mentions")
    )
    if thresh is None:
        w = Window.partitionBy("doc_id", "span_id")
        counts = counts.withColumn("_max", F.max("n_mentions").over(w))
        return counts.select(
            "doc_id", "span_id", "name", "code", "n_mentions",
            (F.col("n_mentions") == F.col("_max")).alias("frequent"),
        )
    return counts.withColumn("frequent", F.col("n_mentions") >= thresh)


def closest_mentions(mentions: DataFrame, spans: DataFrame) -> DataFrame:
    """W2: among a span's window mentions, flag those at minimal
    |span_top − startline|; ties ALL flagged (rank==1, matching the
    reference's intended sort semantics, features.py:273-277 — the
    upstream code is a SyntaxError, SURVEY §2.11)."""
    j = mentions.join(F.broadcast(spans), "doc_id").where(
        (F.col("startline") >= F.col("span_top") - WINDOW_SIZE)
        & (F.col("startline") <= F.col("span_bottom") + AFTER_WINDOW)
    )
    dist = F.abs(F.col("span_top") - F.col("startline"))
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


def adaptive_window_features(
    mentions: DataFrame,
    spans: DataFrame,
    lines: DataFrame,
    window: int = ADAPTIVE_WINDOW,
    min_langs: int = ADAPTIVE_MIN_LANGS,
    min_lines: int = ADAPTIVE_MIN_LINES,
) -> DataFrame:
    """W7 (features.py:101-112): documents with many candidate languages
    or many lines get an extra wide-window feature (±`window` lines
    around the span). Only qualifying docs produce rows — the flag is
    conditional on per-doc stats, not a config constant."""
    doc_stats = (
        mentions.groupBy("doc_id")
        .agg(F.countDistinct("name").alias("n_langs"))
        .join(
            lines.groupBy("doc_id").agg(F.max("lineno").alias("n_lines")),
            "doc_id",
        )
        .where(
            (F.col("n_langs") > min_langs) | (F.col("n_lines") > min_lines))
        .select("doc_id")
    )
    m = mentions.join(F.broadcast(doc_stats), "doc_id")
    top, bottom = F.col("span_top"), F.col("span_bottom")
    return _window_flag(m, spans, top - window, bottom + window, "w_adaptive")


def in_line_mentions(mentions: DataFrame, lines: DataFrame, tag: str) -> DataFrame:
    """W3: mentions landing exactly on a span line with the given tag
    (l/g/t/m_features, features.py:115-193)."""
    tagged = lines.where(
        F.col("span_id").isNotNull() & F.col("tag").contains(tag)
    ).select("doc_id", "span_id", F.col("lineno").alias("startline"))
    return (
        mentions.join(tagged, ["doc_id", "startline"])
        .groupBy("doc_id", "span_id", "name", "code")
        .agg(F.count("*").alias(f"n_on_{tag.lower()}_lines"))
    )
