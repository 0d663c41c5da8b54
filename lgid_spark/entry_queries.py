"""Aggregated driver contract: flagship + the full query registry."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import quality_pipeline
from .queries import build_registry

QUERIES, ORACLE_SQL = build_registry()


def documents_as_web_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's `documents` table to the web_pages input shape
    (url, warc_ts, html, text, lang) so the north-rule pipeline can run
    over driver-provided data."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # html-escape the interpolated text like datagen.html_for does
    # (html.escape semantics: & first, then <>"') — a document
    # containing 'a < b & c' must not produce malformed markup whose
    # extracted_text silently disagrees with the text column
    esc = F.col("text")
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                     ('"', "&quot;"), ("'", "&#x27;")):
        esc = F.replace(esc, F.lit(raw), F.lit(ent))
    return docs.select(
        F.concat(F.lit("https://docs.example/"), F.col("source"), F.lit("/"), F.col("doc_id"))
        .alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>doc</title></head><body><p>"),
                esc,
                F.lit("</p></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule pipeline over web pages built from the documents table:
    langid + perplexity + quality rules + scrub → labelled rows."""
    pages = documents_as_web_pages(spark, sf_dir)
    out = quality_pipeline(spark, pages)
    return out.select(
        "url", "bucket", "lang", "lang_pred", "langid_conf", "ppl",
        "n_chars", "n_words", "stopword_ratio", "repetition_ratio",
        F.concat_ws(",", "drop_reasons").alias("drop_reasons_csv"),
        "keep",
    )


def _pipeline_keep_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: keep/drop histogram of the flagship pipeline."""
    out = flagship(spark, sf_dir)
    return (
        out.groupBy("keep", "drop_reasons_csv")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("drop_reasons_csv"))
    )


def _pipeline_webpages_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: full pipeline over the deterministic synthetic
    web_pages generator (exercises html extraction + scrub end-to-end)."""
    from .datagen import spark_web_pages

    out = quality_pipeline(spark, spark_web_pages(spark, 500))
    return out.groupBy("lang_pred", "keep").agg(
        F.count("*").alias("n"),
        F.round(F.avg("ppl"), 2).alias("mean_ppl"),
    )


def _pipeline_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 composed production shape: dup-saturated synthetic
    corpus → canonical-url exact dedup → quality pipeline, with the
    collapse counts surviving into the output (dup_count). Golden
    VALUES oracle (input-independent deterministic generator)."""
    from .datagen import spark_web_pages_with_dups
    from .pipeline import exact_dedup_pages

    pages = spark_web_pages_with_dups(spark, 400)
    out = quality_pipeline(
        spark, exact_dedup_pages(pages, 16),
        emit_extracted=False, emit_scrubbed=False,
        extra_cols=("dup_count",))
    return (
        out.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("dup_count") - 1).alias("dedup_dropped"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
        )
        .orderBy("lang")
    )


QUERIES["pipeline_keep_stats"] = _pipeline_keep_stats
QUERIES["pipeline_webpages_synthetic"] = _pipeline_webpages_synthetic
QUERIES["pipeline_dedup_stats"] = _pipeline_dedup_stats

# pipeline_webpages_synthetic is input-independent (deterministic
# generator, 500 docs) → golden VALUES oracle; the aggregates are counts
# and 2-decimal means, robust to float summation order.
ORACLE_SQL["pipeline_webpages_synthetic"] = """
SELECT * FROM (VALUES
  ('fra', true,  CAST(78 AS BIGINT), CAST(19678.44 AS DOUBLE)),
  ('spa', true,  CAST(77 AS BIGINT), CAST(19888.35 AS DOUBLE)),
  ('tok', false, CAST(22 AS BIGINT), CAST(35633.67 AS DOUBLE)),
  ('deu', false, CAST(21 AS BIGINT), CAST(21545.57 AS DOUBLE)),
  ('tok', true,  CAST(92 AS BIGINT), CAST(18983.81 AS DOUBLE)),
  ('eng', false, CAST(20 AS BIGINT), CAST(20709.96 AS DOUBLE)),
  ('spa', false, CAST(26 AS BIGINT), CAST(26351.89 AS DOUBLE)),
  ('eng', true,  CAST(74 AS BIGINT), CAST(21622.23 AS DOUBLE)),
  ('fra', false, CAST(35 AS BIGINT), CAST(103243.31 AS DOUBLE)),
  ('deu', true,  CAST(55 AS BIGINT), CAST(21394.74 AS DOUBLE))
) AS t(lang_pred, keep, n, mean_ppl)
"""

# pipeline_dedup_stats is input-independent (deterministic dup-bearing
# 400-doc generator) → golden VALUES oracle; counts only, so the values
# are partitioning-invariant and the first-occurrence winner rule is a
# total order (min (warc_ts, url, …)).
ORACLE_SQL["pipeline_dedup_stats"] = """
SELECT * FROM (VALUES
  ('deu', CAST(61 AS BIGINT), CAST(13 AS BIGINT), CAST(45 AS BIGINT)),
  ('eng', CAST(75 AS BIGINT), CAST(18 AS BIGINT), CAST(57 AS BIGINT)),
  ('fra', CAST(82 AS BIGINT), CAST(22 AS BIGINT), CAST(60 AS BIGINT)),
  ('spa', CAST(87 AS BIGINT), CAST(25 AS BIGINT), CAST(64 AS BIGINT)),
  ('tok', CAST(95 AS BIGINT), CAST(22 AS BIGINT), CAST(75 AS BIGINT))
) AS t(lang, n_docs, dedup_dropped, n_keep)
"""

# pipeline_keep_stats (VERDICT r4 item 2): the keep/drop decision
# (hashed-ngram langid + perplexity) is not SQL-expressible, but the
# driver's gate always runs over the read-only deterministic testdata,
# so the histogram is a CONSTANT per scale factor — a golden VALUES
# oracle keyed by an sf discriminator the oracle can compute itself
# (SUM(LENGTH(text)) over the documents view: 153156 / 149174 /
# 1485576 at sf0.001 / 0.01 / 0.1). The literals are DERIVED FROM THE
# INDEPENDENT PANDAS ORACLE (oracle/reference.process_pages over the
# same documents-as-web-pages construction), not from the Spark
# implementation, and tests/test_pipeline_parity.py re-derives the
# sf0.001 block from the pandas oracle every suite run so the pin
# cannot drift. An unknown sf yields 0 oracle rows → loud mismatch.
ORACLE_SQL["pipeline_keep_stats"] = """
SELECT keep, drop_reasons_csv, n FROM (VALUES
  (153156,  false, 'high_perplexity,low_stopword',           CAST(371 AS BIGINT)),
  (153156,  false, 'high_perplexity',                        CAST(84 AS BIGINT)),
  (153156,  false, 'high_perplexity,low_stopword,too_short', CAST(29 AS BIGINT)),
  (153156,  false, 'high_perplexity,too_short',              CAST(16 AS BIGINT)),
  (149174,  false, 'high_perplexity,low_stopword',           CAST(380 AS BIGINT)),
  (149174,  false, 'high_perplexity',                        CAST(86 AS BIGINT)),
  (149174,  false, 'high_perplexity,low_stopword,too_short', CAST(26 AS BIGINT)),
  (149174,  false, 'high_perplexity,too_short',              CAST(8 AS BIGINT)),
  (1485576, false, 'high_perplexity,low_stopword',           CAST(3642 AS BIGINT)),
  (1485576, false, 'high_perplexity',                        CAST(928 AS BIGINT)),
  (1485576, false, 'high_perplexity,low_stopword,too_short', CAST(286 AS BIGINT)),
  (1485576, false, 'high_perplexity,too_short',              CAST(142 AS BIGINT)),
  (1485576, false, 'bad_lang,high_perplexity,low_stopword',  CAST(2 AS BIGINT))
) AS t(sfkey, keep, drop_reasons_csv, n)
WHERE sfkey = (SELECT SUM(LENGTH(text)) FROM documents)
ORDER BY n DESC, drop_reasons_csv ASC
"""

# ---------------------------------------------------------------------------
# Driver-facing ordering (VERDICT r2 process finding): the driver's
# correctness run truncates at ~50 entries, so iteration order decides
# which queries get a driver-green row. Newest / least-proven queries go
# FIRST; queries each strictly dominated by a retained superset query go
# LAST (their semantics stay covered: e.g. minhash_jaccard_pairs recomputes
# signatures+bands+verify, so minhash_signatures/lsh_band_buckets falling
# off the cap loses no coverage). Two near-duplicate TPC aggregations are
# RETIRED from the driver registry entirely and pytest-checked against the
# same DuckDB oracles instead (tests/test_retired_queries.py).
# ---------------------------------------------------------------------------

# Round 4 (VERDICT r3 item 3): the former `_LAST` tail — 9 queries each
# dominated by a retained superset or twice driver-proven — is RETIRED
# outright, plus rollup_pricing (grouping-sets twin of
# q1_pricing_summary over the same aggregates). All 12 retired queries
# run against their original DuckDB oracles every suite run via
# tests/test_retired_queries.py, and the driver's ~50-entry cap now
# covers the remaining registry EXACTLY — every registry entry gets a
# driver-green row by construction, not by ordering discipline.
RETIRED = (
    "q5_nation_volume", "orders_by_month",
    "segment_setops", "accent_fold",
    "minhash_signatures",   # ⊂ minhash_jaccard_pairs
    "lsh_band_buckets",     # ⊂ minhash_jaccard_pairs
    "simhash",              # ⊂ simhash_near_pairs
    "char_trigram_counts",  # ⊂ lm_char_trigrams
    "word_bigram_counts",   # ⊂ lm_word_bigrams
    "token_stats",          # ⊂ bpe_token_stats (same tokenize surface)
    "session_bounds",       # ⊂ sessionize (same session assembly)
    "rollup_pricing",       # grouping-sets twin of q1_pricing_summary
)
RETIRED_QUERIES = {n: QUERIES.pop(n) for n in RETIRED}
RETIRED_ORACLE_SQL = {n: ORACLE_SQL.pop(n) for n in RETIRED}

_FIRST = [
    # round-4 additions / never driver-checked
    "pipeline_dedup_stats",
    # round-3 additions, driver-checked once in r3
    "url_canonical", "line_dedup_stats", "pipeline_webpages_synthetic", "salted_host_agg", "salted_host_join",
    "per_file_accuracy", "distinct_aggs", "events_json_stats",
    "pipeline_keep_stats",
    # round-2 tail that only just got checked once
    "value_percentiles", "dup_components", "emb_near_dup_pairs",
    "simhash_near_pairs", "ivf_topk", "mention_recall",
]
_LAST: list[str] = []  # empty by design: registry == driver coverage


def _reorder(d: dict) -> dict:
    mid = [k for k in d if k not in _FIRST and k not in _LAST]
    return {k: d[k] for k in
            [*_FIRST, *mid, *_LAST] if k in d}


QUERIES = _reorder(QUERIES)
ORACLE_SQL = _reorder(ORACLE_SQL)
