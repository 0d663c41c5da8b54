"""The composed classify lifecycle — the reference's flagship path
(/root/reference/lgid/main.py §3.1: get_instances → model.test →
find_best_and_normalize → write_to_files), assembled from this engine's
operators as one lazy DataFrame DAG:

  lines ──▶ extract_mentions (broadcast table, mapInPandas)
        ──▶ span_bounds / window_features / frequent / closest /
            in_line (range joins + window aggs, all broadcast-side)
        ──▶ instances (doc, span, candidate, label, feats map)
        ──▶ HashingTF + LogisticRegression score
        ──▶ per-group min-max argmax → prediction per span
        ──▶ labelled lines (S8 sink shape)

Feature names mirror the reference's string-keyed boolean feature dicts
(features.py gl_features / w_features / l_features families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.classifier import best_candidates, score, train
from .operators.evidence import (
    closest_mentions,
    frequent_mentions,
    in_line_mentions,
    span_bounds,
    window_features,
)
from .operators.mentions import extract_mentions, normalize_name

FLAG_FEATS = ["w_prev", "w_close", "w_after", "w_close_after", "in_span"]


def build_instances(
    spark: SparkSession,
    lines: DataFrame,
    lang_table: dict[str, list[str]],
) -> DataFrame:
    """lines(doc_id, lineno, tag, span_id, lang_name, lang_code, text)
    → instances (FIXTURES.md §7 schema). Candidates = every (name, code)
    with any window evidence for the span (the reference's candidate set,
    main.py:592-616)."""
    mentions = extract_mentions(
        spark, lines.select("doc_id", "lineno", "text"), lang_table)
    spans = span_bounds(lines)
    wf = window_features(mentions, spans)
    freq = frequent_mentions(mentions, spans).select(
        "doc_id", "span_id", "name", "code", "n_mentions", "frequent")
    close = closest_mentions(mentions, spans).select(
        "doc_id", "span_id", "name", "code").distinct().withColumn(
        "closest", F.lit(True))
    onl = in_line_mentions(mentions, lines, "L").withColumn(
        "on_l_line", F.col("n_on_l_lines") > 0).drop("n_on_l_lines")

    keys = ["doc_id", "span_id", "name", "code"]
    cand = (
        wf.join(freq, keys, "left")
        .join(close, keys, "left")
        .join(onl, keys, "left")
    )
    feat_cols = FLAG_FEATS + ["frequent", "closest", "on_l_line"]
    feats_map = F.map_from_arrays(
        F.array(*[F.lit(c) for c in feat_cols]),
        F.array(*[F.coalesce(F.col(c), F.lit(False)) for c in feat_cols]),
    )

    gold = (
        lines.filter(
            F.col("span_id").isNotNull() & F.col("lang_name").isNotNull())
        .groupBy("doc_id", "span_id")
        .agg(
            F.min("lineno").alias("lineno"),
            F.first("lang_name", ignorenulls=True).alias("gold_name"),
            F.first("lang_code", ignorenulls=True).alias("gold_code"),
        )
    )
    @F.pandas_udf("string")
    def norm_gold(s):  # Arrow-batched (no per-row Python UDFs)
        return s.fillna("").map(normalize_name)

    inst = cand.join(gold, ["doc_id", "span_id"], "left").select(
        "doc_id", "span_id",
        F.coalesce("lineno", F.lit(0)).alias("lineno"),
        F.col("name").alias("lang_name"),
        F.col("code").alias("lang_code"),
        (
            (F.col("name") == norm_gold(F.col("gold_name")))
            & (F.col("code") == F.col("gold_code"))
        ).alias("label"),
        feats_map.alias("feats"),
    )
    return inst.withColumn("label", F.coalesce("label", F.lit(False)))


def classify_documents(
    spark: SparkSession,
    lines: DataFrame,
    lang_table: dict[str, list[str]],
    model=None,
) -> DataFrame:
    """Full classify: returns one row per (doc_id, span_id) with the
    winning candidate. If no model is given, trains on these instances
    (the reference's train-then-classify smoke, README.md:91-101)."""
    inst = build_instances(spark, lines, lang_table).persist()
    try:
        mdl = model if model is not None else train(inst)
        best = best_candidates(score(inst, mdl))
        return best.select(
            "doc_id", "span_id", "lineno",
            "lang_name", "lang_code", "prediction",
            "p_true", "norm_prob", "signed_prob", "label",
        )
    finally:
        inst.unpersist()


def write_labelled_lines(
    lines: DataFrame, predictions: DataFrame, path: str
) -> None:
    """S8 sink (write_to_files, main.py:242-277): annotate span lines
    with the predicted language and write partitioned by doc bucket."""
    pred = predictions.select(
        "doc_id", "span_id",
        F.col("lang_name").alias("pred_lang_name"),
        F.col("lang_code").alias("pred_lang_code"),
    )
    out = lines.join(pred, ["doc_id", "span_id"], "left")
    out = out.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(16)).cast("int"))
    out.write.mode("overwrite").partitionBy("bucket").parquet(path)
