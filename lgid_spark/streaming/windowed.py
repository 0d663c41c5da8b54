"""Watermarked event-time windowed aggregation (SURVEY §2.10).

The reference's windowed mention counting (features.py window_mention
over line windows) on the TIME axis as a stream: per language, count of
kept documents and mean perplexity in 10-minute event-time tumbling
windows, with a watermark bounding how late a page may arrive before its
window is finalized and state dropped.

Scale shape: the window agg is a streaming hash aggregation keyed
(window, lang_pred) — partial aggregation per micro-batch, state store
keyed by the same tuple, watermark GC keeps state proportional to the
number of OPEN windows, not to history. This is the structure that keeps
a 10^12-document ingest's state bounded."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import quality_pipeline
from .incremental import WEB_PAGES_DDL, await_drain


def windowed_lang_counts(
    pages: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """web_pages (batch OR stream) → per (event-time window, lang_pred):
    kept-doc count + mean ppl. Same plan works on both: the watermark is
    a no-op in batch, so tests can assert values eagerly and the
    streaming path reuses the identical DAG."""
    labelled = quality_pipeline(pages.sparkSession, pages)
    return (
        labelled.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            "lang_pred",
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.round(F.avg("ppl"), 2).alias("mean_ppl"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "lang_pred", "n_docs", "n_kept", "mean_ppl",
        )
    )


def stream_windowed_lang_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
) -> None:
    """readStream → watermarked window agg → append sink (finalized
    windows only — append mode emits a window exactly once, when the
    watermark passes its end)."""
    stream = (
        spark.readStream.schema(WEB_PAGES_DDL)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    out = windowed_lang_counts(stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, timeout_sec)
