"""Structured-Streaming incremental ingest (SURVEY §2.10 stretch goal).

The batch resume path (lineage.run_incremental) is the primary
incremental mechanism; this module provides the equivalent semantics as
a `Trigger.AvailableNow` stream: each invocation processes exactly the
files that appeared since the last checkpoint, runs the full quality
pipeline, and appends to the output — then stops. Checkpoint state
lives with the query, so crash/restart resumes mid-listing safely.

readStream(parquet dir) → quality_pipeline (stateless narrow map — the
same fused Arrow UDF works unchanged on a streaming frame) →
writeStream(parquet, append, availableNow).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..datagen import WEB_PAGES_DDL
from ..pipeline import quality_pipeline


def await_drain(query, timeout_sec: int) -> None:
    """awaitTermination(timeout) returns False WITHOUT stopping the
    query or raising — a drain that merely times out would otherwise
    look complete while still writing in the background (partial reads,
    and the next drain dies on 'checkpoint already active'). Stop the
    straggler and raise so callers see the truth."""
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(
            f"streaming drain did not finish within {timeout_sec}s — "
            "the query was stopped; re-run to resume from the "
            "checkpoint (raise timeout_sec for large backlogs)")


def process_available(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
) -> None:
    """Drain everything new under input_dir through the pipeline."""
    stream = (
        spark.readStream.schema(WEB_PAGES_DDL)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    labelled = quality_pipeline(spark, stream).drop("warc_ts")
    q = (
        labelled.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, timeout_sec)
