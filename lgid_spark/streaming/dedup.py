"""Streaming exact dedup (SURVEY §2.10 × dedup family): a training-data
ingest must not emit the same url twice even when the duplicate arrives
in a later micro-batch.

`dropDuplicates` on a stream keeps per-key state across micro-batches
(exactly-once across restarts via the checkpoint, same as
incremental.py). Watermark tradeoff: with `watermark` set we use
`dropDuplicatesWithinWatermark(["url"])`, which actually EVICTS url
state once the watermark passes (a plain watermark + dropDuplicates
on a non-event-time key never evicts — the watermark would only drop
late rows while state still grew with unique urls). The bounded state
comes at a cost: a duplicate url arriving more than `watermark` after
its first occurrence is re-emitted, and genuinely-new rows whose event
time lags the advancing watermark are dropped — correct for a live
stream, WRONG for a crawl backfill where old-timestamped pages arrive
forever. So the default is key-state-only dedup (state ∝ unique urls);
pass `watermark` for live-stream semantics. At 10^12 scale the backfill
path bounds state by deduping per url-hash bucket partition instead
(the batch exact_dedup on compaction)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..pipeline import canonical_url
from .incremental import WEB_PAGES_DDL, await_drain


def stream_dedup_pages(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """readStream(web_pages) → dropDuplicates on the CANONICAL url →
    append parquet. Each drain processes only new files (AvailableNow)
    and duplicates are suppressed ACROSS drains via the state store;
    keying on canonical_url (round 4, matching the batch job's exact
    dedup KEY) means a later micro-batch carrying a different SPELLING
    of an already-seen page is suppressed too.

    Kept-row caveat: when several spellings of one page land in the
    SAME micro-batch, dropDuplicates keeps whichever row a task sees
    first — unlike the batch job's deterministic min(warc_ts, url)
    winner. The suppression KEY matches batch semantics; the surviving
    row is only batch-deterministic across drains (first-arrival drain
    wins). A Structured-Streaming stateful reduce can't pick the
    min-struct row in append mode without event-time aggregation, so
    deployments needing row-level determinism run the batch
    exact_dedup compaction over the stream's output — the documented
    10^12-scale path below."""
    stream = (
        spark.readStream.schema(WEB_PAGES_DDL)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
        .withColumn("url_canon", canonical_url(F.col("url")))
    )
    if watermark is not None:
        deduped = stream.withWatermark(
            "warc_ts", watermark).dropDuplicatesWithinWatermark(["url_canon"])
    else:
        deduped = stream.dropDuplicates(["url_canon"])
    q = (
        deduped.drop("url_canon")
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, timeout_sec)
