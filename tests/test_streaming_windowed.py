"""Watermark + event-time windowed aggregation (SURVEY §2.10): the same
DAG runs in batch (watermark no-op → all windows) and as an append-mode
stream (only watermark-finalized windows emit, exactly once)."""

from __future__ import annotations

from lgid_spark.datagen import spark_web_pages
from lgid_spark.streaming.windowed import (
    stream_windowed_lang_counts,
    windowed_lang_counts,
)


def test_stream_matches_batch_on_finalized_windows(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark_web_pages(spark, 300).write.mode("append").parquet(inp)

    batch = {
        (r.win_start, r.lang_pred): (r.n_docs, r.n_kept, r.mean_ppl)
        for r in windowed_lang_counts(
            spark.read.parquet(inp)).collect()
    }
    assert len(batch) > 50  # timestamps spread over 30 days

    stream_windowed_lang_counts(spark, inp, out, ckpt)
    got = spark.read.parquet(out).collect()
    assert len(got) > 0
    # append mode emits only finalized windows — every emitted row must
    # equal the batch computation for that window exactly
    for r in got:
        assert batch[(r.win_start, r.lang_pred)] == (
            r.n_docs, r.n_kept, r.mean_ppl)
    # with a 30-min watermark over 30 days of data, nearly every window
    # finalizes — only windows within the watermark of max event time hold
    assert len(got) >= len(batch) - 10


def test_streaming_dedup_across_batches(spark, tmp_path):
    """dropDuplicates state survives across drains: a url re-delivered
    in a later micro-batch (within the watermark) is NOT emitted again."""
    from lgid_spark.streaming.dedup import stream_dedup_pages

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = spark_web_pages(spark, 100)
    pages.write.mode("append").parquet(inp)
    stream_dedup_pages(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == 100

    # second drain: 50 exact duplicates + the deterministic generator's
    # first 130 docs (urls 0-99 duplicate the first drain; 30 are new)
    pages.limit(50).write.mode("append").parquet(inp)
    spark_web_pages(spark, 130).write.mode("append").parquet(inp)
    stream_dedup_pages(spark, inp, out, ckpt)
    got = spark.read.parquet(out)
    assert got.select("url").distinct().count() == got.count()  # no dupes
    assert got.count() == 130  # 100 originals + 30 genuinely new


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """ADVICE r2: the watermark path uses dropDuplicatesWithinWatermark
    so url state is actually EVICTED after the watermark passes (a plain
    watermark + dropDuplicates on a non-event-time key never evicts).
    Within the watermark, duplicates are still suppressed across
    micro-batches."""
    from lgid_spark.streaming.dedup import stream_dedup_pages

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # watermark wider than the generator's warc_ts span, so no row is
    # "late" and the assertion isolates the dedup semantics (a tight
    # watermark additionally drops old-timestamped genuinely-new rows —
    # the documented live-stream-vs-backfill tradeoff in dedup.py)
    pages = spark_web_pages(spark, 80)
    pages.write.mode("append").parquet(inp)
    stream_dedup_pages(spark, inp, out, ckpt, watermark="3650 days")
    assert spark.read.parquet(out).count() == 80

    # same 80 urls re-delivered (same event times, within the watermark)
    # plus 20 new docs → only the new ones emit
    pages.write.mode("append").parquet(inp)
    spark_web_pages(spark, 100).write.mode("append").parquet(inp)
    stream_dedup_pages(spark, inp, out, ckpt, watermark="3650 days")
    got = spark.read.parquet(out)
    assert got.select("url").distinct().count() == got.count()
    assert got.count() == 100


def test_streaming_dedup_collapses_messy_spellings(spark, tmp_path):
    """Round 4: the streaming dedup keys on the CANONICAL url, matching
    the batch job — a later drain delivering a different spelling of an
    already-seen page is suppressed."""
    from lgid_spark.datagen import dup_row
    from lgid_spark.streaming.dedup import stream_dedup_pages

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark_web_pages(spark, 60).write.mode("append").parquet(inp)
    stream_dedup_pages(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == 60

    # drain 2: messy-url twins of pages 0..19 — all already seen
    import pandas as pd

    twins = pd.DataFrame([dup_row(i) for i in range(20)])
    twins["warc_ts"] = pd.to_datetime(twins["warc_ts"]).dt.tz_localize(None)
    spark.createDataFrame(twins).write.mode("append").parquet(inp)
    stream_dedup_pages(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == 60  # nothing new emitted
