"""Scale-adaptive partitioning helpers (dependency-free: importable
from operators and queries alike without package-init cycles)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Guarantee at least defaultParallelism partitions ahead of an
    expensive per-row stage (Arrow kernel, n-gram explode, matcher).

    Spark floors the scan split size at files.openCostInBytes, so a
    small single-file table yields totalBytes/openCost splits — the
    driver's `documents` parquet scans as TWO partitions on a 32-core
    executor, starving every scan-stage-heavy query (guide §2.5: input
    parallelism is fixed at the source; repartition right after the
    read). Round-robin repartition of the raw input is a few hundred
    KB here — noise next to the 16× stage parallelism it buys. At
    crawl scale a table scan has >= cores splits and this is a no-op
    (scale-adaptive by construction, not tuned to either size)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df
