from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver may hand us a session with a non-UTC timezone; epoch-µs
    # parity with DuckDB (which treats naive timestamps as-is) requires
    # the NTZ→timestamp cast to be the identity. Idempotent.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


from ..parallelism import spread  # noqa: F401  (re-export for query modules)


def dec(col, prec: int = 18, scale: int = 2):
    """Exact-decimal bridge for money math (see queries/__init__)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col, prec: int = 18, scale: int = 2):
    """sum in exact decimal, surfaced as double (identical across engines)."""
    return F.sum(dec(col, prec, scale)).cast("double")


def us(col):
    """Exact epoch-microseconds (↔ DuckDB epoch_us). Parquet timestamps
    load as TIMESTAMP_NTZ; with the session TZ pinned to UTC the cast is
    the identity mapping DuckDB uses for naive timestamps."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
