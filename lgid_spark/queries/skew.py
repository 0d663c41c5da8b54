"""Skew handling: salted two-stage aggregation (north_rule requirement).

A host-level aggregate over web text is skewed — one host can carry a
large share of rows (the synthetic generator gives host0 ~20%). The
salted pattern splits the hot key across `salt` sub-keys for the first
(heavy) aggregation, then combines the partials — the second shuffle
moves only #hosts × salt rows. AQE's skew-join splitting handles joins;
this is the aggregation-side equivalent.

The DuckDB oracle computes the plain single-stage aggregate: results
must be identical (salting is a physical rewrite, not a semantic one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import dsum, t

QUERIES = {}
ORACLE_SQL = {}

SALT = 16


def salted_agg(df: DataFrame, key: str, salt: int = SALT) -> DataFrame:
    """Generic two-stage count+sum(n_chars) per key with salting."""
    stage1 = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.col("n_chars").cast("long")).alias("_chars"),
        )
    )
    return stage1.groupBy(key).agg(
        F.sum("_n").alias("n_docs"),
        F.sum("_chars").alias("total_chars"),
    )


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn
    return reg


@_q("salted_host_agg")
def salted_host_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return salted_agg(docs, "source").withColumnRenamed("source", "host")


ORACLE_SQL["salted_host_agg"] = """
SELECT source AS host, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source
"""
