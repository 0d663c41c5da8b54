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

from .util import t

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


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salt: int = SALT) -> DataFrame:
    """Skew-JOIN salting (the join-side twin of salted_agg): the fact
    side gets a random salt per row; the small dim side is EXPLODED
    ×salt so every (key, salt) pair exists — the join becomes an
    equi-join on (key, _salt) and the hot key's rows spread across
    `salt` shuffle partitions instead of one. AQE's skewJoin does this
    adaptively; the explicit form works on static plans and documents
    the technique."""
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return salted_fact.join(exploded_dim, [key, "_salt"]).drop("_salt")


@_q("salted_host_join")
def salted_host_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join the skewed documents fact (host0 ≈ 20% of rows) to a derived
    host dim through the salted equi-join, then aggregate — identical
    output to the plain join the oracle runs."""
    docs = t(spark, sf_dir, "documents")
    dim = (
        docs.groupBy("source")
        .agg(F.min("doc_id").alias("first_doc"))
        .withColumn("host_tier",
                    F.when(F.col("first_doc") < 10, "head").otherwise("tail"))
        .select("source", "host_tier")
    )
    joined = salted_join(docs.select("source", "n_chars"), dim, "source")
    return joined.groupBy("host_tier").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
    )


ORACLE_SQL["salted_host_agg"] = """
SELECT source AS host, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source
"""

ORACLE_SQL["salted_host_join"] = """
WITH dim AS (
  SELECT source,
         CASE WHEN MIN(doc_id) < 10 THEN 'head' ELSE 'tail' END AS host_tier
  FROM documents GROUP BY source
)
SELECT d2.host_tier, COUNT(*) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM documents d JOIN dim d2 USING (source)
GROUP BY d2.host_tier
"""
