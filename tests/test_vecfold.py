"""Pin the r6 Arrow kernels (functions/vecfold.py, functions/texthash.py)
bit-for-bit against the Catalyst higher-order-function forms they
replaced — on the real embeddings/documents test tables."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from lgid_spark.session import get_spark

    s = get_spark("test_vecfold", master="local[8]")
    yield s


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


def test_cos_and_dot_bitwise(spark, emb):
    from lgid_spark.functions import vecfold as V
    from lgid_spark.queries.similarity import _dot

    probes = emb.limit(5).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pvec"))
    pairs = emb.crossJoin(F.broadcast(probes))
    old_cos = _dot(F.col("embedding"), F.col("pvec")) / (
        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(_dot(F.col("pvec"), F.col("pvec"))))
    d = pairs.select(
        old_cos.alias("o"), V.cos_seq_udf("embedding", "pvec").alias("n"),
        _dot(F.col("embedding"), F.col("pvec")).alias("od"),
        V.seq_dot_udf("embedding", "pvec").alias("nd"))
    assert d.where((F.col("o") != F.col("n"))
                   | (F.col("od") != F.col("nd"))).count() == 0


def test_d2_bitwise(spark, emb):
    from lgid_spark.functions import vecfold as V
    from lgid_spark.queries.similarity import DIM

    probes = emb.limit(4).select(F.col("embedding").alias("cvec"))
    pairs = emb.crossJoin(F.broadcast(probes))
    old_d2 = F.aggregate(
        F.sequence(F.lit(1), F.lit(DIM)), F.lit(0.0),
        lambda acc, i: acc + (
            F.element_at(F.col("embedding"), i).cast("double")
            - F.element_at(F.col("cvec"), i).cast("double")) ** 2)
    d = pairs.select(old_d2.alias("o"),
                     V.d2_seq_udf("embedding", "cvec").alias("n"))
    assert d.where(F.col("o") != F.col("n")).count() == 0


def test_sig_norm_bitwise(spark, emb):
    from lgid_spark.functions import vecfold as V
    from lgid_spark.queries.coverage import _DUP_SIGNS, _dot64, _dup_sig_col

    sn = V.make_sig_norm_udf(_DUP_SIGNS)
    d = emb.select(
        _dup_sig_col().alias("osig"),
        F.sqrt(_dot64(F.col("embedding"), F.col("embedding"))).alias("onorm"),
        sn("embedding").alias("p"),
    ).select("osig", "onorm", "p.sig", "p.norm")
    assert d.where((F.col("osig") != F.col("sig"))
                   | (F.col("onorm") != F.col("norm"))).count() == 0


def test_minhash_bitwise(spark, docs):
    from lgid_spark.functions.texthash import make_minhash_udf
    from lgid_spark.queries.textops import _minhash_col, _words

    arr = F.array_distinct(_words(F.col("text")))
    udf = make_minhash_udf(8)
    d = (
        docs.select("doc_id", arr.alias("ws")).where(F.size("ws") > 0)
        .select(
            *[F.array_min(F.transform("ws", _minhash_col(k))).alias(f"o{k}")
              for k in range(8)],
            udf("ws").alias("h"))
    )
    cond = None
    for k in range(8):
        c = F.col(f"o{k}") != F.col(f"h.h{k}")
        cond = c if cond is None else cond | c
    assert d.where(cond).count() == 0


@pytest.mark.parametrize("bits,hexc", [(16, 4), (32, 8)])
def test_simhash_bitwise(spark, docs, bits, hexc):
    from lgid_spark.functions.texthash import make_simhash_udf
    from lgid_spark.queries.textops import _words

    wd = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_words(F.col("text")))).alias("w"),
    ).withColumn(
        "wh", F.conv(F.substring(F.md5("w"), 1, hexc), 16, 10).cast("long"))
    bit_sums = [
        F.sum(F.when(
            F.shiftright(F.col("wh"), b).bitwiseAND(F.lit(1)) == 1,
            1).otherwise(-1)).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = wd.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    old = agg.select("doc_id", sim.cast("bigint").alias("o"))

    udf = make_simhash_udf(bits, hexc)
    arr = F.array_distinct(_words(F.col("text")))
    new = (
        docs.select("doc_id", arr.alias("ws")).where(F.size("ws") > 0)
        .select("doc_id", udf("ws").alias("n"))
    )
    j = old.join(new, "doc_id", "full")
    assert j.where(
        F.col("o").isNull() | F.col("n").isNull()
        | (F.col("o") != F.col("n"))).count() == 0
