"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Engine-parity trick: dot products are computed as an explicit
sequential fold in DOUBLE on both sides (Spark F.aggregate ↔ DuckDB
list_transform+list_sum over the same index order), so the results are
bitwise identical — no reliance on engine-internal float kernels.

  knn_bruteforce  — exact cosine top-k (the baseline ANN oracle)
  ivf_assign      — IVF-style coarse quantization: nearest-centroid
                    assignment histogram (the scale path's first stage)
  rp_lsh_buckets  — random-hyperplane (sign) LSH bucketing: 8-bit
                    signatures from deterministic md5-derived planes
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vecfold import cos_seq_udf, d2_seq_udf, make_sig_udf
from .util import spread, t

QUERIES = {}
ORACLE_SQL = {}


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn
    return reg


DIM = 64


def _dot(a, b):
    """Sequential double fold: sum_i a[i]*b[i] (deterministic order)."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(DIM)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double"),
    )


_DOT_SQL = (
    "list_sum(list_transform(generate_series(1, {dim}), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _norm_sql(a):
    return f"sqrt({_DOT_SQL.format(dim=DIM, a=a, b=a)})"


N_PROBES = 5
TOP_K = 5


@_q("knn_bruteforce")
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    # spread: the cosine kernel must not run on a 2-split scan
    pairs = spread(emb.select("vec_id", "embedding")).crossJoin(
        F.broadcast(probes)).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    # Arrow kernel ≡ the _dot fold chain (r6; bit-pinned by
    # tests/test_vecfold.py) — the interpreted HOF fold was the
    # query's dominant per-row cost
    cos = cos_seq_udf(F.col("embedding"), F.col("probe_vec"))
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        pairs.withColumn("cos_sim", F.round(cos, 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("probe_id", "rk", F.col("vec_id").alias("neighbor_id"), "cos_sim")
    )


ORACLE_SQL["knn_bruteforce"] = f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS probe_vec
  FROM embeddings WHERE vec_id < {N_PROBES}
), pairs AS (
  SELECT p.probe_id, e.vec_id,
    ROUND(
      {_DOT_SQL.format(dim=DIM, a='e.embedding', b='p.probe_vec')}
      / ({_norm_sql('e.embedding')} * {_norm_sql('p.probe_vec')}), 6) AS cos_sim
  FROM embeddings e CROSS JOIN probes p
  WHERE e.vec_id <> p.probe_id
)
SELECT probe_id, rk, neighbor_id, cos_sim FROM (
  SELECT probe_id, vec_id AS neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id ASC) AS rk
  FROM pairs
) WHERE rk <= {TOP_K}
"""


N_CENTROIDS = 4


@_q("ivf_assign")
def ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    # shared rank helper (one copy of the fold + tie-break, so the
    # Spark query can't drift from ivf_topk's assignment semantics)
    assigned = _assignments(
        spread(emb.select("vec_id", "embedding")), cents
    ).filter(F.col("rk") == 1)
    return assigned.groupBy("centroid_id").agg(
        F.count("*").alias("n_assigned"),
        F.round(F.avg("d2"), 4).alias("mean_d2"),
    )


_D2_SQL = (
    f"list_sum(list_transform(generate_series(1, {DIM}), "
    "i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)) "
    "* (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))))"
)

ORACLE_SQL["ivf_assign"] = f"""
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id < {N_CENTROIDS}
), pairs AS (
  SELECT e.vec_id, c.centroid_id, ROUND({_D2_SQL}, 6) AS d2
  FROM embeddings e CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, centroid_id, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, centroid_id ASC) AS rk
  FROM pairs
)
SELECT centroid_id, COUNT(*) AS n_assigned, ROUND(AVG(d2), 4) AS mean_d2
FROM assigned WHERE rk = 1 GROUP BY centroid_id
"""


# ---------------------------------------------------------------------------
# ivf_topk — the actual IVF SEARCH (ivf_assign is the build stage):
# probes visit only their N_PROBE_CELLS nearest centroids' cells and rank
# exact cosine inside them. At 100 TB this is the ANN shape: the
# cross-join is probes × centroids (tiny), and the candidate join is an
# equi-join on centroid_id — never probes × corpus.
# ---------------------------------------------------------------------------

N_PROBE_CELLS = 2


def _assignments(emb, cents):
    """(vec_id, centroid_id, rk) — rank of each centroid per vector by
    L2 distance, deterministic fold + tie on centroid_id."""
    pairs = emb.crossJoin(F.broadcast(cents))
    # Arrow kernel ≡ the sequential (a-b)**2 fold (r6, bit-pinned)
    dist = d2_seq_udf(F.col("embedding"), F.col("cvec"))
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("centroid_id"))
    return (
        pairs.withColumn("d2", F.round(dist, 6))
        .withColumn("rk", F.row_number().over(w))
    )


@_q("ivf_topk")
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    # cell membership: each vector lives in its nearest centroid's cell
    cells = _assignments(
        spread(emb.select("vec_id", "embedding")), cents
    ).where(F.col("rk") == 1).select("vec_id", "centroid_id")
    members = cells.join(
        emb.select("vec_id", F.col("embedding").alias("m_emb")), "vec_id"
    ).select(F.col("vec_id").alias("member_id"), "centroid_id", "m_emb")
    # probes visit their N_PROBE_CELLS nearest cells
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb"))
    visited = _assignments(
        probes.select(F.col("probe_id").alias("vec_id"),
                      F.col("p_emb").alias("embedding")), cents
    ).where(F.col("rk") <= N_PROBE_CELLS).select(
        F.col("vec_id").alias("probe_id"), "centroid_id")
    cand = (
        visited.join(members, "centroid_id")
        .join(probes, "probe_id")
        .where(F.col("member_id") != F.col("probe_id"))
    )
    cos = cos_seq_udf(F.col("m_emb"), F.col("p_emb"))
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("member_id"))
    return (
        cand.withColumn("cos_sim", F.round(cos, 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("probe_id", "rk",
                F.col("member_id").alias("neighbor_id"), "cos_sim")
    )


_D2P_SQL = _D2_SQL  # one L2 template — edits can't desynchronize

ORACLE_SQL["ivf_topk"] = f"""
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id < {N_CENTROIDS}
), ranks AS (
  SELECT e.vec_id, c.centroid_id,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ROUND({_D2P_SQL}, 6) ASC,
                                     c.centroid_id ASC) AS rk
  FROM embeddings e CROSS JOIN cents c
), cells AS (
  SELECT vec_id AS member_id, centroid_id FROM ranks WHERE rk = 1
), visited AS (
  SELECT vec_id AS probe_id, centroid_id FROM ranks
  WHERE rk <= {N_PROBE_CELLS} AND vec_id < {N_PROBES}
), cand AS (
  SELECT v.probe_id, m.member_id,
    ROUND(
      {_DOT_SQL.format(dim=DIM, a='me.embedding', b='pe.embedding')}
      / ({_norm_sql('me.embedding')} * {_norm_sql('pe.embedding')}), 6)
      AS cos_sim
  FROM visited v
  JOIN cells m USING (centroid_id)
  JOIN embeddings me ON me.vec_id = m.member_id
  JOIN embeddings pe ON pe.vec_id = v.probe_id
  WHERE m.member_id <> v.probe_id
)
SELECT probe_id, rk, neighbor_id, cos_sim FROM (
  SELECT probe_id, member_id AS neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY cos_sim DESC, member_id ASC) AS rk
  FROM cand
) WHERE rk <= {TOP_K}
"""


N_PLANES = 8


def _plane_sign(k: int, i: int) -> float:
    # deterministic ±1 from md5 of "plane|k|i": low bit of first hex
    # char — computed DRIVER-SIDE (hashlib), since it depends only on
    # (k, i): evaluating 8×64 md5 calls per ROW, as the first version
    # did, paid ~256M hash evaluations per 500k rows for compile-time
    # constants. The DuckDB oracle keeps the per-element md5 derivation,
    # cross-checking that this literal matrix matches it bitwise.
    import hashlib

    h = hashlib.md5(f"plane|{k}|{i}".encode()).hexdigest()[0]
    return 1.0 if int(h, 16) & 1 else -1.0


_RP_SIGNS = [
    [_plane_sign(k, i) for i in range(1, DIM + 1)] for k in range(N_PLANES)
]
_rp_sig_udf = make_sig_udf(_RP_SIGNS)


@_q("rp_lsh_buckets")
def rp_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    # Arrow kernel: per plane, the same sequential double fold the
    # nested F.aggregate form pinned (bit-identical projections; see
    # functions/vecfold.py + tests/test_vecfold.py). The HOF form was
    # interpreted per element — ~8×64 lambda steps per row.
    return (
        spread(emb.select("vec_id", "embedding"))
        .withColumn("bucket", _rp_sig_udf(F.col("embedding")))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec"))
    )


def _plane_sign_sql(k: int) -> str:
    return (
        f"(CASE WHEN ('0x' || substr(md5('plane|{k}|' || CAST(i AS VARCHAR)), 1, 1))::INT & 1 = 1 "
        "THEN 1.0 ELSE -1.0 END)"
    )


_SIG_SQL = " + ".join(
    f"(CASE WHEN list_sum(list_transform(generate_series(1, {DIM}), "
    f"i -> CAST(embedding[i] AS DOUBLE) * {_plane_sign_sql(k)})) > 0 "
    f"THEN {1 << k} ELSE 0 END)"
    for k in range(N_PLANES)
)

ORACLE_SQL["rp_lsh_buckets"] = f"""
SELECT CAST({_SIG_SQL} AS INT) AS bucket,
       COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec
FROM embeddings GROUP BY bucket
"""
