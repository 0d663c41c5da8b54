"""Coverage-breadth queries: grouping sets/rollup (§2.4 note), set ops
(§2.7), normalization P3/P4 (NFKD accent fold), mention recall A8,
embedding-cosine near-dup pairs (dedup family, blocked by label)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .util import dsum, spread, t

QUERIES = {}
ORACLE_SQL = {}


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn
    return reg


# ---------------------------------------------------------------------------
# rollup_pricing — ROLLUP with grouping flags (Catalyst rollup ↔ DuckDB).
# ---------------------------------------------------------------------------

@_q("rollup_pricing")
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n", "sum_qty",
        )
    )


ORACLE_SQL["rollup_pricing"] = """
SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# segment_setops — §2.7: INTERSECT / EXCEPT over customer keys.
# ---------------------------------------------------------------------------

@_q("segment_setops")
def segment_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    building = cust.where("c_mktsegment = 'BUILDING'").select(
        F.col("c_custkey").alias("k"))
    big = orders.where("o_totalprice > 300000").select(
        F.col("o_custkey").alias("k")).distinct()
    # explicit single-row counts (not groupBy) so an EMPTY set-op still
    # yields its 0 row at any SF — the DuckDB oracle's UNION ALL COUNT
    # shape does, and at sf0.001 the except branch is genuinely empty
    both = building.intersect(big).agg(
        F.count("*").alias("n")).select(
        F.lit("intersect").alias("set_op"), "n")
    only_building = building.exceptAll(big).agg(
        F.count("*").alias("n")).select(
        F.lit("except").alias("set_op"), "n")
    return both.unionByName(only_building)


ORACLE_SQL["segment_setops"] = """
WITH building AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 300000),
both_k AS (SELECT k FROM building INTERSECT SELECT k FROM big),
only_b AS (SELECT k FROM building EXCEPT ALL SELECT k FROM big)
SELECT 'intersect' AS set_op, COUNT(*) AS n FROM both_k
UNION ALL
SELECT 'except' AS set_op, COUNT(*) AS n FROM only_b
"""


# ---------------------------------------------------------------------------
# accent_fold — P3/P4 normalization: inject accents deterministically,
# fold them back with NFKD (pandas UDF ↔ DuckDB strip_accents).
# ---------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def nfkd_fold_udf(s: pd.Series) -> pd.Series:
    import unicodedata

    def fold(x: str) -> str:
        d = unicodedata.normalize("NFKD", x or "")
        return "".join(c for c in d if not unicodedata.combining(c))

    return s.map(fold)


@_q("accent_fold")
def accent_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    accented = F.translate(F.substring("text", 1, 60), "ae", "áé")
    return docs.select(
        "doc_id",
        F.md5(nfkd_fold_udf(accented)).alias("folded_md5"),
        F.length(accented).cast("bigint").alias("n_chars"),
    )


ORACLE_SQL["accent_fold"] = """
SELECT doc_id,
       md5(strip_accents(translate(substr(text, 1, 60), 'ae', 'áé'))) AS folded_md5,
       CAST(length(translate(substr(text, 1, 60), 'ae', 'áé')) AS BIGINT) AS n_chars
FROM documents
"""


# ---------------------------------------------------------------------------
# mention_recall — A8 (main.py:136-180 calc_mention_recall): fraction of
# docs whose text contains at least one term mention, via the real
# mention-extractor operator; SQL oracle counts token hits.
# ---------------------------------------------------------------------------

_RECALL_TERMS = {"table": ["t1"], "merge": ["m1"], "window": ["w1"]}


@_q("mention_recall")
def mention_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mentions import extract_mentions

    docs = t(spark, sf_dir, "documents")
    lines = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(1).alias("lineno"), "text")
    mentions = extract_mentions(spark, lines, _RECALL_TERMS,
                                single_line=True)
    hits = mentions.select("doc_id").distinct().agg(
        F.count("*").alias("docs_with_mention"))
    # one lazy DAG: the denominator is a 1-row agg cross-joined in,
    # not a separate driver-side .count() job
    total = docs.agg(F.count("*").alias("n_total"))
    return hits.crossJoin(total).select(
        "docs_with_mention",
        (F.col("docs_with_mention") / F.col("n_total")).alias("recall"),
    )


# token normalization mirrors the matcher (see advanced._canon_tok_sql):
# lowercase + strip accents + punctuation-capture core, so capitalized /
# punctuation-adjacent / accented surface forms count on both sides
_RECALL_NRM = ("regexp_extract(strip_accents(lower(tok)), "
               r"'([''ǂ!/=]*[\p{L}\p{N}_]+((-|''|/)+[\p{L}\p{N}_]+)*)', 1)")

ORACLE_SQL["mention_recall"] = f"""
WITH w AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS words FROM documents),
hits AS (
  SELECT DISTINCT doc_id FROM w, unnest(words) AS u(tok)
  WHERE {_RECALL_NRM} IN ('table', 'merge', 'window')
     OR replace({_RECALL_NRM}, '-', '') IN ('table', 'merge', 'window')
)
SELECT COUNT(*) AS docs_with_mention,
       CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM documents) AS recall
FROM hits
"""


# ---------------------------------------------------------------------------
# emb_near_dup_pairs — embedding-cosine near-dup with RP-LSH band
# candidate generation (the 100-TB shape: candidates come from equi-join
# on shared LSH bands — never an all-pairs/blocked cartesian — and the
# exact cosine runs only on the deduped candidate set).
#
# 16 signed random hyperplanes → 2 bands × 8 bits; a pair is a candidate
# iff it shares ANY band (8-bit bands keep the candidate set ~26× smaller
# than 4-bit bands at sf0.1 while still catching high-cosine near-dups —
# this is ANN semantics: recall of borderline-similarity pairs is traded
# for a candidate set that stays linear in corpus size). Plane signs are deterministic md5-parity
# constants computed once in Python and embedded as literals in BOTH the
# Spark plan and the DuckDB oracle, so the two engines see bitwise-equal
# projections (sequential double fold on both sides).
# ---------------------------------------------------------------------------

import hashlib as _hashlib

_DIM = 64
_COS_MIN = 0.35
_DUP_MAX_BUCKET = 1000  # RP-LSH hot-bucket cap (replicated in oracle)
_N_DUP_PLANES = 16
_N_DUP_BANDS = 2
_BAND_BITS = _N_DUP_PLANES // _N_DUP_BANDS


def _dup_sign(k: int, i: int) -> float:
    h = _hashlib.md5(f"dupplane|{k}|{i}".encode()).hexdigest()[0]
    return 1.0 if int(h, 16) & 1 else -1.0


_DUP_SIGNS = [
    [_dup_sign(k, i) for i in range(1, _DIM + 1)]
    for k in range(_N_DUP_PLANES)
]

from ..functions.vecfold import make_sig_norm_udf, seq_dot_udf  # noqa: E402

_dup_sig_norm_udf = make_sig_norm_udf(_DUP_SIGNS)


def _dot64(x, y):
    """Sequential double fold (deterministic order, engine-portable)."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_DIM)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(x, i).cast("double") * F.element_at(y, i).cast("double"),
    )


def _dup_sig_col():
    """16-bit signature: bit k = sign of the k-th plane projection.

    Built as ONE nested fold over an array<array<double>> literal of
    plane signs rather than 16 separate aggregate expressions: the
    flat form produced a ~3000-node expression tree whose Catalyst
    analysis+codegen dominated wall time at small scale (measured:
    computing it on both join sides doubled query latency at sf0.1
    with only 2000 rows). Fold order per plane is unchanged
    (sequential i ascending, double accumulation), so projections stay
    bitwise-equal to the DuckDB oracle's list_sum fold."""
    planes = F.array(*[
        F.array(*[F.lit(s) for s in _DUP_SIGNS[k]])
        for k in range(_N_DUP_PLANES)
    ])
    powers = F.array(*[F.lit(1 << k) for k in range(_N_DUP_PLANES)])
    bits = F.transform(
        F.sequence(F.lit(1), F.lit(_N_DUP_PLANES)),
        lambda k: F.when(
            F.aggregate(
                F.sequence(F.lit(1), F.lit(_DIM)),
                F.lit(0.0),
                lambda acc, i: acc
                + F.element_at(F.col("embedding"), i).cast("double")
                * F.element_at(F.element_at(planes, k), i),
            ) > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(
        F.zip_with(bits, powers, lambda b, p: b * p),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("int")


def _band_of(sig, j: int):
    return F.shiftright(sig, _BAND_BITS * j).bitwiseAND(
        F.lit((1 << _BAND_BITS) - 1))


@_q("emb_near_dup_pairs")
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RP-LSH banded candidates → exact-cosine verify, single join.

    Shuffle shape (VERDICT r2 item 8): ONE band-exploded frame carrying
    (vec_id, label, embedding, norm, sig) is built from a single scan,
    repartitioned on (band_idx, band_val), and self-joined through
    per-side column RENAMES (this shape does NOT trip the Spark-4
    alias()+HOF binding bug that forced independent reads before, and
    measured ~25% faster than two independent sides — one analysis of
    the signature expression instead of two). The previous candidate
    `.distinct()` and vec_id re-joins stay gone; a pair sharing several
    bands is kept exactly once by the first-matching-band rule (band j
    survives only if every earlier band DISAGREES), free because both
    full signatures ride the joined row.

    Round 4: the band frame carries ONLY columns both join sides use
    symmetrically (label is excluded and re-attached by a post-join
    lookup on the surviving pairs). With the sides' projections
    canonically IDENTICAL, the planner reuses ONE shuffle for both
    (ReusedExchange; AQE's stage cache does the same at runtime), so
    the RP-signature pipeline is computed once, not per side — in the
    at-scale regime where neither side broadcasts, that halves the
    stage. Any asymmetric column defeats this: Catalyst prunes it
    below the exchange on one side and the subtrees stop matching
    (plan pinned by test_plans)."""
    emb = t(spark, sf_dir, "embeddings")
    # ONE Arrow crossing computes sig + norm (bit-identical to the
    # _dup_sig_col/_dot64 HOF folds — functions/vecfold.py, pinned by
    # tests/test_vecfold.py). The interpreted fold was ~1100 lambda
    # steps per row and the planner evaluates this subtree up to three
    # times (two join sides + the hot-set lineage).
    side = spread(emb.select("vec_id", "embedding")).select(
        "vec_id", "embedding", _dup_sig_norm_udf(F.col("embedding")).alias("_sn")
    ).select(
        "vec_id", "embedding",
        F.col("_sn.sig").alias("sig"), F.col("_sn.norm").alias("norm"),
    )
    side = side.select(
        "*",
        F.posexplode(F.array(*[
            _band_of(F.col("sig"), j) for j in range(_N_DUP_BANDS)
        ])).alias("band_idx", "band_val"),
    )
    # hot-bucket guard (same trade as minhash_jaccard_pairs /
    # near_dup_losers): with only 2 bands × 2^8 values a viral bucket
    # of B vectors would emit B² candidate pairs, each paying a
    # 64-element cosine fold — buckets above the cap are excluded from
    # candidate generation. Bucket sizes come from a window count over
    # the ALREADY-repartitioned frame, not a separate groupBy lineage:
    # a groupBy would re-run the 16-plane signature fold (the stage's
    # dominant cost) in a second scan, while the window rides the one
    # exchange the self-join already pays — side_a, side_b, AND the
    # tiny hot set all reuse it (plan-pinned).
    side = side.repartition("band_idx", "band_val")
    side = side.withColumn(
        "_n", F.count("*").over(Window.partitionBy("band_idx", "band_val")))
    hot = (
        side.where(F.col("_n") > _DUP_MAX_BUCKET)
        .select("band_idx", "band_val").distinct()
    )
    side = side.where(F.col("_n") <= _DUP_MAX_BUCKET).drop("_n")
    a = side.select(*[F.col(c).alias(c + "_a") for c in side.columns])
    b = side.select(*[F.col(c).alias(c + "_b") for c in side.columns])
    pairs = a.join(
        b,
        (F.col("band_idx_a") == F.col("band_idx_b"))
        & (F.col("band_val_a") == F.col("band_val_b")),
    ).where(F.col("vec_id_a") < F.col("vec_id_b"))
    # an earlier band that was EXCLUDED as hot produced no join row, so
    # the first-match rule must treat "agreed on a hot bucket" like a
    # disagreement or such pairs would vanish entirely (the oracle's
    # DISTINCT over hot-filtered bands keeps them). hot is tiny by
    # construction (over-cap buckets only) — broadcast lookups ABOVE
    # the self-join, so the exchange reuse below is untouched.
    for j2 in range(_N_DUP_BANDS - 1):
        hot_j = (hot.where(F.col("band_idx") == j2)
                 .select(F.col("band_val").alias(f"_hot_val_{j2}")))
        pairs = pairs.join(
            F.broadcast(hot_j),
            _band_of(F.col("sig_a"), j2) == F.col(f"_hot_val_{j2}"),
            "left")
    # the first-match condition is written SYMMETRICALLY in the two
    # sides (band_idx_a AND band_idx_b, equal by the join) — a
    # one-sided predicate gets pushed below only one side's exchange
    # and the subtrees stop canonicalizing equal, losing the reuse
    first_match = None
    for j in range(_N_DUP_BANDS):
        cond = (F.col("band_idx_a") == j) & (F.col("band_idx_b") == j)
        for j2 in range(j):
            cond = cond & (
                (_band_of(F.col("sig_a"), j2)
                 != _band_of(F.col("sig_b"), j2))
                | F.col(f"_hot_val_{j2}").isNotNull())
        first_match = cond if first_match is None else first_match | cond
    pairs = pairs.where(first_match)
    cos = seq_dot_udf(F.col("embedding_a"), F.col("embedding_b")) / (
        F.col("norm_a") * F.col("norm_b"))
    verified = (
        pairs.withColumn("cos_sim", F.round(cos, 6))
        .where(F.col("cos_sim") >= _COS_MIN)
        .select(
            F.col("vec_id_a").alias("vec_a"),
            F.col("vec_id_b").alias("vec_b"),
            "cos_sim",
        )
    )
    # label lookup on the SURVIVING pairs only — tiny vs the band join;
    # keeping label out of the band frame is what makes the sides'
    # exchange subtrees identical (see docstring)
    labels = emb.select(F.col("vec_id").alias("vec_a"), "label")
    return verified.join(labels, "vec_a").select(
        "vec_a", "vec_b", "label", "cos_sim")


def _dup_sig_sql() -> str:
    terms = []
    for k in range(_N_DUP_PLANES):
        coefs = "[" + ",".join(
            ("1.0" if s > 0 else "-1.0") for s in _DUP_SIGNS[k]) + "]"
        proj = (
            f"list_sum(list_transform(generate_series(1, {_DIM}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({coefs}[i])))"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << k} ELSE 0 END)")
    return " + ".join(terms)


_DOT_AB = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)

ORACLE_SQL["emb_near_dup_pairs"] = f"""
WITH s AS (
  SELECT vec_id, label, embedding,
         sqrt(list_sum(list_transform(generate_series(1, 64),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm,
         CAST({_dup_sig_sql()} AS INT) AS sig
  FROM embeddings
), bands0 AS (
  SELECT vec_id, j AS band_idx,
         (sig >> ({_BAND_BITS} * j)) & {(1 << _BAND_BITS) - 1} AS band_val
  FROM s, unnest([0, 1]) u(j)
), hot AS (
  SELECT band_idx, band_val FROM bands0
  GROUP BY band_idx, band_val HAVING COUNT(*) > {_DUP_MAX_BUCKET}
), bands AS (
  SELECT b.* FROM bands0 b
  LEFT JOIN hot h USING (band_idx, band_val) WHERE h.band_idx IS NULL
), cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
   AND x.vec_id < y.vec_id
)
SELECT c.vec_a, c.vec_b, a.label AS label,
       ROUND({_DOT_AB} / (a.nrm * b.nrm), 6) AS cos_sim
FROM cand c
JOIN s a ON a.vec_id = c.vec_a
JOIN s b ON b.vec_id = c.vec_b
WHERE ROUND({_DOT_AB} / (a.nrm * b.nrm), 6) >= {_COS_MIN}
"""


# ---------------------------------------------------------------------------
# dup_components — near-dup PAIRS → dup GROUPS: connected components by
# iterative min-label propagation (operators/components.py), the stage a
# 100-TB dedup runs between LSH candidate generation and canonical-doc
# selection. Oracle: DuckDB recursive CTE (transitive closure + min).
# ---------------------------------------------------------------------------

@_q("dup_components")
def dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    pairs = emb_near_dup_pairs(spark, sf_dir).select("vec_a", "vec_b")
    comp = connected_components(pairs, "vec_a", "vec_b")
    sizes = comp.groupBy("component").agg(F.count("*").alias("group_size"))
    return comp.join(sizes, "component").select(
        F.col("vertex").alias("vec_id"), "component", "group_size")


def _dup_components_sql() -> str:
    near_dup = ORACLE_SQL["emb_near_dup_pairs"]
    return f"""
WITH RECURSIVE pairs AS ({near_dup}),
sym AS (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION
  SELECT vec_b AS a, vec_a AS b FROM pairs
),
reach(v, u) AS (
  SELECT a, a FROM sym
  UNION
  SELECT r.v, s.b FROM reach r JOIN sym s ON r.u = s.a
),
comp AS (SELECT v AS vec_id, MIN(u) AS component FROM reach GROUP BY v)
SELECT c.vec_id, c.component, g.sz AS group_size
FROM comp c
JOIN (SELECT component, COUNT(*) AS sz FROM comp GROUP BY component) g
  USING (component)
"""


ORACLE_SQL["dup_components"] = _dup_components_sql()


# ---------------------------------------------------------------------------
# value_percentiles — exact continuous percentiles (Spark `percentile` ↔
# DuckDB quantile_cont) per event type.
# ---------------------------------------------------------------------------

@_q("value_percentiles")
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


ORACLE_SQL["value_percentiles"] = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# distinct_aggs — exact distinct aggregates (§2.4 note: countDistinct).
# ---------------------------------------------------------------------------

@_q("distinct_aggs")
def distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct("user_id", "event_type").alias("n_user_type_pairs"),
    )


ORACLE_SQL["distinct_aggs"] = """
SELECT COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT event_type) AS n_types,
       -- FILTER mirrors Spark's countDistinct(a, b), which skips rows
       -- where ANY argument is NULL; DuckDB's struct-distinct would
       -- otherwise count NULL-bearing tuples
       COUNT(DISTINCT (user_id, event_type))
         FILTER (user_id IS NOT NULL AND event_type IS NOT NULL)
         AS n_user_type_pairs
FROM events
"""


# ---------------------------------------------------------------------------
# q5_nation_volume — TPC-H Q5 shape: 6-way join (3 broadcast dims),
# revenue per nation where customer and supplier share the nation.
# ---------------------------------------------------------------------------

@_q("q5_nation_volume")
def q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    revenue = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.sum(revenue).cast("double").alias("revenue"),
             F.count("*").alias("n_items"))
    )


ORACLE_SQL["q5_nation_volume"] = """
SELECT n_name AS nation, r_name AS region,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name, r_name
"""


# ---------------------------------------------------------------------------
# events_json_stats — JSON extraction (props is a JSON string).
# ---------------------------------------------------------------------------

@_q("events_json_stats")
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_SQL["events_json_stats"] = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# orders_by_month — temporal functions: year/month buckets + decimal sums.
# ---------------------------------------------------------------------------

@_q("orders_by_month")
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double")
            .alias("total"),
        )
    )


ORACLE_SQL["orders_by_month"] = """
SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
FROM orders GROUP BY yr, mo
"""
