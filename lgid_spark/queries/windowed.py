"""Window-function operator coverage (SURVEY §2.5-2.6): the reference's
signature line-number-window machinery re-expressed over the `events`
table.

  W1 range window      → sliding_window_agg (rangeBetween on epoch µs)
  W2 closest mention   → closest_event (rank by |Δt|, ties all flagged)
  W4 sessionize        → sessionize (lag-gap → running sum)
  W5/W6 span bounds    → session_bounds (min/max over partition)
  A1/A2 freq/mode      → user_mode
  O1 per-group argmax  → user_argmax
  J2 range join        → error_window_join (events within ±120 s of errors)

All timestamps go through exact integer epoch-microseconds
(unix_micros ↔ epoch_us) so Spark and DuckDB hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import t, us

QUERIES = {}
ORACLE_SQL = {}


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn
    return reg


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@_q("sessionize")
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: lag-gap sessionization (util.py:183-202 span grouping,
    generalized to time gaps), then sessions-per-user."""
    ev = t(spark, sf_dir, "events").withColumn("ts_us", us("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_sess = (
        (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US)
        | F.lag("ts_us").over(w).isNull()
    ).cast("int")
    sess = (
        ev.withColumn("is_new", new_sess)
        .withColumn("session_idx", F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_idx").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


ORACLE_SQL["sessionize"] = f"""
WITH marked AS (
  SELECT user_id,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
           OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT user_id,
       CAST(SUM(is_new) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM marked GROUP BY user_id
"""


@_q("user_mode")
def user_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: most-frequent event_type per user, deterministic ties
    (features.py:248-252 most-frequent-mention semantics)."""
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


ORACLE_SQL["user_mode"] = """
SELECT user_id, mode_type, n FROM (
  SELECT user_id, event_type AS mode_type, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type ASC) AS rk
  FROM events GROUP BY user_id, event_type
) WHERE rk = 1
"""


@_q("sliding_window_agg")
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: rangeBetween window — per event, count + value-sum of the
    user's events in the preceding 10 minutes (window_mention over
    line windows, features.py:216-230, on the time axis). Aggregated
    per user to keep the output compact."""
    ev = t(spark, sf_dir, "events").withColumn("ts_us", us("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-600_000_000, -1)  # (t-10min, t)
    )
    per_event = ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("w_cnt"),
        F.coalesce(F.sum(F.col("value").cast("decimal(12,2)")).over(w), F.lit(0).cast("decimal(12,2)"))
        .cast("double")
        .alias("w_sum"),
    )
    return per_event.groupBy("user_id").agg(
        F.sum("w_cnt").alias("total_window_events"),
        F.sum(F.col("w_sum").cast("decimal(22,2)")).cast("double").alias("total_window_value"),
    )


ORACLE_SQL["sliding_window_agg"] = """
WITH per_event AS (
  SELECT user_id, event_id,
    COUNT(*) OVER w AS w_cnt,
    COALESCE(SUM(CAST(value AS DECIMAL(12,2))) OVER w, CAST(0 AS DECIMAL(12,2))) AS w_sum
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING)
)
SELECT user_id,
       CAST(SUM(w_cnt) AS BIGINT) AS total_window_events,
       CAST(SUM(CAST(w_sum AS DECIMAL(22,2))) AS DOUBLE) AS total_window_value
FROM per_event GROUP BY user_id
"""


@_q("user_argmax")
def user_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: per-group argmax with min-max normalization
    (find_best_and_normalize, main.py:301-323): pick each user's
    highest-value event; normalized score = (v-min)/(max-min)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    wrk = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("vmin", F.min("value").over(w))
        .withColumn("vmax", F.max("value").over(w))
        .withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("best_event"),
            F.col("value").alias("best_value"),
            F.when(F.col("vmax") == F.col("vmin"), F.lit(1.0))
            .otherwise(
                F.round((F.col("value") - F.col("vmin")) / (F.col("vmax") - F.col("vmin")), 6)
            )
            .alias("norm_score"),
        )
    )


ORACLE_SQL["user_argmax"] = """
SELECT user_id, best_event, best_value, norm_score FROM (
  SELECT user_id, event_id AS best_event, value AS best_value,
    CASE WHEN MAX(value) OVER w = MIN(value) OVER w THEN 1.0
         ELSE ROUND((value - MIN(value) OVER w) / (MAX(value) OVER w - MIN(value) OVER w), 6)
    END AS norm_score,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rk
  FROM events
  WINDOW w AS (PARTITION BY user_id)
) WHERE rk = 1
"""


@_q("topk_per_user")
def topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4-style top-k per group: each user's top-3 events by value."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "rk", "event_id", "value")
    )


ORACLE_SQL["topk_per_user"] = """
SELECT user_id, rk, event_id, value FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rk
  FROM events
) WHERE rk <= 3
"""


_RANGE_US = 120_000_000  # ±120 s


@_q("error_window_join")
def error_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: range join — count events of each type within ±120 s of each
    *error* event (mention↔window overlap join, features.py:196-209).

    Scale path: a naive theta-join is O(events × errors) nested-loop
    (14.9 s at sf0.1; quadratic at 100 TB). Instead each error explodes
    to the 2-3 time buckets of width=range covering its window, the join
    becomes a hash equi-join on the bucket, and the exact range predicate
    filters the residue — linear in matches, shuffle-partitionable on the
    bucket key, AQE-splittable if one time bucket is hot."""
    # no spread: at driver scale the events scan already splits into
    # >= cores (20 MB / the 512 KB openCost floor), so a repartition is
    # a no-op there, and at sf0.1 it measured a consistent ~0.25 s net
    # cost (4 bench runs) for no benefit — the join+agg stage's work
    # per row is small
    ev = t(spark, sf_dir, "events").withColumn("ts_us", us("ts"))
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("ts_us").alias("err_ts_us"),
        )
        # buckets the ±range window can touch: floor((t±range)/range)
        .withColumn(
            "tb",
            F.explode(
                F.sequence(
                    F.floor((F.col("err_ts_us") - _RANGE_US) / _RANGE_US),
                    F.floor((F.col("err_ts_us") + _RANGE_US) / _RANGE_US),
                )
            ),
        )
    )
    # no forced broadcast: at sf0.01 AQE broadcasts the exploded errors
    # side on its own; at 100× the exploded side can exceed the driver's
    # broadcast budget, and the equi-join on tb shuffles fine (VERDICT r1)
    ev_b = ev.withColumn("tb", F.floor(F.col("ts_us") / _RANGE_US))
    joined = ev_b.join(errors, "tb").filter(
        (F.col("ts_us") >= F.col("err_ts_us") - _RANGE_US)
        & (F.col("ts_us") <= F.col("err_ts_us") + _RANGE_US)
        & (F.col("event_id") != F.col("err_id"))
    )
    return (
        joined.groupBy("err_id", "event_type")
        .agg(F.count("*").alias("n_nearby"))
    )


ORACLE_SQL["error_window_join"] = """
SELECT e2.event_id AS err_id, e1.event_type, COUNT(*) AS n_nearby
FROM events e1
JOIN (SELECT event_id, epoch_us(ts) AS err_ts_us FROM events WHERE event_type = 'error') e2
  ON epoch_us(e1.ts) BETWEEN e2.err_ts_us - 120000000 AND e2.err_ts_us + 120000000
 AND e1.event_id <> e2.event_id
GROUP BY err_id, e1.event_type
"""


@_q("session_bounds")
def session_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/W6: per-group first/last bounds (span-top/span-bottom,
    main.py:588-589) — per user: first/last event time and count."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min(us("ts")).alias("first_ts_us"),
        F.max(us("ts")).alias("last_ts_us"),
        F.count("*").alias("n_events"),
    )


ORACLE_SQL["session_bounds"] = """
SELECT user_id,
       MIN(epoch_us(ts)) AS first_ts_us,
       MAX(epoch_us(ts)) AS last_ts_us,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""
