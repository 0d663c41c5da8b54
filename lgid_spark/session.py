"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design target (AQE on so skewed shuffles
re-plan at runtime, Arrow on so every Python crossing is columnar,
broadcast threshold generous because every dimension in this engine is
small) while remaining correct on local[N] test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for local[N] testing; on a real cluster these come from spark-submit.
_DEFAULTS: dict[str, str] = {
    # Adaptive execution: runtime shuffle-partition coalescing + skew-join
    # splitting. At 100 TB this is what keeps one hot host from stalling a
    # stage (SURVEY.md §4).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas UDF / toPandas crossing. Batch size is a
    # first-order throughput lever for the fused pipeline UDF — measured
    # at 960k docs/local[32]: 2048 → 72k docs/s, 8192 → 94k, 16384 →
    # 93-100k, 32768 → 85k (regresses: batches outgrow cache). 8192 is
    # the safe knee: ~80 MB/batch at a 10 KB-average web document, fine
    # on modest executors, vs 2× that for ≤5% more at 16384.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
    # Every dimension table in this engine (lang table, stopword lists,
    # LM tables at the per-language grain) is << 64 MB: broadcast them all.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Sized so sf0.1 partitions fit comfortably; a real cluster overrides.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Deterministic session timezone for timestamp-epoch math in oracles.
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "lgid_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` falls back to ``local[$SPARK_GRAFT_CPUS]`` (default all
    cores) so the bench harness can pin parallelism for the N vs 4N
    scaling-efficiency measurement.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def get_submit_spark(app_name: str) -> SparkSession:
    """Session factory for the spark-submit entrypoints (jobs/).

    Under spark-submit the JVM already exists (PythonRunner exports
    PYSPARK_GATEWAY_PORT) and the launcher owns master/memory — attach
    and fill only the launcher-unset SQL defaults. Run as plain
    `python job.py`, the JVM hasn't started yet, so build it with the
    full engine defaults — critically spark.driver.memory=8g, which is
    inert after JVM launch (a bare getOrCreate gives a 1 GB driver that
    OOMs on a real corpus)."""
    if os.environ.get("PYSPARK_GATEWAY_PORT"):
        spark = SparkSession.builder.appName(app_name).getOrCreate()
        apply_engine_defaults(spark)
        return spark
    return get_spark(app_name)


def apply_engine_defaults(spark: SparkSession) -> None:
    """For spark-submit entrypoints: the session comes from the launcher
    (getOrCreate), so apply the engine's runtime-settable SQL defaults
    only where the launcher did NOT set them explicitly (--conf keys show
    up in SparkConf; Spark's own built-in defaults do not). Without this,
    a bare local run inherits shuffle.partitions=200 and every tiny
    evidence join schedules 200 tasks — ~5× wall-clock on small inputs."""
    launcher = spark.sparkContext.getConf()
    for k, v in _DEFAULTS.items():
        if k.startswith("spark.sql.") and not launcher.contains(k):
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # non-runtime-settable under this deployment


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, "object"]:
    """Load the driver-provided parquet tables under ``sf_dir`` and register
    them as temp views. Returns name → DataFrame."""
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for n in names:
        path = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(n)
            out[n] = df
    return out
