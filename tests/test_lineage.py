"""Idempotent resume + lineage semantics (north_rule)."""

from __future__ import annotations

import shutil

import pytest

from lgid_spark.datagen import spark_web_pages
from lgid_spark.lineage import committed_buckets, lineage_rows, run_incremental
from lgid_spark.pipeline import exact_dedup_pages, quality_pipeline

N = 300
N_BUCKETS = 16


@pytest.fixture()
def paths(tmp_path):
    return str(tmp_path / "out"), str(tmp_path / "metrics")


def test_full_run_then_noop(spark, paths):
    out, metrics = paths
    pages = spark_web_pages(spark, N)
    r1 = run_incremental(spark, pages, out, metrics, "snap1", N_BUCKETS)
    assert r1["processed_rows"] == N
    assert r1["processed_buckets"] == N_BUCKETS
    # re-run: everything committed → no-op
    r2 = run_incremental(spark, pages, out, metrics, "snap2", N_BUCKETS)
    assert r2 == {"processed_rows": 0, "processed_buckets": 0}
    # output has exactly N rows, no duplicates
    assert spark.read.parquet(out).count() == N


def test_resume_after_partial_commit(spark, paths, tmp_path):
    out, metrics = paths
    pages = spark_web_pages(spark, N)
    run_incremental(spark, pages, out, metrics, "snap1", N_BUCKETS)

    # simulate a crashed run: drop half the committed buckets + output
    mdf = spark.read.parquet(metrics)
    schema = mdf.schema
    m = mdf.where("bucket < 8").collect()
    shutil.rmtree(metrics)
    shutil.rmtree(out)
    spark.createDataFrame(m, schema=schema).write.parquet(metrics)
    # re-create output for the surviving buckets only, in the SAME
    # composed shape run_incremental writes (dedup stage + emit flags),
    # or the append-schema guard would rightly refuse the resume
    full = quality_pipeline(
        spark, exact_dedup_pages(pages, N_BUCKETS), n_buckets=N_BUCKETS,
        emit_extracted=False, extra_cols=("dup_count",))
    full.where("bucket < 8").write.partitionBy("bucket").parquet(out)

    r = run_incremental(spark, pages, out, metrics, "snap2", N_BUCKETS)
    assert r["processed_buckets"] == 8  # only the missing half
    assert spark.read.parquet(out).count() == N
    assert committed_buckets(spark, metrics).count() == N_BUCKETS


def test_checksum_deterministic_and_partition_invariant(spark):
    pages = spark_web_pages(spark, N)
    lab1 = quality_pipeline(spark, pages, n_buckets=N_BUCKETS)
    lab2 = quality_pipeline(
        spark, pages.repartition(7), n_buckets=N_BUCKETS)  # different layout
    a = {r["bucket"]: r["checksum"]
         for r in lineage_rows(lab1, "s").collect()}
    b = {r["bucket"]: r["checksum"]
         for r in lineage_rows(lab2, "s").collect()}
    assert a == b and len(a) == N_BUCKETS


def test_drop_hist_matches_oracle(spark):
    from lgid_spark.datagen import pandas_web_pages
    from lgid_spark.oracle.reference import process_pages

    pages = spark_web_pages(spark, N)
    lab = quality_pipeline(spark, pages, n_buckets=N_BUCKETS)
    lin = lineage_rows(lab, "s").collect()
    golden = process_pages(pandas_web_pages(N))
    want: dict[str, int] = {}
    for reasons in golden.drop_reasons:
        for r in reasons:
            want[r] = want.get(r, 0) + 1
    got: dict[str, int] = {}
    for row in lin:
        for k, v in (row["drop_hist"] or {}).items():
            got[k] = got.get(k, 0) + v
    assert got == want


def test_bucket_partition_pruning_on_readback(spark, tmp_path):
    """North-rule partitioning claim, verified in the plan: the filter
    output is written partitionBy(bucket), so a bucket-keyed read-back
    (the resume path, a backfill, a single-bucket audit) must prune to
    that partition's files instead of scanning the table."""
    from lgid_spark.datagen import spark_web_pages
    from lgid_spark.lineage import run_incremental

    out = str(tmp_path / "pruned_out")
    metrics = str(tmp_path / "pruned_metrics")
    run_incremental(
        spark, spark_web_pages(spark, 200), out, metrics, "snap-prune", 8)

    df = spark.read.parquet(out).where("bucket = 3")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    frag = plan.split("PartitionFilters")[1][:120]
    assert "bucket" in frag  # the filter reached the partition pruner
    assert df.count() > 0


def test_append_schema_guard(spark, paths):
    """ADVICE r3: flipping emit_extracted between snapshots would append
    a different column set into one parquet dataset (mixed footers).
    run_incremental must fail fast instead, and still work when the
    emit shape matches the existing dataset."""
    out, metrics = paths
    pages = spark_web_pages(spark, N)
    run_incremental(spark, pages, out, metrics, "snap1", N_BUCKETS,
                    emit_extracted=True)
    with pytest.raises(ValueError, match="emit"):
        run_incremental(spark, pages, out, metrics, "snap2", N_BUCKETS,
                        emit_extracted=False)
    # matching shape on a complete dataset: clean no-op, no raise
    r = run_incremental(spark, pages, out, metrics, "snap3", N_BUCKETS,
                        emit_extracted=True)
    assert r == {"processed_rows": 0, "processed_buckets": 0}


def test_path_exists_handles_uri_schemes(spark, tmp_path):
    """Review r4: existence checks go through the Hadoop FileSystem API
    so scheme-qualified URIs work (os.path.exists is always False for
    them, which silently disabled resume + the schema guard)."""
    from lgid_spark.lineage import _path_exists

    p = tmp_path / "ds"
    assert not _path_exists(spark, f"file://{p}")
    assert not _path_exists(spark, str(p))
    p.mkdir()
    assert _path_exists(spark, f"file://{p}")
    assert _path_exists(spark, str(p))


def test_audit_lineage_sound_and_detects_divergence(spark, paths, tmp_path):
    """audit_lineage is the operator-facing books check: empty after
    an honest run (including a resume that appended a snapshot), and
    it names the bucket when output and metrics tables diverge."""
    import pyspark.sql.functions as F

    from lgid_spark.lineage import audit_lineage

    out, metrics = paths
    pages = spark_web_pages(spark, N)
    run_incremental(spark, pages, out, metrics, "snap1", N_BUCKETS)
    assert audit_lineage(spark, out, metrics).count() == 0

    # resume over an EXTENDED input appends a second snapshot; the
    # combined books must still audit clean
    more = spark_web_pages(spark, N + 64).join(
        pages.select("url"), "url", "left_anti")
    run_incremental(spark, more, out, metrics, "snap2", N_BUCKETS)
    assert audit_lineage(spark, out, metrics).count() == 0

    # tamper with the OUTPUT (drop one bucket partition dir wholesale —
    # the crash-between-writes shape): audit must flag exactly that
    # bucket with both sides of the count
    victim = spark.read.parquet(out).groupBy("bucket").count() \
        .orderBy("bucket").first()
    shutil.rmtree(f"{out}/bucket={victim['bucket']}")
    bad = audit_lineage(spark, out, metrics).collect()
    assert [r["bucket"] for r in bad] == [victim["bucket"]]
    assert bad[0]["output_rows"] is None
    assert bad[0]["lineage_rows"] == victim["count"]

    # tamper with a VALUE (flip one keep flag via rewrite of one
    # bucket): counts still reconcile row-wise but kept/checksum don't
    out2, metrics2 = str(tmp_path / "out2"), str(tmp_path / "m2")
    run_incremental(spark, pages, out2, metrics2, "snap1", N_BUCKETS)
    df = spark.read.parquet(out2)
    b0 = df.first()["bucket"]
    rewrite = df.where(F.col("bucket") == b0).withColumn(
        "keep", ~F.col("keep")).drop("bucket").persist()
    rewrite.count()
    shutil.rmtree(f"{out2}/bucket={b0}")
    rewrite.write.parquet(f"{out2}/bucket={b0}")
    bad2 = audit_lineage(spark, out2, metrics2).collect()
    assert [r["bucket"] for r in bad2] == [b0]
    assert bad2[0]["lineage_rows"] == bad2[0]["output_rows"]
    assert bad2[0]["lineage_kept"] != bad2[0]["output_kept"]
