"""Per-partition lineage + idempotent resume (north_rule).

Every pipeline run appends one lineage row per url-hash bucket to a
metrics table:

    bucket int, snapshot_id string, input_count long, kept_count long,
    drop_hist map<string,long>, checksum long

* ``checksum`` is an order-insensitive fold: bit_xor of
  xxhash64(url || scrubbed_text) over the bucket — two runs that
  produced byte-identical output per url have equal checksums no
  matter how rows were partitioned or ordered.
* Resume = anti-join the input's buckets against the buckets already
  committed in the metrics table: a crashed run re-processes only the
  missing buckets, and a re-run of a complete job is a no-op.

This is the Iceberg-metrics-table design from SURVEY.md §2.10/§4
expressed over plain parquet (the sandbox has no Iceberg runtime jar):
the metrics dir plays the metrics table, the snapshot_id column plays
the Iceberg snapshot lineage. Swapping the two ``spark.read/write``
calls to ``format("iceberg")`` is the only change a real deployment
needs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import (
    apply_domain_blocklist,
    exact_dedup_pages,
    near_dup_losers,
    quality_pipeline,
    with_bucket,
)

METRICS_SCHEMA = (
    "bucket int, snapshot_id string, input_count long, kept_count long, "
    "dedup_dropped long, near_dup_dropped long, "
    "drop_hist map<string,bigint>, checksum bigint"
)


def lineage_rows(
    labelled: DataFrame,
    snapshot_id: str,
    near_dup_counts: DataFrame | None = None,
) -> DataFrame:
    """One row per bucket: counts, dedup drops, drop-reason histogram,
    checksum.

    Single shuffle on the low-cardinality bucket key; the histogram is
    built map-side-combinable (explode → count → map_from_entries).
    ``dedup_dropped`` comes from the exact-dedup stage's dup_count
    column when present (Σ(dup_count − 1) per bucket — how many
    duplicate spellings/copies were collapsed before the UDF pass);
    ``near_dup_counts`` is the optional (bucket, near_dup_dropped)
    frame from the near-dup stage."""
    has_dup = "dup_count" in labelled.columns
    base = labelled.select(
        "bucket", "url", "keep", "drop_reasons", "scrubbed_text",
        *(["dup_count"] if has_dup else []),
    )
    dedup_agg = (
        F.sum(F.col("dup_count") - 1) if has_dup else F.lit(0)
    ).cast("long").alias("dedup_dropped")
    counts = base.groupBy("bucket").agg(
        F.count("*").alias("input_count"),
        F.sum(F.col("keep").cast("long")).alias("kept_count"),
        dedup_agg,
        F.expr("bit_xor(xxhash64(concat(url, scrubbed_text)))").alias("checksum"),
    )
    hist = (
        base.select("bucket", F.explode("drop_reasons").alias("reason"))
        .groupBy("bucket", "reason")
        .agg(F.count("*").alias("n"))
        .groupBy("bucket")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("reason", "n")))
            ).alias("drop_hist")
        )
    )
    out = counts.join(hist, "bucket", "left")
    if near_dup_counts is not None:
        out = out.drop("near_dup_dropped").join(
            F.broadcast(near_dup_counts), "bucket", "left")
        nd = F.coalesce(F.col("near_dup_dropped"), F.lit(0)).cast("long")
        if "loser_dedup_dropped" in near_dup_counts.columns:
            # dedup drops that left the labelled frame with the losers
            out = out.withColumn(
                "dedup_dropped",
                F.col("dedup_dropped")
                + F.coalesce(F.col("loser_dedup_dropped"), F.lit(0)))
    else:
        nd = F.lit(0).cast("long")
    return (
        out.withColumn("near_dup_dropped", nd)
        .withColumn("snapshot_id", F.lit(snapshot_id))
        .select(
            "bucket", "snapshot_id", "input_count", "kept_count",
            "dedup_dropped", "near_dup_dropped", "drop_hist", "checksum",
        )
    )


def audit_lineage(
    spark: SparkSession, output_path: str, metrics_path: str
) -> DataFrame:
    """Integrity audit over a (possibly multi-snapshot, resumed) run:
    recompute per-bucket row count, kept count, and the
    order-insensitive checksum from the OUTPUT table and diff them
    against the committed lineage. Returns one row per disagreeing
    bucket (empty frame = books are sound) with both sides of every
    number — the operator-facing check that a crash/retry or a
    concurrent writer didn't leave the output and the metrics table
    telling different stories.

    Lineage side: a bucket has exactly one full row (resume processes
    only uncommitted buckets) plus possibly counts-only rows
    (zero-count rows for emptied buckets; near-dup drop carriers for
    committed canon buckets) — summing counts and bit_xor-ing the
    non-null checksums per bucket collapses them correctly. The
    comparison is one shuffle per side on the low-cardinality bucket
    key; the output-side scan reads only (bucket, url, keep,
    scrubbed_text). A path that was never created (a run whose rows
    all vanished before the write) counts as an empty table, so a
    missing output with committed lineage reports every lineage
    bucket — and nothing-vs-nothing is sound."""
    if not _path_exists(spark, metrics_path):
        lin_src = spark.createDataFrame(
            [], "bucket int, input_count long, kept_count long, "
                "checksum bigint")
    else:
        lin_src = spark.read.parquet(metrics_path)
    lin = (
        lin_src
        .groupBy("bucket").agg(
            F.sum("input_count").alias("lineage_rows"),
            F.sum("kept_count").alias("lineage_kept"),
            F.expr("bit_xor(checksum)").alias("lineage_checksum"),
        )
    )
    if not _path_exists(spark, output_path):
        out = spark.createDataFrame(
            [], "bucket int, url string, keep boolean, "
                "scrubbed_text string")
    else:
        out = spark.read.parquet(output_path)
    if "scrubbed_text" not in out.columns:
        # labels-only output cannot reproduce the url||scrubbed_text
        # fold — audit counts only
        checksum = F.lit(None).cast("bigint")
    else:
        checksum = F.expr("bit_xor(xxhash64(concat(url, scrubbed_text)))")
    got = out.groupBy("bucket").agg(
        F.count("*").alias("output_rows"),
        F.sum(F.col("keep").cast("long")).alias("output_kept"),
        checksum.alias("output_checksum"),
    )
    joined = lin.join(got, "bucket", "full_outer")
    zero = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    return joined.where(
        (zero("lineage_rows") != zero("output_rows"))
        | (zero("lineage_kept") != zero("output_kept"))
        | (
            F.col("lineage_checksum").isNotNull()
            & F.col("output_checksum").isNotNull()
            & (F.col("lineage_checksum") != F.col("output_checksum"))
        )
    )


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API so it works
    for ANY storage URI (hdfs://, s3a://, file:, plain local) — a bare
    os.path.exists is always False for remote URIs, which would
    silently disable the resume anti-join and the schema guard exactly
    where a real cluster runs."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def _check_append_schema(
    spark: SparkSession, output_path: str, new_cols: list[str]
) -> None:
    """Fail fast instead of silently creating a mixed-schema dataset.

    Appending rows with a different column set (e.g. alternating
    --emit-extracted across snapshots, or resuming a pre-flag dataset
    with the new default) writes footers with differing schemas into
    ONE parquet dataset; readers without mergeSchema then see
    extracted_text or not depending on which footer Spark samples
    (ADVICE r3). Migration for an existing mixed/pre-change dataset:
    one-time compaction — read with mergeSchema=true, select the
    desired column set, rewrite, then resume appending."""
    if not _path_exists(spark, output_path):
        return
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.option("mergeSchema", "true").parquet(
            output_path).schema.names
    except AnalysisException:  # empty dir / no footers yet
        return
    if set(existing) != set(new_cols):
        raise ValueError(
            "run_incremental: output dataset at %r has columns %s but "
            "this run would append columns %s (emit flags changed?). "
            "Re-run with the matching emit shape, or compact the "
            "dataset once (read mergeSchema=true, select the desired "
            "columns, rewrite) before resuming."
            % (output_path, sorted(existing), sorted(new_cols)))


def committed_buckets(spark: SparkSession, metrics_path: str) -> DataFrame:
    """Buckets already recorded in the metrics table (empty frame if the
    table doesn't exist yet)."""
    if not _path_exists(spark, metrics_path):
        return spark.createDataFrame([], "bucket int")
    return spark.read.parquet(metrics_path).select("bucket").distinct()


def run_incremental(
    spark: SparkSession,
    web_pages: DataFrame,
    output_path: str,
    metrics_path: str,
    snapshot_id: str,
    n_buckets: int = 64,
    emit_extracted: bool = False,
    dedup: bool = True,
    near_dup: bool = False,
    near_dup_jaccard: float = 0.9,
    near_dup_max_bucket: int = 1000,
    blocked_hosts: DataFrame | None = None,
    trust_url_canon: bool = False,
    stage_path: str | None = None,
) -> dict:
    """Process only not-yet-committed buckets; append output + lineage.

    Idempotent: if every bucket is committed this is a no-op. Crash
    between the output write and the metrics write re-processes the
    affected buckets on retry; downstream readers must key on the
    metrics table (standard write-ahead-commit pattern — with real
    Iceberg both writes share one transaction).

    Dedup runs BEFORE the expensive Arrow UDF pass (round 4):

    * ``dedup`` (default on): canonical-url exact dedup — two
      spellings of one page collapse to the earliest crawl, cost the
      UDF pass zero work, and the bucket key becomes the CANONICAL
      url hash so variants co-locate; the output gains a ``dup_count``
      column and lineage a ``dedup_dropped`` count. With
      ``trust_url_canon`` (run_filter's table:/bucketed: inputs) a
      stored url_canon column is used as-is, which over a CLUSTERED BY
      (url_canon) table makes the stage exchange-free; untrusted
      inputs always re-canonicalize.
    * ``near_dup`` (opt-in): MinHash-band → exact-Jaccard →
      connected-components document dedup at ``near_dup_jaccard``;
      per component only the min-url canonical doc survives. The
      deduped frame is shared by the loser scan and the UDF pass:
      by default via persist() (spillable — the small-corpus shape);
      with ``stage_path`` it is instead WRITTEN once as a bucketed
      table (pipeline.stage_deduped_pages) and both consumers read it
      back as plain column-pruned FileScans — the crawl-scale shape,
      where the written table doubles as the committed dedup table.

    The production output carries scrubbed_text (the product) but NOT
    extracted_text by default: pre-scrub text roughly doubles both the
    Arrow return volume of the fused UDF and the output parquet size,
    and its per-url bytes are already pinned by the parity tests —
    pass emit_extracted=True for a debug/parity run."""
    extra_cols: tuple[str, ...] = ()
    pages = web_pages
    if dedup:
        # project BEFORE the dedup shuffle: the UDF pass reads html
        # (never the raw text column), so shipping text through the
        # exchange would roughly double the shuffle volume for nothing;
        # near-dup is the one consumer of text downstream
        needed = ["url", "warc_ts", "html", "lang"] + (
            ["text"] if near_dup else [])
        if trust_url_canon and "url_canon" in pages.columns:
            # pre-canonicalized bucketed table: keep the layout column
            # so the dedup aggregate runs exchange-free on its scan.
            # Opt-in (run_filter sets it for table:/bucketed: inputs
            # only): a plain parquet input that merely HAPPENS to
            # carry a url_canon column — foreign, or written before a
            # canonical_url change — must be re-canonicalized, not
            # trusted
            needed.append("url_canon")
        pages = exact_dedup_pages(
            pages.select(*[c for c in needed if c in pages.columns]),
            n_buckets)
        extra_cols = ("dup_count",)
    nd_counts = None
    staged = cached = None
    if near_dup:
        if "bucket" not in pages.columns:
            pages = with_bucket(pages, n_buckets)
        # no-op probe BEFORE the near-dup chain: connected_components
        # localCheckpoints (materializes) at DAG-BUILD time, so an
        # idempotent resume of a finished job would otherwise pay the
        # whole MinHash/Jaccard/components cost just to discover there
        # is nothing to do. The probe computes buckets straight from
        # the RAW urls (same key definition as the dedup stage) so it
        # is a column-pruned url scan, not a run of the dedup shuffle.
        from .pipeline import canonical_url

        if dedup:
            # prefer a TRUSTED stored url_canon column: same value,
            # but the probe then scans ONE pruned column of the
            # bucketed table
            key = (F.col("url_canon")
                   if trust_url_canon and "url_canon" in web_pages.columns
                   else canonical_url(F.col("url")))
        else:
            key = F.col("url")
        probe_buckets = web_pages.select(
            F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")
            .alias("bucket")).distinct()
        done_probe = committed_buckets(spark, metrics_path)
        if probe_buckets.join(
                F.broadcast(done_probe), "bucket", "left_anti"
        ).limit(1).count() == 0:
            return {"processed_rows": 0, "processed_buckets": 0}
        if stage_path is not None:
            # crawl-scale staging (VERDICT r4 #3): materialize the
            # deduped frame once instead of persisting html+text in
            # executor memory; each consumer below then plans a plain
            # bucketed scan of the written table (asserted in
            # tests/test_dedup_job.py::test_staged_near_dup_plans)
            from .pipeline import stage_deduped_pages

            staged = stage_deduped_pages(
                spark, pages,
                "lgid_stage_" + hashlib.md5(
                    stage_path.encode()).hexdigest()[:10],
                stage_path, n_buckets)
        else:
            staged = cached = pages.persist()
        losers = near_dup_losers(
            staged, jaccard_min=near_dup_jaccard,
            max_band_bucket=near_dup_max_bucket)
        # counts keyed on the CANONICAL doc's bucket — that bucket
        # always has a surviving row, so the lineage row exists. A
        # loser removed here also takes its exact-dedup dup_count out
        # of the labelled frame, so carry those drops along or the
        # books (input = processed + dedup + near_dup) stop balancing.
        loser_dd = (
            (F.sum(F.col("dup_count") - 1) if dedup else F.lit(0))
            .cast("long").alias("loser_dedup_dropped"))
        # only losers whose OWN bucket is uncommitted are new to the
        # books: a loser sitting in a committed bucket was already
        # accounted in the snapshot that committed it — processed (its
        # row stays in the append-only output) or dropped — and
        # re-counting it on every later resume (near_dup_losers re-runs
        # over the FULL input whenever any bucket is uncommitted) would
        # inflate near_dup_dropped without bound. The output anti-join
        # below still removes ALL losers; committed buckets are never
        # rewritten anyway (the todo anti-join).
        countable = losers.join(F.broadcast(done_probe), "bucket",
                                "left_anti")
        enriched = (countable.join(staged.select(
            "url", *(["dup_count"] if dedup else [])), "url")
            if dedup else countable)
        nd_counts = enriched.groupBy(
            F.col("canon_bucket").alias("bucket")).agg(
            F.count("*").alias("near_dup_dropped"), loser_dd)
        pages = staged.join(
            losers.select("url"), "url", "left_anti")
    try:
        labelled = quality_pipeline(
            spark, pages, n_buckets=n_buckets,
            emit_extracted=emit_extracted, extra_cols=extra_cols)
        if blocked_hosts is not None:
            # optional UT1-style host blocklist (broadcast bounded dim);
            # blocked rows stay in the output with keep=false and a
            # 'blocked_domain' drop reason, counted in the lineage
            # drop_hist like any other rule
            labelled = apply_domain_blocklist(labelled, blocked_hosts)
        _check_append_schema(spark, output_path, labelled.schema.names)
        _check_append_schema(
            spark, metrics_path,
            spark.createDataFrame([], METRICS_SCHEMA).schema.names)
        done = committed_buckets(spark, metrics_path)
        todo = labelled.join(F.broadcast(done), "bucket", "left_anti")

        # cache: output write and lineage agg share the expensive UDF pass
        todo.persist()
        try:
            n_rows = todo.count()
            if n_rows == 0 and not near_dup:
                return {"processed_rows": 0, "processed_buckets": 0}
            # near_dup can leave todo empty while uncommitted probe
            # buckets remain (every doc of every uncommitted bucket
            # lost to a committed-bucket canonical): lineage must still
            # commit those buckets below or resume would re-run the
            # whole near-dup chain forever.
            if n_rows:
                (
                    todo.write.mode("append")
                    .partitionBy("bucket")
                    .parquet(output_path)
                )
            lin = lineage_rows(todo, snapshot_id, nd_counts)
            if near_dup:
                # a bucket whose EVERY doc was a near-dup loser has no
                # surviving rows and thus no lineage row from todo —
                # commit a zero-count row for it or resume would redo
                # the whole near-dup chain forever just to rediscover
                # the empty bucket
                emptied = (
                    probe_buckets
                    .join(F.broadcast(done), "bucket", "left_anti")
                    .join(lin.select("bucket"), "bucket", "left_anti")
                    .select(
                        "bucket",
                        F.lit(snapshot_id).alias("snapshot_id"),
                        F.lit(0).cast("long").alias("input_count"),
                        F.lit(0).cast("long").alias("kept_count"),
                        F.lit(0).cast("long").alias("dedup_dropped"),
                        F.lit(0).cast("long").alias("near_dup_dropped"),
                        F.lit(None).cast("map<string,bigint>")
                        .alias("drop_hist"),
                        F.lit(None).cast("bigint").alias("checksum"),
                    )
                )
                lin = lin.unionByName(emptied)
                # ADVICE r4: on a resume over an EXTENDED input, a new
                # doc can lose to a canonical doc whose bucket is
                # already committed — lineage_rows builds rows from
                # `todo` (uncommitted buckets) only, so that loser's
                # drop would vanish and the books (input = processed +
                # dedup_dropped + near_dup_dropped) silently break.
                # Append a counts-only lineage row per committed canon
                # bucket carrying its near-dup drops (and the exact-
                # dedup drops that left with the losers).
                loser_dd = (
                    F.coalesce(F.col("loser_dedup_dropped"), F.lit(0))
                    if "loser_dedup_dropped" in nd_counts.columns
                    else F.lit(0))
                nd_committed = (
                    nd_counts.join(F.broadcast(done), "bucket", "left_semi")
                    .select(
                        "bucket",
                        F.lit(snapshot_id).alias("snapshot_id"),
                        F.lit(0).cast("long").alias("input_count"),
                        F.lit(0).cast("long").alias("kept_count"),
                        loser_dd.cast("long").alias("dedup_dropped"),
                        F.col("near_dup_dropped").cast("long")
                        .alias("near_dup_dropped"),
                        F.lit(None).cast("map<string,bigint>")
                        .alias("drop_hist"),
                        F.lit(None).cast("bigint").alias("checksum"),
                    )
                )
                lin = lin.unionByName(nd_committed)
            lin.persist()
            n_buckets_done = lin.count()
            lin.write.mode("append").parquet(metrics_path)
            lin.unpersist()
            return {
                "processed_rows": n_rows,
                "processed_buckets": n_buckets_done,
            }
        finally:
            todo.unpersist()
    finally:
        if cached is not None:
            cached.unpersist()
