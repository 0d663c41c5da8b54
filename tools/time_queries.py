"""Per-query measurement harness (guide §1): times each named query
with the noop sink (full-column materialization, no driver collect),
labels jobs, and optionally saves .explain("formatted") to a file.

Usage:
  python tools/time_queries.py [--sf DIR] [--plans OUTDIR] [--reps N] q1 q2 ...
  (no query names = the bench HEADLINE list)

Prints one line per query: name, median sec over reps (first rep is a
separately-reported warm-up — codegen/JIT).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = None
    reps = 3
    names: list[str] = []
    suffix = "before"
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as E
    from lgid_spark.entry_queries import RETIRED_QUERIES
    from lgid_spark.session import get_spark

    queries = {**RETIRED_QUERIES, **E.queries()}
    if not names:
        import bench
        names = list(bench.HEADLINE)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "time_queries", master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
        })
    spark.range(1000).count()

    for name in names:
        fn = queries[name]
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        for r in range(reps + 1):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        warm = times[0]
        med = statistics.median(times[1:])
        print(f"{name:32s} median {med:7.3f}s  (warmup {warm:7.3f}s, "
              f"all {[round(x, 3) for x in times[1:]]})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
