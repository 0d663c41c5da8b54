"""Classify-path scale rehearsal (VERDICT r4 item 5).

Round 3 measured the instance build at 5k docs with an ad-hoc snippet;
this makes the rehearsal a committed, repeatable tool and moves it one
order of magnitude up (default 50k docs / 100k L-lines). It drives the
REAL end-to-end classify path — build_instances (the ~15-join evidence
stage) -> LBFGS training -> per-group argmax — on a synthetic IGT
corpus generated distributed (pure column expressions over
spark.range; no driver-side row lists), with the 10^6-doc planner
state active for the plan audit:

* spark.sql.autoBroadcastJoinThreshold = -1 (nothing auto-broadcasts),
  evidence_strategy='shuffle' — the scale posture pinned by
  tests/test_plans.py::test_build_instances_scale_path_no_forced_broadcast;
* asserts: no CartesianProduct, no BroadcastNestedLoopJoin, at most
  one BroadcastExchange (the bounded common-codes dim) in the
  instance-build plan at THIS corpus size.

Prints one JSON line: {"n_docs": ..., "n_lines": ..., "n_instances": ...,
"build_sec": ..., "classify_sec": ..., "accuracy": ...} for the
BASELINE.md scale table.

Usage: python tools/classify_scale_check.py [N_DOCS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_igt_lines(spark, n_docs: int):
    """Synthetic freki-shaped lines, generated distributed: per doc an
    O line naming the doc's language (window evidence), two L lines on
    distinct spans (the classify grain), and a gloss line. Language
    assignment cycles through the fixture table so every candidate
    name occurs corpus-wide and mentions fan out realistically."""
    from pyspark.sql import functions as F

    from lgid_spark.fixtures import LANG_TABLE

    langs = [(n, cs[0]) for n, cs in sorted(LANG_TABLE.items())]
    names = F.array(*[F.lit(n) for n, _ in langs])
    codes = F.array(*[F.lit(c) for _, c in langs])
    d = spark.range(n_docs)
    idx = (F.col("id") % len(langs) + 1).cast("int")  # element_at is 1-based
    other = (F.col("id") % len(langs) + 2).cast("int")
    wrap = F.when(other > len(langs), other - len(langs)).otherwise(other)
    doc = F.concat(F.lit("doc"), F.col("id")).alias("doc_id")
    name, code = F.element_at(names, idx), F.element_at(codes, idx)
    oname = F.element_at(names, wrap)
    rows = [
        d.select(doc, F.lit(1).alias("lineno"), F.lit("O").alias("tag"),
                 F.lit(None).cast("string").alias("span_id"),
                 F.lit(None).cast("string").alias("lang_name"),
                 F.lit(None).cast("string").alias("lang_code"),
                 F.concat(F.lit("field notes on the "), name,
                          F.lit(" language near "), oname).alias("text")),
        d.select(doc, F.lit(2).alias("lineno"), F.lit("L").alias("tag"),
                 F.lit("s1").alias("span_id"), name.alias("lang_name"),
                 code.alias("lang_code"),
                 F.concat(F.lit("ex am ple line "),
                          (F.col("id") % 97).cast("string")).alias("text")),
        d.select(doc, F.lit(3).alias("lineno"), F.lit("G").alias("tag"),
                 F.lit("s1").alias("span_id"),
                 F.lit(None).cast("string").alias("lang_name"),
                 F.lit(None).cast("string").alias("lang_code"),
                 F.lit("example gloss line").alias("text")),
        d.select(doc, F.lit(4).alias("lineno"), F.lit("L").alias("tag"),
                 F.lit("s2").alias("span_id"), name.alias("lang_name"),
                 code.alias("lang_code"),
                 F.concat(F.lit("an other ex am ple "),
                          (F.col("id") % 89).cast("string")).alias("text")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 and not (
        sys.argv[1].startswith("--")) else 50_000
    from pyspark.sql import functions as F

    from lgid_spark.classify import build_instances, classify_documents
    from lgid_spark.fixtures import LANG_TABLE
    from lgid_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("classify_scale", master=f"local[{cpus}]")

    lines = synth_igt_lines(spark, n_docs).persist()
    n_lines = lines.count()

    # plan audit under the 10^6-doc planner state (auto-broadcast off:
    # nothing Catalyst could choose to broadcast at runtime) — the same
    # posture tests/test_plans.py pins at toy size, now held at THIS
    # corpus size; derivation only, no action
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = build_instances(
            spark, lines, LANG_TABLE, common_table=None,
            evidence_strategy="shuffle",
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "CartesianProduct" not in plan, "cartesian in evidence stage"
    assert "BroadcastNestedLoopJoin" not in plan, "BNLJ in evidence stage"
    assert plan.count("BroadcastExchange") <= 1, (
        "forced broadcast of a corpus-sized frame: %d BroadcastExchange"
        % plan.count("BroadcastExchange"))

    # timing under the production posture (AQE decides per stage —
    # the classify-path default since round 3)
    inst = build_instances(
        spark, lines, LANG_TABLE, common_table=None,
        evidence_strategy="shuffle")
    t0 = time.time()
    n_instances = inst.count()
    build_sec = time.time() - t0

    t0 = time.time()
    best = classify_documents(
        spark, lines, LANG_TABLE, evidence_strategy="shuffle")
    # accuracy of the per-group argmax = fraction of L-lines whose
    # winning candidate is the true (label=1) one
    acc = best.agg(F.avg(F.col("label").cast("double"))).collect()[0][0]
    classify_sec = time.time() - t0

    print(json.dumps({
        "n_docs": n_docs, "n_lines": n_lines, "n_instances": n_instances,
        "cpus": int(cpus), "build_sec": round(build_sec, 2),
        "classify_sec": round(classify_sec, 2),
        "accuracy": round(acc, 4) if acc is not None else None,
        "broadcast_exchanges": plan.count("BroadcastExchange"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
