"""spark-submit entrypoint for the classify lifecycle (the reference's
`lgid classify` command, main.py §3.1).

Usage:
    spark-submit --py-files dist/lgid_spark.zip \\
        lgid_spark/jobs/run_classify.py \\
        --input  '/path/*.freki'        Freki files (or demo: for a
                                        built-in crafted corpus)
        --lang-table /path/lang_table.txt
        --output /path/labelled
        [--model /path/model]           load instead of train
        [--save-model /path/model]
        [--odin-lm /path/lm.parquet]    L-LM* threshold features
        [--crubadan-index idx.csv --crubadan-base /dir]  L-CR-LM* features
        [--common-table codes.txt]      GL-most-frequent-code feature
        [--select-k 4096]               chi² feature selection (M2)
        [--freki-out /dir]              annotated .freki files (S8)

Trains on the input's gold labels when no --model is given (the
reference's train-then-classify smoke), writes labelled lines
partitioned by doc bucket, prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--lang-table", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--model", default=None)
    ap.add_argument("--save-model", default=None)
    ap.add_argument("--odin-lm", default=None,
                    help="LM parquet (lang_code, gram_type, ngram) → "
                         "L-LM* threshold features")
    ap.add_argument("--crubadan-index", default=None,
                    help="Crúbadán directory-index CSV → L-CR-LM* features")
    ap.add_argument("--crubadan-base", default=None,
                    help="base dir of extracted Crúbadán archives")
    ap.add_argument("--common-table", default=None,
                    help="most-common-codes table → GL-most-frequent-code")
    ap.add_argument("--select-k", type=int, default=None,
                    help="chi² feature selection before LR (M2)")
    ap.add_argument("--freki-out", default=None,
                    help="also write annotated .freki files here (S8)")
    ap.add_argument("--mistakes", default=None,
                    help="write the (real, predicted) mistake histogram "
                         "CSV here (S10, main.py:393-415)")
    ap.add_argument("--cv", type=int, default=None, metavar="K",
                    help="additionally run K-fold cross-validation on the "
                         "instances (the reference's n-fold test, "
                         "main.py:188-233) and report per-fold accuracy")
    ap.add_argument("--strict-cv", type=int, default=None, metavar="K",
                    help="leak-free K-fold CV: the ODIN LM is rebuilt per "
                         "fold from train-fold L-lines only")
    ap.add_argument("--weights", default=None,
                    help="write the named feature→coefficient report here "
                         "as CSV (M5, get_feature_weights main.py:426-445)")
    ap.add_argument("--per-file", default=None,
                    help="write per-document accuracy CSV here "
                         "(main.py:419-423 per-file report)")
    ap.add_argument("--num-features", type=int, default=None,
                    help="HashingTF width (default 2^18); small corpora "
                         "train much faster at 4096 with no accuracy loss")
    ap.add_argument("--learner", default="lr", choices=["lr", "gbt"],
                    help="gbt = gradient-boosted trees, the reference's "
                         "AdaBoost alternative (models.py:211-214)")
    ap.add_argument("--disable-features", default=None, metavar="CSV",
                    help="comma-separated base feature names to disable "
                         "(config.ini [features] = no), e.g. "
                         "'L-LMw,L-LMc,L-LMm' for a window-only ablation")
    args = ap.parse_args(argv)

    from lgid_spark.session import get_submit_spark

    spark = get_submit_spark("lgid_classify")

    from lgid_spark.classify import classify_documents, write_labelled_lines

    if args.input == "demo:":
        from lgid_spark.fixtures import LANG_TABLE as table

        langs = [("quenya", "qya"), ("valdese", "vld"), ("molvani", "mv1")]
        rows = []
        for d in range(12):
            doc, (name, code) = f"doc{d}", langs[d % 3]
            rows += [
                (doc, 1, "O", None, None, None, f"notes on the {name} language"),
                (doc, 2, "L", "s1", name, code, "ex am ple li ne"),
                (doc, 3, "G", "s1", None, None, "gloss line"),
            ]
        lines = spark.createDataFrame(
            rows,
            "doc_id string, lineno int, tag string, span_id string, "
            "lang_name string, lang_code string, text string",
        )
    else:
        from lgid_spark.sources.freki import read_freki, read_language_table

        if not args.lang_table:
            raise SystemExit("--lang-table is required for freki input")
        table = read_language_table(args.lang_table)
        lines = read_freki(spark, args.input)

    model = None
    num_features = args.num_features
    if args.model:
        import os

        from pyspark.ml import PipelineModel

        from lgid_spark.operators.classifier import load_model

        model, loaded_nf = load_model(args.model)
        # the width is AUTHORITATIVE when the sidecar recorded it, or
        # when the artifact is a bare LR (its numFeatures IS the hash
        # width — overriding it would mis-dimension the vectors); only
        # a sidecar-less PipelineModel leaves load_model guessing, and
        # there an explicit --num-features wins (ADVICE r3)
        authoritative = (
            os.path.exists(os.path.join(args.model, "_lgid_meta.json"))
            or not isinstance(model, PipelineModel))
        if authoritative:
            if args.num_features and args.num_features != loaded_nf:
                raise SystemExit(
                    f"--num-features {args.num_features} conflicts with "
                    f"the model's training width {loaded_nf}")
            num_features = loaded_nf
        else:
            num_features = args.num_features or loaded_nf

    feature_kwargs = {}
    if args.odin_lm:
        feature_kwargs["odin_lm"] = spark.read.parquet(args.odin_lm)
    if args.crubadan_index and args.crubadan_base:
        from lgid_spark.sources.crubadan import read_crubadan_lm, read_dir_index

        feature_kwargs["crubadan_lm"] = read_crubadan_lm(
            spark, read_dir_index(spark, args.crubadan_index),
            args.crubadan_base)
    if args.common_table:
        from lgid_spark.sources.freki import read_language_table

        feature_kwargs["common_table"] = read_language_table(args.common_table)
    if args.disable_features:
        feature_kwargs["feature_config"] = {
            f.strip(): False for f in args.disable_features.split(",")
            if f.strip()}

    # return_model=True hands back the model classify_documents already
    # trained/used — training happens exactly once, and the saved model
    # is the one that produced the written predictions
    best, used_model = classify_documents(
        spark, lines, table, model=model, return_model=True,
        select_k=args.select_k, num_features=num_features,
        learner=args.learner, **feature_kwargs)
    best.persist()
    n_spans = best.count()
    n_right = best.where("label").count()
    write_labelled_lines(lines, best, args.output)
    if args.freki_out:
        if "raw_head" not in lines.columns:
            raise SystemExit("--freki-out requires .freki input")
        from lgid_spark.sinks.freki_sink import write_labelled_freki

        write_labelled_freki(lines, best, args.freki_out)
    if args.mistakes:
        from pyspark.sql import functions as F

        gold = lines.where(
            F.col("span_id").isNotNull() & F.col("tag").contains("L")
            & F.col("lang_name").isNotNull()
        ).select(
            "doc_id", "span_id", "lineno",
            F.concat_ws(
                "-", F.lower("lang_name"), "lang_code").alias("real_pair"),
        )
        mistakes = (
            best.join(gold, ["doc_id", "span_id", "lineno"])
            .where(F.col("real_pair") != F.col("prediction"))
            .groupBy(F.col("real_pair").alias("real"),
                     F.col("prediction").alias("predicted"))
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("real"), F.asc("predicted"))
        )
        mistakes.coalesce(1).write.mode("overwrite").option(
            "header", "true").csv(args.mistakes)
    if args.per_file:
        from lgid_spark.classify import per_file_accuracy

        per_file_accuracy(best).coalesce(1).write.mode(
            "overwrite").option("header", "true").csv(args.per_file)
    if args.weights:
        import csv

        from lgid_spark.classify import feature_name_list
        from lgid_spark.operators.classifier import feature_weights

        names = feature_name_list(
            odin="odin_lm" in feature_kwargs,
            crubadan="crubadan_lm" in feature_kwargs,
            feature_config=feature_kwargs.get("feature_config"))
        rows = feature_weights(used_model, names, num_features)
        with open(args.weights, "w", newline="") as fh:
            w = csv.DictWriter(
                fh, ["name", "index", "weight", "selected", "collided"])
            w.writeheader()
            w.writerows(rows)
    if args.save_model:
        from lgid_spark.operators.classifier import save_model

        save_model(used_model, args.save_model,
                   num_features=num_features)
    best.unpersist()
    summary = {
        "n_spans": n_spans,
        "n_correct_vs_gold": n_right,
        "output": args.output,
    }
    if args.cv:
        from lgid_spark.classify import (
            build_instances,
            release_instance_caches,
        )
        from lgid_spark.operators.classifier import cross_validate

        inst = build_instances(spark, lines, table, **feature_kwargs)
        cv_kw = {} if num_features is None else {
            "num_features": num_features}
        try:
            summary["cv"] = cross_validate(inst, k=args.cv, **cv_kw)
        finally:
            release_instance_caches(inst)
    if args.strict_cv:
        from lgid_spark.classify import strict_cross_validate

        cv_kw = {} if num_features is None else {
            "num_features": num_features}
        summary["strict_cv"] = strict_cross_validate(
            spark, lines, table, k=args.strict_cv, **cv_kw,
            **feature_kwargs)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
