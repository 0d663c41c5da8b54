"""End-to-end drive of the spark-submit classify job (jobs/run_classify)
through its CLI surface — pins the flag wiring that unit tests bypass,
including the ADVICE-r2 regression: a --select-k --save-model artifact
(a PipelineModel) must be reloadable via --model."""

from __future__ import annotations

import csv
import json

from lgid_spark.jobs.run_classify import main


def test_cli_train_save_weights_perfile_then_reload(
        spark, tmp_path, capsys):
    model_dir = str(tmp_path / "model")
    weights_csv = str(tmp_path / "weights.csv")
    perfile_dir = str(tmp_path / "perfile")

    rc = main([
        "--input", "demo:",
        "--output", str(tmp_path / "out1"),
        "--select-k", "64",
        "--num-features", "4096",
        "--save-model", model_dir,
        "--weights", weights_csv,
        "--per-file", perfile_dir,
        "--strict-cv", "2",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_spans"] == 12
    assert summary["n_correct_vs_gold"] == 12  # demo corpus is separable
    assert len(summary["strict_cv"]) == 2

    with open(weights_csv) as fh:
        rows = list(csv.DictReader(fh))
    assert {r["name"] for r in rows} >= {"W-prev", "GL-first-lines"}
    assert any(float(r["weight"] or 0) != 0 for r in rows if r["weight"])

    pf = [f for f in __import__("glob").glob(perfile_dir + "/*.csv")]
    assert pf, "per-file accuracy CSV written"

    # reload the pipeline artifact through the job's own flag
    rc = main([
        "--input", "demo:",
        "--output", str(tmp_path / "out2"),
        "--model", model_dir,
    ])
    assert rc == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["n_correct_vs_gold"] == 12


def test_cli_ablation_and_gbt(spark, tmp_path, capsys):
    rc = main([
        "--input", "demo:",
        "--output", str(tmp_path / "out3"),
        "--disable-features", "GL-most-frequent,W-closest",
        "--learner", "gbt",
        "--select-k", "32",
        "--num-features", "4096",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_spans"] == 12
    # still separable without those two families via the remaining flags
    assert summary["n_correct_vs_gold"] == 12
