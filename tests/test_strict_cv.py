"""Leak-free evaluation on the reference's own 99-doc corpus — the
round-3 headline numbers published in BASELINE.md.

Round 2's held-out CV (0.89 mean) built the ODIN-style LM from ALL
gold L-lines, so the LM itself saw test-fold text. strict_cross_validate
rebuilds the LM per fold from train-fold L-lines only; the honest
held-out accuracy is ~0.54 — the leak was worth ~+0.35. The bounds
below pin BOTH directions: a drop below 0.45 is a regression, a jump
above 0.70 means corpus-level LM text is leaking into folds again.

(The reference's production setup sidesteps this: its ODIN LMs are
built from the full external ODIN database — corpus-external evidence
unavailable in this sandbox — so neither 0.89 nor 0.54 contradicts the
reference; they bracket it.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lgid_spark.classify import (
    build_instances,
    feature_name_list,
    strict_cross_validate,
)
from lgid_spark.operators.classifier import (
    best_candidates,
    feature_weights,
    score,
    train,
)
from lgid_spark.operators.lm import build_lm_ngrams
from lgid_spark.sources.freki import read_freki, read_language_table

CORPUS = "/root/reference/sample/input/*.freki"
LANG_TABLE_PATH = "/root/reference/res/lang_table.txt"
NF = 1024  # hash width: measured indistinguishable from 4096 here


@pytest.fixture(scope="module")
def real_lines(spark):
    df = read_freki(spark, CORPUS).where(
        F.col("lineno").isNotNull()).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def real_table():
    return read_language_table(LANG_TABLE_PATH)


def test_strict_cv_real_corpus(spark, real_lines, real_table):
    res = strict_cross_validate(
        spark, real_lines, real_table, k=3, num_features=NF)
    assert len(res) == 3
    assert sum(r["n_groups"] for r in res) == 5307  # every L-line once
    mean = sum(r["accuracy"] for r in res) / len(res)
    # honest band: measured 0.54 (folds 0.39/0.65/0.58); >0.70 would
    # mean the corpus-level LM leak came back
    assert 0.45 <= mean <= 0.70, f"strict CV mean {mean}"


def test_ablation_window_only_vs_lm(spark, real_lines, real_table):
    """Reproduces the published ablation (BASELINE.md): window/GL flags
    alone ~0.56 train accuracy, +ODIN-LM threshold flags ~0.92 — via
    the config.ini-style feature toggles, not by withholding the LM
    table (so the toggle path itself is what's validated)."""
    gold = real_lines.where(
        F.col("span_id").isNotNull() & F.col("tag").contains("L")
        & F.col("lang_code").isNotNull()
    ).select(F.col("lang_code").alias("lang"), "text")
    corpus_lm = build_lm_ngrams(gold, char_n=3, word_n=1, morph_n=2)

    def train_set_accuracy(**kwargs):
        inst = build_instances(
            spark, real_lines, real_table, odin_lm=corpus_lm, **kwargs
        ).persist()
        try:
            model = train(inst, num_features=NF)
            best = best_candidates(score(inst, model, NF))
            agg = best.agg(
                F.count("*").alias("n"),
                F.sum(F.col("label").cast("long")).alias("ok"),
            ).collect()[0]
            return model, agg["ok"] / agg["n"]
        finally:
            inst.unpersist()

    lm_off = {"L-LMw": False, "L-LMc": False, "L-LMm": False}
    _, acc_window = train_set_accuracy(feature_config=lm_off)
    model, acc_full = train_set_accuracy()
    assert acc_window < 0.70, f"window-only {acc_window}"
    assert acc_full >= 0.85, f"full features {acc_full}"
    assert acc_full - acc_window > 0.15

    # M5 sanity on the real model: LM evidence carries top weight
    names = feature_name_list(odin=True)
    rows = feature_weights(model, names, NF)
    top10 = {r["name"] for r in rows[:10]}
    assert any(n.startswith("L-LM") for n in top10), top10
