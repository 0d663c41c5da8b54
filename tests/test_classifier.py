"""Classifier surface tests (M1-M7, O1/O2) on synthetic instances."""

from __future__ import annotations

import pytest

from lgid_spark.operators.classifier import (
    best_candidates,
    cross_validate,
    score,
    train,
    with_folds,
)

LANGS = [("tokri", "tk1"), ("molvani", "mv1"), ("quenya", "qya")]


def _instances(n_docs: int = 24):
    """Synthetic candidate rows: the correct candidate carries
    'in_span' + 'w_close' features; wrong ones carry noise flags."""
    rows = []
    for d in range(n_docs):
        doc = f"doc{d}"
        correct = LANGS[d % len(LANGS)]
        for (name, code) in LANGS:
            is_right = (name, code) == correct
            feats = {
                "in_span": is_right,
                "w_close": is_right,
                "w_prev": True,
                f"name_{name}": True,
            }
            rows.append((doc, "s1", 10, name, code, is_right, feats))
    return rows


SCHEMA = (
    "doc_id string, span_id string, lineno int, lang_name string, "
    "lang_code string, label boolean, feats map<string,boolean>"
)


@pytest.fixture(scope="module")
def instances(spark):
    return spark.createDataFrame(_instances(), SCHEMA)


def test_train_score_argmax(spark, instances):
    model = train(instances)
    best = best_candidates(score(instances, model))
    rows = best.collect()
    assert len(rows) == 24  # one winner per group
    acc = sum(1 for r in rows if r.label) / len(rows)
    assert acc == 1.0  # separable by construction
    for r in rows:
        assert r.norm_prob == 1.0  # winner is the group max
        assert r.prediction == f"{r.lang_name}-{r.lang_code}"
        assert r.signed_prob > 0


def test_tie_break_deterministic(spark):
    # two candidates with identical feats → identical p_true → tie
    rows = [
        ("d", "s", 1, "zebra", "zz", False, {"x": True}),
        ("d", "s", 1, "alpha", "aa", False, {"x": True}),
        ("d", "s", 1, "alpha", "ab", False, {"x": True}),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    model = train(df)
    best = best_candidates(score(df, model)).collect()
    assert len(best) == 1
    # min-max degenerate group → norm 1.0; tie broken by name, then code
    assert (best[0].lang_name, best[0].lang_code) == ("alpha", "aa")
    assert best[0].norm_prob == 1.0


def test_signed_prob_negative_when_unconfident(spark, instances):
    model = train(instances)
    scored = score(instances, model)
    wrong = scored.where("label = false")
    row = best_candidates(wrong).first()
    # all candidates in the group are wrong → winner has p_true < 0.5
    assert row.signed_prob < 0


def test_model_save_load_roundtrip(spark, instances, tmp_path):
    from pyspark.ml.classification import LogisticRegressionModel

    model = train(instances)
    path = str(tmp_path / "model")
    model.write().overwrite().save(path)
    loaded = LogisticRegressionModel.load(path)
    a = best_candidates(score(instances, model)).select("doc_id", "prediction")
    b = best_candidates(score(instances, loaded)).select("doc_id", "prediction")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_folds_deterministic_and_partitioning(spark, instances):
    f1 = with_folds(instances, 5).select("doc_id", "fold").distinct().collect()
    f2 = with_folds(instances, 5).select("doc_id", "fold").distinct().collect()
    assert sorted(map(tuple, f1)) == sorted(map(tuple, f2))
    per_doc = {}
    for r in f1:
        per_doc.setdefault(r.doc_id, set()).add(r.fold)
    assert all(len(v) == 1 for v in per_doc.values())


def test_chi2_feature_selection(spark, instances, tmp_path):
    """M2 (models.py:80-107 SelectKBest(chi2, k)): selection shrinks the
    feature space to k and the separable fixture stays at accuracy 1.0;
    the [selector, LR] pipeline round-trips through save/load."""
    from pyspark.ml import PipelineModel

    model = train(instances, select_k=4)
    sel = model.stages[0]
    assert len(sel.selectedFeatures) == 4  # vector width is now k
    best = best_candidates(score(instances, model)).collect()
    assert sum(1 for r in best if r.label) / len(best) == 1.0
    # the informative flags survive chi² ranking: LR weights live on a
    # 4-dim vector, not the 2^18 hash space
    assert model.stages[1].numFeatures == 4
    path = str(tmp_path / "chi2_model")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    again = best_candidates(score(instances, loaded)).collect()
    assert sorted((r.doc_id, r.prediction) for r in again) == sorted(
        (r.doc_id, r.prediction) for r in best)


def test_cross_validate(spark, instances):
    results = cross_validate(instances, k=3)
    assert len(results) == 3
    for r in results:
        assert r["accuracy"] == 1.0  # separable everywhere


def test_save_load_model_sidecar(spark, instances, tmp_path):
    """ADVICE r2: a --select-k --save-model artifact is a PipelineModel;
    save_model/load_model round-trip the concrete class AND the HashingTF
    width (a pipeline's LR.numFeatures is post-selection, not the hash
    width), so run_classify --model can reload either kind."""
    from pyspark.ml import PipelineModel

    from lgid_spark.operators.classifier import load_model, save_model

    # pipeline artifact at a non-default hash width
    model = train(instances, select_k=4, num_features=1024)
    path = str(tmp_path / "sidecar_pipe")
    save_model(model, path, num_features=1024)
    loaded, nf = load_model(path)
    assert isinstance(loaded, PipelineModel)
    assert nf == 1024
    a = best_candidates(score(instances, model, 1024)).collect()
    b = best_candidates(score(instances, loaded, nf)).collect()
    assert sorted((r.doc_id, r.prediction) for r in a) == sorted(
        (r.doc_id, r.prediction) for r in b)

    # bare LR artifact, sidecar-less load falls back to numFeatures
    lr = train(instances, num_features=512)
    path2 = str(tmp_path / "sidecar_lr")
    lr.write().overwrite().save(path2)
    loaded2, nf2 = load_model(path2)
    assert nf2 == 512
    c = best_candidates(score(instances, loaded2, nf2)).collect()
    d = best_candidates(score(instances, lr, 512)).collect()
    assert sorted((r.doc_id, r.prediction) for r in c) == sorted(
        (r.doc_id, r.prediction) for r in d)


def test_feature_weights_named_report(spark, instances):
    """M5 (get_feature_weights, main.py:426-445): the separable
    fixture's informative flags carry the largest |coef|; a noise flag
    present on every row carries ~none; chi²-dropped slots report as
    not-selected (the hashed analog of "Features not used")."""
    from lgid_spark.operators.classifier import (
        feature_weights,
        unused_features,
    )

    names = ["in_span", "w_close", "w_prev",
             "name_tokri", "name_molvani", "name_quenya", "ghost_flag"]
    model = train(instances, num_features=1024)
    rows = feature_weights(model, names, 1024)
    by_name = {r["name"]: r for r in rows}
    assert not any(r["collided"] for r in rows)  # 7 names in 1024 slots
    # informative flags dominate: top-2 by |weight| are the two markers
    assert {rows[0]["name"], rows[1]["name"]} == {"in_span", "w_close"}
    assert abs(by_name["w_prev"]["weight"]) < abs(by_name["in_span"]["weight"])
    # a name never emitted hashes to an untouched slot → weight 0
    assert by_name["ghost_flag"]["weight"] == 0.0
    assert "ghost_flag" in unused_features(model, names, 1024)

    # pipeline variant: chi² keeps k slots; dropped names report None
    pipe = train(instances, select_k=2, num_features=1024)
    prows = feature_weights(pipe, names, 1024)
    pby = {r["name"]: r for r in prows}
    assert pby["in_span"]["selected"] and pby["in_span"]["weight"] != 0.0
    assert not pby["ghost_flag"]["selected"]
    assert "ghost_flag" in unused_features(pipe, names, 1024)


def test_gbt_learner(spark, instances):
    """The reference's boosted alternative learner (AdaboostWrapper,
    models.py:211-214) as GBTClassifier: separable fixture stays at
    accuracy 1.0 through the same score/argmax path."""
    model = train(instances, select_k=4, num_features=1024, learner="gbt")
    best = best_candidates(score(instances, model, 1024)).collect()
    assert sum(1 for r in best if r.label) / len(best) == 1.0


def test_score_width_mismatch_raises(spark, instances):
    """ADVICE r2 tail: scoring a chi²-pipeline model at the wrong hash
    width used to silently mis-hash; a provable mismatch (a selected
    index beyond the scoring width) now raises."""
    model = train(instances, select_k=4, num_features=4096)
    sel_max = max(model.stages[0].selectedFeatures)
    if sel_max >= 64:  # fixture-dependent but overwhelmingly likely
        with pytest.raises(ValueError, match="hash width mismatch"):
            score(instances, model, 64).collect()
    # correct width still fine
    best = best_candidates(score(instances, model, 4096)).collect()
    assert sum(1 for r in best if r.label) / len(best) == 1.0


def test_gbt_feature_importances_named_report(spark, instances):
    """VERDICT r3 item 5: feature_weights on a tree model reports named
    featureImportances through the same HashingTF slot mapping — for a
    chi²-selected GBT pipeline AND a bare GBT model (which used to
    crash with AttributeError instead of a useful answer)."""
    from lgid_spark.operators.classifier import feature_weights

    names = ["in_span", "w_close", "w_prev",
             "name_tokri", "name_molvani", "name_quenya", "ghost_flag"]
    pipe = train(instances, select_k=4, num_features=1024, learner="gbt")
    rows = feature_weights(pipe, names, 1024)
    by_name = {r["name"]: r for r in rows}
    # importances are non-negative and someone carries signal
    assert all(r["weight"] is None or r["weight"] >= 0.0 for r in rows)
    assert any(r["weight"] for r in rows if r["weight"] is not None)
    # the separable fixture's markers carry the importance mass
    top = rows[0]["name"]
    assert top in {"in_span", "w_close"}
    assert not by_name["ghost_flag"]["selected"] or \
        by_name["ghost_flag"]["weight"] == 0.0

    # bare GBT (no selector): same named report, no crash
    bare = train(instances, num_features=256, learner="gbt")
    brows = feature_weights(bare, names, 256)
    assert all(r["weight"] is not None for r in brows)
    assert all(r["weight"] >= 0.0 for r in brows)


def test_score_warns_on_unknown_pipeline_width(spark, instances):
    """ADVICE r3: a select-k pipeline trained narrow but scored with
    num_features=None passes the index guard yet mis-hashes — score()
    must at least warn that it's assuming the default width."""
    import warnings

    model = train(instances, select_k=4, num_features=1024)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        score(instances, model)  # plan only — the warning fires eagerly
    assert any("num_features" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        score(instances, model, 1024)
    assert not [x for x in w2 if "num_features" in str(x.message)]
