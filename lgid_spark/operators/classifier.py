"""Candidate-language classifier — the reference's model surface
(/root/reference/lgid/models.py) re-expressed on spark.ml.

  M1 DictVectorizer   → HashingTF over active feature names (stateless
                        hashing ⇒ no fitted vocabulary to ship; the
                        scale-friendly choice for 10^12 rows)
  M3 LogisticRegression fit (models.py:113-125)
  M4 predict_proba    → model.transform → probability vector column
  M6 (de)serialize    → spark.ml save/load (models.py:189-203)
  M7 n-fold CV        → deterministic xxhash64(doc_id) % k folds
                        (replaces random.seed(1) shuffling, main.py:188-233)
  O1 per-group argmax + min-max normalize (main.py:301-323): ties take
     the first candidate by (lang_name, lang_code) — np.argmax-first
     pinned deterministically.
  O2 signed prob: probability negated when the best class is False
     (main.py:314-319).

Instances follow FIXTURES.md §7:
  (doc_id, span_id, lineno, lang_name, lang_code, label boolean,
   feats map<string,boolean>)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.feature import HashingTF

N_FEATURES = 1 << 18

GROUP = ["doc_id", "span_id", "lineno"]


def vectorize(instances: DataFrame,
              num_features: int = N_FEATURES) -> DataFrame:
    """map<string,boolean> feats → sparse vector of hashed active keys.
    (Sparse boolean dict ≡ bag of active feature names.)
    `num_features` sizes the hash space; small fixtures can use a small
    width so LBFGS doesn't aggregate 2^18-dim vectors per iteration."""
    active = F.sort_array(
        F.map_keys(F.map_filter("feats", lambda _, v: v))
    )
    df = instances.withColumn("active_feats", active)
    tf = HashingTF(
        inputCol="active_feats", outputCol="features",
        numFeatures=num_features, binary=True,
    )
    return tf.transform(df)


def train(instances: DataFrame, select_k: int | None = None,
          num_features: int = N_FEATURES, learner: str = "lr"):
    """M3 LR fit; with select_k, M2 chi² feature selection first
    (models.py:80-107 SelectKBest(chi2, k) → UnivariateFeatureSelector
    with categorical feature+label = chi-squared scoring). Returns a
    LogisticRegressionModel, or a PipelineModel [selector, LR] whose
    .transform chains selection into scoring — both serialize through
    spark.ml save/load (M6).

    learner='gbt' swaps in GBTClassifier — the spark.ml analog of the
    reference's boosted alternative learner (AdaboostWrapper,
    models.py:211-214; SURVEY maps AdaBoost → gradient-boosted trees).
    GBT needs a dense-ish space, so pair it with select_k (a 2^18-dim
    sparse vector makes tree training explode); its model also exposes
    probabilityCol, so score()/best_candidates work unchanged."""
    vec = vectorize(instances, num_features).withColumn(
        "label_d", F.col("label").cast("double"))

    def _estimator(features_col: str):
        if learner == "gbt":
            from pyspark.ml.classification import GBTClassifier

            return GBTClassifier(
                featuresCol=features_col, labelCol="label_d",
                maxIter=20, maxDepth=3, seed=1,  # random.seed(1) analog
            )
        if learner != "lr":
            raise ValueError(f"unknown learner {learner!r}")
        return LogisticRegression(
            featuresCol=features_col, labelCol="label_d",
            regParam=1e-4, maxIter=100, standardization=False,
        )

    if select_k is None:
        return _estimator("features").fit(vec)
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import UnivariateFeatureSelector

    sel = (
        UnivariateFeatureSelector(
            featuresCol="features", outputCol="selected",
            labelCol="label_d")
        .setFeatureType("categorical")
        .setLabelType("categorical")  # categorical×categorical ⇒ chi²
        .setSelectionMode("numTopFeatures")
        .setSelectionThreshold(select_k)
    )
    return Pipeline(stages=[sel, _estimator("selected")]).fit(vec)


def feature_weights(model, feature_names: list[str],
                    num_features: int | None = None) -> list[dict]:
    """M5 named-weight inspection — the reference's get_feature_weights
    (main.py:426-445): feature name → LR coefficient, plus which
    configured features the model never uses.

    The reference's DictVectorizer stores a vocabulary, so it walks
    feat_names(); HashingTF stores nothing — instead each KNOWN feature
    name is hashed into the same 2^k slot the trainer used
    (HashingTF.indexOf) and the coefficient is read from that slot.
    Caveats reported per row: `collided` marks names sharing a slot
    (their weights are inherently pooled), and for a chi²-selected
    PipelineModel a slot the selector dropped has weight None with
    selected=False — the hashed analog of "feature not used".

    Tree learners (learner='gbt') report `featureImportances` in the
    weight column instead of LR coefficients — same named-slot mapping,
    weights are the non-negative split-gain importances (the boosted
    analog the reference's weights dump lacks).

    Returns rows {name, index, weight, selected, collided} sorted by
    |weight| desc (None-weights last)."""
    from collections import Counter

    from pyspark.ml import PipelineModel

    if isinstance(model, PipelineModel):
        sel, clf = model.stages[0], model.stages[-1]
    else:
        sel, clf = None, model
    if hasattr(clf, "coefficients"):
        vals = clf.coefficients.toArray()
    elif hasattr(clf, "featureImportances"):
        vals = clf.featureImportances.toArray()
    else:
        raise ValueError(
            "feature_weights needs a linear model (coefficients) or a "
            f"tree model (featureImportances); got {type(clf).__name__}")
    if sel is not None:
        nf = int(num_features or N_FEATURES)
        # the selector model emits the sliced vector in SORTED original-
        # index order regardless of selectedFeatures' ranking order
        pos = {orig: i for i, orig in enumerate(sorted(sel.selectedFeatures))}

        def weight_at(idx: int):
            return float(vals[pos[idx]]) if idx in pos else None
    else:
        nf = int(num_features or getattr(model, "numFeatures", N_FEATURES))

        def weight_at(idx: int):
            return float(vals[idx])

    tf = HashingTF(numFeatures=nf, inputCol="_in", outputCol="_out")
    idx_of = {name: tf.indexOf(name) for name in feature_names}
    slot_counts = Counter(idx_of.values())
    rows = [
        {
            "name": name,
            "index": idx,
            "weight": weight_at(idx),
            "selected": weight_at(idx) is not None,
            "collided": slot_counts[idx] > 1,
        }
        for name, idx in idx_of.items()
    ]
    rows.sort(key=lambda r: (
        r["weight"] is None, -abs(r["weight"] or 0.0), r["name"]))
    return rows


def unused_features(model, feature_names: list[str],
                    num_features: int | None = None,
                    tol: float = 0.0) -> list[str]:
    """The reference's "Features not used" report (main.py:435-442):
    configured feature names whose model weight is absent (dropped by
    chi² selection) or exactly zero (|w| <= tol)."""
    return sorted(
        r["name"] for r in feature_weights(model, feature_names, num_features)
        if r["weight"] is None or abs(r["weight"]) <= tol
    )


def save_model(model, path: str, num_features: int | None = None) -> None:
    """M6 serialize + a sidecar recording what spark.ml metadata alone
    can't reconstruct at load time: the concrete model class (a
    --select-k artifact is a PipelineModel [selector, LR], not a bare
    LogisticRegressionModel) and the HashingTF width used at training
    (a PipelineModel's LR sees post-selection dims, so `numFeatures`
    is NOT the hash width). Reference analog: models.py:189-203 pickles
    the whole wrapper, which carries both implicitly."""
    import json
    import os

    model.write().overwrite().save(path)
    meta = {
        "model_class": type(model).__name__,
        "num_features": int(num_features or N_FEATURES),
    }
    with open(os.path.join(path, "_lgid_meta.json"), "w") as fh:
        json.dump(meta, fh)


def load_model(path: str):
    """Counterpart of save_model: returns (model, num_features).

    Reads the sidecar when present; otherwise falls back to trying
    LogisticRegressionModel then PipelineModel, inferring the hash
    width from a bare LR's numFeatures (for a sidecar-less pipeline
    artifact the width defaults to N_FEATURES — the train() default)."""
    import json
    import os

    from pyspark.ml import PipelineModel

    meta_path = os.path.join(path, "_lgid_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        cls = (PipelineModel if meta["model_class"] == "PipelineModel"
               else LogisticRegressionModel)
        return cls.load(path), int(meta["num_features"])
    try:
        model = LogisticRegressionModel.load(path)
        return model, int(getattr(model, "numFeatures", N_FEATURES))
    except Exception:
        return PipelineModel.load(path), N_FEATURES


def score(instances: DataFrame, model,
          num_features: int | None = None) -> DataFrame:
    """Add p_true = P(label=True | feats) per candidate row. `model` is
    a LogisticRegressionModel or a [selector, LR] PipelineModel. The
    hash width must match training: inferred from a plain LR model,
    passed explicitly for selector pipelines trained at non-default
    width."""
    from pyspark.ml.functions import vector_to_array

    from pyspark.ml import PipelineModel

    explicit_width = num_features is not None
    if num_features is None:
        num_features = getattr(model, "numFeatures", None) or N_FEATURES

    if isinstance(model, PipelineModel):
        sel = model.stages[0]
        selected = getattr(sel, "selectedFeatures", None)
        if selected is not None and selected and max(selected) >= num_features:
            raise ValueError(
                f"hash width mismatch: model selects feature index "
                f"{max(selected)} but scoring uses num_features="
                f"{num_features}; pass the training width (load_model "
                f"returns it from the sidecar)")
        if not explicit_width:
            # the guard above is one-directional: a pipeline trained at
            # a NARROW width scored at the default 2^18 passes it (all
            # selected indices fit) yet hashes names to different
            # slots and silently mis-scores (ADVICE r3) — a pipeline
            # model does not record its hash width, so it must come
            # from the caller / the save_model sidecar
            import warnings

            warnings.warn(
                "score(): PipelineModel scored without an explicit "
                f"num_features — assuming the default {N_FEATURES}. If "
                "the model was trained at another width this silently "
                "mis-scores; pass the training width (load_model "
                "returns it from the sidecar).",
                stacklevel=2)
    vec = vectorize(instances, num_features)
    out = model.transform(vec)
    p_true = F.element_at(vector_to_array(F.col("probability")), 2)
    return out.withColumn("p_true", p_true).drop(
        "rawPrediction", "probability", "prediction", "features",
        "selected", "active_feats",
    )


def best_candidates(scored: DataFrame) -> DataFrame:
    """O1/O2: signed prob per candidate, min-max normalized within each
    (doc,span,line) group; keep the argmax candidate.

    find_best_and_normalize (main.py:301-323): the probability of the
    argmax CLASS is negated when that class is False — in p_true terms
    signed = p_true if p_true ≥ 0.5 else −(1−p_true) = p_true − 1
    (monotonic in p_true, so the winner is still the p_true argmax) —
    and the min-max normalization runs over the SIGNED values. The
    reference divides by zero when max==min (NaN); we pin that to 1.0."""
    w = Window.partitionBy(*GROUP)
    rk = Window.partitionBy(*GROUP).orderBy(
        F.desc("p_true"), F.asc("lang_name"), F.asc("lang_code"))
    signed = F.when(
        F.col("p_true") >= 0.5, F.col("p_true")
    ).otherwise(F.col("p_true") - 1)
    norm = F.when(
        F.max(signed).over(w) == F.min(signed).over(w), F.lit(1.0)
    ).otherwise(
        (signed - F.min(signed).over(w))
        / (F.max(signed).over(w) - F.min(signed).over(w))
    )
    return (
        scored.withColumn("norm_prob", norm)
        .withColumn("signed_prob", signed)
        .withColumn("_rk", F.row_number().over(rk))
        .where(F.col("_rk") == 1)
        .drop("_rk")
        .withColumn(
            "prediction", F.concat_ws("-", "lang_name", "lang_code"))
    )


def with_folds(instances: DataFrame, k: int = 5) -> DataFrame:
    """M7: deterministic fold assignment by document (same doc never
    straddles train/test, matching the reference's by-file folds)."""
    return instances.withColumn(
        "fold", F.pmod(F.xxhash64("doc_id"), F.lit(k)).cast("int"))


def cross_validate(instances: DataFrame, k: int = 5,
                   num_features: int = N_FEATURES) -> list[dict]:
    """Per-fold train/test accuracy on the group-argmax prediction
    (accuracy = fraction of groups whose winning candidate has
    label=True — main.py:374-423 'right' counting)."""
    folded = with_folds(instances, k).persist()
    results = []
    try:
        for fold in range(k):
            train_df = folded.where(F.col("fold") != fold)
            test_df = folded.where(F.col("fold") == fold)
            if test_df.limit(1).count() == 0:
                continue
            if train_df.limit(1).count() == 0:
                # every doc hashed into this one fold (tiny corpus):
                # LR.fit on an empty frame throws — skip, don't die
                continue
            model = train(train_df, num_features=num_features)
            best = best_candidates(score(test_df, model, num_features))
            agg = best.agg(
                F.count("*").alias("n"),
                F.sum(F.col("label").cast("long")).alias("right"),
            ).collect()[0]
            results.append({
                "fold": fold,
                "n_groups": agg["n"],
                "accuracy": (agg["right"] or 0) / agg["n"] if agg["n"] else 0.0,
            })
    finally:
        folded.unpersist()
    return results
