"""The composed classify lifecycle — the reference's flagship path
(/root/reference/lgid/main.py §3.1: get_instances → model.test →
find_best_and_normalize → write_to_files), assembled from this engine's
operators as one lazy DataFrame DAG:

  lines ──▶ extract_mentions (broadcast table, mapInPandas)
        ──▶ evidence features (range joins + window aggs, broadcast-side)
        ──▶ instances: one row per (L-line × doc-wide candidate pair),
            exactly the reference grain (main.py:588-633: candidates are
            ALL (name, code) pairs mentioned anywhere in the doc, and
            one StringInstance is yielded per L-line per pair)
        ──▶ HashingTF + LogisticRegression score
        ──▶ per-group min-max argmax → prediction per L-line
        ──▶ labelled lines (S8 sink shape)

Feature keys are the reference's exact feature-name strings
(features.py gl/w/l/g/t/m families + add_nums crosses + LM threshold
flags), so a feature dump is directly comparable with the reference's
.vector files (main.py print_feature_vector)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.classifier import best_candidates, score, train
from .operators.evidence import (
    adaptive_window_features,
    closest_mentions,
    doc_bounds,
    doc_edge_mentions,
    doc_frequent_mentions,
    frequent_mentions,
    in_line_mentions,
    in_line_mentions_by_line,
    span_bounds,
    window_features,
)
from .operators.lm import lm_line_match_ratios
from .operators.mentions import extract_mentions, normalize_name

# res/english_word_language_names.txt — language names that are common
# English words (features.py:372-382 flag_common_words; SURVEY J6).
ENGLISH_WORD_LANG_NAMES = [
    "so", "she", "even", "thompson", "maria", "male", "doe", "chin",
    "dan", "karen", "day", "gun", "crow", "nora", "sabine", "kim",
    "median",
]

SHORT_NAME_SIZE = 3  # config.ini:37
LANGS_LT = [5, 10, 15, 20, 40]  # add_nums, features.py:211-214
LM_THRESHOLDS = [round(0.1 * k, 2) for k in range(1, 11)]  # features.py:349-354
ODIN_FAMILIES = ["L-LMw", "L-LMc", "L-LMm"]
CRUBADAN_FAMILIES = ["L-CR-LMw", "L-CR-LMc"]
_RATIO_ALIAS = {
    "L-LMw": "lmw_ratio", "L-LMc": "lmc_ratio", "L-LMm": "lmm_ratio",
    "L-CR-LMw": "cr_lmw_ratio", "L-CR-LMc": "cr_lmc_ratio",
}

_DS = ["doc_id", "span_id", "name", "code"]
_DN = ["doc_id", "name", "code"]
_DSL = ["doc_id", "span_id", "lineno", "name", "code"]


def _flag(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    return df.select(*keys, F.lit(True).alias(col))


def _pivot_ratios(
    ratios: DataFrame, families: list[str], keys: list[str] | None = None
) -> DataFrame:
    keys = keys or ["doc_id", "span_id", "lineno", "code"]
    piv = ratios.groupBy(*keys).pivot("family", families).agg(
        F.first("ratio"))
    return piv.select(
        *keys,
        *[F.col(f"`{fam}`").alias(_RATIO_ALIAS[fam]) for fam in families],
    )


def feature_name_list(
    odin: bool = False,
    crubadan: bool = False,
    feature_config: dict[str, bool] | None = None,
) -> list[str]:
    """Every feature-name string build_instances can emit, in emission
    order — the HashingTF-era stand-in for the reference's stored
    DictVectorizer vocabulary (models.py feat_names()), consumed by the
    M5 named-weights report. Kept in lockstep with build_instances by
    tests/test_classifier.py::test_feature_name_list_matches_instances."""
    names = [
        "W-prev", "W-close", "W-after", "W-close-after",
        "W-frequent", "W-frequent-after", "W-closest", "W-closest-after",
        "W=500&langs>20-frequent", "W=500&langs>20-frequent-after",
        "W=500&lines>2000-frequent", "W=500&lines>2000-frequent-after",
        "L-in-line", "G-in-line", "T-in-line", "M-in-line",
    ]
    gl_base = ["GL-first-lines", "GL-last-lines", "GL-frequent",
               "GL-most-frequent"]
    names += gl_base
    for fname in gl_base:
        for i in LANGS_LT:
            names.append(f"{fname}&langs<{i}")
    names += [
        "GL-most-frequent-code", "GL-is-english",
        "GL-possible-english-word", "GL-short-lang-name",
        "GL-multi-word-name",
    ]
    names += [f"GL-C-name<{i}" for i in range(1, 10)]
    fams = (ODIN_FAMILIES if odin else []) + (
        CRUBADAN_FAMILIES if crubadan else [])
    for fam in fams:
        names += [f"{fam}>{thr}" for thr in LM_THRESHOLDS]
    if feature_config:
        names = [n for n in names if _feature_enabled(n, feature_config)]
    return names


def _lm_flag_entries(families: list[str]) -> list[tuple[str, F.Column]]:
    """Cumulative LM threshold flags (features.py:349-354) from the
    pivoted ratio columns — shared by build_instances and the per-fold
    LM append in strict_cross_validate."""
    entries: list[tuple[str, F.Column]] = []
    for fam in families:
        r = F.col(_RATIO_ALIAS[fam])
        for thr in LM_THRESHOLDS:
            entries.append(
                (f"{fam}>{thr}", F.coalesce(r >= thr, F.lit(False))))
    return entries


# derived features the reference emits INSIDE another feature's gate:
# (predicate on the derived name, the governing config key). Without
# these, disabling the base feature leaves its nested derivations on —
# a feature set the reference ablation cannot produce.
_PARENT_GATES: tuple = (
    # features.py:101-113: the adaptive W=500 variants run inside
    # `if config['W-frequent(-after)'] == 'yes'`
    (lambda f: f.startswith("W=500&") and f.endswith("-frequent-after"),
     "W-frequent-after"),
    (lambda f: f.startswith("W=500&") and f.endswith("-frequent"),
     "W-frequent"),
    # features.py:385-387: GL-C-name<i is emitted inside the
    # GL-short-lang-name block
    (lambda f: f.startswith("GL-C-name<"), "GL-short-lang-name"),
    # features.py:49-50,368: most_frequent_code (and the
    # GL-multi-word-name it contains) only runs under
    # GL-most-frequent-code
    (lambda f: f == "GL-multi-word-name", "GL-most-frequent-code"),
)


def _feature_enabled(fname: str, config: dict[str, bool]) -> bool:
    """config.ini-[features]-style gate: a feature is governed by the
    LONGEST config key that equals it or is a base-prefix of it (the
    next char being a derivation separator &, >, < — so "W-close"
    does NOT govern "W-closest"). Unmentioned names stay enabled.
    Nested derivations (see _PARENT_GATES) additionally require their
    parent feature's gate."""
    for pred, parent in _PARENT_GATES:
        if pred(fname) and not config.get(parent, True):
            return False
    best_key = None
    for key in config:
        if fname == key or (
            fname.startswith(key) and fname[len(key)] in "&><"
        ):
            if best_key is None or len(key) > len(best_key):
                best_key = key
    return True if best_key is None else bool(config[best_key])


def build_instances(
    spark: SparkSession,
    lines: DataFrame,
    lang_table: dict[str, list[str]],
    odin_lm: DataFrame | None = None,
    crubadan_lm: DataFrame | None = None,
    common_table: dict[str, list[str]] | None = None,
    eng_words: list[str] | None = None,
    name_keyed_lms: bool = False,
    feature_config: dict[str, bool] | None = None,
    evidence_strategy: str = "shuffle",
) -> DataFrame:
    """lines(doc_id, lineno, tag, span_id, lang_name, lang_code, text)
    → instances (FIXTURES.md §7 schema, grain = L-line × candidate).

    Candidate set: every (name, code) mentioned anywhere in the doc
    (main.py:568 features_template), NOT just window-evidenced pairs.
    Optional LM tables (lang_code, gram_type, ngram) enable the
    L-LM*/L-CR-LM* cumulative threshold flags (features.py:300-354);
    `common_table` enables GL-most-frequent-code (features.py:357-369).

    `feature_config` reproduces the reference's config.ini [features]
    yes/no toggles (features.py branches on config['features'][name]):
    a map from base feature name (e.g. "W-prev", "GL-first-lines",
    "L-LMw") to enabled; a toggle also gates its derived crosses
    ("GL-first-lines&langs<5") and threshold flags ("L-LMw>0.3") —
    longest matching base wins, names not mentioned stay enabled. This
    is what makes the reference's published ablations reproducible
    (e.g. window-only vs +LM).

    `evidence_strategy`: 'shuffle' (default) leaves evidence-join
    selection to Catalyst/AQE — measured FASTER warm at 5k docs
    (build 9.3s vs 12.5s; full classify 14.8s vs 16.7s, local[32])
    because AQE broadcasts per-stage only where runtime sizes justify
    it, and it is the only safe strategy when the span/bound/qualifier
    frames (one row per span/doc) outgrow the driver at 10^6+ docs.
    'broadcast' force-broadcasts those frames — slightly faster on a
    COLD first run (no AQE re-planning) for small one-shot jobs
    (operators/evidence.evidence_join_strategy)."""
    if eng_words is None:
        eng_words = ENGLISH_WORD_LANG_NAMES
    # drop zero-line-block placeholder rows (sources/freki.py keeps them
    # for the byte-stable sink; they are not lines)
    lines = lines.where(F.col("lineno").isNotNull())
    mention_cols = ["doc_id", "lineno", "text"] + (
        # block_id gates the two-line splice (the reference never pairs
        # lines across Freki blocks — operators/mentions.py)
        ["block_id"] if "block_id" in lines.columns else [])
    mentions = extract_mentions(
        spark, lines.select(*mention_cols), lang_table
    ).persist()  # feeds ~14 feature branches; tiny vs lines
    spans = span_bounds(lines)
    bounds = doc_bounds(lines)
    cands = mentions.select(*_DN).distinct()
    num_langs = mentions.groupBy("doc_id").agg(
        F.countDistinct("name").alias("num_langs"))  # main.py:570 lang_names

    l_lines = lines.filter(
        F.col("span_id").isNotNull() & F.col("tag").contains("L")
    ).select(
        "doc_id", "span_id", "lineno",
        F.col("lang_name").alias("gold_name"),
        F.col("lang_code").alias("gold_code"),
        "text",
    )

    from .operators.evidence import evidence_join_strategy

    with evidence_join_strategy(evidence_strategy):
        # --- span-level feature frames (key: doc, span, name, code) ---
        wf = window_features(mentions, spans)
        fq_b = _flag(frequent_mentions(mentions, spans).where("frequent"),
                     _DS, "w_frequent")
        fq_a = _flag(frequent_mentions(mentions, spans, after=True)
                     .where("frequent"), _DS, "w_frequent_after")
        cl_b = _flag(closest_mentions(mentions, spans).select(*_DS).distinct(),
                     _DS, "w_closest")
        cl_a = _flag(closest_mentions(mentions, spans, after=True)
                     .select(*_DS).distinct(), _DS, "w_closest_after")
        ad_b = adaptive_window_features(mentions, spans, lines).select(
            *_DS, F.col("by_langs").alias("w500_langs"),
            F.col("by_lines").alias("w500_lines"))
        ad_a = adaptive_window_features(
            mentions, spans, lines, after=True).select(
            *_DS, F.col("by_langs").alias("w500_langs_after"),
            F.col("by_lines").alias("w500_lines_after"))
        gin = _flag(in_line_mentions(mentions, lines, "G"), _DS, "g_in_line")
        tin = _flag(in_line_mentions(mentions, lines, "T"), _DS, "t_in_line")
        min_ = _flag(in_line_mentions(mentions, lines, "M"), _DS, "m_in_line")

        # --- doc-level feature frames (key: doc, name, code) ---
        gl_first = _flag(doc_edge_mentions(mentions, bounds),
                         _DN, "gl_first_lines")
        gl_last = _flag(doc_edge_mentions(mentions, bounds, last=True),
                        _DN, "gl_last_lines")
        gl_freq = _flag(
            doc_frequent_mentions(mentions, bounds).where("frequent"),
            _DN, "gl_frequent")
        gl_most = _flag(
            doc_frequent_mentions(
                mentions, bounds, thresh=None).where("frequent"),
            _DN, "gl_most_frequent")

        # --- line-level frames (key: doc, span, lineno, name, code) ---
        lin = _flag(in_line_mentions_by_line(mentions, lines, "L"),
                    _DSL, "l_in_line")

    inst = l_lines.join(cands, "doc_id")
    for f in (wf, fq_b, fq_a, cl_b, cl_a, ad_b, ad_a, gin, tin, min_):
        inst = inst.join(f, _DS, "left")
    for f in (gl_first, gl_last, gl_freq, gl_most):
        inst = inst.join(f, _DN, "left")
    inst = inst.join(lin, _DSL, "left").join(num_langs, "doc_id", "left")

    # LM keying: name_keyed_lms=True reproduces the reference's shipped
    # `code-only-odin-lms = no` (util.py:81-86) — per-(name, code) LMs,
    # so two names sharing a code get distinct flags; default keys by
    # code only (the `yes` mode; see lm_line_match_ratios docstring).
    cand_sel = ["doc_id", "name", "code"] if name_keyed_lms else [
        "doc_id", "code"]
    lm_join_keys = (["doc_id", "span_id", "lineno", "name", "code"]
                    if name_keyed_lms
                    else ["doc_id", "span_id", "lineno", "code"])
    cand_codes = mentions.select(*cand_sel).distinct()
    ratio_cols: list[str] = []
    if odin_lm is not None:
        piv = _pivot_ratios(
            lm_line_match_ratios(l_lines, cand_codes, odin_lm,
                                 ODIN_FAMILIES, name_keyed=name_keyed_lms),
            ODIN_FAMILIES, keys=lm_join_keys)
        inst = inst.join(piv, lm_join_keys, "left")
        ratio_cols += ODIN_FAMILIES
    if crubadan_lm is not None:
        piv = _pivot_ratios(
            lm_line_match_ratios(
                l_lines, cand_codes, crubadan_lm,
                CRUBADAN_FAMILIES, name_keyed=name_keyed_lms),
            CRUBADAN_FAMILIES, keys=lm_join_keys)
        inst = inst.join(piv, lm_join_keys, "left")
        ratio_cols += CRUBADAN_FAMILIES

    if common_table:
        pairs = sorted(
            {(n, c) for n, cs in common_table.items() for c in cs})
        common_df = spark.createDataFrame(pairs, ["name", "code"])
        inst = inst.join(
            F.broadcast(_flag(common_df, ["name", "code"], "gl_common_code")),
            ["name", "code"], "left")
    else:
        inst = inst.withColumn("gl_common_code", F.lit(False))

    # --- assemble the feature map with reference-exact key strings ---
    b = lambda c: F.coalesce(F.col(c), F.lit(False))  # noqa: E731
    name, code = F.col("name"), F.col("code")
    feats: list[tuple[str, F.Column]] = [
        ("W-prev", b("w_prev")),
        ("W-close", b("w_close")),
        ("W-after", b("w_after")),
        ("W-close-after", b("w_close_after")),
        ("W-frequent", b("w_frequent")),
        ("W-frequent-after", b("w_frequent_after")),
        ("W-closest", b("w_closest")),
        ("W-closest-after", b("w_closest_after")),
        ("W=500&langs>20-frequent", b("w500_langs")),
        ("W=500&langs>20-frequent-after", b("w500_langs_after")),
        ("W=500&lines>2000-frequent", b("w500_lines")),
        ("W=500&lines>2000-frequent-after", b("w500_lines_after")),
        ("L-in-line", b("l_in_line")),
        ("G-in-line", b("g_in_line")),
        ("T-in-line", b("t_in_line")),
        ("M-in-line", b("m_in_line")),
    ]
    gl_base = [
        ("GL-first-lines", b("gl_first_lines")),
        ("GL-last-lines", b("gl_last_lines")),
        ("GL-frequent", b("gl_frequent")),
        ("GL-most-frequent", b("gl_most_frequent")),
    ]
    feats += gl_base
    nl = F.coalesce(F.col("num_langs"), F.lit(0))
    for fname, expr in gl_base:  # add_nums crosses, features.py:211-214
        for i in LANGS_LT:
            feats.append((f"{fname}&langs<{i}", expr & (nl < i)))
    feats += [
        ("GL-most-frequent-code", b("gl_common_code")),
        ("GL-is-english", (name == "english") & (code == "eng")),
        ("GL-possible-english-word", name.isin(eng_words)),
        ("GL-short-lang-name", F.length(name) <= SHORT_NAME_SIZE),
        ("GL-multi-word-name", F.size(F.split(name, " ")) > 1),
    ]
    # reference quirk kept verbatim: flag named '<i' but condition '<= i'
    # (features.py:385-387)
    for i in range(1, 10):
        feats.append((f"GL-C-name<{i}", F.length(name) <= i))
    feats += _lm_flag_entries(ratio_cols)

    if feature_config:
        feats = [(k, v) for k, v in feats
                 if _feature_enabled(k, feature_config)]

    feats_map = F.map_from_arrays(
        F.array(*[F.lit(k) for k, _ in feats]),
        F.array(*[v for _, v in feats]),
    )

    @F.pandas_udf("string")
    def norm_gold(s):  # Arrow-batched (no per-row Python UDFs)
        return s.fillna("").map(normalize_name)

    out = inst.select(
        "doc_id", "span_id", "lineno",
        name.alias("lang_name"),
        code.alias("lang_code"),
        F.coalesce(
            (name == norm_gold(F.col("gold_name")))
            & (code == F.col("gold_code")),
            F.lit(False),
        ).alias("label"),
        feats_map.alias("feats"),
    )
    # expose the internal cache so callers can release it — without a
    # handle the mentions cache outlived every call for the app's
    # lifetime (release_instance_caches below)
    out._lgid_caches = [mentions]
    return out


def release_instance_caches(inst: DataFrame) -> None:
    """Unpersist the caches build_instances created for `inst` (no-op
    for frames without any)."""
    for c in getattr(inst, "_lgid_caches", ()):
        c.unpersist()


def strict_cross_validate(
    spark: SparkSession,
    lines: DataFrame,
    lang_table: dict[str, list[str]],
    k: int = 3,
    num_features: int = 4096,
    **feature_kwargs,
) -> list[dict]:
    """Leak-free K-fold CV on raw lines: the ODIN-style LM is rebuilt
    PER FOLD from the train fold's gold L-lines only, so no test-fold
    text ever reaches the LM the model scores with (stricter than the
    reference's published setup, which shares corpus-level LM resources
    across folds — main.py:188-233 only re-fits the LR per fold).

    Folds are deterministic per document (xxhash64(doc_id) % k) so a
    document never straddles train/test. Any explicitly passed
    `odin_lm` in feature_kwargs is ignored (it would reintroduce the
    leak); other feature tables (crubadan_lm, common_table) are
    corpus-external resources and pass through fold-independent.

    Cost shape: the window/GL evidence does not depend on the LM, so
    the non-LM instance base is built ONCE and per fold only the LM
    ratio pivot is recomputed and map_concat'ed onto the feature map —
    k folds cost k LM builds + k fits, not 2k full instance builds.

    Returns [{fold, n_groups, accuracy}, ...] like cross_validate."""
    from .operators.classifier import best_candidates, score, train
    from .operators.lm import build_lm_ngrams, lm_line_match_ratios

    feature_kwargs = dict(feature_kwargs)
    feature_kwargs.pop("odin_lm", None)
    lines = lines.where(F.col("lineno").isNotNull()).persist()
    raw_inst = build_instances(spark, lines, lang_table, **feature_kwargs)
    base = raw_inst.withColumn(
        "_fold", F.pmod(F.xxhash64("doc_id"), F.lit(k)).cast("int")
    ).persist()
    base.count()
    gold_l_all = lines.where(
        F.col("span_id").isNotNull() & F.col("tag").contains("L")
        & F.col("lang_code").isNotNull()
    ).select(
        "doc_id", "span_id", "lineno", "text",
        F.col("lang_code").alias("lang"),
        F.pmod(F.xxhash64("doc_id"), F.lit(k)).cast("int").alias("_fold"),
    ).persist()
    # candidate codes per doc (mirrors build_instances' cand_codes)
    l_keys = gold_l_all.select("doc_id", "span_id", "lineno", "text")
    cand_codes = base.select(
        "doc_id", F.col("lang_code").alias("code")).distinct()
    lm_keys = ["doc_id", "span_id", "lineno", "code"]
    # honor feature_config here too: build_instances gated its own
    # features, but the per-fold LM flags are appended HERE, so an
    # unfiltered map would silently re-enable disabled L-LM* features
    # under --strict-cv (ADVICE r3)
    fconfig = feature_kwargs.get("feature_config")
    lm_entries = _lm_flag_entries(ODIN_FAMILIES)
    if fconfig:
        lm_entries = [(n, c) for n, c in lm_entries
                      if _feature_enabled(n, fconfig)]
    lm_map = F.map_from_arrays(
        F.array(*[F.lit(n) for n, _ in lm_entries]),
        F.array(*[c for _, c in lm_entries]),
    ) if lm_entries else None
    results: list[dict] = []
    try:
        for fold in range(k):
            if base.where(F.col("_fold") == fold).limit(1).count() == 0:
                continue
            if lm_map is not None:
                # reference gram sizes: char 3, word 1, morpheme 2
                # (config.ini:24-26); LM text = TRAIN-fold L-lines only
                fold_lm = build_lm_ngrams(
                    gold_l_all.where(F.col("_fold") != fold),
                    char_n=3, word_n=1, morph_n=2)
                piv = _pivot_ratios(
                    lm_line_match_ratios(
                        l_keys, cand_codes, fold_lm, ODIN_FAMILIES),
                    ODIN_FAMILIES, keys=lm_keys)
                inst = base.withColumnRenamed("lang_code", "code").join(
                    piv, lm_keys, "left"
                ).withColumn(
                    "feats", F.map_concat("feats", lm_map)
                ).withColumnRenamed("code", "lang_code").persist()
            else:
                # every LM flag disabled by config: skip the per-fold
                # LM build entirely — the fold model trains on the
                # (already config-filtered) base features alone.
                # base is already persisted; don't re-persist/unpersist.
                inst = base
            train_df = inst.where(F.col("_fold") != fold)
            if train_df.limit(1).count() == 0:
                # single-fold corpus: empty train frame would crash fit
                if inst is not base:
                    inst.unpersist()
                continue
            model = train(train_df, num_features=num_features)
            best = best_candidates(score(
                inst.where(F.col("_fold") == fold), model, num_features))
            agg = best.agg(
                F.count("*").alias("n"),
                F.sum(F.col("label").cast("long")).alias("n_right"),
            ).collect()[0]
            if inst is not base:
                inst.unpersist()
            results.append({
                "fold": fold,
                "n_groups": agg["n"],
                "accuracy": (agg["n_right"] or 0) / agg["n"]
                if agg["n"] else 0.0,
            })
    finally:
        base.unpersist()
        gold_l_all.unpersist()
        lines.unpersist()
        release_instance_caches(raw_inst)
    return results


def per_file_accuracy(best: DataFrame) -> DataFrame:
    """Per-document accuracy breakdown of classify output — the
    reference's per-file report (main.py:419-423: prints each file's
    right/total during test). One groupBy(doc_id) over the per-L-line
    winners from classify_documents/best_candidates."""
    return (
        best.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("label").cast("long")).alias("n_right"),
        )
        .withColumn(
            "accuracy",
            F.col("n_right").cast("double") / F.col("n_lines"))
        .orderBy("doc_id")
    )


def classify_documents(
    spark: SparkSession,
    lines: DataFrame,
    lang_table: dict[str, list[str]],
    model=None,
    return_model: bool = False,
    select_k: int | None = None,
    num_features: int | None = None,
    learner: str = "lr",
    **feature_kwargs,
):
    """Full classify: returns one row per (doc_id, span_id, L-lineno)
    with the winning candidate (the reference's per-instance-group argmax,
    main.py:301-323). If no model is given, trains on these instances
    (the reference's train-then-classify smoke, README.md:91-101).
    `return_model=True` additionally returns the trained/used model so
    callers can save it without retraining (jobs/run_classify.py)."""
    # the evidence stage scans `lines` ~8 times (spans, doc bounds,
    # L-lines, per-tag in-line joins) — cache it for the build, released
    # once the small result is materialized
    lines = lines.persist()
    inst = build_instances(spark, lines, lang_table, **feature_kwargs).persist()
    try:
        from .operators.classifier import N_FEATURES

        nf = N_FEATURES if num_features is None else num_features
        mdl = model if model is not None else train(
            inst, select_k=select_k, num_features=nf, learner=learner)
        out = best_candidates(score(inst, mdl, nf)).select(
            "doc_id", "span_id", "lineno",
            "lang_name", "lang_code", "prediction",
            "p_true", "norm_prob", "signed_prob", "label",
        )
        # materialize the (small: one row per L-line) result while the
        # instance cache is still alive — otherwise every downstream
        # action (counts, parquet sink, freki sink) re-derives the whole
        # evidence-join DAG after the finally-unpersist
        out = out.persist()
        out.count()
        return (out, mdl) if return_model else out
    finally:
        inst.unpersist()
        lines.unpersist()
        release_instance_caches(inst)


def write_labelled_lines(
    lines: DataFrame, predictions: DataFrame, path: str
) -> None:
    """S8 sink (write_to_files, main.py:242-277): annotate span lines
    with the predicted language and write partitioned by doc bucket.

    Annotation semantics are shared with the freki sink
    (sinks/freki_sink.annotate_lines): each span line carries the
    prediction of the LATEST L-line at-or-above it (main.py:255-268
    sequential overwrites), and lines above the first L-line stay
    unannotated — so the parquet and .freki outputs agree. Names stay
    raw lowercase here (structured output; the freki sink title-cases
    for the text rendering)."""
    from .sinks.freki_sink import annotate_lines

    out = annotate_lines(lines, predictions, titlecase=False)
    out = out.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(16)).cast("int"))
    out.write.mode("overwrite").partitionBy("bucket").parquet(path)
