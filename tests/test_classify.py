"""End-to-end classify lifecycle on a crafted corpus: every span's
language is mentioned close to it, so a trained model must recover the
gold labels (the reference's test smoke, main.py:356-423).

Feature keys are the reference's exact strings (features.py families);
instances are one row per (L-line × doc-wide candidate pair),
main.py:588-633."""

from __future__ import annotations

import pytest

from lgid_spark.classify import (
    ENGLISH_WORD_LANG_NAMES,
    build_instances,
    classify_documents,
    write_labelled_lines,
)
from lgid_spark.fixtures import LANG_TABLE

LINES_SCHEMA = (
    "doc_id string, lineno int, tag string, span_id string, "
    "lang_name string, lang_code string, text string"
)


def _corpus():
    """6 docs; each doc discusses one language right before its span."""
    langs = [("quenya", "qya"), ("valdese", "vld"), ("molvani", "mv1")]
    rows = []
    for d in range(6):
        doc = f"doc{d}"
        name, code = langs[d % 3]
        rows += [
            (doc, 1, "O", None, None, None, f"introduction to the {name} language"),
            (doc, 2, "O", None, None, None, f"examples of {name} follow below"),
            (doc, 3, "L", "s1", name, code, "ex am ple li ne"),
            (doc, 4, "G", "s1", None, None, "gloss line here"),
            (doc, 5, "T", "s1", None, None, "the translation line"),
            (doc, 6, "O", None, None, None, "unrelated trailing text"),
        ]
    return rows


@pytest.fixture(scope="module")
def lines(spark):
    return spark.createDataFrame(_corpus(), LINES_SCHEMA)


def test_instances_shape_and_labels(spark, lines):
    inst = build_instances(spark, lines, LANG_TABLE)
    rows = inst.collect()
    assert len(rows) >= 6  # one row per L-line × candidate
    # every L-line has exactly one positive candidate
    pos = [r for r in rows if r.label]
    assert len(pos) == 6
    for r in pos:
        # mention on lines 1-2, span top = 3 → both before-windows hit
        assert r.feats["W-prev"] and r.feats["W-close"]
        # doc-wide flags: mentions are in the first 25 lines
        assert r.feats["GL-first-lines"] and r.feats["GL-most-frequent"]
        # add_nums cross: each doc mentions < 5 distinct names
        assert r.feats["GL-first-lines&langs<5"]
        # closest-before: line-2 mention is the closest to span top
        assert r.feats["W-closest"]
        assert not r.feats["GL-possible-english-word"]


def test_english_word_name_flag(spark):
    """J6 (features.py:372-382): names that are common English words get
    GL-possible-english-word; short names get GL-short-lang-name."""
    table = {"even": ["eve"], "quenya": ["qya"], "so": ["soo"]}
    rows = [
        ("d0", 1, "O", None, None, None, "they even said so in quenya"),
        ("d0", 2, "L", "s1", "quenya", "qya", "ex am ple"),
    ]
    df = spark.createDataFrame(rows, LINES_SCHEMA)
    inst = build_instances(spark, df, table)
    feats = {(r.lang_name, r.lang_code): r.feats for r in inst.collect()}
    assert feats[("even", "eve")]["GL-possible-english-word"]
    assert feats[("so", "soo")]["GL-possible-english-word"]
    assert feats[("so", "soo")]["GL-short-lang-name"]  # len 2 ≤ 3
    assert feats[("so", "soo")]["GL-C-name<2"]  # quirk: <= i (features.py:385)
    assert not feats[("so", "soo")]["GL-C-name<1"]
    assert not feats[("quenya", "qya")]["GL-possible-english-word"]
    assert "even" in ENGLISH_WORD_LANG_NAMES


def test_lm_threshold_features(spark, lines):
    """L-LM* cumulative flags (features.py:300-354): an ODIN LM built
    from quenya-like text makes the quenya candidate's L-line match."""
    from lgid_spark.operators.lm import build_lm_ngrams

    corpus = spark.createDataFrame(
        [("qya", "ex am ple li ne"), ("vld", "zz yy xx ww vv"),
         ("mv1", "qq rr ss tt uu")],
        ["lang", "text"],
    )
    lm = build_lm_ngrams(corpus, char_n=3, word_n=1, morph_n=2)
    inst = build_instances(spark, lines, LANG_TABLE, odin_lm=lm)
    rows = inst.where("doc_id = 'doc0'").collect()  # quenya doc
    feats = {(r.lang_name, r.lang_code): r.feats for r in rows}
    q = feats[("quenya", "qya")]
    # the L-line IS the qya training text → every word/char gram matches
    assert q["L-LMw>1.0"] and q["L-LMc>1.0"] and q["L-LMm>1.0"]
    # threshold flags are cumulative
    assert q["L-LMw>0.1"] and q["L-LMc>0.5"]


def test_common_table_flag(spark, lines):
    inst = build_instances(
        spark, lines, LANG_TABLE, common_table={"molvani": ["mv1"]})
    feats = {
        (r.lang_name, r.lang_code): r.feats
        for r in inst.where("doc_id = 'doc2'").collect()  # molvani doc
    }
    assert feats[("molvani", "mv1")]["GL-most-frequent-code"]
    assert not feats[("molvani", "mv2")]["GL-most-frequent-code"]


def test_classify_end_to_end(spark, lines, tmp_path):
    best = classify_documents(spark, lines, LANG_TABLE)
    rows = best.collect()
    assert len(rows) == 6  # one winner per L-line
    acc = sum(1 for r in rows if r.label) / len(rows)
    assert acc == 1.0  # separable by construction
    # S8 sink: labelled lines roundtrip
    out = str(tmp_path / "labelled")
    write_labelled_lines(lines, best, out)
    back = spark.read.parquet(out)
    assert back.count() == lines.count()
    labelled = back.where("span_id is not null and pred_lang_code is not null")
    assert labelled.count() == 18  # 3 span lines × 6 docs


def test_classify_needs_lm_features(spark):
    """Harder corpus where window flags alone are insufficient: every doc
    mentions BOTH languages symmetrically before the span, so only the
    L-LM* evidence separates the candidates (VERDICT r1 item 1)."""
    from lgid_spark.operators.lm import build_lm_ngrams

    texts = {"qya": "lorem ipsum dolor sit amet",
             "vld": "zyx wvu tsr qpo nml"}
    langs = [("quenya", "qya"), ("valdese", "vld")]
    rows = []
    for d in range(8):
        doc = f"doc{d}"
        name, code = langs[d % 2]
        rows += [
            (doc, 1, "O", None, None, None, "about quenya and valdese"),
            (doc, 2, "L", "s1", name, code, texts[code]),
            (doc, 3, "G", "s1", None, None, "gloss"),
        ]
    lines = spark.createDataFrame(rows, LINES_SCHEMA)
    lm = build_lm_ngrams(
        spark.createDataFrame(list(texts.items()), ["lang", "text"]),
        char_n=3, word_n=1, morph_n=2)
    table = {"quenya": ["qya"], "valdese": ["vld"]}

    # without the LM: both candidates have identical window features →
    # ties break lexically → every span predicted 'quenya' → acc 0.5
    blind = classify_documents(spark, lines, table).collect()
    blind_acc = sum(1 for r in blind if r.label) / len(blind)
    assert blind_acc <= 0.5

    best = classify_documents(spark, lines, table, odin_lm=lm).collect()
    acc = sum(1 for r in best if r.label) / len(best)
    assert acc == 1.0


def test_write_labelled_lines_latest_wins(spark, tmp_path):
    """ADVICE r2: the parquet sink shares the freki sink's annotation
    semantics (main.py:255-268) — each span line carries the LATEST
    L-line's prediction at-or-above it; lines above the first L-line
    stay unannotated; names stay raw lowercase."""
    rows = [
        ("d", 1, "M", "s1", None, None, "meta line above first L"),
        ("d", 2, "L", "s1", "quenya", "qya", "ex am ple"),
        ("d", 3, "G", "s1", None, None, "gloss"),
        ("d", 4, "L", "s1", "valdese", "vld", "ot her li ne"),
        ("d", 5, "T", "s1", None, None, "translation"),
    ]
    lines = spark.createDataFrame(rows, LINES_SCHEMA)
    preds = spark.createDataFrame(
        [("d", "s1", 2, "quenya", "qya"), ("d", "s1", 4, "valdese", "vld")],
        "doc_id string, span_id string, lineno int, "
        "lang_name string, lang_code string",
    )
    out = str(tmp_path / "labelled_latest")
    write_labelled_lines(lines, preds, out)
    back = {r.lineno: (r.pred_lang_name, r.pred_lang_code)
            for r in spark.read.parquet(out).collect()}
    assert back[1] == (None, None)           # above the first L-line
    assert back[2] == ("quenya", "qya")      # raw lowercase, not Titled
    assert back[3] == ("quenya", "qya")
    assert back[4] == ("valdese", "vld")     # latest L-line overwrites
    assert back[5] == ("valdese", "vld")


def test_name_keyed_lms(spark):
    """ADVICE r2: the reference's shipped config keys ODIN LMs by
    (name, code) — `code-only-odin-lms = no`, util.py:81-86 — so two
    candidate names sharing a code get DISTINCT L-LM* flags."""
    from pyspark.sql import functions as F

    from lgid_spark.operators.lm import build_lm_ngrams

    table = {"quenya": ["qya"], "exilic quenya": ["qya"]}
    rows = [
        ("d0", 1, "O", None, None, None,
         "about quenya and exilic quenya variants"),
        ("d0", 2, "L", "s1", "quenya", "qya", "ex am ple li ne"),
    ]
    lines = spark.createDataFrame(rows, LINES_SCHEMA)
    # per-(name, code) LMs: only the plain-quenya LM contains the L-line
    corpus = spark.createDataFrame(
        [("quenya", "qya", "ex am ple li ne"),
         ("exilic quenya", "qya", "zz yy xx ww vv")],
        ["lang_name", "lang", "text"],
    )
    # build_lm_ngrams groups by code only, which would collapse the two
    # names' grams — build on a composite key and split it back out
    named_lm = build_lm_ngrams(
        corpus.withColumn("lang", F.concat_ws("|", "lang_name", "lang")),
        char_n=3, word_n=1, morph_n=2,
    ).select(
        F.split("lang_code", r"\|")[0].alias("lang_name"),
        F.split("lang_code", r"\|")[1].alias("lang_code"),
        "gram_type", "ngram", "count",
    )

    inst = build_instances(
        spark, lines, table, odin_lm=named_lm, name_keyed_lms=True)
    feats = {r.lang_name: r.feats for r in inst.collect()}
    assert feats["quenya"]["L-LMw>1.0"]
    assert not feats["exilic quenya"]["L-LMw>0.1"]

    # code-only mode on the same (collapsed) LM: both names identical
    flat_lm = named_lm.groupBy("lang_code", "gram_type", "ngram").agg(
        F.sum("count").alias("count"))
    inst2 = build_instances(spark, lines, table, odin_lm=flat_lm)
    feats2 = {r.lang_name: r.feats for r in inst2.collect()}
    assert feats2["quenya"]["L-LMw>1.0"] == feats2["exilic quenya"]["L-LMw>1.0"]


def test_feature_config_toggles(spark, lines):
    """config.ini [features] ablation gates (features.py branches on
    config['features'][name]): disabling a base name removes it AND its
    derived crosses; longest-prefix match keeps W-close / W-closest
    distinct."""
    from lgid_spark.classify import _feature_enabled, feature_name_list

    cfg = {"W-close": False, "GL-first-lines": False}
    inst = build_instances(spark, lines, LANG_TABLE, feature_config=cfg)
    keys = set(inst.limit(1).collect()[0].feats.keys())
    assert "W-close" not in keys
    assert "GL-first-lines" not in keys
    assert "GL-first-lines&langs<5" not in keys      # derived cross gated
    assert "W-closest" in keys                       # prefix must not leak
    assert "W-close-after" in keys                   # own toggle, untouched
    assert "W-prev" in keys
    # helper agrees with the emitted map
    assert set(feature_name_list(feature_config=cfg)) == keys
    assert _feature_enabled("L-LMw>0.3", {"L-LMw": False}) is False
    assert _feature_enabled("L-LMw>0.3", {"L-LMw": True}) is True


def test_feature_name_list_matches_instances(spark, lines):
    """feature_name_list is the M5 vocabulary stand-in — it must stay in
    lockstep with what build_instances actually emits."""
    from lgid_spark.classify import feature_name_list
    from lgid_spark.operators.lm import build_lm_ngrams

    corpus = spark.createDataFrame(
        [("qya", "ex am ple li ne")], ["lang", "text"])
    lm = build_lm_ngrams(corpus, char_n=3, word_n=1, morph_n=2)
    inst = build_instances(spark, lines, LANG_TABLE, odin_lm=lm)
    keys = set(inst.limit(1).collect()[0].feats.keys())
    assert keys == set(feature_name_list(odin=True))


def test_per_file_accuracy(spark, lines):
    from lgid_spark.classify import per_file_accuracy

    best = classify_documents(spark, lines, LANG_TABLE)
    rows = per_file_accuracy(best).collect()
    assert [r.doc_id for r in rows] == [f"doc{d}" for d in range(6)]
    for r in rows:
        assert r.n_lines == 1 and r.accuracy == 1.0


def test_strict_cv_honors_feature_config(spark, lines, monkeypatch):
    """ADVICE r3: strict_cross_validate used to map_concat ALL ODIN LM
    threshold flags onto the per-fold feature map regardless of
    feature_config, silently re-enabling disabled LM features in LM
    ablations. With every L-LM* family disabled, the per-fold LM must
    not even be built (proven by poisoning build_lm_ngrams)."""
    import lgid_spark.operators.lm as lm_mod
    from lgid_spark.classify import strict_cross_validate

    def _boom(*a, **k):
        raise AssertionError(
            "build_lm_ngrams called despite all LM features disabled")

    monkeypatch.setattr(lm_mod, "build_lm_ngrams", _boom)
    lm_off = {"L-LMw": False, "L-LMc": False, "L-LMm": False}
    res = strict_cross_validate(
        spark, lines, LANG_TABLE, k=2, num_features=256,
        feature_config=lm_off)
    assert res and all(0.0 <= r["accuracy"] <= 1.0 for r in res)
