"""Operator-backed driver queries: LM build (S9/A5), LM match ratio
(A6/J3), mention extraction (the analyzers.py operator), multimodal
plumbing, classifier CV — wired over the driver-provided tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.lm import build_lm_ngrams, lm_match_ratio
from ..operators.mentions import extract_mentions
from ..operators.multimodal import extract_media_features, synthetic_media
from .util import spread, t

QUERIES = {}
ORACLE_SQL = {}


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn
    return reg


_WORDS_SQL = "list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> '')"


# ---------------------------------------------------------------------------
# lm_char_trigrams — LM build over documents: top-50 per-language padded
# char trigrams (buildlms.py semantics; oracle replays the padding math).
# ---------------------------------------------------------------------------

@_q("lm_char_trigrams")
def lm_char_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("lang", "text")
    lm = build_lm_ngrams(docs, char_n=3, word_n=2)
    return (
        lm.filter(F.col("gram_type") == "char")
        .orderBy(F.desc("count"), F.asc("lang_code"), F.asc("ngram"))
        .limit(50)
    )


ORACLE_SQL["lm_char_trigrams"] = f"""
WITH w AS (
  SELECT lang AS lang_code, unnest({_WORDS_SQL}) AS word FROM documents
), g AS (
  SELECT lang_code, substr(' ' || word || ' ', i, 3) AS ngram
  FROM w, unnest(generate_series(1, length(word))) u(i)
)
SELECT lang_code, 'char' AS gram_type, ngram, COUNT(*) AS count
FROM g GROUP BY lang_code, ngram
ORDER BY count DESC, lang_code ASC, ngram ASC
LIMIT 50
"""


# ---------------------------------------------------------------------------
# lm_word_bigrams — word-gram arm of the LM build, top-50.
# ---------------------------------------------------------------------------

@_q("lm_word_bigrams")
def lm_word_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("lang", "text")
    lm = build_lm_ngrams(docs, char_n=3, word_n=2)
    return (
        lm.filter(F.col("gram_type") == "word")
        .orderBy(F.desc("count"), F.asc("lang_code"), F.asc("ngram"))
        .limit(50)
    )


ORACLE_SQL["lm_word_bigrams"] = f"""
WITH w AS (SELECT lang AS lang_code, {_WORDS_SQL} AS words FROM documents)
SELECT lang_code, 'word' AS gram_type,
       words[i] || ' ' || words[i+1] AS ngram, COUNT(*) AS count
FROM w, unnest(generate_series(1, len(words)-1)) u(i)
WHERE len(words) >= 2
GROUP BY lang_code, ngram
ORDER BY count DESC, lang_code ASC, ngram ASC
LIMIT 50
"""


# ---------------------------------------------------------------------------
# mention_token_counts — the mention-extractor operator over documents
# (one line per doc), inline name table with a multi-word name and
# multi-code fan-out; oracle counts token runs in SQL.
# ---------------------------------------------------------------------------

_MENTION_TABLE = {
    "table": ["tbl", "tab"],
    "merge": ["mrg"],
    "fast join": ["fj1", "fj2"],
    "window": ["win"],
}


@_q("mention_token_counts")
def mention_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    lines = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(1).alias("lineno"),
        "text",
    )
    mentions = extract_mentions(spark, lines, _MENTION_TABLE,
                                single_line=True)
    return (
        mentions.groupBy("name", "code")
        .agg(F.count("*").alias("n_mentions"))
        .orderBy("name", "code")
    )


def _canon_tok_sql(w: str) -> str:
    """DuckDB twin of the matcher's token normalization + dash
    fallback (operators/mentions.py _norm_token / NameTable.canon):
    lowercase, strip accents, take the punctuation-capture core
    (edge dash = punctuation, interior dash = part of the name), then
    fall back to the dash-removed form when it is a vocabulary word.
    Keeps the oracle honest on capitalized / punctuation-adjacent /
    accented / dashed surface forms, not just sanitized fixtures."""
    vocab = sorted({t for n in _MENTION_TABLE for t in n.split()})
    vlist = ", ".join(f"'{v}'" for v in vocab)
    nrm = (
        "regexp_extract(strip_accents(lower(" + w + ")), "
        r"'([''ǂ!/=]*[\p{L}\p{N}_]+((-|''|/)+[\p{L}\p{N}_]+)*)', 1)"
    )
    return (
        f"(CASE WHEN {nrm} IN ({vlist}) THEN {nrm} "
        f"WHEN replace({nrm}, '-', '') IN ({vlist}) "
        f"THEN replace({nrm}, '-', '') ELSE {nrm} END)"
    )


def _mention_oracle_sql() -> str:
    # token-run counting per name; fan-out per code via the dim union
    dim = " UNION ALL ".join(
        f"SELECT '{name}' AS name, '{code}' AS code"
        for name, codes in _MENTION_TABLE.items()
        for code in codes
    )
    return f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
occ1 AS (  -- single-word names
  SELECT w.doc_id, {_canon_tok_sql('words[i]')} AS name
  FROM w, unnest(generate_series(1, len(words))) u(i)
  WHERE {_canon_tok_sql('words[i]')} IN ('table', 'merge', 'window')
),
occ2 AS (  -- the multi-word name
  SELECT w.doc_id, 'fast join' AS name
  FROM w, unnest(generate_series(1, len(words)-1)) u(i)
  WHERE {_canon_tok_sql('words[i]')} = 'fast'
    AND {_canon_tok_sql('words[i+1]')} = 'join'
),
occ AS (SELECT * FROM occ1 UNION ALL SELECT * FROM occ2),
dim AS ({dim})
SELECT dim.name AS name, dim.code AS code, COUNT(*) AS n_mentions
FROM occ JOIN dim ON occ.name = dim.name
GROUP BY dim.name, dim.code
ORDER BY 1, 2
"""


ORACLE_SQL["mention_token_counts"] = _mention_oracle_sql()


# ---------------------------------------------------------------------------
# lm_match_ratio_stats — A6/J3: build char LM from even docs, score odd
# docs' texts against their own language's LM (left-semi membership).
# ---------------------------------------------------------------------------

@_q("lm_match_ratio_stats")
def lm_match_ratio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0).select("lang", "text")
    test = docs.filter(F.col("doc_id") % 2 == 1)
    lm = build_lm_ngrams(train, char_n=3, word_n=2)
    ratios = lm_match_ratio(test, lm, "text", "lang")
    return ratios.groupBy("lang_code").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("match_ratio"), 6).alias("mean_match_ratio"),
        F.round(F.min("match_ratio"), 6).alias("min_match_ratio"),
    )


ORACLE_SQL["lm_match_ratio_stats"] = f"""
WITH train_w AS (
  SELECT lang, unnest({_WORDS_SQL}) AS word FROM documents WHERE doc_id % 2 = 0
), lm AS (
  SELECT DISTINCT lang, substr(' ' || word || ' ', i, 3) AS ngram
  FROM train_w, unnest(generate_series(1, length(word))) u(i)
), test_w AS (
  SELECT doc_id, lang, unnest({_WORDS_SQL}) AS word FROM documents WHERE doc_id % 2 = 1
), test_g AS (
  SELECT doc_id, lang, substr(' ' || word || ' ', i, 3) AS ngram
  FROM test_w, unnest(generate_series(1, length(word))) u(i)
), per_doc AS (
  SELECT g.doc_id, g.lang,
         CAST(COUNT(lm.ngram) AS DOUBLE) / COUNT(*) AS match_ratio
  FROM test_g g LEFT JOIN lm ON g.lang = lm.lang AND g.ngram = lm.ngram
  GROUP BY g.doc_id, g.lang
)
SELECT lang AS lang_code, COUNT(*) AS n_docs,
       ROUND(AVG(match_ratio), 6) AS mean_match_ratio,
       ROUND(MIN(match_ratio), 6) AS min_match_ratio
FROM per_doc GROUP BY lang
"""


# ---------------------------------------------------------------------------
# word_int_index — S5 (util.py:246-304 generate_language_name_mapping):
# dense sequential int ids for distinct words, assigned WITHOUT a global
# single-partition sort (two-stage bucket ranking, operators/word_index).
# The DuckDB oracle is the naive global row_number — same result.
# ---------------------------------------------------------------------------

@_q("word_int_index")
def word_int_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.word_index import dense_word_ids

    # no spread here: the heavy ranking work happens after the
    # distinct shuffle anyway, and the explode's partial distinct is
    # cheap — measured net-negative at sf0.1, ~neutral at 10×
    docs = t(spark, sf_dir, "documents").select("text")
    words = docs.select(F.explode(
        F.filter(F.split(F.trim("text"), r"(?U)\s+"),
                 lambda w: w != F.lit(""))).alias("word"))
    return dense_word_ids(words)


ORACLE_SQL["word_int_index"] = f"""
WITH w AS (SELECT DISTINCT unnest({_WORDS_SQL}) AS word FROM documents)
SELECT word, CAST(9999 + ROW_NUMBER() OVER (ORDER BY word) AS BIGINT) AS word_id
FROM w
"""


# ---------------------------------------------------------------------------
# Input-independent lifecycle queries with GOLDEN oracles.
#
# These run on deterministic synthetic fixtures (sf_dir unused), so their
# expected output is a constant — the oracle is a literal VALUES table
# (a golden file in SQL form). Any semantic drift in the mention/evidence/
# classifier/LM/multimodal operators breaks the value hash. The outputs
# are aggregate counts (and coarsely-rounded means), so they are robust
# to float summation order across partitionings.
# ---------------------------------------------------------------------------

def _media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_media_features(synthetic_media(spark, 300))
    return feats.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.round(F.avg("width"), 2).alias("mean_width"),
        F.round(F.avg(F.element_at("feature", 1)), 4).alias("mean_f0"),
    )


QUERIES["media_feature_stats"] = _media_feature_stats


def _frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out (one media row → N frame rows) over
    the deterministic media fixture; per-duration frame counts."""
    from ..operators.multimodal import sample_frames

    frames = sample_frames(synthetic_media(spark, 300), every_ms=1000)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.max("ts_ms").alias("last_ts_ms"),
    ).groupBy("n_frames", "last_ts_ms").agg(
        F.count("*").alias("n_videos"))


QUERIES["frame_sample_stats"] = _frame_sample_stats

# deterministic: videos are media ids ≡ 2 (mod 3); duration_ms =
# 1000*(2 + id%5) → frame counts 2..6 at 1 s sampling, 20 videos each
ORACLE_SQL["frame_sample_stats"] = """
SELECT * FROM (VALUES
  (CAST(2 AS BIGINT), 1000, CAST(20 AS BIGINT)),
  (CAST(3 AS BIGINT), 2000, CAST(20 AS BIGINT)),
  (CAST(4 AS BIGINT), 3000, CAST(20 AS BIGINT)),
  (CAST(5 AS BIGINT), 4000, CAST(20 AS BIGINT)),
  (CAST(6 AS BIGINT), 5000, CAST(20 AS BIGINT))
) AS t(n_frames, last_ts_ms, n_videos)
"""

ORACLE_SQL["media_feature_stats"] = """
SELECT * FROM (VALUES
  ('video', CAST(100 AS BIGINT), CAST(44.52 AS DOUBLE), CAST(0.5195 AS DOUBLE)),
  ('image', CAST(100 AS BIGINT), CAST(46.20 AS DOUBLE), CAST(0.5203 AS DOUBLE)),
  ('audio', CAST(100 AS BIGINT), CAST(47.53 AS DOUBLE), CAST(0.4800 AS DOUBLE))
) AS t(kind, n, mean_width, mean_f0)
"""


def _classifier_cv_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-fold CV of the candidate classifier on synthetic instances."""
    from ..operators.classifier import cross_validate

    langs = [("tokri", "tk1"), ("molvani", "mv1"), ("quenya", "qya")]
    rows = []
    for d in range(24):
        correct = langs[d % len(langs)]
        for (name, code) in langs:
            is_right = (name, code) == correct
            feats = {"in_span": is_right, "w_close": is_right, "w_prev": True}
            rows.append((f"doc{d}", "s1", 10, name, code, is_right, feats))
    inst = spark.createDataFrame(
        rows,
        "doc_id string, span_id string, lineno int, lang_name string, "
        "lang_code string, label boolean, feats map<string,boolean>",
    )
    # small hash width: 7 feature names don't need the 2^18 production
    # space, and LBFGS aggregates per-iteration vectors of this size
    res = cross_validate(inst, k=3, num_features=1024)
    return spark.createDataFrame(
        [(r["fold"], r["n_groups"], float(r["accuracy"])) for r in res],
        "fold int, n_groups long, accuracy double",
    )


QUERIES["classifier_cv"] = _classifier_cv_impl

# deterministic: xxhash64 fold assignment of 24 synthetic docs into 3
# folds (6/8/10 groups) on a separable fixture → accuracy 1.0 per fold
ORACLE_SQL["classifier_cv"] = """
SELECT * FROM (VALUES
  (0, CAST(6 AS BIGINT), CAST(1.0 AS DOUBLE)),
  (1, CAST(8 AS BIGINT), CAST(1.0 AS DOUBLE)),
  (2, CAST(10 AS BIGINT), CAST(1.0 AS DOUBLE))
) AS t(fold, n_groups, accuracy)
"""


def _xigt_lm_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: the build-odin-lm lifecycle (S6→A5→S9) over synthetic
    Xigt XML — XML parse → normalized-L filter → n-gram counts."""
    from ..operators.lm import build_lm_ngrams
    from ..sources.xigt_xml import l_lines, read_xigt_xml, synthetic_xigt_xml

    docs = spark.createDataFrame(
        [(f"w{k}", synthetic_xigt_xml(f"w{k}", 4)) for k in range(8)],
        ["doc_id", "xml"],
    )
    corpus = l_lines(read_xigt_xml(spark, docs)).selectExpr(
        "lang_code as lang", "text")
    lm = build_lm_ngrams(corpus)
    return lm.groupBy("lang_code", "gram_type").agg(
        F.count("*").alias("n_ngrams"),
        F.sum("count").alias("total_count"),
    )


QUERIES["xigt_lm_build"] = _xigt_lm_build

# deterministic: synthetic_xigt_xml(w0..w7, 4 igts) parsed → L-lines →
# char/word/morph n-gram counts per language
ORACLE_SQL["xigt_lm_build"] = """
SELECT * FROM (VALUES
  ('spa', 'word',  CAST(4 AS BIGINT),  CAST(32 AS BIGINT)),
  ('fra', 'word',  CAST(4 AS BIGINT),  CAST(32 AS BIGINT)),
  ('fra', 'morph', CAST(5 AS BIGINT),  CAST(40 AS BIGINT)),
  ('spa', 'morph', CAST(5 AS BIGINT),  CAST(40 AS BIGINT)),
  ('deu', 'word',  CAST(5 AS BIGINT),  CAST(64 AS BIGINT)),
  ('spa', 'char',  CAST(27 AS BIGINT), CAST(216 AS BIGINT)),
  ('deu', 'char',  CAST(28 AS BIGINT), CAST(432 AS BIGINT)),
  ('deu', 'morph', CAST(6 AS BIGINT),  CAST(80 AS BIGINT)),
  ('fra', 'char',  CAST(27 AS BIGINT), CAST(216 AS BIGINT))
) AS t(lang_code, gram_type, n_ngrams, total_count)
"""


def _classify_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: the composed classify flagship (main.py §3.1) on a
    crafted corpus — mentions → evidence → instances → LR → argmax."""
    from ..classify import classify_documents
    from ..fixtures import LANG_TABLE

    langs = [("quenya", "qya"), ("valdese", "vld"), ("molvani", "mv1")]
    rows = []
    for d in range(9):
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
    best = classify_documents(spark, lines, LANG_TABLE, num_features=4096)
    return best.groupBy("prediction").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("label").cast("long")).alias("n_correct"),
    )


QUERIES["classify_lifecycle"] = _classify_lifecycle


def _per_file_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document accuracy breakdown (main.py:419-423 per-file report)
    of the classify flagship on the same crafted corpus as
    classify_lifecycle — VERDICT r3: the A7 accuracy metric at the
    reference's finer per-file grain, as an oracled query."""
    from ..classify import classify_documents, per_file_accuracy
    from ..fixtures import LANG_TABLE

    langs = [("quenya", "qya"), ("valdese", "vld"), ("molvani", "mv1")]
    rows = []
    for d in range(9):
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
    best = classify_documents(spark, lines, LANG_TABLE, num_features=4096)
    return per_file_accuracy(best)


QUERIES["per_file_accuracy"] = _per_file_accuracy

# deterministic: 9 crafted docs, one L-line each, separable corpus →
# every doc classifies its single span correctly
ORACLE_SQL["per_file_accuracy"] = """
SELECT * FROM (VALUES
  """ + ",\n  ".join(
    f"('doc{d}', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1.0 AS DOUBLE))"
    for d in range(9)
) + """
) AS t(doc_id, n_lines, n_right, accuracy)
"""


def _classify_feature_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-feature histogram of build_instances over a crafted corpus
    WITH an ODIN LM and a common-codes table — pins the entire feature
    surface (window geometry, GL family, add_nums crosses, LM threshold
    flags, english-word/short-name flags) to exact expected counts."""
    from ..classify import build_instances
    from ..operators.lm import build_lm_ngrams

    table = {"quenya": ["qya"], "valdese": ["vld"], "so": ["soo"],
             "north tokri": ["ntk"]}
    texts = {"qya": "lorem ipsum dolor sit amet",
             "vld": "zyx wvu tsr qpo nml"}
    rows = []
    for d in range(4):
        doc = f"doc{d}"
        code = ["qya", "vld"][d % 2]
        name = {"qya": "quenya", "vld": "valdese"}[code]
        rows += [
            (doc, 1, "O", None, None, None,
             f"so the {name} language and north tokri"),
            (doc, 2, "L", "s1", name, code, texts[code]),
            (doc, 3, "G", "s1", None, None, "gloss line"),
        ]
    lines = spark.createDataFrame(
        rows,
        "doc_id string, lineno int, tag string, span_id string, "
        "lang_name string, lang_code string, text string",
    )
    lm = build_lm_ngrams(
        spark.createDataFrame(list(texts.items()), ["lang", "text"]),
        char_n=3, word_n=1, morph_n=2)
    inst = build_instances(
        spark, lines, table, odin_lm=lm,
        common_table={"quenya": ["qya"], "valdese": ["vld"]})
    return (
        inst.select(F.explode(
            F.map_keys(F.map_filter("feats", lambda _, v: v))
        ).alias("feature"))
        .groupBy("feature")
        .agg(F.count("*").alias("n"))
    )


QUERIES["classify_feature_flags"] = _classify_feature_flags


def _crubadan_feature_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 → L-CR-LM* end-to-end: synthesize the REAL Crúbadán layout on
    disk, read it through the dir-index source, and histogram the
    resulting L-CR-LM threshold flags from build_instances."""
    import os
    import tempfile

    from ..classify import build_instances
    from ..sources.crubadan import (
        read_crubadan_lm,
        read_dir_index,
        write_synthetic_crubadan,
    )

    base = os.path.join(tempfile.gettempdir(), "lgid_crubadan_fixture_v1")
    index_path = write_synthetic_crubadan(base, {
        "qya": ["lorem", "ipsum", "dolor"],
        "vld": ["zyx", "wvu", "tsr"],
    })
    lm = read_crubadan_lm(spark, read_dir_index(spark, index_path), base)
    table = {"quenya": ["qya"], "valdese": ["vld"]}
    rows = []
    for d in range(4):
        doc = f"doc{d}"
        code = ["qya", "vld"][d % 2]
        name = {"qya": "quenya", "vld": "valdese"}[code]
        text = {"qya": "lorem ipsum dolor", "vld": "zyx wvu tsr"}[code]
        rows += [
            (doc, 1, "O", None, None, None, f"about the {name} language"),
            (doc, 2, "L", "s1", name, code, text),
        ]
    lines = spark.createDataFrame(
        rows,
        "doc_id string, lineno int, tag string, span_id string, "
        "lang_name string, lang_code string, text string",
    )
    inst = build_instances(spark, lines, table, crubadan_lm=lm)
    return (
        inst.select(F.explode(
            F.map_keys(F.map_filter("feats", lambda _, v: v))
        ).alias("feature"))
        .where(F.col("feature").startswith("L-CR"))
        .groupBy("feature")
        .agg(F.count("*").alias("n"))
    )


QUERIES["crubadan_feature_flags"] = _crubadan_feature_flags

# deterministic: every L-line IS its language's Crúbadán training text,
# so both CR families hit ratio 1.0 → all 10 cumulative flags × 4 docs
ORACLE_SQL["crubadan_feature_flags"] = (
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"('L-CR-LM{g}>{k / 10:.1f}', CAST(4 AS BIGINT))"
        for g in ("c", "w") for k in range(1, 11))
    + ") AS t(feature, n)"
)

ORACLE_SQL["classify_feature_flags"] = """
SELECT * FROM (VALUES
  ('GL-C-name<2', CAST(4 AS BIGINT)),
  ('GL-C-name<3', CAST(4 AS BIGINT)),
  ('GL-C-name<4', CAST(4 AS BIGINT)),
  ('GL-C-name<5', CAST(4 AS BIGINT)),
  ('GL-C-name<6', CAST(6 AS BIGINT)),
  ('GL-C-name<7', CAST(8 AS BIGINT)),
  ('GL-C-name<8', CAST(8 AS BIGINT)),
  ('GL-C-name<9', CAST(8 AS BIGINT)),
  ('GL-first-lines', CAST(12 AS BIGINT)),
  ('GL-first-lines&langs<10', CAST(12 AS BIGINT)),
  ('GL-first-lines&langs<15', CAST(12 AS BIGINT)),
  ('GL-first-lines&langs<20', CAST(12 AS BIGINT)),
  ('GL-first-lines&langs<40', CAST(12 AS BIGINT)),
  ('GL-first-lines&langs<5', CAST(12 AS BIGINT)),
  ('GL-last-lines', CAST(12 AS BIGINT)),
  ('GL-last-lines&langs<10', CAST(12 AS BIGINT)),
  ('GL-last-lines&langs<15', CAST(12 AS BIGINT)),
  ('GL-last-lines&langs<20', CAST(12 AS BIGINT)),
  ('GL-last-lines&langs<40', CAST(12 AS BIGINT)),
  ('GL-last-lines&langs<5', CAST(12 AS BIGINT)),
  ('GL-most-frequent', CAST(12 AS BIGINT)),
  ('GL-most-frequent&langs<10', CAST(12 AS BIGINT)),
  ('GL-most-frequent&langs<15', CAST(12 AS BIGINT)),
  ('GL-most-frequent&langs<20', CAST(12 AS BIGINT)),
  ('GL-most-frequent&langs<40', CAST(12 AS BIGINT)),
  ('GL-most-frequent&langs<5', CAST(12 AS BIGINT)),
  ('GL-most-frequent-code', CAST(4 AS BIGINT)),
  ('GL-multi-word-name', CAST(4 AS BIGINT)),
  ('GL-possible-english-word', CAST(4 AS BIGINT)),
  ('GL-short-lang-name', CAST(4 AS BIGINT)),
  ('L-LMc>0.1', CAST(4 AS BIGINT)),
  ('L-LMc>0.2', CAST(4 AS BIGINT)),
  ('L-LMc>0.3', CAST(4 AS BIGINT)),
  ('L-LMc>0.4', CAST(4 AS BIGINT)),
  ('L-LMc>0.5', CAST(4 AS BIGINT)),
  ('L-LMc>0.6', CAST(4 AS BIGINT)),
  ('L-LMc>0.7', CAST(4 AS BIGINT)),
  ('L-LMc>0.8', CAST(4 AS BIGINT)),
  ('L-LMc>0.9', CAST(4 AS BIGINT)),
  ('L-LMc>1.0', CAST(4 AS BIGINT)),
  ('L-LMm>0.1', CAST(4 AS BIGINT)),
  ('L-LMm>0.2', CAST(4 AS BIGINT)),
  ('L-LMm>0.3', CAST(4 AS BIGINT)),
  ('L-LMm>0.4', CAST(4 AS BIGINT)),
  ('L-LMm>0.5', CAST(4 AS BIGINT)),
  ('L-LMm>0.6', CAST(4 AS BIGINT)),
  ('L-LMm>0.7', CAST(4 AS BIGINT)),
  ('L-LMm>0.8', CAST(4 AS BIGINT)),
  ('L-LMm>0.9', CAST(4 AS BIGINT)),
  ('L-LMm>1.0', CAST(4 AS BIGINT)),
  ('L-LMw>0.1', CAST(4 AS BIGINT)),
  ('L-LMw>0.2', CAST(4 AS BIGINT)),
  ('L-LMw>0.3', CAST(4 AS BIGINT)),
  ('L-LMw>0.4', CAST(4 AS BIGINT)),
  ('L-LMw>0.5', CAST(4 AS BIGINT)),
  ('L-LMw>0.6', CAST(4 AS BIGINT)),
  ('L-LMw>0.7', CAST(4 AS BIGINT)),
  ('L-LMw>0.8', CAST(4 AS BIGINT)),
  ('L-LMw>0.9', CAST(4 AS BIGINT)),
  ('L-LMw>1.0', CAST(4 AS BIGINT)),
  ('W-close', CAST(12 AS BIGINT)),
  ('W-closest', CAST(12 AS BIGINT)),
  ('W-prev', CAST(12 AS BIGINT))
) AS t(feature, n)
"""


# deterministic: 9 crafted docs (3 per language), every span's winner is
# the gold pair → 3 spans per prediction, all correct
ORACLE_SQL["classify_lifecycle"] = """
SELECT * FROM (VALUES
  ('valdese-vld', CAST(3 AS BIGINT), CAST(3 AS BIGINT)),
  ('quenya-qya',  CAST(3 AS BIGINT), CAST(3 AS BIGINT)),
  ('molvani-mv1', CAST(3 AS BIGINT), CAST(3 AS BIGINT))
) AS t(prediction, n_spans, n_correct)
"""
