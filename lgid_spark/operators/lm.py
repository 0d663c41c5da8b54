"""Language-model n-gram table build — the reference's `build-odin-lm`
entry point (/root/reference/lgid/buildlms.py:38-128) re-expressed as a
DataFrame aggregation (SURVEY §2 S9/A5, §3.3).

Reference lifecycle: XML → filtered L-lines → CountVectorizer per
(lang, gram_type) → `ngram\\tcount` files. Spark lifecycle: corpus DF →
explode(ngrams) → groupBy(lang_code, gram_type, ngram).count() →
write.partitionBy(lang_code, gram_type) — partition-pruned at query
time exactly like the reference's per-doc LM pruning (main.py:567-576).

N-gram functions mirror analyzers.py:
  char  (analyzers.py:285-310): per word, pad with spaces, all n-grams
        for n in [min, max]
  word  (analyzers.py:313-336): token n-grams
  morph (analyzers.py:338-362): split on [\\s\\-=+]+ first
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..parallelism import spread


def _gram_positions(count, n: int):
    """Start positions [1 .. count-n+1] as an array column, EMPTY when
    the input is too short. NB: F.sequence(1, 0) is a DESCENDING [1, 0]
    in Spark, so an unguarded `sequence(1, greatest(size-n+1, 0))`
    crashes element_at under ANSI on inputs shorter than n — hit on
    real-corpus single-word lines."""
    return F.when(
        count >= n, F.sequence(F.lit(1), count - n + 1)
    ).otherwise(F.array().cast("array<int>"))


def char_ngrams_col(text, n: int):
    """Array of padded char n-grams over each word (pure SQL — stays in
    whole-stage codegen; no Python). A word shorter than n-2 emits its
    single short gram, like the reference's rangemax clamp
    (analyzers.py:300-302)."""
    words = F.filter(F.split(F.trim(text), r"(?U)\s+"), lambda w: w != F.lit(""))
    grams_per_word = F.transform(
        words,
        lambda w: F.transform(
            F.sequence(F.lit(1), F.greatest(
                F.length(w) + 2 - n + 1, F.lit(1))),
            lambda i: F.concat(F.lit(" "), w, F.lit(" ")).substr(i, F.lit(n)),
        ),
    )
    return F.flatten(grams_per_word)


def word_ngrams_col(text, n: int):
    words = F.filter(F.split(F.trim(text), r"(?U)\s+"), lambda w: w != F.lit(""))
    return F.transform(
        _gram_positions(F.size(words), n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + k) for k in range(n)]),
    )


def morph_ngrams_col(text, n: int):
    morphs = F.filter(
        F.split(F.trim(text), r"[\s\-=+]+"), lambda w: w != F.lit(""))
    return F.transform(
        _gram_positions(F.size(morphs), n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(morphs, i + k) for k in range(n)]),
    )


def _exploded_char_ngrams(corpus: DataFrame, text_col: str, lang_col: str,
                          n: int) -> DataFrame:
    """(lang_code, ngram) rows ≡ explode(char_ngrams_col(text, n)) —
    restructured as TWO row-level explodes (words, then positions) so
    the whole pass stays in whole-stage codegen instead of evaluating a
    nested interpreted transform/flatten lambda per document (r6; the
    gram multiset is unchanged: the padded word and the position range
    are the same expressions per word)."""
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"(?U)\s+"),
        lambda w: w != F.lit(""))
    w = corpus.select(
        F.col(lang_col).alias("lang_code"), F.explode(words).alias("_w"))
    w = w.select(
        "lang_code",
        F.concat(F.lit(" "), F.col("_w"), F.lit(" ")).alias("_pw"))
    pos = F.sequence(
        F.lit(1), F.greatest(F.length("_pw") - n + 1, F.lit(1)))
    g = w.select("lang_code", "_pw", F.explode(pos).alias("_i"))
    return g.select(
        "lang_code",
        F.col("_pw").substr(F.col("_i"), F.lit(n)).alias("ngram"))


def _exploded_pos_ngrams(corpus: DataFrame, text_col: str, lang_col: str,
                         n: int, split_re: str) -> DataFrame:
    """(lang_code, ngram) rows ≡ explode(word_ngrams_col / morph_
    ngrams_col): explode gram start positions per document, then join
    the n tokens — same codegen rationale as _exploded_char_ngrams."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), split_re), lambda w: w != F.lit(""))
    d = corpus.select(
        F.col(lang_col).alias("lang_code"), toks.alias("_ws"))
    g = d.select(
        "lang_code", "_ws",
        F.explode(_gram_positions(F.size("_ws"), n)).alias("_i"))
    return g.select(
        "lang_code",
        F.concat_ws(
            " ", *[F.element_at("_ws", F.col("_i") + k) for k in range(n)]
        ).alias("ngram"))


def build_lm_ngrams(
    corpus: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    char_n: int = 3,
    word_n: int = 2,
    morph_n: int | None = None,
) -> DataFrame:
    """corpus(lang, text) → lm_ngrams(lang_code, gram_type, ngram, count).
    Reference gram sizes (config.ini:24-26): char 3, word 1, morpheme 2 —
    pass word_n=1, morph_n=2 to build the feature-path ODIN LM."""
    # narrow projection + spread: only (lang, text) enter the gram
    # explodes, and a small single-file corpus is repartitioned up to
    # executor parallelism first (queries/util.spread — no-op at scale)
    corpus = spread(corpus.select(lang_col, text_col))
    parts = []
    for gram_type, part in (
        ("char", _exploded_char_ngrams(corpus, text_col, lang_col, char_n)),
        ("word", _exploded_pos_ngrams(
            corpus, text_col, lang_col, word_n, r"(?U)\s+")),
        ("morph", _exploded_pos_ngrams(
            corpus, text_col, lang_col,
            word_n if morph_n is None else morph_n, r"[\s\-=+]+")),
    ):
        parts.append(part.select(
            "lang_code", F.lit(gram_type).alias("gram_type"), "ngram"))
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionByName(p)
    return (
        stacked.filter(F.length("ngram") > 0)
        .groupBy("lang_code", "gram_type", "ngram")
        .agg(F.count("*").alias("count"))
    )


def write_lm_table(lm: DataFrame, path: str) -> None:
    """S9 sink: partitioned by (lang_code, gram_type) so per-language
    loads prune partitions (the Spark form of main.py:567-576)."""
    lm.write.mode("overwrite").partitionBy("lang_code", "gram_type").parquet(path)


def odin_char_grams(text, n: int = 3):
    """The ODIN char-gram list for ngram_matching (features.py:337-339):
    per-word padded n-grams flattened, then the FIRST and LAST gram of
    the whole list dropped (features.py:344-346 `ngrams[1:-1]`)."""
    flat = char_ngrams_col(text, n)
    return F.slice(flat, 2, F.greatest(F.size(flat) - 2, F.lit(0)))


def word_tokens(text):
    """ODIN/Crúbadán word unigrams after sentinel stripping
    (features.py:344-346: word_ngrams adds '\\n' sentinels which
    `[1:-1]` removes again — net effect: the plain tokens)."""
    return F.filter(F.split(F.trim(text), r"(?U)\s+"), lambda w: w != F.lit(""))


# family → (gram_type in the LM table, gram-array expression builder)
LM_FAMILIES = {
    "L-LMw": ("word", word_tokens),                      # features.py:131
    "L-LMc": ("char", odin_char_grams),                  # features.py:133
    "L-LMm": ("morph", lambda t: morph_ngrams_col(t, 2)),  # features.py:135
    "L-CR-LMw": ("word", word_tokens),                   # features.py:139
    "L-CR-LMc": ("char", lambda t: char_ngrams_col(t, 3)),  # features.py:141
}


def lm_line_match_ratios(
    l_lines: DataFrame,
    cand_codes: DataFrame,
    lm: DataFrame,
    families: list[str],
    name_keyed: bool = False,
) -> DataFrame:
    """Per-L-line LM match percent for each candidate — the core of
    ngram_matching (features.py:300-354): percent = (#grams of the line
    present in the candidate's LM) / (#grams of the line), duplicates
    counted per occurrence.

    LM keying modes (util.py:81-86 `code-only-odin-lms`):
      * name_keyed=False (this engine's default): LMs keyed by lang_code
        only — the reference's `code-only-odin-lms = yes` mode. NOTE the
        reference's SHIPPED config sets `no` (config.ini:41), so under
        the reference default two candidate names sharing a code get
        distinct LMs; in this mode they get identical L-LM*/L-CR-LM*
        flags. Divergence kept as the engine default because web-scale
        LMs are per-ISO-code, and documented here.
      * name_keyed=True (the reference-default semantics): LMs keyed by
        (lang_name, lang_code) — `lm` must carry a lang_name column and
        `cand_codes` a name column; names sharing a code score against
        their own LMs.
    Morpheme grams carry no empty-string sentinels (both modes).

    Args: l_lines(doc_id, span_id, lineno, text);
          cand_codes(doc_id[, name], code) distinct candidates per doc;
          lm([lang_name,] lang_code, gram_type, ngram[, count]).
    Returns (doc_id, span_id, lineno[, name], code, family, ratio) —
    rows only where the line has ≥1 gram (the reference's
    ZeroDivisionError guard, features.py:347-349, emits no flags for
    empty lines)."""
    keys = ["doc_id", "span_id", "lineno"]
    cand_keys = ["name", "code"] if name_keyed else ["code"]
    lm_cols = [F.col("lang_code").alias("code"), "gram_type", "ngram"]
    if name_keyed:
        lm_cols.insert(0, F.col("lang_name").alias("name"))
    grams = None
    for fam in families:
        gram_type, expr = LM_FAMILIES[fam]
        part = l_lines.select(
            *keys,
            F.lit(fam).alias("family"),
            F.lit(gram_type).alias("gram_type"),
            F.explode(expr(F.col("text"))).alias("ngram"),
        )
        grams = part if grams is None else grams.unionByName(part)
    totals = grams.groupBy(*keys, "family").agg(
        F.count("*").alias("n_total"))
    fanned = grams.join(cand_codes, "doc_id")
    hits = (
        fanned.join(
            # MEMBERSHIP join: dropDuplicates so an LM carrying several
            # rows per (key, gram_type, ngram) — e.g. two language
            # names sharing one ISO code in code-only mode — can't
            # multiply hits (n_hit would exceed n_total and every
            # threshold flag would fire spuriously)
            lm.select(*lm_cols).dropDuplicates(),
            cand_keys + ["gram_type", "ngram"], "inner")
        .groupBy(*keys, *cand_keys, "family")
        .agg(F.count("*").alias("n_hit"))
    )
    base = totals.join(cand_codes, "doc_id")
    return base.join(hits, keys + cand_keys + ["family"], "left").select(
        *keys, *cand_keys, "family",
        (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_total")).alias("ratio"),
    )


def lm_match_ratio(df: DataFrame, lm: DataFrame, text_col: str, lang_col: str,
                   char_n: int = 3) -> DataFrame:
    """A6/J3: fraction of a row's char n-grams present in the LM for its
    language (features.py:337-354 LM-match ratio, membership-only like
    util.py:103-111). Left-semi join on (lang, ngram), counts ÷ total."""
    base = spread(df.select(lang_col, text_col)).withColumn(
        "_rid", F.monotonically_increasing_id()  # per source row, pre-explode
    )
    # two codegen explodes ≡ explode(char_ngrams_col(...)) — see
    # _exploded_char_ngrams (r6)
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"(?U)\s+"),
        lambda w: w != F.lit(""))
    w = base.select(
        F.col(lang_col).alias("lang_code"), "_rid",
        F.explode(words).alias("_w"),
    ).select(
        "lang_code", "_rid",
        F.concat(F.lit(" "), F.col("_w"), F.lit(" ")).alias("_pw"))
    pos = F.sequence(
        F.lit(1), F.greatest(F.length("_pw") - char_n + 1, F.lit(1)))
    grams = w.select(
        "lang_code", "_rid", "_pw", F.explode(pos).alias("_i")
    ).select(
        "lang_code", "_rid",
        F.col("_pw").substr(F.col("_i"), F.lit(char_n)).alias("ngram"))
    # ONE pass over grams: a left join against the deduped LM marks
    # each gram, and a single aggregate computes total and hits
    # together. The previous totals⋈hits shape evaluated the uncached
    # grams subtree TWICE, and monotonically_increasing_id values are
    # only stable if both evaluations see identical partitioning — a
    # silent wrong-pairing hazard on shuffled inputs. Single lineage
    # removes it; dropDuplicates keeps the join a membership test.
    lm_set = (
        lm.filter(F.col("gram_type") == "char")
        .select("lang_code", "ngram").dropDuplicates()
        .withColumn("_in_lm", F.lit(1))
    )
    return (
        grams.join(lm_set, ["lang_code", "ngram"], "left")
        .groupBy("_rid", "lang_code")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.coalesce(F.col("_in_lm"), F.lit(0))).alias("n_hit"),
        )
        .select(
            "lang_code",
            (F.col("n_hit") / F.col("n_total")).alias("match_ratio"),
        )
    )
