"""Text-analysis + deduplication operators over `documents` (SURVEY §2.8
F1-F3 n-grams, A3/J1 mention counting, plus the training-data-pipeline
ops the engine adds: exact dedup, MinHash+LSH, SimHash, n-gram Jaccard,
token stats, fingerprinting, quality scoring).

Cross-engine determinism: every hash is md5 (identical hex in Spark and
DuckDB); n-grams via explicit position sequences; token split pinned to
(?U)\\s+ ↔ \\s+ (RE2); all ratios computed as double divisions of exact
ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texthash import make_minhash_udf, make_simhash_udf
from .util import spread, t

QUERIES = {}
ORACLE_SQL = {}


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn
    return reg


def _words(col):
    """Non-empty whitespace tokens (matches RE2 \\s+ split + filter)."""
    return F.filter(F.split(F.trim(col), r"(?U)\s+"), lambda w: w != F.lit(""))


_WORDS_SQL = "list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> '')"


# ---------------------------------------------------------------------------
# token_stats — token counting + basic quality stats (text analysis)
# ---------------------------------------------------------------------------

@_q("token_stats")
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(words).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_distinct_tokens"),
        (
            F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)).cast("double")
            / F.greatest(F.size(words), F.lit(1))
        ).alias("mean_token_len"),
    )


ORACLE_SQL["token_stats"] = f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len({_WORDS_SQL}) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct({_WORDS_SQL})) AS BIGINT) AS n_distinct_tokens,
  CAST(COALESCE(list_sum(list_transform({_WORDS_SQL}, w -> length(w))), 0) AS DOUBLE)
    / greatest(len({_WORDS_SQL}), 1) AS mean_token_len
FROM documents
"""


# ---------------------------------------------------------------------------
# bpe_token_stats — GPT-2-style pre-tokenizer counting: contractions,
# space-prefixed letter/digit runs, punctuation runs. Token counting the
# way a training-data pipeline budgets documents (≈ tiktoken's
# pre-tokenization, minus the byte-level BPE merges which need a learned
# vocab). Same regex runs in Java (Spark) and RE2 (DuckDB): \p{L}/\p{N}
# are Unicode categories in both, \s is ASCII in both.
# ---------------------------------------------------------------------------

_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


@_q("bpe_token_stats")
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(_BPE_RE), 0)
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        (
            F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w))
            .cast("double") / F.greatest(F.size(toks), F.lit(1))
        ).alias("mean_tok_len"),
    )


_BPE_SQL = _BPE_RE.replace("'", "''")
ORACLE_SQL["bpe_token_stats"] = f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) AS n_bpe_tokens,
  CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_SQL}'))) AS BIGINT) AS n_distinct,
  CAST(COALESCE(list_sum(list_transform(regexp_extract_all(text, '{_BPE_SQL}'), w -> length(w))), 0) AS DOUBLE)
    / greatest(len(regexp_extract_all(text, '{_BPE_SQL}')), 1) AS mean_tok_len
FROM documents
"""


# ---------------------------------------------------------------------------
# char_trigram_counts — F1 character n-grams → A5 n-gram counting
# (analyzers.py:285-310 + buildlms.py:98-124), top-20 deterministic.
# ---------------------------------------------------------------------------

@_q("char_trigram_counts")
def char_trigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    grams = F.transform(
        F.sequence(F.lit(1), F.length("text") - 2),
        lambda i: F.col("text").substr(i, F.lit(3)),
    )
    return (
        docs.filter(F.length("text") >= 3)
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(20)
    )


ORACLE_SQL["char_trigram_counts"] = """
SELECT substr(text, i, 3) AS gram, COUNT(*) AS n
FROM documents, unnest(generate_series(1, length(text)-2)) u(i)
WHERE length(text) >= 3
GROUP BY gram
ORDER BY n DESC, gram ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# word_bigram_counts — F2 word n-grams, top-20.
# ---------------------------------------------------------------------------

@_q("word_bigram_counts")
def word_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(words) - 1),
        lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
    )
    return (
        docs.filter(F.size(words) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


ORACLE_SQL["word_bigram_counts"] = f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents)
SELECT words[i] || ' ' || words[i+1] AS bigram, COUNT(*) AS n
FROM w, unnest(generate_series(1, len(words)-1)) u(i)
WHERE len(words) >= 2
GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# exact_dedup — hash-groupBy dedup: canonical doc per md5(text).
# ---------------------------------------------------------------------------

@_q("exact_dedup")
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.withColumn("text_md5", F.md5("text"))
        .groupBy("text_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc"),
        )
    )


ORACLE_SQL["exact_dedup"] = """
SELECT md5(text) AS text_md5, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_doc
FROM documents GROUP BY text_md5
"""


# ---------------------------------------------------------------------------
# minhash_signatures — MinHash over word shingles: 8 permutations via
# seeded md5; the signature is the per-seed min. (Dedup scale path.)
# ---------------------------------------------------------------------------

N_MINHASH = 8


def _minhash_col(k: int):
    # closure factory (a k=k default arg breaks Spark HOF arity);
    # kept as the Catalyst reference form the Arrow kernel is pinned
    # against (tests/test_vecfold.py)
    return lambda w: F.md5(F.concat(F.lit(f"s{k}|"), w))


_minhash4_udf = make_minhash_udf(4)


_minhash8_udf = make_minhash_udf(N_MINHASH)


def _minhash_signatures_df(spark: SparkSession, sf_dir: str,
                           spread_input: bool = False,
                           n_hashes: int = N_MINHASH) -> DataFrame:
    """Shared signature builder. ``spread_input`` is for AGGREGATING
    consumers (lsh_band_buckets): their count() path must compute the
    kernel, so the starved scan is repartitioned first. The bare
    minhash_signatures query emits per-row columns that a count()
    prunes entirely — spreading there would only add an exchange.
    ``n_hashes`` lets a consumer that only reads h0..h{k-1} skip the
    unused seeds (a struct-returning kernel is opaque to column
    pruning); seed k's hash is identical at any width."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    if spread_input:
        docs = spread(docs)
    udf = {4: _minhash4_udf, N_MINHASH: _minhash8_udf}[n_hashes]
    arr = F.array_distinct(_words(F.col("text")))
    return (
        docs.select("doc_id", arr.alias("_ws"))
        .where(F.size("_ws") > 0)
        .select("doc_id", udf("_ws").alias("_h"))
        .select("doc_id", "_h.*")
    )


@_q("minhash_signatures")
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signatures are per-row (one Arrow kernel call on the word array),
    not explode+groupBy: a doc's words are already co-located in its
    row, so the whole signature pass is shuffle-free with zero
    aggregation state — the shape that survives 10^12 docs. The DuckDB
    oracle keeps the equivalent unnest+GROUP BY formulation, so the two
    independent derivations cross-check each other. Empty-shingle docs
    are dropped, matching the explode form (no rows → no group).

    r6: the per-seed `array_min(transform(arr, md5(...)))` HOF chain is
    replaced by functions/texthash.make_minhash_udf — identical hex
    minima (pinned by tests/test_vecfold.py), with the per-word md5
    cached process-wide instead of recomputed per document."""
    return _minhash_signatures_df(spark, sf_dir)


ORACLE_SQL["minhash_signatures"] = f"""
WITH s AS (
  SELECT doc_id, unnest(list_distinct({_WORDS_SQL})) AS w FROM documents
)
SELECT doc_id,
  {', '.join(f"MIN(md5('s{k}|' || w)) AS h{k}" for k in range(N_MINHASH))}
FROM s GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# lsh_band_buckets — LSH banding over the minhash signature: docs sharing
# a band hash are near-dup candidates; emit buckets with >1 doc.
# ---------------------------------------------------------------------------

@_q("lsh_band_buckets")
def lsh_band_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # only h0..h3 feed the two bands — compute 4 seeds, not 8
    sig = _minhash_signatures_df(spark, sf_dir, spread_input=True,
                                 n_hashes=4)
    bands = sig.select(
        "doc_id",
        F.md5(F.concat_ws("|", "h0", "h1")).alias("band0"),
        F.md5(F.concat_ws("|", "h2", "h3")).alias("band1"),
    )
    stacked = bands.select(
        "doc_id", F.lit(0).alias("band_idx"), F.col("band0").alias("band_hash")
    ).unionByName(
        bands.select(
            "doc_id", F.lit(1).alias("band_idx"), F.col("band1").alias("band_hash")
        )
    )
    return (
        stacked.groupBy("band_idx", "band_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_docs") > 1)
    )


ORACLE_SQL["lsh_band_buckets"] = f"""
WITH s AS (
  SELECT doc_id, unnest(list_distinct({_WORDS_SQL})) AS w FROM documents
), sig AS (
  SELECT doc_id,
    {', '.join(f"MIN(md5('s{k}|' || w)) AS h{k}" for k in range(N_MINHASH))}
  FROM s GROUP BY doc_id
), stacked AS (
  SELECT doc_id, 0 AS band_idx, md5(h0 || '|' || h1) AS band_hash FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_idx, md5(h2 || '|' || h3) AS band_hash FROM sig
)
SELECT band_idx, band_hash, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
FROM stacked GROUP BY band_idx, band_hash HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# minhash_jaccard_pairs — the MinHash→LSH→verify composition (the text
# twin of emb_near_dup_pairs): candidate pairs come from shared LSH
# bands (equi-join on band hash — never all-pairs), the exact
# distinct-word Jaccard is computed ONLY for candidates, and pairs at
# jaccard ≥ _MJ_MIN = 0.9 survive. Banding recall at the threshold is
# the standard LSH trade (2 bands × 2 hashes ⇒ 1-(1-0.81)² ≈ 0.96 at
# jac=0.9, →1 as jac→1); candidates, not exhaustiveness, are the
# semantics.
# ---------------------------------------------------------------------------

_MJ_MIN = 0.9
_MJ_MAX_BUCKET = 1000  # LSH hot-bucket guard (B docs in a band → B²
                       # candidates); replicated in the DuckDB oracle


@_q("minhash_jaccard_pairs")
def minhash_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    arr = F.array_distinct(_words(F.col("text")))
    w = docs.select("doc_id", F.explode(arr).alias("w"))
    # shuffle-free signature + set-size pass (see minhash_signatures);
    # only the exact-intersection verify below needs word-grain rows
    sig = (
        docs.select("doc_id", arr.alias("_ws"))
        .where(F.size("_ws") > 0)
        .select("doc_id", F.size("_ws").alias("sz"),
                _minhash4_udf("_ws").alias("_h"))
        .select("doc_id", "sz", "_h.*")
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(
            F.md5(F.concat_ws("|", "h0", "h1")),
            F.md5(F.concat_ws("|", "h2", "h3")),
        )).alias("band_idx", "band_hash"),
    )
    hot = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > _MJ_MAX_BUCKET)
        .select("band_idx", "band_hash")
    )
    bands = bands.join(hot, ["band_idx", "band_hash"], "left_anti")
    cand = (
        bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_hash")
        .join(bands.select(F.col("doc_id").alias("doc_b"),
                           "band_idx", "band_hash"),
              ["band_idx", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sizes = sig.select("doc_id", "sz")
    wa = w.select(F.col("doc_id").alias("doc_a"), "w")
    wb = w.select(F.col("doc_id").alias("doc_b"), "w")
    inter = (
        cand.join(wa, "doc_a").join(wb, ["doc_b", "w"])
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    )
    return (
        inter
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("sz").alias("sz_b")), "doc_b")
        .withColumn("jaccard", F.round(
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .where(F.col("jaccard") >= _MJ_MIN)
        .select("doc_a", "doc_b", "jaccard")
    )


ORACLE_SQL["minhash_jaccard_pairs"] = f"""
WITH w AS (
  SELECT DISTINCT doc_id, unnest(list_distinct({_WORDS_SQL})) AS w
  FROM documents
), sig AS (
  SELECT doc_id,
    {', '.join(f"MIN(md5('s{k}|' || w)) AS h{k}" for k in range(4))}
  FROM w GROUP BY doc_id
), bands0 AS (
  SELECT doc_id, 0 AS band_idx, md5(h0 || '|' || h1) AS band_hash FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_idx, md5(h2 || '|' || h3) AS band_hash FROM sig
), hot AS (
  SELECT band_idx, band_hash FROM bands0
  GROUP BY band_idx, band_hash HAVING COUNT(*) > {_MJ_MAX_BUCKET}
), bands AS (
  SELECT b0.* FROM bands0 b0
  LEFT JOIN hot h
    ON b0.band_idx = h.band_idx AND b0.band_hash = h.band_hash
  WHERE h.band_hash IS NULL
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM w GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN w wa ON wa.doc_id = c.doc_a
  JOIN w wb ON wb.doc_id = c.doc_b AND wb.w = wa.w
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= {_MJ_MIN}
"""


# ---------------------------------------------------------------------------
# simhash_near_pairs — SimHash's actual dedup use: candidate pairs share
# one of the two 16-bit signature halves (pigeonhole: any pair within
# hamming ≤ 1 per half shares a half; the standard banding trade), then
# exact hamming via bit_count(xor) ≤ threshold. Equi-join on the band —
# never all-pairs. NB the OUTPUT is data-dependent: this synthetic corpus
# is dup-saturated (small shared lexicons), so true near-pairs — and
# hence rows — grow quadratically with sf; at scale the bounded product
# is dup_components/dedup_keep_list over these pairs, not the pair list.
# ---------------------------------------------------------------------------

_HAMMING_MAX = 3
_SH_BITS = 32  # 16 bits (the fingerprint demo above) can't discriminate
               # docs sharing a small lexicon; the pairs path uses 32


_simhash32_udf = make_simhash_udf(_SH_BITS, 8)


def _simhash32(spark, sf_dir):
    # r6: one Arrow kernel call per doc (exact-integer ±1 bit sums,
    # functions/texthash.py) replaces the explode + 32-conditional-SUM
    # aggregation — the signature pass is now shuffle-free; identical
    # values pinned by tests/test_vecfold.py
    docs = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    arr = F.array_distinct(_words(F.col("text")))
    return (
        docs.select("doc_id", arr.alias("_ws"))
        .where(F.size("_ws") > 0)
        .select("doc_id", _simhash32_udf("_ws").alias("simhash32"))
    )


@_q("simhash_near_pairs")
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _simhash32(spark, sf_dir)
    bands = sh.select(
        "doc_id", "simhash32",
        F.posexplode(F.array(
            F.col("simhash32").bitwiseAND(F.lit(0xFFFF)),
            F.shiftright("simhash32", 16).bitwiseAND(F.lit(0xFFFF)),
        )).alias("band_idx", "band_val"),
    )
    a = bands.select(F.col("doc_id").alias("doc_a"),
                     F.col("simhash32").alias("sim_a"),
                     "band_idx", "band_val")
    b = bands.select(F.col("doc_id").alias("doc_b"),
                     F.col("simhash32").alias("sim_b"),
                     "band_idx", "band_val")
    ham = F.bit_count(
        F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= _HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
        .distinct()  # a pair may share both halves
    )


def _simhash_pairs_sql() -> str:
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (wh >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(_SH_BITS))
    sim = " + ".join(
        f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END"
        for b in range(_SH_BITS))
    return f"""
WITH wd AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS wh
  FROM (SELECT doc_id, unnest(list_distinct({_WORDS_SQL})) AS w FROM documents)
), bits AS (
  SELECT doc_id, {bit_sums} FROM wd GROUP BY doc_id
), sh AS (
  SELECT doc_id, CAST({sim} AS BIGINT) AS simhash32 FROM bits
), bands AS (
  SELECT doc_id, simhash32, j AS band_idx,
         (simhash32 >> (16 * j)) & 65535 AS band_val
  FROM sh, unnest([0, 1]) u(j)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash32, b.simhash32)) AS INT) AS hamming
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash32, b.simhash32)) <= {_HAMMING_MAX}
"""


# ---------------------------------------------------------------------------
# jaccard_similar_pairs — n-gram Jaccard near-dup: self-join on shared
# word-trigram shingles (frequency-capped), jaccard >= 0.05.
# ---------------------------------------------------------------------------

_JACCARD_MIN = 0.05
# corpus-relative stop-shingle cap: a shingle is a join key only if it
# appears in ≤ max(20, 1% of docs) documents — the absolute floor keeps
# small corpora exact while the 1% term keeps the candidate blow-up
# bounded as the corpus grows 100× (VERDICT r1 #9)
_SHINGLE_CAP_FLOOR = 20
_SHINGLE_CAP_FRAC = 0.01


@_q("jaccard_similar_pairs")
def jaccard_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    words = _words(F.col("text"))
    tri = F.transform(
        F.sequence(F.lit(1), F.size(words) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i),
            F.element_at(words, i + 1),
            F.element_at(words, i + 2),
        ),
    )
    sh = (
        docs.filter(F.size(words) >= 3)
        .select("doc_id", F.explode(F.array_distinct(tri)).alias("sh"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    # frequency cap: drop shingles present in too many docs
    # (stop-shingles); threshold scales with corpus size via a 1-row
    # cross-joined agg so the whole query stays one lazy DAG
    total = docs.agg(F.count("*").alias("n_docs_total"))
    rare = (
        sh.groupBy("sh").agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("df") <= F.greatest(
            F.lit(float(_SHINGLE_CAP_FLOOR)),
            F.lit(_SHINGLE_CAP_FRAC) * F.col("n_docs_total")))
    )
    sh2 = sh.join(rare.select("sh"), "sh")
    a = sh2.alias("a")
    b = sh2.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= _JACCARD_MIN)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


ORACLE_SQL["jaccard_similar_pairs"] = f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
sh AS (
  SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS sh
  FROM w, unnest(generate_series(1, len(words)-2)) u(i)
  WHERE len(words) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
rare AS (SELECT sh FROM sh GROUP BY sh
         HAVING COUNT(*) <= greatest({float(_SHINGLE_CAP_FLOOR)},
                                     {_SHINGLE_CAP_FRAC} * (SELECT COUNT(*) FROM documents))),
sh2 AS (SELECT sh.* FROM sh JOIN rare USING (sh)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b, inter,
       ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6)
      >= {_JACCARD_MIN}
"""


# ---------------------------------------------------------------------------
# simhash — 16-bit SimHash from md5 bits of distinct words; near-dup
# fingerprint. Bits decoded from the first 4 hex chars of each word's md5.
# ---------------------------------------------------------------------------

_simhash16_udf = make_simhash_udf(16, 4)


@_q("simhash")
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r6: Arrow kernel, shuffle-free (see _simhash32)
    docs = t(spark, sf_dir, "documents")
    arr = F.array_distinct(_words(F.col("text")))
    return (
        docs.select("doc_id", arr.alias("_ws"))
        .where(F.size("_ws") > 0)
        .select("doc_id", _simhash16_udf("_ws").alias("simhash16"))
    )


ORACLE_SQL["simhash"] = f"""
WITH wd AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 4))::BIGINT AS wh
  FROM (SELECT doc_id, unnest(list_distinct({_WORDS_SQL})) AS w FROM documents)
), bits AS (
  SELECT doc_id,
    {', '.join(f"SUM(CASE WHEN (wh >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(16))}
  FROM wd GROUP BY doc_id
)
SELECT doc_id,
  CAST({' + '.join(f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(16))} AS BIGINT) AS simhash16
FROM bits
"""

# registered here: the pairs oracle embeds ORACLE_SQL["simhash"], which
# is only defined at this point in the module
ORACLE_SQL["simhash_near_pairs"] = _simhash_pairs_sql()


# ---------------------------------------------------------------------------
# doc_fingerprint — rolling polynomial hash (mod 1e9+7) + md5 fingerprint.
# Fold semantics pinned to DuckDB's 2-arg list_reduce (first element is
# the init), mirrored in Spark with slice + aggregate.
# ---------------------------------------------------------------------------

_MOD = 1_000_000_007


@_q("doc_fingerprint")
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    codes = F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c).cast("bigint"))
    rolling = F.aggregate(
        F.slice(codes, 2, F.greatest(F.size(codes) - 1, F.lit(0))),
        F.element_at(codes, 1),
        lambda acc, c: (acc * 31 + c) % _MOD,
    )
    return docs.filter(F.length("text") > 0).select(
        "doc_id",
        F.md5("text").alias("md5_fp"),
        rolling.alias("rolling_fp"),
    )


ORACLE_SQL["doc_fingerprint"] = f"""
SELECT doc_id, md5(text) AS md5_fp,
  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
              (acc, c) -> (acc * 31 + c) % {_MOD}) AS rolling_fp
FROM documents WHERE length(text) > 0
"""


# ---------------------------------------------------------------------------
# stopword_quality — quality scoring over documents: stopword ratio
# against an inline English function-word list + keep rule (M4 family).
# ---------------------------------------------------------------------------

_STOPS = ["the", "a", "of", "and", "to", "in", "is"]


@_q("stopword_quality")
def stopword_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    stops = F.array(*[F.lit(s) for s in _STOPS])
    n_stop = F.aggregate(
        words, F.lit(0),
        lambda a, w: a + F.when(F.array_contains(stops, F.lower(w)), 1).otherwise(0),
    )
    n_words = F.size(words)
    ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / n_words
    )
    return docs.select(
        "doc_id",
        F.round(ratio, 6).alias("stopword_ratio"),
        (ratio >= 0.03).alias("stopword_ok"),
    )


ORACLE_SQL["stopword_quality"] = f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
r AS (
  SELECT doc_id,
    CASE WHEN len(words) = 0 THEN 0.0
         ELSE CAST(len(list_filter(words, x -> list_contains({_STOPS}, lower(x)))) AS DOUBLE) / len(words)
    END AS ratio
  FROM w
)
SELECT doc_id, ROUND(ratio, 6) AS stopword_ratio, ratio >= 0.03 AS stopword_ok FROM r
"""


# ---------------------------------------------------------------------------
# term_mention_counts — J1 name→codes fan-out + A3 mention counting
# (analyzers.py:276-281; main.py:479-491): inline term dimension with
# multiple codes per term; counts divided by fan-out degree.
# ---------------------------------------------------------------------------

_TERMS = [
    ("table", ["tbl", "tab"]),
    ("row", ["r"]),
    ("scan", ["sc", "scn", "s"]),
    ("merge", ["mrg"]),
    ("join", ["jn", "j"]),
]


@_q("term_mention_counts")
def term_mention_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    dim = spark.createDataFrame(
        [(name, code) for name, codes in _TERMS for code in codes],
        ["term", "code"],
    )
    fanout = {name: len(codes) for name, codes in _TERMS}
    deg = spark.createDataFrame(list(fanout.items()), ["term", "degree"])
    occ = (
        docs.crossJoin(F.broadcast(dim))
        .withColumn(
            "n_occ",
            (
                (F.length("text") - F.length(F.expr("replace(text, term, '')")))
                / F.length("term")
            ).cast("bigint"),
        )
        .filter(F.col("n_occ") > 0)
    )
    return (
        occ.groupBy("term", "code")
        .agg(F.sum("n_occ").alias("raw_mentions"))
        .join(F.broadcast(deg), "term")
        .withColumn(
            "adj_mentions",
            F.round(F.col("raw_mentions") / F.col("degree"), 6),
        )
        .select("term", "code", "raw_mentions", "adj_mentions")
    )


_TERMS_SQL = " UNION ALL ".join(
    f"SELECT '{name}' AS term, '{code}' AS code, {len(codes)} AS degree"
    for name, codes in _TERMS
    for code in codes
)

ORACLE_SQL["term_mention_counts"] = f"""
WITH dim AS ({_TERMS_SQL}),
occ AS (
  SELECT term, code, degree,
         CAST((length(text) - length(replace(text, term, ''))) / length(term) AS BIGINT) AS n_occ
  FROM documents CROSS JOIN dim
)
SELECT term, code,
       CAST(SUM(n_occ) AS BIGINT) AS raw_mentions,
       ROUND(CAST(SUM(n_occ) AS DOUBLE) / degree, 6) AS adj_mentions
FROM occ WHERE n_occ > 0
GROUP BY term, code, degree
"""


# ---------------------------------------------------------------------------
# url_canonical — URL canonicalization (round 3): the dedup/bucketing key
# normalization every crawl pipeline runs before url-exact dedup. The
# driver tables carry no messy URLs, so deterministic mess (case, default
# ports, trailing slash, unsorted params, fragments) is synthesized from
# md5(CAST(doc_id AS VARCHAR)) IDENTICALLY in both engines, then canonicalized: Spark via
# functions.canonical_url (pure codegen SQL), DuckDB by replaying the
# same steps.
# ---------------------------------------------------------------------------

def _messy_url_col():
    did = F.col("doc_id").cast("string")
    h = F.md5(did.cast("binary"))
    b = lambda i: F.ascii(F.substring(h, i, 1))  # noqa: E731
    return F.concat(
        F.when(b(1) % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(b(2) % 2 == 0, F.lit("WWW.Site")).otherwise(F.lit("www.site")),
        (b(3) % 20).cast("string"),
        F.lit(".COM"),
        F.when(b(4) % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/docs/"), did,
        F.when(b(5) % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(b(6) % 2 == 0, F.lit("?z=9&a=1&m=5")).otherwise(F.lit("")),
        F.when(b(7) % 4 == 0, F.lit("#SECTION-2")).otherwise(F.lit("")),
    )


@_q("url_canonical")
def url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline import canonical_url

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return docs.select(
        "doc_id",
        _messy_url_col().alias("url_raw"),
        canonical_url(_messy_url_col()).alias("url_canon"),
    )


_MESSY_URL_SQL = """
  CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)),1,1)) % 2 = 0 THEN 'HTTPS' ELSE 'https' END ||
  '://' ||
  CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)),2,1)) % 2 = 0 THEN 'WWW.Site' ELSE 'www.site' END ||
  CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)),3,1)) % 20 AS VARCHAR) || '.COM' ||
  CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)),4,1)) % 3 = 0 THEN ':443' ELSE '' END ||
  '/docs/' || CAST(doc_id AS VARCHAR) ||
  CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)),5,1)) % 3 = 0 THEN '/' ELSE '' END ||
  CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)),6,1)) % 2 = 0 THEN '?z=9&a=1&m=5' ELSE '' END ||
  CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)),7,1)) % 4 = 0 THEN '#SECTION-2' ELSE '' END
"""

ORACLE_SQL["url_canonical"] = f"""
WITH raw AS (
  SELECT doc_id, ({_MESSY_URL_SQL}) AS url_raw FROM documents
), defrag AS (
  SELECT doc_id, url_raw, regexp_replace(url_raw, '#.*$', '') AS u FROM raw
), parts AS (
  SELECT doc_id, url_raw,
         lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
  FROM defrag
), hp AS (
  SELECT doc_id, url_raw, scheme, rest,
         lower(regexp_extract(rest, '^([^/?]+)', 1)) AS hostport,
         regexp_extract(rest, '^[^/?]+(.*)$', 1) AS pathq
  FROM parts
), canon AS (
  SELECT doc_id, url_raw, scheme,
         CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
              WHEN scheme = 'http'  THEN regexp_replace(hostport, ':80$', '')
              ELSE hostport END AS host,
         CASE WHEN regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/$', '') = ''
              THEN '/'
              ELSE regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/$', '') END AS path,
         array_to_string(
           list_sort(list_filter(string_split(
             regexp_extract(pathq, '\\?(.*)$', 1), '&'), x -> x <> '')),
           '&') AS sorted_q
  FROM hp
)
SELECT doc_id, url_raw,
       scheme || '://' || host || path ||
       CASE WHEN sorted_q <> '' THEN '?' || sorted_q ELSE '' END AS url_canon
FROM canon
"""


# ---------------------------------------------------------------------------
# line_dedup_stats — C4-style cross-document span dedup (round 3): "we
# discard all but one of any three-sentence span occurring more than
# once" (C4/T5 paper §2.2) at the line grain: across the WHOLE corpus
# each eligible line (≥10 chars — blank/short lines are formatting, not
# content, and must survive) keeps only its FIRST occurrence in
# (url, position) order. The deterministic web_pages generator includes
# repeated-spam docs, so the dedup is exercised for real (43 duplicated
# lines / 271 occurrences at 500 docs).
#
# Scale shape (fixed round 4): the first-occurrence rule is a
# map-side-combinable groupBy(line).agg(min(struct(url, pos))) — every
# task pre-reduces its local occurrences of a line to ONE candidate
# before the exchange, so a viral boilerplate line with 10^8
# occurrences costs one row per upstream task, not a single-task
# pile-up (the r3 row_number window had no partial aggregation; the
# VERDICT flagged it as the repo's one scale-killer). The keep mark is
# a join back on the line key, which AQE's skew-join splitting can
# subdivide; min(struct) ordering equals the old orderBy(url, pos)
# total order, so results are bit-identical (golden oracle unchanged).
# ---------------------------------------------------------------------------

def mark_first_occurrence(
    lines: DataFrame, min_len: int = 10
) -> DataFrame:
    """C4-style cross-document line dedup mark: keep = line shorter
    than min_len (formatting, always kept) OR this (url, pos) is the
    corpus-wide first occurrence of the line."""
    firsts = (
        lines.where(F.length("line") >= min_len)
        .groupBy("line")
        .agg(F.min(F.struct("url", "pos")).alias("_first"))
    )
    return (
        lines.join(firsts, "line", "left")
        .withColumn(
            "keep",
            F.when(F.length("line") < min_len, F.lit(True)).otherwise(
                (F.col("_first.url") == F.col("url"))
                & (F.col("_first.pos") == F.col("pos"))
            ),
        )
        .drop("_first")
    )


def _line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datagen import spark_web_pages

    pages = spark_web_pages(spark, 500).select("url", "lang", "text")
    lines = pages.select(
        "url", "lang",
        F.posexplode(F.split("text", "\n")).alias("pos", "line"),
    )
    marked = mark_first_occurrence(lines)
    return (
        marked.groupBy("lang")
        .agg(
            F.countDistinct("url").alias("n_docs"),
            F.count("*").alias("lines_before"),
            F.sum(F.col("keep").cast("long")).alias("lines_after"),
        )
        .orderBy("lang")
    )


QUERIES["line_dedup_stats"] = _line_dedup_stats

# input-independent (deterministic 500-doc generator) → golden VALUES
# oracle; pure counts, partitioning-invariant (first-occurrence rule is
# a total order on (url, pos)).
ORACLE_SQL["line_dedup_stats"] = """
SELECT * FROM (VALUES
  ('deu', CAST(78 AS BIGINT), CAST(491 AS BIGINT), CAST(430 AS BIGINT)),
  ('eng', CAST(97 AS BIGINT), CAST(608 AS BIGINT), CAST(574 AS BIGINT)),
  ('fra', CAST(104 AS BIGINT), CAST(673 AS BIGINT), CAST(646 AS BIGINT)),
  ('spa', CAST(105 AS BIGINT), CAST(672 AS BIGINT), CAST(594 AS BIGINT)),
  ('tok', CAST(116 AS BIGINT), CAST(710 AS BIGINT), CAST(682 AS BIGINT))
) AS t(lang, n_docs, lines_before, lines_after)
"""
