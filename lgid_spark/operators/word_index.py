"""Word/language int-index build (SURVEY §2.1 S5) — the reference's
generate_language_name_mapping (/root/reference/lgid/util.py:246-304):
every word appearing in language names gets a unique int id (starting at
10000 so all ids are 5 digits), each language name maps to the
concatenation of its words' ids, and each word maps to the languages it
appears in.

Determinism upgrade (documented divergence): the reference iterates a
Python set (arbitrary order); here ids are assigned in sorted-word order
so the index is reproducible.

Scale shape: a single global row_number would sort-shuffle everything
into ONE partition. Instead ids are assigned two-stage — row_number
within a sorted-PREFIX bucket plus a broadcast cumulative offset per
bucket — so the heavy ranking stays partitioned and only the small
per-bucket count frame is globally ordered. The bucket key is the
word's first `prefix_len` characters (default 3, VERDICT r2 item 5):
a 1-char bucket caps the bucket count at |alphabet| and real word
distributions pile onto a few letters, re-concentrating the rank at
web scale; a 3-char prefix yields thousands of buckets while staying
ORDER-CONSISTENT with the words (prefix order == word-range order),
which a hash bucket would not — dense ids need ordered ranges."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ID_START = 10000  # util.py:273 "so that all words will have a mapping 5 digits long"


def dense_word_ids(words: DataFrame, word_col: str = "word",
                   start: int = ID_START, prefix_len: int = 3) -> DataFrame:
    """distinct words → (word, word_id) with dense sequential ids in
    sorted-word order, assigned without a global single-partition sort."""
    w = words.select(F.col(word_col).alias("word")).distinct()
    b = w.withColumn("_bkt", F.substring("word", 1, prefix_len))
    # per-bucket sizes: small frame (≤ |alphabet|^prefix_len distinct
    # prefixes, in practice thousands) — the only globally-ordered step
    # order by UTF-8 BYTES, not strings: Spark compares strings by
    # UTF-16 code unit (surrogates sort non-BMP chars before U+E000+),
    # DuckDB by UTF-8 byte (code-point order) — materialized ids must
    # agree across engines. encode() is order-consistent with the
    # prefix bucketing because a UTF-8 encoding of a string prefix is
    # a byte-prefix of the encoded string.
    offsets = (
        b.groupBy("_bkt").agg(F.count("*").alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy(F.encode(F.col("_bkt"), "UTF-8"))
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .select("_bkt", "_offset")
    )
    rn = F.row_number().over(
        Window.partitionBy("_bkt").orderBy(F.encode(F.col("word"), "UTF-8")))
    return (
        b.join(F.broadcast(offsets), "_bkt")
        .select(
            "word",
            (F.lit(start) + F.col("_offset") + rn - 1).alias("word_id"),
        )
    )


def language_int_index(names: DataFrame, word_ids: DataFrame,
                       name_col: str = "name") -> DataFrame:
    """(name) × (word, word_id) → (name, index) where index is the
    concatenation of the name's word ids in word order
    (util.py:280-287)."""
    exploded = names.select(
        F.col(name_col).alias("name"),
        F.posexplode(F.split(F.col(name_col), r"\s+")).alias("pos", "word"),
    )
    return (
        exploded.join(word_ids, "word")
        .groupBy("name")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "word_id"))),
                    lambda s: s["word_id"].cast("string"),
                ),
            ).alias("index")
        )
    )


def word_language_mapping(names: DataFrame, lang_index: DataFrame,
                          name_col: str = "name") -> DataFrame:
    """(word → comma-joined language indexes), util.py:289-304."""
    exploded = names.select(
        F.col(name_col).alias("name"),
        F.explode(F.split(F.col(name_col), r"\s+")).alias("word"),
    ).distinct()
    return (
        exploded.join(lang_index, "name")
        .groupBy("word")
        .agg(F.concat_ws(",", F.sort_array(F.collect_list("index")))
             .alias("languages"))
    )
