"""S4 Crúbadán-style source: dir-index resolution + gram-file parse."""

from __future__ import annotations

from lgid_spark.sources.crubadan import (
    read_crubadan_lm,
    read_dir_index,
    write_synthetic_crubadan,
)


def test_crubadan_roundtrip(spark, tmp_path):
    base = str(tmp_path / "crubadan")
    index_path = write_synthetic_crubadan(base, {
        "aaa": ["foo", "bar"],
        "bbb": ["zip"],
    })
    index = read_dir_index(spark, index_path)
    assert index.count() == 2

    lm = read_crubadan_lm(spark, index, base)
    rows = {(r.lang_code, r.gram_type, r.ngram): r["count"] for r in lm.collect()}
    assert rows[("aaa", "word", "foo")] == 2  # rank-based count
    assert rows[("aaa", "word", "bar")] == 1
    assert rows[("bbb", "char", " zi")] == 1
    # wordbigrams file absent → skipped silently (util.py:149-153)
    assert not any(g == "wordbigram" for (_, g, _) in rows)

    # language pruning: only requested codes are read
    only_b = read_crubadan_lm(spark, index, base, codes=["bbb"])
    assert {r.lang_code for r in only_b.collect()} == {"bbb"}


def test_functions_facade():
    from lgid_spark.functions import (  # noqa: F401
        char_ngrams_col,
        host_of,
        morph_ngrams_col,
        normalize_name,
        salted_repartition,
        with_bucket,
        word_ngrams_col,
    )

    assert normalize_name("Mérenglo (East)") == "merenglo"
