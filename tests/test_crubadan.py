"""S4 Crúbadán-style source: dir-index resolution + gram-file parse,
including the REAL index layout (header language_name,iso_code,
crubadan_directory; file prefix = directory.split('_')[1])."""

from __future__ import annotations

import os

import pytest

from lgid_spark.sources.crubadan import (
    gram_file_path,
    read_crubadan_lm,
    read_dir_index,
    write_synthetic_crubadan,
)

REAL_INDEX = "/root/reference/res/crubadan_directory_index.csv"


@pytest.mark.skipif(not os.path.exists(REAL_INDEX), reason="no reference res")
def test_real_directory_index(spark):
    index = read_dir_index(spark, REAL_INDEX)
    assert index.columns == ["name", "code", "directory"]
    rows = {r.code: (r.name, r.directory) for r in index.collect()}
    # spot-check against the file's own first data rows
    assert rows["aaa"] == ("ghotuo", "aaa_aaa")
    assert rows["aab"] == ("alumu-tesu", "aab_aab")
    # file prefix is the SECOND underscore component (util.py:159-160)
    assert gram_file_path("/base", "aai_Latn", "-words.txt") == (
        "/base/aai_Latn/Latn-words.txt")
    assert gram_file_path("/base", "aaa_aaa", "-chartrigrams.txt") == (
        "/base/aaa_aaa/aaa-chartrigrams.txt")


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


def test_space_separated_files_and_ragged_index(spark, tmp_path):
    """Real Crúbadán archives are SPACE-separated (`na 2789`) — the
    reference parses any whitespace with count = last token, gram = the
    rest (a word bigram keeps its internal space). A ragged index row
    with no directory field is skipped like the reference, not crashed
    on; and tab rows still preserve space-padded grams byte-exactly."""
    base = str(tmp_path / "cru")
    d = os.path.join(base, "xx_ccc")
    os.makedirs(d)
    with open(os.path.join(d, "ccc-words.txt"), "w") as fh:
        fh.write("na 2789\nfoo   12\n")          # space runs
    with open(os.path.join(d, "ccc-wordbigrams.txt"), "w") as fh:
        fh.write("is mise 41\n")                 # gram has a space
    with open(os.path.join(d, "ccc-chartrigrams.txt"), "w") as fh:
        fh.write(" na\t7\n")                     # tab keeps the pad
    index_path = os.path.join(base, "idx.csv")
    with open(index_path, "w") as fh:
        fh.write("language_name,iso_code,crubadan_directory\n"
                 "ccc-name,ccc,xx_ccc\n"
                 "ragged-row,zzz\n")             # no directory field

    lm = read_crubadan_lm(
        spark, read_dir_index(spark, index_path), base)
    rows = {(r.gram_type, r.ngram): r["count"] for r in lm.collect()}
    assert rows == {
        ("word", "na"): 2789,
        ("word", "foo"): 12,
        ("wordbigram", "is mise"): 41,
        ("char", " na"): 7,
    }
