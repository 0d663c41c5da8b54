"""S5 word/language int-index build (util.py:246-304) and S11
vector-debug sink (main.py print_feature_vector)."""

from __future__ import annotations

from lgid_spark.operators.word_index import (
    dense_word_ids,
    language_int_index,
    word_language_mapping,
)


def test_dense_word_ids_sequential(spark):
    words = spark.createDataFrame(
        [("tokri",), ("north",), ("tokri",), ("upper",), ("aer",)], ["word"])
    got = {r.word: r.word_id for r in dense_word_ids(words).collect()}
    # dense, sequential from 10000, sorted-word order, dupes collapsed
    assert got == {"aer": 10000, "north": 10001, "tokri": 10002,
                   "upper": 10003}


def test_language_index_and_word_mapping(spark):
    names = spark.createDataFrame(
        [("north tokri",), ("upper north tokri",), ("aer",)], ["name"])
    words = names.selectExpr("explode(split(name, ' ')) AS word")
    wid = dense_word_ids(words)
    # NB: r["index"], not r.index — Row.index is a method
    lidx = {r.name: r["index"]
            for r in language_int_index(names, wid).collect()}
    # ids: aer=10000 north=10001 tokri=10002 upper=10003
    assert lidx == {
        "aer": "10000",
        "north tokri": "1000110002",
        "upper north tokri": "100031000110002",
    }
    wmap = {r.word: r.languages
            for r in word_language_mapping(names, language_int_index(
                names, wid)).collect()}
    assert wmap["north"] == "1000110002,100031000110002"
    assert wmap["aer"] == "10000"


def test_vector_sink_format(spark, tmp_path):
    from lgid_spark.sinks.vector_sink import (
        feature_vector_lines,
        write_feature_vectors,
    )

    inst = spark.createDataFrame(
        [("d1", "s1", 3, "north tokri", "ntk", True,
          {"W-prev": True, "GL-first-lines": True, "W-after": False})],
        "doc_id string, span_id string, lineno int, lang_name string, "
        "lang_code string, label boolean, feats map<string,boolean>",
    )
    [row] = feature_vector_lines(inst).collect()
    # id has underscored name; only ACTIVE features listed, sorted
    assert row.value == "d1-s1-3-north_tokri-ntk: GL-first-lines, W-prev"
    out = str(tmp_path / "vectors")
    write_feature_vectors(inst, out)
    back = spark.read.text(out).collect()
    assert [r.value for r in back] == [row.value]


def test_dense_ids_match_duckdb_collation_for_non_bmp(spark):
    """Materialized word ids depend on sort ORDER, so the order must be
    engine-portable: Spark compares strings by UTF-16 code unit
    (surrogates put non-BMP chars before U+E000+), DuckDB by UTF-8
    byte. dense_word_ids orders by encoded bytes — code-point order in
    both engines."""
    import duckdb

    from lgid_spark.operators.word_index import dense_word_ids

    words = ["za", "\U0001F600x", "y", "apple", "\U0001F600a"]
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    got = [(r.word, r.word_id)
           for r in dense_word_ids(df).orderBy("word_id").collect()]
    want = duckdb.sql(
        "SELECT word, 10000 + ROW_NUMBER() OVER (ORDER BY word) - 1 "
        "FROM (SELECT UNNEST(?) AS word)", params=[words]).fetchall()
    assert got == [(w, int(i)) for w, i in want]
