"""North-rule parity gate: Spark pipeline vs pure-pandas reference oracle.

BASELINE.json: keep/drop F1 >= 0.99; extracted/scrubbed text
byte-identical per url. We test for exact equality (stronger).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lgid_spark.datagen import pandas_web_pages, spark_web_pages
from lgid_spark.oracle.reference import process_pages
from lgid_spark.pipeline import quality_pipeline

N = 400


@pytest.fixture(scope="module")
def golden():
    return process_pages(pandas_web_pages(N)).sort_values("url").reset_index(drop=True)


@pytest.fixture(scope="module")
def spark_out(spark):
    df = quality_pipeline(spark, spark_web_pages(spark, N))
    return df.toPandas().sort_values("url").reset_index(drop=True)


def test_row_count(golden, spark_out):
    assert len(spark_out) == len(golden) == N


def test_extracted_text_byte_identical(golden, spark_out):
    assert (spark_out["extracted_text"] == golden["extracted_text"]).all()


def test_scrubbed_text_byte_identical(golden, spark_out):
    assert (spark_out["scrubbed_text"] == golden["scrubbed_text"]).all()


def test_langid_parity(golden, spark_out):
    assert (spark_out["lang_pred"] == golden["lang_pred"]).all()
    np.testing.assert_allclose(
        spark_out["langid_conf"], golden["langid_conf"], rtol=1e-6)
    np.testing.assert_allclose(spark_out["ppl"], golden["ppl"], rtol=1e-6)


@pytest.mark.parametrize("col", [
    "stopword_ratio", "mean_line_len", "symbol_word_ratio", "repetition_ratio",
])
def test_metric_parity(golden, spark_out, col):
    np.testing.assert_allclose(
        spark_out[col], golden[col], rtol=1e-12, err_msg=col)


def test_drop_reasons_exact(golden, spark_out):
    a = spark_out["drop_reasons"].map(list)
    b = golden["drop_reasons"].map(list)
    mismatches = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mismatches, mismatches[:5]


def test_keep_f1(golden, spark_out):
    tp = int(((spark_out["keep"]) & (golden["keep"])).sum())
    fp = int(((spark_out["keep"]) & (~golden["keep"])).sum())
    fn = int(((~spark_out["keep"]) & (golden["keep"])).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f1
    assert (spark_out["keep"] == golden["keep"]).all()  # exact, in practice


def test_labels_only_diet_matches_full(spark):
    """VERDICT r2 item 6: the Arrow-diet variant (emit flags off) must
    produce identical keep/drop decisions and metrics — only the two
    text columns disappear from the output (and from the Arrow return
    path)."""
    pages = spark_web_pages(spark, 300)
    full = quality_pipeline(spark, pages).select(
        "url", "keep", "lang_pred", "ppl", "n_words",
        "drop_reasons").collect()
    diet_df = quality_pipeline(
        spark, pages, emit_extracted=False, emit_scrubbed=False)
    assert "extracted_text" not in diet_df.columns
    assert "scrubbed_text" not in diet_df.columns
    diet = diet_df.select(
        "url", "keep", "lang_pred", "ppl", "n_words",
        "drop_reasons").collect()
    key = lambda r: r.url  # noqa: E731
    assert sorted(map(tuple, full), key=lambda t: t[0]) == \
        sorted(map(tuple, diet), key=lambda t: t[0])


def test_canonical_url_semantics(spark):
    """URL canonicalization edge cases: fragments, default ports, case,
    trailing slash, param ordering, bare '?'."""
    from lgid_spark.functions import canonical_url
    from pyspark.sql import functions as F

    cases = [
        ("HTTPS://WWW.Ex.COM:443/a/?b=2&a=1#f", "https://www.ex.com/a?a=1&b=2"),
        ("http://Ex.com:80/", "http://ex.com/"),
        ("http://ex.com:8080/p", "http://ex.com:8080/p"),  # non-default kept
        ("https://ex.com", "https://ex.com/"),
        ("https://ex.com/x/y/", "https://ex.com/x/y"),
        ("https://ex.com/x?", "https://ex.com/x"),
        ("https://ex.com:80/x", "https://ex.com:80/x"),  # 80 not https-default
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], ["u"])
    got = [r[0] for r in df.select(canonical_url(F.col("u"))).collect()]
    assert got == [want for _, want in cases]


def test_domain_blocklist_stage(spark):
    """Optional blocklist stage: blocked hosts gain a sorted
    'blocked_domain' drop reason and flip keep; others untouched."""
    from lgid_spark.pipeline import apply_domain_blocklist, quality_pipeline

    pages = spark_web_pages(spark, 60)
    out = quality_pipeline(spark, pages)
    hosts = (
        out.selectExpr("regexp_extract(url, 'https?://([^/]+)/', 1) AS h")
        .distinct().limit(1).collect()
    )
    blocked_host = hosts[0]["h"]
    bl = spark.createDataFrame([(blocked_host,)], ["host"])
    filtered = apply_domain_blocklist(out, bl)

    rows = {r.url: r for r in filtered.collect()}
    base = {r.url: r for r in out.collect()}
    n_blocked = 0
    for url, r in rows.items():
        if url.startswith(("http://" + blocked_host, "https://" + blocked_host)):
            n_blocked += 1
            assert "blocked_domain" in r.drop_reasons
            assert r.drop_reasons == sorted(r.drop_reasons)
            assert not r.keep
        else:
            assert list(r.drop_reasons) == list(base[url].drop_reasons)
            assert r.keep == base[url].keep
    assert n_blocked > 0
    assert len(rows) == len(base)


def test_keep_stats_golden_oracle_rederives(spark, tables):
    """VERDICT r4 item 2: pipeline_keep_stats' golden VALUES oracle is
    pinned from the INDEPENDENT pandas oracle. Re-derive the sf0.001
    block here every suite run: pandas-oracle histogram == Spark
    registry query == DuckDB golden oracle (sf-keyed)."""
    import duckdb
    import html as H

    from lgid_spark.entry_queries import ORACLE_SQL, QUERIES
    from tests.conftest import SF_DIR

    # independent derivation: documents → web pages → pandas oracle
    docs = tables["documents"].toPandas()
    pages = pd.DataFrame({
        "url": ("https://docs.example/" + docs["source"].astype(str)
                + "/" + docs["doc_id"].astype(str)),
        "warc_ts": pd.Timestamp("2024-01-01"),
        "html": [("<html><head><title>doc</title></head><body><p>"
                  + H.escape(t) + "</p></body></html>").encode("utf-8")
                 for t in docs["text"]],
        "text": docs["text"],
        "lang": docs["lang"],
    })
    out = process_pages(pages)
    out["drop_reasons_csv"] = out["drop_reasons"].map(",".join)
    golden = (
        out.groupby(["keep", "drop_reasons_csv"]).size().reset_index(name="n")
        .sort_values(["n", "drop_reasons_csv"], ascending=[False, True])
        .reset_index(drop=True))
    golden["n"] = golden["n"].astype("int64")

    spark_hist = QUERIES["pipeline_keep_stats"](spark, SF_DIR).toPandas()
    pd.testing.assert_frame_equal(
        spark_hist, golden[spark_hist.columns.tolist()], check_dtype=False)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')")
    oracle_hist = con.execute(ORACLE_SQL["pipeline_keep_stats"]).df()
    pd.testing.assert_frame_equal(
        oracle_hist, golden[oracle_hist.columns.tolist()], check_dtype=False)


def test_spark_pages_timezone_independent(spark):
    """ADVICE r4: spark_web_pages must not mutate the shared session's
    timeZone (the old conf.set leaked into every later query), and must
    yield identical warc_ts instants (epoch micros) whatever the
    session timezone is when the frame materializes — warc_ts crosses
    Arrow tz-aware."""
    from pyspark.sql import functions as F

    key = "spark.sql.session.timeZone"
    before = spark.conf.get(key)
    try:
        ref = [r["m"] for r in spark_web_pages(spark, 8)
               .select("url", F.unix_micros("warc_ts").alias("m"))
               .orderBy("url").collect()]
        assert spark.conf.get(key) == before  # generation has no side effect
        spark.conf.set(key, "America/New_York")
        shifted = [r["m"] for r in spark_web_pages(spark, 8)
                   .select("url", F.unix_micros("warc_ts").alias("m"))
                   .orderBy("url").collect()]
        assert shifted == ref
    finally:
        spark.conf.set(key, before)


def test_domain_blocklist_normalizes_hosts(spark):
    """ADVICE r3: uppercase hosts, explicit ports, path-less URLs, and
    uppercase blocklist entries must all still match."""
    from lgid_spark.pipeline import apply_domain_blocklist

    rows = [
        ("https://Bad.Example/page", True),        # case in url
        ("https://bad.example:8443/x", True),      # explicit port
        ("https://bad.example", True),             # no path after host
        ("https://UGLY.example/", True),           # blocklist side upper
        ("https://anyone@bad.example/x", True),    # userinfo evasion
        ("https://bad.example./x", True),          # trailing-dot FQDN
        ("https://fine.example/page", False),
    ]
    df = spark.createDataFrame(
        [(u, ["x"] if False else [], True) for u, _ in rows],
        "url string, drop_reasons array<string>, keep boolean")
    bl = spark.createDataFrame(
        [("bad.example",), ("UGLY.Example:80",)], ["host"])
    got = {r["url"]: r for r in apply_domain_blocklist(df, bl).collect()}
    for url, blocked in rows:
        assert (("blocked_domain" in got[url]["drop_reasons"]) == blocked), url
        assert got[url]["keep"] == (not blocked), url
