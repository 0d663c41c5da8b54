"""Queries retired from the driver registry (entry_queries.RETIRED) to
keep the driver's ~50-entry correctness run focused on less-proven
operators — their semantics stay pinned here against the SAME DuckDB
oracles the driver would have used."""

from __future__ import annotations

import duckdb
import pytest

from lgid_spark.entry_queries import RETIRED_ORACLE_SQL, RETIRED_QUERIES

from conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield c
    c.close()


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].map(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(RETIRED_QUERIES))
def test_retired_query_matches_oracle(spark, con, name):
    got = _canon(RETIRED_QUERIES[name](spark, SF_DIR).toPandas())
    want = _canon(con.execute(RETIRED_ORACLE_SQL[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert got.to_csv(index=False, float_format="%.6f") == \
        want.to_csv(index=False, float_format="%.6f")
