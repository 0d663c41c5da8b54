from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lgid_spark.session import get_spark, load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lgid_spark_tests", master="local[8]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)
