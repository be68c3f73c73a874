"""Shared fixtures: one SparkSession per test session, DuckDB oracle conns."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_trans_spark.session import get_spark  # noqa: E402
from hadoop_trans_spark.testing.oracle import duckdb_connect  # noqa: E402

SF_SMOKE = os.environ.get("SF_SMOKE_DIR", "/root/testdata/sf0.001")
SF_T2 = os.environ.get("SF_T2_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hadoop_trans_spark_tests")
    yield s


@pytest.fixture(scope="session")
def smoke_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def t2_dir() -> str:
    return SF_T2


@pytest.fixture(scope="session")
def oracle_smoke():
    con = duckdb_connect(SF_SMOKE)
    yield con
    con.close()


@pytest.fixture(scope="session")
def oracle_t2():
    con = duckdb_connect(SF_T2)
    yield con
    con.close()
