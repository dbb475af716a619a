"""Shared fixtures: one SparkSession + one DuckDB oracle per run."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hetnetdb_spark.schemas import TABLE_NAMES
from hetnetdb_spark.session import get_spark

# sf0.001 keeps the suite fast; CI/driver parity runs use sf0.01 via env.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("hetnetdb-spark-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the ten base tables as views, mirroring
    the driver's pre-registration."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()
