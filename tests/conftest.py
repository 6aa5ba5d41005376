from __future__ import annotations

import os

import pytest

from java_iceberg_table_spark.oracle import duck_connect
from java_iceberg_table_spark.session import get_spark

# sf0.001 for fast local iteration; the driver's gate runs sf0.01.
# Override with SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests")
    yield spark


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()
