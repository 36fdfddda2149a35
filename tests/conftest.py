from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Test-scale split size (opt-in; see session.get_spark).
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA_ROOT, "sf0.001")
SF_ORACLE = os.path.join(TESTDATA_ROOT, "sf0.01")
SF_MED = os.path.join(TESTDATA_ROOT, "sf0.1")


@pytest.fixture(scope="session")
def spark():
    from netcdf_olap_spark.session import get_spark

    spark = get_spark("tests", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
