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
    # Test-env shuffle width = the session's core count (r15): the
    # factory default (max(32, 2*cpus)) is a cluster-headroom knob; at
    # sf0.001/0.01 test scale it only multiplies per-task scheduling
    # and state-store fixed cost (a streaming drain commits one store
    # per STATE partition per trigger).  Every checked result is
    # partition-count-invariant — pinned by the 3-core parity gate —
    # and no test asserts a shuffle width.  Wall-clock: the streaming
    # files alone measured 2-3x faster at width 8 vs 32.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    yield spark
    spark.stop()
