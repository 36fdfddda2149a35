"""Binned range join (operators/rangejoin.py): the bin rewrite must
be lossless vs the naive theta join for any bin size, and must plan
as a hash/sort-merge equi-join (never a nested loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.operators.rangejoin import binned_range_join
from netcdf_olap_spark.session import load_events

SF_DIR = "/root/testdata/sf0.001"
US_1H = 3_600_000_000


@pytest.fixture(scope="module")
def sides(spark):
    e = (
        load_events(spark, SF_DIR)
        .withColumn("ts_us", F.expr("ts_ns DIV 1000"))
        .localCheckpoint()
    )
    iv = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + 3 * US_1H).alias("end_us"),
    )
    pt = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts_us").alias("view_us")
    )
    return iv, pt


def _naive(iv, pt):
    return iv.join(
        pt,
        (iv.user_id == pt.user_id)
        & (pt.view_us >= iv.start_us)
        & (pt.view_us < iv.end_us),
    ).select(iv.purchase_id, pt.view_id)


@pytest.mark.parametrize("bin_size", [US_1H // 7, US_1H, 5 * US_1H])
def test_binned_equals_naive(spark, sides, bin_size):
    """Lossless for bins smaller, equal, and larger than the span."""
    iv, pt = sides
    got = binned_range_join(
        iv, pt, on=["user_id"], start_col="start_us", end_col="end_us",
        point_col="view_us", bin_size=bin_size,
    ).select("purchase_id", "view_id")
    want = _naive(iv, pt)
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert len(g) > 0
    assert g == w


def test_binned_join_is_equi_not_nested_loop(spark, sides):
    """Without a selective key the naive form can degrade to a nested
    loop; the binned form must always be an equi-join on (keys, bin)."""
    iv, pt = sides
    df = binned_range_join(
        iv, pt, on=["user_id"], start_col="start_us", end_col="end_us",
        point_col="view_us", bin_size=US_1H,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan[:1500]
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan), plan[:1500]
