"""Hypertable rollup (operators/rollup.py): the pre-aggregate +
residual-edge merge must equal direct aggregation of raw for ANY
range — including ranges narrower than a bucket, bucket-aligned
bounds, and bounds outside the data's time extent."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from netcdf_olap_spark.operators import rollup as ru
from netcdf_olap_spark.session import load_events

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ev(spark):
    e = (
        load_events(spark, SF_DIR)
        .withColumn("ts_us", F.expr("ts_ns DIV 1000"))
        .select("ts_us", "event_type", "value")
        .localCheckpoint()
    )
    lo, hi = e.agg(F.min("ts_us"), F.max("ts_us")).first()
    return e, lo, hi


@pytest.fixture(scope="module")
def rolled(spark, ev):
    e, _, _ = ev
    return ru.build_rollup(e).localCheckpoint()


def _direct(e, start_us, end_us):
    return (
        e.where((F.col("ts_us") >= start_us) & (F.col("ts_us") < end_us))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


def _check(spark, ev, rolled, start_us, end_us):
    e, _, _ = ev
    got = [tuple(r) for r in ru.rollup_range_stats(e, rolled, start_us, end_us).collect()]
    want = [tuple(r) for r in _direct(e, start_us, end_us).collect()]
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_rollup_equals_direct_on_random_ranges(spark, ev, rolled, data):
    _, lo, hi = ev
    a = data.draw(st.integers(min_value=lo - 10**9, max_value=hi + 10**9))
    b = data.draw(st.integers(min_value=lo - 10**9, max_value=hi + 10**9))
    start_us, end_us = min(a, b), max(a, b)
    _check(spark, ev, rolled, start_us, end_us)


def test_rollup_subbucket_range(spark, ev, rolled):
    _, lo, _ = ev
    _check(spark, ev, rolled, lo + 1000, lo + 1000 + ru.US_10MIN // 3)


def test_rollup_aligned_range(spark, ev, rolled):
    _, lo, hi = ev
    a = -(-lo // ru.US_10MIN) * ru.US_10MIN
    b = (hi // ru.US_10MIN) * ru.US_10MIN
    _check(spark, ev, rolled, a, b)


def test_rollup_empty_range(spark, ev, rolled):
    _, lo, _ = ev
    _check(spark, ev, rolled, lo - 10**9, lo - 1)
