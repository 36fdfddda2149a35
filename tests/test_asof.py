"""The two as-of formulations (window vs cogroup+merge_asof) agree
row-for-row, including null matches and equal-timestamp ties."""

from __future__ import annotations

from pyspark.sql import functions as F

from netcdf_olap_spark.operators.asof import cogroup_asof
from netcdf_olap_spark.queries.relational import join_asof_last_order

SF = "/root/testdata/sf0.001"


def test_cogroup_asof_equals_window_asof(spark):
    want = {
        r["event_id"]: (r["o_orderkey"], r["o_totalprice"])
        for r in join_asof_last_order(spark, SF).collect()
    }

    from netcdf_olap_spark.session import load_events

    events = load_events(spark, SF).select("event_id", "user_id", "ts")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    got = {
        r["event_id"]: (r["o_orderkey"], r["o_totalprice"])
        for r in cogroup_asof(events, orders).collect()
    }
    assert set(got) == set(want)
    diffs = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not diffs, f"{len(diffs)} mismatches, e.g. {list(diffs.items())[:3]}"
    # sanity: some events match an order, some precede every order
    assert any(v[0] is not None for v in got.values())
