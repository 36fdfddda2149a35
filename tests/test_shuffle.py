"""Shuffle engineering (operators/shuffle.py): bucketed layout makes
the equi-join exchange-free; salted join is result-identical to the
plain join while spreading each key over n salt partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.operators import shuffle as sh

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-based join strategies so exchange elimination is
    observable (broadcast would hide it)."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_is_shuffle_free(spark, tmp_path, no_broadcast):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    sh.write_bucketed(
        orders.withColumnRenamed("o_orderkey", "k"), "t_orders_b", ["k"], 8,
        path=str(tmp_path / "ob"), sort_cols=["k"],
    )
    sh.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "k"), "t_lineitem_b", ["k"], 8,
        path=str(tmp_path / "lb"), sort_cols=["k"],
    )
    try:
        joined = sh.bucketed_join(spark, "t_orders_b", "t_lineitem_b", ["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it's correct
        want = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == want

        # control: the un-bucketed join DOES shuffle
        plain = orders.withColumnRenamed("o_orderkey", "k").join(
            lineitem.withColumnRenamed("l_orderkey", "k"), ["k"]
        )
        assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_salted_join_equals_plain_join(spark):
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    salted = sh.salted_join(lineitem, orders, ["l_orderkey"], entropy_col="l_linenumber", n=8)
    plain = lineitem.join(orders, ["l_orderkey"])
    assert salted.count() == plain.count()
    agg_s = salted.agg(F.sum("l_quantity"), F.sum("o_totalprice")).collect()[0]
    agg_p = plain.agg(F.sum("l_quantity"), F.sum("o_totalprice")).collect()[0]
    assert agg_s[0] == agg_p[0]
    assert agg_s[1] == pytest.approx(agg_p[1])


def test_salt_spreads_hot_key(spark):
    """A single hot key must land on >1 salt value — the whole point."""
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    hot = lineitem.groupBy("l_orderkey").count().orderBy(F.desc("count")).first()["l_orderkey"]
    salts = (
        sh.with_salt(lineitem.where(F.col("l_orderkey") == hot), "l_linenumber", 8)
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts > 1
