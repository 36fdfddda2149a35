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


def test_dynamic_partition_pruning_on_cube(spark, tmp_path):
    """DPP (SURVEY §4 O1's join-driven form): joining the
    date-partitioned cube against a filtered date dim must prune
    partitions at runtime — the scan carries a dynamicpruning
    subquery expression instead of reading every date directory."""
    from netcdf_olap_spark.session import load_grid
    from netcdf_olap_spark.sources.netcdf import write_cube_parquet

    from pyspark.sql import Row

    out = str(tmp_path / "cube")
    write_cube_parquet(load_grid(spark, register=False), out)
    cube = spark.read.parquet(out)
    # dim must be independent of the fact scan (a dim derived from the
    # same scan is planned as a self-join and skips DPP) and carry its
    # own filter — the classic star-schema shape
    dim = spark.createDataFrame(
        [Row(date="1990-01-05", tag="a"), Row(date="1990-01-06", tag="a"), Row(date="1990-02-01", tag="b")]
    )
    j = (
        cube.join(F.broadcast(dim.where(F.col("tag") == "a")), "date")
        .groupBy("variable")
        .count()
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime bloom-filter join pruning (Spark 3.3+): a selective dim
    filter should inject a bloom filter on the fact side's join key so
    non-matching fact rows drop at the scan, before the shuffle."""
    old = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB"
        ),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    old["spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"] = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "10GB"
    )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "500MB")
    # test data is far below the production 10GB application-side bar
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    # force a shuffle join: bloom filters only help non-broadcast plans
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
