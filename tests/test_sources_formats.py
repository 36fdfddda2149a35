"""S11: CSV / JSON relational scans round-trip with schema fidelity —
the multi-format source surface the reference lacks (it reads only
NetCDF)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _sample(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(200)
    )


def test_csv_roundtrip(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "orders_csv")
    df.write.option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .schema(df.schema)  # explicit schema: inference is a scan you don't want at scale
        .csv(path)
    )
    assert back.count() == 200
    assert back.schema == df.schema
    a = df.agg(F.sum("o_totalprice")).first()[0]
    b = back.agg(F.sum("o_totalprice")).first()[0]
    assert abs(a - b) < 1e-6


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC: the other columnar format Spark ships natively — round
    trip + predicate pushdown reaches the scan."""
    df = _sample(spark)
    path = str(tmp_path / "orders_orc")
    df.write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == 200
    assert back.schema == df.schema
    filtered = back.where(F.col("o_orderkey") <= 100).select("o_orderkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan
    assert filtered.count() == df.where(F.col("o_orderkey") <= 100).count()


def test_json_roundtrip(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "orders_json")
    df.write.json(path)
    back = spark.read.schema(df.schema).json(path)
    assert back.count() == 200
    assert sorted(r["o_orderkey"] for r in back.collect()) == sorted(
        r["o_orderkey"] for r in df.collect()
    )


def test_json_lines_projection_pushdown(spark, tmp_path):
    """Reading two columns of a JSON source only parses those fields
    (ReadSchema pruning — visible in the scan's schema)."""
    df = _sample(spark)
    path = str(tmp_path / "orders_json2")
    df.write.json(path)
    two = spark.read.schema(df.schema).json(path).select("o_orderkey", "o_totalprice")
    plan = two._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" not in plan.split("ReadSchema")[-1]


def test_xml_roundtrip(spark, tmp_path):
    """XML: Spark 4 ships the reader natively (spark-xml merged
    upstream). Round trip with an explicit schema — XML has no
    embedded types, so schema-on-read is the contract, exactly like
    the reference's self-describing NetCDF attributes (SURVEY §1.1)."""
    df = _sample(spark)
    path = str(tmp_path / "orders_xml")
    df.write.format("xml").option("rootTag", "orders").option("rowTag", "order").save(path)
    back = (
        spark.read.format("xml")
        .schema(df.schema)
        .option("rowTag", "order")
        .load(path)
    )
    assert back.count() == 200
    assert sorted(r["o_orderkey"] for r in back.collect()) == sorted(
        r["o_orderkey"] for r in df.collect()
    )
