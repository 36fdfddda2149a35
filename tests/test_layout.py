"""Clustered-write sink (sinks/layout.py): the write must produce the
requested file count, disjoint-narrow row groups on the cluster key
(footer stats), and a measurably high skip fraction for selective
range predicates — the write-side half of the pruning story."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.sinks import layout

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lay") / "orders")
    df = spark.read.parquet(f"{SF}/orders.parquet")
    layout.write_clustered(df, path, cluster_by=["o_orderdate", "o_orderkey"], n_files=8)
    return path, df


def test_file_count_and_roundtrip(spark, clustered):
    path, df = clustered
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == 8
    got = spark.read.parquet(path)
    assert got.count() == df.count()
    assert sorted(got.columns) == sorted(df.columns)


def test_rowgroups_are_range_disjoint(clustered):
    path, _ = clustered
    stats = sorted(layout.rowgroup_stats(path, "o_orderdate"), key=lambda s: s[2])
    assert len(stats) >= 8
    # consecutive row groups overlap at most at the boundary value
    for (_, _, _, mx_prev), (_, _, mn_next, _) in zip(stats, stats[1:]):
        assert mn_next >= mx_prev or abs((mn_next - mx_prev).total_seconds()) == 0


def test_selective_range_skips_most_rowgroups(spark, clustered):
    path, df = clustered
    lo, hi = df.selectExpr(
        "timestamp'1995-06-01'", "timestamp'1995-08-31'"
    ).first()
    frac = layout.skipped_fraction(path, "o_orderdate", lo, hi)
    # ~3 months of ~4 years clustered into 8+ groups → most groups skip
    assert frac >= 0.5, frac
    # and the skipping is semantics-preserving
    n_direct = df.where(F.col("o_orderdate").between(lo, hi)).count()
    n_clustered = (
        spark.read.parquet(path).where(F.col("o_orderdate").between(lo, hi)).count()
    )
    assert n_direct == n_clustered
