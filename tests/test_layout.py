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


@pytest.fixture(scope="module")
def grid_2d(spark, tmp_path_factory):
    """256x256 synthetic grid written two ways: lexicographic
    range-clustering on (y, x) vs Z-order (Morton) clustering."""
    base = tmp_path_factory.mktemp("zorder")
    df = (
        spark.range(256 * 256)
        .selectExpr("CAST(id DIV 256 AS INT) AS y", "CAST(id % 256 AS INT) AS x",
                    "CAST(id AS DOUBLE) * 0.5 AS value")
    )
    lex, zed = str(base / "lex"), str(base / "zed")
    layout.write_clustered(df, lex, cluster_by=["y", "x"], n_files=64)
    layout.write_zordered(df, zed, "y", "x", n_files=64)
    return lex, zed, df


def test_zorder_key_is_morton(spark):
    rows = (
        spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "a int, b int")
        .select("a", "b", layout.zorder_col("a", "b").alias("z"))
        .collect()
    )
    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i + 1) | ((b >> i) & 1) << (2 * i)
        return z
    for r in rows:
        assert r.z == morton(r.a, r.b), (r.a, r.b)


def test_zorder_roundtrip_and_bbox_equivalence(spark, grid_2d):
    lex, zed, df = grid_2d
    got = spark.read.parquet(zed)
    assert got.count() == df.count()
    pred = (F.col("y").between(100, 115)) & (F.col("x").between(40, 55))
    assert got.where(pred).count() == df.where(pred).count() == 16 * 16


def test_zorder_prunes_both_dimensions(spark, grid_2d):
    """A 2-D bbox predicate must touch markedly fewer row groups under
    Z-order than under lexicographic (y, x) clustering, averaged over
    a sweep of 16x16 bboxes: lexicographic files each span the full x
    range (x never prunes), Morton tiles are ~square so both bounds
    prune."""
    lex, zed, _ = grid_2d
    boxes = [(y0, y0 + 15, x0, x0 + 15) for y0 in (8, 72, 136, 200) for x0 in (24, 88, 152, 216)]
    lex_f = [layout.touched_fraction_2d(lex, "y", (y0, y1), "x", (x0, x1))
             for y0, y1, x0, x1 in boxes]
    zed_f = [layout.touched_fraction_2d(zed, "y", (y0, y1), "x", (x0, x1))
             for y0, y1, x0, x1 in boxes]
    mean_lex, mean_zed = sum(lex_f) / len(lex_f), sum(zed_f) / len(zed_f)
    assert mean_zed < mean_lex * 0.7, (mean_lex, mean_zed)
    assert mean_zed <= 0.15, mean_zed
