"""NetCDF export sink (sinks/netcdf.py): export∘ingest is identity.

The loop under test: raw arrays → (ingest) long cube → (export) .nc
bytes in both formats → (re-ingest through the distributed path) →
identical long cube. Exercises the vendored writers as first-class
sinks, NULL↔_FillValue inversion, the hours-since-1990 re-encode, and
curvilinear 2-D coordinate round-tripping.
"""

from __future__ import annotations

import numpy as np
import pytest

from netcdf_olap_spark.sinks.netcdf import export_netcdf, save_netcdf
from netcdf_olap_spark.sources import netcdf as src

NT, NY, NX = 4, 3, 5


def _cube_df(spark, ds="exp", var="tas", seed=5, curvilinear=False):
    rng = np.random.default_rng(seed)
    data = rng.normal(280.0, 5.0, (NT, NY, NX))
    data[0, 0, 0] = np.nan  # a NULL cell: must become _FillValue and come back NULL
    data[3, 2, 4] = np.nan
    th = (np.arange(NT) * 24).astype(np.int64)
    lat1 = 42.0 + 0.5 * np.arange(NY)
    lon1 = -84.0 + 0.5 * np.arange(NX)
    lon, lat = np.meshgrid(lon1, lat1)
    if curvilinear:
        lat = lat + 0.01 * lon1[None, :]  # lat varies along x → genuinely 2-D
    return src.cube_to_df(spark, ds, var, data, th, lat, lon, fill_value=None), data


KEY = ["ds", "variable", "time", "y", "x"]


def _rows(df):
    return [tuple(r) for r in df.orderBy(*KEY).collect()]


@pytest.mark.parametrize("fmt,gzip", [("classic", None), ("hdf5", None), ("hdf5", 6)])
def test_export_then_ingest_is_identity(spark, tmp_path, fmt, gzip):
    cube, _data = _cube_df(spark, seed=7)
    artifacts = export_netcdf(cube, fmt=fmt, gzip=gzip)
    rows = artifacts.collect()
    assert len(rows) == 1
    a = rows[0]
    assert (a.nt, a.ny, a.nx) == (NT, NY, NX)
    assert a.n_valid == NT * NY * NX - 2

    paths = save_netcdf(artifacts, str(tmp_path / "out"))
    assert len(paths) == 1 and paths[0].endswith(".nc")

    back = src.ingest_directory(spark, str(tmp_path / "out"), ds="exp")
    assert _rows(back) == _rows(cube)


def test_export_curvilinear_coords_roundtrip(spark, tmp_path):
    cube, _ = _cube_df(spark, seed=9, curvilinear=True)
    save_netcdf(export_netcdf(cube, fmt="hdf5"), str(tmp_path / "o"))
    back = src.ingest_directory(spark, str(tmp_path / "o"), ds="exp")
    assert _rows(back) == _rows(cube)


def test_export_one_artifact_per_variable(spark, tmp_path):
    a, _ = _cube_df(spark, var="tas", seed=1)
    b, _ = _cube_df(spark, var="pr", seed=2)
    cube = a.union(b)
    artifacts = export_netcdf(cube, fmt="classic")
    got = {(r.ds, r.variable): r for r in artifacts.collect()}
    assert set(got) == {("exp", "tas"), ("exp", "pr")}
    paths = save_netcdf(artifacts, str(tmp_path / "multi"))
    assert len(paths) == 2
    back = src.ingest_directory(spark, str(tmp_path / "multi"), ds="exp")
    assert _rows(back) == _rows(cube)


def test_export_rejects_sub_hour_times(spark):
    cube, _ = _cube_df(spark, seed=3)
    from pyspark.sql import functions as F

    shifted = cube.withColumn("time", F.col("time") + F.expr("INTERVAL 30 MINUTES"))
    with pytest.raises(Exception, match="hour-aligned"):
        export_netcdf(shifted, fmt="classic").collect()
