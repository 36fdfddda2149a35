"""Executor-side artifact sinks (round 6).

Three contracts under test:

1. **Tasks write, driver collects manifests only** — export_netcdf_files
   / render_png_files write each artifact inside its applyInPandas task
   (atomic tempfile + os.replace) and return (path, size, sha256) rows;
   the bytes never ride in a Spark cell. A chunked export splits one
   variable across multiple CF-consistent files, so no single task
   ever builds the whole variable's cube (the 2 GB-cell / driver-memory
   ceiling the blob path had).
2. **Hostile names can't escape** — the vendored readers accept
   arbitrary bytes as dataset/variable names, so every sink filename
   component is validated (sinks/naming.safe_component); traversal
   attempts raise instead of writing outside out_dir or producing
   zip-slip entries.
3. **Ragged selections round-trip** — a spatially ragged slice
   (polygon/bbox on a curvilinear grid) exports with NaN coordinates
   for absent cells; the decoder drops NaN-coordinate cells, so
   export∘ingest is the identity for ragged slices too (NaN would
   otherwise poison min/max since Spark sorts NaN largest).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

from netcdf_olap_spark.sinks.naming import safe_component
from netcdf_olap_spark.sinks.netcdf import export_netcdf, export_netcdf_files, nc_filename
from netcdf_olap_spark.sinks.png import png_filename, render_png_files
from netcdf_olap_spark.sources import netcdf as src

NT, NY, NX = 6, 3, 5
KEY = ["ds", "variable", "time", "y", "x"]


def _cube_df(spark, ds="exp", var="tas", seed=5):
    rng = np.random.default_rng(seed)
    data = rng.normal(280.0, 5.0, (NT, NY, NX))
    data[0, 0, 0] = np.nan
    th = (np.arange(NT) * 24).astype(np.int64)
    lat1 = 42.0 + 0.5 * np.arange(NY)
    lon1 = -84.0 + 0.5 * np.arange(NX)
    lon, lat = np.meshgrid(lon1, lat1)
    return src.cube_to_df(spark, ds, var, data, th, lat, lon, fill_value=None)


def _rows(df):
    return [tuple(r) for r in df.orderBy(*KEY).collect()]


# -- 1. executor-side writes ------------------------------------------------


@pytest.mark.parametrize("fmt", ["classic", "hdf5"])
def test_files_export_manifest_and_roundtrip(spark, tmp_path, fmt):
    cube = _cube_df(spark, seed=11)
    out = str(tmp_path / "files")
    man = export_netcdf_files(cube, out, fmt=fmt).collect()
    assert len(man) == 1
    m = man[0]
    # manifest row carries NO blob column
    assert "nc" not in m.asDict()
    assert m.part == "all" and (m.nt, m.ny, m.nx) == (NT, NY, NX)
    # the file the task wrote matches the manifest's size + checksum
    blob = open(m.path, "rb").read()
    assert len(blob) == m.size
    assert hashlib.sha256(blob).hexdigest() == m.sha256
    # and re-ingesting it reproduces the cube exactly
    back = src.ingest_directory(spark, out, ds="exp")
    assert _rows(back) == _rows(cube)


def test_chunked_export_splits_by_time_window(spark, tmp_path):
    cube = _cube_df(spark, seed=13)  # 6 daily steps from 1990-01-01
    out = str(tmp_path / "chunked")
    man = export_netcdf_files(cube, out, fmt="hdf5", chunk="day").collect()
    # one file per day — no task ever held the whole variable
    assert len(man) == NT
    assert sorted(r.part for r in man) == [f"1990-01-0{d}" for d in range(1, NT + 1)]
    assert all(r.nt == 1 for r in man)
    for r in man:
        assert os.path.dirname(r.path) == out and r.part in os.path.basename(r.path)
    # the union of the chunk files is still the identity
    back = src.ingest_directory(spark, out, ds="exp")
    assert _rows(back) == _rows(cube)


def test_files_export_matches_blob_export_bytes(spark, tmp_path):
    """Same builder on both paths: the task-written file is byte-equal
    to the blob the small path would have carried."""
    cube = _cube_df(spark, seed=17)
    out = str(tmp_path / "eq")
    man = export_netcdf_files(cube, out, fmt="classic").collect()
    blob_rows = export_netcdf(cube, fmt="classic").collect()
    assert open(man[0].path, "rb").read() == bytes(blob_rows[0].nc)


def test_png_files_manifest(spark, tmp_path):
    cube = _cube_df(spark, seed=19)
    out = str(tmp_path / "pngs")
    man = render_png_files(cube, out, "1990-01-01", "1990-01-06").collect()
    assert len(man) == 1
    m = man[0]
    assert os.path.basename(m.path) == png_filename("tas", "1990-01-01", "1990-01-06")
    blob = open(m.path, "rb").read()
    assert blob.startswith(b"\x89PNG") and len(blob) == m.size
    assert hashlib.sha256(blob).hexdigest() == m.sha256
    assert (m.width, m.height) == (NX, NY)


def test_no_tmp_litter_after_export(spark, tmp_path):
    out = str(tmp_path / "clean")
    export_netcdf_files(_cube_df(spark, seed=23), out, fmt="hdf5").collect()
    assert all(not f.endswith(".tmp") for f in os.listdir(out))


# -- 2. hostile names -------------------------------------------------------


@pytest.mark.parametrize(
    "bad",
    ["../../x", "a/b", "a\\b", "", "..", "evil\x00name", " pad ", ".hidden"],
)
def test_safe_component_rejects(bad):
    with pytest.raises(ValueError):
        safe_component(bad)


def test_safe_component_accepts_normal_names():
    for ok in ["tas", "LST_LWST_avg_daily", "avg_night_temp", "exp-2020", "t2m"]:
        assert safe_component(ok) == ok


def test_nc_filename_rejects_traversal():
    with pytest.raises(ValueError):
        nc_filename("../../etc", "tas", "classic")
    with pytest.raises(ValueError):
        nc_filename("exp", "../x", "classic")


def test_png_filename_rejects_traversal():
    with pytest.raises(ValueError):
        png_filename("../x", "1990-01-01", "1990-01-02")


def test_files_export_rejects_hostile_variable(spark, tmp_path):
    """A crafted file can carry any bytes as a variable name — the
    write task must fail, not escape out_dir."""
    cube = _cube_df(spark, var="tas", seed=29).withColumnRenamed("variable", "v")
    cube = cube.selectExpr("ds", "'../../pwned' AS variable", "time", "y", "x", "lat", "lon", "value")
    out = str(tmp_path / "hostile")
    with pytest.raises(Exception, match="path separator|not a safe|contains"):
        export_netcdf_files(cube, out, fmt="classic").collect()
    # nothing escaped: the parent temp dir holds only our out_dir
    assert not os.path.exists(str(tmp_path / "pwned"))


# -- 3. ragged selections ---------------------------------------------------


def test_ragged_selection_roundtrip_identity(spark, tmp_path):
    """Drop an irregular subset of cells (polygon-mask shape), export,
    re-ingest: the absent cells stay absent and aggregates stay
    NaN-free (decoder drops NaN-coordinate cells)."""
    from pyspark.sql import functions as F

    cube = _cube_df(spark, seed=31)
    ragged = cube.where(~((F.col("y") == 0) & (F.col("x") >= 3)) & ~((F.col("y") == 2) & (F.col("x") == 0)))
    out = str(tmp_path / "ragged")
    export_netcdf_files(ragged, out, fmt="hdf5").collect()
    back = src.ingest_directory(spark, out, ds="exp")
    assert _rows(back) == _rows(ragged)
    # min/max over coordinates are finite (the NaN-poisoning the
    # decoder-side drop exists to prevent)
    agg = back.agg(
        F.min("lat").alias("a"), F.max("lat").alias("b"),
        F.min("lon").alias("c"), F.max("lon").alias("d"),
    ).collect()[0]
    assert all(np.isfinite(v) for v in agg)


def test_legacy_collect_sinks_guarded(spark, tmp_path):
    """save_netcdf/save_pngs price the driver collect FIRST (Spark-side
    octet_length sum) and raise over the ceiling, pointing at the
    executor-side manifest path; max_bytes=None accepts explicitly."""
    import pytest
    from pyspark.sql import functions as F

    from netcdf_olap_spark.sinks.netcdf import export_netcdf, save_netcdf
    from netcdf_olap_spark.sinks.png import render_png, save_pngs
    from netcdf_olap_spark.session import load_grid

    var = load_grid(spark, register=False).select("variable").first()[0]
    g = load_grid(spark, register=False).where(F.col("variable") == var).limit(400)
    arts = export_netcdf(g)
    with pytest.raises(ValueError, match="render_png_files|export_netcdf_files"):
        save_netcdf(arts, str(tmp_path / "nc"), max_bytes=10)
    # explicit opt-out collects
    paths = save_netcdf(arts, str(tmp_path / "nc2"), max_bytes=None)
    assert paths and all(p.endswith(".nc") for p in paths)

    imgs = render_png(g)
    with pytest.raises(ValueError, match="render_png_files"):
        save_pngs(imgs, str(tmp_path / "png"), "2020-01-01", "2020-01-02", max_bytes=10)
    # success path must release the guard's executor-side pin — a
    # long-lived API process calling save_* repeatedly must not
    # accumulate pinned artifact blocks
    n_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    paths = save_pngs(imgs, str(tmp_path / "png2"), "2020-01-01", "2020-01-02")
    assert paths and all(p.endswith(".png") for p in paths)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == n_before
