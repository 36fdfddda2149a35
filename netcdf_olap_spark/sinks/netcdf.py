"""NetCDF export sink — the inverse of ``sources/netcdf.ingest_directory``.

The reference only ever writes PNG/zip/text artifacts
(Gddp.scala:235-236; main.py:113-127; geopy.py:99-102). This sink is
the S8/S10-family generalization the relational rebuild makes natural:
any sliced long cube (the output shape of every grid query) can leave
the engine as the reference's own *input* format — classic CDF-1 via
the vendored ``sources/netcdf3.py`` writer or NetCDF-4/HDF5 via
``sources/hdf5.py`` — closing the read → query → write loop.

Shape rules, mirroring ingest exactly (so export∘ingest is identity,
tested in tests/test_netcdf_sink.py):

- one .nc artifact per (ds, variable[, time-chunk]) group, built
  inside ``applyInPandas`` — the dense (time, y, x) cube exists only
  in the sink's Arrow batches (SURVEY §1.3 "tile only at the sink");
- SQL NULL → the ``_FillValue`` sentinel (the reverse of ingest's
  fill→NULL, Gddp.scala:188-191);
- time re-encoded as hours since 1990-01-01T00:00
  (Gddp.scala:125-129), the cube's native clock;
- lat/lon written as 2-D coordinate arrays with the ``long_name``
  attributes ingest resolves by (geopy.py:51-55) — curvilinear grids
  round-trip unchanged, rectilinear ones come back meshed (same as
  reading a real file). Spatially ragged selections (polygon/bbox on
  a curvilinear grid) leave NaN in the coordinate arrays for cells
  outside the selection; the decoder drops NaN-coordinate cells at
  read time, so export∘ingest is the identity for ragged slices too.

Scale: the PRIMARY path is :func:`export_netcdf_files` — each task
writes its artifact to shared storage itself (exactly the reference's
contract: Gddp.scala:235-236 writes the PNG from the task, not the
driver) and only (path, size, checksum) manifest rows reach the
driver, so a full-variable export at 100 TB never materializes a
multi-GB blob in one Spark cell or on the driver. ``chunk`` splits
large exports into one CF-consistent file per time window. The
blob-carrying :func:`export_netcdf` remains for small in-memory uses
(HTTP zip of a masked slice) and tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from netcdf_olap_spark.sinks import limits as _limits
from netcdf_olap_spark.sinks.naming import safe_component

NC_EXPORT_SCHEMA = StructType(
    [
        StructField("ds", StringType()),
        StructField("variable", StringType()),
        StructField("fmt", StringType()),
        StructField("nt", IntegerType()),
        StructField("ny", IntegerType()),
        StructField("nx", IntegerType()),
        StructField("n_valid", IntegerType()),
        StructField("nc", BinaryType()),
    ]
)

NC_MANIFEST_SCHEMA = StructType(
    [
        StructField("ds", StringType()),
        StructField("variable", StringType()),
        StructField("fmt", StringType()),
        StructField("part", StringType()),
        StructField("nt", IntegerType()),
        StructField("ny", IntegerType()),
        StructField("nx", IntegerType()),
        StructField("n_valid", IntegerType()),
        StructField("path", StringType()),
        StructField("size", LongType()),
        StructField("sha256", StringType()),
    ]
)


def _build_nc(pdf, fmt_: str, fill_: float, gzip_):
    """One pandas group (long cube rows for a single ds+variable[+time
    chunk]) → (.nc bytes, metadata dict). Runs inside the Arrow task;
    imports stay local so the closure pickles cleanly and executors
    resolve the vendored writers via ensure_package_on_workers."""
    import numpy as np
    import pandas as pd

    from netcdf_olap_spark.sources.hdf5 import write_hdf5
    from netcdf_olap_spark.sources.netcdf3 import write_netcdf3

    ds = str(pdf["ds"].iloc[0])
    variable = str(pdf["variable"].iloc[0])

    t_vals = pdf["time"].to_numpy()
    times = np.sort(pd.unique(pdf["time"])).astype(t_vals.dtype)
    epoch = np.datetime64("1990-01-01T00:00:00", "us")
    micros = (times.astype("datetime64[us]") - epoch) // np.timedelta64(1, "us")
    hours, rem = np.divmod(micros.astype(np.int64), 3_600_000_000)
    # exact integer check — a relative-tolerance comparison would
    # silently accept sub-hour offsets at 2020s-era epochs
    if rem.any():
        raise ValueError("time values are not hour-aligned; cannot encode hours-since-1990")

    ys = np.sort(pdf["y"].unique())
    xs = np.sort(pdf["x"].unique())
    nt, ny, nx = len(times), len(ys), len(xs)

    ti = np.searchsorted(times, t_vals)
    yi = np.searchsorted(ys, pdf["y"].to_numpy())
    xi = np.searchsorted(xs, pdf["x"].to_numpy())

    data = np.full((nt, ny, nx), fill_, dtype=np.float64)
    vals = pdf["value"].to_numpy(dtype=np.float64)
    valid = ~np.isnan(vals)
    data[ti[valid], yi[valid], xi[valid]] = vals[valid]

    lat2d = np.full((ny, nx), np.nan)
    lon2d = np.full((ny, nx), np.nan)
    lat2d[yi, xi] = pdf["lat"].to_numpy(dtype=np.float64)
    lon2d[yi, xi] = pdf["lon"].to_numpy(dtype=np.float64)

    attrs = {"_FillValue": fill_, "long_name": variable}
    # integer y/x index variables preserve ORIGINAL grid indices:
    # a windowed slice (y in 100..120) must re-ingest with the same
    # y values, not a renumbered 0-based grid (the decoder maps
    # them back; float 1-D x/y projection coords are unaffected)
    y_var = ys.astype("<i4")
    x_var = xs.astype("<i4")
    if fmt_ == "classic":
        content = write_netcdf3(
            dimensions={"time": None, "y": ny, "x": nx},
            variables={
                "time": (("time",), hours.astype(np.int32), {"units": "hours since 1990-01-01"}),
                "y": (("y",), y_var, {"long_name": "grid y index"}),
                "x": (("x",), x_var, {"long_name": "grid x index"}),
                "lat": (("y", "x"), lat2d, {"long_name": "latitude coordinate"}),
                "lon": (("y", "x"), lon2d, {"long_name": "longitude coordinate"}),
                variable: (("time", "y", "x"), data, attrs),
            },
            global_attrs={"source": "netcdf_olap_spark export"},
        )
    else:
        kw = {}
        if gzip_ is not None:
            kw = {"chunks": {variable: (min(nt, 16), ny, nx)}, "gzip": gzip_, "shuffle": True}
        content = write_hdf5(
            {
                "time": (hours.astype("<i4"), {"units": "hours since 1990-01-01", "long_name": "time"}),
                "y": (y_var, {"long_name": "grid y index"}),
                "x": (x_var, {"long_name": "grid x index"}),
                "lat": (lat2d, {"long_name": "latitude coordinate"}),
                "lon": (lon2d, {"long_name": "longitude coordinate"}),
                variable: (data, attrs),
            },
            global_attrs={"source": "netcdf_olap_spark export"},
            # structural coordinate attachment (DIMENSION_LIST), so
            # external netCDF-4 tools resolve time/y/x as this
            # variable's dimension scales regardless of name heuristics
            dim_scales={variable: ("time", "y", "x")},
            **kw,
        )

    meta = {
        "ds": ds,
        "variable": variable,
        "fmt": fmt_,
        "nt": nt,
        "ny": ny,
        "nx": nx,
        "n_valid": int(valid.sum()),
    }
    return content, meta


def export_netcdf(
    df: DataFrame,
    fmt: str = "classic",
    fill_value: float = -9999.0,
    gzip: int | None = None,
) -> DataFrame:
    """Long cube rows → one .nc artifact ROW per (ds, variable), file
    bytes carried in the ``nc`` column.

    This is the SMALL-artifact path (HTTP zip of a masked slice,
    tests): one row per variable, bounded by what fits in a Spark cell
    and driver memory. For full-variable exports use
    :func:`export_netcdf_files`, which writes inside the task and
    returns only manifest rows.

    ``df`` must carry the grid-table columns
    (ds, variable, time, y, x, lat, lon, value). ``fmt``: ``classic``
    (CDF-1, the reference's GDDP input flavor) or ``hdf5`` (NetCDF-4
    container; ``gzip`` adds chunked+deflate storage). Returns the
    artifact DataFrame — pure, no side effects; pair with
    ``save_netcdf`` to materialize files.
    """
    if fmt not in ("classic", "hdf5"):
        raise ValueError(f"fmt must be 'classic' or 'hdf5', got {fmt!r}")
    # the worker rebuilds cubes with the vendored writers — ship the
    # package so executors can import them wherever the driver started
    from netcdf_olap_spark.sources.netcdf import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    fmt_, fill_, gzip_ = fmt, float(fill_value), gzip

    def _write(pdf):
        import pandas as pd

        content, meta = _build_nc(pdf, fmt_, fill_, gzip_)
        return pd.DataFrame([{**meta, "nc": content}])

    return df.groupBy("ds", "variable").applyInPandas(_write, NC_EXPORT_SCHEMA)


def export_netcdf_files(
    df: DataFrame,
    out_dir: str,
    fmt: str = "classic",
    fill_value: float = -9999.0,
    gzip: int | None = None,
    chunk: str | None = None,
) -> DataFrame:
    """Scale path: every artifact is written to ``out_dir`` INSIDE its
    ``applyInPandas`` task — atomically, via ``tempfile`` +
    ``os.replace`` — and only (path, size, sha256) manifest rows reach
    the driver. This is the reference's own sink contract
    (Gddp.scala:235-236 writes the PNG from the task, not the driver)
    and it removes both the 2 GB single-cell ceiling and driver-memory
    pressure from large exports.

    ``out_dir`` must be a filesystem path visible to every executor
    AND the driver (local mode: trivially true; cluster: NFS/fuse
    mount or a shared volume — for object stores, export locally then
    upload, or extend with an fsspec writer).

    ``chunk``: optional time-window split for large exports — a Spark
    ``date_trunc`` unit (``'year'``, ``'month'``, ``'week'``,
    ``'day'``); each window becomes its own CF-consistent .nc file
    named ``{ds}_{variable}_{part}_{fmt}.nc``, so no single task ever
    builds the whole variable's cube in memory.

    Returns the manifest DataFrame (NC_MANIFEST_SCHEMA) — an action on
    it triggers the writes. Hostile dataset/variable names (path
    separators, '..') fail the task rather than escaping ``out_dir``.
    """
    if fmt not in ("classic", "hdf5"):
        raise ValueError(f"fmt must be 'classic' or 'hdf5', got {fmt!r}")
    if chunk is not None and chunk not in ("year", "quarter", "month", "week", "day"):
        raise ValueError(f"chunk must be a date_trunc unit, got {chunk!r}")
    from netcdf_olap_spark.sources.netcdf import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    fmt_, fill_, gzip_, out_ = fmt, float(fill_value), gzip, str(out_dir)

    if chunk is None:
        part_col = F.lit("all")
    else:
        part_col = F.date_format(F.date_trunc(chunk, F.col("time")), "yyyy-MM-dd")
    dfp = df.withColumn("__part", part_col)

    def _write_file(pdf):
        import hashlib
        import tempfile

        import pandas as pd

        from netcdf_olap_spark.sinks.naming import safe_component

        part = str(pdf["__part"].iloc[0])
        content, meta = _build_nc(pdf.drop(columns="__part"), fmt_, fill_, gzip_)
        safe_component(meta["ds"], "ds")
        safe_component(meta["variable"], "variable")
        safe_component(part, "part")
        name = f"{meta['ds']}_{meta['variable']}_{part}_{fmt_}.nc" if part != "all" else (
            f"{meta['ds']}_{meta['variable']}_{fmt_}.nc"
        )
        os.makedirs(out_, exist_ok=True)
        final = os.path.join(out_, name)
        fd, tmp = tempfile.mkstemp(dir=out_, suffix=".nc.tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(content)
            os.replace(tmp, final)  # atomic: readers never see a partial file
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        return pd.DataFrame(
            [
                {
                    **meta,
                    "part": part,
                    "path": final,
                    "size": len(content),
                    "sha256": hashlib.sha256(content).hexdigest(),
                }
            ]
        )

    return dfp.groupBy("ds", "variable", "__part").applyInPandas(_write_file, NC_MANIFEST_SCHEMA)


def nc_filename(ds: str, variable: str, fmt: str) -> str:
    """Filename contract mirroring the PNG sink's
    (``gddp<variable>...``, Gddp.scala:236): ds + variable + format
    suffix, always ``.nc`` (both flavors are .nc in the wild).
    Components are validated — the vendored readers accept arbitrary
    bytes as names, so traversal attempts fail here, before any file
    or zip entry is created."""
    safe_component(ds, "ds")
    safe_component(variable, "variable")
    safe_component(fmt, "fmt")
    return f"{ds}_{variable}_{fmt}.nc"


def save_netcdf(
    artifacts: DataFrame, out_dir: str, max_bytes: int | None = _limits.MAX_DRIVER_ARTIFACT_BYTES
) -> list[str]:
    """Materialize blob-carrying export artifacts (from
    :func:`export_netcdf`) to files — the small-slice path. Written
    atomically (tempfile + ``os.replace``) so a concurrent reader of
    ``out_dir`` never ingests a partial file. Guarded: raises before
    collecting if the blob total exceeds ``max_bytes`` (default 256
    MiB; ``None`` accepts the driver collect explicitly) — for large
    exports use :func:`export_netcdf_files`, which never moves bytes
    through the driver."""
    import tempfile

    artifacts = _limits.guard_driver_collect(
        artifacts, "nc", "sinks.netcdf.export_netcdf_files", max_bytes
    )
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    try:
        rows = artifacts.collect()
    finally:
        # release the guard's executor-side pin (no-op when unpinned)
        artifacts.unpersist()
    for row in rows:
        p = os.path.join(out_dir, nc_filename(row.ds, row.variable, row.fmt))
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".nc.tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(bytes(row.nc))
        os.replace(tmp, p)
        paths.append(p)
    return paths
