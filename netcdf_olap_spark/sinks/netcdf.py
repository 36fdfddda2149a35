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

- one .nc artifact per (ds, variable) group, built inside
  ``applyInPandas`` — the dense (time, y, x) cube exists only in the
  sink's Arrow batches (SURVEY §1.3 "tile only at the sink");
- SQL NULL → the ``_FillValue`` sentinel (the reverse of ingest's
  fill→NULL, Gddp.scala:188-191);
- time re-encoded as hours since 1990-01-01T00:00
  (Gddp.scala:125-129), the cube's native clock;
- lat/lon written as 2-D coordinate arrays with the ``long_name``
  attributes ingest resolves by (geopy.py:51-55) — curvilinear grids
  round-trip unchanged, rectilinear ones come back meshed (same as
  reading a real file).

Scale: groups are per-variable slices (the query result being
exported, not the raw corpus); artifact rows carry the file bytes so
the driver only ever collects finished files, like the PNG sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

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


def export_netcdf(
    df: DataFrame,
    fmt: str = "classic",
    fill_value: float = -9999.0,
    gzip: int | None = None,
) -> DataFrame:
    """Long cube rows → one .nc file per (ds, variable).

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
                **kw,
            )

        return pd.DataFrame(
            [
                {
                    "ds": ds,
                    "variable": variable,
                    "fmt": fmt_,
                    "nt": nt,
                    "ny": ny,
                    "nx": nx,
                    "n_valid": int(valid.sum()),
                    "nc": content,
                }
            ]
        )

    return df.groupBy("ds", "variable").applyInPandas(_write, NC_EXPORT_SCHEMA)


def nc_filename(ds: str, variable: str, fmt: str) -> str:
    """Filename contract mirroring the PNG sink's
    (``gddp<variable>...``, Gddp.scala:236): ds + variable + format
    suffix, always ``.nc`` (both flavors are .nc in the wild)."""
    return f"{ds}_{variable}_{fmt}.nc"


def save_netcdf(artifacts: DataFrame, out_dir: str) -> list[str]:
    """Materialize export artifacts to files. Artifact rows are tiny
    (one per variable) — collecting them is the sink action, the cube
    data itself never reaches the driver as rows."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for row in artifacts.collect():
        p = os.path.join(out_dir, nc_filename(row.ds, row.variable, row.fmt))
        with open(p, "wb") as f:
            f.write(bytes(row.nc))
        paths.append(p)
    return paths
