"""HTTP API layer — the reference's Flask surface, engine-direct.

Same routes and payloads as the reference server (main.py):

- ``GET /getBoundary`` → dataset boundary bbox (main.py:93-96; the
  reference hardcodes the Great Lakes bbox — we compute it from the
  coords table, once, at app startup).
- ``POST /fetchResult`` with JSON ``{geoJson, selectDate, variables}``
  (main.py:22-24 / map.jsx:117-121) → ``application/zip`` of one PNG
  per variable named ``gddp<var><start>-<end>.png`` (main.py:113-127).

Differences by design (SURVEY.md §3.4): one long-lived SparkSession
instead of a spark-submit subprocess per query (main.py:106-110), the
polygon travels in-memory instead of through a geojson.json file on
disk, and errors return proper JSON + status codes instead of the
reference's ``'{message: "Server Error"}'`` string (main.py:131-132).
"""

from __future__ import annotations

import io
import json
import os
import zipfile

import tempfile

from netcdf_olap_spark.operators.spatial import parse_geojson_polygon
from netcdf_olap_spark.plans import CubeQuery
from netcdf_olap_spark.session import get_spark, load_coords, load_grid
from netcdf_olap_spark.sinks import render_png_files


def parse_query_payload(payload: dict) -> CubeQuery:
    """JSON request → CubeQuery descriptor (the parse_json stage of
    main.py:21-89, minus the disk round-trip)."""
    date = payload.get("selectDate")
    if isinstance(date, str):
        parts = [p.strip() for p in date.split(",")]
    else:
        parts = list(date or [])
    if len(parts) != 2 or not all(parts):
        raise ValueError("selectDate must be 'start,end' or [start, end]")
    variables = payload.get("variables") or []
    if isinstance(variables, str):
        variables = [v for v in variables.split(",") if v]
    if not variables:
        raise ValueError("variables must be non-empty")
    polygon = None
    geo = payload.get("geoJson")
    if geo:
        polygon = parse_geojson_polygon(geo if isinstance(geo, str) else json.dumps(geo))
    return CubeQuery(start_date=parts[0], end_date=parts[1], variables=variables, polygon=polygon)


def _zip_manifest(manifest_rows) -> bytes:
    """Pack executor-written artifact files (manifest rows with a
    ``path`` column) into one zip. Entry names are the sink-validated
    basenames — artifact tasks reject traversal-capable dataset/
    variable names before any file exists, so no zip-slip entries can
    reach a client."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for row in manifest_rows:
            z.write(row.path, arcname=os.path.basename(row.path))
    return buf.getvalue()


def result_zip(spark, q: CubeQuery) -> bytes:
    """Run the query and pack one PNG per variable into a zip
    (main.py:113-126). Images are written by the rendering TASKS
    (Gddp.scala:235-236's contract — the task writes the artifact, not
    the driver); the driver only collects (path, size, checksum)
    manifest rows and zips the finished files."""
    with tempfile.TemporaryDirectory(prefix="nolap_api_png_") as td:
        manifest = render_png_files(
            q.apply(load_grid(spark, register=False)), td, q.start_date, q.end_date
        )
        return _zip_manifest(manifest.collect())


def result_nc_zip(spark, q: CubeQuery, fmt: str = "hdf5") -> bytes:
    """The .nc-export counterpart of ``result_zip``: the same sliced
    cube leaves as one NetCDF file per variable (classic CDF-1 or
    NetCDF-4/HDF5 via sinks/netcdf.py) — the engine generalization of
    the reference's raw-values ``result.txt`` alternative
    (geopy.py:101-102; main.py:129 comment). Files are written
    executor-side (export_netcdf_files); only manifest rows reach the
    driver."""
    from netcdf_olap_spark.sinks.netcdf import export_netcdf_files

    with tempfile.TemporaryDirectory(prefix="nolap_api_nc_") as td:
        manifest = export_netcdf_files(
            q.apply(load_grid(spark, register=False)),
            td,
            fmt=fmt,
            gzip=6 if fmt == "hdf5" else None,
        )
        return _zip_manifest(manifest.collect())


def create_app(spark=None):
    """Flask app factory. ``spark`` injectable for tests."""
    from flask import Flask, jsonify, request, send_file

    app = Flask("netcdf-olap-spark")
    spark = spark or get_spark("api")

    client = os.path.join(os.path.dirname(os.path.abspath(__file__)), "webclient", "index.html")

    @app.get("/")
    def index():
        # the reference ships a React map UI (react-demo/src/components/
        # map.jsx); this serves the dependency-free static counterpart
        return send_file(client, mimetype="text/html")

    coords = load_coords(spark, register=False)
    row = coords.selectExpr(
        "min(lat) AS lat_min", "max(lat) AS lat_max", "min(lon) AS lon_min", "max(lon) AS lon_max"
    ).collect()[0]
    boundary = {
        "lat_min": row.lat_min,
        "lat_max": row.lat_max,
        "lon_min": row.lon_min,
        "lon_max": row.lon_max,
    }

    @app.get("/getBoundary")
    def get_boundary():
        return jsonify(boundary)

    # dataset registry for the map UI — the engine-computed form of the
    # reference's hardcoded Dataset entries (map.jsx:15-23: id, boundary,
    # description, headerAttributes), one rectangle + tooltip each
    from netcdf_olap_spark.session import datasets_catalog

    cat_rows = [
        {
            "ds": r["ds"],
            "variables": list(r["variables"]),
            "lat_min": r["lat_min"],
            "lat_max": r["lat_max"],
            "lon_min": r["lon_min"],
            "lon_max": r["lon_max"],
            "n_cells": r["n_cells"],
            "time_min": r["time_min"].isoformat(),
            "time_max": r["time_max"].isoformat(),
        }
        for r in datasets_catalog(spark).collect()
    ]

    @app.get("/datasets")
    def get_datasets():
        return jsonify(cat_rows)

    @app.post("/fetchResult")
    def fetch_result():
        payload = request.get_json(force=True) or {}
        try:
            q = parse_query_payload(payload)
            fmt = payload.get("format", "png")
            if fmt not in ("png", "nc", "nc4"):
                raise ValueError(f"format must be png, nc, or nc4, got {fmt!r}")
        except (ValueError, KeyError, TypeError) as ex:
            return jsonify({"message": f"bad request: {ex}"}), 400
        if fmt == "png":
            data = result_zip(spark, q)
        else:  # the sliced cube itself, as the reference's own input format
            data = result_nc_zip(spark, q, fmt="classic" if fmt == "nc" else "hdf5")
        return send_file(
            io.BytesIO(data),
            mimetype="application/zip",
            as_attachment=True,
            download_name="result.zip",
        )

    return app


if __name__ == "__main__":
    create_app().run(host="127.0.0.1", port=5000)
