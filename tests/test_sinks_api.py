"""PNG sink + HTTP API tests (golden-artifact style, FIXTURES.md §5:
dimensions + masked-cell counts, not byte equality)."""

from __future__ import annotations

import io
import json
import struct
import zipfile
import zlib

import pytest

from netcdf_olap_spark.plans import CubeQuery
from netcdf_olap_spark.queries.grid import POLYGON
from netcdf_olap_spark.session import load_grid
from netcdf_olap_spark.sinks import png_filename, render_png


def _png_size(data: bytes) -> tuple[int, int]:
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def _png_alpha_zero_count(data: bytes) -> int:
    """Decode our own RGBA PNG (filter 0 rows) and count transparent
    pixels."""
    w, h = _png_size(data)
    idat = b""
    off = 8
    while off < len(data):
        (ln,) = struct.unpack(">I", data[off : off + 4])
        tag = data[off + 4 : off + 8]
        if tag == b"IDAT":
            idat += data[off + 8 : off + 8 + ln]
        off += 12 + ln
    raw = zlib.decompress(idat)
    n_zero = 0
    stride = w * 4 + 1
    for r in range(h):
        row = raw[r * stride : (r + 1) * stride]
        assert row[0] == 0  # filter byte
        n_zero += sum(1 for i in range(1, len(row), 4) if row[i + 3] == 0)
    return n_zero


@pytest.fixture(scope="module")
def query():
    return CubeQuery(
        start_date="1990-01-05",
        end_date="1990-01-20",
        variables=["LST_LWST_avg_daily", "avg_night_temp"],
        polygon=POLYGON,
    )


def test_render_png_dimensions_and_mask(spark, query):
    rendered = {r.variable: r for r in render_png(query.apply(load_grid(spark, register=False))).collect()}
    assert set(rendered) == set(query.variables)
    for var, row in rendered.items():
        w, h = _png_size(bytes(row.png))
        assert (w, h) == (row.width, row.height)
        assert 0 < row.n_valid <= row.n_cells
        # polygon-masked corners → some transparent pixels, not all
        n_transparent = _png_alpha_zero_count(bytes(row.png))
        assert 0 < n_transparent < w * h


def test_render_to_files(spark, query, tmp_path):
    paths = query.render(load_grid(spark, register=False), str(tmp_path))
    assert sorted(p.split("/")[-1] for p in paths) == sorted(
        png_filename(v, query.start_date, query.end_date) for v in query.variables
    )


def test_api_fetch_result_roundtrip(spark):
    """Drive the real HTTP surface: POST the reference payload shape,
    get a zip of PNGs back."""
    from netcdf_olap_spark.api import create_app

    app = create_app(spark)
    client = app.test_client()

    r = client.get("/getBoundary")
    assert r.status_code == 200
    b = r.get_json()
    assert b["lat_min"] < b["lat_max"] and b["lon_min"] < b["lon_max"]

    payload = {
        "selectDate": "1990-01-05,1990-01-12",
        "variables": ["LST_LWST_avg_daily"],
        "geoJson": {
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [[list(p) for p in POLYGON]]},
        },
    }
    r = client.post("/fetchResult", data=json.dumps(payload), content_type="application/json")
    assert r.status_code == 200
    assert r.mimetype == "application/zip"
    with zipfile.ZipFile(io.BytesIO(r.data)) as z:
        names = z.namelist()
        assert names == ["gddpLST_LWST_avg_daily1990-01-05-1990-01-12.png"]
        w, h = _png_size(z.read(names[0]))
        assert w > 0 and h > 0


def test_api_serves_map_client(spark):
    """The static map client (webclient/index.html — the reference's
    react-demo counterpart) is served at /."""
    from netcdf_olap_spark.api import create_app

    client = create_app(spark).test_client()
    r = client.get("/")
    assert r.status_code == 200
    html = r.data.decode()
    assert "/fetchResult" in html and "/getBoundary" in html
    assert "DecompressionStream" in html  # client-side unzip present


def test_api_bad_request(spark):
    from netcdf_olap_spark.api import create_app

    app = create_app(spark)
    client = app.test_client()
    r = client.post("/fetchResult", data=json.dumps({"selectDate": ""}), content_type="application/json")
    assert r.status_code == 400
    assert "bad request" in r.get_json()["message"]


def test_render_global_vs_slice_breaks(spark, query):
    """O9 both modes: global breaks give all variables one color
    scale; per-slice breaks differ per variable — so the PNG bytes of
    at least one variable differ between modes, while geometry and
    valid-cell counts are identical."""
    sliced = query.apply(load_grid(spark, register=False))
    per_slice = {r["variable"]: r for r in render_png(sliced).collect()}
    global_ = {r["variable"]: r for r in render_png(sliced, global_breaks=True).collect()}
    assert set(per_slice) == set(global_)
    for v in per_slice:
        assert (per_slice[v]["width"], per_slice[v]["height"]) == (
            global_[v]["width"],
            global_[v]["height"],
        )
        assert per_slice[v]["n_valid"] == global_[v]["n_valid"]
    assert any(bytes(per_slice[v]["png"]) != bytes(global_[v]["png"]) for v in per_slice)


def test_datasets_catalog(spark):
    from netcdf_olap_spark.session import datasets_catalog

    cat = datasets_catalog(spark).collect()
    assert len(cat) == 1
    row = cat[0]
    assert row["ds"] == "five_lakes"
    assert row["n_cells"] == 32 * 32
    assert row["variables"] == sorted(
        ["LST_LWST_avg_daily", "LST_LWST_avg_day", "avg_night_temp"]
    )
    assert row["lat_min"] < 42.1 < row["lat_max"]
    assert row["time_min"].isoformat().startswith("1990-01-01")


def test_api_fetch_result_as_netcdf(spark):
    """format=nc4 returns the sliced cube AS NetCDF: the zip holds one
    .nc per variable whose bytes decode with the vendored reader to
    the same polygon-masked slice the PNG path renders."""
    from netcdf_olap_spark.api import create_app
    from netcdf_olap_spark.sources.hdf5 import is_hdf5, read_hdf5

    client = create_app(spark).test_client()
    payload = {
        "selectDate": "1990-01-05,1990-01-12",
        "variables": ["LST_LWST_avg_daily"],
        "geoJson": {
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [[list(p) for p in POLYGON]]},
        },
        "format": "nc4",
    }
    r = client.post("/fetchResult", data=json.dumps(payload), content_type="application/json")
    assert r.status_code == 200 and r.mimetype == "application/zip"
    with zipfile.ZipFile(io.BytesIO(r.data)) as z:
        names = z.namelist()
        assert len(names) == 1 and names[0].endswith(".nc")
        content = z.read(names[0])
    assert is_hdf5(content)
    f = read_hdf5(content)
    v = f.variables["LST_LWST_avg_daily"]
    assert len(v.shape) == 3 and v.shape[0] == 8  # 8 days in range
    # masked-out cells persist as the _FillValue sentinel on disk (the
    # raw reader is faithful; fill→NULL happens at the decoder layer)
    assert v.attributes["_FillValue"] == -9999.0
    assert (v.data == -9999.0).any() and (v.data != -9999.0).any()
    # classic flavor too, plus unknown-format rejection
    payload["format"] = "nc"
    r = client.post("/fetchResult", data=json.dumps(payload), content_type="application/json")
    assert r.status_code == 200
    with zipfile.ZipFile(io.BytesIO(r.data)) as z:
        assert z.read(z.namelist()[0])[:3] == b"CDF"
    payload["format"] = "tiff"
    r = client.post("/fetchResult", data=json.dumps(payload), content_type="application/json")
    assert r.status_code == 400


def test_api_datasets_catalog_route(spark):
    """/datasets — the map UI's dataset registry (one Leaflet rectangle
    + tooltip per entry, reference map.jsx:174-178): boundary,
    variable dictionary, temporal extent, JSON-serializable."""
    from netcdf_olap_spark.api import create_app

    client = create_app(spark).test_client()
    r = client.get("/datasets")
    assert r.status_code == 200
    cat = r.get_json()
    assert len(cat) == 1
    d = cat[0]
    assert d["ds"] == "five_lakes"
    assert d["variables"] == sorted(d["variables"]) and len(d["variables"]) == 3
    assert d["lat_min"] < d["lat_max"] and d["lon_min"] < d["lon_max"]
    assert d["time_min"].startswith("1990-01-01") and d["time_max"] > d["time_min"]
    assert d["n_cells"] == 32 * 32


def test_api_leaflet_client_payload_shape(spark):
    """Payload-shape coverage for the Leaflet client (round-5 ask #8):
    the served page is the tiled-map client (tile layer + rectangle
    draw + /datasets registry + canvas fallback), and the EXACT
    payload it builds — closed 5-point bbox ring as a geoJson STRING,
    comma-joined variables, format selector — round-trips through
    /fetchResult for every format."""
    from netcdf_olap_spark.api import create_app

    client = create_app(spark).test_client()
    html = client.get("/").data.decode()
    # Leaflet-grade surface: tile basemap, rectangle draw, dataset
    # tooltips, offline fallback
    assert "leaflet" in html
    assert "tile.openstreetmap.org/{z}/{x}/{y}.png" in html
    assert "L.rectangle" in html and "bindTooltip" in html
    assert "/datasets" in html and "/getBoundary" in html and "/fetchResult" in html
    assert "canvas" in html  # air-gapped fallback retained
    for key in ("selectDate", "variables", "geoJson", "format"):
        assert key in html

    b = client.get("/getBoundary").get_json()
    # the client's bboxGeoJson(): closed ring, lon/lat order, STRING field
    lon0, lon1 = b["lon_min"], (b["lon_min"] + b["lon_max"]) / 2
    lat0, lat1 = b["lat_min"], (b["lat_min"] + b["lat_max"]) / 2
    ring = [[lon0, lat0], [lon1, lat0], [lon1, lat1], [lon0, lat1], [lon0, lat0]]
    for fmt, check in (("png", ".png"), ("nc", ".nc"), ("nc4", ".nc")):
        payload = {
            "selectDate": "1990-01-05,1990-01-12",
            "variables": "LST_LWST_avg_daily,avg_night_temp",
            "geoJson": json.dumps(
                {"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [ring]}}
            ),
            "format": fmt,
        }
        r = client.post("/fetchResult", data=json.dumps(payload), content_type="application/json")
        assert r.status_code == 200, (fmt, r.data[:200])
        with zipfile.ZipFile(io.BytesIO(r.data)) as z:
            names = z.namelist()
            assert len(names) == 2 and all(n.endswith(check) for n in names), names
