"""GeoTIFF source: writer↔reader identity across organizations and
codecs, geo-affine decode, NoData semantics, big-endian (MM) files,
clean failures on corrupt/unsupported input, and the distributed
directory ingest."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from netcdf_olap_spark.sources import geotiff as gt


def _data(dtype=np.float32, ny=20, nx=24):
    yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    return ((yy * 31 + xx) * 0.5 + 1.0).astype(dtype)


@pytest.mark.parametrize("compression", [None, "deflate"])
@pytest.mark.parametrize(
    "kw", [{}, {"tile": (16, 16)}], ids=["strips", "tiles"]
)
@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32])
def test_roundtrip(compression, kw, dtype):
    data = _data(dtype)
    if dtype == np.int32:
        data = (data * 2).astype(np.int32)
    blob = gt.write_geotiff(
        data, lat0=50.0, lon0=-100.0, dlat=0.25, dlon=0.25, compression=compression, **kw
    )
    g = gt.read_geotiff(blob)
    np.testing.assert_array_equal(g["data"], data.astype(np.float64))
    assert (g["lat0"], g["lon0"], g["dlat"], g["dlon"]) == (50.0, -100.0, 0.25, 0.25)


def test_nodata_to_nan_and_tile_padding_trimmed():
    data = _data()
    data[3, 5] = np.float32(-9999.0)
    blob = gt.write_geotiff(
        data, 50.0, -100.0, 0.25, 0.25, nodata=-9999.0, tile=(16, 16), compression="deflate"
    )
    g = gt.read_geotiff(blob)
    assert np.isnan(g["data"][3, 5])
    assert np.isfinite(g["data"]).sum() == data.size - 1  # padding never leaks


def test_big_endian_mm_strip_file_reads():
    """Hand-built MM (big-endian) single-strip float32 file — the
    writer emits II only, so this pins the reader's endian path."""
    ny, nx = 2, 3
    data = np.arange(6, dtype=">f4").reshape(ny, nx)
    strip = data.tobytes()
    out = bytearray(struct.pack(">2sHI", b"MM", 42, 0))
    strip_off = len(out)
    out.extend(strip)
    aux = {}
    for tag, vals in ((gt.T_PIXEL_SCALE, [0.5, 0.5, 0.0]), (gt.T_TIEPOINT, [0, 0, 0, 10.0, 20.0, 0])):
        off = len(out)
        out.extend(struct.pack(f">{len(vals)}d", *[float(v) for v in vals]))
        aux[tag] = (12, len(vals), off)
    ifd_off = len(out)
    entries = [
        (gt.T_WIDTH, 3, 1, nx),
        (gt.T_LENGTH, 3, 1, ny),
        (gt.T_BITS, 3, 1, 32),
        (gt.T_COMP, 3, 1, 1),
        (gt.T_PHOTO, 3, 1, 1),
        (gt.T_STRIP_OFF, 4, 1, strip_off),
        (gt.T_SPP, 3, 1, 1),
        (gt.T_ROWS_PER_STRIP, 3, 1, ny),
        (gt.T_STRIP_CNT, 4, 1, len(strip)),
        (gt.T_SAMPLE_FMT, 3, 1, 3),
        (gt.T_PIXEL_SCALE, 12, 3, aux[gt.T_PIXEL_SCALE][2]),
        (gt.T_TIEPOINT, 12, 6, aux[gt.T_TIEPOINT][2]),
    ]
    entries.sort(key=lambda e: e[0])
    out.extend(struct.pack(">H", len(entries)))
    for tag, typ, cnt, val in entries:
        out.extend(struct.pack(">HHI", tag, typ, cnt))
        out.extend(struct.pack(">HH", val, 0) if typ == 3 else struct.pack(">I", val))
    out.extend(struct.pack(">I", 0))
    struct.pack_into(">I", out, 4, ifd_off)

    g = gt.read_geotiff(bytes(out))
    np.testing.assert_array_equal(g["data"], data.astype(np.float64))
    assert (g["lat0"], g["lon0"]) == (20.0, 10.0)


def test_wide_raster_uses_long_dim_tags():
    """ImageWidth > 65535 must be written as a LONG tag (TIFF 6.0
    allows SHORT or LONG; packing as SHORT raised struct.error — r11
    advice), and round-trip through our reader."""
    nx = 70_000
    data = np.arange(nx, dtype=np.float32).reshape(1, nx)
    blob = gt.write_geotiff(data, 50.0, -100.0, 0.5, 0.5)
    # the width tag (256) in the IFD must be type 4 (LONG)
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd_off)
    types = {}
    for i in range(n):
        tag, typ, _cnt = struct.unpack_from("<HHI", blob, ifd_off + 2 + i * 12)
        types[tag] = typ
    assert types[256] == 4  # ImageWidth LONG
    assert types[257] == 3  # ImageLength still SHORT (1 row)
    g = gt.read_geotiff(blob)
    np.testing.assert_array_equal(g["data"], data.astype(np.float64))


def test_unsupported_shapes_raise():
    data = _data()
    with pytest.raises(gt.GeoTiffError, match="multiples of 16"):
        gt.write_geotiff(data, 0, 0, 1, 1, tile=(10, 10))
    with pytest.raises(gt.GeoTiffError, match="dtype"):
        gt.write_geotiff(data.astype(np.int16), 0, 0, 1, 1)
    blob = bytearray(gt.write_geotiff(data, 0, 0, 1, 1))
    struct.pack_into("<H", blob, 2, 43)  # pretend BigTIFF
    with pytest.raises(gt.GeoTiffError, match="BigTIFF"):
        gt.read_geotiff(bytes(blob))
    with pytest.raises(gt.GeoTiffError):
        gt.read_geotiff(b"PK\x03\x04 not a tiff at all")


def test_corrupt_fuzz_fails_clean():
    """Truncations and byte flips raise GeoTiffError/zlib.error/
    struct.error — never hang, never segfault (the format-reader
    fuzz rule)."""
    rng = np.random.default_rng(11)
    blob = gt.write_geotiff(_data(), 50.0, -100.0, 0.25, 0.25, compression="deflate")
    ok_types = (gt.GeoTiffError, zlib.error, struct.error, ValueError)
    for cut in (4, 9, len(blob) // 2, len(blob) - 3):
        with pytest.raises(ok_types):
            gt.read_geotiff(blob[:cut])
    hits = 0
    for _ in range(300):
        b = bytearray(blob)
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 255))
        try:
            gt.read_geotiff(bytes(b))
        except ok_types:
            hits += 1
        # silent wrong data is acceptable for payload flips; crashes are not
    assert hits > 0


def test_distributed_ingest_matches_driver_decode(spark, tmp_path):
    data = _data()
    data[0, 0] = np.float32(-9999.0)
    (tmp_path / "tvar_2001-06-03.tif").write_bytes(
        gt.write_geotiff(data, 50.0, -100.0, 0.25, 0.25, nodata=-9999.0)
    )
    df = gt.ingest_geotiff_directory(spark, str(tmp_path), ds="t")
    rows = df.orderBy("y", "x").collect()
    assert len(rows) == data.size
    assert rows[0]["value"] is None and rows[0]["lat"] == 50.0
    assert rows[1]["value"] == float(data[0, 1]) and rows[1]["lon"] == -99.75
    assert str(rows[0]["time"]).startswith("2001-06-03")


def test_export_sink_rejects_curvilinear(spark, tmp_path):
    """The GeoTIFF affine cannot represent the reference's 2-D
    curvilinear lat/lon — the sink must fail loudly, not write wrong
    georeferencing."""
    from netcdf_olap_spark.session import load_grid
    from netcdf_olap_spark.sinks.geotiff import export_geotiff_files

    g = load_grid(spark).where("variable = 'avg_night_temp' AND time < '1990-01-02'")
    with pytest.raises(Exception, match="affine"):
        export_geotiff_files(g, str(tmp_path / "out")).collect()


def test_export_sink_roundtrips_affine_cube(spark, tmp_path):
    """export∘ingest identity on an affine-regular cube, manifest
    hashes matching the on-disk artifacts."""
    import hashlib

    from netcdf_olap_spark.sinks.geotiff import export_geotiff_files

    data = _data()
    data[2, 2] = np.float32(-9999.0)
    (tmp_path / "v_2001-06-05.tif").write_bytes(
        gt.write_geotiff(data, 50.0, -100.0, 0.25, 0.25, nodata=-9999.0)
    )
    src = gt.ingest_geotiff_directory(spark, str(tmp_path), ds="t")
    out = str(tmp_path / "out")
    manifest = export_geotiff_files(src, out, compression=None).collect()
    assert len(manifest) == 1
    blob = open(manifest[0]["path"], "rb").read()
    assert hashlib.sha256(blob).hexdigest() == manifest[0]["sha256"]
    back = gt.ingest_geotiff_directory(spark, out, ds="t")
    a = {(r["y"], r["x"]): (r["value"], r["lat"], r["lon"]) for r in src.collect()}
    b = {(r["y"], r["x"]): (r["value"], r["lat"], r["lon"]) for r in back.collect()}
    assert a == b
