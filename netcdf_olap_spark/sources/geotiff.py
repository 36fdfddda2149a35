"""Minimal GeoTIFF reader/writer + distributed raster-directory ingest.

The third cube source next to NetCDF (sources/netcdf*.py) and Zarr
(sources/zarr.py): single-band geo-referenced rasters, one file per
(variable, day) — the layout climate products ship as
cloud-optimized GeoTIFF stacks.  Vendored from the public TIFF 6.0
and GeoTIFF 1.1 specifications (no GDAL/rasterio in this container);
scope is the cube-model subset, like the other two vendored stacks:

- classic TIFF (II little-endian, 4-byte offsets; BigTIFF out of
  scope with a clear error),
- one sample per pixel, PlanarConfig chunky, Photometric min-is-black,
- sample formats: IEEE float 32/64 and signed int 32,
- compression: none (1) or Deflate/zlib (8; both the 8 and legacy
  32946 codes read),
- STRIP and TILE organizations both read and written (tile padding
  trimmed per spec §15: tiles are padded to full tile size),
- geo-referencing via ModelPixelScale (33550) + ModelTiepoint
  (33922) — the raster→(lat, lon) affine every north-up product
  uses; rotated ModelTransformation rasters raise cleanly,
- NoData via the GDAL_NODATA ASCII convention (42113) → NULL.

File-name contract for directory ingest: ``{variable}_{YYYY-MM-DD}.tif``
(one raster per variable per day — the reference's one-file-per-
variable model, Gddp.scala:119-139, at day granularity).
"""

from __future__ import annotations

import datetime as dt
import os
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from netcdf_olap_spark.sources.netcdf import GRID_SCHEMA, ensure_package_on_workers

# TIFF tag ids (spec §8 + GeoTIFF §7 + GDAL convention)
T_WIDTH, T_LENGTH, T_BITS, T_COMP, T_PHOTO = 256, 257, 258, 259, 262
T_STRIP_OFF, T_SPP, T_ROWS_PER_STRIP, T_STRIP_CNT = 273, 277, 278, 279
T_TILE_W, T_TILE_L, T_TILE_OFF, T_TILE_CNT = 322, 323, 324, 325
T_SAMPLE_FMT = 339
T_PIXEL_SCALE, T_TIEPOINT, T_TRANSFORM = 33550, 33922, 34264
T_GDAL_NODATA = 42113

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}  # BYTE..DOUBLE


class GeoTiffError(ValueError):
    pass


# ---------------------------------------------------------------------------
# writer (deterministic bytes — fixtures, export tests)
# ---------------------------------------------------------------------------


def write_geotiff(
    data: np.ndarray,
    lat0: float,
    lon0: float,
    dlat: float,
    dlon: float,
    nodata: float | None = None,
    compression: str | None = None,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """One single-band GeoTIFF: ``data`` (ny, nx) float32/float64/
    int32; geo model lat = lat0 − dlat·y, lon = lon0 + dlon·x (the
    north-up raster affine: tiepoint pins pixel (0,0) to (lon0,
    lat0), pixel scale carries (dlon, dlat)).  ``tile=(th, tw)``
    writes a tiled file (th/tw multiples of 16 per spec §15),
    otherwise one strip per 8 rows."""
    if data.ndim != 2:
        raise GeoTiffError("single-band 2-D rasters only")
    kind = data.dtype
    if kind == np.float32:
        bits, fmt = 32, 3
    elif kind == np.float64:
        bits, fmt = 64, 3
    elif kind == np.int32:
        bits, fmt = 32, 2
    else:
        raise GeoTiffError(f"unsupported dtype {kind}")
    ny, nx = data.shape
    data = np.ascontiguousarray(data.astype(data.dtype.newbyteorder("<")))

    blocks: list[bytes] = []
    if tile:
        th, tw = tile
        if th % 16 or tw % 16:
            raise GeoTiffError("tile dims must be multiples of 16 (spec §15)")
        pad = nodata if nodata is not None else 0
        for ty in range(0, ny, th):
            for tx in range(0, nx, tw):
                block = np.full((th, tw), pad, dtype=data.dtype)
                sub = data[ty : min(ty + th, ny), tx : min(tx + tw, nx)]
                block[: sub.shape[0], : sub.shape[1]] = sub
                blocks.append(block.tobytes())
    else:
        rps = 8
        for y0 in range(0, ny, rps):
            blocks.append(data[y0 : min(y0 + rps, ny), :].tobytes())
    comp_code = 1
    if compression == "deflate":
        comp_code = 8
        blocks = [zlib.compress(b, 6) for b in blocks]

    # layout: header(8) | blocks | aux arrays | IFD
    out = bytearray(struct.pack("<2sHI", b"II", 42, 0))
    offsets, counts = [], []
    for b in blocks:
        offsets.append(len(out))
        counts.append(len(b))
        out.extend(b)
        if len(out) % 2:
            out.extend(b"\0")

    aux: dict[int, tuple[int, int, bytes]] = {}  # tag -> (type, count, payload)

    def aux_array(tag: int, typ: int, values, packfmt: str) -> None:
        aux[tag] = (typ, len(values), struct.pack(f"<{len(values)}{packfmt}", *values))

    aux_array(T_BITS, 3, [bits], "H")
    if tile:
        aux_array(T_TILE_OFF, 4, offsets, "I")
        aux_array(T_TILE_CNT, 4, counts, "I")
    else:
        aux_array(T_STRIP_OFF, 4, offsets, "I")
        aux_array(T_STRIP_CNT, 4, counts, "I")
    aux_array(T_PIXEL_SCALE, 12, [float(dlon), float(dlat), 0.0], "d")
    aux_array(T_TIEPOINT, 12, [0.0, 0.0, 0.0, float(lon0), float(lat0), 0.0], "d")
    if nodata is not None:
        s = (repr(float(nodata)) if fmt == 3 else str(int(nodata))).encode() + b"\0"
        aux[T_GDAL_NODATA] = (2, len(s), s)

    entries: list[tuple[int, int, int, bytes | int]] = []  # tag, type, count, value

    def short(tag: int, v: int) -> None:
        entries.append((tag, 3, 1, v))

    def dim(tag: int, v: int) -> None:
        # TIFF 6.0 allows SHORT or LONG for the dimension tags; a
        # >65535-pixel raster needs LONG (r11 advice: packing it as
        # SHORT raised an opaque struct.error) — readers, including
        # ours, accept either type
        entries.append((tag, 3, 1, v) if v <= 0xFFFF else (tag, 4, 1, v))

    dim(T_WIDTH, nx)
    dim(T_LENGTH, ny)
    short(T_COMP, comp_code)
    short(T_PHOTO, 1)
    short(T_SPP, 1)
    short(T_SAMPLE_FMT, fmt)
    if tile:
        dim(T_TILE_W, tile[1])
        dim(T_TILE_L, tile[0])
    else:
        short(T_ROWS_PER_STRIP, 8)

    # place aux payloads (value fits inline if ≤4 bytes)
    for tag, (typ, cnt, payload) in aux.items():
        if len(payload) <= 4:
            entries.append((tag, typ, cnt, payload.ljust(4, b"\0")))
        else:
            if len(out) % 2:
                out.extend(b"\0")
            entries.append((tag, typ, cnt, len(out)))
            out.extend(payload)

    if len(out) % 2:
        out.extend(b"\0")
    ifd_off = len(out)
    entries.sort(key=lambda e: e[0])
    out.extend(struct.pack("<H", len(entries)))
    for tag, typ, cnt, val in entries:
        out.extend(struct.pack("<HHI", tag, typ, cnt))
        if isinstance(val, bytes):
            out.extend(val)
        elif typ == 3:
            out.extend(struct.pack("<HH", val, 0))
        else:
            out.extend(struct.pack("<I", val))
    out.extend(struct.pack("<I", 0))  # next IFD
    struct.pack_into("<I", out, 4, ifd_off)
    return bytes(out)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _read_ifd(buf: bytes, off: int, en: str) -> dict[int, tuple[int, int, bytes]]:
    (n,) = struct.unpack_from(f"{en}H", buf, off)
    if off + 2 + n * 12 + 4 > len(buf):
        raise GeoTiffError("truncated IFD")
    tags = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(f"{en}HHI", buf, off + 2 + i * 12)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown value type: skip per spec
        total = size * cnt
        voff = off + 2 + i * 12 + 8
        if total > 4:
            (vptr,) = struct.unpack_from(f"{en}I", buf, voff)
            if vptr + total > len(buf):
                raise GeoTiffError(f"tag {tag} payload out of range")
            payload = buf[vptr : vptr + total]
        else:
            payload = buf[voff : voff + total]
        tags[tag] = (typ, cnt, payload)
    return tags


def _values(tags, tag, en, default=None):
    if tag not in tags:
        return default
    typ, cnt, payload = tags[tag]
    fmt = {1: "B", 3: "H", 4: "I", 11: "f", 12: "d"}.get(typ)
    if fmt is None:
        if typ == 2:  # ASCII
            return payload.split(b"\0")[0].decode("ascii", "replace")
        raise GeoTiffError(f"unsupported type {typ} for tag {tag}")
    return list(struct.unpack(f"{en}{cnt}{fmt}", payload))


def is_tiff(content: bytes) -> bool:
    return content[:4] in (b"II*\0", b"MM\0*")


def read_geotiff(content: bytes) -> dict:
    """→ dict(data 2-D float64 with NoData→NaN, lat0, lon0, dlat,
    dlon).  Big-endian (MM) files are handled; BigTIFF and rotated
    ModelTransformation rasters raise cleanly."""
    if len(content) < 8:
        raise GeoTiffError("too short for a TIFF header")
    if content[:2] == b"II":
        en = "<"
    elif content[:2] == b"MM":
        en = ">"
    else:
        raise GeoTiffError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack_from(f"{en}H", content, 2)
    if magic == 43:
        raise GeoTiffError("BigTIFF not supported")
    if magic != 42:
        raise GeoTiffError(f"bad TIFF magic {magic}")
    (ifd_off,) = struct.unpack_from(f"{en}I", content, 4)
    tags = _read_ifd(content, ifd_off, en)

    def req(tag: int, label: str) -> int:
        v = _values(tags, tag, en)
        if not v:  # absent, or its type byte was corrupted → skipped
            raise GeoTiffError(f"missing required tag {label}")
        return v[0]

    nx = req(T_WIDTH, "ImageWidth")
    ny = req(T_LENGTH, "ImageLength")
    bits = _values(tags, T_BITS, en, [32])[0]
    comp = _values(tags, T_COMP, en, [1])[0]
    fmt = _values(tags, T_SAMPLE_FMT, en, [1])[0]
    spp = _values(tags, T_SPP, en, [1])[0]
    if spp != 1:
        raise GeoTiffError("single-band rasters only")
    if comp not in (1, 8, 32946):
        raise GeoTiffError(f"unsupported compression {comp}")
    if (fmt, bits) == (3, 32):
        dtype = np.dtype(f"{en}f4")
    elif (fmt, bits) == (3, 64):
        dtype = np.dtype(f"{en}f8")
    elif (fmt, bits) == (2, 32):
        dtype = np.dtype(f"{en}i4")
    else:
        raise GeoTiffError(f"unsupported sample format/bits {(fmt, bits)}")
    if T_TRANSFORM in tags:
        raise GeoTiffError("rotated ModelTransformation rasters not supported")

    if not 0 < nx * ny <= 2**34:
        raise GeoTiffError(f"implausible raster dims {(ny, nx)}")
    out = np.zeros((ny, nx), dtype=dtype.newbyteorder("=")).astype(np.float64)

    def decomp(b: bytes) -> bytes:
        return zlib.decompress(b) if comp in (8, 32946) else b

    def int_list(tag: int, label: str) -> list[int]:
        v = _values(tags, tag, en)
        if not isinstance(v, list) or not v or not all(isinstance(x, int) for x in v):
            raise GeoTiffError(f"tag {label} is not an integer array")
        return v

    if T_TILE_OFF in tags:
        tw = int_list(T_TILE_W, "TileWidth")[0]
        th = int_list(T_TILE_L, "TileLength")[0]
        offs = int_list(T_TILE_OFF, "TileOffsets")
        cnts = int_list(T_TILE_CNT, "TileByteCounts")
        if tw <= 0 or th <= 0 or tw * th > 2**26:
            raise GeoTiffError(f"implausible tile dims {(th, tw)}")
        tiles_across = (nx + tw - 1) // tw
        for i, (o, c) in enumerate(zip(offs, cnts)):
            if o + c > len(content):
                raise GeoTiffError("tile out of range")
            raw = decomp(content[o : o + c])
            if len(raw) != th * tw * dtype.itemsize:
                raise GeoTiffError("tile size mismatch")
            block = np.frombuffer(raw, dtype=dtype).reshape(th, tw)
            ty, tx = (i // tiles_across) * th, (i % tiles_across) * tw
            vy, vx = min(th, ny - ty), min(tw, nx - tx)
            if vy <= 0 or vx <= 0:
                raise GeoTiffError("tile index past raster bounds")
            out[ty : ty + vy, tx : tx + vx] = block[:vy, :vx].astype(np.float64)
    elif T_STRIP_OFF in tags:
        rps_v = _values(tags, T_ROWS_PER_STRIP, en, [ny])
        rps = rps_v[0] if isinstance(rps_v, list) and rps_v and isinstance(rps_v[0], int) else ny
        offs = int_list(T_STRIP_OFF, "StripOffsets")
        cnts = int_list(T_STRIP_CNT, "StripByteCounts")
        y = 0
        for o, c in zip(offs, cnts):
            if o + c > len(content):
                raise GeoTiffError("strip out of range")
            raw = decomp(content[o : o + c])
            rows = len(raw) // (nx * dtype.itemsize)
            if rows * nx * dtype.itemsize != len(raw) or rows > rps:
                raise GeoTiffError("strip size mismatch")
            out[y : y + rows, :] = (
                np.frombuffer(raw, dtype=dtype).reshape(rows, nx).astype(np.float64)
            )
            y += rows
        if y != ny:
            raise GeoTiffError(f"strips cover {y} of {ny} rows")
    else:
        raise GeoTiffError("no strip or tile offsets")

    scale = _values(tags, T_PIXEL_SCALE, en)
    tie = _values(tags, T_TIEPOINT, en)
    if not scale or not tie or len(tie) < 6:
        raise GeoTiffError("missing GeoTIFF pixel-scale/tiepoint tags")
    dlon, dlat = float(scale[0]), float(scale[1])
    # tiepoint: raster (i, j, k) ↔ model (x, y, z); pin at pixel (0,0)
    if tie[0] != 0 or tie[1] != 0:
        raise GeoTiffError("tiepoint must pin pixel (0,0)")
    lon0, lat0 = float(tie[3]), float(tie[4])

    nod = _values(tags, T_GDAL_NODATA, en)
    if nod is not None:
        out = np.where(out == float(nod), np.nan, out)
    return {"data": out, "lat0": lat0, "lon0": lon0, "dlat": dlat, "dlon": dlon}


# ---------------------------------------------------------------------------
# distributed directory ingest
# ---------------------------------------------------------------------------


def decode_geotiff_file(content: bytes, ds: str, name: str) -> Iterator[pd.DataFrame]:
    """One ``{variable}_{YYYY-MM-DD}.tif`` → long cube rows.  Module-
    level (pickled by reference) — callers must have shipped the
    package via ensure_package_on_workers."""
    base = os.path.basename(name)
    stem = base[:-4] if base.lower().endswith(".tif") else base
    var, _, datepart = stem.rpartition("_")
    if not var:
        raise GeoTiffError(f"file name {base!r} != {{variable}}_{{date}}.tif")
    day = dt.datetime.strptime(datepart, "%Y-%m-%d")
    g = read_geotiff(content)
    ny, nx = g["data"].shape
    yy, xx = np.meshgrid(np.arange(ny, dtype=np.int32), np.arange(nx, dtype=np.int32), indexing="ij")
    yield pd.DataFrame(
        {
            "ds": ds,
            "variable": var,
            "time": np.repeat(np.datetime64(day, "us"), ny * nx),
            "y": yy.ravel(),
            "x": xx.ravel(),
            "lat": (g["lat0"] - g["dlat"] * yy.ravel().astype(np.float64)),
            "lon": (g["lon0"] + g["dlon"] * xx.ravel().astype(np.float64)),
            "value": g["data"].ravel(),
        }
    )


def ingest_geotiff_directory(spark: SparkSession, path: str, ds: str) -> DataFrame:
    """binaryFile over ``*.tif`` → mapInPandas decode → GRID_SCHEMA
    (one task per raster file, the netcdf ingest's fan-out)."""
    ensure_package_on_workers(spark)
    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.tif").load(path)
    ds_ = ds

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from netcdf_olap_spark.sources.geotiff import decode_geotiff_file

        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                yield from decode_geotiff_file(bytes(content), ds_, p)

    return files.select("path", "content").mapInPandas(_decode, schema=GRID_SCHEMA)
