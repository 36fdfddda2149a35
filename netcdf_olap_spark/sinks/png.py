"""PNG render sink (SURVEY.md §2.1 S8).

The reference masks a GeoTrellis tile to the query polygon, colors it
with quantile breaks, and writes ``gddp<variable><start>-<end>.png``
(Gddp.scala:230-236; filename contract shared with main.py:118). Here:

- the *engine-internal* representation stays a long DataFrame — the
  dense 2-D tile exists only inside this sink's ``applyInPandas``
  batches (SURVEY §1.3 "tile only at the sink");
- one group = one (variable) image → groups are small (H×W cells),
  Arrow-batched, rendered in parallel per variable;
- color mapping uses per-slice quantile breaks computed from the
  group's own values (the reference's per-slice choice,
  Gddp.scala:193-203 — "different areas will have different color
  mappings"); masked / NODATA cells render transparent, the
  ``FloatUserDefinedNoDataCellType`` analog;
- the PNG bytes are produced by a dependency-free encoder (zlib +
  struct, RGBA, 8-bit) since PIL/matplotlib aren't assumed;
- vertical flip at render time only — the long format is
  orientation-free, so the reference's ``rotate180.flipVertical``
  fixup (README.md:82) is isolated here.

Scale: :func:`render_png_files` writes each image to shared storage
INSIDE the rendering task (the reference's own contract —
Gddp.scala:235-236 writes the PNG from the task, not the driver) and
returns only (path, size, checksum) manifest rows; the blob-carrying
:func:`render_png` remains for small in-memory zips and tests.
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

RENDER_SCHEMA = StructType(
    [
        StructField("variable", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_cells", IntegerType()),
        StructField("n_valid", IntegerType()),
        StructField("png", BinaryType()),
    ]
)

PNG_MANIFEST_SCHEMA = StructType(
    [
        StructField("variable", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_cells", IntegerType()),
        StructField("n_valid", IntegerType()),
        StructField("path", StringType()),
        StructField("size", LongType()),
        StructField("sha256", StringType()),
    ]
)


def png_filename(variable: str, start_date: str, end_date: str, prefix: str = "gddp") -> str:
    """The reference's filename contract (Gddp.scala:236 /
    main.py:118): ``gddp<variable><start>-<end>.png``. Components are
    validated — variable names come from file contents, so traversal
    attempts fail here, before any file or zip entry is created."""
    safe_component(variable, "variable")
    safe_component(prefix, "prefix")
    safe_component(start_date, "start_date")
    safe_component(end_date, "end_date")
    return f"{prefix}{variable}{start_date}-{end_date}.png"


def _make_renderer(shared_breaks, n_breaks, write_spec=None):
    """Build the per-group render function. Nested (not module-level)
    so cloudpickle serializes it BY VALUE — executors need nothing on
    PYTHONPATH for the PNG path (unlike the NetCDF sink, which ships
    the package for its vendored writers).

    ``write_spec``: None → return blob rows (RENDER_SCHEMA);
    (out_dir, start_date, end_date, prefix) → write the file in-task
    (tempfile + os.replace, atomic) and return manifest rows
    (PNG_MANIFEST_SCHEMA)."""

    def _render(pdf):
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def encode_png(rgba: "np.ndarray") -> bytes:
            """Minimal RGBA8 PNG encoder (no deps)."""
            h, w, _ = rgba.shape
            raw = b"".join(b"\x00" + rgba[r].tobytes() for r in range(h))

            def chunk(tag: bytes, payload: bytes) -> bytes:
                return (
                    struct.pack(">I", len(payload))
                    + tag
                    + payload
                    + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
                )

            ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)  # 8-bit RGBA
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw, 6))
                + chunk(b"IEND", b"")
            )

        variable = str(pdf["variable"].iloc[0])
        ys = pdf["y"].to_numpy()
        xs = pdf["x"].to_numpy()
        vals = pdf["value"].to_numpy(dtype=np.float64)
        y0, y1 = int(ys.min()), int(ys.max())
        x0, x1 = int(xs.min()), int(xs.max())
        h, w = y1 - y0 + 1, x1 - x0 + 1

        tile = np.full((h, w), np.nan)
        # average duplicate (y, x) cells (multiple timesteps per cell)
        with np.errstate(invalid="ignore"):
            sums = np.zeros((h, w))
            cnts = np.zeros((h, w))
            valid = ~np.isnan(vals)
            np.add.at(sums, (ys[valid] - y0, xs[valid] - x0), vals[valid])
            np.add.at(cnts, (ys[valid] - y0, xs[valid] - x0), 1)
            tile = np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan)

        finite = tile[~np.isnan(tile)]
        rgba = np.zeros((h, w, 4), dtype=np.uint8)
        if finite.size:
            if shared_breaks is not None:
                # global mode: identical color scale across variables
                breaks = np.asarray(shared_breaks)
            else:
                # per-slice quantile breaks (Gddp.scala:193-203 behavior)
                breaks = np.quantile(finite, np.linspace(0, 1, n_breaks + 1)[1:])
            klass = np.searchsorted(breaks, np.nan_to_num(tile, nan=0.0))
            t = klass.astype(np.float64) / max(n_breaks - 1, 1)
            # the reference's ramp: GeoTrellis "Blue to Orange"
            # (Gddp.scala:232, ColorRamps.BlueToOrange) — the public
            # 12-stop palette, linearly interpolated across the
            # quantile classes exactly as ColorRamp.stops(n) spreads
            # its colors over n breaks
            stops = np.array(
                [
                    (0x25, 0x86, 0xAB), (0x4E, 0xA3, 0xC8), (0x7F, 0xB8, 0xD4),
                    (0xAD, 0xD8, 0xEA), (0xC8, 0xE1, 0xE7), (0xED, 0xEC, 0xEA),
                    (0xF0, 0xE7, 0xBB), (0xF5, 0xCF, 0x7D), (0xF9, 0xB7, 0x37),
                    (0xE6, 0x8F, 0x2D), (0xD7, 0x6B, 0x27), (0xBD, 0x4E, 0x24),
                ],
                dtype=np.float64,
            )
            pos = t * (len(stops) - 1)
            lo = np.clip(np.floor(pos).astype(int), 0, len(stops) - 2)
            frac = (pos - lo)[..., None]
            rgb = stops[lo] * (1 - frac) + stops[lo + 1] * frac
            rgba[..., :3] = np.clip(rgb, 0, 255).astype(np.uint8)
            rgba[..., 3] = np.where(np.isnan(tile), 0, 255).astype(np.uint8)

        rgba = rgba[::-1]  # vertical flip: row 0 = north (README.md:82 fixup)
        png = encode_png(np.ascontiguousarray(rgba))
        meta = {
            "variable": variable,
            "width": w,
            "height": h,
            "n_cells": int(h * w),
            "n_valid": int(finite.size),
        }
        if write_spec is None:
            return pd.DataFrame([{**meta, "png": png}])

        import hashlib
        import os as _os
        import re as _re
        import tempfile as _tempfile

        out_dir, start_date, end_date, prefix = write_spec
        # inline twin of sinks.naming.safe_component (closure stays
        # import-free on executors): reject traversal-capable names
        for what, nm in (("variable", variable), ("prefix", prefix),
                         ("start_date", start_date), ("end_date", end_date)):
            if (not nm or _re.search(r"[\x00-\x1f/\\]", nm) or ".." in nm
                    or nm != nm.strip() or nm.startswith(".")):
                raise ValueError(f"{what} {nm!r} is not a safe filename component")
        _os.makedirs(out_dir, exist_ok=True)
        final = _os.path.join(out_dir, f"{prefix}{variable}{start_date}-{end_date}.png")
        fd, tmp = _tempfile.mkstemp(dir=out_dir, suffix=".png.tmp")
        try:
            with _os.fdopen(fd, "wb") as f:
                f.write(png)
            _os.replace(tmp, final)  # atomic: no partial files visible
        except BaseException:
            try:
                _os.unlink(tmp)
            except OSError:
                pass
            raise
        return pd.DataFrame(
            [
                {
                    **meta,
                    "path": final,
                    "size": len(png),
                    "sha256": hashlib.sha256(png).hexdigest(),
                }
            ]
        )

    return _render


def _shared_breaks(df: DataFrame, n_breaks: int, global_breaks: bool):
    """``global_breaks`` resolves the reference's consistency-vs-speed
    tradeoff (SURVEY §4 O9) the other way: one extra approxQuantile
    pass over ALL variables' values gives every image the same color
    scale (the whole-tile histogram the reference commented out at
    Gddp.scala:193-203); default False = per-slice breaks, the
    reference's shipped behavior."""
    if not global_breaks:
        return None
    probs = [i / n_breaks for i in range(1, n_breaks + 1)]
    return df.where(F.col("value").isNotNull()).approxQuantile("value", probs, 0.001)


def render_png(df: DataFrame, n_breaks: int = 16, global_breaks: bool = False) -> DataFrame:
    """Render one PNG per variable from a long (variable, y, x, value)
    DataFrame (already sliced/masked upstream). Returns a small
    DataFrame of image artifacts (bytes in the ``png`` column) — pure,
    no side effects. SMALL-artifact path: for anything bigger than a
    masked product slice, use :func:`render_png_files`."""
    fn = _make_renderer(_shared_breaks(df, n_breaks, global_breaks), n_breaks)
    return df.select("variable", "y", "x", "value").groupBy("variable").applyInPandas(fn, RENDER_SCHEMA)


def render_png_files(
    df: DataFrame,
    out_dir: str,
    start_date: str,
    end_date: str,
    prefix: str = "gddp",
    n_breaks: int = 16,
    global_breaks: bool = False,
) -> DataFrame:
    """Scale path: each image is written to ``out_dir`` inside its own
    rendering task (atomic tempfile + ``os.replace``) with the
    reference's filename contract; only (path, size, sha256) manifest
    rows reach the driver. ``out_dir`` must be visible to executors
    and driver (local mode / NFS / shared volume)."""
    # fail fast on the driver for caller-supplied components; variable
    # names (data-derived) are re-checked inside the task
    safe_component(prefix, "prefix")
    safe_component(start_date, "start_date")
    safe_component(end_date, "end_date")
    fn = _make_renderer(
        _shared_breaks(df, n_breaks, global_breaks),
        n_breaks,
        write_spec=(str(out_dir), start_date, end_date, prefix),
    )
    return (
        df.select("variable", "y", "x", "value")
        .groupBy("variable")
        .applyInPandas(fn, PNG_MANIFEST_SCHEMA)
    )


def save_pngs(
    rendered: DataFrame,
    out_dir: str,
    start_date: str,
    end_date: str,
    prefix: str = "gddp",
    max_bytes: int | None = _limits.MAX_DRIVER_ARTIFACT_BYTES,
) -> list[str]:
    """Materialize blob-carrying rendered images (from
    :func:`render_png`) to files with the reference's filename
    contract — atomic writes, small-slice path. Guarded: raises before
    collecting if the blob total exceeds ``max_bytes`` (default 256
    MiB; ``None`` accepts the driver collect explicitly) — for large
    renders use :func:`render_png_files`."""
    import tempfile

    rendered = _limits.guard_driver_collect(rendered, "png", "sinks.png.render_png_files", max_bytes)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    try:
        rows = rendered.collect()
    finally:
        # release the guard's executor-side pin (no-op when unpinned)
        rendered.unpersist()
    for row in rows:
        p = os.path.join(out_dir, png_filename(row.variable, start_date, end_date, prefix))
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".png.tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(bytes(row.png))
        os.replace(tmp, p)
        paths.append(p)
    return paths
