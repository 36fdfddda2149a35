"""Spark 4 Python DataSource for Zarr v2 cube stores.

The live-query twin of ``sources/zarr.ingest_zarr_store`` (which is
the scale path), and the Zarr counterpart of
``sources/netcdf_datasource``: ``spark.read.format("zarr_cube")``
over a store directory, one input partition per **(variable, chunk
object)** — strictly finer than the NetCDF source's (file, variable)
unit, because Zarr already materializes the chunk grid as files, so
a single multi-terabyte variable fans out across the whole cluster
with no byte-range planning.

Streaming form: ``spark.readStream.format("zarr_cube")`` — the
cloud-native append model (a new day of data = new chunk objects
plus a ``.zarray`` shape bump) becomes micro-batches.  Offsets are
the set of chunk objects already ingested, so checkpoint recovery
replays exactly the delta; coordinate axes are re-read per batch
because appends EXTEND the time array.

SELF-CONTAINMENT REQUIREMENT: Spark's *streaming* Python source
planner (``python_streaming_source_runner``) deserializes this class
in its OWN Python process, which has pyspark on the path but NOT
this package (``addPyFile`` reaches task workers, not that runner —
found when ``stream_zarr_ingest`` failed the driver-sim shape while
the batch path passed).  So this module (a) imports nothing from
``netcdf_olap_spark`` anywhere — the few Zarr/time helpers it needs
are inlined, duplicating ~50 lines of sources/zarr.py — and (b)
``register()`` marks it for cloudpickle BY-VALUE serialization, so
the runner and executors never need the package importable at all.
The batch-ingest equivalence test (tests/test_zarr.py) keeps the
inlined copies from drifting from sources/zarr.py.
"""

from __future__ import annotations

import glob
import json
import math
import os
import zlib
from collections.abc import Iterator, Sequence
from itertools import product

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

GRID_DDL = (
    "ds string, variable string, time timestamp, y int, x int, "
    "lat double, lon double, value double"
)

_SUPPORTED = {"<f4", "<f8", "<i4", "<i8", ">f4", ">f8", ">i4", ">i8"}
_COORDS = ("time", "lat", "lon")


# --- inlined Zarr primitives (see module docstring for why) -----------------


def _meta(adir: str) -> dict:
    with open(os.path.join(adir, ".zarray")) as fh:
        meta = json.load(fh)
    if meta.get("zarr_format") != 2 or meta.get("order", "C") != "C" or meta.get("filters"):
        raise ValueError(f"unsupported zarr array at {adir}")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") != "zlib":
        raise NotImplementedError(f"unsupported zarr compressor: {comp.get('id')}")
    if meta["dtype"] not in _SUPPORTED:
        raise NotImplementedError(f"unsupported zarr dtype: {meta['dtype']}")
    return meta


def _decode_block(meta_t: tuple, content: bytes, cidx: tuple[int, ...]):
    import numpy as np

    chunks, shape, dtype, compressed, _fill = meta_t
    if compressed:
        content = zlib.decompress(content)
    block = np.frombuffer(content, dtype=np.dtype(dtype)).reshape(chunks)
    valid = tuple(slice(0, min((i + 1) * c, s) - i * c) for i, c, s in zip(cidx, chunks, shape))
    return block[valid]


def _read_array(adir: str):
    import numpy as np

    meta = _meta(adir)
    mt = (tuple(meta["chunks"]), tuple(meta["shape"]), meta["dtype"],
          bool(meta.get("compressor")), meta.get("fill_value"))
    out = np.zeros(meta["shape"], dtype=np.dtype(meta["dtype"]))
    grid = [range(math.ceil(s / c)) for s, c in zip(meta["shape"], meta["chunks"])]
    for cidx in product(*grid):
        path = os.path.join(adir, ".".join(str(i) for i in cidx))
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(cidx, meta["chunks"], meta["shape"])
        )
        if not os.path.exists(path):
            fv = meta.get("fill_value")
            out[sel] = 0 if fv is None else fv
            continue
        with open(path, "rb") as fh:
            out[sel] = _decode_block(mt, fh.read(), cidx)
    return out


def _axes(root: str):
    import numpy as np

    hours = _read_array(os.path.join(root, "time"))
    base = np.datetime64("1990-01-01T00:00:00", "us")
    us = np.rint(np.asarray(hours, dtype=np.float64) * 3_600_000_000.0).astype(np.int64)
    time_us = (base + us.astype("timedelta64[us]")).astype("datetime64[us]")
    lat_arr = _read_array(os.path.join(root, "lat")).astype(np.float64)
    lon_arr = _read_array(os.path.join(root, "lon")).astype(np.float64)
    if lat_arr.ndim == 2:
        lat2d, lon2d = lat_arr, lon_arr
    else:
        lat2d = np.repeat(lat_arr[:, None], len(lon_arr), axis=1)
        lon2d = np.tile(lon_arr[None, :], (len(lat_arr), 1))
    return time_us, lat2d, lon2d


def _chunk_rows(path, ds, variable, meta_t, time_us, lat2d, lon2d, absent=False):
    """Decode one chunk object → the long-cube pandas frame (shared
    semantics with ingest_zarr_store: edge trim, fill→NULL via NaN,
    non-finite coordinates dropped).  ``absent=True`` synthesizes the
    spec's missing-chunk semantics (every cell at fill) without
    touching the filesystem."""
    import numpy as np
    import pandas as pd

    chunks, shape, _dtype, _compressed, fill = meta_t
    cidx = tuple(int(p) for p in os.path.basename(path).split("."))
    if absent:
        valid = tuple(min((i + 1) * c, s) - i * c for i, c, s in zip(cidx, chunks, shape))
        block = np.full(valid, np.nan if fill is not None else 0.0)
    else:
        with open(path, "rb") as fh:
            content = fh.read()
        block = _decode_block(meta_t, content, cidx).astype(np.float64)
        if fill is not None:
            block = np.where(block == np.float64(fill), np.nan, block)
    bt, by, bx = block.shape
    t0, y0, x0 = (i * c for i, c in zip(cidx, chunks))
    ys = np.arange(y0, y0 + by, dtype=np.int32)
    xs = np.arange(x0, x0 + bx, dtype=np.int32)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    cell = np.ix_(ys, xs)
    lats = lat2d[cell].ravel()
    lons = lon2d[cell].ravel()
    pdf = pd.DataFrame(
        {
            "ds": ds,
            "variable": variable,
            "time": np.repeat(time_us[t0 : t0 + bt], by * bx),
            "y": np.tile(yy.ravel(), bt),
            "x": np.tile(xx.ravel(), bt),
            "lat": np.tile(lats, bt),
            "lon": np.tile(lons, bt),
            "value": block.ravel(),
        }
    )
    placed = np.isfinite(lats) & np.isfinite(lons)
    if not placed.all():
        pdf = pdf[np.tile(placed, bt)].reset_index(drop=True)
    return pdf


# --- the DataSource ---------------------------------------------------------


class ZarrChunkPartition(InputPartition):
    """One (variable, chunk object) decode unit.  ``absent=True``
    marks a chunk the store omits (spec: all-fill) — the reader
    synthesizes its rows instead of opening a file."""

    def __init__(self, path: str, ds: str, variable: str, meta: tuple, absent: bool = False):
        self.path = path
        self.ds = ds
        self.variable = variable
        self.meta = meta  # (chunks, shape, dtype, compressed, fill)
        self.absent = absent


class ZarrCubeDataSource(DataSource):
    """Options: ``path`` (store root), ``ds`` (dataset id, default
    dir name), ``variables`` (comma allowlist — partition pruning)."""

    @classmethod
    def name(cls) -> str:
        return "zarr_cube"

    def schema(self) -> str:
        return GRID_DDL

    def reader(self, schema) -> "ZarrCubeReader":
        return ZarrCubeReader(self.options)

    def simpleStreamReader(self, schema) -> "ZarrCubeStreamReader":
        return ZarrCubeStreamReader(self.options)


class ZarrCubeReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("zarr_cube: path is required")
        self.ds = options.get("ds") or os.path.basename(self.path.rstrip("/"))
        raw = options.get("variables")
        self.variables: Sequence[str] | None = (
            [v.strip() for v in raw.split(",") if v.strip()] if raw else None
        )
        # planning-time metadata + coordinate axes: tiny, pickled to
        # tasks with the reader (the mapInPandas closure-capture rule)
        self.time_us, self.lat2d, self.lon2d = _axes(self.path)
        self.metas = {}
        for name in sorted(os.listdir(self.path)):
            adir = os.path.join(self.path, name)
            if name in _COORDS or not os.path.isdir(adir):
                continue
            if not os.path.exists(os.path.join(adir, ".zarray")):
                continue
            m = _meta(adir)
            if len(m["shape"]) == 3:
                self.metas[name] = (
                    tuple(m["chunks"]),
                    tuple(m["shape"]),
                    m["dtype"],
                    bool(m.get("compressor")),
                    m.get("fill_value"),
                )

    def _chunk_files(self, var: str) -> list[str]:
        return sorted(
            f
            for f in glob.glob(os.path.join(self.path, var, "*"))
            if not os.path.basename(f).startswith(".")
        )

    def partitions(self) -> list[ZarrChunkPartition]:
        parts = []
        for var, meta in sorted(self.metas.items()):
            if self.variables is not None and var not in self.variables:
                continue  # partition-level variable pruning
            chunks, shape = meta[0], meta[1]
            have = {os.path.basename(f) for f in self._chunk_files(var)}
            grid = [range(math.ceil(s / c)) for s, c in zip(shape, chunks)]
            for cidx in product(*grid):
                key = ".".join(str(i) for i in cidx)
                parts.append(
                    ZarrChunkPartition(
                        os.path.join(self.path, var, key),
                        self.ds,
                        var,
                        meta,
                        absent=key not in have,  # spec: omitted = all fill
                    )
                )
        if not parts:
            raise FileNotFoundError(f"zarr_cube: no data chunks under {self.path}")
        return parts

    def read(self, partition: ZarrChunkPartition) -> Iterator:
        import pyarrow as pa

        pdf = _chunk_rows(
            partition.path,
            partition.ds,
            partition.variable,
            partition.meta,
            self.time_us,
            self.lat2d,
            self.lon2d,
            absent=partition.absent,
        )
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        yield from table.to_batches(max_chunksize=10_000)


class ZarrCubeStreamReader(SimpleDataSourceStreamReader):
    """Arriving chunk objects become micro-batches.  The offset is
    the sorted chunk-file list already ingested PLUS the time-axis
    length at consumption (exactly-once replay via
    readBetweenOffsets decodes against that pinned length, so a
    later shape bump cannot change what a committed batch contained);
    the coordinate axes and array metadata are re-read per batch
    because appends EXTEND them.

    Append-race rule: a chunk object that lies ENTIRELY beyond the
    current ``.zarray`` shape (the conventional commit order writes
    chunk objects first, bumps the shape last) is left OUT of the
    offset — it is consumed by a later batch once the shape bump
    lands, instead of being silently swallowed as zero rows.  Edge
    chunks partially covered by the current shape are consumed
    trimmed; if an append later REWRITES such a chunk in place
    (non-slab-aligned appends), the file-set offset cannot see the
    rewrite — publish slab-aligned appends (whole new chunk objects,
    as sinks/zarr.export_zarr_store emits) for streaming consumers.
    Offsets grow with the chunk count of the store — bounded by
    chunk-grid metadata, not data, but long-lived streams over
    ever-growing stores should compact checkpoints periodically (the
    netcdf_cube file-set offset has the same property)."""

    def __init__(self, options: dict):
        self.options = dict(options)

    def _reader(self) -> ZarrCubeReader:
        return ZarrCubeReader(self.options)

    def initialOffset(self) -> dict:
        return {"chunks": []}

    def _list(self, rd: ZarrCubeReader) -> list[str]:
        out = []
        for var in sorted(rd.metas):
            if rd.variables is not None and var not in rd.variables:
                continue
            out.extend(rd._chunk_files(var))
        return sorted(out)

    def _rows_for(self, rd: ZarrCubeReader, files: list[str], nt_cap: int):
        import numpy as np
        import pandas as pd

        def _py(x):
            # tuple-path conversions the Arrow batch path gets free
            if x is None or (isinstance(x, float) and x != x):
                return None
            if isinstance(x, np.integer):
                return int(x)
            if isinstance(x, np.floating):
                return None if np.isnan(x) else float(x)
            if isinstance(x, pd.Timestamp):
                return x.to_pydatetime()
            return x

        out = []
        for f in files:
            var = os.path.basename(os.path.dirname(f))
            if var not in rd.metas:
                continue
            chunks, shape, dtype, comp, fill = rd.metas[var]
            # pin the time axis to the offset's length: replay must
            # decode what the ORIGINAL batch saw, not a later bump
            shape = (min(shape[0], nt_cap),) + tuple(shape[1:])
            meta_t = (chunks, shape, dtype, comp, fill)
            pdf = _chunk_rows(
                f, rd.ds, var, meta_t, rd.time_us[:nt_cap], rd.lat2d, rd.lon2d
            )
            for t in pdf.itertuples(index=False, name=None):
                out.append(tuple(_py(x) for x in t))
        return iter(out)

    def _ready(self, rd: ZarrCubeReader, f: str, nt: int) -> bool:
        """Consumable now = at least one time step of the chunk lies
        within the current shape (see class docstring's append-race
        rule)."""
        var = os.path.basename(os.path.dirname(f))
        if var not in rd.metas:
            return True  # unknown dirs are consumed (and ignored) once
        chunks = rd.metas[var][0]
        t0 = int(os.path.basename(f).split(".")[0]) * chunks[0]
        return t0 < nt

    def read(self, start: dict):
        rd = self._reader()
        nt = len(rd.time_us)
        seen = set(start.get("chunks", []))
        new = [f for f in self._list(rd) if f not in seen]
        ready = [f for f in new if self._ready(rd, f, nt)]
        consumed = sorted(seen | set(ready))
        return self._rows_for(rd, ready, nt), {"chunks": consumed, "nt": nt}

    def readBetweenOffsets(self, start: dict, end: dict):
        rd = self._reader()
        seen = set(start.get("chunks", []))
        nt_cap = int(end.get("nt") or len(rd.time_us))
        return self._rows_for(
            rd, [f for f in end.get("chunks", []) if f not in seen], nt_cap
        )


def register(spark) -> None:
    """Idempotent format registration.  Marks THIS module for
    cloudpickle by-value serialization so the streaming planner
    runner and executors never need the package importable (the
    module is deliberately free of netcdf_olap_spark imports); also
    ships the package for everything else in the session."""
    import sys

    from pyspark import cloudpickle

    try:
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # older cloudpickle: fall back to the pyFiles path
        pass
    from netcdf_olap_spark.sources.netcdf import ensure_package_on_workers

    ensure_package_on_workers(spark)
    spark.dataSource.register(ZarrCubeDataSource)
