"""Deterministic grid-cube fixtures (FIXTURES.md §1-3).

Models the reference's NetCDF data model (SURVEY.md §1.1) as a
long-format parquet fact table:

- 3 measure variables from the real Five Lakes catalog
  (reference map.jsx:36-44),
- daily timestamps starting 1990-01-01 — the reference's epoch
  ("hours since 1990-01-01", Gddp.scala:126),
- a curvilinear grid: lat/lon each vary with BOTH (y, x) indices
  (2-D coordinate arrays, Gddp.scala:178-182 / geopy.py:52-53),
- ~7% NULL cells modeling ``_FillValue`` (Gddp.scala:188-191),
- a precomputed ``in_poly`` flag on the coords dimension so the
  DuckDB oracle can verify the polygon mask in pure SQL
  (SURVEY.md §7 "What's hard").

Run: python fixtures/gen_fixtures.py   (idempotent, seed=1990)
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))

DS = "five_lakes"
VARIABLES = ["LST_LWST_avg_daily", "LST_LWST_avg_day", "avg_night_temp"]
W = H = 32
DAYS = 30
EPOCH = np.datetime64("1990-01-01T00:00:00", "us")

# Non-rectangular pentagon inside the grid extent (NW hemisphere,
# matching the reference's tested region, Gddp.scala:87).
POLYGON = [
    (-83.60, 42.30),
    (-82.90, 42.45),
    (-82.75, 43.05),
    (-83.30, 43.30),
    (-83.70, 42.90),
    (-83.60, 42.30),  # closed ring, 5 distinct points (main.py:51-85 shape)
]


def point_in_polygon(lon: np.ndarray, lat: np.ndarray, ring: list[tuple[float, float]]) -> np.ndarray:
    """Vectorized even-odd ray casting. Independent of the engine's
    implementation (netcdf_olap_spark/operators/spatial.py) so tests
    cross-check the two."""
    inside = np.zeros(lon.shape, dtype=bool)
    n = len(ring) - 1  # ring is closed
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        cond = (y1 > lat) != (y2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        inside ^= cond & (lon < xcross)
    return inside


def build_coords() -> dict[str, np.ndarray]:
    y, x = np.meshgrid(np.arange(H, dtype=np.int32), np.arange(W, dtype=np.int32), indexing="ij")
    y = y.ravel()
    x = x.ravel()
    lat = 42.0 + 0.05 * y + 0.002 * x  # curvilinear skew
    lon = -84.0 + 0.05 * x + 0.002 * y
    in_poly = point_in_polygon(lon, lat, POLYGON)
    return {"y": y, "x": x, "lat": lat, "lon": lon, "in_poly": in_poly}


def main() -> None:
    rng = np.random.default_rng(1990)
    c = build_coords()
    ncells = W * H

    coords_tbl = pa.table(
        {
            "ds": pa.array([DS] * ncells),
            "y": pa.array(c["y"], pa.int32()),
            "x": pa.array(c["x"], pa.int32()),
            "lat": pa.array(c["lat"], pa.float64()),
            "lon": pa.array(c["lon"], pa.float64()),
            "in_poly": pa.array(c["in_poly"]),
        }
    )
    pq.write_table(coords_tbl, os.path.join(HERE, "coords.parquet"))

    # grid: rows = variable x day x cell
    frames = []
    for vi, var in enumerate(VARIABLES):
        for d in range(DAYS):
            t = EPOCH + np.timedelta64(d, "D").astype("timedelta64[us]")
            # smooth spatial field + seasonal drift + noise, Kelvin-ish
            base = 275.0 + 8.0 * vi + 3.0 * np.sin(2 * np.pi * d / 30.0)
            field = (
                base
                + 2.5 * np.sin(c["lat"] * 2.1)
                + 1.5 * np.cos(c["lon"] * 1.7)
                + rng.normal(0.0, 0.8, ncells)
            )
            nulls = rng.random(ncells) < 0.07  # _FillValue cells
            field = np.where(nulls, np.nan, field)
            frames.append(
                {
                    "ds": np.full(ncells, DS, dtype=object),
                    "variable": np.full(ncells, var, dtype=object),
                    "time": np.full(ncells, t),
                    "y": c["y"],
                    "x": c["x"],
                    "lat": c["lat"],
                    "lon": c["lon"],
                    "value": field,
                }
            )

    cols: dict[str, np.ndarray] = {k: np.concatenate([f[k] for f in frames]) for k in frames[0]}
    value = cols["value"]
    grid_tbl = pa.table(
        {
            "ds": pa.array(cols["ds"].tolist()),
            "variable": pa.array(cols["variable"].tolist()),
            "time": pa.array(cols["time"], pa.timestamp("us")),
            "y": pa.array(cols["y"], pa.int32()),
            "x": pa.array(cols["x"], pa.int32()),
            "lat": pa.array(cols["lat"], pa.float64()),
            "lon": pa.array(cols["lon"], pa.float64()),
            "value": pa.array(np.where(np.isnan(value), None, value).tolist(), pa.float64()),
        }
    )
    pq.write_table(grid_tbl, os.path.join(HERE, "grid.parquet"))

    # Multi-file layout (FIXTURES.md §3): 3 date windows, mirroring
    # one-NetCDF-file-per-period (Gddp.scala:117-139) for pruning tests.
    parts_dir = os.path.join(HERE, "grid_parts")
    os.makedirs(parts_dir, exist_ok=True)
    times = grid_tbl.column("time").to_numpy()
    day = ((times - EPOCH) / np.timedelta64(1, "D")).astype(int)
    for w in range(3):
        mask = (day >= w * 10) & (day < (w + 1) * 10)
        pq.write_table(grid_tbl.filter(pa.array(mask)), os.path.join(parts_dir, f"window={w}.parquet"))

    with open(os.path.join(HERE, "polygon.json"), "w") as f:
        json.dump(
            {
                "type": "FeatureCollection",
                "features": [
                    {
                        "type": "Feature",
                        "properties": {},
                        "geometry": {"type": "Polygon", "coordinates": [[list(p) for p in POLYGON]]},
                    }
                ],
            },
            f,
        )

    n_in = int(c["in_poly"].sum())
    print(f"grid rows={grid_tbl.num_rows} cells={ncells} in_poly_cells={n_in}")


if __name__ == "__main__":
    main()
