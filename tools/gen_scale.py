"""Amplify the driver's sf0.1 testdata to larger scale factors for the
local scaling-curve measurement (BASELINE.md round-8 note; judge ask
r7#8). NOT a replacement for driver testdata — correctness runs stay
on /root/testdata; this exists so superlinear wall-time growth is
measurable instead of argued.

Method: K verbatim copies of every table with per-copy key offsets
(orderkey/event_id +1e9·c, custkey/partkey/doc_id +1e8·c, suppkey
+1e7·c), so every within-copy join relationship — fan-outs, skew,
selectivities — replicates exactly and the workload is K× the rows
with identical per-copy structure. Two deliberate exceptions:

- ``documents.text`` in copies 1..K-1 has each token (except the
  first) prefixed with a copy tag (``/ +/ -> ' zC'`` — a regex over
  space RUNS, so consecutive spaces can't mint standalone tag
  tokens): token COUNT is preserved and within-copy shingle overlap
  (planted near-dup pairs)
  is untouched, but every k≥2 shingle differs across copies — without
  this, minhash/span dedup would see each doc K times and candidate
  pairs would grow K², measuring an artifact of the amplification
  rather than the operator. Tags add ~2 chars/token (~25% bytes) to
  9/10 of the corpus — a slightly pessimistic amplification.
- ``nation``/``region`` are copied once (real dimension tables don't
  scale with the fact tables).

The GRID CUBE (fixtures/grid.parquet — sf-independent by design, so
the §2 climate-index family had no measurable α until r10) is
amplified too, along its two physical axes so K = ka·kt:

- (y, x) domain tiled ka× in x: x' = x + 32·a, with lat/lon extended
  by the fixture's own closed-form (lat = 42 + 0.05y + 0.002x → +0.064·a;
  lon = -84 + 0.05x + 0.002y → +1.6·a) — more area, same per-cell
  series length;
- day axis extended kt×: time' = time + 30·b days, reusing the base
  block's values (the fixture's seasonal term has period 30, so each
  appended block is one more season) — longer per-cell series, the
  axis per-cell windows (trend/streak/GDD) actually sort.

The result lands as ``grid.parquet`` in out_dir; the curve harness
points ``SPARK_GRAFT_GRID_PATH`` at it (session.load_grid).  ka/kt
are chosen as kt=2 for even K else 1 (both axes exercised at the
default K=10: 5× area × 2× days).

Usage: python tools/gen_scale.py [K] [out_dir]   (default 10, .scaledata/sf1.0)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

#: table -> {key column -> per-copy offset}
KEYED: dict[str, dict[str, int]] = {
    "lineitem": {"l_orderkey": 10**9, "l_partkey": 10**8, "l_suppkey": 10**7},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**8},
    "customer": {"c_custkey": 10**8},
    "supplier": {"s_suppkey": 10**7},
    "part": {"p_partkey": 10**8},
    "events": {"event_id": 10**9, "user_id": 10**8},
    "documents": {"doc_id": 10**8},
    "embeddings": {"vec_id": 10**8},
}
AS_IS = ("nation", "region")


GRID_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "grid.parquet"
)
GRID_W = 32  # fixture x-extent (fixtures/gen_fixtures.py W)
GRID_PERIOD_DAYS = 30  # fixture seasonal period = its day count


def amplify_grid(k: int, out_dir: str, ka: int | None = None, kt: int | None = None) -> None:
    """Tile the cube ka× in x and kt× along the day axis (k = ka·kt),
    per the closed-form coordinate formulas — see module docstring.
    Pass ka/kt explicitly to pick the axis split (e.g. 10×10 for a
    balanced 100× cube); default kt=2 for even k, else 1."""
    if ka is None or kt is None:
        kt = 2 if k % 2 == 0 else 1
        ka = k // kt
    assert ka * kt == k, f"ka*kt must equal k ({ka}*{kt} != {k})"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT ds, variable,
                 time + (b.b * {GRID_PERIOD_DAYS}) * INTERVAL 1 DAY AS time,
                 y,
                 CAST(x + {GRID_W} * a.a AS INTEGER) AS x,
                 lat + 0.002 * {GRID_W} * a.a AS lat,
                 lon + 0.05 * {GRID_W} * a.a AS lon,
                 value
          FROM read_parquet('{GRID_SRC}'),
               generate_series(0, {ka - 1}) AS a(a),
               generate_series(0, {kt - 1}) AS b(b)
        ) TO '{out_dir}/grid.parquet' (FORMAT PARQUET)
        """
    )
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out_dir}/grid.parquet')").fetchone()[0]
    print(f"grid: {n} rows (x-tiles {ka} x day-blocks {kt})")


def amplify(k: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    amplify_grid(k, out_dir)
    con = duckdb.connect()
    for t in AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, offs in KEYED.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()]
        sel = []
        for col in cols:
            if col in offs:
                sel.append(f"{col} + CAST(c.c AS BIGINT) * {offs[col]} AS {col}")
            elif t == "documents" and col == "text":
                # copy 0 keeps the original bytes; tagged copies get
                # disjoint shingle spaces (see module docstring)
                # runs of spaces collapse to ONE tagged separator —
                # a per-space replace would insert standalone zC
                # tokens inside runs and inflate token counts in the
                # amplified copies (r8 advisory)
                sel.append(
                    "CASE WHEN c.c = 0 THEN text "
                    "ELSE regexp_replace(text, ' +', ' z' || CAST(c.c AS VARCHAR), 'g') END AS text"
                )
            else:
                sel.append(col)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{SRC}/{t}.parquet'), "
            f"generate_series(0, {k - 1}) AS c(c)) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".scaledata", "sf1.0")
    amplify(k, out)
