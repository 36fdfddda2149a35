"""Round-11 operators: Getis-Ord Gi* local hotspots and per-cell
quantile-mapping bias correction — value cross-checks against
pure-python references plus plan locks on the promised shuffle
shapes."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from netcdf_olap_spark.queries.grid import grid_getis_gi, grid_quantile_map
from netcdf_olap_spark.session import load_grid
from tests.conftest import SF_SMALL


def _counts(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "hash": len(re.findall(r"Exchange hashpartitioning", plan)),
        "single": len(re.findall(r"Exchange SinglePartition", plan)),
        "range": len(re.findall(r"Exchange rangepartitioning", plan)),
        "bcast": len(re.findall(r"BroadcastExchange", plan)),
    }


def test_getis_gi_matches_reference(spark):
    """The decimal-exact components reduce to the float Gi* z-score a
    pure-python reference computes from the raw field (rook weights +
    self, one day)."""
    rows = [r for r in grid_getis_gi(spark, SF_SMALL).collect()]
    assert rows
    day = min(r["time"] for r in rows)
    day_rows = {(r.y, r.x): r for r in rows if r["time"] == day}

    raw = (
        load_grid(spark)
        .where(
            (F.col("variable") == "LST_LWST_avg_daily")
            & F.col("value").isNotNull()
            & (F.col("time") == day)
        )
        .select("y", "x", "value")
        .collect()
    )
    vals = {(q.y, q.x): q.value for q in raw}
    n = len(vals)
    mean = sum(vals.values()) / n
    ss = sum(v * v for v in vals.values())
    s_pop = ((ss / n) - mean * mean) ** 0.5
    offs = ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0))

    checked = 0
    for (y, x), r in day_rows.items():
        nbhd = [(y + dy, x + dx) for dy, dx in offs if (y + dy, x + dx) in vals]
        assert r.w_i == len(nbhd)
        local = sum(vals[c] for c in nbhd)
        w = len(nbhd)
        denom = s_pop * (((n * w - w * w) / (n - 1)) ** 0.5)
        z_ref = (local - w * mean) / denom
        # engine z from the exact components: local_u = n·local − w·S,
        # sum_u2 = n·(n·SS − S²) → z = local_u/(√(sum_u2/n)·√((nw−w²)/(n−1)))
        z_eng = float(r.local_u) / (
            (float(r.sum_u2) / r.n_cells) ** 0.5
            * (((r.n_cells * r.w_i - r.w_i * r.w_i) / (r.n_cells - 1)) ** 0.5)
        )
        # 1e-5: the engine snaps values to decimal(18,6) first
        assert abs(z_eng - z_ref) < 1e-5, (y, x, z_eng, z_ref)
        checked += 1
    assert checked == n
    # a smooth physical field must contain real hot/cold spots
    zs = [
        float(r.local_u)
        / ((float(r.sum_u2) / r.n_cells) ** 0.5 * (((r.n_cells * r.w_i - r.w_i**2) / (r.n_cells - 1)) ** 0.5))
        for r in day_rows.values()
    ]
    assert max(zs) > 1.96 and min(zs) < -1.96


def test_quantile_map_matches_numpy(spark):
    """Per-cell mapped values equal numpy.interp of the plotting
    positions onto the observation order statistics."""
    import numpy as np

    out = grid_quantile_map(spark, SF_SMALL)
    y0, x0 = out.select("y", "x").first()[:2]
    got = {
        r["time"]: (r["value"], r["mapped"])
        for r in out.where((F.col("y") == y0) & (F.col("x") == x0)).collect()
    }
    g = load_grid(spark).where((F.col("y") == y0) & (F.col("x") == x0))
    a = sorted(
        (r.value, r.time)
        for r in g.where(
            (F.col("variable") == "LST_LWST_avg_day") & F.col("value").isNotNull()
        ).collect()
    )
    b = np.sort(
        [
            r.value
            for r in g.where(
                (F.col("variable") == "avg_night_temp") & F.col("value").isNotNull()
            ).collect()
        ]
    ).astype(np.float64)
    na, nb = len(a), len(b)
    for rank, (v, t) in enumerate(a, start=1):
        h = (rank - 0.5) / na * (nb - 1)
        want = float(np.interp(h, np.arange(nb), b))
        gv, gm = got[t]
        assert abs(gv - float(v)) < 1e-9
        assert abs(gm - want) < 1e-9, (t, gm, want)
    # distribution matching: mapped values live inside B's range
    assert all(b[0] - 1e-9 <= m <= b[-1] + 1e-9 for _v, m in got.values())


def test_quantile_map_monotone_per_cell(spark):
    """CDF matching is monotone: within a cell, sorting by the raw
    value sorts the mapped value too."""
    out = grid_quantile_map(spark, SF_SMALL)
    y0, x0 = out.select("y", "x").first()[:2]
    rows = sorted(
        (r["value"], r["time"].isoformat(), r["mapped"])
        for r in out.where((F.col("y") == y0) & (F.col("x") == x0)).collect()
    )
    mapped = [m for _v, _t, m in rows]
    assert all(m2 >= m1 - 1e-12 for m1, m2 in zip(mapped, mapped[1:]))


def test_getis_gi_no_single_partition(spark):
    """grid_getis_gi: per-day stats broadcast; neighborhood sum and
    moment rollups are day/cell-keyed — no single-partition exchange
    anywhere (the morans plan family plus one owner-keyed groupBy)."""
    c = _counts(grid_getis_gi(spark, SF_SMALL))
    assert c["single"] == 0
    assert c["hash"] <= 6


def test_quantile_map_no_single_partition(spark):
    """grid_quantile_map: both window sorts are per-cell partitions,
    both interpolation joins are (cell, k)-keyed — never a global
    sort-everything window."""
    c = _counts(grid_quantile_map(spark, SF_SMALL))
    assert c["single"] == 0


def test_dq_audit_report(spark):
    """The contract audit's fixed 7 checks: clean invariants report
    zero, the two natural-signal checks report real violations, and
    denominators equal the table sizes."""
    from netcdf_olap_spark.queries.maintenance import maintenance_dq_audit

    rows = {r["check"]: r for r in maintenance_dq_audit(spark, SF_SMALL).collect()}
    assert len(rows) == 7
    for clean in (
        "orders_pk_unique",
        "lineitem_fk_orders",
        "orders_fk_customer",
        "lineitem_qty_domain",
        "customer_required_complete",
    ):
        assert rows[clean].violations == 0, clean
    # the synthetic data genuinely violates these two business rules
    assert rows["lineitem_ship_after_order"].violations > 0
    assert rows["customer_acctbal_nonneg"].violations >= 0
    n_li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").count()
    assert rows["lineitem_fk_orders"].checked == n_li
    assert rows["lineitem_ship_after_order"].checked == n_li  # FK is total
