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


def test_time_weighted_avg_matches_numpy(spark):
    """integral2_vus / (2 * span_us) equals numpy's trapezoidal
    time-weighted average of the user's raw series."""
    import numpy as np

    from netcdf_olap_spark.queries.events import _ev, ev_time_weighted_avg

    rows = {r.user_id: r for r in ev_time_weighted_avg(spark, SF_SMALL).collect()}
    assert rows
    e = (
        _ev(spark, SF_SMALL)
        .where(F.col("value").isNotNull())
        .select("user_id", "event_id", "ts_us", "value")
        .collect()
    )
    by_user = {}
    for r in e:
        by_user.setdefault(r.user_id, []).append((r.ts_us, r.event_id, r.value))
    for uid, r in rows.items():
        pts = sorted(by_user[uid])
        t = np.array([p[0] for p in pts], dtype=np.float64)
        v = np.array([p[2] for p in pts], dtype=np.float64)
        trapz = getattr(np, "trapezoid", None) or np.trapz  # numpy <2 names it trapz
        want = trapz(v, t) / (t[-1] - t[0])
        got = float(r.integral2_vus) / 2.0 / r.span_us
        assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (uid, got, want)
        assert r.n_obs == len(pts) and r.span_us == int(t[-1] - t[0])


def test_resample_linear_matches_numpy(spark):
    """Interpolated grid values equal numpy.interp over the raw
    series; exactly-hit samples return their own value."""
    import numpy as np

    from netcdf_olap_spark.queries.events import _ev, ev_resample_linear

    out = ev_resample_linear(spark, SF_SMALL)
    uid = out.select("user_id").first()[0]
    got = {
        r.grid_ts_us: r.value_interp
        for r in out.where(F.col("user_id") == uid).collect()
    }
    pts = sorted(
        (r.ts_us, r.event_id, r.value)
        for r in _ev(spark, SF_SMALL)
        .where((F.col("user_id") == uid) & F.col("value").isNotNull())
        .select("ts_us", "event_id", "value")
        .collect()
    )
    # numpy.interp wants strictly usable xp: collapse duplicate ts to
    # the LAST event at that ts (the window's bracketing choice:
    # prev = last obs ordered (t, event_id), next = first obs)
    t = np.array([p[0] for p in pts], dtype=np.float64)
    v = np.array([p[2] for p in pts], dtype=np.float64)
    assert got, "expected grid points"
    for gt, gv in got.items():
        lo = max(p[2] for p in pts if p[0] <= gt or p[0] == t[0])
        # bracketing reference without numpy.interp's duplicate-x
        # ambiguity: find prev (max ts <= gt, last event) and next
        prev = max((p for p in pts if p[0] <= gt), key=lambda p: (p[0], p[1]))
        nxt = min((p for p in pts if p[0] >= gt), key=lambda p: (p[0], p[1]))
        if nxt[0] == prev[0]:
            want = prev[2]
        else:
            frac = (gt - prev[0]) / (nxt[0] - prev[0])
            want = prev[2] + frac * (nxt[2] - prev[2])
        assert abs(gv - want) < 1e-9, (gt, gv, want)


def test_lttb_downsample_properties(spark):
    """Per user: exactly LTTB_BUCKETS+2 output points, the endpoints
    preserved, every output point a real observation — and a planted
    extreme spike SURVIVES downsampling (the property naive
    striding/averaging destroys)."""
    from netcdf_olap_spark.queries.events import (
        LTTB_BUCKETS,
        _ev,
        ev_lttb_downsample,
    )

    out = ev_lttb_downsample(spark, SF_SMALL).collect()
    raw = (
        _ev(spark, SF_SMALL)
        .where(F.col("value").isNotNull())
        .select("user_id", "ts_us", "value")
        .collect()
    )
    by_user = {}
    for r in raw:
        by_user.setdefault(r.user_id, []).append((r.ts_us, float(r.value)))
    got = {}
    for r in out:
        got.setdefault(r.user_id, []).append((r.ts_us, float(r.value)))
    assert got
    for uid, pts in got.items():
        series = sorted(by_user[uid])
        assert len(pts) == LTTB_BUCKETS + 2
        pts = sorted(pts)
        assert pts[0] == series[0] and pts[-1] == series[-1]  # endpoints
        rawset = set(series)
        assert all(p in rawset for p in pts)  # real observations only

    # planted spike: a flat series with one huge excursion
    flat = [(900, i * 60_000_000, 1.0 + (0.001 * (i % 7))) for i in range(200)]
    flat[97] = (900, flat[97][1], 500.0)  # the spike
    df = spark.createDataFrame(
        [(uid, i, t, v) for i, (uid, t, v) in enumerate(flat)],
        "user_id long, event_id long, ts_us long, value double",
    )
    from netcdf_olap_spark.queries import events as EV

    import netcdf_olap_spark.queries.events as evmod

    orig = evmod._ev
    try:
        evmod._ev = lambda spark, sf_dir: df.withColumn("ts_ns", F.col("ts_us") * 1000)
        down = {r.ts_us: r.value for r in EV.ev_lttb_downsample(spark, "") .collect()}
    finally:
        evmod._ev = orig
    assert 500.0 in down.values(), "the spike must survive LTTB downsampling"
