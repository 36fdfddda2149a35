"""Property tests (SURVEY.md §5.5, hypothesis):

1. slab/filter equivalence: for ANY hyperslab, the relational filter
   over the long table returns exactly the cells the dense-cube slice
   contains (the rebuild's core claim: S5 hyperslab reads == pushed
   WHERE clauses).
2. sketch bound: approx quantile breaks are within the declared
   relative error of exact order statistics (A1/A2:
   StreamingHistogram.quantileBreaks → percentile_approx).
3. ingest round-trip: cube → long → cube is lossless for any cube,
   fill pattern, and time axis (fill→NULL is the only rewrite).

Spark jobs are slow per-example, so examples are kept few and the
per-example data small; numpy does the ground-truth side.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from netcdf_olap_spark.operators.slice import hyperslab
from netcdf_olap_spark.sources import netcdf as src

NT, NY, NX = 6, 7, 5


@pytest.fixture(scope="module")
def cube(spark):
    rng = np.random.default_rng(99)
    data = rng.normal(0.0, 10.0, (NT, NY, NX))
    data[rng.random((NT, NY, NX)) < 0.15] = -999.0
    th = np.arange(NT) * 24
    yy, xx = np.meshgrid(np.arange(NY), np.arange(NX), indexing="ij")
    lat = 40.0 + yy * 0.5
    lon = -90.0 + xx * 0.5
    df = src.cube_to_df(spark, "p", "v", data, th, lat, lon, fill_value=-999.0).cache()
    df.count()
    return data, df


slab = st.tuples(
    st.integers(0, NT - 1), st.integers(0, NT - 1),
    st.integers(0, NY - 1), st.integers(0, NY - 1),
    st.integers(0, NX - 1), st.integers(0, NX - 1),
).map(lambda t: (min(t[0], t[1]), max(t[0], t[1]),
                 min(t[2], t[3]), max(t[2], t[3]),
                 min(t[4], t[5]), max(t[4], t[5])))


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(s=slab)
def test_hyperslab_equals_dense_slice(cube, s):
    data, df = cube
    t0, t1, y0, y1, x0, x1 = s
    dense = data[t0 : t1 + 1, y0 : y1 + 1, x0 : x1 + 1]
    want_n = dense.size
    want_nulls = int((dense == -999.0).sum())
    want_sum = float(dense[dense != -999.0].sum())

    d0 = f"1990-01-{t0 + 1:02d}"
    d1 = f"1990-01-{t1 + 1:02d}"
    got = hyperslab(df, "v", d0, d1, y0, y1, x0, x1)
    row = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").isNull().cast("int")).alias("nulls"),
        F.sum("value").alias("s"),
    ).first()
    assert row["n"] == want_n
    assert row["nulls"] == want_nulls
    assert (row["s"] or 0.0) == pytest.approx(want_sum, rel=1e-9, abs=1e-9)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 2**31 - 1), q=st.floats(0.05, 0.95))
def test_approx_quantile_within_error(spark, seed, q):
    """percentile_approx(relativeError=eps) must sit within eps of the
    exact rank — the same mergeable-sketch contract the reference's
    StreamingHistogram.quantileBreaks(1<<15) relies on
    (Gddp.scala:230-231)."""
    rng = np.random.default_rng(seed)
    vals = rng.normal(0, 1, 2000)
    df = spark.createDataFrame([(float(v),) for v in vals], ["v"])
    eps = 0.02
    got = df.approxQuantile("v", [q], eps)[0]
    exact_sorted = np.sort(vals)
    # the sketch guarantees rank(got) ∈ [(q-eps)n, (q+eps)n]
    lo = exact_sorted[max(0, int(np.floor((q - eps) * len(vals))) - 1)]
    hi = exact_sorted[min(len(vals) - 1, int(np.ceil((q + eps) * len(vals))))]
    assert lo <= got <= hi


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 2**31 - 1), nt=st.integers(1, 4), fill_p=st.floats(0, 0.5))
def test_ingest_roundtrip_lossless(spark, seed, nt, fill_p):
    rng = np.random.default_rng(seed)
    ny, nx = 3, 4
    data = rng.normal(0, 1, (nt, ny, nx))
    fill_mask = rng.random((nt, ny, nx)) < fill_p
    data[fill_mask] = 123.25  # exactly representable fill
    th = rng.integers(0, 10_000, nt)
    th = np.unique(th)[:nt]
    nt = len(th)
    data = data[:nt]
    fill_mask = fill_mask[:nt]
    yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    df = src.cube_to_df(spark, "r", "v", data, th, yy * 1.0, xx * 1.0, fill_value=123.25)

    rows = df.where(F.col("value").isNotNull()).collect()
    back = np.full((nt, ny, nx), np.nan)
    hours = {int(h): i for i, h in enumerate(th)}
    for r in rows:
        t_idx = hours[int((r["time"] - src.EPOCH_1990).total_seconds() // 3600)]
        back[t_idx, r["y"], r["x"]] = r["value"]
    masked = data.copy()
    masked[fill_mask] = np.nan
    assert np.allclose(back, masked, equal_nan=True)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.integers(0, 2**31 - 1))
def test_focal_mean_equals_numpy_convolution(spark, seed):
    """focal_mean_3x3 == the numpy shrinking-window nan-mean for ANY
    small slice with random NODATA holes."""
    from netcdf_olap_spark.operators.spatial import focal_mean_3x3

    rng = np.random.default_rng(seed)
    h, w = 5, 6
    vals = rng.normal(0, 10, (h, w))
    vals[rng.random((h, w)) < 0.3] = np.nan
    rows = [
        (y, x, None if np.isnan(vals[y, x]) else float(vals[y, x]))
        for y in range(h)
        for x in range(w)
    ]
    df = spark.createDataFrame(rows, "y int, x int, value double")
    got = {
        (r["y"], r["x"]): (r["n_neighbors"], r["focal_mean"])
        for r in focal_mean_3x3(df).collect()
    }
    for y in range(h):
        for x in range(w):
            win = vals[max(0, y - 1) : y + 2, max(0, x - 1) : x + 2]
            vs = win[~np.isnan(win)]
            n, m = got[(y, x)]
            assert n == vs.size
            if vs.size:
                assert abs(m - vs.mean()) < 1e-6
            else:
                assert m is None


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.one_of(st.none(), st.floats(-50, 50)), min_size=1, max_size=12))
def test_linear_interpolation_matches_numpy(spark, series):
    """The bracketing-window linear interpolation reproduces
    np.interp on interior gaps and nearest-neighbor extrapolation at
    the edges, for ANY null pattern."""
    from pyspark.sql.window import Window as W

    rows = [(0, 0, float(i), v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "y int, x int, t double, value double")
    v = F.col("value")
    wp = W.partitionBy("y", "x").orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    wn = W.partitionBy("y", "x").orderBy("t").rowsBetween(W.currentRow, W.unboundedFollowing)
    pv = F.last(F.when(v.isNotNull(), v), ignorenulls=True).over(wp)
    pt = F.last(F.when(v.isNotNull(), F.col("t")), ignorenulls=True).over(wp)
    nv = F.first(F.when(v.isNotNull(), v), ignorenulls=True).over(wn)
    nt = F.first(F.when(v.isNotNull(), F.col("t")), ignorenulls=True).over(wn)
    frac = (F.col("t") - pt) / (nt - pt)
    filled = (
        F.when(v.isNotNull(), v)
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * frac)
    )
    got = [r["f"] for r in df.select(filled.alias("f")).orderBy("t").collect()]

    xs = [i for i, s in enumerate(series) if s is not None]
    if not xs:
        assert all(g is None for g in got)
        return
    ys = [series[i] for i in xs]
    ref = np.interp(np.arange(len(series)), xs, ys)  # edge = nearest known
    for g, r in zip(got, ref):
        assert g is not None and abs(g - r) < 1e-9


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(0, 5),  # whole price — ties land on bucket edges
            st.sampled_from([0.0, 0.5]),  # fractional part within a bucket
            st.integers(0, 4),  # size, few distinct values → many ties
        ),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_two_level_matches_naive(spark, pts):
    """4. skyline distributivity: the two-level plan (per-price-bucket
    cumulative-min window + broadcast carry-merge) equals the naive
    sorted single-pass dominance filter for ANY point set — including
    duplicate points, equal prices straddling bucket boundaries, and
    single-bucket degenerate inputs."""
    import shutil
    import tempfile

    from netcdf_olap_spark.queries.analytics import part_skyline

    rows = [
        (i, float(p) + frac, int(sz)) for i, (p, frac, sz) in enumerate(pts)
    ]
    d = tempfile.mkdtemp(prefix="skyline_prop_")
    try:
        spark.createDataFrame(
            rows, "p_partkey long, p_retailprice double, p_size int"
        ).write.parquet(f"{d}/part.parquet")
        got = [r["p_partkey"] for r in part_skyline(spark, d).collect()]
    finally:
        shutil.rmtree(d, ignore_errors=True)

    minsz = None
    want = []
    for key, price, size in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        if minsz is None or minsz > size:
            want.append(key)
        minsz = size if minsz is None else min(minsz, size)
    assert got == sorted(want)
