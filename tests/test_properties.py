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
