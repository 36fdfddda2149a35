"""Slice semantics: inclusive day bounds, hyperslab==filter
equivalence, and multi-file pruning (SURVEY.md §5 items 3-5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from netcdf_olap_spark.operators import slice as slice_ops
from netcdf_olap_spark.session import FIXTURES_DIR, load_grid


def test_day_bounds_inclusive(spark):
    """P3 (Gddp.scala:217-219): start@00:00 .. end@23:59 inclusive —
    a single-day range keeps that whole day."""
    g = load_grid(spark, register=False)
    one_day = slice_ops.time_range(g, "1990-01-03", "1990-01-03")
    times = [r.time for r in one_day.select("time").distinct().collect()]
    assert len(times) == 1
    assert times[0].strftime("%Y-%m-%d") == "1990-01-03"


def test_empty_range(spark):
    """Non-overlapping range → empty result, no error (the 'No files
    generated' path, main.py:121-122)."""
    g = load_grid(spark, register=False)
    assert slice_ops.time_range(g, "2050-01-01", "2050-12-31").count() == 0


def test_hyperslab_equals_composed_filters(spark):
    """Property (SURVEY §5.5): slice(slab) == filter(long table) for
    several hyperslabs."""
    g = load_grid(spark, register=False)
    for (t0, t1, y0, y1, x0, x1) in [
        ("1990-01-01", "1990-01-01", 0, 0, 0, 0),
        ("1990-01-05", "1990-01-09", 3, 17, 2, 30),
        ("1990-01-01", "1990-01-30", 0, 31, 0, 31),
    ]:
        slab = slice_ops.hyperslab(g, "LST_LWST_avg_day", t0, t1, y0, y1, x0, x1)
        manual = g.where(
            (F.col("variable") == "LST_LWST_avg_day")
            & (F.col("time") >= F.lit(t0))
            & (F.col("time") < F.date_add(F.to_date(F.lit(t1)), 1).cast("timestamp"))
            & F.col("y").between(y0, y1)
            & F.col("x").between(x0, x1)
        )
        assert slab.count() == manual.count()
        assert slab.exceptAll(manual).count() == 0


def test_multifile_window_union(spark):
    """FIXTURES.md §3: a range spanning exactly two of the three
    date-window files equals the union of those windows; file-level
    stats prune the third."""
    parts = spark.read.parquet(os.path.join(FIXTURES_DIR, "grid_parts"))
    two = slice_ops.time_range(parts, "1990-01-05", "1990-01-15")
    # windows 0 (days 0-9) and 1 (days 10-19) overlap; window 2 doesn't
    w0 = spark.read.parquet(os.path.join(FIXTURES_DIR, "grid_parts", "window=0.parquet"))
    w1 = spark.read.parquet(os.path.join(FIXTURES_DIR, "grid_parts", "window=1.parquet"))
    manual = slice_ops.time_range(w0.union(w1), "1990-01-05", "1990-01-15")
    assert two.count() == manual.count() > 0


def test_time_filter_pushed_to_scan(spark):
    """The time predicate must reach the parquet scan (PushedFilters),
    replacing the reference's hand-rolled file pruning (O1/O3)."""
    g = load_grid(spark, register=False)
    plan = slice_ops.time_range(g, "1990-01-05", "1990-01-06")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(time" in plan


def test_point_read_single_value(spark):
    g = load_grid(spark, register=False)
    rows = slice_ops.point_read(g, "avg_night_temp", "1990-01-02", 5, 5).collect()
    assert len(rows) == 1
