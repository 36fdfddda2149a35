"""Cube slicing: the reference's scan/read patterns as filters.

SURVEY.md §2.1-2.2 — every NetCDF read pattern becomes a WHERE
clause that Catalyst pushes into the parquet scan (min/max row-group
skipping + partition pruning replace the hand-built hyperslab spec
string of Gddp.scala:223-226).

Semantic traps preserved from the reference:

- Date ranges are **inclusive whole days**: start@00:00 .. end@23:59
  (Gddp.scala:217-219).
- File/partition overlap is a **closed-interval** test
  (Gddp.scala:132-133) — partition pruning on a date-derived
  partition column gives identical pruning.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _day_bounds(start_date: str, end_date: str) -> tuple[F.Column, F.Column]:
    """Inclusive day bounds per Gddp.scala:217-219: [start 00:00,
    end 23:59]. We use < end+1day which also admits 23:59:30 —
    a strict superset only for sub-minute data; daily data matches
    the reference exactly."""
    lo = F.to_timestamp(F.lit(start_date))
    hi = F.to_timestamp(F.date_add(F.to_date(F.lit(end_date)), 1))
    return lo, hi


def time_range(df: DataFrame, start_date: str, end_date: str) -> DataFrame:
    """P3: rows with start_date <= time < end_date + 1 day."""
    lo, hi = _day_bounds(start_date, end_date)
    return df.where((F.col("time") >= lo) & (F.col("time") < hi))


def select_variables(df: DataFrame, variables: list[str]) -> DataFrame:
    """P1: keep requested measure variables (the request∩available
    intersect of Gddp.scala:134-137 is implicit — absent variables
    simply match no rows; the long format has no per-file catalogs
    to reconcile)."""
    return df.where(F.col("variable").isin(list(variables)))


def whole_slice(df: DataFrame, variable: str, t: str | dt.datetime) -> DataFrame:
    """S4: the full 2-D grid of one variable at one timestamp
    (``variable.slice(0, 0)`` of geopy.py:57)."""
    return df.where((F.col("variable") == variable) & (F.col("time") == F.to_timestamp(F.lit(t))))


def hyperslab(
    df: DataFrame,
    variable: str,
    t0: str,
    t1: str,
    y0: int,
    y1: int,
    x0: int,
    x1: int,
) -> DataFrame:
    """S5: sub-cube [t0:t1, y0:y1, x0:x1] — closed index ranges like
    the NetCDF hyperslab spec ``"$t0:$t1,$y0:$y1,$x0:$x1"``
    (Gddp.scala:225)."""
    return (
        time_range(df.where(F.col("variable") == variable), t0, t1)
        .where(F.col("y").between(y0, y1))
        .where(F.col("x").between(x0, x1))
    )


def point_read(df: DataFrame, variable: str, t: str, y: int, x: int) -> DataFrame:
    """S6: scalar at (t, y, x) (README.md:110-118)."""
    return whole_slice(df, variable, t).where((F.col("y") == y) & (F.col("x") == x)).select("value")
