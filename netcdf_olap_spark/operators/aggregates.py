"""Aggregation operators: histograms, quantile breaks, grid stats.

SURVEY.md §2.4 — the reference's one aggregate is a Ben-Haim/Tom-Tov
streaming histogram + quantile breaks for color mapping
(StreamingHistogram, Gddp.scala:230-231). Spark's
``percentile_approx`` is the same mergeable-sketch partial+final
pattern (SURVEY §4 O8); exact variants use ``percentile`` /
width-bucketed group-bys.

All aggregates skip NULLs natively — the fill-value semantics the
reference had to wire through its NODATA cell type (Gddp.scala:228)
come for free once sentinels are NULL at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_stats(df: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """min/max/avg/count of the measure, optionally grouped. The
    min/max-over-time-extent probe of Gddp.scala:125-129 is
    ``value_stats(df.select('time', ...))`` with time as measure."""
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_vals"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
        F.avg("value").alias("avg_val"),
    ]
    return df.groupBy(*(group_cols or [])).agg(*aggs)


def quantile_breaks(df: DataFrame, n_breaks: int, group_cols: list[str] | None = None) -> DataFrame:
    """A2: class breaks for color mapping (Gddp.scala:231 asks for
    2^15 breaks from the sketch; ``percentile_approx`` with a prob
    ladder is the same sketch merge). Exact percentile variant is in
    the oracle-checked queries."""
    probs = F.array([F.lit((i + 1) / n_breaks) for i in range(n_breaks)])
    return df.groupBy(*(group_cols or [])).agg(
        F.percentile_approx("value", probs, 10000).alias("breaks")
    )


def histogram(df: DataFrame, width: float, group_cols: list[str] | None = None) -> DataFrame:
    """A1 exact analog: fixed-width binned counts,
    ``groupBy(floor(value/width))`` — a single shuffle on (groups,
    bin); NULLs drop out via the isNotNull filter like NODATA cells
    drop out of StreamingHistogram."""
    binned = df.where(F.col("value").isNotNull()).withColumn(
        "bin", F.floor(F.col("value") / F.lit(width)).cast("long")
    )
    return (
        binned.groupBy(*((group_cols or []) + ["bin"]))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bin_lo", F.col("bin") * F.lit(width))
    )
