"""Hypertable-style rollup: materialized time-bucket pre-aggregates
plus residual-edge merge at query time (the TimescaleDB
"continuous aggregate" pattern, rebuilt on Spark).

The reference's cubes are themselves pre-aggregated daily/day/night
averages (map.jsx:37-43 — the upstream computed them offline); this
operator is the live, queryable form of that idea for the events
stream: maintain a small table of per-bucket *mergeable partials*
(count / decimal sum / min / max), answer an arbitrary
``[start, end)`` range by reading whole buckets from the rollup and
only the two bucket-fragments at the range edges from raw data.

Scale math: with a 10-minute bucket over 100 TB of events, the
rollup is ~1/bucket_rows the size of raw (thousands× smaller) and
the residual raw scan is ≤ 2 buckets of rows, pruned by partition /
row-group min-max on the time column. The merge itself is a union of
partials + one final aggregate — partials are decimal/long, so the
merge is exact and order-independent (same determinism contract as
functions/deterministic.py).

All bucket math is integer µs arithmetic (session-timezone-free,
matching queries/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_10MIN = 600_000_000


def build_rollup(events: DataFrame, bucket_us: int = US_10MIN) -> DataFrame:
    """Per-(bucket, event_type) mergeable partials from an events
    frame carrying ``ts_us``. One shuffle; output is the materialized
    rollup (write it partitioned by a coarser time unit in
    production — e.g. day — so range queries prune)."""
    bucket = (F.col("ts_us") - F.col("ts_us") % F.lit(bucket_us)).alias("bucket_us")
    return events.groupBy(bucket, "event_type").agg(
        F.count(F.lit(1)).alias("p_count"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("p_sum"),
        F.min("value").alias("p_min"),
        F.max("value").alias("p_max"),
    )


def _final(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("event_type")
        .agg(
            F.sum("p_count").alias("n_events"),
            F.sum("p_sum").cast("double").alias("sum_value"),
            F.min("p_min").alias("min_value"),
            F.max("p_max").alias("max_value"),
        )
        .orderBy("event_type")
    )


def rollup_range_stats(
    raw: DataFrame,
    rollup: DataFrame,
    start_us: int,
    end_us: int,
    bucket_us: int = US_10MIN,
) -> DataFrame:
    """Stats per event_type over ``[start_us, end_us)``: whole buckets
    from the rollup, the partial edge buckets from raw. Exactly equal
    to aggregating raw directly (property-tested over random ranges in
    tests/test_rollup.py)."""
    # first bucket start fully inside the range / first bucket start past it
    core_lo = -(-start_us // bucket_us) * bucket_us  # ceil to bucket
    core_hi = (end_us // bucket_us) * bucket_us  # floor to bucket
    if core_lo >= core_hi:  # range narrower than one aligned bucket
        edges = raw.where((F.col("ts_us") >= start_us) & (F.col("ts_us") < end_us))
        return _final(build_rollup(edges, bucket_us))
    core = rollup.where((F.col("bucket_us") >= core_lo) & (F.col("bucket_us") < core_hi))
    edges = raw.where(
        ((F.col("ts_us") >= start_us) & (F.col("ts_us") < core_lo))
        | ((F.col("ts_us") >= core_hi) & (F.col("ts_us") < end_us))
    )
    return _final(core.unionByName(build_rollup(edges, bucket_us)))
