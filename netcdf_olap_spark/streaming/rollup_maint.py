"""Continuous-aggregate maintenance: a streaming job keeps the
hypertable rollup (operators/rollup.py) up to date incrementally.

Pattern: ``foreachBatch`` computes the micro-batch's per-(bucket,
event_type) PARTIALS and APPENDS them to the rollup store. Appending
is exact and idempotent-on-merge because the partials are mergeable
aggregates (long counts, decimal sums, min/max): readers re-combine
partials per key, so N appended fragments for one bucket collapse to
the same result as one — no read-modify-write, no upsert transaction
needed, and late/out-of-order events just add another fragment to
their (old) bucket. An optional compaction rewrites fragments into
one row per key; queries are correct before, during, and after it.

At scale: each micro-batch shuffles only its own events (one
aggregation), the store grows by O(batch buckets) rows per trigger,
and compaction is a partition-local rewrite scheduled off-peak — the
standard continuous-aggregate design (TimescaleDB/Materialize style)
on plain Spark + parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netcdf_olap_spark.operators.rollup import US_10MIN, build_rollup


def start_rollup_maintenance(
    stream_events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    bucket_us: int = US_10MIN,
):
    """Start the maintenance stream (availableNow-compatible): every
    micro-batch appends its partials. ``stream_events`` must carry
    ``ts_us`` (long microseconds) + event_type + value."""

    def upsert(batch: DataFrame, _batch_id: int) -> None:
        build_rollup(batch, bucket_us).write.mode("append").parquet(out_dir)

    return (
        stream_events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup_store(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge the appended fragments back to one row per (bucket,
    event_type) — exact (decimal/long/min/max merges are
    order-independent). This is also the compaction body."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("bucket_us", "event_type")
        .agg(
            F.sum("p_count").alias("p_count"),
            F.sum("p_sum").cast("decimal(18,2)").alias("p_sum"),
            F.min("p_min").alias("p_min"),
            F.max("p_max").alias("p_max"),
        )
    )


def compact_rollup_store(spark: SparkSession, out_dir: str, tmp_suffix: str = "_compacted") -> None:
    """Rewrite fragments to one row per key (read → merge → swap).
    Queries running against the old fragments stay correct — the
    merge is associative, so both layouts answer identically."""
    merged = read_rollup_store(spark, out_dir)
    tmp = out_dir.rstrip("/") + tmp_suffix
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(out_dir)
