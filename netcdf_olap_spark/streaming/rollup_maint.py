"""Continuous-aggregate maintenance: a streaming job keeps the
hypertable rollup (operators/rollup.py) up to date incrementally.

Pattern: ``foreachBatch`` computes the micro-batch's per-(bucket,
event_type) PARTIALS and writes them under a ``batch_id=N``
partition with DYNAMIC partition overwrite.  Two properties fall out:

- **mergeable**: the partials are mergeable aggregates (long counts,
  decimal sums, min/max) — readers re-combine partials per key, so N
  fragments for one bucket collapse to the same result as one; no
  read-modify-write, and late/out-of-order events just add another
  fragment to their (old) bucket.
- **replay-idempotent**: ``foreachBatch`` is at-least-once (a crash
  between the sink write and the checkpoint commit re-runs the
  batch).  A plain append would double-count that batch's partials
  (a review finding); the dynamic overwrite of exactly the
  ``batch_id=N`` partition makes the re-run rewrite its own output
  instead — the standard exactly-once recipe for idempotent
  foreachBatch sinks.

An optional compaction rewrites fragments into one row per key;
queries are correct before and after it — see
``compact_rollup_store`` for its (single-writer) contract.

At scale: each micro-batch shuffles only its own events (one
aggregation), the store grows by O(batch buckets) rows per trigger,
and compaction is scheduled off-peak — the standard
continuous-aggregate design (TimescaleDB/Materialize style) on plain
Spark + parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netcdf_olap_spark.operators.rollup import US_10MIN, build_rollup

# every fragment and the compacted file declare the SAME sum type —
# build_rollup's sum over decimal(18,2) widens to this; a narrower
# cast anywhere would mix parquet schemas across fragments and break
# the vectorized reader on the next scan (a review finding)
_SUM_DEC = "decimal(28,2)"

COMPACTED_BATCH_ID = -1  # the compaction output's partition


def write_rollup_batch(
    batch: DataFrame, out_dir: str, batch_id: int, bucket_us: int = US_10MIN
) -> None:
    """One micro-batch's partials → the ``batch_id=<id>`` partition,
    dynamic-overwritten: running this twice for the same id (the
    foreachBatch replay case) leaves exactly one copy."""
    (
        build_rollup(batch, bucket_us)
        .withColumn("p_sum", F.col("p_sum").cast(_SUM_DEC))
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )


def start_rollup_maintenance(
    stream_events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    bucket_us: int = US_10MIN,
):
    """Start the maintenance stream (availableNow-compatible): every
    micro-batch writes its partials under ``batch_id=<id>`` with
    dynamic overwrite (re-runs replace, never duplicate).
    ``stream_events`` must carry ``ts_us`` (long microseconds) +
    event_type + value."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        write_rollup_batch(batch, out_dir, batch_id, bucket_us)

    return (
        stream_events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup_store(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge the appended fragments back to one row per (bucket,
    event_type) — exact (decimal/long/min/max merges are
    order-independent).  The merged sum keeps the FRAGMENT precision
    (decimal(28,2)) so compaction output and fresh fragments always
    share one parquet schema."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("bucket_us", "event_type")
        .agg(
            F.sum("p_count").alias("p_count"),
            F.sum("p_sum").cast(_SUM_DEC).alias("p_sum"),
            F.min("p_min").alias("p_min"),
            F.max("p_max").alias("p_max"),
        )
    )


def compact_rollup_store(spark: SparkSession, out_dir: str) -> None:
    """Rewrite fragments to one row per key.

    The merged result lands in the reserved ``batch_id=-1`` partition
    via dynamic overwrite, then the consumed batch partitions are
    overwritten with empty data — so the store directory stays
    readable throughout and a crash mid-compaction leaves at worst
    DUPLICATE partials (which the merge-on-read collapses to a
    double-counted value only if the compacted partition committed
    while source partitions survived — hence the contract below),
    never a missing store.

    CONTRACT (documented, not enforced): run compaction from a single
    writer while the maintenance stream is STOPPED — plain parquet
    directories have no transaction log, so concurrent appends during
    the swap can be consumed-and-kept or missed-and-kept; a table
    format (Delta/Iceberg) is the real answer at warehouse scale."""
    import os
    import shutil

    merged = read_rollup_store(spark, out_dir).withColumn(
        "batch_id", F.lit(COMPACTED_BATCH_ID)
    )
    # snapshot the partitions being merged BEFORE the write: anything
    # appended later must survive the cleanup
    consumed = {
        d
        for d in os.listdir(out_dir)
        if d.startswith("batch_id=") and d != f"batch_id={COMPACTED_BATCH_ID}"
    }
    merged.write.mode("overwrite").option("partitionOverwriteMode", "dynamic").partitionBy(
        "batch_id"
    ).parquet(out_dir)
    # the consumed source partitions are now redundant with
    # batch_id=-1; remove exactly those directories (driver-side —
    # on a cluster this is the same fs.delete over the partition
    # paths a maintenance job would issue)
    for d in consumed:
        shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
