"""Streaming queries for the driver registry.

Each entry stages the sf's events table into time-ordered parquet
micro-batch files, runs the REAL Structured Streaming pipeline
(readStream → watermark → stateful op → memory sink, availableNow),
and returns the drained sink. Rows-only checks: seeded micro-batching
and watermark state aren't SQL-expressible, but batch equivalence is
proven in tests/test_streaming.py against the oracle-checked batch
twins (queries/events.py).

Output timestamps are emitted as integer microseconds (``unix_micros``
of window bounds over a ts derived from the nanos-integer column) —
window() bucket alignment is session-timezone-dependent for odd-offset
zones, so the checked surface sticks to integers like queries/events.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netcdf_olap_spark.session import load_events
from netcdf_olap_spark.streaming import ops
from netcdf_olap_spark.streaming.runner import events_file_stream, run_to_memory, stage_event_files
from netcdf_olap_spark.streaming.stateful import running_user_totals


def _staged_stream(spark: SparkSession, sf_dir: str, n_files: int = 4) -> tuple[DataFrame, str]:
    directory = tempfile.mkdtemp(prefix="noss_stream_")
    batch = load_events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    stage_event_files(batch, directory, n_files=n_files)
    return events_file_stream(spark, directory), directory


def stream_tumbling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows computed by a real
    micro-batched stream with a 30-minute watermark.

    Oracle-checked (not rows-only): ``window()`` buckets in
    instant-microsecond space (epoch-aligned integer arithmetic — no
    calendar), and the value sum rides a decimal accumulator, so the
    drained sink is bitwise-equal to the batch bucket formula
    ``ts_us - ts_us % 10min`` however the rows were micro-batched —
    proven against the batch twin in tests/test_streaming.py and
    against DuckDB by STREAM_TUMBLING_SQL."""
    stream, directory = _staged_stream(spark, sf_dir)
    try:
        out = run_to_memory(ops.tumbling_stats(stream, watermark="30 minutes"), "complete")
        return (
            out.select(
                F.unix_micros("win_start").alias("win_start_us"),
                "event_type",
                "n_events",
                "sum_value",
            )
            .orderBy("win_start_us", "event_type")
            .localCheckpoint()  # materialize before the staging dir is removed
        )
    finally:
        shutil.rmtree(directory, ignore_errors=True)


def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): final
    per-user running totals after replaying all micro-batches."""
    stream, directory = _staged_stream(spark, sf_dir)
    try:
        out = run_to_memory(running_user_totals(stream), "update")
        final = (
            out.groupBy("user_id")
            .agg(F.max(F.struct("n_events", "sum_value")).alias("s"))
            .select("user_id", F.col("s.n_events").alias("n_events"))
        )
        return final.orderBy("user_id").localCheckpoint()
    finally:
        shutil.rmtree(directory, ignore_errors=True)


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join run as a real two-stream pipeline:
    clicks ⋈ views within a 2-hour lookback, both sides
    watermarked (4 h) so join state is bounded; availableNow
    replay, append-mode memory sink, then the same per-user rollup as
    the oracle-checked batch twin (ev_interval_join — equality proven
    in tests/test_streaming.py)."""
    stream, directory = _staged_stream(spark, sf_dir)
    try:
        pairs = run_to_memory(ops.interval_join(stream, watermark="4 hours"), "append")
        gap_us = F.unix_micros("c_ts") - F.unix_micros("v_ts")
        return (
            pairs.groupBy(F.col("c_user").alias("user_id"))
            .agg(F.count(F.lit(1)).alias("n_pairs"), F.max(gap_us).alias("max_gap_us"))
            .orderBy("user_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(directory, ignore_errors=True)


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2: native ``session_window`` (30-minute gap) over a real
    micro-batched stream with watermark — the streaming form of the
    gaps-and-islands query (batch twin: ev_sessionize, oracle-checked;
    equivalence proven in tests/test_streaming.py). Session state
    merges across micro-batches and is bounded by the watermark."""
    stream, directory = _staged_stream(spark, sf_dir)
    try:
        out = run_to_memory(ops.session_stats(stream, gap="30 minutes", watermark="2 hours"), "complete")
        return (
            out.select(
                "user_id",
                F.unix_micros("first_ts").alias("session_start_us"),
                "n_events",
            )
            .orderBy("user_id", "session_start_us")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(directory, ignore_errors=True)


def stream_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming training-corpus ingestion: documents replayed as
    micro-batches (synthetic arrival ts, one minute per doc), quality
    gate + bounded-state fingerprint dedup
    (streaming/corpus.corpus_ingest). Output is the deterministic
    projection (fp, n_tokens) — which doc of a duplicate group arrives
    first is replay-dependent, the surviving fingerprint set is not.
    Batch equivalence proven in tests/test_streaming.py."""
    from netcdf_olap_spark.streaming.corpus import corpus_ingest
    from netcdf_olap_spark.streaming.runner import stage_files

    directory = tempfile.mkdtemp(prefix="noss_docstream_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id",
            F.timestamp_micros(F.col("doc_id") * 60_000_000).alias("ts"),
            "text",
        )
        stage_files(docs, directory, n_files=4, order_cols=["doc_id"])
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
            TimestampType,
        )

        schema = StructType(
            [
                StructField("doc_id", LongType()),
                StructField("ts", TimestampType()),
                StructField("text", StringType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(directory)
        )
        out = run_to_memory(corpus_ingest(stream, watermark="2 hours"), "append")
        return out.select("fp", "n_tokens").orderBy("fp").localCheckpoint()
    finally:
        shutil.rmtree(directory, ignore_errors=True)


def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min sketch: the (depth, bucket) counter table
    maintained as a streaming aggregation over replayed micro-batches
    — streaming state is the SKETCH, i.e. bounded at depth×4096 rows
    no matter how many events flow (the sketch's mergeability is what
    makes it a legal incremental aggregate). The final sketch then
    answers heavy-hitter queries: estimates for the top-10 true users,
    est ≥ true asserted in tests/test_streaming.py. rows-only: the
    micro-batched execution isn't SQL-expressible; sketch equality to
    the batch build is the pytest check."""
    from netcdf_olap_spark.operators import sketches

    stream, directory = _staged_stream(spark, sf_dir)
    try:
        probes = stream.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("depth"),
                            sketches.cm_bucket(F.col("user_id"), d, 3).alias("bucket"),
                        )
                        for d in range(3)
                    ]
                )
            ).alias("db")
        ).select("db.depth", "db.bucket")
        sk_stream = probes.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
        sketch = run_to_memory(sk_stream, "complete")

        batch = load_events(spark, sf_dir)
        top = (
            batch.groupBy(F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("true_cnt"))
            .orderBy(F.col("true_cnt").desc(), F.col("user_id"))
            .limit(10)
        )
        est = sketches.countmin_estimate(
            sketch, top.select("user_id"), "user_id", depth=3, hex_digits=3
        )
        return (
            top.join(est, "user_id")
            .select("user_id", "true_cnt", "cm_est")
            .orderBy(F.col("true_cnt").desc(), "user_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(directory, ignore_errors=True)


def stream_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming twin of ev_transition_matrix: per-user
    last-event-type carried in GroupState across micro-batches
    (applyInPandasWithState), pair stream aggregated after drain.
    rows-only; stream ≡ batch asserted in tests/test_streaming.py."""
    from netcdf_olap_spark.streaming.stateful import transition_pairs

    stream, directory = _staged_stream(spark, sf_dir)
    try:
        pairs = run_to_memory(transition_pairs(stream), "append")
        return (
            pairs.groupBy("prev_type", "next_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("prev_type", "next_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(directory, ignore_errors=True)


# DuckDB oracle for the streaming tumbling aggregation: the stream's
# window() start is the epoch-aligned 10-minute bucket of the event
# instant, so the batch bucket arithmetic IS the streaming result
# (same clock as queries/events.EV_TUMBLING_SQL, minus the exact
# count-distinct the streaming agg cannot express).
STREAM_TUMBLING_SQL = """
SELECT epoch_us(ts) - epoch_us(ts) % 600000000 AS win_start_us,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY win_start_us, event_type
"""


QUERIES = {
    "stream_tumbling_stats": (stream_tumbling_stats, STREAM_TUMBLING_SQL),
    "stream_running_totals": (stream_running_totals, None),
    "stream_interval_join": (stream_interval_join, None),
    "stream_sessionize": (stream_sessionize, None),
    "stream_corpus_ingest": (stream_corpus_ingest, None),
    "stream_heavy_hitters": (stream_heavy_hitters, None),
    "stream_transition_counts": (stream_transition_counts, None),
}
