"""Stream construction + micro-batch execution helpers.

The file source is the cluster-shape stand-in for Kafka here: each
parquet file is a micro-batch unit (``maxFilesPerTrigger=1`` →
watermark advances between batches, which is what makes late-data
semantics observable in tests). ``run_to_memory`` drives a stream to
completion with ``trigger(availableNow=True)`` — process everything
pending, then stop — and returns the collected sink table.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_file_stream(
    spark: SparkSession, directory: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """readStream over a directory of events parquet files (file
    source requires a user schema — schema inference on an unbounded
    source is a foot-gun Spark rightly disables by default)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(directory)


def stage_event_files(df: DataFrame, directory: str, n_files: int, order_col: str = "ts") -> list[str]:
    """Events-shaped wrapper over ``stage_files``."""
    return stage_files(df, directory, n_files, [order_col, "event_id"])


def stage_files(
    df: DataFrame,
    directory: str,
    n_files: int,
    order_cols: list[str],
    files_per_batch: int = 1,
) -> list[str]:
    """Split a batch DataFrame into ``n_files`` logical micro-batches
    in ``order_cols`` order (batch i = i-th slice) so the file stream
    replays them as in-order micro-batches. Returns the file paths in
    replay order (mtimes are staggered per LOGICAL batch — the file
    source orders by modification time).

    ``files_per_batch`` splits each logical batch into that many
    subfiles sharing one mtime; readers then set ``maxFilesPerTrigger
    = files_per_batch`` so one trigger still consumes exactly one
    logical batch — but the batch's scan stage gets files_per_batch
    INPUT TASKS instead of one.  The r10 drain decomposition measured
    this as the dominant fixable cost: the file stream source gives
    one partition per file, so with single-file batches every
    map-side expression (minhash, CDC chunking) ran on ONE core per
    trigger — 201 s → 111 s at sf1.0 just from 4-way maps.  Batch
    MEMBERSHIP (and thus every batch-deterministic reduction) is
    unchanged; only intra-batch parallelism changes."""
    import pyarrow.parquet as pq

    os.makedirs(directory, exist_ok=True)
    # Arrow end to end — a pandas hop would cast µs→ns and overflow
    # on far-future timestamps (synthetic arrival stamps over
    # amplified doc_ids reach past pandas' ns ceiling of ~year 2262;
    # Spark itself is µs int64 and handles them fine)
    table = df.toArrow().sort_by([(c, "ascending") for c in order_cols])
    n = table.num_rows
    paths = []
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        batch = table.slice(lo, hi - lo)
        bn = batch.num_rows
        for j in range(files_per_batch):
            blo, bhi = j * bn // files_per_batch, (j + 1) * bn // files_per_batch
            chunk = batch.slice(blo, bhi - blo)
            path = os.path.join(directory, f"part-{i:04d}-{j:02d}.parquet")
            # µs coercion retained for any caller handing in ns data:
            # Spark's vectorized reader refuses ns against TimestampType
            pq.write_table(chunk, path, coerce_timestamps="us")
            os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
            paths.append(path)
    return paths


def auto_state_partitions(
    spark: SparkSession,
    staged_dir: str,
    target_bytes: int = 32 << 20,
    floor: int = 8,
) -> int:
    """SCALE-ADAPTIVE state width for a staged-replay drain (guide §2:
    derive partitioning from input size, never a constant tuned to one
    machine): one state partition per ``target_bytes`` of staged input,
    clamped to [floor, session shuffle width].

    Why: streaming state commits cost one store open+commit PER
    PARTITION PER TRIGGER (×4 stores for a stream-stream join), so a
    multi-trigger drain over megabytes of replay at the cluster-wide
    shuffle width is almost pure fixed cost — the r13 heavy-hitters
    measurement (64→8 partitions: 7-8.6 s → 2.5-2.9 s, values
    identical) generalized.  At real scale the staged volume pushes
    the width back to the session default, so this never caps a
    cluster.  Results are partition-count-invariant (all drained
    reductions are batching- and partitioning-deterministic — pinned
    by the stream≡batch tests and the DuckDB oracles)."""
    import math

    total = 0
    for root, _dirs, files in os.walk(staged_dir):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                continue
    cluster = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(floor, min(cluster, math.ceil(total / float(target_bytes))))


def run_to_memory(
    stream_df: DataFrame,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame with availableNow + a memory sink;
    block until drained; return the sink contents as a batch
    DataFrame.

    ``state_partitions`` sizes the stateful-operator partition count
    (streaming state partitioning = ``spark.sql.shuffle.partitions``
    captured at query start; Spark clones the session state into the
    stream, so the temporary set here never leaks into concurrent
    batch work after start() returns).  Size it to the STATE, not the
    cluster: a bounded-state aggregation (a sketch capped at
    depth×width rows) pays one state-store open+commit per partition
    per trigger, so running it at the cluster-wide shuffle width is
    pure fixed cost — measured 64→8 partitions: 7-8.6 s → 2.5-2.9 s
    per 4-trigger drain at sf0.1, values identical (the map-side
    partial aggregation still uses every input core; only the
    final merge into state narrows).  Leave None for state that
    grows with keys (sessionization, per-user dedup ownership),
    where the default width is the scale-out path.

    CONCURRENCY CAVEAT (r13 advisor): the narrowed partition count is
    applied by temporarily setting the session-global
    ``spark.sql.shuffle.partitions`` for the set→start window (Spark
    clones session state into the stream at start; there is no
    per-stream option for this conf).  A batch/stream query STARTED
    concurrently on the same session during that window would inherit
    the narrowed width — callers must not race query starts against
    ``run_to_memory`` with ``state_partitions`` set.  All current
    callers are serial registry queries."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    spark = stream_df.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(int(state_partitions)))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    q.awaitTermination()
    return spark.table(name)


def run_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Execute a streaming DataFrame with availableNow into a parquet
    sink with a durable checkpoint — the production write path.

    The checkpoint (WAL + source offsets + sink commit log) is what
    makes the pipeline exactly-once end-to-end: a resumed query
    replays nothing already committed and picks up only files that
    arrived since (proven in tests/test_streaming.py by re-running
    against the same checkpoint). On a cluster, put both dirs on
    shared storage; the parquet sink's _spark_metadata commit log is
    what readers trust, so partially-written files from a crash are
    invisible."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
