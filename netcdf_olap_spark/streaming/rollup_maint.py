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
``compact_rollup_store`` for its (single-writer) contract and the
manifest protocol that closes the crash-double-count window (r11
advice): a compaction first publishes an epoch-stamped manifest of
the partitions it will consume, then commits the merged data carrying
that epoch — readers honor the manifest ONLY when the compacted
partition's epoch matches, so a crash at any point leaves a store
that reads back exactly once (never doubled, never missing).

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

#: store-root manifest naming the partitions a compaction consumed;
#: the leading underscore hides it from Spark's file index
MANIFEST_NAME = "_compaction_manifest.json"

#: fragment schema, pinned: the main read must NOT infer (the
#: compacted partition's files carry an extra compaction_epoch column,
#: and inference could sample either file shape)
_STORE_SCHEMA = (
    "bucket_us long, event_type string, p_count long, "
    f"p_sum {_SUM_DEC}, p_min double, p_max double, batch_id int"
)


def _fs_for(spark: SparkSession, out_dir: str):
    """(Hadoop FileSystem, Path class) for the store — listing and
    deletes go through the FS API so non-local stores (s3a/hdfs) work
    the same as local paths (r11 advice)."""
    jvm = spark._jvm
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(out_dir).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path_cls


def _read_manifest(spark: SparkSession, out_dir: str) -> dict | None:
    import json

    fs, path_cls = _fs_for(spark, out_dir)
    target = path_cls(out_dir, MANIFEST_NAME)
    if not fs.exists(target):
        return None
    stream = fs.open(target)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def _write_manifest(spark: SparkSession, out_dir: str, manifest: dict) -> None:
    """Atomic publish: write to a temp name, then rename over the
    target (single-writer contract makes the delete+rename safe)."""
    import json

    fs, path_cls = _fs_for(spark, out_dir)
    target = path_cls(out_dir, MANIFEST_NAME)
    tmp = path_cls(out_dir, MANIFEST_NAME + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        out.close()
    fs.delete(target, False)
    if not fs.rename(tmp, target):
        raise IOError(f"could not publish {target}")


def _list_fragment_partitions(spark: SparkSession, out_dir: str) -> list[int]:
    """batch_id values of the non-compacted partition directories."""
    fs, path_cls = _fs_for(spark, out_dir)
    ids = []
    for status in fs.listStatus(path_cls(out_dir)):
        name = status.getPath().getName()
        if name.startswith("batch_id=") and status.isDirectory():
            bid = int(name.split("=", 1)[1])
            if bid != COMPACTED_BATCH_ID:
                ids.append(bid)
    return sorted(ids)


def _effective_consumed(spark: SparkSession, out_dir: str) -> list[int]:
    """Partitions a reader must SKIP: the manifest's consumed list,
    honored only when the compacted partition carries the manifest's
    epoch — i.e. only when the compaction that wrote the manifest
    actually committed its merged data.  A manifest whose merged
    write never landed (crash between publish and commit) is inert."""
    manifest = _read_manifest(spark, out_dir)
    if not manifest:
        return []
    fs, path_cls = _fs_for(spark, out_dir)
    cdir = f"{out_dir}/batch_id={COMPACTED_BATCH_ID}"
    if not fs.exists(path_cls(cdir)):
        return []
    from pyspark.errors import AnalysisException

    try:
        compacted = spark.read.parquet(cdir)
    except AnalysisException as e:
        # an empty/uncommitted -1 directory means the merged write
        # never landed → the manifest is inert; anything else is real
        if (e.getCondition() or "") in ("UNABLE_TO_INFER_SCHEMA", "PATH_NOT_FOUND"):
            return []
        raise
    if "compaction_epoch" not in compacted.columns:
        return []
    epoch = compacted.agg(F.max("compaction_epoch")).first()[0]
    if epoch != manifest.get("epoch"):
        return []
    return [int(b) for b in manifest.get("consumed", [])]


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
    share one parquet schema.

    Partitions named by an EFFECTIVE compaction manifest are excluded:
    if a compaction committed its merged data (epoch match) but died
    before removing the consumed source partitions, those partitions
    are redundant with batch_id=-1 and summing both would silently
    double-count (r11 advice) — the manifest makes the survivor set
    explicit instead of trusting the cleanup to have finished."""
    skip = _effective_consumed(spark, out_dir)
    df = spark.read.schema(_STORE_SCHEMA).parquet(out_dir)
    if skip:
        df = df.where(~F.col("batch_id").isin(skip))
    return df.groupBy("bucket_us", "event_type").agg(
        F.sum("p_count").alias("p_count"),
        F.sum("p_sum").cast(_SUM_DEC).alias("p_sum"),
        F.min("p_min").alias("p_min"),
        F.max("p_max").alias("p_max"),
    )


def _delete_partitions(spark: SparkSession, out_dir: str, batch_ids: list[int]) -> None:
    fs, path_cls = _fs_for(spark, out_dir)
    for bid in batch_ids:
        fs.delete(path_cls(out_dir, f"batch_id={bid}"), True)


def compact_rollup_store(spark: SparkSession, out_dir: str) -> None:
    """Rewrite fragments to one row per key — crash-safe exactly-once
    via the manifest protocol (every step is individually restartable
    and the store reads back correctly between any two steps):

    1. REPAIR: if the previous compaction's manifest is effective but
       its consumed partitions still exist (crash before cleanup),
       delete them now — they are redundant with batch_id=-1 and must
       be gone before the manifest is replaced.
    2. Publish a NEW manifest (epoch+1, the partitions about to be
       consumed) by atomic rename.  Inert until step 3 commits: the
       compacted partition does not carry this epoch yet, so readers
       ignore it — a crash here changes nothing.
    3. Commit the merged data into ``batch_id=-1`` (dynamic partition
       overwrite) with every row stamped ``compaction_epoch`` = the
       manifest's epoch.  The moment this commits, the manifest turns
       effective and readers skip the consumed partitions even though
       their directories still exist — the old double-count window.
    4. Delete the consumed partition directories (Hadoop FS API, so
       s3a/hdfs stores behave like local paths).  A crash mid-delete
       leaves extra directories the manifest already excludes.

    CONTRACT (documented, not enforced): run compaction from a single
    writer while the maintenance stream is STOPPED — plain parquet
    directories have no transaction log, so concurrent appends during
    the swap can be consumed-and-kept or missed-and-kept; a table
    format (Delta/Iceberg) is the real answer at warehouse scale."""
    manifest = _read_manifest(spark, out_dir)
    leftovers = _effective_consumed(spark, out_dir)
    if leftovers:
        _delete_partitions(spark, out_dir, leftovers)

    consumed = _list_fragment_partitions(spark, out_dir)
    if not consumed:
        return
    epoch = int(manifest["epoch"]) + 1 if manifest else 1
    # merged totals are computed BEFORE the new manifest is published
    # (a plan built now reads the pre-compaction file set; collectors
    # run inside the write below, after the manifest flips — but the
    # new manifest is inert until that very write commits, and the
    # file listing was already resolved at plan time)
    merged = (
        read_rollup_store(spark, out_dir)
        .withColumn("compaction_epoch", F.lit(epoch).cast("long"))
        .withColumn("batch_id", F.lit(COMPACTED_BATCH_ID))
        .localCheckpoint()  # materialize pre-publish: the write must
        # not re-list the store after the manifest/overwrite mutate it
    )
    _write_manifest(spark, out_dir, {"epoch": epoch, "consumed": consumed})
    merged.write.mode("overwrite").option("partitionOverwriteMode", "dynamic").partitionBy(
        "batch_id"
    ).parquet(out_dir)
    _delete_partitions(spark, out_dir, consumed)
