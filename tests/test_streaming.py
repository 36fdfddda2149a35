"""Structured Streaming (netcdf_olap_spark/streaming/): every op is a
source-agnostic transformation, so each streaming run (file source →
micro-batches → memory sink) must equal the same transformation
applied to the batch read of the same rows — plus watermark
late-data-drop semantics and applyInPandasWithState state carryover.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.session import load_events
from netcdf_olap_spark.streaming import ops
from netcdf_olap_spark.streaming.runner import (
    EVENTS_SCHEMA,
    events_file_stream,
    run_to_memory,
    stage_event_files,
)
from netcdf_olap_spark.streaming.stateful import running_user_totals
from tests.conftest import SF_SMALL

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """events@sf0.001 split into 4 in-time-order parquet files, so the
    file stream replays them as ordered micro-batches."""
    directory = str(tmp_path_factory.mktemp("evstream"))
    batch = load_events(spark, SF_DIR).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    stage_event_files(batch, directory, n_files=4)
    # re-read the staged files so batch and stream see byte-identical input
    rebatch = spark.read.schema(EVENTS_SCHEMA).parquet(directory)
    return directory, rebatch


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_tumbling_stream_equals_batch(spark, staged):
    directory, batch = staged
    stream = events_file_stream(spark, directory)
    got = run_to_memory(ops.tumbling_stats(stream, watermark="30 minutes"), "complete")
    want = ops.tumbling_stats(batch)
    assert _rows(got, "win_start", "event_type") == _rows(want, "win_start", "event_type")


def test_sliding_stream_equals_batch(spark, staged):
    directory, batch = staged
    stream = events_file_stream(spark, directory)
    got = run_to_memory(ops.sliding_counts(stream, watermark="30 minutes"), "complete")
    want = ops.sliding_counts(batch)
    assert _rows(got, "win_start", "event_type") == _rows(want, "win_start", "event_type")


def test_session_stream_equals_batch(spark, staged):
    directory, batch = staged
    stream = events_file_stream(spark, directory)
    got = run_to_memory(ops.session_stats(stream, watermark="2 hours"), "complete")
    want = ops.session_stats(batch)
    assert _rows(got, "user_id", "first_ts") == _rows(want, "user_id", "first_ts")


def test_session_matches_gaps_and_islands(spark, staged):
    """session_window == the relational gaps-and-islands formulation
    (queries/events.py ev_sessionize shape): same session count and
    total events per user. Boundary note: an exactly-gap-sized silence
    starts a new session in both (window is [start, last+gap))."""
    _, batch = staged
    sw = (
        ops.session_stats(batch, gap="30 minutes")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gi = (
        batch.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "is_new",
            F.when(F.col("prev").isNull(), 1)
            .when(F.col("ts").cast("double") - F.col("prev").cast("double") >= 1800.0, 1)
            .otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("is_new").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )
    assert _rows(sw, "user_id") == _rows(gi, "user_id")


def test_dedup_within_watermark(spark, staged):
    directory, batch = staged
    stream = events_file_stream(spark, directory)
    # watermark larger than the whole data span → no key state is ever
    # evicted → exactly one (first-arrival) row per key. With a short
    # watermark re-emission after eviction is CORRECT behavior (that's
    # the "within watermark" contract), checked below.
    got = run_to_memory(ops.keyed_dedup(stream, watermark="365 days"), "append")
    keys = {(r["user_id"], r["event_type"]) for r in got.collect()}
    want = {
        (r["user_id"], r["event_type"])
        for r in batch.select("user_id", "event_type").distinct().collect()
    }
    assert keys == want
    assert got.count() == len(want)

    stream2 = events_file_stream(spark, directory)
    got2 = run_to_memory(ops.keyed_dedup(stream2, watermark="30 minutes"), "append")
    # short watermark: still covers every key, never more rows than the
    # un-deduped input, and at least the one-per-key floor
    assert {(r["user_id"], r["event_type"]) for r in got2.collect()} == want
    assert len(want) <= got2.count() < batch.count()


def test_stream_static_join_equals_batch(spark, staged):
    """Stream-static dimension enrichment: the stream side joins the
    static customer dim per micro-batch; totals equal the batch join."""
    directory, batch = staged
    dim = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = events_file_stream(spark, directory)
    enriched = ops.enrich_with_dim(stream, dim)
    agg = enriched.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    got = run_to_memory(agg, "complete")
    want = ops.enrich_with_dim(batch, dim).groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert _rows(got, "c_mktsegment") == _rows(want, "c_mktsegment")


def test_stateful_running_totals(spark, staged):
    directory, batch = staged
    stream = events_file_stream(spark, directory)
    got = run_to_memory(running_user_totals(stream), "update")
    # update mode appends one row per (user, batch); the final state is
    # the row with the max n_events per user
    final = (
        got.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sum_value")).alias("s"))
        .select("user_id", F.col("s.n_events").alias("n"), F.col("s.sum_value").alias("sv"))
    )
    want = batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
    )
    g = {r["user_id"]: (r["n"], r["sv"]) for r in final.collect()}
    w = {r["user_id"]: (r["n"], r["sv"]) for r in want.collect()}
    assert set(g) == set(w)
    for uid in w:
        assert g[uid][0] == w[uid][0]
        assert g[uid][1] == pytest.approx(w[uid][1])
    # state really carried across micro-batches: some user got updates
    # in more than one batch
    assert got.count() > final.count()


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode tumbling agg with a 10-minute watermark: a row
    arriving two micro-batches late, with event time far behind the
    watermark, must not be counted (SURVEY.md §2.9: 'late data beyond
    watermark dropped')."""
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def f(i):
        return str(tmp_path / f"part-{i:04d}.parquet")

    def write(path, rows, mtime):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path, coerce_timestamps="us")
        os.utime(path, (mtime, mtime))

    # batch 1: two rows in window [00:00, 10:00), one at 00:30 advancing
    # max event time to 30 min (→ watermark 20 min once in effect)
    write(
        f(0),
        [
            (1, t0 + dt.timedelta(minutes=1), 1, "a", 1.0, "{}"),
            (2, t0 + dt.timedelta(minutes=2), 1, "a", 1.0, "{}"),
            (3, t0 + dt.timedelta(minutes=30), 1, "a", 1.0, "{}"),
        ],
        1_700_000_000,
    )
    # batch 2: fresh row only — ensures batch 1's watermark is in
    # effect (and [00:00, 10:00) finalized+evicted) before the late row
    # arrives. Spark's guarantee is one-sided: data later than the
    # in-effect watermark MAY still be accepted in the very batch that
    # advances it, so the late row must come ≥2 batches after the
    # advance to be deterministically dropped.
    write(f(1), [(4, t0 + dt.timedelta(minutes=55), 1, "a", 1.0, "{}")], 1_700_000_100)
    # batch 3: the LATE row (event time 00:03, far behind the watermark)
    # plus a fresh row
    write(
        f(2),
        [
            (5, t0 + dt.timedelta(minutes=3), 1, "a", 99.0, "{}"),
            (6, t0 + dt.timedelta(minutes=65), 1, "a", 1.0, "{}"),
        ],
        1_700_000_200,
    )

    stream = events_file_stream(spark, str(tmp_path))
    got = run_to_memory(ops.tumbling_stats(stream, watermark="10 minutes"), "append")
    out = {r["win_start"]: (r["n_events"], r["sum_value"]) for r in got.collect()}
    assert t0 in out, f"finalized window missing: {out}"
    # 2 rows, not 3 — the late event_id=4 was dropped, its 99.0 not summed
    assert out[t0] == (2, 2.0)


def test_interval_join_stream_equals_batch(spark, staged):
    directory, batch = staged
    stream = events_file_stream(spark, directory)
    got = run_to_memory(ops.interval_join(stream, watermark="4 hours"), "append")
    want = ops.interval_join(batch)
    assert got.count() > 0
    assert _rows(got, "click_id", "view_id") == _rows(want, "click_id", "view_id")


def test_corpus_ingest_stream_equals_batch(spark, tmp_path):
    """Streaming corpus ingestion (quality gate + bounded-state
    fingerprint dedup) keeps exactly the fingerprint set the batch
    operator keeps; duplicate docs collapse to one survivor."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from netcdf_olap_spark.streaming.corpus import corpus_ingest
    from netcdf_olap_spark.streaming.runner import stage_files

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),                     # exact duplicate of 1 (same batch)
        (3, base.upper()),             # casefolds to same fingerprint
        (4, "a distinct document with more than ten whitespace tokens in it"),
        (5, "too short"),              # fails the quality gate
        (6, base + " tail"),           # distinct fingerprint
        (7, base),                     # duplicate arriving micro-batches later
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.timestamp_micros(F.col("doc_id") * 60_000_000).alias("ts"), "text"
    )
    directory = str(tmp_path / "docstream")
    stage_files(docs, directory, n_files=3, order_cols=["doc_id"])
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
    got = run_to_memory(corpus_ingest(stream, watermark="2 hours"), "append")
    want = corpus_ingest(spark.read.schema(schema).parquet(directory))
    assert _rows(got.select("fp", "n_tokens"), "fp") == _rows(
        want.select("fp", "n_tokens"), "fp"
    )
    # 1/2/3/7 share one fingerprint; 5 is gated out -> 3 survivors
    assert got.count() == 3


def test_parquet_sink_checkpoint_is_exactly_once(spark, tmp_path):
    """Resuming against the same checkpoint must process nothing
    already committed; a file arriving between runs must be processed
    exactly once."""
    from netcdf_olap_spark.streaming.runner import run_to_parquet

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch = load_events(spark, SF_DIR).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    first, second = batch.where("event_id % 2 = 0"), batch.where("event_id % 2 = 1")
    stage_event_files(first, src, n_files=2)

    def run():
        run_to_parquet(events_file_stream(spark, src), out, ckpt)
        return spark.read.parquet(out).count()

    n1 = run()
    assert n1 == first.count()
    # resume with nothing new: no reprocessing, no duplicates
    assert run() == n1
    # stage the second half into the same dir; only IT is processed
    import os as _os
    stage_event_files(second, src + "_tmp", n_files=1)
    for f in _os.listdir(src + "_tmp"):
        _os.rename(_os.path.join(src + "_tmp", f), _os.path.join(src, "late_" + f))
    n3 = run()
    assert n3 == batch.count()
    # every event id appears exactly once end-to-end
    ids = spark.read.parquet(out).groupBy("event_id").count().where("count > 1").count()
    assert ids == 0


def test_incremental_rollup_maintenance_equals_batch(spark, staged, tmp_path):
    """foreachBatch continuous-aggregate upkeep: partials appended per
    micro-batch, merged on read, must equal the one-shot batch rollup;
    compaction must not change any answer."""
    from netcdf_olap_spark.operators.rollup import build_rollup
    from netcdf_olap_spark.streaming.rollup_maint import (
        compact_rollup_store,
        read_rollup_store,
        start_rollup_maintenance,
    )

    directory, rebatch = staged
    with_us = lambda df: df.withColumn("ts_us", F.unix_micros("ts"))  # noqa: E731
    stream = events_file_stream(spark, directory)
    out = str(tmp_path / "rollup_store")
    q = start_rollup_maintenance(with_us(stream), out, str(tmp_path / "ckpt"))
    q.awaitTermination()

    want = _rows(build_rollup(with_us(rebatch)), "bucket_us", "event_type")
    got = _rows(read_rollup_store(spark, out), "bucket_us", "event_type")
    assert got == want
    # fragments exist (incremental appends), then compaction preserves answers
    n_files = len(spark.read.parquet(out).inputFiles())
    compact_rollup_store(spark, out)
    assert _rows(read_rollup_store(spark, out), "bucket_us", "event_type") == want
    assert len(spark.read.parquet(out).inputFiles()) <= n_files


def test_streaming_countmin_equals_batch_sketch(spark, staged):
    """The streaming count-min aggregation's final state equals the
    batch-built sketch of the same rows (bounded-state mergeable
    aggregate), and heavy-hitter estimates are one-sided."""
    from netcdf_olap_spark.operators import sketches

    directory, rebatch = staged
    stream = events_file_stream(spark, directory)

    def to_probes(df):
        return df.select(
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

    streamed = run_to_memory(
        to_probes(stream).groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt")),
        "complete",
    )
    batch_sk = sketches.countmin_build(
        rebatch.select(F.col("user_id").alias("item")), "item", depth=3, hex_digits=3
    )
    a = {(r["depth"], r["bucket"]): r["cnt"] for r in streamed.collect()}
    b = {(r["depth"], r["bucket"]): r["cnt"] for r in batch_sk.collect()}
    assert a == b

    true = rebatch.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = sketches.countmin_estimate(
        streamed, true.select("user_id"), "user_id", depth=3, hex_digits=3
    )
    for r in true.join(est, "user_id").collect():
        assert r["cm_est"] >= r["true_cnt"]


def test_transition_pairs_stream_equals_batch_lag(spark, staged):
    """Stateful last-type carry across micro-batches reproduces the
    batch LAG transition counts exactly."""
    from pyspark.sql.window import Window

    from netcdf_olap_spark.streaming.stateful import transition_pairs

    directory, rebatch = staged
    stream = events_file_stream(spark, directory)
    streamed = (
        run_to_memory(transition_pairs(stream), "append")
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        rebatch.select(F.lag("event_type").over(w).alias("prev_type"), "event_type")
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = {(r["prev_type"], r["next_type"]): r["n"] for r in streamed.collect()}
    b = {(r["prev_type"], r["next_type"]): r["n"] for r in batch.collect()}
    assert a == b


def test_transition_pairs_multichunk_groups(spark, staged):
    """A group whose micro-batch rows span multiple Arrow chunks must
    still pair in global (ts, event_id) order — forced by shrinking
    maxRecordsPerBatch far below group size (regression: per-chunk
    sorting diverged from the batch LAG on cross-chunk boundaries)."""
    from pyspark.sql.window import Window

    from netcdf_olap_spark.streaming.stateful import transition_pairs

    directory, rebatch = staged
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, "10000")
    spark.conf.set(key, "5")
    try:
        stream = events_file_stream(spark, directory)
        streamed = (
            run_to_memory(transition_pairs(stream), "append")
            .groupBy("prev_type", "next_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got = {(r["prev_type"], r["next_type"]): r["n"] for r in streamed.collect()}
    finally:
        spark.conf.set(key, old)

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        rebatch.select(F.lag("event_type").over(w).alias("prev_type"), "event_type")
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["prev_type"], r["next_type"]): r["n"] for r in batch.collect()}
    assert got == want


def _doc_stream(spark, tmp_path, rows, n_files=3, minutes_apart=1):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from netcdf_olap_spark.streaming.runner import stage_files

    base_us = 1_704_067_200_000_000
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        F.timestamp_micros(F.lit(base_us) + F.col("doc_id") * 60_000_000 * minutes_apart).alias("ts"),
        "text",
    )
    directory = str(tmp_path / "neardup_stream")
    stage_files(docs, directory, n_files=n_files, order_cols=["doc_id"])
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
    return docs, stream


def test_near_dup_filter_stream_equals_batch(spark, tmp_path):
    """Band-ownership stream (full-span TTL), reduced per doc, equals
    the deterministic min-owner batch twin on real documents —
    including near-dup groups split across micro-batches."""
    from netcdf_olap_spark.streaming.corpus import near_dup_filter

    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .limit(300)
        .select(
            "doc_id",
            F.timestamp_micros(F.lit(1_704_067_200_000_000) + F.col("doc_id") * 60_000_000).alias("ts"),
            "text",
        )
    )
    from netcdf_olap_spark.streaming.runner import stage_files

    directory = str(tmp_path / "nd_real")
    stage_files(docs, directory, n_files=4, order_cols=["doc_id"])
    from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

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
    from netcdf_olap_spark.streaming.corpus import near_dup_reduce

    owned = run_to_memory(near_dup_filter(stream, watermark="2 hours", state_ttl_ms=10**12), "append")
    got = near_dup_reduce(owned)
    want = near_dup_filter(docs)
    assert _rows(got, "doc_id") == _rows(want, "doc_id")
    # exact duplicates exist in the fixture corpus → at least one drop
    assert got.where(~F.col("is_kept")).count() > 0


def test_near_dup_filter_state_horizon_evicts(spark, tmp_path):
    """Bounded state, pinned: with a short TTL, a near-dup arriving
    AFTER the horizon re-owns its band keys (the old owner's state was
    evicted); with a full-span TTL it owns none. This is the
    recent-horizon contract that keeps state finite on an unbounded
    stream."""
    from netcdf_olap_spark.streaming.corpus import near_dup_filter

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        (0, text),
        (1, "an entirely different document about spark streaming state stores"),
        (300, "a third unrelated document mentioning watermarks and timeouts only"),
        (400, "a fourth unrelated document that advances the event time watermark"),
        (500, text),
    ]
    # one doc per micro-batch: event-time timeouts fire only for keys
    # receiving NO data in a batch, so the eviction of doc 0's keys
    # needs a quiet batch (doc 400's) after the watermark passes the
    # TTL and before the near-dup (doc 500) arrives

    def kept(ttl_ms):
        docs, stream = _doc_stream(spark, tmp_path, rows, n_files=5)
        owned = run_to_memory(
            near_dup_filter(stream, watermark="2 hours", state_ttl_ms=ttl_ms), "append"
        )
        import shutil as _sh

        _sh.rmtree(str(tmp_path / "neardup_stream"), ignore_errors=True)
        from netcdf_olap_spark.streaming.corpus import near_dup_reduce

        return {r.doc_id: r.n_owned for r in near_dup_reduce(owned).collect()}

    # doc 500 arrives 500 min after doc 0; 2 h TTL < 500 min → evicted
    # during doc 400's quiet batch
    short = kept(2 * 3600 * 1000)
    assert short[500] == 8  # re-owns every band: state about doc 0 is gone
    full = kept(10**12)
    assert full[500] == 0  # full history: doc 0 still owns all 8 bands
    assert short[0] == full[0] == 8


def test_compact_into_fingerprint_index_lifetime_dedup(spark, tmp_path):
    """Horizon survivors compact against the at-rest fingerprint
    index: cycle 2 drops docs whose fingerprint cycle 1 already
    indexed (the cross-horizon duplicates the stream state cannot
    see), keeps genuinely new ones, and appends them for cycle 3."""
    from netcdf_olap_spark.streaming.corpus import compact_into_fingerprint_index, corpus_ingest

    idx = str(tmp_path / "fp_index")
    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts1 = [(1, base), (2, "a distinct document with more than ten whitespace tokens in it")]
    texts2 = [
        (10, base),                       # dup of cycle-1 doc 1 — horizon state is gone
        (11, "another brand new document carrying plenty of whitespace separated tokens"),
    ]

    def cycle(rows):
        docs = spark.createDataFrame(rows, "doc_id long, text string").select(
            "doc_id", F.timestamp_micros(F.lit(1_704_067_200_000_000) + F.col("doc_id") * 60_000_000).alias("ts"), "text"
        )
        return compact_into_fingerprint_index(spark, corpus_ingest(docs), idx)

    kept1 = cycle(texts1)
    assert {r.doc_id for r in kept1.collect()} == {1, 2}
    kept2 = cycle(texts2)
    assert {r.doc_id for r in kept2.collect()} == {11}
    # the index now holds all three distinct fingerprints exactly once
    idx_df = spark.read.parquet(idx)
    assert idx_df.count() == idx_df.select("fp").distinct().count() == 3
    # cycle 3 replaying everything drops it all
    kept3 = cycle(texts1 + texts2)
    assert kept3.count() == 0


def test_compact_dedupes_within_one_survivors_batch(spark, tmp_path):
    """A drained survivors span can EXCEED the stream's watermark
    horizon — the same fp then appears twice within ONE compaction
    batch and neither copy is in the index yet. The compaction must
    keep only the first arrival (min ts, doc_id), not both."""
    from netcdf_olap_spark.streaming.corpus import compact_into_fingerprint_index

    idx = str(tmp_path / "fp_index_intra")
    survivors = spark.createDataFrame(
        [
            (3, 300, "aa11"),  # later arrival of fp aa11 — must drop
            (1, 100, "aa11"),  # first arrival — must keep
            (2, 200, "bb22"),
        ],
        "doc_id long, ts long, fp string",
    )
    kept = compact_into_fingerprint_index(spark, survivors, idx)
    assert {(r.doc_id, r.fp) for r in kept.collect()} == {(1, "aa11"), (2, "bb22")}
    idx_df = spark.read.parquet(idx)
    assert idx_df.count() == idx_df.select("fp").distinct().count() == 2


def test_rollup_store_replay_idempotent_and_post_compaction_append(spark, staged, tmp_path):
    """The two review-found failure modes: (a) a REPLAYED micro-batch
    (foreachBatch is at-least-once) must not double-count — the
    batch_id partition overwrite makes the rerun a no-op; (b) a fresh
    append AFTER compaction must read back cleanly (one parquet
    schema) and merge with the compacted row."""
    from netcdf_olap_spark.operators.rollup import build_rollup
    from netcdf_olap_spark.streaming.rollup_maint import (
        compact_rollup_store,
        read_rollup_store,
        write_rollup_batch,
    )

    _directory, rebatch = staged
    with_us = rebatch.withColumn("ts_us", F.unix_micros("ts"))
    half_a = with_us.where("event_id % 2 = 0")
    half_b = with_us.where("event_id % 2 = 1")
    out = str(tmp_path / "store")

    write_rollup_batch(half_a, out, 0)
    write_rollup_batch(half_b, out, 1)
    want = _rows(build_rollup(with_us), "bucket_us", "event_type")
    assert _rows(read_rollup_store(spark, out), "bucket_us", "event_type") == want

    # (a) replay batch 1 — identical result, no double count
    write_rollup_batch(half_b, out, 1)
    assert _rows(read_rollup_store(spark, out), "bucket_us", "event_type") == want

    # (b) compact, then append a new batch: readable + correct
    compact_rollup_store(spark, out)
    write_rollup_batch(half_b, out, 2)  # half_b arrives again as NEW data
    with_twice = with_us.unionByName(half_b)
    want2 = _rows(build_rollup(with_twice), "bucket_us", "event_type")
    assert _rows(read_rollup_store(spark, out), "bucket_us", "event_type") == want2
