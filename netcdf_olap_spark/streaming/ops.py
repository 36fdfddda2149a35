"""Source-agnostic event-time transformations.

Each function takes any events-shaped DataFrame — batch
(``spark.read``) or streaming (``spark.readStream``) — with columns
``(event_id, ts: timestamp, user_id, event_type, value)`` and returns
the transformed DataFrame. Batch twins with DuckDB oracles live in
queries/events.py (integer-µs bucket math); these are the
Spark-native ``window``/``session_window`` forms, equal modulo
representation (window struct vs µs bucket start) — proven equal in
tests/test_streaming.py.

Watermarks: callers pass ``watermark=None`` for batch runs (a
watermark on a batch DataFrame is legal but pointless) or e.g.
``"30 minutes"`` on streams — late rows beyond it are dropped from
windowed state, bounding state size on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, watermark: str | None) -> DataFrame:
    return df.withWatermark("ts", watermark) if watermark else df


def tumbling_stats(df: DataFrame, size: str = "10 minutes", watermark: str | None = None) -> DataFrame:
    """Tumbling event-time windows: count + sum(value) per
    (window, event_type). Exact count-distinct is unsupported in
    streaming aggs, so user reach is approx_count_distinct (the same
    mergeable-sketch tradeoff the reference makes for its histogram,
    Gddp.scala:230). sum_value goes through a decimal cast
    (functions/deterministic.py rationale): the decimal accumulator is
    exact, so the streaming sum is bitwise-equal to the batch twin's
    and to the DuckDB oracle regardless of micro-batch arrival order —
    what makes stream_tumbling_stats hash-checkable, not rows-only."""
    return (
        _maybe_watermark(df, watermark)
        .groupBy(F.window("ts", size).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def sliding_counts(
    df: DataFrame,
    size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows: every event lands in size/slide windows."""
    return (
        _maybe_watermark(df, watermark)
        .groupBy(F.window("ts", size, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events")
    )


def session_stats(df: DataFrame, gap: str = "30 minutes", watermark: str | None = None) -> DataFrame:
    """Per-user session windows (a >gap silence closes the session) —
    the built-in ``session_window`` form of the gaps-and-islands query
    (queries/events.py ev_sessionize)."""
    return (
        _maybe_watermark(df, watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select("user_id", "first_ts", "last_ts", "n_events")
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: str = "user_id", how: str = "left") -> DataFrame:
    """Stream-static join: each micro-batch joins against the (static,
    re-read per batch) dimension — broadcast by hint since dimensions
    are small relative to the stream. Works identically on a batch
    frame (tests prove equivalence)."""
    from pyspark.sql.functions import broadcast

    return events.join(broadcast(dim), on, how)


def keyed_dedup(df: DataFrame, watermark: str | None = None) -> DataFrame:
    """First-arrival dedup per (user_id, event_type).

    Streaming: ``dropDuplicatesWithinWatermark`` keeps per-key state
    only until the watermark passes — bounded state, the
    production-shape dedup for unbounded streams (batch twin:
    queries/events.py ev_dedup_first, which is deterministic min-by
    instead of arrival-order)."""
    if watermark:
        return df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["user_id", "event_type"]
        )
    return df.dropDuplicates(["user_id", "event_type"])


def interval_join(df: DataFrame, gap: str = "2 hours", watermark: str | None = None) -> DataFrame:
    """Stream-stream interval join: for every click, the same user's
    views within the preceding ``gap``. The canonical two-stream join
    (SURVEY.md §2.3 interval-join family on the streaming axis).

    Both sides carry the watermark on streams; together with the
    time-bound join condition Spark derives a state-retention horizon
    per side (a view is held only until watermark > view.ts + gap),
    so join state is bounded on an unbounded stream — the property
    that makes this run forever on a cluster. Inner-join matches emit
    immediately in append mode (no watermark hold on output).

    Works identically on batch frames with ``watermark=None`` (the
    DuckDB-checked twin: queries/events.py ev_interval_join).
    """
    clicks = df.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    views = df.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    if watermark:
        clicks = clicks.withWatermark("c_ts", watermark)
        views = views.withWatermark("v_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("c_ts"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {gap}"))
    )
    return clicks.join(views, cond)
