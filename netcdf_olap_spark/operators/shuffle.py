"""Shuffle engineering: bucketing for co-located joins, salting for
skewed keys (SURVEY.md §4; the 100 TB playbook the reference never
needed at one task per variable, Gddp.scala:164-165).

- **Bucketing**: write both join sides bucketed+sorted by the join
  key; Catalyst then plans the equi-join with NO Exchange on either
  side — at 100 TB that's the difference between a full-cluster
  shuffle of the fact table per query and none. The same layout
  serves repeated grid⋈coords joins (the engine's canonical join).
- **Salting**: a hot key (one giant customer, one degenerate shingle)
  overflows its shuffle partition. Salt the probe side with a
  row-derived integer in [0, n) and replicate the build side n ways →
  the hot key spreads over n tasks. AQE's skew-join split handles
  moderate skew automatically (enabled in session.py); explicit
  salting is for the pathological tail and for deterministic layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.
    Bucket count must match across co-joined tables; choose it so one
    bucket of the biggest table fits an executor core's memory."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables — shuffle-free by layout."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def with_salt(df: DataFrame, entropy_col: str, n: int, name: str = "_salt") -> DataFrame:
    """Probe side: deterministic salt in [0, n) derived from a
    row-level column (NOT the join key — a hot key must land on many
    salts, so the entropy source is any column that varies within the
    key group, e.g. the row's primary key)."""
    return df.withColumn(name, F.pmod(F.xxhash64(F.col(entropy_col)), F.lit(n)).cast("int"))


def replicated(df: DataFrame, n: int, name: str = "_salt") -> DataFrame:
    """Build side: one copy per salt value."""
    return df.withColumn(name, F.explode(F.array(*[F.lit(i) for i in range(n)])))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    entropy_col: str,
    n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: left salted by ``entropy_col``, right
    replicated n×, join on (keys + salt). Results are identical to the
    plain join (asserted in tests); shuffle distribution of any single
    key improves n-fold at the cost of replicating the (smaller) right
    side n times."""
    sl = with_salt(left, entropy_col, n)
    sr = replicated(right, n)
    return sl.join(sr, on + ["_salt"], how).drop("_salt")
