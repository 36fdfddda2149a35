"""Count-min sketch: mergeable approximate frequency counting.

Complements the other mergeable sketches in the engine
(``percentile_approx`` partial+final — SURVEY.md §2.4 A1/O8;
HLL rollup — queries/maintenance agg_hll_mergeable): a fixed-size
table of (depth × width) counters supporting point-frequency
estimates with one-sided error (estimate ≥ truth, over-count bounded
by ~N·e/width per row with probability 1-e^-depth).

Scale design:

- Building the sketch is ONE aggregation: explode items → d bucket
  keys each → groupBy (depth, bucket) count. Map-side partial
  aggregation collapses every partition to ≤ depth·width rows before
  the shuffle, so shuffle volume is bounded by the sketch size —
  independent of corpus size. The result (≤ depth·16^hex_digits
  rows) is broadcastable by construction; estimating frequencies for
  a candidate set is a broadcast join however large the corpus was.
- Sketches built on disjoint partitions/days merge by summing
  matching counters (groupBy depth, bucket again) — the
  continuous-aggregate story (queries/maintenance) applies as-is.

Hashing is the engine-portable md5-hex-prefix family used by
``decontam.portable_sample_key``: bucket = first ``hex_digits`` hex
chars of md5(salt ‖ ':' ‖ value). Lowercase-hex buckets are plain
strings, so an external SQL engine (the DuckDB oracle) reproduces
the sketch bit-for-bit — no engine-specific hash leaves the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_bucket(col: Column | str, salt: int, hex_digits: int = 3) -> Column:
    """Portable counter index: md5-hex prefix of 'salt:value'.
    16^hex_digits buckets per row (hex_digits=3 → 4096)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(F.concat_ws(":", F.lit(str(salt)), c.cast("string"))), 1, hex_digits)


def countmin_build(
    df: DataFrame, col: str = "item", depth: int = 3, hex_digits: int = 3
) -> DataFrame:
    """Build the sketch: (depth, bucket, cnt) — ≤ depth·16^hex_digits
    rows regardless of input size."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        cm_bucket(col, d, hex_digits).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db")
    ).select("db.depth", "db.bucket")
    return rows.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, hex_digits):
    counters sum position-wise."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str = "item",
    depth: int = 3,
    hex_digits: int = 3,
) -> DataFrame:
    """Point-frequency estimates for ``items``: est = min over rows of
    the row's counter. The sketch side is tiny → broadcast join.

    Probes absent from the sketch must still answer: a (depth, bucket)
    with no counter means nothing ever hashed there, so that row's
    count is 0 — LEFT join + coalesce(cnt, 0) keeps the one-sided
    est ≥ truth guarantee (truth > 0 ⇒ every row's counter ≥ truth,
    so a missing counter proves truth = 0 and the 0 estimate is
    exact). An inner join would silently drop zero-frequency probes
    and over-estimate partially-matched ones."""
    probes = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("depth"), cm_bucket(col, d, hex_digits).alias("bucket"))
                    for d in range(depth)
                ]
            )
        ).alias("db"),
    ).select(col, "db.depth", "db.bucket")
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )
