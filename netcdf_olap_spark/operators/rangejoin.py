"""Binned range join: interval × point joins as bucket-local
equi-joins (SURVEY.md §2.3 interval family, the scale formulation).

A naive interval join — ``l.start <= r.p AND r.p < l.end`` riding on
a key equality — is fine when the equi-key is selective (Catalyst
plans hash join + post-filter; queries/relational.py
join_theta_ship_delay). With NO selective equi-key, Spark falls back
to BroadcastNestedLoopJoin: O(n·m) comparisons. The standard fix
(Databricks' range-join optimization, here as an explicit operator):
quantize the range dimension into fixed bins, explode each interval
to the bins it overlaps, map each point to its one bin, equi-join on
(keys…, bin), then apply the exact predicate.

Correctness: a (interval, point) pair meets in exactly ONE bin — the
point's — so no dedup pass is needed; the post-filter makes the
result exactly the naive join's (equality pinned in
tests/test_rangejoin.py, plus a plan assertion that the join is a
hash/sort-merge equi-join, not a nested loop).

Cost model: interval rows replicate ×ceil(span/bin)+1; points never
replicate. Pick ``bin_size`` ≈ the typical interval span so the
replication factor stays ≤ 2 while each bin's population stays small
— the shuffle is then linear in both inputs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    intervals: DataFrame,
    points: DataFrame,
    on: Sequence[str],
    start_col: str,
    end_col: str,
    point_col: str,
    bin_size: int,
    how: str = "inner",
) -> DataFrame:
    """Join interval rows ``[start_col, end_col)`` to point rows where
    the point lands inside, matching additionally on the ``on`` keys.
    All three range columns must be integral (µs timestamps, day
    numbers…). Returns interval ⋈ point columns (both sides' columns,
    minus the helper bin)."""
    # integer DIV, not `/`: double division loses low bits past 2^53,
    # and µs timestamps are already 2^50-scale
    lo_bin = F.expr(f"{start_col} DIV {bin_size}")
    hi_bin = F.expr(f"({end_col} - 1) DIV {bin_size}")
    iv = intervals.withColumn("_bin", F.explode(F.sequence(lo_bin, hi_bin)))
    pt = points.withColumn("_bin", F.expr(f"{point_col} DIV {bin_size}"))
    cond = [iv["_bin"] == pt["_bin"]] + [iv[k] == pt[k] for k in on]
    joined = iv.join(pt, cond, how).where(
        (pt[point_col] >= iv[start_col]) & (pt[point_col] < iv[end_col])
    )
    keep = [iv[c] for c in intervals.columns] + [
        pt[c] for c in points.columns if c not in set(on)
    ]
    return joined.select(*keep)
