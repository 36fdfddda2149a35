"""Data-layout sink: clustered, bounded-file-count Parquet writes.

The read-side pruning story (partition dirs + row-group min/max,
SURVEY §4 O1/O3) only pays off if the WRITE side cooperates: row
groups must be narrow on the columns queries filter by, and file
counts must stay bounded as data grows. This sink is that write path
— the maintenance "OPTIMIZE/compact" operation of a 100 TB table:

- ``repartitionByRange`` on the cluster columns → each output file
  owns a contiguous key range (global range partitioning via sampled
  boundaries — one shuffle);
- ``sortWithinPartitions`` → inside each file, row groups cover
  disjoint narrow ranges, so a point/range predicate skips all but
  ~one row group (verified against parquet footer stats in
  tests/test_layout.py);
- explicit file count → compacts small-file debris from incremental
  ingest (the reference's one-file-per-year layout, README.md:88-92,
  is the degenerate manual form of this).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    n_files: int,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` Parquet files (per partition dir if
    ``partition_by`` given), range-clustered and sorted on
    ``cluster_by``."""
    cols = list(cluster_by)
    out = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def zorder_col(c1, c2, bits: int = 16):
    """Z-order (Morton) key of two non-negative ints: bit-interleave
    ``c1`` and ``c2`` into one long, entirely with native bitwise
    expressions (whole-stage codegen, no UDF).

    Why: range-clustering on (y, x) is lexicographic — every file
    spans the full x range, so an x predicate prunes nothing. The
    Morton curve maps 2-D locality to 1-D locality: clustering by z
    gives each file a roughly square (y, x) tile, so a bbox predicate
    prunes on BOTH dimensions (measured in tests/test_layout.py).
    This is the at-rest layout for the spatial cube's bbox path (P5)
    at 100 TB — the same OPTIMIZE ZORDER BY pattern lakehouse tables
    use, built from shifts and masks.
    """
    from pyspark.sql import functions as F

    def spread(c):
        # classic bit-spread: 16 bits → even positions of 32
        c = c.cast("long")
        c = (c.bitwiseOR(F.shiftleft(c, 8))).bitwiseAND(F.lit(0x00FF00FF))
        c = (c.bitwiseOR(F.shiftleft(c, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
        c = (c.bitwiseOR(F.shiftleft(c, 2))).bitwiseAND(F.lit(0x33333333))
        c = (c.bitwiseOR(F.shiftleft(c, 1))).bitwiseAND(F.lit(0x55555555))
        return c

    assert bits <= 16, "two 16-bit dims fill the 32 even/odd bit lanes"
    a = spread(c1 if not isinstance(c1, str) else F.col(c1))
    b = spread(c2 if not isinstance(c2, str) else F.col(c2))
    return F.shiftleft(a, 1).bitwiseOR(b)


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` Parquet files clustered and sorted
    on the Morton key of (c1, c2). The key is a transient expression —
    range-partition and sort take Columns, so nothing extra is
    stored; pruning uses the footer min/max of the ORIGINAL columns,
    which the tiling makes narrow in both dimensions."""
    z = zorder_col(c1, c2)
    df.repartitionByRange(n_files, z).sortWithinPartitions(z).write.mode(mode).parquet(path)


def touched_fraction_2d(path: str, c1: str, r1: tuple, c2: str, r2: tuple) -> float:
    """Fraction of row groups a conjunctive 2-D range predicate must
    read, per footer stats — the measurable win of Z-ordering over
    lexicographic clustering."""
    s1 = {(f, rg): (mn, mx) for f, rg, mn, mx in rowgroup_stats(path, c1)}
    s2 = {(f, rg): (mn, mx) for f, rg, mn, mx in rowgroup_stats(path, c2)}
    keys = set(s1) & set(s2)
    touched = sum(
        1
        for k in keys
        if not (s1[k][1] < r1[0] or s1[k][0] > r1[1])
        and not (s2[k][1] < r2[0] or s2[k][0] > r2[1])
    )
    return touched / len(keys) if keys else 1.0


def rowgroup_stats(path: str, column: str) -> list[tuple]:
    """Parquet footer min/max per (file, row group) for ``column`` —
    the exact metadata the reader's skipping consults. Driver-side
    (footers only, no data)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    out.append((f, rg, col.statistics.min, col.statistics.max))
    return out


def skipped_fraction(path: str, column: str, lo, hi) -> float:
    """Fraction of row groups a ``column BETWEEN lo AND hi`` predicate
    can skip outright, per footer stats — the measurable win of
    clustering (1.0 - touched/total)."""
    stats = rowgroup_stats(path, column)
    if not stats:
        return 0.0
    touched = sum(1 for _, _, mn, mx in stats if not (mx < lo or mn > hi))
    return 1.0 - touched / len(stats)
