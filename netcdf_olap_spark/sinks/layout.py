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
