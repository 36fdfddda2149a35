"""Ingest-time table statistics from file metadata — no Spark job.

Parquet footers carry exact per-file row counts, so table cardinality
is a driver-side metadata read (footer bytes only, no column data).
Operators that size themselves by N (e.g. SemDeDup's k = √N cluster
count, operators/similarity.py) should take N from here — or from a
catalog that recorded it at ingest — instead of paying a full
``df.count()`` job over the corpus.

At real warehouse scale the right source is the catalog/metastore
row-count statistic (one lookup); globbing a footer per file is the
fallback for bare paths and is still footer-only I/O, never data.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq


def parquet_num_rows(path: str) -> int:
    """Exact row count of a parquet file or directory-of-files, read
    from footers only."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not files:
            raise FileNotFoundError(f"no parquet files under {path}")
    else:
        files = [path]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
