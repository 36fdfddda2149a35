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


def _list_parquet(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not files:
            raise FileNotFoundError(f"no parquet files under {path}")
        return files
    return [path]


def parquet_num_rows(path: str) -> int:
    """Exact row count of a parquet file or directory-of-files, read
    from footers only."""
    return sum(pq.ParquetFile(f).metadata.num_rows for f in _list_parquet(path))


def parquet_column_stats(path: str, columns: list[str]) -> tuple[int, dict[str, dict]]:
    """Exact (n_rows, per-column {n_nulls, min, max}) from parquet
    FOOTERS only — the ANALYZE-TABLE statistics without touching a
    single data page.  Row-group min/max in parquet are exact for
    numeric types (string stats may be truncated — callers keep to
    numerics), so the aggregate over row groups equals the data scan's
    MIN/MAX/COUNT bit-for-bit.  Raises if any requested column lacks
    statistics rather than silently returning partial truth."""
    out: dict[str, dict] = {c: {"n_nulls": 0, "min": None, "max": None} for c in columns}
    n_rows = 0
    for f in _list_parquet(path):
        pf = pq.ParquetFile(f)
        # the completeness check is PER FILE against its schema, not
        # global: a column present in some files but absent from one
        # (schema drift) would otherwise silently under-count nulls —
        # that file's rows read as NULL in a scan but contribute
        # nothing here — violating the no-partial-truth promise.  A
        # zero-row-group file is fine as long as its schema has the
        # columns.
        names = set(pf.schema_arrow.names)
        missing = set(columns) - names
        if missing:
            raise KeyError(f"columns not in {f}: {sorted(missing)}")
        md = pf.metadata
        n_rows += md.num_rows
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for i in range(rg.num_columns):
                col = rg.column(i)
                name = col.path_in_schema
                if name not in out:
                    continue
                st = col.statistics
                if st is None or st.null_count is None:
                    raise ValueError(f"column {name} in {f} carries no statistics")
                o = out[name]
                o["n_nulls"] += st.null_count
                if st.has_min_max:
                    o["min"] = st.min if o["min"] is None else min(o["min"], st.min)
                    o["max"] = st.max if o["max"] is None else max(o["max"], st.max)
                elif st.null_count < rg.num_rows:
                    raise ValueError(f"column {name} in {f} has values but no min/max")
    return n_rows, out
