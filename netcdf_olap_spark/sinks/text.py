"""Text/CSV dump sinks (SURVEY.md §2.1 S10 — the ``result.txt`` dump
of geopy.py:99-102, generalized)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def dump_csv_dir(df: DataFrame, path: str) -> None:
    """Distributed CSV write (one file per partition) — the scale
    path: no driver materialization."""
    df.write.mode("overwrite").option("header", True).csv(path)


def dump_single_file(df: DataFrame, path: str) -> None:
    """Single local file (the reference's result.txt shape). Only for
    result-sized frames — this collects to the driver by design."""
    df.toPandas().to_csv(path, index=False)
