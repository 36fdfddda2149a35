"""Named query registry — the driver contract surface.

Each submodule exports ``QUERIES: dict[str, tuple[fn, sql | None]]``
where ``fn(spark, sf_dir) -> DataFrame`` is the Spark-side plan and
``sql`` is the equivalent DuckDB oracle (None → rows-only check for
non-SQL-expressible ops).

Cross-engine determinism rules used throughout:

- Sums/averages of DOUBLE columns go through DECIMAL casts
  (``decimal_sum``/``decimal_avg`` in functions/deterministic.py):
  decimal arithmetic is exact and identical in Spark and DuckDB, so
  value hashes cannot drift on float summation order.
- Every ORDER BY under a LIMIT carries a unique tie-break key.
- No epoch/unix_timestamp math in checked queries (session-timezone
  sensitive); time bucketing is wall-clock arithmetic.
- Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from netcdf_olap_spark.queries import grid as _grid
from netcdf_olap_spark.queries import relational as _relational
from netcdf_olap_spark.queries import relational_ext as _relational_ext
from netcdf_olap_spark.queries import text as _text
from netcdf_olap_spark.queries import similarity as _similarity
from netcdf_olap_spark.queries import events as _events
from netcdf_olap_spark.queries import streaming as _streaming
from netcdf_olap_spark.queries import multimodal as _multimodal

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (_grid, _relational, _relational_ext, _text, _similarity, _events, _streaming, _multimodal)


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        for name, (fn, _sql) in m.QUERIES.items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = fn
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        for name, (_fn, sql) in m.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
