"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``netcdf_olap_spark/`` — this module is the
thin registry facade.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from netcdf_olap_spark.plans import CubeQuery  # noqa: E402
from netcdf_olap_spark.queries import all_oracle_sql, all_queries  # noqa: E402
from netcdf_olap_spark.queries.grid import POLYGON  # noqa: E402
from netcdf_olap_spark.session import load_grid  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-variable stats of the polygon-masked,
    date-ranged cube slice — the reference's product query
    (Gddp.scala:164-239) minus the PNG render. Runs on the repo-local
    grid fixture (the NetCDF-cube stand-in; sf-independent)."""
    q = CubeQuery(
        start_date="1990-01-05",
        end_date="1990-01-20",
        variables=["LST_LWST_avg_daily", "avg_night_temp"],
        polygon=POLYGON,
    )
    return q.aggregate(load_grid(spark, register=False))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column aliases)."""
    return all_oracle_sql()
