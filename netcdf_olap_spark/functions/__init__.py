"""Column-expression helpers shared across operators and queries."""

from netcdf_olap_spark.functions.deterministic import decimal_avg, decimal_sum  # noqa: F401
