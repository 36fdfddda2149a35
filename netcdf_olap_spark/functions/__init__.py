"""Column-expression helpers shared across operators and queries."""

from netcdf_olap_spark.functions.deterministic import (  # noqa: F401
    decimal_avg,
    decimal_sum,
    narrow_checked,
)
