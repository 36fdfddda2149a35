"""netcdf_olap_spark — a PySpark-native spatio-temporal OLAP engine.

A ground-up rebuild of the capabilities of YIXIN-WANG/netcdf-olap
(reference at /root/reference) expressed as idiomatic Spark SQL /
DataFrame plans:

- the NetCDF cube (time, y, x) -> float becomes a long-format fact
  table ``grid`` (see reference Gddp.scala:223-228 for the hyperslab
  read this replaces),
- ``_FillValue`` sentinels become real SQL NULLs
  (reference Gddp.scala:188-191),
- slicing / bbox / polygon-mask / histogram stages become
  filter / aggregate expressions that Catalyst can push down,
- plus the large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) the reference lacks.

Everything here targets a 1000-executor cluster: no driver-side
loops over data, no row-at-a-time Python UDFs in hot paths, joins
broadcast when small, aggregations partial+final via Catalyst.
"""

__version__ = "0.1.0"

from netcdf_olap_spark.session import get_spark, load_tables  # noqa: F401
