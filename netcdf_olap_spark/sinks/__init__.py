"""Sink stages: rendering and export are *sinks over DataFrames*,
never side effects inside map tasks (the reference writes PNGs from
inside its RDD closure, Gddp.scala:235-236 — SURVEY.md §1.3 maps
that to a dedicated sink stage)."""

from netcdf_olap_spark.sinks.png import render_png, save_pngs, png_filename  # noqa: F401
