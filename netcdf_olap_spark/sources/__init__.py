"""Source connectors: NetCDF cube ingest → long-format Parquet."""
