"""Driver-collect guard for the legacy small-slice sink paths.

``save_netcdf`` / ``save_pngs`` move artifact BLOBS through the
driver (one ``collect()``), which is fine for the small-slice/test
path they document but silently catastrophic if someone points them
at a 100 TB export. The guard prices the collect FIRST with a
Spark-side ``sum(octet_length(blob))`` aggregate — bytes never move —
and raises with a pointer to the distributed manifest path
(``export_netcdf_files`` / ``render_png_files``, which write inside
executor tasks and collect only (path, size, sha256) rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default ceiling for blob bytes a legacy sink may pull to the driver.
MAX_DRIVER_ARTIFACT_BYTES = 256 * 1024 * 1024


def guard_driver_collect(
    df: DataFrame, blob_col: str, alternative: str, max_bytes: int | None
) -> None:
    """Raise ``ValueError`` if collecting ``df``'s blobs would move
    more than ``max_bytes`` through the driver. ``max_bytes=None``
    disables the guard (caller explicitly accepts the collect)."""
    if max_bytes is None:
        return
    total = df.agg(F.sum(F.octet_length(F.col(blob_col))).alias("b")).collect()[0]["b"] or 0
    if total > max_bytes:
        raise ValueError(
            f"artifact set is {total} blob bytes — over the {max_bytes}-byte "
            f"driver-collect ceiling for this small-slice path; use {alternative} "
            "(executor-side writes, manifest-only collect) or pass max_bytes=None "
            "to accept the driver collect explicitly"
        )
