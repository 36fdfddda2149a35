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
) -> DataFrame:
    """Price the collect, then return a DataFrame safe to collect.

    Raises ``ValueError`` if ``df``'s blobs total more than
    ``max_bytes``. The pricing aggregate necessarily executes the
    artifact pipeline, so the returned DataFrame is the
    ``localCheckpoint``-ed materialization — the caller's
    ``collect()`` reads the stored blocks instead of re-rendering
    every artifact a second time (the blocks are ≤ ``max_bytes`` by
    the guard itself, so pinning them executor-side is bounded).
    ``max_bytes=None`` disables both the guard and the pin (caller
    explicitly accepts a plain collect)."""
    if max_bytes is None:
        return df
    from pyspark import StorageLevel

    # persist + price in one execution: the pricing aggregate fills the
    # cache, so an under-cap set is rendered ONCE and the caller's
    # collect() reads cached blocks; an over-cap set is unpersisted
    # before raising (the one compute pass was the price of an exact
    # answer — storage does not linger)
    pinned = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        total = pinned.agg(F.sum(F.octet_length(F.col(blob_col))).alias("b")).collect()[0]["b"] or 0
        if total > max_bytes:
            raise ValueError(
                f"artifact set is {total} blob bytes — over the {max_bytes}-byte "
                f"driver-collect ceiling for this small-slice path; use {alternative} "
                "(executor-side writes, manifest-only collect) or pass max_bytes=None "
                "to accept the driver collect explicitly"
            )
    except BaseException:
        pinned.unpersist()
        raise
    return pinned
