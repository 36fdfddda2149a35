"""Token-budget shard packing (training-data pipeline, SURVEY §2.11
extension set).

A pre-training corpus is consumed as shards of ~fixed token budget;
the packer assigns every document a ``shard_id`` such that documents
laid out in a deterministic order fill shards sequentially (a shard
may overrun the budget by at most its last document — the standard
sequential-fill contract, so no document is split and no shard except
the final one is under-full).

Scale design (100 TB): packing is a running sum, which is inherently
sequential — so the unit of sequentiality must be a PARTITION KEY
(source, language, date-bucket …), not the corpus. ``pack_shards``
packs independently within each key: one shuffle on the key family,
one window sort per key, embarrassingly parallel across keys. A
global single-ordering pack (``partition_cols=()``) degenerates to a
single-partition window — correct, but only for small corpora; at
scale, pack per key and address shards as (key, shard_id), which is
also how heterogeneous corpora are actually mixed (per-source shard
streams with sampling weights).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_cols: Sequence[str] = ("doc_id",),
    partition_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Adds ``shard_id``: sequential token-budget packing per partition key.

    ``shard_id = floor(exclusive_running_sum(tokens) / budget)`` — a
    document starts a new shard exactly when the shard it would join
    already holds ≥ budget tokens' worth of *starts*. Deterministic
    given (partition_cols, order_cols); order columns must be a unique
    key within each partition for cross-run stability.
    """
    w = (
        Window.partitionBy(*partition_cols).orderBy(*order_cols)
        if partition_cols
        else Window.orderBy(*order_cols)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    start_offset = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn("shard_id", F.floor(start_offset / F.lit(budget)).cast("long"))


def shard_manifest(
    packed: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partition_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Per-shard manifest: doc count, token total, id range — the
    shard index a training loader reads instead of listing files.
    One partial+final aggregate over the packed set."""
    return packed.groupBy(*partition_cols, "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("total_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )
