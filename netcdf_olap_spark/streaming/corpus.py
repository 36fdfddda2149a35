"""Streaming corpus ingestion — the unbounded-stream twin of the
batch training-data pipeline (queries/text.py doc_corpus_prep):
documents arrive continuously, get quality-gated map-side, and are
exact-deduped by content fingerprint with BOUNDED state.

Scale design: ``dropDuplicatesWithinWatermark`` keys state on the
fingerprint and evicts each key once the watermark passes its arrival
window — so state holds only the recent-horizon fingerprint set, not
the full corpus history. For corpus-lifetime dedup at 100 TB the
horizon state pairs with a periodic compaction join against the
at-rest fingerprint index (the batch operator); the stream stage's
job is to stop duplicate floods *within* the horizon before they hit
storage. The quality gate is a pure column expression — pushed
map-side, filtered docs never enter dedup state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netcdf_olap_spark.operators.text import fingerprint, tokens


def corpus_ingest(
    df: DataFrame,
    watermark: str | None = None,
    min_tokens: int = 10,
    min_chars: int = 50,
) -> DataFrame:
    """Quality gate + first-arrival fingerprint dedup.

    Works on any documents-shaped frame ``(doc_id, ts, text, ...)`` —
    batch (``dropDuplicates``) or streaming (bounded-state
    ``dropDuplicatesWithinWatermark``). Returns
    ``(doc_id, ts, fp, n_tokens, len_chars)`` of the surviving docs.
    """
    gated = df.select(
        "doc_id",
        "ts",
        fingerprint("text").alias("fp"),
        F.size(tokens("text")).alias("n_tokens"),
        F.length("text").alias("len_chars"),
    ).where((F.col("n_tokens") >= min_tokens) & (F.col("len_chars") >= min_chars))
    if watermark:
        return gated.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["fp"])
    return gated.dropDuplicates(["fp"])
