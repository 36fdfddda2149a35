"""Span-level (substring) duplication detection across documents.

The cross-document cousin of the within-doc repetition metrics
(``operators/rollup`` repetition family) and the doc-level MinHash
family (``operators/dedup``): find w-token spans that appear in more
than one document — the signal behind substring-level training-data
dedup (Lee et al., "Deduplicating Training Data Makes Language Models
Better", which removes duplicated 50-token spans corpus-wide). The
reference has no text surface (SURVEY.md §2.11); this is north-star
extension territory.

Scale design:

- A span row is (doc, span-key) — span keys are 64-bit hashes on the
  scale path (``hashed=True``): xxhash64 over the window's n
  token-hashes, never a materialized w-word string. String spans are
  kept only for oracle-verifiable queries at test scale.
- Per-doc pre-aggregation (span count within doc) happens before the
  corpus-wide groupBy, so the single shuffle carries one row per
  distinct (doc, span), with map-side partial aggregation.
- The corpus-wide span groupBy is the only wide exchange; its key is
  the span hash — uniformly distributed by construction, no salting
  needed. Output is filtered to ``min_docs`` before any sort, so the
  heavy tail of singleton spans (the vast majority) never leaves the
  aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netcdf_olap_spark.operators.text import shingles_from_tokens, tokens


def _hashed_spans(t, w: int):
    """64-bit span keys from a token array column: hash each token
    once, then one xxhash64 per window over its w token-hashes —
    O(tokens) string work, no w-word string allocation (same shape as
    dedup._hashed_shingle_index)."""
    th = F.transform(t, lambda x: F.xxhash64(x))
    spans = F.transform(
        F.sequence(F.lit(1), F.size(t) - (w - 1)),
        lambda i: F.xxhash64(*[F.element_at(th, i + j) for j in range(w)]),
    )
    return F.when(F.size(t) >= w, spans).otherwise(F.array().cast("array<bigint>"))


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 6,
    min_docs: int = 2,
    hashed: bool = True,
) -> DataFrame:
    """Spans of w whitespace tokens appearing in ≥ ``min_docs``
    distinct documents: (span, n_docs, n_occ, example_doc).

    ``hashed=True`` (the 100 TB path) keys spans by 64-bit hash;
    ``hashed=False`` keys by the literal w-word string so an external
    engine can verify the result.
    """
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("t"))
    if hashed:
        span_col = _hashed_spans(F.col("t"), w)
    else:
        span_col = shingles_from_tokens(F.col("t"), w)
    per_doc = (
        toks.select("id", F.explode(span_col).alias("span"))
        .groupBy("span", "id")
        .agg(F.count(F.lit(1)).alias("n_in_doc"))
    )
    return (
        per_doc.groupBy("span")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_in_doc").alias("n_occ"),
            F.min("id").alias("example_doc"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def span_contaminated_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-span exposure: how many of a doc's
    spans are corpus-duplicated, and the fraction of its span
    positions covered. The per-doc rollup a filtering pipeline
    thresholds on. Joins the doc→span index against the duplicated
    span set on the span hash (both sides partition on it — one
    co-located shuffle pair, no broadcast of anything corpus-sized).
    """
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("t"))
    idx = toks.select(
        "id",
        F.size("t").alias("n_tokens"),
        F.explode(_hashed_spans(F.col("t"), w)).alias("span"),
    )
    dup = duplicate_spans(df, id_col, text_col, w, min_docs, hashed=True).select("span")
    hits = (
        idx.join(dup, "span", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_positions"))
    )
    base = toks.select("id", F.greatest(F.size("t") - (w - 1), F.lit(0)).alias("n_spans"))
    return base.join(hits, "id", "left").select(
        F.col("id").alias(id_col),
        "n_spans",
        F.coalesce("n_dup_positions", F.lit(0)).alias("n_dup_positions"),
        F.when(F.col("n_spans") > 0, F.coalesce("n_dup_positions", F.lit(0)) / F.col("n_spans"))
        .otherwise(F.lit(0.0))
        .alias("dup_fraction"),
    )
