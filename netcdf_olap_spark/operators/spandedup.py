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


def _hashed_span_index(df: DataFrame, id_col: str, text_col: str, w: int) -> DataFrame:
    """(id, span) index of 64-bit span keys: hash each token once,
    then one xxhash64 per window over its w token-hashes — O(tokens)
    string work, no w-word string allocation (same shape as
    dedup._hashed_shingle_index).

    The token-hash array ``th`` is materialized in its OWN projection
    before the window transform: an expression referenced inside a
    higher-order lambda re-evaluates per element (no CSE inside
    lambdas), so inlining ``transform(t, xxhash64)`` into the window
    loop would re-hash every token once per window position —
    O(tokens·w) hashes instead of O(tokens) (measured 4× on the span
    index; same gotcha previously bit the shingle index)."""
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("t"))
    th = toks.select("id", F.transform("t", lambda x: F.xxhash64(x)).alias("th"))
    span_h = F.transform(
        F.sequence(F.lit(1), F.size("th") - (w - 1)),
        lambda i: F.xxhash64(*[F.element_at(F.col("th"), i + j) for j in range(w)]),
    )
    return th.where(F.size("th") >= w).select("id", F.explode(span_h).alias("span"))


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
    if hashed:
        idx = _hashed_span_index(df, id_col, text_col, w)
    else:
        toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("t"))
        idx = toks.select(
            "id", F.explode(shingles_from_tokens(F.col("t"), w)).alias("span")
        )
    per_doc = idx.groupBy("span", "id").agg(F.count(F.lit(1)).alias("n_in_doc"))
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
    thresholds on.

    Everything derives from ONE tokenize+hash pass: the per-(span,
    doc) index is materialized once (localCheckpoint — it is the
    per-doc pre-aggregation, far smaller than the exploded positions)
    and then answers all three questions from the aggregate alone —
    the duplicated-span set (groupBy span), each doc's duplicated
    positions (Σ n_in_doc over dup spans), and each doc's TOTAL span
    positions (Σ n_in_doc per doc) — so the expensive regexp
    tokenization and window hashing never run twice, and nothing
    corpus-sized is broadcast (the dup-set semi-join co-partitions on
    the span hash)."""
    per_doc = (
        _hashed_span_index(df, id_col, text_col, w)
        .groupBy("span", "id")
        .agg(F.count(F.lit(1)).alias("n_in_doc"))
        .localCheckpoint(eager=True)
    )
    dup = (
        per_doc.groupBy("span")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("span")
    )
    hits = (
        per_doc.join(dup, "span", "left_semi")
        .groupBy("id")
        .agg(F.sum("n_in_doc").alias("n_dup_positions"))
    )
    totals = per_doc.groupBy("id").agg(F.sum("n_in_doc").alias("n_spans"))
    # docs shorter than w tokens have no index rows → n_spans = 0
    base = (
        df.select(F.col(id_col).alias("id"))
        .join(totals, "id", "left")
        .select("id", F.coalesce("n_spans", F.lit(0)).alias("n_spans"))
    )
    return base.join(hits, "id", "left").select(
        F.col("id").alias(id_col),
        "n_spans",
        F.coalesce("n_dup_positions", F.lit(0)).alias("n_dup_positions"),
        F.when(F.col("n_spans") > 0, F.coalesce("n_dup_positions", F.lit(0)) / F.col("n_spans"))
        .otherwise(F.lit(0.0))
        .alias("dup_fraction"),
    )
