"""TF-IDF / BM25 ranked retrieval over a document table (training-data
pipeline extension: corpus-level term statistics + query scoring).

Scale design (100 TB):

- The postings list is never materialized for the whole vocabulary
  when scoring a query: tokens are FILTERED to the query's terms
  BEFORE the per-(doc, term) aggregation, so the exploded row volume
  is O(query-term occurrences), not O(corpus tokens).
- Corpus statistics (N, avgdl) are a 2-scalar aggregate; per-term
  document frequencies are |query| rows — both broadcast.
- One shuffle: the (doc, term) term-frequency aggregation (partial
  count map-side). The final per-doc score sum rides the same key.
- ``corpus_term_stats`` (full-vocabulary DF/TF table, the IDF model a
  pipeline trains once) is one explode + one aggregation, shuffling
  (term, partial counts) — the classic inverted-index build.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netcdf_olap_spark.operators.text import tokens


def corpus_term_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-term corpus statistics: document frequency + total term
    frequency — the trained IDF model. One explode + one groupBy."""
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("t"))
    posting = toks.select("id", F.explode("t").alias("term"))
    return posting.groupBy("term").agg(
        F.count_distinct("id").alias("doc_freq"),
        F.count(F.lit(1)).alias("term_freq"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 (Robertson/Sparck-Jones, the +1 idf variant that keeps
    scores positive) of every matching document against a bag of
    query terms. Returns (id, score, n_hit_terms), matches only.

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    with ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``.
    """
    qt = [str(t) for t in query_terms]
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("t"))
    # doc length BEFORE filtering to query terms (BM25 normalizes by
    # full doc length), then keep only query-term occurrences
    with_dl = toks.select("id", F.size("t").alias("dl"), "t")
    posting = with_dl.select(
        "id", "dl", F.explode(F.filter("t", lambda x: x.isin(*qt))).alias("term")
    )
    tf = posting.groupBy("id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))

    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("t")).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(1.0 + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return scored.groupBy("id").agg(
        F.sum("contrib").alias("score"),
        F.count(F.lit(1)).alias("n_hit_terms"),
    )
