"""At-rest corpus indexes for incremental (daily-batch) dedup.

The corpus-side work of ``doc_delta_dedup`` — fingerprints and CDC
chunk hashes of the EXISTING corpus — is the same every day; a
production pipeline computes it once and probes it per batch.  These
writers materialize exactly that: a fingerprint index and a chunk-hash
index, both hex-nibble-partitioned so a probe prunes to the
partitions its own hashes can live in (the text-side counterpart of
``write_ivf_index``'s list-partitioned ANN index; the streaming
lifetime fingerprint index in streaming/corpus.py is the
micro-batch-maintained cousin).

Partition key: the FIRST hex character of the md5 (16 partitions).
md5 is uniform, so partitions are balanced at any corpus size; a
probe collects its batch's ≤16 distinct nibbles (a bounded driver
list, like the PQ/k-means training samples) and filters the index
scan with a literal IN — static PartitionFilters, no full-index scan,
plan-assertable (tests/test_corpus_index.py).

100 TB shape: index build is the chunking map-side pass + ONE
(source, h) aggregation; the probe reads |batch-nibbles|/16 of the
index and equi-joins on the hash — work ∝ batch × overlap, the corpus
never re-chunks and never self-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from netcdf_olap_spark.operators import text

MIN_CHUNK_TOKENS = 4  # the doc_source_overlap / doc_delta_dedup floor

# Explicit index schemas: probe reads must NOT infer.  Inference has
# two failure modes here — (a) partition-column type inference turns
# an all-numeric nibble set (tiny corpora) into INT so the string
# isin() only works via implicit casts, and (b) an EMPTY index (a
# corpus with no qualifying rows writes no part files under
# partitionBy) makes schema inference fail outright.  Declaring the
# schema fixes both: hb/fb stay STRING and an empty index reads as an
# empty DataFrame.
CHUNK_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("h", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("hb", T.StringType()),
    ]
)
FP_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("fb", T.StringType()),
    ]
)


def doc_chunk_hashes(docs: DataFrame, min_tokens: int = MIN_CHUNK_TOKENS) -> DataFrame:
    """Distinct (doc_id, source, h) over ≥min_tokens-token CDC chunks
    — the one chunking definition shared with doc_shift_dedup /
    doc_source_overlap (operators/text.py primitives), so index and
    inline paths can never drift."""
    toks = docs.select("doc_id", "source", text.tokens("text").alias("t")).where(
        F.size("t") > 0
    )
    cuts = toks.select("doc_id", "source", "t", text.content_cutpoints(F.col("t")).alias("c"))
    raw = cuts.select(
        "doc_id", "source", F.explode(text.chunks_from_cuts(F.col("t"), F.col("c"))).alias("ct")
    )
    return (
        raw.where(F.size(F.split("ct", " ")) >= min_tokens)
        .select("doc_id", "source", F.md5("ct").alias("h"))
        .distinct()
    )


def write_chunk_index(docs: DataFrame, out_dir: str, min_tokens: int = MIN_CHUNK_TOKENS) -> None:
    """Materialize the chunk-hash index: one row per (source, h) with
    its distinct-doc count (the boilerplate-threshold statistic),
    partitioned by the hash's first hex nibble."""
    idx = (
        doc_chunk_hashes(docs, min_tokens)
        .groupBy("source", "h")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
        .withColumn("hb", F.substring("h", 1, 1))
    )
    idx.write.partitionBy("hb").mode("overwrite").parquet(out_dir)


def write_fingerprint_index(docs: DataFrame, out_dir: str) -> None:
    """Materialize the exact-dup index: distinct normalized-text
    fingerprints, partitioned by first hex nibble."""
    idx = (
        docs.select(text.fingerprint("text").alias("fp"))
        .distinct()
        .withColumn("fb", F.substring("fp", 1, 1))
    )
    idx.write.partitionBy("fb").mode("overwrite").parquet(out_dir)


def _pruned(
    spark: SparkSession,
    index_dir: str,
    part_col: str,
    nibbles: list[str],
    schema: T.StructType,
) -> DataFrame:
    """Read an index pruned to the partitions a probe can hit — the
    literal IN becomes static PartitionFilters in the scan.  Read with
    the explicit index schema (never inferred — see module constants)."""
    return spark.read.schema(schema).parquet(index_dir).where(F.col(part_col).isin(nibbles))


def probe_delta(
    spark: SparkSession,
    batch: DataFrame,
    chunk_index_dir: str,
    fp_index_dir: str,
    min_tokens: int = MIN_CHUNK_TOKENS,
) -> DataFrame:
    """doc_delta_dedup's verdict (exact_dup / near_dup / novel +
    chunk-collision count) for a new batch, probing the AT-REST
    indexes instead of re-chunking the corpus.  The batch's distinct
    hash nibbles (≤16 values each) are collected driver-side to prune
    the index scans."""
    fp = text.fingerprint("text")
    # materialize both batch derivations ONCE: each feeds a nibble
    # collect AND a join — without the cut, the expensive chunking
    # pass (and the fingerprint scan) would execute twice, and the
    # probe's dominant cost doubles; batch-sized, so cheap
    b = batch.select("doc_id", fp.alias("fp")).localCheckpoint(eager=True)
    batch_chunks = (
        doc_chunk_hashes(batch, min_tokens).select("doc_id", "h").localCheckpoint(eager=True)
    )

    h_nibbles = [r[0] for r in batch_chunks.select(F.substring("h", 1, 1)).distinct().collect()]
    f_nibbles = [r[0] for r in b.select(F.substring("fp", 1, 1)).distinct().collect()]

    corpus_chunks = (
        _pruned(spark, chunk_index_dir, "hb", h_nibbles, CHUNK_INDEX_SCHEMA)
        .select("h")
        .distinct()
    )
    corpus_fp = (
        _pruned(spark, fp_index_dir, "fb", f_nibbles, FP_INDEX_SCHEMA).select("fp").distinct()
    )

    hits = (
        batch_chunks.join(corpus_chunks, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_chunk_hits"))
    )
    return (
        b.join(corpus_fp.withColumn("fp_hit", F.lit(1)), "fp", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_chunk_hits"), F.lit(0).cast("long")).alias("n_chunk_hits"),
            F.when(F.col("fp_hit").isNotNull(), F.lit("exact_dup"))
            .when(F.coalesce(F.col("n_chunk_hits"), F.lit(0)) > 0, F.lit("near_dup"))
            .otherwise(F.lit("novel"))
            .alias("verdict"),
        )
        .orderBy("doc_id")
    )
