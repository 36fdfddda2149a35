"""Benchmark decontamination: flag corpus documents that share word
n-grams with a held-out benchmark/eval set.

The standard training-data hygiene step: any document containing a
shingle that also appears in an evaluation benchmark is suspect
(test-set leakage) and must be flagged or dropped before training.

Scale design: the benchmark side is SMALL by construction (eval sets
are thousands of documents, the corpus is billions), so its distinct
shingle set broadcasts — the corpus is scanned once, exploded to
(doc_id, shingle), and semi-joined against the broadcast set with NO
shuffle of the corpus. The only wide operation is the final distinct
on flagged doc_ids, which is bounded by the number of contaminated
docs, not the corpus. At 100 TB this is a map-side-only pass plus a
tiny aggregation.

The reference engine has no text surface; this extends the rebuild's
corpus-prep family (operators/dedup.py, operators/packing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from netcdf_olap_spark.operators.text import shingles_from_tokens, tokens


def benchmark_shingles(bench: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-grams of the benchmark set → one `shingle`
    column. Distinct happens benchmark-side (small), so the result is
    broadcastable."""
    t = tokens(text_col)
    return (
        bench.select(t.alias("_toks"))
        .select(F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("shingle"))
        .distinct()
    )


def contaminated_doc_ids(
    corpus: DataFrame,
    bench_shingles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """doc_ids of corpus documents sharing ≥1 shingle with the
    benchmark. The semi join keys on the broadcast shingle set, so the
    corpus never shuffles; distinct() runs on the (small) flagged
    subset only."""
    t = tokens(text_col)
    exploded = corpus.select(id_col, t.alias("_toks")).select(
        id_col, F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("shingle")
    )
    return (
        exploded.join(F.broadcast(bench_shingles), "shingle", "left_semi")
        .select(id_col)
        .distinct()
    )


def contamination_flag(
    corpus: DataFrame,
    bench_shingles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """corpus + boolean `contaminated` column (left join against the
    flagged-id set — still corpus-shuffle-free when the flagged set is
    broadcastable; at worst one shuffle on doc_id)."""
    ids = contaminated_doc_ids(corpus, bench_shingles, id_col, text_col, n).withColumn(
        "contaminated", F.lit(True)
    )
    return corpus.join(ids, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )


def portable_sample_key(col: Column | str, hex_digits: int = 4) -> Column:
    """Engine-portable deterministic sampling key: the first
    ``hex_digits`` hex chars of md5(value-as-string). Lowercase-hex
    string comparison orders identically in Spark and DuckDB, so
    `key < 'threshold'` selects the same rows in both engines — the
    cross-engine-reproducible form of Bernoulli sampling (Spark's
    .sample() draws from an engine-private RNG stream and can never be
    oracle-checked)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c.cast("string")), 1, hex_digits)


#: size of the 13-hex-digit (52-bit) md5-prefix space — exact in BIGINT
#: and in DOUBLE, which is why 13 digits and not 16
HEX13 = 16**13


def portable_uniform52(col: Column | str) -> Column:
    """Engine-portable uniform integer draw u ∈ [0, 16¹³): the first
    13 hex digits of md5(value-as-string) as a BIGINT. The integer
    form of :func:`portable_sample_key` for rate arithmetic — keep
    a row iff ``u · N < k · 16¹³`` (exact DECIMAL cross-multiply)
    selects the same rows in any engine and under any partitioning.
    Single definition shared by quantizer training samples
    (operators/similarity.py) and weighted corpus resampling
    (queries/pipeline.py)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 13), 16, 10).cast("long")
