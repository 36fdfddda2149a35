"""Decontamination + portable-sampling operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from netcdf_olap_spark.operators import decontam


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely unrelated words about spark engines here"),
        (3, "prefix text then the quick brown fox appears again"),
        (4, "short doc"),  # < 3 tokens after nothing — still 2 tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame([(100, "quick brown fox hunting")], "doc_id long, text string")


def test_contaminated_ids_exact(spark):
    ids = decontam.contaminated_doc_ids(_corpus(spark), decontam.benchmark_shingles(_bench(spark)))
    # docs 1 and 3 contain the 3-gram "quick brown fox"; 2 and 4 don't
    assert sorted(r.doc_id for r in ids.collect()) == [1, 3]


def test_contamination_flag_preserves_rows(spark):
    flagged = decontam.contamination_flag(_corpus(spark), decontam.benchmark_shingles(_bench(spark)))
    got = {r.doc_id: r.contaminated for r in flagged.collect()}
    assert got == {1: True, 2: False, 3: True, 4: False}


def test_corpus_side_not_shuffled_before_semi_join(spark):
    """The semi join against benchmark shingles must be broadcast —
    the corpus explode feeds it map-side with no Exchange between
    scan and join (the 100 TB contract)."""
    ids = decontam.contaminated_doc_ids(_corpus(spark), decontam.benchmark_shingles(_bench(spark)))
    plan = ids._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_portable_sample_key_matches_duckdb(spark):
    import duckdb

    df = spark.range(0, 500).select(
        F.col("id"), decontam.portable_sample_key("id").alias("k")
    )
    got = {r.id: r.k for r in df.collect()}
    want = dict(
        duckdb.connect()
        .execute("SELECT i, substr(md5(CAST(i AS VARCHAR)), 1, 4) FROM range(500) t(i)")
        .fetchall()
    )
    assert got == want


def test_sample_rate_roughly_uniform(spark):
    n = (
        spark.range(0, 2000)
        .where(decontam.portable_sample_key("id") < "1999")  # ~10%
        .count()
    )
    assert 120 <= n <= 280  # 10% ± slack on 2000 draws
