"""UDTF + grouped-agg pandas_udf extension points
(functions/extensions.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.functions.extensions import grid_midhinge, split_sentences
from netcdf_olap_spark.session import load_grid


def test_udtf_sentence_split(spark):
    df = spark.createDataFrame(
        [(1, "One. Two! Three?"), (2, "No terminator here"), (3, None)],
        ["doc_id", "text"],
    )
    out = split_sentences(df).orderBy("doc_id", "sent_idx").collect()
    got = [(r["doc_id"], r["sent_idx"], r["sentence"]) for r in out]
    assert got == [
        (1, 0, "One."),
        (1, 1, "Two!"),
        (1, 2, "Three?"),
        (2, 0, "No terminator here"),
    ]
    # offsets point into the source string
    assert all(
        r["sentence"].startswith(
            {1: "One. Two! Three?", 2: "No terminator here"}[r["doc_id"]][r["start_off"]:][:1].strip() or r["sentence"][0]
        )
        for r in out
    )


def test_udtf_on_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sent = split_sentences(docs)
    n_docs_with_sentences = sent.select("doc_id").distinct().count()
    assert n_docs_with_sentences == docs.where(F.trim("text") != "").count()
    assert sent.count() >= n_docs_with_sentences


def test_grouped_agg_midhinge(spark):
    g = load_grid(spark, register=False)
    got = {r["variable"]: r["midhinge"] for r in grid_midhinge(g).collect()}
    # ground truth per variable from exact percentiles
    want = {
        r["variable"]: (r["q1"] + r["q3"]) / 2.0
        for r in g.where(F.col("value").isNotNull())
        .groupBy("variable")
        .agg(F.percentile("value", 0.25).alias("q1"), F.percentile("value", 0.75).alias("q3"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        # pandas 'linear' interpolation == Spark percentile interpolation
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_hll_mergeable_rollup_error_bound(spark):
    """Region estimates from UNIONED per-nation sketches must sit
    within 5% of the exact distinct counts (HLL lgK=12 standard error
    is ~1.6%; 5% is a safe determinism-free bound).  Since r10 the
    query itself outputs the contract boolean (tolerance oracle), so
    the test asserts every within_5pct is True."""
    from netcdf_olap_spark.queries.relational_ext2 import agg_hll_mergeable

    rows = agg_hll_mergeable(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 5
    for r in rows:
        assert r.within_5pct and r.exact_custs > 0, r


def test_skyline_equals_bruteforce(spark):
    """part_skyline's cumulative-min formulation == the O(n²)
    dominance definition (independent brute force on sf0.001)."""
    from netcdf_olap_spark.queries.analytics import part_skyline
    from tests.conftest import SF_SMALL

    parts = spark.read.parquet(f"{SF_SMALL}/part.parquet").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()
    pts = [(r["p_partkey"], r["p_retailprice"], r["p_size"]) for r in parts]

    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] <= p[2] and (q[1] < p[1] or q[2] < p[2] or q[0] < p[0])
            for q in pts
            if q[0] != p[0]
        )

    expected = sorted(p[0] for p in pts if not dominated(p))
    got = [r["p_partkey"] for r in part_skyline(spark, SF_SMALL).collect()]
    assert got == expected
