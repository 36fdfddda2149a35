"""Gopher-style within-document repetition signals
(operators/text.repetition_metrics): duplicate-token fraction,
top-bigram occurrence fraction (run-length max over the sorted bigram
array — multiplicity of the mode, computed shuffle-free), duplicate-
sentence fraction, and the composite is_repetitive flag. The
cross-engine value check is the doc_repetition_stats parity entry;
these tests pin the operator semantics on crafted documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.operators import text

ROWS = [
    # 8 tokens, all distinct; 7 distinct bigrams -> clean
    (1, "the quick brown fox jumps over a dog."),
    # "spam ham" repeated: 8 tokens / 2 distinct; bigram "spam ham"
    # occurs 4 of 7 bigrams
    (2, "spam ham spam ham spam ham spam ham"),
    # duplicated sentence: 3 sentences, 2 distinct
    (3, "Buy now. Limited offer today. Buy now."),
    # single token: zero bigrams -> NULL fractions, not a crash
    (4, "hello"),
    # empty text -> zero tokens
    (5, ""),
]


@pytest.fixture(scope="module")
def metrics(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {r.doc_id: r for r in text.repetition_metrics(df).collect()}


def test_clean_document(metrics):
    m = metrics[1]
    assert m.n_tokens == 8 and m.n_uniq_tokens == 8
    assert m.dup_token_frac == 0.0
    assert m.top_bigram_count == 1 and m.n_bigrams == 7
    assert not m.is_repetitive


def test_bigram_loop_detected(metrics):
    m = metrics[2]
    assert m.n_tokens == 8 and m.n_uniq_tokens == 2
    assert m.dup_token_frac == 0.75
    # bigrams: (spam ham) x4, (ham spam) x3
    assert m.n_bigrams == 7 and m.top_bigram_count == 4
    assert m.top_bigram_frac == pytest.approx(4 / 7)
    assert m.is_repetitive


def test_duplicate_sentence_detected(metrics):
    m = metrics[3]
    assert m.n_sents == 3 and m.n_uniq_sents == 2
    assert m.dup_sent_frac == pytest.approx(1 / 3)
    assert m.is_repetitive


def test_degenerate_docs_yield_nulls_not_errors(metrics):
    m = metrics[4]
    assert m.n_tokens == 1 and m.n_bigrams == 0
    assert m.top_bigram_frac is None and not m.is_repetitive
    e = metrics[5]
    assert e.n_tokens == 0 and e.dup_token_frac is None
    assert not e.is_repetitive


def test_plan_is_shuffle_free(spark):
    """The whole per-doc computation is higher-order functions over
    arrays — a pure map: no Exchange, no Python, at any corpus size."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = text.repetition_metrics(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for n in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas"):
        assert n not in plan
