"""Shard packing (operators/packing.py) + BM25 retrieval
(operators/retrieval.py): contract properties and a hand-computed
reference score."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.operators.packing import pack_shards, shard_manifest
from netcdf_olap_spark.operators.retrieval import bm25_scores, corpus_term_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (doc_id, source, n_tokens)
        (1, "web", 900),
        (2, "web", 900),
        (3, "web", 900),   # starts at 1800 < 2000 -> shard 0 (overrun allowed)
        (4, "web", 100),   # starts at 2700 -> shard 1
        (5, "web", 2500),  # starts at 2800 -> shard 1 (single huge doc overruns)
        (6, "web", 10),    # starts at 5300 -> shard 2
        (7, "books", 2000),
        (8, "books", 1),   # starts at 2000 -> shard 1 (exact-budget boundary)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


def test_pack_shards_sequential_fill(docs):
    got = {r.doc_id: r.shard_id for r in pack_shards(docs, budget=2000).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 2, 7: 0, 8: 1}


def test_pack_shards_properties(docs):
    packed = pack_shards(docs, budget=2000).orderBy("source", "doc_id").collect()
    by_src: dict[str, list] = {}
    for r in packed:
        by_src.setdefault(r.source, []).append(r)
    for rows in by_src.values():
        # shard ids start at 0, are non-decreasing in doc order, and
        # every shard's START offset is < (shard_id+1)*budget while the
        # tokens packed before it are >= shard_id*budget
        run = 0
        assert rows[0].shard_id == 0
        prev = 0
        for r in rows:
            assert r.shard_id >= prev
            assert r.shard_id == run // 2000
            run += r.n_tokens
            prev = r.shard_id


def test_shard_manifest(docs):
    m = {
        (r.source, r.shard_id): r
        for r in shard_manifest(pack_shards(docs, budget=2000)).collect()
    }
    web0 = m[("web", 0)]
    assert (web0.n_docs, web0.total_tokens, web0.first_doc, web0.last_doc) == (3, 2700, 1, 3)
    assert m[("books", 1)].n_docs == 1
    # token conservation: manifest totals == input totals per source
    tot = {r.source: r.s for r in docs.groupBy("source").agg(F.sum("n_tokens").alias("s")).collect()}
    for src, rows in [("web", [v for k, v in m.items() if k[0] == "web"])]:
        assert sum(r.total_tokens for r in rows) == tot[src]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog barked at the cat and the dog ran"),
        (3, "quantum entanglement of photons"),
        (4, "cat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_corpus_term_stats(corpus):
    stats = {r.term: (r.doc_freq, r.term_freq) for r in corpus_term_stats(corpus).collect()}
    assert stats["the"] == (2, 5)
    assert stats["cat"] == (3, 3)
    assert stats["photons"] == (1, 1)


def test_bm25_matches_hand_computed(corpus):
    """BM25 for query ('cat',) against the 4-doc corpus, checked
    against the formula evaluated in plain Python."""
    k1, b = 1.2, 0.75
    docs = {1: 6, 2: 10, 3: 4, 4: 1}  # doc lengths
    tf = {1: 1, 2: 1, 4: 1}
    n, avgdl = 4, sum(docs.values()) / 4
    idf = math.log(1 + (n - 3 + 0.5) / (3 + 0.5))
    want = {
        d: idf * t * (k1 + 1) / (t + k1 * (1 - b + b * docs[d] / avgdl))
        for d, t in tf.items()
    }
    got = {r.id: r.score for r in bm25_scores(corpus, ["cat"]).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)
    # shortest doc wins on length normalization
    top = max(got, key=got.get)
    assert top == 4


def test_bm25_multi_term_hits(corpus):
    got = {r.id: r for r in bm25_scores(corpus, ["cat", "dog", "photons"]).collect()}
    assert got[2].n_hit_terms == 2      # cat + dog
    assert got[3].n_hit_terms == 1      # photons
    assert 3 in got and 1 in got and 4 in got
    # rarer term (photons, df=1) outscores common term (cat, df=3) at tf=1
    assert got[3].score > got[4].score
