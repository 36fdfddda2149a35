"""Dedup-operator tests: planted near-dups, MinHash/SimHash recall
against exact-Jaccard ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill in the afternoon sun near the garden"
)


@pytest.fixture(scope="module")
def planted(spark):
    """12 docs: 0/1 near-identical, 2/3 near-identical, rest random-ish
    distinct word soup."""
    rows = [
        (0, BASE),
        (1, BASE.replace("lazy", "sleepy")),  # 1-token change → high jaccard
        (2, BASE.replace("afternoon sun", "morning light")),
        (3, BASE.replace("afternoon sun", "morning light").replace("quick", "swift")),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
        (5, "completely different words about spark clusters and shuffle partitions here"),
        (6, "yet another unrelated document discussing parquet row groups and stats"),
        (7, "one more distinct text with vectors embeddings and cosine distances"),
        (8, "final filler document mentioning histograms quantiles and color ramps"),
        (9, "grid cells latitudes longitudes and polygon masks for climate data"),
        (10, "tokenizer stopwords fingerprints and rolling hashes for documents"),
        (11, "watermarks sessions tumbling windows and late arriving events stream"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pairs(df):
    return {(r.id1, r.id2) for r in df.collect()}


def test_exact_dedup_keeper(spark, planted):
    dup = planted.union(planted.where(F.col("doc_id") == 0).select(F.lit(99).alias("doc_id"), "text"))
    out = dedup.exact_dedup(dup).collect()
    groups = {r.keeper_id: r.n_copies for r in out}
    assert groups[0] == 2  # doc 99 deduped into keeper 0
    assert sum(groups.values()) == 13


def test_jaccard_finds_planted(spark, planted):
    got = _pairs(dedup.jaccard_pairs(planted, threshold=0.5, n=3))
    assert (0, 1) in got
    assert (2, 3) in got
    assert all(p in {(0, 1), (2, 3), (0, 2), (1, 3), (0, 3), (1, 2)} for p in got)


def test_minhash_lsh_recall(spark, planted):
    truth = _pairs(dedup.jaccard_pairs(planted, threshold=0.5, n=3))
    got = _pairs(dedup.minhash_lsh_pairs(planted, k=32, bands=16, verify_threshold=0.5))
    # verified output is a subset of truth (precision 1.0)…
    assert got <= truth
    # …and banding at r=2 catches these high-jaccard pairs
    assert (0, 1) in got and (2, 3) in got


def test_minhash_matches_bruteforce_on_documents(spark):
    """On the driver's documents table, LSH+verify output must be a
    subset of brute-force pairs at the same threshold, with recall
    ≥ the planted expectation for r=2 banding."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    truth = _pairs(dedup.jaccard_pairs(docs, threshold=0.12, n=3))
    got = _pairs(dedup.minhash_lsh_pairs(docs, k=32, bands=16, verify_threshold=0.12))
    assert got <= truth


def test_simhash_finds_planted(spark, planted):
    # planted pair distances are ≤ 6 → inside the d≤7 recall guarantee
    got = _pairs(dedup.simhash_pairs(planted, max_hamming=7))
    assert (0, 1) in got
    assert (2, 3) in got


def test_simhash_signature_deterministic(spark, planted):
    a = {r.id: r.simhash for r in dedup.simhash_signatures(planted).collect()}
    b = {r.id: r.simhash for r in dedup.simhash_signatures(planted).collect()}
    assert a == b


def test_minhash_portable_precision_and_planted_recall(spark, planted):
    """The md5-52 portable twin keeps the fast path's contract:
    verified output ⊆ exact-Jaccard truth (precision 1.0) and the
    planted high-jaccard pairs survive r=2 banding."""
    truth = _pairs(dedup.jaccard_pairs(planted, threshold=0.5, n=3))
    got = _pairs(dedup.minhash_lsh_pairs_portable(planted, k=16, bands=8, threshold=0.5))
    assert got <= truth
    assert (0, 1) in got and (2, 3) in got


def test_minhash_portable_agrees_with_fast_path_on_documents(spark):
    """Portable (md5-52) and production (xxhash64) MinHash disagree
    only through band-collision luck, never on verification: both
    outputs are subsets of brute-force truth, and the planted
    documents-table near-dups (the pairs brute force finds) are
    recovered identically here."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    truth = _pairs(dedup.jaccard_pairs(docs, threshold=0.12, n=3))
    fast = _pairs(dedup.minhash_lsh_pairs(docs, k=32, bands=16, verify_threshold=0.12))
    portable = _pairs(dedup.minhash_lsh_pairs_portable(docs, k=16, bands=8, threshold=0.12))
    assert portable <= truth
    assert portable == fast == truth  # r=2 banding recovers all planted pairs


def test_minhash_portable_unicode_cross_engine(spark):
    """The portable pipeline's cross-engine claims must hold beyond
    ASCII: CJK, emoji, accents, and mixed whitespace through Java's
    \\s+ split, md5 over UTF-8, and the hex conv — compared EXACTLY
    against the DuckDB oracle on the same corpus."""
    import duckdb
    import pandas as pd

    from netcdf_olap_spark.queries.text import DOC_MINHASH_PORTABLE_SQL

    docs = [
        (1, "héllo wörld café naïve résumé déjà vu encore une fois très bien"),
        (2, "héllo wörld café naïve résumé déjà vu encore une fois très bien"),
        (3, "日本語 テスト 文書 です これは 形態素 では なく 空白 区切り"),
        (4, "日本語 テスト 文書 です これは 形態素 では なく 空白 区切り だ"),
        (5, "emoji 🙂 test 🚀 tokens 🎉 with 🌍 spaces 🔥 between 💡 them ⚡ ok"),
        (6, "mixed   whitespace\ttabs\nnewlines   and nbsp maybe counts here too"),
        (7, "ASCII control only plain text document with many simple tokens here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r.id1, r.id2, r.shared, r.union_sz)
        for r in dedup.minhash_lsh_pairs_portable(df, threshold=0.3).orderBy("id1", "id2").collect()
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    sql = DOC_MINHASH_PORTABLE_SQL.replace(
        "s.shared * 1000 >= 120 *", "s.shared * 1000 >= 300 *"
    )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want and len(got) == 2


def test_minhash_verified_output_equals_exact_pairs(spark):
    """The driver-checked contract behind doc_minhash_dedup_pairs'
    round-9 oracle: exact verify gives precision 1.0, and k=32/b=16
    recall is 1.0 on the fixtures — so the LSH output IS the exact
    0.12-Jaccard pair set. If this ever fails, fix recall (or the
    oracle claim) BEFORE the driver's hash check reports it."""
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    lsh = {
        (r.id1, r.id2)
        for r in dedup.minhash_lsh_pairs(docs, k=32, bands=16, verify_threshold=0.12).collect()
    }
    exact = {
        (r.id1, r.id2)
        for r in dedup.jaccard_pairs(docs, threshold=0.12, n=3).collect()
    }
    assert lsh == exact
