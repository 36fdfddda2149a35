"""At-rest corpus indexes (operators/corpusindex.py): index-path ≡
inline-path equivalence, nibble partition layout, and the probe's
static partition pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from netcdf_olap_spark.operators import corpusindex
from tests.conftest import SF_SMALL


def _build(spark, tmp_path):
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    corpus = d.where(F.col("doc_id") % 20 != 0)
    chunk_dir = str(tmp_path / "chunks")
    fp_dir = str(tmp_path / "fps")
    corpusindex.write_chunk_index(corpus, chunk_dir)
    corpusindex.write_fingerprint_index(corpus, fp_dir)
    return d, chunk_dir, fp_dir


def test_indexed_probe_equals_inline_delta_dedup(spark, tmp_path):
    """probe_delta over the materialized indexes returns exactly
    doc_delta_dedup's rows."""
    from netcdf_olap_spark.queries.text import doc_delta_dedup

    d, chunk_dir, fp_dir = _build(spark, tmp_path)
    batch = d.where(F.col("doc_id") % 20 == 0)
    got = corpusindex.probe_delta(spark, batch, chunk_dir, fp_dir).collect()
    want = doc_delta_dedup(spark, SF_SMALL).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    verdicts = {r.verdict for r in got}
    assert "novel" in verdicts and ("exact_dup" in verdicts or "near_dup" in verdicts)


def test_index_layout_is_nibble_partitioned(spark, tmp_path):
    """Both indexes land as hb=/fb= hive partitions whose rows all
    carry hashes starting with that nibble."""
    _d, chunk_dir, fp_dir = _build(spark, tmp_path)
    hbs = sorted(p.split("=")[1] for p in os.listdir(chunk_dir) if p.startswith("hb="))
    assert hbs and all(len(n) == 1 and n in "0123456789abcdef" for n in hbs)
    idx = spark.read.parquet(chunk_dir)
    assert idx.where(F.substring("h", 1, 1) != F.col("hb")).count() == 0
    fbs = [p for p in os.listdir(fp_dir) if p.startswith("fb=")]
    assert fbs


def test_probe_prunes_partitions(spark, tmp_path):
    """A single-doc batch's probe scans ONLY the nibble partitions its
    own hashes can live in — static PartitionFilters, verified through
    the files the pruned reader actually exposes."""
    d, chunk_dir, fp_dir = _build(spark, tmp_path)
    one = d.where(F.col("doc_id") == 0)
    chunks = corpusindex.doc_chunk_hashes(one)
    nibbles = sorted(r[0] for r in chunks.select(F.substring("h", 1, 1)).distinct().collect())
    assert 0 < len(nibbles) < 16, "a 1-doc batch should not touch every nibble"
    pruned = corpusindex._pruned(spark, chunk_dir, "hb", nibbles, corpusindex.CHUNK_INDEX_SCHEMA)
    # inputFiles() lists the relation pre-pruning; the files a run
    # actually READS come from input_file_name() (the ivf-index test's
    # idiom)
    files = [r[0] for r in pruned.select(F.input_file_name()).distinct().collect()]
    assert files
    assert all(any(f"hb={n}/" in f for n in nibbles) for f in files)
    # and the filter really reached the scan as a partition filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "hb" in plan


def test_probe_survives_empty_index(spark, tmp_path):
    """An EMPTY corpus (no qualifying rows → partitionBy writes no part
    files) must read as an empty index, not an 'unable to infer schema'
    failure — the explicit-schema read (r10 advisory) guarantees it,
    and every batch doc comes back 'novel'."""
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    empty = d.where(F.lit(False))
    chunk_dir = str(tmp_path / "chunks")
    fp_dir = str(tmp_path / "fps")
    corpusindex.write_chunk_index(empty, chunk_dir)
    corpusindex.write_fingerprint_index(empty, fp_dir)
    batch = d.where(F.col("doc_id") < 5)
    got = corpusindex.probe_delta(spark, batch, chunk_dir, fp_dir).collect()
    assert len(got) == 5
    assert all(r.verdict == "novel" and r.n_chunk_hits == 0 for r in got)


def test_pruned_partition_column_stays_string(spark, tmp_path):
    """Even when every written nibble happens to be numeric, the probe
    must see hb as STRING (no partition-column type inference), so the
    string isin() needs no implicit casts."""
    d, chunk_dir, _fp = _build(spark, tmp_path)
    numeric = [n for n in "0123456789"]
    pruned = corpusindex._pruned(spark, chunk_dir, "hb", numeric, corpusindex.CHUNK_INDEX_SCHEMA)
    assert dict(pruned.dtypes)["hb"] == "string"
    rows = pruned.select("hb").distinct().collect()
    assert all(isinstance(r.hb, str) for r in rows)
