"""Round-10 plan locks: the new operators' shuffle inventories stay
the shapes their docstrings promise (the regression guard that caught
the r8 knn-graph and r9 adaptive-gate scale escapes)."""

from __future__ import annotations

import re

from tests.conftest import SF_SMALL


def _counts(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "hash": len(re.findall(r"Exchange hashpartitioning", plan)),
        "single": len(re.findall(r"Exchange SinglePartition", plan)),
        "range": len(re.findall(r"Exchange rangepartitioning", plan)),
        "bcast": len(re.findall(r"BroadcastExchange", plan)),
    }


def test_intra_dedup_is_shuffle_free(spark):
    """doc_intra_dedup: chunking + earlier-occurrence test are per-row
    HOFs — ZERO pre-output shuffles, only the presentation sort."""
    from netcdf_olap_spark.queries.text import doc_intra_dedup

    c = _counts(doc_intra_dedup(spark, SF_SMALL))
    assert c["hash"] == 0 and c["single"] == 0
    assert c["range"] == 1  # the ORDER BY


def test_winnow_single_doc_window(spark):
    """doc_winnow_fingerprints: one doc-keyed window shuffle feeds the
    sliding min AND the per-doc aggregate (same key — no second
    exchange), plus the presentation sort."""
    from netcdf_olap_spark.queries.text import doc_winnow_fingerprints

    c = _counts(doc_winnow_fingerprints(spark, SF_SMALL))
    assert c["hash"] == 1 and c["single"] == 0


def test_delta_knn_broadcasts_batch(spark):
    """emb_delta_knn: the daily batch is the SMALL side — it must
    broadcast onto the bucketed corpus (one hash exchange for the
    top-k window, never a corpus self-shuffle pair)."""
    from netcdf_olap_spark.queries.similarity import emb_delta_knn

    c = _counts(emb_delta_knn(spark, SF_SMALL))
    assert c["bcast"] >= 1, "batch side should broadcast"
    assert c["hash"] <= 1


def test_quota_alloc_single_partition_is_bounded(spark):
    """doc_quota_alloc: the only single-partition windows run on the
    #sources-row allocation table (the ev_max_concurrency bounded-
    table argument) — budget ≤ 2; the doc-side work stays key-
    partitioned."""
    from netcdf_olap_spark.queries.pipeline import doc_quota_alloc

    c = _counts(doc_quota_alloc(spark, SF_SMALL))
    assert c["single"] <= 2
    assert c["hash"] <= 4


def test_morans_i_no_single_partition(spark):
    """grid_morans_i: per-day stats broadcast; the neighbor join and
    both moment rollups are day/cell-keyed — no single-partition
    exchange anywhere."""
    from netcdf_olap_spark.queries.grid import grid_morans_i

    c = _counts(grid_morans_i(spark, SF_SMALL))
    assert c["single"] == 0
    assert c["hash"] <= 5


def test_footer_stats_distributed_no_content(spark):
    """profile_footer_stats_distributed: binaryFile listing scan with
    content pruned (metadata-only I/O) feeding mapInPandas."""
    from netcdf_olap_spark.queries.analytics import profile_footer_stats_distributed

    df = profile_footer_stats_distributed(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "binaryFile" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "content" not in m.group(1)
