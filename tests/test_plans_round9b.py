"""Physical-plan shape assertions for the round-9 fourth/fifth-pass
operators — the SCALING.md claims locked in as tests (exchange
budgets, join strategies, Python-boundary counts), in the style of
rounds 3-5."""

from __future__ import annotations

from netcdf_olap_spark.queries import all_queries
from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = all_queries()[name](spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def _python_nodes(plan: str) -> int:
    return sum(
        plan.count(n)
        for n in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas", "MapInPandas")
    )


def test_max_concurrency_two_level_scan(spark):
    """ev_max_concurrency: the heavy window partitions on the hour
    bucket; the ONLY SinglePartition exchange is the tiny per-hour
    carry table; the carry joins back as a broadcast."""
    plan = _plan(spark, "ev_max_concurrency")
    assert _python_nodes(plan) == 0
    assert "hashpartitioning(bucket" in plan
    assert plan.count("Exchange SinglePartition") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_trend_ols_single_aggregate_no_join(spark):
    """grid_trend_ols: one partial+final aggregate on the cell key —
    no join, no window, and the only wide exchanges are the agg and
    the final presentation sort."""
    plan = _plan(spark, "grid_trend_ols")
    assert _python_nodes(plan) == 0
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "HashAggregate" in plan


def test_streak_runs_cell_keyed_only(spark):
    """grid_streak_runs: the island window and both rollups all stay
    on the cell key — no join, no SinglePartition exchange."""
    plan = _plan(spark, "grid_streak_runs")
    assert _python_nodes(plan) == 0
    assert "Join" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(y" in plan


def test_matryoshka_recall_broadcast_sampled_audit(spark):
    """emb_matryoshka_recall: both corpus passes join the 20-row query
    table via broadcast (never a corpus shuffle join) and the top-10
    cuts run as WindowGroupLimit below the rank filter."""
    plan = _plan(spark, "emb_matryoshka_recall")
    assert _python_nodes(plan) == 0
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan or "hvec" in plan  # only the final hit-join may merge


def test_datacard_broadcast_mode_lookup(spark):
    """doc_datacard: the dominant-language table joins back by
    broadcast; no Python boundary; the scan side shuffles only on
    the source key family."""
    plan = _plan(spark, "doc_datacard")
    assert _python_nodes(plan) == 0
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_checkpointed_edges_no_rescan(spark):
    """doc_source_pagerank: every iteration consumes the materialized
    edge/rank checkpoints (ExistingRDD present); the executed plan
    contains NO tokenization (the CDC chunk build lives only inside
    the already-materialized checkpoint) and no Python nodes."""
    plan = _plan(spark, "doc_source_pagerank")
    assert _python_nodes(plan) == 0
    assert "Scan ExistingRDD" in plan
    assert "split(" not in plan


def test_asof_tolerance_same_shape_as_plain_asof(spark):
    """join_asof_tolerance: the tolerance adds ZERO exchanges over the
    plain as-of shape — one keyed window over the tagged union plus
    the click dedup aggregate; no join operator at all."""
    plan = _plan(spark, "join_asof_tolerance")
    assert _python_nodes(plan) == 0
    assert "Join" not in plan
    assert "Union" in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_centroid_shift_no_corpus_join(spark):
    """emb_centroid_shift: the halves split inside ONE conditional
    aggregate — no self-join of the corpus, no Python, no
    SinglePartition exchange before the final ordering."""
    plan = _plan(spark, "emb_centroid_shift")
    assert _python_nodes(plan) == 0
    assert "Join" not in plan
    assert "HashAggregate" in plan
