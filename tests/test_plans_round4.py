"""Physical-plan shape assertions for the round-4 operators — the
scale claims in SCALING.md, locked in as tests (same style as
tests/test_shuffle.py): shuffle counts, join strategies, and
Python-boundary counts must not silently regress.
"""

from __future__ import annotations

import re

from netcdf_olap_spark.queries import all_queries
from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = all_queries()[name](spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> int:
    return (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
    )


def _python_nodes(plan: str) -> int:
    return sum(
        plan.count(n)
        for n in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas", "MapInPandas")
    )


def test_chunking_is_narrow(spark):
    """doc_chunking: pure map-side fan-out — no hash/single-partition
    exchange before the presentation sort (rangepartitioning only)."""
    plan = _plan(spark, "doc_chunking")
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("Exchange SinglePartition") == 0
    assert _python_nodes(plan) == 0


def test_skyline_two_level_plan(spark):
    """part_skyline: the two-level distributive cumulative-min plan —
    the corpus-sized window is hash-partitioned on the price bucket
    (never a single-partition global sort); the only merge join is the
    broadcast of the tiny per-bucket carry-min table (never a
    shuffle join, never the naive O(n²) self-join); at most one
    Exchange SinglePartition (the n_buckets-row carry window)."""
    plan = _plan(spark, "part_skyline")
    assert "Exchange hashpartitioning(_bk" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_span_dupes_shuffle_budget(spark):
    """doc_span_dupes: per-doc pre-agg + span agg + top-k — at most 2
    hash exchanges and a TakeOrdered, no Python nodes."""
    plan = _plan(spark, "doc_span_dupes")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "TakeOrderedAndProject" in plan
    assert _python_nodes(plan) == 0


def test_countmin_sketch_broadcasts(spark):
    """doc_countmin_heavy: the sketch side of the estimate join must
    broadcast (it is bounded at depth×width rows by construction)."""
    plan = _plan(spark, "doc_countmin_heavy")
    assert "BroadcastHashJoin" in plan
    assert _python_nodes(plan) == 0


def test_mmr_python_boundary_is_single(spark):
    """emb_mmr_rerank: exactly ONE Arrow/Python node (the greedy pass
    over the pool); retrieval is native TakeOrderedAndProject."""
    plan = _plan(spark, "emb_mmr_rerank")
    assert _python_nodes(plan) == 1
    assert "TakeOrderedAndProject" in plan


def test_focal_mean_single_wide_agg(spark):
    """grid_focal_mean: explode-to-targets — the aggregate's exchange
    plus presentation sort; never a 9-way self-join (≤1 join node,
    the semi-join prune)."""
    plan = _plan(spark, "grid_focal_mean")
    joins = len(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan))
    assert joins <= 1
    assert _python_nodes(plan) == 0


def test_weighted_sample_no_wide_exchange(spark):
    """doc_weighted_sample: acceptance is map-side against a 1-row
    broadcast — no hash exchange (range sort for presentation only)."""
    plan = _plan(spark, "doc_weighted_sample")
    assert plan.count("Exchange hashpartitioning") == 0
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
