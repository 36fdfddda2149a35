"""Physical-plan shape assertions for the round-5 changes — the new
scale claims (SCALING.md), locked in as tests like rounds 3-4:
exchange budgets, join strategies, and Python-boundary counts must
not silently regress.
"""

from __future__ import annotations

import re

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


def test_hll_portable_bounded_and_broadcast(spark):
    """agg_hll_portable: the nation dimension broadcasts (never a
    shuffle join of the register table against a dim), and every
    wide exchange sits above a partial aggregate — the register
    tables are bounded at dims×256 rows by construction."""
    plan = _plan(spark, "agg_hll_portable")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert _python_nodes(plan) == 0
    # register build, region merge, exact branch, final join sort —
    # a budget, not an exact count (AQE may coalesce)
    assert plan.count("Exchange hashpartitioning") <= 6


def test_span_contamination_single_tokenize(spark):
    """doc_span_contamination: everything downstream of the one
    checkpointed (span, doc) pre-aggregate — the plan must read the
    materialized RDD, never re-tokenize (no regexp split reachable
    from more than the single checkpoint subtree) and never cross
    into Python."""
    plan = _plan(spark, "doc_span_contamination")
    assert _python_nodes(plan) == 0
    # the final plan consumes the checkpointed index (ExistingRDD),
    # plus ONE raw scan for the doc-id base — tokenization lives only
    # inside the already-materialized checkpoint, so the plan string
    # contains no split/regexp expression at all
    assert "Scan ExistingRDD" in plan
    assert "split(" not in plan


def test_semantic_dedup_assignment_materialized_once(spark):
    """emb_semantic_dedup: both self-join sides and the keep/drop join
    read the checkpointed assignment (ExistingRDD); the ONLY fold left
    in the executed plan is the per-pair dot product — the k×dim
    centroid distance map and the per-vector norms ran once inside
    the checkpoint."""
    plan = _plan(spark, "emb_semantic_dedup")
    assert plan.count("Scan ExistingRDD") >= 2
    assert plan.count("zip_with") == 1  # the pair dot; norms/assignment pre-checkpointed
    assert _python_nodes(plan) == 0


def test_ivf_exact_is_native(spark):
    """emb_knn_ivf_exact: scoring and top-k are JVM-native
    (TakeOrderedAndProject, zero Python nodes); the centroid
    assignment filter is a pure map — no join against a centroid
    table."""
    plan = _plan(spark, "emb_knn_ivf_exact")
    assert "TakeOrderedAndProject" in plan
    assert _python_nodes(plan) == 0
    joins = len(re.findall(r"(SortMergeJoin|ShuffledHashJoin)", plan))
    assert joins == 0


def test_phash_dedup_python_boundary_budget(spark):
    """media_phash_dedup: exactly the two Arrow stages the pipeline
    needs (synthesize + hash) per join side — blobs never shuffle;
    the Hamming join itself is native on the 8-bit chunk key."""
    plan = _plan(spark, "media_phash_dedup")
    assert plan.count("MapInPandas") <= 4  # 2 stages × self-join sides
    assert "bit_count" in plan  # native Hamming verify
