"""Temperature-based source mixing (queries/pipeline.doc_temperature_mix):
the acceptance predicate replayed exactly in Python over the same
parquet (md5-52 draw + integer cross-multiply — no floats except the
snapped sqrt, so the replay is exact, not statistical), the sqrt
rebalancing property, and the plan shape (broadcast counts, corpus
never hash-shuffled before the rollup)."""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq

from netcdf_olap_spark.queries import all_queries
from tests.conftest import SF_SMALL

HEX13 = 16**13
TARGET = 500  # must match doc_temperature_mix


def _python_replay():
    t = pq.read_table(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "source", "n_chars"])
    rows = list(zip(*[t.column(c).to_pylist() for c in ("doc_id", "source", "n_chars")]))
    n_by_src: dict[str, int] = {}
    for _i, s, _c in rows:
        n_by_src[s] = n_by_src.get(s, 0) + 1
    w = {s: math.floor(math.sqrt(float(n)) * 1000.0 + 0.5) for s, n in n_by_src.items()}
    sum_units = sum(w.values())
    out: dict[str, dict[str, int]] = {
        s: {"n_docs": n, "weight_units": w[s], "n_kept": 0, "kept_chars": 0}
        for s, n in n_by_src.items()
    }
    for did, s, chars in rows:
        u = int(hashlib.md5(str(did).encode()).hexdigest()[:13], 16)
        if u * sum_units * n_by_src[s] < TARGET * w[s] * HEX13:
            out[s]["n_kept"] += 1
            out[s]["kept_chars"] += chars
    return out


def test_matches_exact_python_replay(spark):
    got = {r.source: r.asDict() for r in all_queries()["doc_temperature_mix"](spark, SF_SMALL).collect()}
    want = _python_replay()
    assert set(got) == set(want)
    for s in want:
        for k in ("n_docs", "weight_units", "n_kept", "kept_chars"):
            assert got[s][k] == want[s][k], (s, k, got[s][k], want[s][k])


def test_sqrt_rebalancing_upweights_small_sources(spark):
    """Temperature-2 mixing: acceptance RATE ∝ sqrt(n)/n = 1/sqrt(n),
    so the smallest source must be sampled at a strictly higher rate
    than the largest whenever their sizes differ materially."""
    rows = all_queries()["doc_temperature_mix"](spark, SF_SMALL).collect()
    by_n = sorted(rows, key=lambda r: r.n_docs)
    small, large = by_n[0], by_n[-1]
    if large.n_docs >= 2 * small.n_docs and small.n_kept > 0:
        assert small.n_kept / small.n_docs > large.n_kept / large.n_docs
    # quota scaling: expected kept ∝ w_units; spot the monotonicity
    assert [r.weight_units for r in by_n] == sorted(r.weight_units for r in rows)


def test_plan_broadcasts_counts_and_keeps_corpus_narrow(spark):
    df = all_queries()["doc_temperature_mix"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # exchanges: the tiny counts aggregate + the final per-source
    # rollup (+ presentation range sort) — the corpus-side join input
    # must NOT be hash-repartitioned (no SortMergeJoin/ShuffledHashJoin)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    for n in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert n not in plan
