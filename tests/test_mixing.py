"""Temperature-based source mixing (queries/pipeline.temperature_mix_stats):
the acceptance predicate replayed exactly in Python (md5-52 draw +
integer cross-multiply — the replay is exact, not statistical), the
sqrt rebalancing property on a DELIBERATELY SKEWED synthetic corpus
(the shipped testdata has identical per-source counts, where the
predicate alone cannot show rebalancing), the acceptance-rate cap for
tiny sources, and the plan shape (broadcast counts, corpus never
hash-shuffled before the rollup)."""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq

from netcdf_olap_spark.queries import all_queries
from netcdf_olap_spark.queries.pipeline import MIX_TARGET, temperature_mix_stats
from tests.conftest import SF_SMALL

HEX13 = 16**13


def _python_replay(rows, target):
    """Exact replay of the acceptance predicate over (doc_id, source,
    n_chars) tuples."""
    n_by_src: dict[str, int] = {}
    for _i, s, _c in rows:
        n_by_src[s] = n_by_src.get(s, 0) + 1
    w = {s: math.floor(math.sqrt(float(n)) * 1000.0 + 0.5) for s, n in n_by_src.items()}
    sum_units = sum(w.values())
    out: dict[str, dict[str, int]] = {
        s: {
            "n_docs": n,
            "weight_units": w[s],
            # ceil(quota_s / n_s) = ceil(target*w_s / (sum_units*n_s))
            "n_epochs": -(-(target * w[s]) // (sum_units * n)),
            "n_kept": 0,
            "kept_chars": 0,
        }
        for s, n in n_by_src.items()
    }
    for did, s, chars in rows:
        u = int(hashlib.md5(str(did).encode()).hexdigest()[:13], 16)
        if u * sum_units * n_by_src[s] < target * w[s] * HEX13:
            out[s]["n_kept"] += 1
            out[s]["kept_chars"] += chars
    return out


def _doc_rows():
    t = pq.read_table(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "source", "n_chars"])
    return list(zip(*[t.column(c).to_pylist() for c in ("doc_id", "source", "n_chars")]))


def test_matches_exact_python_replay_and_actually_samples(spark):
    got = {r.source: r.asDict() for r in all_queries()["doc_temperature_mix"](spark, SF_SMALL).collect()}
    want = _python_replay(_doc_rows(), MIX_TARGET)
    assert set(got) == set(want)
    for s in want:
        for k in ("n_docs", "weight_units", "n_epochs", "n_kept", "kept_chars"):
            assert got[s][k] == want[s][k], (s, k, got[s][k], want[s][k])
    # NON-VACUOUS: the target must sit below the corpus size so the
    # draw decides something — if every row is kept, the predicate
    # (and therefore the oracle) never exercises the sampling math
    n_total = sum(v["n_docs"] for v in want.values())
    n_kept = sum(v["n_kept"] for v in want.values())
    assert MIX_TARGET < n_total
    assert 0 < n_kept < n_total


# deliberately skewed: 144 / 36 / 4 docs → weights 12000 / 6000 / 2000
_SKEW = (
    [(i, "big", 10) for i in range(144)]
    + [(1000 + i, "mid", 10) for i in range(36)]
    + [(2000 + i, "tiny", 10) for i in range(4)]
)


def test_sqrt_rebalancing_on_skewed_sources(spark):
    """Acceptance rate ∝ 1/sqrt(n): with target 40 over (144, 36, 4)
    docs the exact per-source probabilities are 12/72.5/sqrt(n_s) —
    big ≈ 0.139, mid ≈ 0.276, tiny capped at 1.0 (quota 4.4 > 4 docs:
    the filter keeps all 4 and cannot replicate). Spark must equal the
    exact replay AND show the strictly increasing rate ordering."""
    df = spark.createDataFrame(_SKEW, "doc_id long, source string, n_chars long")
    got = {r.source: r.asDict() for r in temperature_mix_stats(df, target=40).collect()}
    want = _python_replay(_SKEW, 40)
    assert got == {s: {"source": s, **v} for s, v in want.items()}
    rate = {s: v["n_kept"] / v["n_docs"] for s, v in want.items()}
    assert rate["big"] < rate["mid"] < rate["tiny"] == 1.0  # cap: all 4 tiny docs kept
    assert got["tiny"]["n_kept"] == 4
    # the big source must be genuinely subsampled, not passed through
    assert 0 < got["big"]["n_kept"] < got["big"]["n_docs"]


def test_n_epochs_represents_upsampling(spark):
    """target=100 over (144, 36, 4) docs: quotas 60/30/10 → the tiny
    source needs ceil(10/4) = 3 epochs; the others fill their quota in
    one pass. n_kept stays capped at the physical row count — the
    column REPRESENTS replication, the filter never duplicates rows."""
    df = spark.createDataFrame(_SKEW, "doc_id long, source string, n_chars long")
    got = {r.source: r.asDict() for r in temperature_mix_stats(df, target=100).collect()}
    want = _python_replay(_SKEW, 100)
    assert got == {s: {"source": s, **v} for s, v in want.items()}
    assert got["tiny"]["n_epochs"] == 3 and got["tiny"]["n_kept"] == 4
    assert got["big"]["n_epochs"] == 1 and got["mid"]["n_epochs"] == 1


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
