"""Fourth round-9 operator pass: peak concurrency, per-cell OLS
trend, Matryoshka-truncation recall — semantic invariants beyond the
DuckDB hash parity (which pins exact values)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

US_10MIN = 600_000_000
US_1H = 3_600_000_000


def test_max_concurrency_matches_python_sweep(spark):
    """The operator's per-hour peaks equal a straight single-threaded
    sweep over the same ±1 boundary points (half-open intervals,
    departures before arrivals at equal instants, carry-in counted)."""
    from netcdf_olap_spark.queries.events import ev_max_concurrency
    from netcdf_olap_spark.session import load_events

    rows = {r.win_start_us: r for r in ev_max_concurrency(spark, SF_SMALL).collect()}
    ev = (
        load_events(spark, SF_SMALL)
        .select(F.expr("ts_ns DIV 1000").alias("ts_us"), "event_id")
        .collect()
    )
    pts = []
    for r in ev:
        pts.append((r.ts_us, 1, r.event_id))
        pts.append((r.ts_us + US_10MIN, -1, r.event_id))
    pts.sort()
    conc = 0
    peak: dict[int, int] = {}
    arrivals: dict[int, int] = {}
    for t, d, _eid in pts:
        bucket = t - t % US_1H
        if bucket not in peak:
            peak[bucket] = conc  # carry-in at the hour boundary
        conc += d
        peak[bucket] = max(peak[bucket], conc)
        if d == 1:
            arrivals[bucket] = arrivals.get(bucket, 0) + 1
    assert set(rows) == set(peak)
    for b, r in rows.items():
        assert r.peak_concurrency == peak[b], f"bucket {b}"
        assert r.n_arrivals == arrivals.get(b, 0), f"bucket {b}"
    assert conc == 0, "sweep must close every interval"
    assert max(r.peak_concurrency for r in rows.values()) >= 2


def test_trend_ols_matches_numpy_lstsq(spark):
    """Each cell's (slope, intercept) equals numpy's least-squares fit
    of value against the day index over that cell's non-null days."""
    import numpy as np

    from netcdf_olap_spark.queries.grid import grid_trend_ols
    from netcdf_olap_spark.session import load_grid

    out = {(r.y, r.x): r for r in grid_trend_ols(spark, SF_SMALL).collect()}
    assert out
    raw = (
        load_grid(spark)
        .where((F.col("variable") == "LST_LWST_avg_daily") & F.col("value").isNotNull())
        .select("y", "x", F.datediff("time", F.lit("1990-01-01").cast("date")).alias("t"), "value")
        .collect()
    )
    cells: dict[tuple[int, int], list[tuple[int, float]]] = {}
    for r in raw:
        # mirror the operator's decimal(18,6) quantization of y
        cells.setdefault((r.y, r.x), []).append((r.t, round(r.value, 6)))
    checked = 0
    for cell, obs in cells.items():
        ts = np.array([o[0] for o in obs], dtype=float)
        ys = np.array([o[1] for o in obs], dtype=float)
        if len(obs) < 2 or np.all(ts == ts[0]):
            assert cell not in out
            continue
        slope, intercept = np.polyfit(ts, ys, 1)
        got = out[cell]
        assert got.n_obs == len(obs)
        assert math.isfinite(got.slope) and math.isfinite(got.intercept)
        assert abs(got.slope - slope) < 1e-9, cell
        assert abs(got.intercept - intercept) < 1e-6, cell
        checked += 1
    assert checked == len(out)


def test_matryoshka_recall_bounds_and_exactness(spark):
    """recall_bp ∈ [0, 10000] with n_hits·1000 == recall_bp, 20 query
    rows, and a Python brute-force replay of both top-10 lists agrees
    on every count."""
    from netcdf_olap_spark.queries.similarity import emb_matryoshka_recall

    rows = emb_matryoshka_recall(spark, SF_SMALL).collect()
    assert [r.qid for r in rows] == list(range(1, 21))
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    }

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(x) * float(x) for x in b))
        return dot / (na * nb)

    def top10(qid, ndim):
        scored = [
            (cos(v[:ndim], emb[qid][:ndim]), vid)
            for vid, v in emb.items()
            if vid != qid
        ]
        scored.sort(key=lambda p: (-p[0], p[1]))
        return {vid for _s, vid in scored[:10]}

    for r in rows:
        assert 0 <= r.n_hits <= 10
        assert r.recall_bp == r.n_hits * 1000
        assert r.n_hits == len(top10(r.qid, 64) & top10(r.qid, 32))
    # the audit is informative only if truncation actually loses a
    # little but not everything on this fixture
    total = sum(r.n_hits for r in rows)
    assert 0 < total <= 200


def test_datacard_matches_python_replay(spark):
    """Every per-source card figure equals a straight Python replay
    over the collected documents table."""
    from netcdf_olap_spark.queries.pipeline import doc_datacard

    rows = {r.source: r for r in doc_datacard(spark, SF_SMALL).collect()}
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    by_src: dict[str, list] = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(d)
    assert set(rows) == set(by_src)
    for src, ds in by_src.items():
        got = rows[src]
        n_docs = len(ds)
        toks = [len(d.text.split()) for d in ds]
        assert got.n_docs == n_docs
        assert got.n_tokens == sum(toks)
        assert got.n_chars == sum(len(d.text) for d in ds)
        assert got.mean_tokens_c == (sum(toks) * 100) // n_docs
        n_unique = len({d.text for d in ds})
        assert got.dup_bp == ((n_docs - n_unique) * 10000) // n_docs
        langs = {}
        for d in ds:
            langs[d.lang] = langs.get(d.lang, 0) + 1
        assert got.n_langs == len(langs)
        assert got.top_lang == min(langs, key=lambda l: (-langs[l], l))


def test_source_pagerank_matches_python_power_iteration(spark):
    """The integer fixed-point PageRank equals a pure-Python replay
    over the same overlap edges, and total mass stays within the
    truncation budget of 1.0·SCALE."""
    from netcdf_olap_spark.queries.text import (
        _PR_ITERS,
        _PR_SCALE,
        doc_source_overlap,
        doc_source_pagerank,
    )

    got = {r.source: r.rank_e12 for r in doc_source_pagerank(spark, SF_SMALL).collect()}
    sym = doc_source_overlap(spark, SF_SMALL).collect()
    edges: dict[str, dict[str, int]] = {}
    for e in sym:
        edges.setdefault(e.s1, {})[e.s2] = e.n_shared_chunks
        edges.setdefault(e.s2, {})[e.s1] = e.n_shared_chunks
    nodes = sorted(
        {
            r.source
            for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .select("source")
            .distinct()
            .collect()
        }
    )
    n = len(nodes)
    rank = {s: _PR_SCALE // n for s in nodes}
    outw = {s: sum(edges.get(s, {}).values()) for s in nodes}
    for _ in range(_PR_ITERS):
        contrib = {s: 0 for s in nodes}
        for j in nodes:
            if outw[j]:
                for i, w in edges[j].items():
                    contrib[i] += rank[j] * w // outw[j]
        dang = sum(rank[j] for j in nodes if not outw[j])
        rank = {
            s: (15 * _PR_SCALE // 100) // n + (85 * (contrib[s] + dang // n)) // 100
            for s in nodes
        }
    assert got == rank
    total = sum(got.values())
    # truncating divisions only ever LOSE mass, never mint it
    assert 0 < total <= _PR_SCALE
    assert total > _PR_SCALE * 95 // 100
