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


def test_asof_tolerance_matches_python_replay(spark):
    """Tolerance as-of ≡ per-purchase scan for the same user's latest
    at-or-before click, nulled past 24 h; the fixture must exercise
    both sides of the cutoff."""
    from netcdf_olap_spark.queries.events import US_24H, join_asof_tolerance
    from netcdf_olap_spark.session import load_events

    rows = {r.event_id: r for r in join_asof_tolerance(spark, SF_SMALL).collect()}
    ev = (
        load_events(spark, SF_SMALL)
        .select("event_id", "user_id", "event_type", F.expr("ts_ns DIV 1000").alias("t"))
        .collect()
    )
    clicks: dict[int, list] = {}
    for r in ev:
        if r.event_type == "click":
            clicks.setdefault(r.user_id, []).append(r)
    purchases = [r for r in ev if r.event_type == "purchase"]
    assert len(rows) == len(purchases)
    checked_in = checked_out = 0
    for p in purchases:
        cands = [c for c in clicks.get(p.user_id, []) if c.t <= p.t]
        got = rows[p.event_id]
        if not cands:
            assert got.click_id is None and got.lag_us is None
            continue
        best = max(cands, key=lambda c: (c.t, c.event_id))
        lag = p.t - best.t
        if lag <= US_24H:
            assert got.click_id == best.event_id and got.lag_us == lag
            checked_in += 1
        else:
            assert got.click_id is None and got.lag_us is None
            checked_out += 1
    assert checked_in > 0 and checked_out > 0


def test_streak_runs_matches_python_replay(spark):
    """Longest-run/total/count per cell equal a straight Python scan,
    and runs break on gaps exactly."""
    from netcdf_olap_spark.queries.grid import grid_streak_runs
    from netcdf_olap_spark.session import load_grid

    got = {(r.y, r.x): r for r in grid_streak_runs(spark, SF_SMALL).collect()}
    raw = (
        load_grid(spark)
        .where(
            (F.col("variable") == "LST_LWST_avg_daily")
            & F.col("value").isNotNull()
            & (F.col("value") > 275.0)
        )
        .select("y", "x", F.datediff("time", F.lit("1990-01-01").cast("date")).alias("t"))
        .collect()
    )
    cells: dict[tuple[int, int], list[int]] = {}
    for r in raw:
        cells.setdefault((r.y, r.x), []).append(r.t)
    assert set(got) == set(cells)
    multi_run_seen = False
    for cell, ts in cells.items():
        ts.sort()
        runs = []
        cur = 1
        for a, b in zip(ts, ts[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        g = got[cell]
        assert g.longest_run == max(runs)
        assert g.n_above_days == len(ts)
        assert g.n_runs == len(runs)
        multi_run_seen = multi_run_seen or len(runs) > 1
    assert multi_run_seen, "fixture should contain at least one broken streak"


def test_centroid_shift_matches_numpy(spark):
    """The rational L1/max centroid gaps equal numpy means computed
    per half (to within float tolerance of the exact rational)."""
    import numpy as np

    from netcdf_olap_spark.queries.similarity import emb_centroid_shift

    rows = {r.label: r for r in emb_centroid_shift(spark, SF_SMALL).collect()}
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    by_label: dict[int, dict[bool, list]] = {}
    for r in emb:
        # mirror the operator's decimal(18,8) per-value quantization
        v = np.round(np.array(r.embedding, dtype=float), 8)
        by_label.setdefault(r.label, {}).setdefault(r.vec_id % 2 == 0, []).append(v)
    for label, halves in by_label.items():
        if True not in halves or False not in halves:
            assert label not in rows
            continue
        ce = np.mean(halves[True], axis=0)
        co = np.mean(halves[False], axis=0)
        g = rows[label]
        assert g.n_even == len(halves[True])
        assert g.n_odd == len(halves[False])
        assert abs(g.l1_shift - np.abs(ce - co).sum()) < 1e-6
        assert abs(g.max_dim_shift - np.abs(ce - co).max()) < 1e-8
        assert g.max_dim_shift <= g.l1_shift


def test_max_concurrency_boundary_semantics(spark, tmp_path):
    """Crafted collisions pin the half-open interval rules: an arrival
    exactly at another's departure does NOT overlap it; same-instant
    arrivals all count; carry-in across an empty-arrival hour is
    reported from the departure points."""
    import datetime as dt

    from netcdf_olap_spark.queries.events import ev_max_concurrency

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # hour 0: three same-instant arrivals at :05 → peak 3
        (1, base + 5 * m), (2, base + 5 * m), (3, base + 5 * m),
        # :15 = exactly the 10-min departure of the :05 cohort → the
        # new arrival must NOT stack on them (half-open): peak stays 3
        (4, base + 15 * m),
        # hour 1: one arrival at :55 + 10min spills into hour 1; a
        # second arrival at 1:02 overlaps it → peak 2 in hour 1
        (5, base + 55 * m), (6, base + 62 * m),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = {r.win_start_us: r for r in ev_max_concurrency(spark, str(tmp_path)).collect()}
    h0 = int(base.timestamp()) * 1_000_000
    h1 = h0 + 3_600_000_000
    assert out[h0].n_arrivals == 5 and out[h0].peak_concurrency == 3
    assert out[h1].n_arrivals == 1 and out[h1].peak_concurrency == 2


def test_survivorship_keeps_longest_consistent_with_clusters(spark):
    """Cluster partition agrees with doc_dedup_clusters; within every
    cluster the keeper is the max-token (tie: min doc_id) member;
    exactly one keeper per cluster; at least one cluster where the
    keeper differs from the min-id policy OR all clusters are
    singletons (fixture sanity)."""
    from netcdf_olap_spark.queries.text import doc_dedup_clusters, doc_survivorship

    surv = doc_survivorship(spark, SF_SMALL).collect()
    clus = {r.doc_id: r.keeper_id for r in doc_dedup_clusters(spark, SF_SMALL).collect()}
    by_cluster: dict[int, list] = {}
    for r in surv:
        by_cluster.setdefault(r.cluster_id, []).append(r)
        # same partition as the min-id clustering (cluster_id IS the
        # min-label component id)
        assert clus[r.doc_id] == r.cluster_id
    multi = 0
    for cid, members in by_cluster.items():
        best = max(members, key=lambda m: (m.n_tok, -m.doc_id))
        assert all(m.keeper_id == best.doc_id for m in members)
        assert sum(m.is_kept for m in members) == 1
        if len(members) > 1:
            multi += 1
    assert multi > 0, "fixture should contain non-singleton clusters"


def test_gdd_accumulate_matches_python_cumsum(spark):
    """Per cell, the running GDD equals a Python cumulative sum of the
    decimal(18,6)-quantized clipped increments in day order, NULL days
    contributing zero but still emitting rows."""
    from decimal import Decimal

    from netcdf_olap_spark.queries.grid import grid_gdd_accumulate
    from netcdf_olap_spark.session import load_grid

    rows = grid_gdd_accumulate(spark, SF_SMALL).collect()
    raw = (
        load_grid(spark)
        .where(F.col("variable") == "LST_LWST_avg_daily")
        .select("y", "x", F.datediff("time", F.lit("1990-01-01").cast("date")).alias("t"), "value")
        .collect()
    )
    cells: dict[tuple[int, int], list] = {}
    for r in raw:
        cells.setdefault((r.y, r.x), []).append(r)
    by_cell: dict[tuple[int, int], list] = {}
    for r in rows:
        by_cell.setdefault((r.y, r.x), []).append(r)
    assert set(by_cell) == set(cells)
    q = Decimal("0.000001")
    null_rows_seen = 0
    for cell, obs in cells.items():
        obs.sort(key=lambda o: o.t)
        got = sorted(by_cell[cell], key=lambda g: g.t)
        assert [g.t for g in got] == [o.t for o in obs]
        run = Decimal(0)
        hits = 0
        for o, g in zip(obs, got):
            if o.value is not None:
                inc = max(Decimal(repr(o.value)).quantize(q) - 275, Decimal(0))
            else:
                inc = Decimal(0)
                null_rows_seen += 1
            run += inc
            if inc > 0:
                hits += 1
            assert abs(float(run) - g.gdd_cum) < 1e-9, (cell, o.t)
            assert g.n_contrib_days == hits
    assert null_rows_seen > 0, "fixture must exercise the NULL-day path"


def test_footer_stats_equal_data_scan(spark):
    """The footer-only statistics equal a real scan's COUNT/MIN/MAX
    per column, and the -0.0 footer min normalizes to +0.0."""
    from netcdf_olap_spark.queries.analytics import _FOOTER_COLS, profile_footer_stats

    got = {r.column_name: r for r in profile_footer_stats(spark, SF_SMALL).collect()}
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    n = li.count()
    for c in _FOOTER_COLS:
        agg = li.agg(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("nn"),
            F.min(F.col(c).cast("double")).alias("mn"),
            F.max(F.col(c).cast("double")).alias("mx"),
        ).collect()[0]
        g = got[c]
        assert g.n_rows == n
        assert g.n_nulls == agg.nn
        assert g.min_val == agg.mn + 0.0 and g.max_val == agg.mx + 0.0
        assert str(g.min_val) != "-0.0"
