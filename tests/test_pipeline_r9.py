"""Round-9 operators: contrastive hard negatives, curriculum mixing,
packing-efficiency report, join-skew profiler — semantic invariants
beyond the DuckDB hash parity (which pins exact values)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_hard_negatives_cross_label_and_exact_cosine(spark):
    """Every mined negative has a DIFFERENT label than its anchor,
    ranks are contiguous from 1, scores descend, and each cos_sim is
    the exact sequential-fold cosine of the pair."""
    from netcdf_olap_spark.queries.similarity import emb_hard_negatives

    rows = emb_hard_negatives(spark, SF_SMALL).collect()
    assert rows
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    vecs = {r.vec_id: r.embedding for r in e}
    labels = {r.vec_id: r.label for r in e}
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src_id, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.neg_rank)
        assert [r.neg_rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
        for r in rs:
            assert labels[r.src_id] != labels[r.dst_id], "same-label negative"
            a, b = vecs[r.src_id], vecs[r.dst_id]
            dot = sum(float(x) * float(y) for x, y in zip(a, b))
            na = math.sqrt(sum(float(x) * float(x) for x in a))
            nb = math.sqrt(sum(float(x) * float(x) for x in b))
            assert abs(dot / (na * nb) - r.cos_sim) < 1e-9


def test_curriculum_weights_interpolate_natural_to_quality(spark):
    """The per-epoch weight is the exact integer lerp
    w_e = w0·(E−1−e) + w1·e between the natural count w0 and the
    quality mass w1 (recomputed independently here), kept counts stay
    within each source's size, and the epochs actually differ."""
    from netcdf_olap_spark.queries.pipeline import (
        _adaptive_scores,
        doc_curriculum_mix,
    )

    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    scored = _adaptive_scores(d)
    ref = {
        r.source: (r.w0, r.w1)
        for r in scored.groupBy("source")
        .agg(F.count(F.lit(1)).alias("w0"), F.sum("score_bp").alias("w1"))
        .collect()
    }
    out = doc_curriculum_mix(spark, SF_SMALL).collect()
    assert {r.epoch for r in out} == {0, 1, 2}
    for r in out:
        w0, w1 = ref[r.source]
        assert r.weight_units == w0 * (2 - r.epoch) + w1 * r.epoch
    # acceptance stays within the source's size and epochs differ
    # (decorrelated draws + moving weights)
    per_src = {}
    for r in out:
        per_src.setdefault(r.source, {})[r.epoch] = r.n_kept
        assert 0 <= r.n_kept <= ref[r.source][0]
    assert any(len(set(v.values())) > 1 for v in per_src.values())


def test_pack_efficiency_consistent_with_context_pack(spark):
    """The report's straddle counts and window accounting equal what
    doc_context_pack's per-doc tiling implies — shared semantics, two
    granularities."""
    from netcdf_olap_spark.queries.pipeline import doc_context_pack, doc_pack_efficiency

    per_doc = doc_context_pack(spark, SF_SMALL).collect()
    want_straddle: dict[str, int] = {}
    want_tokens: dict[str, int] = {}
    for r in per_doc:
        want_straddle[r.source] = want_straddle.get(r.source, 0) + int(r.straddles)
        want_tokens[r.source] = want_tokens.get(r.source, 0) + r.n_tokens
    rep = doc_pack_efficiency(spark, SF_SMALL).collect()
    assert {r.source for r in rep} == set(want_tokens)
    for r in rep:
        assert r.n_straddle == want_straddle[r.source]
        assert r.total_tokens == want_tokens[r.source]
        assert r.n_windows == -(-r.total_tokens // 512)
        assert r.pad_tokens == r.n_windows * 512 - r.total_tokens
        assert 0 <= r.pad_tokens < 512


def test_join_skew_profile_exact_shares(spark):
    """est_pairs = n_rows² exactly; shares are basis points of the
    FULL total (not just the top 20); ordering is (est DESC, key)."""
    from netcdf_olap_spark.queries.analytics import profile_join_skew
    from netcdf_olap_spark.session import load_events

    rows = profile_join_skew(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    counts = {
        r.user_id: r.n
        for r in load_events(spark, SF_SMALL)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(n * n for n in counts.values())
    for r in rows:
        assert r.est_pairs == counts[r.user_id] ** 2
        assert r.share_bp == (r.est_pairs * 10000) // total
    ests = [(r.est_pairs, -r.user_id) for r in rows]
    assert ests == sorted(ests, reverse=True)


def test_ann_recall_report_bounds_and_meaning(spark):
    """Recall audit: one row per sampled query, hits bounded by k=10,
    recall_bp = hits·1000, and a hand-check of one query — the hit
    count equals |exact top-10 ∩ same-bucket top-10|."""
    from netcdf_olap_spark.operators import similarity as ops
    from netcdf_olap_spark.queries.similarity import emb_ann_recall_report
    from netcdf_olap_spark.sources.stats import parquet_num_rows

    rows = emb_ann_recall_report(spark, SF_SMALL).collect()
    assert [r.qid for r in rows] == list(range(1, 21))
    for r in rows:
        assert 0 <= r.n_hits <= 10
        assert r.recall_bp == r.n_hits * 1000

    # hand-check qid=1 against driver-side math
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in e}
    n = parquet_num_rows(f"{SF_SMALL}/embeddings.parquet")
    planes = ops.md5_sign_planes(ops.auto_n_planes(n), 64)

    def bucket(v):
        b = 0
        for i, p in enumerate(planes):
            acc = 0.0
            for x, y in zip(v, p):
                acc += x * y
            if acc >= 0:
                b |= 1 << i
        return b

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    q = vecs[1]
    qb = bucket(q)
    scored = sorted(
        ((cos(v, q), vid) for vid, v in vecs.items() if vid != 1),
        key=lambda t: (-t[0], t[1]),
    )
    brute10 = {vid for _, vid in scored[:10]}
    blocked = [(s, vid) for s, vid in scored if bucket(vecs[vid]) == qb]
    blocked10 = {vid for _, vid in blocked[:10]}
    want = len(brute10 & blocked10)
    got = next(r.n_hits for r in rows if r.qid == 1)
    assert got == want


def test_quantile_sketch_merges_and_estimates(spark):
    """The sketch state is the md5 sample: (a) building it from two
    disjoint halves and merging (union) equals building it globally —
    the mergeability contract; (b) the estimate lands near the exact
    per-group quantile (deterministic sample, so a fixed bound)."""
    from netcdf_olap_spark.queries.relational_ext import agg_quantile_sketch_portable

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    key = F.substring(
        F.md5(
            F.concat_ws(
                ":", F.lit("qs"),
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ), 1, 4,
    )
    sample = li.where(key < "199a").select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
    half1 = sample.where(F.col("l_orderkey") % 2 == 0)
    half2 = sample.where(F.col("l_orderkey") % 2 == 1)
    merged = {tuple(r) for r in half1.union(half2).collect()}
    direct = {tuple(r) for r in sample.collect()}
    assert merged == direct  # merge == union of sample states, exactly

    out = {r.l_returnflag: r for r in agg_quantile_sketch_portable(spark, SF_SMALL).collect()}
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.median("l_extendedprice").alias("m"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for flag, r in out.items():
        ex = exact[flag]
        # ~10% deterministic sample: at sf0.001 a group keeps only
        # ~100 sampled rows, so quantile noise is real — the band is
        # a sanity rail (parity pins the exact values), not a recall
        # guarantee
        assert abs(r.est_median - ex.m) / ex.m < 0.25
        assert abs(r.est_p90 - ex.p) / ex.p < 0.25
        # sample rate sanity: 6554/65536 ± a wide deterministic band
        assert 0.05 * ex.n < r.n_sampled < 0.15 * ex.n


def test_profile_correlations_match_numpy(spark):
    """The decimal-exact moment formulation reproduces numpy's
    Pearson r to the snap precision, for every pair."""
    import numpy as np

    from netcdf_olap_spark.queries.analytics import profile_correlations

    rows = profile_correlations(spark, SF_SMALL).collect()
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    ).toPandas()
    assert len(rows) == 6
    for r in rows:
        want = np.corrcoef(li[r.col_x].astype(float), li[r.col_y].astype(float))[0, 1]
        assert abs(r.corr - want) < 1e-9, (r.col_x, r.col_y, r.corr, want)
        assert r.n_rows == len(li)


def test_pq_distortion_is_encoding_loss(spark):
    """The reported error equals the squared distance to the ENCODED
    centroid (what pq_encode actually picks), hand-checked for a few
    vectors; totals/max are exact integer micro-units."""
    from netcdf_olap_spark.operators import pq
    from netcdf_olap_spark.queries.similarity import emb_pq_distortion

    cbs = pq.md5_codebooks(m=4, k=8, subdim=16)
    rows = {r.label: r for r in emb_pq_distortion(spark, SF_SMALL).collect()}
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    want: dict[int, list[int]] = {}
    for r in e:
        v = [float(x) for x in r.embedding]
        err = 0.0
        for s in range(4):
            sub = v[s * 16 : (s + 1) * 16]
            dmin = None
            for c in cbs[s]:
                acc = 0.0
                for x, y in zip(sub, c):
                    acc += (x - y) * (x - y)
                dmin = acc if dmin is None or acc < dmin else dmin
            err += dmin
        want.setdefault(r.label, []).append(int(math.floor(err * 1_000_000.0 + 0.5)))
    assert set(rows) == set(want)
    for label, us in want.items():
        assert rows[label].n_vecs == len(us)
        assert rows[label].sum_err_units == sum(us)
        assert rows[label].max_err_units == max(us)
