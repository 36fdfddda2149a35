"""Span-level dedup, count-min sketch, and MMR rerank tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.operators import sketches, similarity, spandedup
from tests.conftest import SF_MED, SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_hashed_spans_match_string_spans(spark, docs):
    """The hashed (scale) span path must agree with the string path on
    every aggregate: same number of duplicated spans, same
    (n_docs, n_occ, example_doc) multiset."""
    h = spandedup.duplicate_spans(docs, w=6, min_docs=2, hashed=True)
    s = spandedup.duplicate_spans(docs, w=6, min_docs=2, hashed=False)
    hs = sorted(
        (r["n_docs"], r["n_occ"], r["example_doc"]) for r in h.collect()
    )
    ss = sorted(
        (r["n_docs"], r["n_occ"], r["example_doc"]) for r in s.collect()
    )
    assert hs == ss
    assert len(hs) > 0  # corpus contains near-dups → shared spans exist


def test_duplicate_spans_ground_truth(spark):
    rows = [
        (1, "a b c d e f g"),      # span1: "a b c d e f", span2: "b c d e f g"
        (2, "x a b c d e f y"),    # shares span1
        (3, "totally different words here only once"),
        (4, "a b c d e f g"),      # exact dup of 1: shares both
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["span"]: (r["n_docs"], r["n_occ"], r["example_doc"])
        for r in spandedup.duplicate_spans(df, w=6, min_docs=2, hashed=False).collect()
    }
    assert out == {
        "a b c d e f": (3, 3, 1),
        "b c d e f g": (2, 2, 1),
    }


def test_span_contamination_fractions(spark):
    rows = [
        (1, "a b c d e f g"),   # 2 spans, both duplicated
        (2, "a b c d e f g"),   # same
        (3, "p q r s t u v"),   # 2 spans, none duplicated
        (4, "short text"),      # no spans at all
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in spandedup.span_contaminated_docs(df, w=6).collect()}
    assert out[1]["n_spans"] == 2 and out[1]["n_dup_positions"] == 2
    assert out[1]["dup_fraction"] == 1.0
    assert out[3]["n_dup_positions"] == 0 and out[3]["dup_fraction"] == 0.0
    assert out[4]["n_spans"] == 0 and out[4]["dup_fraction"] == 0.0


def test_countmin_one_sided_and_bounded(spark, docs):
    """CM sketch invariant: estimate ≥ true count for every item, and
    the sketch has at most depth × 16^hex_digits rows."""
    toks = docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    sk = sketches.countmin_build(toks, "tok", depth=3, hex_digits=3)
    assert sk.count() <= 3 * 16**3
    true = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = sketches.countmin_estimate(sk, true.select("tok"), "tok", depth=3, hex_digits=3)
    j = true.join(est, "tok").collect()
    assert len(j) == true.count()
    n_total = toks.count()
    for r in j:
        assert r["cm_est"] >= r["true_cnt"], r
        # classic bound: overcount ≤ e/width · N per row, depth rows →
        # exceeding 3× the single-row bound simultaneously in all rows
        # is astronomically unlikely; this is a sanity ceiling.
        assert r["cm_est"] - r["true_cnt"] <= 3 * 2.72 * n_total / 16**3, r


def test_countmin_merge_equals_whole(spark, docs):
    """Sketch of the union == merge of per-part sketches (mergeability
    — the property that makes it a distributed/streaming aggregate)."""
    toks = docs.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    part1 = toks.where(F.col("doc_id") % 2 == 0)
    part2 = toks.where(F.col("doc_id") % 2 == 1)
    whole = sketches.countmin_build(toks, "tok", depth=2, hex_digits=2)
    merged = sketches.countmin_merge(
        sketches.countmin_build(part1, "tok", depth=2, hex_digits=2),
        sketches.countmin_build(part2, "tok", depth=2, hex_digits=2),
    )
    a = {(r["depth"], r["bucket"]): r["cnt"] for r in whole.collect()}
    b = {(r["depth"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert a == b


def _mmr_reference(vecs, ids, rel, k, lam):
    """Pure-numpy greedy MMR (independent re-implementation)."""
    norms = np.linalg.norm(vecs, axis=1)
    sim = (vecs @ vecs.T) / np.outer(norms, norms)
    chosen = []
    avail = list(range(len(ids)))
    while avail and len(chosen) < k:
        best, best_score = None, -np.inf
        for i in avail:
            div = max((sim[i][j] for j in chosen), default=0.0)
            score = lam * rel[i] - (1 - lam) * div
            if score > best_score:
                best, best_score = i, score
        chosen.append(best)
        avail.remove(best)
    return [ids[i] for i in chosen]


def test_mmr_matches_reference_and_diversifies(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    qvec = [
        r[0] for r in emb.where(F.col("vec_id") == 0).select(F.explode("embedding")).collect()
    ]
    pool = 30
    out = similarity.mmr_rerank(
        emb.where(F.col("vec_id") != 0), qvec, k=8, pool=pool, lam=0.6
    ).collect()
    assert [r["rank"] for r in out] == list(range(1, 9))

    # independent reference on the same pool
    cand = (
        emb.where(F.col("vec_id") != 0)
        .withColumn(
            "cos_sim",
            similarity.cosine(F.col("embedding"), F.array(*[F.lit(float(v)) for v in qvec])),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(pool)
        .collect()
    )
    cand.sort(key=lambda r: r["vec_id"])
    vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in cand])
    ids = [r["vec_id"] for r in cand]
    rel = np.array([r["cos_sim"] for r in cand])
    expected = _mmr_reference(vecs, ids, rel, k=8, lam=0.6)
    assert [r["vec_id"] for r in out] == expected

    # rank 1 is the plain top-1; later ranks trade relevance for
    # diversity, so MMR must differ from plain top-k somewhere unless
    # the pool is already diverse — assert scores are non-increasing
    # in relevance-only terms is NOT required; just check determinism:
    out2 = similarity.mmr_rerank(
        emb.where(F.col("vec_id") != 0), qvec, k=8, pool=pool, lam=0.6
    ).collect()
    assert [r["vec_id"] for r in out] == [r["vec_id"] for r in out2]


def test_semantic_dedup_precision_and_blocked_recall(spark):
    """Every dropped vector has a ≥-threshold twin with a lower id
    (precision 1.0); within-cluster recall is exact: any same-cluster
    pair at ≥ threshold implies the higher id is dropped."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    thr = 0.95
    out = similarity.semantic_dedup(emb, threshold=thr, n_lists=8)
    rows = out.collect()
    assert len(rows) == emb.count()
    by_id = {r["vec_id"]: r for r in rows}

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()
    }

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    clusters: dict[int, list[int]] = {}
    for r in rows:
        clusters.setdefault(r["cluster"], []).append(r["vec_id"])
    dropped = {r["vec_id"] for r in rows if not r["is_kept"]}
    expected_dropped = set()
    for members in clusters.values():
        ms = sorted(members)
        for j, vid2 in enumerate(ms):
            for vid1 in ms[:j]:
                if cos(vecs[vid1], vecs[vid2]) >= thr:
                    expected_dropped.add(vid2)
                    break
    assert dropped == expected_dropped
    assert all(by_id[v]["is_kept"] for v in vecs if v not in expected_dropped)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["a", "b", "c", "d", "e"])
_doc = st.lists(_word, min_size=0, max_size=14).map(" ".join)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_doc, min_size=2, max_size=8))
def test_duplicate_spans_property(spark, texts):
    """duplicate_spans == a brute-force python reference for ANY small
    corpus over a 5-word alphabet (adversarially repetitive inputs)."""
    w = 3
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    from collections import defaultdict

    per = defaultdict(lambda: defaultdict(int))  # span -> doc -> count
    for i, t in rows:
        toks = [x for x in t.split() if x]
        for j in range(len(toks) - w + 1):
            per[" ".join(toks[j : j + w])][i] += 1
    expected = {
        span: (len(d), sum(d.values()), min(d))
        for span, d in per.items()
        if len(d) >= 2
    }
    got = {
        r["span"]: (r["n_docs"], r["n_occ"], r["example_doc"])
        for r in spandedup.duplicate_spans(df, w=w, min_docs=2, hashed=False).collect()
    }
    assert got == expected


def test_countmin_zero_frequency_probe_returns_zero(spark, docs):
    """A probe absent from the sketched corpus must answer 0 (exact),
    not vanish from the output or over-estimate from partial matches —
    the left-join + coalesce(0) path."""
    from netcdf_olap_spark.operators import sketches, text

    toks = docs.select(F.explode(text.tokens("text")).alias("tok"))
    sk = sketches.countmin_build(toks, "tok", depth=3, hex_digits=3)
    probes = spark.createDataFrame(
        [("zzz-not-in-any-document-zzz",), ("qqq-also-absent-qqq",)], "tok string"
    )
    est = {r["tok"]: r["cm_est"] for r in
           sketches.countmin_estimate(sk, probes, "tok", depth=3, hex_digits=3).collect()}
    assert est == {"zzz-not-in-any-document-zzz": 0, "qqq-also-absent-qqq": 0}


def test_semantic_dedup_auto_n_lists_is_sqrt_n():
    assert similarity.auto_n_lists(0) == 1
    assert similarity.auto_n_lists(1) == 1
    assert similarity.auto_n_lists(64) == 8
    assert similarity.auto_n_lists(500) == 22
    assert similarity.auto_n_lists(1_000_000) == 1000


def test_semantic_dedup_pair_work_sublinear_with_auto_k(spark):
    """With k = √N the pair-stage work Σ cluster² must shrink
    RELATIVE to N² as the corpus grows (≈N^1.5 absolute) — the
    property a fixed k does not have. Measured on two deterministic
    slices of the sf0.1 embeddings corpus."""
    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")

    def pair_ratio(n: int) -> float:
        sub = emb.where(F.col("vec_id") < n)
        k = similarity.auto_n_lists(n)
        cents = similarity.ivf_train(sub, n_lists=k)
        sizes = (
            sub.select(similarity.assign_nearest_col(F.col("embedding"), cents).alias("c"))
            .groupBy("c")
            .count()
            .collect()
        )
        return sum(r["count"] ** 2 for r in sizes) / n**2

    r_small, r_big = pair_ratio(250), pair_ratio(2000)
    assert r_big < r_small, (r_small, r_big)
    # and absolutely sub-quadratic: far below the fixed-k=8 N²/8 bound
    assert r_big < 1 / 8


def test_assign_pandas_agrees_with_literal_path(spark):
    """The Arrow assignment path (large k) and the plan-constant fold
    path must agree on spread (tie-free) data."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").limit(200)
    cents = similarity.ivf_train(emb, n_lists=10)
    lit = emb.select(
        "vec_id", similarity.ivf_assign_col(F.col("embedding"), cents).alias("c")
    ).collect()
    pnd = emb.select(
        "vec_id", similarity.ivf_assign_pandas_col(F.col("embedding"), cents).alias("c")
    ).collect()
    assert {r["vec_id"]: r["c"] for r in lit} == {r["vec_id"]: r["c"] for r in pnd}


def test_semantic_dedup_at_rest_matches_and_pair_join_is_exchange_free(spark, tmp_path):
    """The bucketed-by-cluster at-rest layout: identical keep/drop
    decisions to the in-memory form, and the Σ cluster² pair
    self-join plans with ZERO Exchange of any kind (bucketed scans
    already provide the hash partitioning)."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    thr = 0.95
    want = {
        (r["vec_id"], r["cluster"], r["is_kept"])
        for r in similarity.semantic_dedup(emb, threshold=thr).collect()
    }

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = similarity.semantic_dedup_at_rest(
            spark, emb, "t_semdedup_rest", threshold=thr, path=str(tmp_path / "sd")
        )
        got = {(r["vec_id"], r["cluster"], r["is_kept"]) for r in out.collect()}
        assert got == want

        pairs = similarity.semantic_pair_candidates(spark.table("t_semdedup_rest"), thr)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"pair join still shuffles:\n{plan}"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_semdedup_rest")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
