"""Product-quantization semantics: determinism, code validity,
compression contract, ADC recall vs exact L2, plan purity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.operators import pq
from tests.conftest import SF_SMALL

M, K, ITERS = 16, 16, 3


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


@pytest.fixture(scope="module")
def codebooks(emb):
    return pq.pq_train(emb, m=M, k=K, n_iters=ITERS)


def test_codebook_shape(codebooks):
    assert len(codebooks) == M
    assert all(len(cb) == K for cb in codebooks)
    assert all(len(c) == 64 // M for cb in codebooks for c in cb)


def test_training_is_deterministic(emb, codebooks):
    again = pq.pq_train(emb, m=M, k=K, n_iters=ITERS)
    for cb1, cb2 in zip(codebooks, again):
        for c1, c2 in zip(cb1, cb2):
            np.testing.assert_allclose(c1, c2, rtol=0, atol=0)


def test_distributed_lloyd_equals_local(emb, codebooks):
    """The distributed trainer (posexplode → grouped means, one
    shuffle per iteration) must reproduce a local numpy Lloyd run
    bit-for-bit: same init, same assignment, same update rule. This
    pins the exactness of the scale formulation — only m×k×subdim
    scalars ever reach the driver, yet the result is identical to
    having all vectors in memory."""
    rows = emb.orderBy("vec_id").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    subdim = X.shape[1] // M
    seeds = X[:K]
    local = [[seeds[j % K, s * subdim:(s + 1) * subdim].copy() for j in range(K)] for s in range(M)]
    for _ in range(ITERS):
        new = [[c.copy() for c in cb] for cb in local]
        for s in range(M):
            sub = X[:, s * subdim:(s + 1) * subdim]
            d = ((sub[:, None, :] - np.array(local[s])[None, :, :]) ** 2).sum(2)
            code = d.argmin(1)
            for j in range(K):
                sel = sub[code == j]
                if len(sel):
                    new[s][j] = sel.mean(0)
        local = new
    for s in range(M):
        for j in range(K):
            np.testing.assert_allclose(codebooks[s][j], local[s][j], rtol=0, atol=0)


def test_codes_valid_and_compressed(emb, codebooks):
    enc = pq.pq_encode(emb, codebooks)
    rows = enc.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r.codes) == M  # 64 floats -> 8 small ints
        assert all(0 <= c < K for c in r.codes)


def test_adc_recall_vs_exact(emb, codebooks, spark):
    """ADC top-10 must substantially agree with exact L2 top-10 —
    the embeddings are label-clustered, so a working quantizer keeps
    most true neighbors."""
    qv = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    enc = pq.pq_encode(emb, codebooks)
    got = [r.vec_id for r in pq.adc_topk(enc, qv, codebooks, k=10).collect()]

    q = F.array(*[F.lit(v) for v in qv])
    d = F.aggregate(
        F.zip_with("embedding", q, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    exact = [
        r.vec_id
        for r in emb.select("vec_id", d.alias("d")).orderBy("d", "vec_id").limit(10).collect()
    ]
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.5, f"ADC recall {recall} vs exact {exact} got {got}"


def test_ivfpq_at_rest_prunes_and_matches(emb, codebooks, spark, tmp_path):
    """IVF-PQ layout executed end-to-end: codes-only rows partitioned
    by coarse list; the probe reads a strict file subset (partition
    pruning) drawn from the probed lists, and its ADC results equal
    ADC over an unpartitioned encode restricted to the same lists."""
    import re

    from netcdf_olap_spark.operators import similarity

    qv = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    corpus = emb.where(F.col("vec_id") != 0)
    cents = similarity.ivf_train(corpus, n_lists=8, n_iters=2)

    idx = str(tmp_path / "ivfpq_index")
    pq.write_ivfpq_index(corpus, idx, cents, codebooks)

    probed = pq.probe_ivfpq_index(spark, idx, qv, cents, codebooks, k=10, nprobe=3)
    got = [(r.vec_id, round(r.adc_dist, 9)) for r in probed.collect()]

    # reference: ADC over the in-memory encode restricted to the same lists
    probe_ids = similarity.ivf_assign_col(F.col("embedding"), cents)
    enc = pq.pq_encode(corpus, codebooks, id_col="vec_id")
    # recompute the probe set the same way probe_ivfpq_index does
    qarr = np.asarray(qv)
    probe = [int(i) for i in np.argsort([float(((qarr - c) ** 2).sum()) for c in cents], kind="stable")[:3]]
    keep = corpus.select("vec_id", probe_ids.alias("_l")).where(F.col("_l").isin(probe)).select("vec_id")
    want = [
        (r.vec_id, round(r.adc_dist, 9))
        for r in pq.adc_topk(enc.join(keep, "vec_id"), qv, codebooks, k=10).collect()
    ]
    assert got == want

    all_files = {r[0] for r in spark.read.parquet(idx).select(F.input_file_name()).distinct().collect()}
    cand = spark.read.parquet(idx).where(F.col("list_id").isin(probe))
    read_files = {r[0] for r in cand.select(F.input_file_name()).distinct().collect()}
    assert read_files < all_files
    assert all(any(f"list_id={i}/" in f for i in probe) for f in read_files)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[(?!\])", plan), plan[:500]


def test_adc_is_pure_map_plan(emb, codebooks):
    """Encoding + ADC scoring must stay map-side: no join, no
    aggregate exchange before the top-k (the codebooks are plan
    constants)."""
    qv = [0.0] * 64
    out = pq.adc_topk(pq.pq_encode(emb, codebooks), qv, codebooks, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_write_ivfpq_assignment_matches_arrow_path_at_large_k(emb, codebooks, spark, tmp_path):
    """write_ivfpq_index routes through assign_nearest_col, so above
    PLAN_LITERAL_MAX_LISTS the coarse assignment comes from the Arrow
    path — no k×dim literal bloat — and the at-rest list membership
    matches the in-memory assignment exactly (regression: it used to
    call ivf_assign_col unconditionally)."""
    from netcdf_olap_spark.operators import similarity

    rng_rows = emb.orderBy("vec_id").limit(similarity.PLAN_LITERAL_MAX_LISTS + 4).collect()
    cents = [np.asarray(r.embedding, dtype=np.float64) for r in rng_rows]
    assert len(cents) > similarity.PLAN_LITERAL_MAX_LISTS

    idx = str(tmp_path / "ivfpq_large_k")
    corpus = emb.limit(300)
    pq.write_ivfpq_index(corpus, idx, cents, codebooks)

    got = {
        r.vec_id: r.list_id
        for r in spark.read.parquet(idx).select("vec_id", "list_id").collect()
    }
    want = {
        r.vec_id: r.l
        for r in corpus.select(
            "vec_id", similarity.assign_nearest_col(F.col("embedding"), cents).alias("l")
        ).collect()
    }
    assert got == want


def test_md5_codebooks_deterministic_and_portable_twin_matches_numpy(emb, spark):
    """The md5 codebooks are build-time deterministic, and the
    integer-unit ADC path (emb_pq_portable's machinery) matches an
    independent numpy replay of encode + LUT-sum exactly."""
    import math

    cbs = pq.md5_codebooks(m=4, k=8, subdim=16)
    assert [list(map(float, c)) for cb in cbs for c in cb] == [
        list(map(float, c)) for cb in pq.md5_codebooks(m=4, k=8, subdim=16) for c in cb
    ]
    assert all(abs(float(x)) <= 0.25 for cb in cbs for c in cb for x in c)

    rows = emb.orderBy("vec_id").limit(80).collect()
    qvec = [float(x) for x in rows[0].embedding]
    corpus = [(r.vec_id, [float(x) for x in r.embedding]) for r in rows[1:]]

    # numpy-free scalar replay (exact fold order)
    def sq(sub, cent):
        acc = 0.0
        for p in range(16):
            d = sub[p] - float(cent[p])
            acc += d * d
        return acc

    luts = pq.adc_lut_units(qvec, cbs)
    want = []
    for vid, v in corpus:
        units = 0
        for s, cb in enumerate(cbs):
            sub = v[s * 16 : (s + 1) * 16]
            dists = [sq(sub, c) for c in cb]
            code = dists.index(min(dists))
            units += luts[s][code]
        want.append((vid, units))
    want = sorted(want, key=lambda t: (t[1], t[0]))[:10]

    df = spark.createDataFrame([(i, v) for i, v in corpus], "vec_id long, embedding array<float>")
    enc = pq.pq_encode(df, cbs)
    got = [(r.vec_id, r.adc_units) for r in pq.adc_topk_units(enc, luts, k=10).collect()]
    assert got == want


def test_adc_topk_units_plan_is_narrow(emb, spark):
    """Encode+score is pure map over plan constants; top-k is
    TakeOrderedAndProject — no shuffle beyond it, no Python."""
    cbs = pq.md5_codebooks(m=4, k=8, subdim=16)
    luts = pq.adc_lut_units([0.0] * 64, cbs)
    df = pq.adc_topk_units(pq.pq_encode(emb.where(F.col("vec_id") != 0), cbs), luts, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    for n in ("ArrowEvalPython", "BatchEvalPython", "Exchange"):
        assert n not in plan


def test_pq_train_sample_deterministic_and_adc_recall(emb, spark):
    """Sample-trained codebooks are bitwise run-to-run identical (no
    RNG; id-sorted sample, first-k init) and the resulting ADC top-10
    overlaps the exact L2 top-10 — the recall bar the distributed
    training path is held to."""
    corpus = emb.where(F.col("vec_id") != 0)
    c1 = pq.pq_train_sample(corpus, m=M, k=K, n_iters=ITERS)
    c2 = pq.pq_train_sample(corpus, m=M, k=K, n_iters=ITERS)
    assert all(
        (a == b).all() for cb1, cb2 in zip(c1, c2) for a, b in zip(cb1, cb2)
    )
    qvec = [r[0] for r in emb.where(F.col("vec_id") == 0).select(F.explode("embedding")).collect()]
    got = {r.vec_id for r in pq.knn_pq(corpus, qvec, k=10, codebooks=c1).collect()}
    exact = {
        r.vec_id
        for r in corpus.select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.array(*[F.lit(float(v)) for v in qvec]),
                    lambda x, y: x.cast("double") - y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v * v,
            ).alias("d2"),
        )
        .orderBy("d2", "vec_id")
        .limit(10)
        .collect()
    }
    assert len(got & exact) >= 5, (got, exact)
