"""Content-defined chunking (doc_shift_dedup) + leakage-safe split
(doc_cluster_split): the semantic invariants the DuckDB parity hash
cannot express on its own.

- Reconstruction: CDC chunks partition the token stream exactly.
- Shift robustness: a passage embedded at a different offset in
  another document still yields identical chunks (the property
  fixed-stride span keys lack by construction).
- No-straddle: no near-dup pair crosses a train/val/test boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from netcdf_olap_spark.operators import dedup, text
from netcdf_olap_spark.queries.text import doc_cluster_split, doc_shift_dedup
from tests.conftest import SF_SMALL


def _chunks(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = df.select("doc_id", text.tokens("text").alias("t"))
    cuts = toks.select("doc_id", "t", text.content_cutpoints(F.col("t")).alias("c"))
    out = cuts.select(
        "doc_id", "t", "c", text.chunks_from_cuts(F.col("t"), F.col("c")).alias("ch")
    )
    return {r["doc_id"]: r for r in out.collect()}


# Non-periodic 60-token passage (a periodic one has too few distinct
# hash windows to produce any cutpoint): 6 CDC cutpoints, verified.
PASSAGE = " ".join(f"w{(i * i) % 97}x{i % 7}" for i in range(60))


def _py_cutpoints(toks: list[str], k: int = 3, modulus: int = 8) -> list[int]:
    """Pure-Python twin of content_cutpoints — lets hypothesis sweep
    thousands of token streams without a Spark job per example; its
    equality to the Spark expression is pinned once below."""
    import hashlib

    n = len(toks)
    cuts = [0]
    for p in range(k, n):  # p >= k and p < n, 1-based
        win = " ".join(toks[p - k : p])
        if int(hashlib.md5(win.encode()).hexdigest()[:13], 16) % modulus == 0:
            cuts.append(p)
    cuts.append(n)
    return cuts


def test_py_twin_matches_spark(spark):
    docs = [(1, PASSAGE), (2, "solo"), (3, "two tokens"), (4, "x " * 200), (5, "a b c d")]
    rows = _chunks(spark, docs)
    for i, text_ in docs:
        toks = text_.split()
        assert rows[i]["c"] == _py_cutpoints(rows[i]["t"]), f"doc {i}"
        assert rows[i]["t"] == [t for t in text_.split() if t]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_tok = st.text(alphabet="abcdefg", min_size=1, max_size=3)


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(toks=st.lists(_tok, min_size=0, max_size=80), prefix=st.lists(_tok, min_size=1, max_size=9))
def test_cdc_properties_pure(toks, prefix):
    """Structural invariants over arbitrary token streams (pure-Python
    twin): cutpoints strictly increase and partition [0, n]; and the
    RE-SYNC guarantee — every interior cutpoint of T at p ≥ k survives
    (shifted) in prefix+T, because its k-token window lies wholly
    inside T. This is the exact property that makes chunk keys
    shift-robust."""
    k = 3
    cuts = _py_cutpoints(toks)
    assert cuts[0] == 0 and cuts[-1] == len(toks)
    if not toks:
        # the operator contract excludes empty docs (callers filter
        # size > 0); the raw expression yields the degenerate [0, 0]
        assert cuts == [0, 0]
        return
    assert cuts == sorted(set(cuts))
    shifted = _py_cutpoints(prefix + toks)
    off = len(prefix)
    interior = [p for p in cuts[1:-1]]  # already p >= k by construction
    for p in interior:
        assert p + off in shifted, f"cutpoint {p} lost after {off}-token shift"


def test_cutpoints_partition_token_stream(spark):
    rows = _chunks(
        spark,
        [(1, PASSAGE), (2, "solo"), (3, "two tokens"), (4, "x " * 200)],
    )
    for r in rows.values():
        cuts, toks, chunks = r["c"], r["t"], r["ch"]
        assert cuts[0] == 0 and cuts[-1] == len(toks)
        assert cuts == sorted(set(cuts)), "cutpoints strictly increasing"
        # chunks concatenate back to the exact token stream
        assert " ".join(chunks) == " ".join(toks)
        assert all(c for c in chunks), "no empty chunk"


def test_shift_robustness_against_fixed_stride(spark):
    """Embed PASSAGE at a 7-token offset in doc 2: CDC chunk keys
    re-synchronize, fixed-stride 16-token span keys cannot match."""
    shifted = "zig zag wobble qux quux corge grault " + PASSAGE
    rows = _chunks(spark, [(1, PASSAGE), (2, shifted)])
    c1, c2 = set(rows[1]["ch"]), set(rows[2]["ch"])
    shared = c1 & c2
    # every chunk of doc 1 after the first in-passage cutpoint matches
    assert len(shared) >= len(rows[1]["ch"]) - 1 >= 2
    shared_tokens = sum(len(c.split()) for c in shared)
    assert shared_tokens >= 40, f"most of the 60-token passage rediscovered, got {shared_tokens}"
    # the fixed-stride comparison: 16-token aligned slices never line up
    fixed1 = {" ".join(rows[1]["t"][i : i + 16]) for i in range(0, 60, 16)}
    fixed2 = {" ".join(rows[2]["t"][i : i + 16]) for i in range(0, 67, 16)}
    assert not (fixed1 & fixed2), "7-token shift defeats stride keys — CDC's advantage"


def test_shift_dedup_query_flags_both_docs(spark):
    out = {r["doc_id"]: r for r in doc_shift_dedup(spark, SF_SMALL).collect()}
    assert out, "non-empty corpus"
    assert all(r["n_chunks"] > 0 for r in out.values())
    assert all(0 <= r["n_dup_chunks"] <= r["n_chunks"] for r in out.values())
    # duplication is symmetric: a dup chunk exists in >=2 docs, so the
    # flagged population can never be a single document
    n_flagged = sum(1 for r in out.values() if r["n_dup_chunks"] > 0)
    assert n_flagged != 1


def test_boilerplate_scoped_per_source_and_removed(spark):
    """Planted template: 4/5 docs of source A share a footer passage →
    flagged + removed there; the SAME passage in 2 docs of source B is
    below threshold → untouched (per-source scoping is the point)."""
    import hashlib

    from netcdf_olap_spark.queries.text import doc_boilerplate

    footer = "copyright acme corp all rights reserved contact us terms of service apply here"
    bodies = {
        1: f"{PASSAGE} {footer}",
        2: f"alpha beta gamma delta {footer}",
        3: f"{footer} epsilon zeta eta theta iota kappa",
        4: f"unique content row {footer} trailing words here now",
        5: "a document with no template at all in it",
        6: f"other site page one {footer}",
        7: f"other site page two {footer}",
    }
    rows = [
        (i, t, "en", "srcA" if i <= 5 else "srcB", len(t)) for i, t in bodies.items()
    ]
    # srcD: 3 tokenized docs sharing the footer + 30 whitespace-only
    # rows — the 10% bar must count docs that CAN hold a chunk (3 of
    # 3 ≥ max(3, ceil(0.3)) → flagged); a raw-row denominator would
    # demand ceil(3.3)=4 and let the template through
    rows += [(100 + j, f"dpage number {j} {footer}", "en", "srcD", 1) for j in range(3)]
    rows += [(200 + j, "   ", "en", "srcD", 3) for j in range(30)]
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{td}/documents.parquet")
        out = {r["doc_id"]: r for r in doc_boilerplate(spark, td).collect()}

    # empty docs emit no row (nothing to chunk); srcD's template fires
    assert all(200 + j not in out for j in range(30))
    assert all(out[100 + j]["n_boiler_chunks"] > 0 for j in range(3))

    # srcA: the footer's chunks are in 4 of 5 docs ≥ max(3, ceil(0.5)) → boiler
    assert all(out[i]["n_boiler_chunks"] > 0 for i in (1, 2, 3, 4))
    assert out[5]["n_boiler_chunks"] == 0
    # srcB: same text, only 2 docs < 3 → NOT boiler there
    assert out[6]["n_boiler_chunks"] == 0 and out[7]["n_boiler_chunks"] == 0
    # removal is real: doc 5 (nothing removed) hashes to its own text
    assert out[5]["clean_md5"] == hashlib.md5(bodies[5].encode()).hexdigest()
    # doc 2's cleaned text loses the footer chunks but keeps its prefix
    assert out[2]["clean_md5"] != hashlib.md5(bodies[2].encode()).hexdigest()
    assert out[2]["n_chunks"] > out[2]["n_boiler_chunks"] >= 1


def test_source_overlap_counts_shared_passages_once(spark):
    """Planted: PASSAGE appears in srcA (2 docs) and srcB (1 doc) →
    the (srcA, srcB) cell counts each shared ≥4-token chunk ONCE
    (distinct-before-join), and sources sharing nothing emit no row."""
    import tempfile

    from netcdf_olap_spark.queries.text import doc_source_overlap

    docs = [
        (1, PASSAGE, "en", "srcA", 0),
        (2, "prefix words here " + PASSAGE, "en", "srcA", 0),
        (3, PASSAGE + " suffix tail", "en", "srcB", 0),
        (4, "totally disjoint content alpha beta gamma delta epsilon zeta", "en", "srcC", 0),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{td}/documents.parquet")
        out = {(r.s1, r.s2): r.n_shared_chunks for r in doc_source_overlap(spark, td).collect()}
    assert ("srcA", "srcB") in out and out[("srcA", "srcB")] >= 2
    assert all("srcC" not in k for k in out)
    # doc 1 and doc 2 both hold the passage, but the distinct
    # collapses them: the count is per chunk, not per occurrence
    rows = _chunks(spark, [(1, PASSAGE)])
    n_big_chunks = sum(1 for c in rows[1]["ch"] if len(c.split()) >= 4)
    assert out[("srcA", "srcB")] <= n_big_chunks + 2  # ±re-sync edge chunks


def test_cluster_split_never_straddles_near_dup_pairs(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    pairs = dedup.jaccard_pairs(docs, threshold=0.12, n=3)
    split = doc_cluster_split(spark, SF_SMALL)
    straddles = (
        pairs.join(split.select(F.col("doc_id").alias("id1"), F.col("split").alias("s1")), "id1")
        .join(split.select(F.col("doc_id").alias("id2"), F.col("split").alias("s2")), "id2")
        .where(F.col("s1") != F.col("s2"))
        .count()
    )
    assert straddles == 0
    # all three splits materialize and cover every document
    dist = {r["split"]: r["c"] for r in split.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(dist.values()) == docs.count()
    assert set(dist) <= {"train", "val", "test"} and dist.get("train", 0) > 0
