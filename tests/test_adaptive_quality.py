"""Per-source adaptive quality gate: the drop frontier is exactly the
bottom ``n_src DIV 10`` of each source, and never leaks across
sources (the property a GLOBAL threshold lacks by construction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from netcdf_olap_spark.queries.pipeline import doc_adaptive_quality_filter
from tests.conftest import SF_SMALL


def test_drop_count_exact_per_source(spark):
    out = doc_adaptive_quality_filter(spark, SF_SMALL)
    per_src = (
        out.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(~F.col("is_kept"), 1).otherwise(0)).alias("dropped"),
        )
        .collect()
    )
    assert per_src
    for r in per_src:
        assert r.dropped == r.n // 10, f"{r.source}: {r.dropped} != {r.n}//10"


def test_dropped_are_the_lowest_scores_within_source(spark):
    rows = doc_adaptive_quality_filter(spark, SF_SMALL).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        dropped = [(r.score_bp, r.doc_id) for r in rs if not r.is_kept]
        kept = [(r.score_bp, r.doc_id) for r in rs if r.is_kept]
        if dropped and kept:
            # every dropped (score, id) precedes every kept one in the
            # rank order — the frontier is a clean cut, no interleave
            assert max(dropped) < min(kept)


def test_adaptive_vs_global_threshold_diverges(spark):
    """The reason this operator exists: per-source cuts differ from
    one global cut whenever sources have different score profiles.
    At minimum the per-source frontier scores must not all be equal
    (degenerate corpus) OR the keep sets must coincide — assert we
    can tell which, deterministically."""
    rows = doc_adaptive_quality_filter(spark, SF_SMALL).collect()
    frontier = {}
    for r in rows:
        if not r.is_kept:
            frontier[r.source] = max(frontier.get(r.source, -1), r.score_bp)
    # with 20 synthetic sources the max-dropped-score varies by source
    assert len(set(frontier.values())) > 1 or len(frontier) <= 1


def _keepdrop(df):
    return {(r.doc_id, r.is_kept) for r in df.select("doc_id", "is_kept").collect()}


def test_auto_form_equals_window_form_balanced(spark):
    """The histogram-broadcast threshold reproduces the window form's
    keep/drop frontier exactly on the balanced fixture corpus."""
    from netcdf_olap_spark.queries.pipeline import doc_adaptive_quality_filter_auto

    win = doc_adaptive_quality_filter(spark, SF_SMALL)
    auto = doc_adaptive_quality_filter_auto(spark, SF_SMALL)
    assert _keepdrop(auto) == _keepdrop(win)


def test_auto_form_equals_window_form_on_90pct_skew(spark):
    """Monster-source fixture: 90% of docs remapped into ONE source.
    The auto form must still match the window form's frontier bit for
    bit — the scenario it exists for."""
    import os

    from pyspark.sql.window import Window

    from netcdf_olap_spark.queries.pipeline import _adaptive_scores, adaptive_quality_auto

    d = spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet")).withColumn(
        "source", F.when(F.col("doc_id") % 10 != 0, F.lit("mega")).otherwise(F.col("source"))
    )
    sizes = {r.source: r.n for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes["mega"] >= 0.85 * sum(sizes.values()), "fixture must actually be skewed"

    scored = _adaptive_scores(d)
    w = Window.partitionBy("source").orderBy(F.col("score_bp").asc(), F.col("doc_id").asc())
    nsrc = Window.partitionBy("source")
    win = (
        scored.withColumn("src_rank", F.row_number().over(w))
        .withColumn("n_src", F.count(F.lit(1)).over(nsrc))
        .select("doc_id", (F.col("src_rank") > F.expr("n_src DIV 10")).alias("is_kept"))
    )
    auto = adaptive_quality_auto(scored)
    assert _keepdrop(auto) == _keepdrop(win)
    # and the gate actually dropped the exact per-source counts
    dropped = {r.source: r.d for r in auto.groupBy("source").agg(
        F.sum(F.when(~F.col("is_kept"), 1).otherwise(0)).alias("d")).collect()}
    for src, n in sizes.items():
        assert dropped.get(src, 0) == n // 10


def test_auto_form_plan_has_no_per_source_doc_window(spark):
    """The point of the swap: no window over raw docs partitioned by
    `source` alone.  Any window whose ORDER includes doc_id (i.e. a
    doc-level ranking) must partition by (source, score_bp); windows
    partitioned by source alone may only order score_bp — the
    ≤10001-row histogram rows."""
    import re

    from netcdf_olap_spark.queries.pipeline import doc_adaptive_quality_filter_auto

    plan = (
        doc_adaptive_quality_filter_auto(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # forbidden: windowspecdefinition(source, score_bp ASC ..., doc_id ASC ...)
    # (partition = source alone, doc-level sort) or (source, doc_id ASC)
    assert not re.search(r"windowspecdefinition\(source#\w+, score_bp#\w+L? ASC[^)]*doc_id", plan), plan
    assert not re.search(r"windowspecdefinition\(source#\w+, doc_id#\w+L? ASC", plan), plan
    # required: the doc-level tie rank is scoped by (source, score_bp)
    assert re.search(r"windowspecdefinition\(source#\w+, score_bp#\w+L?, doc_id#\w+L? ASC", plan), plan


# ---------------------------------------------------------------------------
# Property sweep of the frontier-equivalence claim (the Spark fixtures
# above pin both implementations to these twins; hypothesis sweeps the
# ALGORITHM over adversarial shapes — heavy ties, all-one-score,
# tiny/giant sources, drop_k=0 — far beyond two fixtures).
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _window_dropped(rows):
    """Pure-Python twin of the window form: per source, the first
    n DIV 10 by (score, doc_id)."""
    by_src: dict[str, list[tuple[int, int]]] = {}
    for d, s, sc in rows:
        by_src.setdefault(s, []).append((sc, d))
    dropped = set()
    for lst in by_src.values():
        lst.sort()
        k = len(lst) // 10
        dropped |= {d for _, d in lst[:k]}
    return dropped


def _histogram_dropped(rows):
    """Pure-Python twin of adaptive_quality_auto: histogram →
    boundary score t + residual r → drop (score < t) ∪ first-r ties."""
    by_src: dict[str, list[tuple[int, int]]] = {}
    for d, s, sc in rows:
        by_src.setdefault(s, []).append((sc, d))
    dropped = set()
    for lst in by_src.values():
        n = len(lst)
        drop_k = n // 10
        if drop_k == 0:
            continue
        hist: dict[int, int] = {}
        for sc, _ in lst:
            hist[sc] = hist.get(sc, 0) + 1
        cum = 0
        for sc in sorted(hist):
            prev, cum = cum, cum + hist[sc]
            if cum >= drop_k and prev < drop_k:
                t, r = sc, drop_k - prev
                break
        ties = sorted(d for sc, d in lst if sc == t)
        dropped |= {d for sc, d in lst if sc < t} | set(ties[:r])
    return dropped


@settings(max_examples=400, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000),        # doc_id (deduped below)
            st.sampled_from(["a", "b", "c"]),
            st.integers(0, 3),             # tiny score domain → heavy ties
        ),
        min_size=0,
        max_size=120,
    )
)
def test_histogram_frontier_equals_window_frontier_property(rows):
    seen: set[int] = set()
    uniq = []
    for d, s, sc in rows:
        if d not in seen:
            seen.add(d)
            uniq.append((d, s, sc))
    assert _window_dropped(uniq) == _histogram_dropped(uniq)


def test_spark_auto_matches_twin_on_degenerate_ties(spark):
    """Pin the Spark implementation to the swept twin on the corner
    the sweep flags hardest: one source where EVERY doc has the same
    score (the whole drop quota resolves in the tie window), plus a
    two-score source and a too-small-to-drop source."""
    from netcdf_olap_spark.queries.pipeline import adaptive_quality_auto

    rows = (
        [(i, "flat", 7) for i in range(40)]
        + [(100 + i, "two", 1 if i < 15 else 2) for i in range(30)]
        + [(200 + i, "tiny", i) for i in range(9)]
    )
    df = spark.createDataFrame(
        [(d, s, sc) for d, s, sc in rows], "doc_id long, source string, score_bp long"
    )
    got_dropped = {
        r.doc_id for r in adaptive_quality_auto(df).collect() if not r.is_kept
    }
    assert got_dropped == _histogram_dropped(rows)
    assert got_dropped == _window_dropped(rows)
    # the flat source drops exactly its quota, lowest doc_ids first
    assert {d for d in got_dropped if d < 100} == set(range(4))
