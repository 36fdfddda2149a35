"""Sequence-packing invariants (doc_context_pack): the per-source
concatenation is gapless, window ids tile contiguously, and the
straddle flag is exactly 'first_win < last_win'."""

from __future__ import annotations

from netcdf_olap_spark.queries.pipeline import doc_context_pack
from tests.conftest import SF_SMALL

C = 512


def test_windows_tile_contiguously_per_source(spark):
    rows = doc_context_pack(spark, SF_SMALL).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        run = 0
        for r in rs:
            # recompute the running offset: packing is gapless
            assert r.first_win == run // C
            run += r.n_tokens
            assert r.last_win == (run - 1) // C
            assert r.straddles == (r.first_win < r.last_win)
            assert r.n_tokens > 0
        # total windows for the source = ceil(total / C)
        assert rs[-1].last_win == (run - 1) // C == (run + C - 1) // C - 1


def test_epoch_orders_are_permutations_and_decorrelated(spark):
    """Each (epoch, source) order is a 1..n permutation, and the two
    epochs' permutations actually differ (the reshuffle is real)."""
    from netcdf_olap_spark.queries.pipeline import doc_epoch_order

    rows = doc_epoch_order(spark, SF_SMALL).collect()
    by = {}
    for r in rows:
        by.setdefault((r.epoch, r.source), []).append(r.ord_in_source)
    assert by
    for (_e, _s), ords in by.items():
        assert sorted(ords) == list(range(1, len(ords) + 1))
    pos = {(r.doc_id, r.epoch): r.ord_in_source for r in rows}
    same = sum(1 for (d, e), p in pos.items() if e == 0 and pos[(d, 1)] == p)
    n = sum(1 for (_d, e) in pos if e == 0)
    assert same < n / 2, f"epoch orders nearly identical: {same}/{n}"


def test_straddle_fraction_sane(spark):
    rows = doc_context_pack(spark, SF_SMALL).collect()
    n_straddle = sum(1 for r in rows if r.straddles)
    # docs are far shorter than 512 tokens, so most CANNOT straddle —
    # but with gapless packing roughly one doc per window boundary
    # does; both extremes (none / all) would mean broken arithmetic
    assert 0 < n_straddle < len(rows) / 2
