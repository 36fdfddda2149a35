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


def test_straddle_fraction_sane(spark):
    rows = doc_context_pack(spark, SF_SMALL).collect()
    n_straddle = sum(1 for r in rows if r.straddles)
    # docs are far shorter than 512 tokens, so most CANNOT straddle —
    # but with gapless packing roughly one doc per window boundary
    # does; both extremes (none / all) would mean broken arithmetic
    assert 0 < n_straddle < len(rows) / 2
