"""Invariants for the maintenance / budget / regrid queries — beyond
the DuckDB parity (which proves cross-engine equality, not
domain-correctness)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.queries.grid import grid_regrid_bilinear
from netcdf_olap_spark.queries.maintenance import INSERT_OFFSET, cdc_merge_orders
from netcdf_olap_spark.queries.pipeline import doc_budget_select
from tests.conftest import SF_ORACLE


def test_cdc_merge_accounting(spark):
    """Merged row count must equal base − deletes + inserts, and the
    merged total must equal base total − deleted prices + 100·updates
    + 42·inserts (delete-wins precedence on keys hit by both rules)."""
    base = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    k = F.col("o_orderkey")
    n_base = base.count()
    n_del = base.where(k % 37 == 0).count()
    n_upd = base.where((k % 10 == 3) & (k % 37 != 0)).count()
    n_ins = base.where(k % 53 == 0).count()

    out = cdc_merge_orders(spark, SF_ORACLE)
    rows = out.collect()
    assert sum(r.n_rows for r in rows) == n_base - n_del + n_ins

    base_total = base.agg(F.sum(F.col("o_totalprice").cast("decimal(30,2)"))).first()[0]
    del_total = base.where(k % 37 == 0).agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
    ).first()[0]
    got_total = sum(r.total_price for r in rows)
    want = float(base_total) - float(del_total) + 100.0 * n_upd + 42.0 * n_ins
    assert got_total == pytest.approx(want, rel=1e-9)


def test_budget_select_respects_and_fills_budget(spark):
    """Kept chars per source must be ≤ 60% of the source total, and
    adding the next-ranked doc must exceed it (maximality of the
    greedy fill)."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    totals = {r.source: r.t for r in docs.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()}
    ranked: dict[str, list[tuple[int, int]]] = {}
    for r in docs.select("source", "doc_id", "n_chars").collect():
        ranked.setdefault(r.source, []).append((-r.n_chars, r.doc_id))
    kept = {}
    for r in doc_budget_select(spark, SF_ORACLE).collect():
        kept.setdefault(r.source, set()).add(r.doc_id)
    for src, total in totals.items():
        budget = total * 60
        order = sorted(ranked[src])
        run = 0
        expect = set()
        for negc, did in order:
            if (run + -negc) * 100 <= budget:
                run += -negc
                expect.add(did)
            else:
                break  # greedy prefix stops at the first overflow
        assert kept.get(src, set()) == expect, src


def test_regrid_values_within_source_envelope(spark):
    """Every interpolated value must lie within [min, max] of the
    source slice (a convex combination cannot escape the envelope),
    and the target grid must be the (H-1)×(W-1) interior."""
    from netcdf_olap_spark.session import load_grid

    src = load_grid(spark).where(
        (F.col("variable") == "avg_night_temp") & (F.col("time") == F.lit("1990-01-07"))
    )
    lo, hi = src.agg(F.min("value"), F.max("value")).first()
    h = src.agg(F.countDistinct("y")).first()[0]
    w = src.agg(F.countDistinct("x")).first()[0]
    out = grid_regrid_bilinear(spark, SF_ORACLE).collect()
    n_null = src.where(F.col("value").isNull()).count()
    assert len(out) <= (h - 1) * (w - 1)
    if n_null == 0:
        assert len(out) == (h - 1) * (w - 1)
    for r in out:
        assert lo - 1e-9 <= r.interp <= hi + 1e-9
