"""Structural guard against zero-signal checks: EVERY oracle-backed
registry query must return at least one row at the driver's
correctness scale factor (sf0.01).  A query whose expected output is
empty trivially matches its oracle on rows, schema, and hash — the
r9 `join_anti` trap, found twice more in r10 (`q22_dormant_customers`
whose dormancy cutoff predated the data, `doc_token_assoc` whose
frequency band matched one token).  Runs on DuckDB only (no Spark) —
the full sweep is ~a minute."""

from __future__ import annotations

import duckdb
import pytest

from netcdf_olap_spark.queries import all_oracle_sql

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: queries whose oracle legitimately CAN be empty (none today — add
#: here with a justification if one ever appears)
ALLOWED_EMPTY: frozenset[str] = frozenset()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_every_oracle_nonempty_at_sf001(con):
    empty, errors = [], []
    for name, sql in all_oracle_sql().items():
        if name in ALLOWED_EMPTY:
            continue
        try:
            n = con.execute(f"SELECT COUNT(*) FROM ({sql})").fetchone()[0]
        except Exception as e:  # noqa: BLE001 — collect, report all at once
            errors.append((name, str(e).splitlines()[0][:120]))
            continue
        if n == 0:
            empty.append(name)
    assert not errors, f"oracles failed to execute: {errors}"
    assert not empty, (
        f"zero-row oracles at sf0.01 (signal-free checks — re-parameterize "
        f"or justify in ALLOWED_EMPTY): {empty}"
    )


def test_every_window_row_carries_an_oracle():
    """The driver's 50-entry checked window must contain ONLY
    value-level-checkable queries (a rows-only window row wastes the
    slot — the r5 lesson that moved doc_minhash_portable in)."""
    from netcdf_olap_spark.queries import all_oracle_sql, all_queries

    window = list(all_queries())[:50]
    sqls = all_oracle_sql()
    missing = [n for n in window if n not in sqls]
    assert not missing, f"window rows without a value oracle: {missing}"


def test_rows_only_set_is_exactly_the_justified_four():
    """Rows-only queries are capped at the four inexpressible-in-
    principle cases; any new rows-only registration must either gain
    an oracle or extend this list with a justification."""
    from netcdf_olap_spark.queries import all_oracle_sql, all_queries

    rows_only = set(all_queries()) - set(all_oracle_sql())
    assert rows_only == {
        "emb_knn_ivf",        # Lloyd-trained coarse quantizer
        "emb_pq_topk",        # Lloyd-trained codebooks
        "emb_semantic_dedup",  # Lloyd-trained clustering
        "media_image_features",  # seeded-RNG pixel statistics
    }, rows_only
