"""Oracle-differential regression tests: every registered query vs
its DuckDB twin at sf0.001 (fast). The driver-faithful run at sf0.01
is ``python tools/parity.py``."""

from __future__ import annotations

import pytest

from netcdf_olap_spark.queries import all_oracle_sql, all_queries
from tests.conftest import SF_SMALL
from tools.parity import compare

QUERIES = all_queries()
ORACLES = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    problems = compare(name, spark, SF_SMALL, QUERIES[name], ORACLES[name])
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
