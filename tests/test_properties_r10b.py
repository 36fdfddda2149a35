"""Property sweeps for the round-10 second-cohort algorithm cores —
a THIRD implementation (pure-Python brute force) against the DuckDB
oracle SQL on hypothesis-generated inputs, so the CONTRACT is checked
independently of the Spark↔DuckDB agreement the parity suite
already gives us.  DuckDB executes in-memory (no Spark session —
fast enough for dozens of examples)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _docs_rel(con, docs: list[str]):
    con.execute("CREATE OR REPLACE TABLE documents AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, ?)" for i in range(len(docs))) +
                ") t(doc_id, text)", docs)


WORDS = ["aa", "bb", "cc", "dd", "ee"]
doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=24).map(" ".join),
    min_size=2,
    max_size=6,
)


def _brute_extents(docs: list[str], w: int = 6):
    toks = [d.split() if d.strip() else [] for d in docs]
    spans: dict[tuple, set[int]] = {}
    for did, t in enumerate(toks):
        for i in range(len(t) - w + 1):
            spans.setdefault(tuple(t[i : i + w]), set()).add(did)
    dup = {s for s, ds in spans.items() if len(ds) >= 2}
    out = {}
    for did, t in enumerate(toks):
        starts = sorted(
            i + 1 for i in range(len(t) - w + 1) if tuple(t[i : i + w]) in dup
        )
        if not starts:
            continue
        exts = []
        lo = hi = starts[0]
        for i in starts[1:]:
            if i - hi > w:
                exts.append((lo, hi))
                lo = i
            hi = i
        exts.append((lo, hi))
        lens = [h - l + w for l, h in exts]
        out[did] = (len(exts), sum(lens), max(lens))
    return out


@SET
@given(doc_strategy)
def test_dup_span_extents_contract(docs):
    """DOC_DUP_EXTENTS_SQL == brute-force maximal-merge on random
    tiny corpora (n_extents, covered_tokens, max_extent_len)."""
    from netcdf_olap_spark.queries.text import DOC_DUP_EXTENTS_SQL

    con = duckdb.connect()
    _docs_rel(con, docs)
    got = {
        r[0]: (r[1], r[2], r[3]) for r in con.execute(DOC_DUP_EXTENTS_SQL).fetchall()
    }
    assert got == _brute_extents(docs)


@SET
@given(doc_strategy)
def test_dup_rewrite_contract(docs):
    """DOC_DUP_REWRITE_SQL: owners keep their extents, non-owners
    drop exactly the brute-force removal intervals, and the digest
    matches a brute-force rewrite."""
    from netcdf_olap_spark.queries.text import DOC_DUP_REWRITE_SQL

    w = 6
    toks = [d.split() if d.strip() else [] for d in docs]
    spans: dict[tuple, set[int]] = {}
    for did, t in enumerate(toks):
        for i in range(len(t) - w + 1):
            spans.setdefault(tuple(t[i : i + w]), set()).add(did)
    dup = {s: min(ds) for s, ds in spans.items() if len(ds) >= 2}
    expected = {}
    for did, t in enumerate(toks):
        starts = sorted(
            i + 1 for i in range(len(t) - w + 1) if tuple(t[i : i + w]) in dup
        )
        if not starts:
            continue
        exts = []
        lo = hi = starts[0]
        for i in starts[1:]:
            if i - hi > w:
                exts.append((lo, hi))
                lo = i
            hi = i
        exts.append((lo, hi))
        removed = [
            (l, h) for l, h in exts if dup[tuple(toks[did][l - 1 : l - 1 + w])] != did
        ]
        if not removed:
            continue
        drop = set()
        for l, h in removed:
            drop.update(range(l, h + w))
        kept = [tok for j, tok in enumerate(t, start=1) if j not in drop]
        expected[did] = (
            len(t),
            len(t) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    con = duckdb.connect()
    _docs_rel(con, docs)
    got = {r[0]: (r[1], r[2], r[3]) for r in con.execute(DOC_DUP_REWRITE_SQL).fetchall()}
    assert got == expected


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(1, 9), st.integers(0, 500)),
        min_size=1,
        max_size=40,
    )
)
def test_rfm_quintile_breaks_contract(rows):
    """The quintile-by-value scoring rule: score(v) = 1 + #breaks
    strictly below v, where break k is the smallest key whose
    cumulative count reaches ⌈k·n/5⌉ — checked against a brute-force
    scorer on random (recency, frequency, monetary) triples."""
    from netcdf_olap_spark.queries.analytics import EV_RFM_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {i}, TIMESTAMP '2000-01-01' + INTERVAL ({r}) DAY, {m}.0)"
            for i, (r, _f, m) in enumerate(rows)
        )
        + ") t(o_orderkey, o_custkey, o_orderdate, o_totalprice)"
    )
    got = con.execute(EV_RFM_SQL).fetchall()

    # brute force: one customer per row here, so frequency ≡ 1
    import math

    n = len(rows)
    ref = max(r for r, _f, _m in rows)

    def breaks(keys):
        ks = sorted(keys)
        out = []
        for k in (1, 2, 3, 4):
            need = math.ceil(k * n / 5)
            out.append(ks[need - 1])
        return out

    rk = [-(ref - r) for r, _f, _m in rows]
    fk = [1] * n
    mk = [m for _r, _f, m in rows]
    brk_r, brk_f, brk_m = breaks(rk), breaks(fk), breaks(mk)

    def score(v, br):
        return 1 + sum(1 for b in br if v > b)

    agg = {}
    for i, (r, _f, m) in enumerate(rows):
        key = (score(-(ref - r), brk_r), score(1, brk_f), score(m, brk_m))
        cnt, fr, mo = agg.get(key, (0, 0, 0))
        agg[key] = (cnt + 1, fr + 1, mo + m * 100)
    expected = sorted((k[0], k[1], k[2], v[0], v[1], v[2]) for k, v in agg.items())
    assert sorted(tuple(r) for r in got) == expected
