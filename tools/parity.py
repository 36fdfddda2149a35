"""Local mirror of the driver's oracle-differential check.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf directory, normalizes (sort columns by
name, canonicalize cell values, sort rows), and compares exactly —
stricter than any reasonable hash, so passing here implies passing
the driver's CORRECTNESS gate.

CLI: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

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


def _canon(v):
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        # DIGIT-EXACT: keep the Decimal (round-10 lesson — float(v)
        # here masked the grid_morans_i failure: errors past the
        # 53-bit mantissa are invisible to float64 but fatal to the
        # driver).  Python's Decimal __eq__/__hash__ are numerically
        # EXACT, including against int/float — so a decimal-vs-decimal
        # compare catches 1-ulp-at-scale-12 diffs, while a float
        # column matching a DECIMAL oracle column still compares equal
        # exactly when the values are equal (Decimal('42.0') == 42.0),
        # which is what the driver's hash observably does
        # (CORRECTNESS_r10: grid_ingest_nc pass, grid_morans_i fail).
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (int, str)):
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "isoformat"):  # pandas Timestamp
        return v.isoformat()
    return str(v)


def _sort_key(row):
    # Numeric cells sort in one shared order regardless of concrete
    # type (int/float/Decimal all interoperate exactly in Python), so
    # a float column on one engine and a DECIMAL column on the other
    # still pair up row-for-row; everything else sorts by type+str.
    key = []
    for x in row:
        if x is None:
            key.append((True, "", ""))
        elif isinstance(x, (int, float, decimal.Decimal)) and not isinstance(x, bool):
            key.append((False, "num", x))
        else:
            key.append((False, str(type(x)), str(x)))
    return tuple(key)


def normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return cols_sorted, out


def run_duckdb(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def run_spark(fn, spark, sf_dir: str):
    df = fn(spark, sf_dir)
    rows = [tuple(r) for r in df.collect()]
    return list(df.columns), rows


def hazard_audit(name: str, spark, sf_dir: str, fn, sql: str | None) -> list[str]:
    """Flag output types the DRIVER's canonicalizer mishandles even
    when local parity passes (round-1 lessons):

    - DuckDB HUGEINT/UHUGEINT output (bare SUM over integers) hashes
      differently from Spark's bigint → silent hash_match=false.
    - array/list result cells → pandas factorize TypeError (row errs).
    """
    problems: list[str] = []
    df = fn(spark, sf_dir)
    for f in df.schema.fields:
        if f.dataType.typeName() in ("array", "map", "struct"):
            problems.append(f"{name}: Spark output column {f.name} is {f.dataType.simpleString()} (driver canonicalizer cannot hash it)")
    if sql is not None:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        cur = con.execute(f"DESCRIBE {sql}")
        for col, typ, *_ in cur.fetchall():
            tu = str(typ).upper()
            if "HUGEINT" in tu:
                problems.append(f"{name}: oracle column {col} is {typ} — CAST the aggregate to BIGINT")
            if tu.endswith("[]") or tu.startswith(("STRUCT", "MAP", "LIST")):
                problems.append(f"{name}: oracle column {col} is {typ} (driver canonicalizer cannot hash it)")
        con.close()
    return problems


def representation_audit(name: str, cols: list[str], rows: list[tuple]) -> list[str]:
    """The r11 lesson (grid_morans_i, driver-red twice while locally
    digit-exact): the driver compares HASHES of canonicalized values,
    and a decimal cell whose digits exceed float64's ~15-17
    significant digits cannot survive any float-canonicalizing stage
    — rows+schema match, only the hash diverges, and no value-level
    parity check can see it.  Fence: every Decimal cell in a
    hash-checked (window) query must round-trip through float64
    exactly; wider values must be emitted as digit strings or
    int64-safe components instead."""
    problems: list[str] = []
    flagged: set[str] = set()
    for r in rows:
        for c, v in zip(cols, r):
            if c in flagged or not isinstance(v, decimal.Decimal):
                continue
            try:
                ok = decimal.Decimal(repr(float(v))) == v
            except (OverflowError, ValueError):
                ok = False
            if not ok:
                flagged.add(c)
                problems.append(
                    f"{name}: column {c} value {v} does not survive float64 "
                    f"canonicalization — emit as string or int64-safe components"
                )
    return problems


def compare(name: str, spark, sf_dir: str, fn, sql: str, in_window: bool = False) -> list[str]:
    """Returns a list of problems (empty = parity)."""
    problems: list[str] = []
    s_cols, s_rows = run_spark(fn, spark, sf_dir)
    if in_window:
        problems.extend(representation_audit(name, s_cols, s_rows))
    d_cols, d_rows = run_duckdb(sql, sf_dir)
    ns_cols, ns_rows = normalize(s_cols, s_rows)
    nd_cols, nd_rows = normalize(d_cols, d_rows)
    if ns_cols != nd_cols:
        problems.append(f"{name}: column mismatch spark={ns_cols} duckdb={nd_cols}")
        return problems
    if len(ns_rows) != len(nd_rows):
        problems.append(f"{name}: row count spark={len(ns_rows)} duckdb={len(nd_rows)}")
        return problems
    for i, (a, b) in enumerate(zip(ns_rows, nd_rows)):
        if a != b:
            problems.append(f"{name}: first row diff at {i}:\n  spark : {a}\n  duckdb: {b}")
            break
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from netcdf_olap_spark.session import get_spark

    spark = get_spark("parity")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # The driver's correctness window — plus any explicitly requested
    # names: a query being parity-run by name is usually a window
    # ROTATION CANDIDATE, and the hazard/representation audits must
    # gate it BEFORE it takes a slot (r12 lesson: ev_ab_lift's
    # HUGEINT oracle columns passed the targeted pre-rotation run —
    # the audits only covered in-window rows — and were caught a
    # sweep later).
    checked_window = set(list(qs)[:50]) | only
    failed = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in checked_window:
            for p in hazard_audit(name, spark, sf_dir, fn, oracles.get(name)):
                failed += 1
                print(f"  ✗ HAZARD {p}")
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"  ~ {name}: rows-only ({n} rows)")
            continue
        probs = compare(name, spark, sf_dir, fn, oracles[name], in_window=name in checked_window)
        if probs:
            failed += 1
            for p in probs:
                print(f"  ✗ {p}")
        else:
            print(f"  ✓ {name}")
    print(f"{'PASS' if failed == 0 else 'FAIL'} ({failed} failing)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
