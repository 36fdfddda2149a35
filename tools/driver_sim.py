"""Driver-simulation sweep: run EVERY registry query the way the
external driver does — vanilla SparkSession (no repo session factory),
cwd outside the repo, non-UTC timezone — and count() each result.

Catches the two failure classes repo-session parity cannot:
UDF closures pickled by reference (ModuleNotFoundError on workers when
the driver didn't start in /root/repo) and session-timezone-sensitive
expressions.

CLI: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    os.environ["TZ"] = "America/New_York"
    os.chdir("/tmp")
    if REPO not in sys.path:
        sys.path.insert(0, REPO)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    names = only or list(qs)
    failures: list[str] = []
    for name in names:
        try:
            n = qs[name](spark, sf_dir).count()
            print(f"  ok {name} ({n} rows)", flush=True)
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"  FAIL {name}: {type(exc).__name__}: {exc}", flush=True)
    print(f"{'FAIL' if failures else 'PASS'} ({len(failures)} failing of {len(names)})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
