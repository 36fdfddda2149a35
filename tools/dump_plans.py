"""Dump .explain('formatted') for named registry queries.

CLI: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]
Writes <out_dir>/<query>_<suffix>.txt. Used to produce the committed
plans/r14/<query>_{before,after}.txt evidence (run once from the
pre-round worktree with suffix=before, once from the optimized tree
with suffix=after).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from netcdf_olap_spark.queries import all_queries
    from netcdf_olap_spark.session import get_spark

    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    os.makedirs(out_dir, exist_ok=True)
    registry = all_queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("wrote", name, suffix, flush=True)


if __name__ == "__main__":
    main()
