"""Ad-hoc per-query timer for optimization work (not the official
bench): runs the named registry queries with the noop sink, REPS reps
each, prints min/median per query. min-of-reps is the
noise-robust statistic for DECISION-MAKING on a machine with
host-level contention spikes; the official bench.py keeps its
median-of-reps contract.

CLI: python tools/qtime.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, QTIME_REPS (default 3)
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("QTIME_REPS", "3"))
    names = sys.argv[1:]

    from netcdf_olap_spark.queries import all_queries
    from netcdf_olap_spark.session import get_spark

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # same process warmup as bench.py, abridged
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    warm = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    warm.groupBy("l_returnflag").agg(F.sum("l_quantity")).collect()

    @F.pandas_udf(DoubleType())
    def _warm_udf(v: pd.Series) -> pd.Series:
        return v * 1.0

    warm.limit(1000).select(_warm_udf(F.col("l_quantity"))).collect()

    for name in names:
        fn = registry[name]
        samples = []
        for _ in range(reps):
            load0 = os.getloadavg()[0]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            # free accumulated localCheckpoint blocks between reps
            for _, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
                rdd.unpersist()
            _ = load0
        mn = min(samples)
        med = sorted(samples)[len(samples) // 2]
        print(f"{name:38s} min={mn:7.3f} med={med:7.3f} runs={samples} load={os.getloadavg()[0]:.1f}", flush=True)


if __name__ == "__main__":
    main()
