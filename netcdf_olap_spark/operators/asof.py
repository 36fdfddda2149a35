"""As-of join, cogroup formulation (§2.3 / §2.10).

Two formulations of the same operator, equivalence-tested:

- `queries/relational.py join_asof_last_order`: tagged union + keyed
  window — all-JVM, one shuffle; the default.
- `cogroup_asof` here: `groupBy(key).cogroup(...).applyInPandas` with
  a per-key `pandas.merge_asof` — the escape hatch for as-of variants
  the window form can't express (tolerance windows, nearest-rather-
  than-backward matching, per-key interpolation). Same single shuffle
  on the key; the Python boundary processes one key group at a time,
  Arrow-batched.

Tie semantics matched to the window form: probe at t matches an order
at exactly t; equal-timestamp orders dedupe to the max orderkey
(merge_asof keeps the last row in sort order, so sorting by
(t, orderkey) yields the same winner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

ASOF_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("o_orderkey", LongType()),
        StructField("o_totalprice", DoubleType()),
    ]
)


def cogroup_asof(events: DataFrame, orders: DataFrame) -> DataFrame:
    """events(event_id, user_id, ts) ⟕asof orders(o_custkey,
    o_orderdate, o_orderkey, o_totalprice): latest order
    at-or-before each event, per user."""

    def merge(left, right):  # noqa: ANN001 — Spark-dictated signature
        import pandas as pd

        if left.empty:
            return pd.DataFrame(columns=["event_id", "user_id", "o_orderkey", "o_totalprice"])
        left = left.sort_values(["ts", "event_id"])
        right = right.sort_values(["o_orderdate", "o_orderkey"])
        out = pd.merge_asof(
            left,
            right[["o_orderdate", "o_orderkey", "o_totalprice"]],
            left_on="ts",
            right_on="o_orderdate",
            direction="backward",
            allow_exact_matches=True,
        )
        out["o_orderkey"] = out["o_orderkey"].astype("Int64")
        return out[["event_id", "user_id", "o_orderkey", "o_totalprice"]]

    return (
        events.groupBy("user_id")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(merge, schema=ASOF_SCHEMA)
    )
