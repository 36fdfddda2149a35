"""User-defined extension points (SURVEY.md §2.10).

The reference's only extension mechanism is the giant per-variable RDD
map closure (Gddp.scala:165-239). Spark's typed surface replaces it;
this module exercises the two slots not already used elsewhere in the
engine (pandas_udf scalar → spatial.in_polygon_col; applyInPandas →
sinks/png.py; mapInPandas → sources/netcdf.py, operators/multimodal.py;
applyInPandasWithState → streaming/stateful.py):

- **UDTF** (Spark 3.5+): one row in, many rows out with a declared
  schema — used here for sentence splitting, the text-pipeline
  fan-out that `explode(split())` can't express when the per-output
  logic carries state (position, running offset).
- **grouped-agg pandas_udf**: a custom vectorized aggregate — here a
  midhinge (robust center estimate), the template for any sketch the
  built-in agg surface lacks.

Both are Arrow-batched; both declare their types so Catalyst plans
around them (the UDTF is a Generate, the grouped agg participates in
partial-less hash aggregation per group).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@udtf(returnType="sent_idx: int, start_off: int, sentence: string")
class SentenceSplit:
    """Split a document into sentences on [.!?] boundaries, emitting
    (index, character offset, text) per sentence — stateful per-output
    bookkeeping that a flat explode can't carry. Self-contained: only
    stdlib inside eval."""

    def eval(self, text: str):  # noqa: ANN001 — Spark-dictated signature
        if text is None:
            return
        import re

        idx = 0
        for m in re.finditer(r"[^.!?]+[.!?]?", text):
            s = m.group(0).strip()
            if s:
                yield idx, m.start(), s
                idx += 1


def split_sentences(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc → one row per sentence via lateral join with the UDTF."""
    return df.lateralJoin(SentenceSplit(F.col(text_col).outer()).alias("s")).select(
        id_col, "s.sent_idx", "s.start_off", "s.sentence"
    )


@pandas_udf(DoubleType())
def midhinge(v: pd.Series) -> float:
    """Grouped-agg pandas_udf: (Q1+Q3)/2 — a robust center estimate
    not in the built-in agg set. Arrow ships each group's column as
    one pandas Series."""
    if v.dropna().empty:
        return float("nan")
    q = v.dropna().quantile([0.25, 0.75])
    return float((q.iloc[0] + q.iloc[1]) / 2.0)


def grid_midhinge(grid: DataFrame) -> DataFrame:
    """Per-variable midhinge of cell values — custom-sketch shape over
    the cube (A1/A2 family with a user-defined statistic)."""
    return grid.groupBy("variable").agg(midhinge("value").alias("midhinge"))
