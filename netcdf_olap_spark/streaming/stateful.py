"""Custom stateful streaming operator via ``applyInPandasWithState``.

The extension point the reference lacks entirely (its closest analog:
the mergeable StreamingHistogram sketch, Gddp.scala:230, merged by
partial+final agg). Here: per-user running totals with explicit
GroupState — the template for any custom sketch/accumulator the
built-in agg surface can't express.

At scale: state lives in the state store partitioned by the grouping
key (one shuffle on user_id); each micro-batch touches only keys
present in the batch; Arrow moves rows to Python in batches, not per
row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

RUNNING_STATE = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user (count, sum) that survives across
    micro-batches; emits the updated running totals for every user
    seen in each batch.

    The update function is a fully self-contained closure (only
    stdlib/pandas imports inside) — module-level references would be
    pickled by reference and break on executors whose Python can't
    import this package (verify-skill gotcha #1).
    """

    def update(key, pdfs, state):  # noqa: ANN001 (Spark-dictated signature)
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
    ]
)

TRANSITION_STATE = StructType([StructField("last_type", StringType())])


def transition_pairs(events: DataFrame) -> DataFrame:
    """Streaming (prev_type → next_type) pair extraction per user —
    the stateful twin of the batch LAG: state carries ONLY the last
    event type across micro-batch boundaries (what batch LAG gets
    from the sort for free, a stream must remember). Rows inside a
    batch are sorted by (ts, event_id) before pairing, so replaying
    ordered micro-batches reproduces the batch sequence exactly.
    Downstream aggregation of the pair stream = the batch transition
    matrix (asserted in tests/test_streaming.py)."""

    def update(key, pdfs, state):  # noqa: ANN001 (Spark-dictated signature)
        import pandas as pd

        last = state.get[0] if state.exists else None
        prevs, nexts = [], []
        # Concatenate ALL Arrow chunks of this group's micro-batch
        # before sorting: a group large enough to span chunk
        # boundaries (~10k rows/chunk) must be ordered globally, not
        # per-chunk, or cross-chunk pairs diverge from the batch LAG.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            for t in pdf.sort_values(["ts", "event_id"])["event_type"]:
                if last is not None:
                    prevs.append(last)
                    nexts.append(t)
                last = t
        state.update((last,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(prevs),
                "prev_type": prevs,
                "next_type": nexts,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TRANSITION_OUTPUT,
        stateStructType=TRANSITION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
