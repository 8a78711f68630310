"""Custom stateful streaming operator (SURVEY.md §2.9/§2.10):
applyInPandasWithState — the escape hatch when built-in windows can't
express the state machine.

Worked example: per-user lifetime counters (event count + value sum)
maintained across micro-batches. State lives in the state store
(checkpointed, rescales with shuffle partitions); each batch's update
is a vectorized pandas call per key group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update(key, pdf_iter, state: GroupState):
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, float(total)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user lifetime totals. Input needs (user_id, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
