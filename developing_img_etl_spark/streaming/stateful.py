"""Custom stateful streaming operator (SURVEY.md §2.9/§2.10):
applyInPandasWithState — the escape hatch when built-in windows can't
express the state machine.

Worked example: per-user lifetime counters (event count + value sum)
maintained across micro-batches. State lives in the state store
(checkpointed, rescales with shuffle partitions); each batch's update
is a vectorized pandas call per key group.

Determinism contract: the money accumulator is INTEGER CENTS
(floor(|v|·100 + 0.5)·sign(v) per row), not a float running sum — so
the final state is independent of micro-batch boundaries, partition
order, and accumulation order, and an ANSI-SQL oracle can mirror the
arithmetic literally (the q24 UDAF discipline). total_value is derived
once at emit time as cents/100.0 — a single double division both
engines perform identically.
"""

from __future__ import annotations



import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("cents", T.LongType())]
)
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _row_cents(v: pd.Series) -> int:
    # half-away-from-zero per ROW, then exact integer addition: immune
    # to float accumulation order (pandas .sum() is pairwise, a running
    # C loop is sequential — integer cents make the difference moot).
    import numpy as np

    x = v.to_numpy(dtype="float64")
    return int((np.sign(x) * np.floor(np.abs(x) * 100 + 0.5)).astype("int64").sum())


def _update(key, pdf_iter, state: GroupState):
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        cents += _row_cents(pdf["value"])
    state.update((n, cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_cents": [cents],
            "total_value": [cents / 100.0],
        }
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


# ---------------------------------------------------------------------------
# The same operator on Spark 4's transformWithStateInPandas — the
# successor API (SPARK-49413): typed state handles (ValueState here;
# ListState/MapState/timers available), state schema evolution, and
# per-key iterator batches. Kept semantically identical to user_totals
# (integer-cents accumulator) so BOTH implementations hash-match the
# SAME oracle — the migration-safety proof a fleet wants before
# switching state APIs.
# ---------------------------------------------------------------------------
try:  # Spark 4+: the API and its processor base class
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _UserTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += _row_cents(pdf["value"])
            self._state.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                    "total_value": [cents / 100.0],
                }
            )

        def close(self) -> None:
            pass

    def user_totals_tws(events: DataFrame) -> DataFrame:
        """user_totals on the transformWithStateInPandas API."""
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_UserTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - Spark <4 fallback

    def user_totals_tws(events: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark 4+; use user_totals"
        )
