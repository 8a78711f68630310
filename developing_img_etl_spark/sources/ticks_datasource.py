"""S16 — a custom STREAMING Python DataSource (Spark 4 API): a
bounded, deterministic, offset-tracked tick source.

S14 (xlsx) exercises the batch half of the Python DataSource API;
this is the streaming half — `spark.readStream.format("ticks")` with
real offset management: `initialOffset` / `read(start)` /
`readBetweenOffsets` (the replay path the engine calls when a batch
is re-executed after failure). Offsets are row indices, each batch
covers [start, end) exactly once, and every row is a pure function of
its index — so ANY duplication, loss or reorder introduced by the
source/engine contract shows up against an arithmetic oracle.

This is the in-container stand-in for the Kafka/Kinesis-style sources
a deployment plugs in: the engine-facing contract (offsets, replay,
commit) is identical; only `read` would fetch from a broker instead
of generating arithmetic rows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType


class TicksDataSource(DataSource):
    """options: end (total rows), step (rows per micro-batch)."""

    @classmethod
    def name(cls) -> str:
        return "ticks"

    def schema(self) -> str:
        return "i bigint, user_id int, v bigint"

    def simpleStreamReader(self, schema: StructType):
        return _TicksStreamReader(self.options)


def _row(i: int) -> tuple[int, int, int]:
    # pure function of the offset — the oracle replays it from range()
    return (i, i % 50, (i * i) % 97 + i % 13)


class _TicksStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.end = int(options.get("end", 10_000))
        self.step = int(options.get("step", 1_000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        s = int(start["i"])
        e = min(s + self.step, self.end)
        return iter([_row(i) for i in range(s, e)]), {"i": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        # failure-replay path: MUST reproduce the original rows exactly
        return iter([_row(i) for i in range(int(start["i"]), int(end["i"]))])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — offsets are arithmetic


def register_ticks_source(spark: SparkSession) -> None:
    spark.dataSource.register(TicksDataSource)
