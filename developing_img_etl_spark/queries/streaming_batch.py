"""Q11 family — event-time windows + temporal joins, batch analogues of
the streaming surface (SURVEY.md §2.9 ST4, §2.3 J7).

The reference's weekly grouping key `minggu` is a hand-rolled tumbling
window (/root/reference/test.py:130); these queries are the general
forms on the `events` table. The streaming (readStream) versions of the
same logic live in developing_img_etl_spark/streaming/.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.asof import asof_join, range_join_buckets
from ._det import davg, dsum

WEEK_SECONDS = 7 * 86400


# ---------------------------------------------------------------------------
# Q11a — tumbling 7-day window aggregation. Spark's F.window is
# epoch-aligned; the oracle mirrors that with pure naive-timestamp epoch
# arithmetic (no TIMESTAMPTZ — session-timezone-proof).
# ---------------------------------------------------------------------------
def q11a_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "7 days").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
            davg("value").alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "sum_value",
            "avg_value",
        )
        .orderBy("w_start")
    )


Q11A_SQL = f"""
SELECT TIMESTAMP '1970-01-01' + INTERVAL (CAST(floor(epoch(ts) / {WEEK_SECONDS}) AS BIGINT) * {WEEK_SECONDS}) SECOND AS w_start,
       TIMESTAMP '1970-01-01' + INTERVAL (CAST(floor(epoch(ts) / {WEEK_SECONDS}) AS BIGINT) * {WEEK_SECONDS} + {WEEK_SECONDS}) SECOND AS w_end,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY w_start
"""


# ---------------------------------------------------------------------------
# Q11b — as-of join events→orders: each event picks the user's most
# recent order at event time. Orders are pre-reduced to one row per
# (custkey, orderdate) so the as-of value is well-defined (see
# operators/asof.py). Oracle uses DuckDB's native ASOF JOIN.
# ---------------------------------------------------------------------------
def q11b_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    latest = orders.groupBy(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
    ).agg(F.max("o_totalprice").alias("last_order_price"))
    joined = asof_join(
        events.select("event_id", "user_id", "ts"),
        latest,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["last_order_price"],
    )
    return joined.select("event_id", "user_id", "ts", "last_order_price").orderBy("event_id")


Q11B_SQL = """
WITH latest AS (
  SELECT o_custkey AS user_id, o_orderdate, MAX(o_totalprice) AS last_order_price
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts, l.last_order_price
FROM events e
ASOF LEFT JOIN latest l ON e.user_id = l.user_id AND e.ts >= l.o_orderdate
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# Q11c — equi + range-predicate join: lineitems shipped within 90 days of
# their order's date. The range predicate rides on the equi-key shuffle
# (sort-merge join with post-filter — no extra pass).
# ---------------------------------------------------------------------------
def q11c_range_predicate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    cond = (
        (lineitem.l_orderkey == orders.o_orderkey)
        & (lineitem.l_shipdate >= orders.o_orderdate)
        & (lineitem.l_shipdate < orders.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        lineitem.join(orders, cond)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_extendedprice").alias("sum_price"))
        .orderBy("o_orderpriority")
    )


Q11C_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
           AND l_shipdate >= o_orderdate
           AND l_shipdate < o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q11d — pure range join against a broadcast bucket dimension
# (operators/asof.py range_join_buckets): BroadcastNestedLoopJoin, no
# shuffle of the fact side. Oracle = the arithmetic-equivalent floor().
# ---------------------------------------------------------------------------
def q11d_bucket_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    buckets = spark.range(50).select(
        F.col("id").alias("bucket_id"),
        (F.col("id") * 10.0).alias("lo"),
        ((F.col("id") + 1) * 10.0).alias("hi"),
    )
    return (
        # inner: events outside the bucket dimension drop (at sf0.1
        # values run past the [0,500) domain — the scale probe caught
        # the left-join NULL group diverging from the bounded oracle)
        range_join_buckets(events, buckets, value_col="value", how="inner")
        .groupBy("bucket_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("bucket_id")
    )


Q11D_SQL = """
-- the bucket DIMENSION covers [0, 500) only: events outside every
-- bucket drop in the inner range join, so the oracle must bound the
-- domain too (at sf0.1 values reach past 500 — caught by the scale
-- probe, round 2)
SELECT CAST(floor(value / 10) AS BIGINT) AS bucket_id, COUNT(*) AS n_events
FROM events
WHERE value >= 0 AND value < 500
GROUP BY 1
ORDER BY bucket_id
"""


# ---------------------------------------------------------------------------
# Q11e — session windows (gap 1 hour) per user, batch form of ST4.
# Spark: F.session_window. Oracle: gaps-and-islands CTE.
# ---------------------------------------------------------------------------
def q11e_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


Q11E_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              -- >= not >: Spark's session_window starts a NEW session
              -- when the gap equals the gap duration; an event exactly
              -- 1h after its predecessor splits, it doesn't merge.
              OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 1 HOUR AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------------------
# ST1/ST4 — the actual Structured Streaming path, driven to completion
# with Trigger.AvailableNow and compared against the SAME oracle as the
# batch q11a: the streaming engine must produce identical finalized
# windows.
# ---------------------------------------------------------------------------
_STREAM_SRC_CACHE: dict[str, str] = {}

# State-store partition count for the AvailableNow drains. Every state
# partition writes its own delta + snapshot + commit files per micro-
# batch, so 32 partitions over kilobytes of state is 8x the fixed I/O
# of 4 with zero parallelism benefit (measured: 31s -> 10s across the
# six drains at sf0.1). At real state volumes size this like any
# shuffle — target ~100 MB of state per partition; the env override is
# the deployment knob.
_STREAM_PARTITIONS = int(os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "4"))


@contextmanager
def _stream_shuffle(spark: SparkSession):
    """Scope spark.sql.shuffle.partitions (= streaming state partition
    count) to _STREAM_PARTITIONS for the duration of a drain. The
    checkpoint pins the count at first batch, so it must be set before
    .start() and is safe to restore after termination."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(_STREAM_PARTITIONS))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _await_drained(q, timeout_s: int = 300) -> None:
    """``awaitTermination`` with the boolean return CHECKED (ADVICE r7):
    a ``False`` return means the availableNow drain is still appending —
    proceeding to read its output (or to replay a batch) would yield a
    nondeterministic partial result instead of a clear failure. Stop the
    query and fail loudly so a slow run reads as a timeout, not a
    hash-mismatch."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming drain still active after {timeout_s}s — refusing "
            "to read a partially-written registry"
        )


def _link_events_into(sf_dir: str, src: str, n_copies: int = 1) -> None:
    """Stage ``n_copies`` hardlinks (else copies) of the events table
    into stream-source dir ``src`` — the shared staging block for every
    drain that needs a (possibly doubled) file stream source."""
    import os
    import shutil

    os.makedirs(src, exist_ok=True)
    for i in range(n_copies):
        try:
            os.link(f"{sf_dir}/events.parquet", f"{src}/{i:02d}-events.parquet")
        except OSError:
            shutil.copyfile(
                f"{sf_dir}/events.parquet", f"{src}/{i:02d}-events.parquet"
            )


def _staged_stream_dir(sf_dir: str) -> str:
    """Directory wrapping the events table for the file stream source,
    built once per (process, sf_dir): hardlink when possible (zero
    copy), else a one-time copy."""
    if sf_dir not in _STREAM_SRC_CACHE:
        import os
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="stsrc_")
        src = f"{sf_dir}/events.parquet"
        if os.path.isdir(src):
            _STREAM_SRC_CACHE[sf_dir] = src
            return src
        dst = f"{d}/events-0.parquet"
        try:
            os.link(src, dst)
        except OSError:
            shutil.copyfile(src, dst)
        _STREAM_SRC_CACHE[sf_dir] = d
    return _STREAM_SRC_CACHE[sf_dir]


def _raw_events_stream(
    spark: SparkSession, sf_dir: str, src: str, *, max_files_per_trigger: int | None = None
):
    """readStream over a staged events dir, declaring the raw ts type
    Spark actually reads for this version (INT64 nanos on <4.1 via the
    legacy conf, TIMESTAMP_NTZ on 4.1+ — catalog.raw_events_ts_type)
    and normalizing to session-tz TIMESTAMP."""
    import copy

    from pyspark.sql import types as T

    from ..catalog import TABLES, normalize_event_ts, raw_events_ts_type

    raw_ts = raw_events_ts_type(spark, sf_dir)
    raw_schema = T.StructType(
        [
            T.StructField("ts", raw_ts) if f.name == "ts" else copy.copy(f)
            for f in TABLES["events"].fields
        ]
    )
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_event_ts(reader.parquet(src))


def st1_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..streaming.windows import tumbling_counts

    # FileStreamSource needs a DIRECTORY; the testdata table is a single
    # file. Stage it once per process via hardlink (the round-1 version
    # rewrote the whole table per invocation, so the bench billed a full
    # table write as query time — VERDICT r1 #5). Only the checkpoint is
    # per-run (AvailableNow drains everything each time).
    src = _staged_stream_dir(sf_dir)
    tmp = tempfile.mkdtemp(prefix="stq_")
    stream = _raw_events_stream(spark, sf_dir, src)
    out = f"{tmp}/out"

    def sink(batch, batch_id):
        # complete mode: every batch carries the FULL result; the last
        # overwrite is the finalized table. Writing through executors
        # instead of a memory sink keeps the result off the driver —
        # the scale-safe shape for arbitrarily many windows.
        batch.write.mode("overwrite").parquet(out)

    with _stream_shuffle(spark):
        q = (
            tumbling_counts(stream, watermark="0 seconds")
            .writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)
    return spark.read.parquet(out).orderBy("w_start")



# ---------------------------------------------------------------------------
# Q11f — sliding 7-day window, 1-day slide (ST4 completeness: tumbling
# q11a, session q11e, sliding here). Spark emits one row per window an
# event falls into (7 per event at this duration/slide); the oracle
# mirrors that with an explicit series of the 7 covering windows.
# ---------------------------------------------------------------------------
def q11f_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "7 days", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("w_start")
    )


DAY = 86400

Q11F_SQL = f"""
WITH covering AS (
  SELECT e.*,
         -- last window starting at or before ts, then the 6 earlier slides
         (CAST(floor(epoch(ts) / {DAY}) AS BIGINT) - s.i) * {DAY} AS w_epoch
  FROM events e, UNNEST(range(0, 7)) AS s(i)
  WHERE (CAST(floor(epoch(ts) / {DAY}) AS BIGINT) - s.i) * {DAY} + {7 * DAY} > epoch(ts)
)
SELECT TIMESTAMP '1970-01-01' + INTERVAL (w_epoch) SECOND AS w_start,
       TIMESTAMP '1970-01-01' + INTERVAL (w_epoch + {7 * DAY}) SECOND AS w_end,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
FROM covering
GROUP BY w_epoch
ORDER BY w_start
"""



def st2_streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 streaming form of q11e: session windows driven through the
    real Structured Streaming engine (AvailableNow drain, complete
    mode), compared against the SAME gaps-and-islands oracle — the
    streaming state store must finalize identical sessions."""
    import tempfile

    from ..streaming.windows import session_counts

    src = _staged_stream_dir(sf_dir)
    tmp = tempfile.mkdtemp(prefix="stq2_")
    stream = _raw_events_stream(spark, sf_dir, src)
    out = f"{tmp}/out"

    def sink(batch, batch_id):
        batch.write.mode("overwrite").parquet(out)

    with _stream_shuffle(spark):
        q = (
            session_counts(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)
    return spark.read.parquet(out).orderBy("user_id", "session_start")


QUERIES = {
    "q11a_tumbling_window": q11a_tumbling_window,
    "st1_streaming_tumbling": st1_streaming_tumbling,
    "q11b_asof_join": q11b_asof_join,
    "q11c_range_predicate_join": q11c_range_predicate_join,
    "q11d_bucket_range_join": q11d_bucket_range_join,
    "q11e_session_window": q11e_session_window,
    "q11f_sliding_window": q11f_sliding_window,
    "st2_streaming_session": st2_streaming_session,
}

ORACLES = {
    "q11a_tumbling_window": Q11A_SQL,
    "st1_streaming_tumbling": Q11A_SQL,
    "q11b_asof_join": Q11B_SQL,
    "q11c_range_predicate_join": Q11C_SQL,
    "q11d_bucket_range_join": Q11D_SQL,
    "q11e_session_window": Q11E_SQL,
    "q11f_sliding_window": Q11F_SQL,
    "st2_streaming_session": Q11E_SQL,
}

# ---------------------------------------------------------------------------
# ST3/ST5 — late-data semantics under the driver's hash check, via the
# checkpoint-restart path: drain 1 processes the events table and
# checkpoints its watermark (max ts - 1 day); drain 2 adds a file with
# one late copy of every 1000th event shifted 30 days into the past —
# all far behind the persisted watermark, so the engine MUST drop them
# (Spark's within-run drop is documented best-effort, but a row below
# the checkpointed watermark at restart is guaranteed-dropped; the
# pytest test_late_data_dropped pins that behavior) — plus a sentinel
# row 3 days past the table max whose admission advances the watermark
# and finalizes the last real window. The oracle is the batch q11a
# aggregation restricted to windows the final watermark closed: if late
# rows leaked in, drain 2 would re-emit their (already-evicted) windows
# as extra rows and inflate counts → hash mismatch.
# ---------------------------------------------------------------------------
_ST3_LATE_FILE_CACHE: dict[str, str] = {}

_NANOS_PER_DAY = 86400 * 1_000_000_000


def _st3_late_file(spark: SparkSession, sf_dir: str) -> str:
    """The injected batch-2 parquet file, built once per (process,
    sf_dir): 1 late copy per 1000 events (ts - 30 days) + 1 sentinel
    (max ts + 3 days). Written with the same raw ts type the events
    table reads as on this Spark (catalog.raw_events_ts_type) so both
    files share one stream schema."""
    if sf_dir not in _ST3_LATE_FILE_CACHE:
        import os
        import tempfile

        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(raw.schema["ts"].dataType, T.LongType):  # <4.1: INT64 nanos
            late_ts = F.col("ts") - F.lit(30 * _NANOS_PER_DAY)
            max_ts = raw.agg(F.max("ts")).collect()[0][0]
            sentinel_ts = F.lit(max_ts + 3 * _NANOS_PER_DAY)
        else:  # 4.1+: TIMESTAMP_NTZ
            import datetime

            late_ts = F.expr("ts - INTERVAL 30 DAYS")
            max_ts = raw.agg(F.max("ts")).collect()[0][0]
            sentinel_ts = F.lit(max_ts + datetime.timedelta(days=3)).cast(
                raw.schema["ts"].dataType
            )
        late = raw.withColumn("ts", late_ts).filter(
            F.pmod(F.col("event_id"), F.lit(1000)) == 0
        )
        sentinel = raw.orderBy(F.desc("ts")).limit(1).withColumn("ts", sentinel_ts)
        out = tempfile.mkdtemp(prefix="st3late_")
        late.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(out)
        part = next(
            p for p in os.listdir(out) if p.endswith(".parquet") and p.startswith("part-")
        )
        _ST3_LATE_FILE_CACHE[sf_dir] = f"{out}/{part}"
    return _ST3_LATE_FILE_CACHE[sf_dir]


def st3_streaming_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    import copy
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from ..streaming.windows import tumbling_counts

    late_file = _st3_late_file(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="stq3_")
    src, out, ckpt = f"{work}/src", f"{work}/out", f"{work}/ckpt"
    _link_events_into(sf_dir, src)

    def drain():
        stream = _raw_events_stream(spark, sf_dir, src)

        def sink(batch, batch_id):
            batch.write.mode("append").parquet(out)

        with _stream_shuffle(spark):
            q = (
                tumbling_counts(stream, window="7 days", watermark="1 day")
                .writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            _await_drained(q)

    drain()  # events only; checkpoints watermark = max ts - 1 day
    try:
        os.link(late_file, f"{src}/01-late.parquet")
    except OSError:
        shutil.copyfile(late_file, f"{src}/01-late.parquet")
    drain()  # late rows below the persisted watermark are dropped
    return spark.read.parquet(out).orderBy("w_start")


# Final watermark = (max ts + 3 days sentinel) - 1 day delay = max + 2d;
# append emits windows with w_end <= that. Every injected late row is
# > 29 days behind the drain-1 watermark, so none survive into counts.
ST3_SQL = f"""
WITH wm AS (SELECT epoch(max(ts)) + 2 * 86400 AS w FROM events),
agg AS (
  SELECT CAST(floor(epoch(ts) / {WEEK_SECONDS}) AS BIGINT) * {WEEK_SECONDS} AS w_epoch,
         COUNT(*) AS n_events,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS avg_value
  FROM events
  GROUP BY 1
)
SELECT TIMESTAMP '1970-01-01' + INTERVAL (w_epoch) SECOND AS w_start,
       TIMESTAMP '1970-01-01' + INTERVAL (w_epoch + {WEEK_SECONDS}) SECOND AS w_end,
       n_events, sum_value, avg_value
FROM agg
WHERE w_epoch + {WEEK_SECONDS} <= (SELECT w FROM wm)
ORDER BY w_start
"""

QUERIES["st3_streaming_late_data"] = st3_streaming_late_data
ORACLES["st3_streaming_late_data"] = ST3_SQL


# ---------------------------------------------------------------------------
# ST6 — stream-stream join: views matched to the same user's purchases
# within 30 minutes, through the real streaming join operator (state
# store on both sides, watermark-bounded). Both sides carry watermarks
# and the join has a two-sided time-range condition, so state eviction
# is bounded — the shape that survives unbounded streams. For an INNER
# join every match is emitted exactly once regardless of micro-batch
# boundaries, so the result equals the batch join: the oracle is the
# plain SQL join.
# ---------------------------------------------------------------------------
def st4_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    src = _staged_stream_dir(sf_dir)
    tmp = tempfile.mkdtemp(prefix="stq4_")

    def read():
        return _raw_events_stream(spark, sf_dir, src)

    views = (
        read()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        read()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id AND
            purchase_ts >= view_ts AND
            purchase_ts <= view_ts + INTERVAL 30 MINUTES
            """
        ),
    ).select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")

    out = f"{tmp}/out"

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out)

    with _stream_shuffle(spark):
        q = (
            joined.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)
    return spark.read.parquet(out).orderBy("view_id", "purchase_id")


ST4_SQL = """
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       v.ts AS view_ts, p.ts AS purchase_ts
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
ORDER BY view_id, purchase_id
"""

QUERIES["st4_stream_stream_join"] = st4_stream_stream_join
ORACLES["st4_stream_stream_join"] = ST4_SQL


# ---------------------------------------------------------------------------
# ST7 — custom stateful operator (applyInPandasWithState) under the
# driver's hash check: per-user lifetime totals through the real state
# store. Emissions are update-mode (one row per touched user per
# batch); the FINAL state per user — last emission by batch_id — is a
# pure function of the full input regardless of how availableNow slices
# micro-batches, because the accumulator is integer cents (see
# streaming/stateful.py). Oracle = the batch groupBy with the cents
# arithmetic mirrored literally.
# ---------------------------------------------------------------------------
def st5_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import Window

    from ..streaming.stateful import user_totals

    src = _staged_stream_dir(sf_dir)
    tmp = tempfile.mkdtemp(prefix="stq5_")
    stream = _raw_events_stream(spark, sf_dir, src).select("user_id", "value")
    out = f"{tmp}/out"

    def sink(batch, batch_id):
        batch.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    with _stream_shuffle(spark):
        q = (
            user_totals(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)
    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    return (
        spark.read.parquet(out)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "n_events", "total_cents", "total_value")
        .orderBy("user_id")
    )


ST5_SQL = """
WITH cents AS (
  SELECT user_id,
         CASE WHEN value >= 0 THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
              ELSE -CAST(floor(-value * 100 + 0.5) AS BIGINT) END AS c
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(c) AS BIGINT) AS total_cents,
       CAST(SUM(c) AS BIGINT) / 100.0 AS total_value
FROM cents
GROUP BY user_id
ORDER BY user_id
"""

QUERIES["st5_stateful_user_totals"] = st5_stateful_user_totals
ORACLES["st5_stateful_user_totals"] = ST5_SQL


# ---------------------------------------------------------------------------
# ST6 — cross-batch streaming dedup (ST3's state made a declared
# query): the source directory holds the events table TWICE, and
# maxFilesPerTrigger=1 forces the copies into separate micro-batches,
# so only dropDuplicates' state store can collapse them — a within-
# batch dedup would still double every count. The deduped rows land in
# parquet through foreachBatch append (dedup is the only stateful op —
# the aggregation runs batch-side on the sink), and the oracle is the
# single-copy batch aggregate: any leaked duplicate doubles a count and
# hash-mismatches.
# ---------------------------------------------------------------------------
def st6_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ._det import dsum

    work = tempfile.mkdtemp(prefix="stq6_")
    src, out, ckpt = f"{work}/src", f"{work}/out", f"{work}/ckpt"
    _link_events_into(sf_dir, src, n_copies=2)

    stream = _raw_events_stream(
        spark, sf_dir, src, max_files_per_trigger=1
    ).dropDuplicates(["event_id"])

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out)

    with _stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("total_value"),
        )
        .orderBy("event_type")
    )


ST6_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["st6_streaming_dedup"] = st6_streaming_dedup
ORACLES["st6_streaming_dedup"] = ST6_SQL


# ---------------------------------------------------------------------------
# ST7 — st5's per-user lifetime totals re-run on Spark 4's
# transformWithStateInPandas (typed ValueState handles, the successor
# to applyInPandasWithState). Same integer-cents state machine, same
# drain harness, and the SAME ST5 oracle — hash-matching both
# implementations against one oracle is the migration-safety proof for
# moving a fleet's stateful jobs to the new API.
# ---------------------------------------------------------------------------
def st7_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from contextlib import contextmanager

    from pyspark.sql import Window

    from ..streaming.stateful import user_totals_tws

    src = _staged_stream_dir(sf_dir)
    tmp = tempfile.mkdtemp(prefix="stq7_")
    stream = _raw_events_stream(spark, sf_dir, src).select("user_id", "value")
    out = f"{tmp}/out"

    def sink(batch, batch_id):
        batch.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    @contextmanager
    def _rocksdb_state_store():
        # transformWithState keeps each state variable in its own
        # column family — only the RocksDB provider supports that
        # (HDFSBacked raises STATE_STORE_MULTIPLE_COLUMN_FAMILIES).
        # Scoped like _stream_shuffle: set before .start(), restored
        # after the drain so the other st* queries keep the default.
        key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(key, None)
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            yield
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    with _stream_shuffle(spark), _rocksdb_state_store():
        q = (
            user_totals_tws(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)
    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    return (
        spark.read.parquet(out)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "n_events", "total_cents", "total_value")
        .orderBy("user_id")
    )


def _tws_available() -> bool:
    """transformWithStateInPandas ships its state protocol over
    protobuf. Environments without google.protobuf get the vendored
    mini-runtime (vendor/protoshim, r9 — activated in session.get_spark
    before the JVM starts so Python workers inherit it); the gate now
    only trips if even the shim cannot load."""
    try:
        from ..vendor import ensure_protobuf

        ensure_protobuf()
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# Queries declarable only when an optional dependency is present, with
# the reason — surfaced in MANIFEST.json so a silently-undeclared
# operator is visible instead of just absent (VERDICT r4 #10).
GATED: dict[str, str] = {}

if _tws_available():
    QUERIES["st7_transform_with_state"] = st7_transform_with_state
    ORACLES["st7_transform_with_state"] = ST5_SQL
else:
    GATED["st7_transform_with_state"] = (
        "requires google.protobuf (transformWithStateInPandas state "
        "protocol); not installed in this container — operator + pytest "
        "gate on the same probe (streaming/stateful.py)"
    )


# ---------------------------------------------------------------------------
# ST8 — exactly-once streaming sink into the TRANSACTIONAL format
# (streaming/txlog_sink.py): the events table arrives as two source
# files drained one-per-micro-batch; every batch commits into a
# TxLogFormat table stamped with a (app, batch) txn marker. After the
# drain the query REPLAYS batch 0 by hand — the crash-between-commit-
# and-checkpoint case — and the marker makes it a no-op: if the
# exactly-once contract broke, the replay double-appends and every
# count in the oracle comparison goes wrong. The oracle sees the
# doubled source (two files), so results are the 2× batch aggregate.
# ---------------------------------------------------------------------------
def st8_streaming_txlog_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..sinks.txlog import TxLogFormat
    from ..streaming.txlog_sink import exactly_once_batch_writer
    from ._det import dsum

    work = tempfile.mkdtemp(prefix="stq8_")
    src, table, ckpt = f"{work}/src", f"{work}/table", f"{work}/ckpt"
    _link_events_into(sf_dir, src, n_copies=2)

    fmt = TxLogFormat()
    writer = exactly_once_batch_writer(fmt, table, "st8")
    stream = _raw_events_stream(spark, sf_dir, src, max_files_per_trigger=1)
    with _stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(writer)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)

    # the crash-replay case: batch 0 arrives again → marker no-op
    writer(fmt.read(spark, table).limit(50), 0)

    return (
        fmt.read(spark, table)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("total_value"),
        )
        .orderBy("event_type")
    )


ST8_SQL = """
SELECT event_type,
       2 * COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(ROUND(2 * SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["st8_streaming_txlog_exactly_once"] = st8_streaming_txlog_exactly_once
ORACLES["st8_streaming_txlog_exactly_once"] = ST8_SQL


# ---------------------------------------------------------------------------
# ST9 — streaming MATERIALIZED-VIEW maintenance, exactly once
# (streaming/txlog_sink.py::incremental_view_writer): each micro-batch
# delta-aggregates (operators/ivm.py) and merges into a TxLogFormat-
# stored per-event-type view via one snapshot-isolated, txn-stamped
# overwrite — refresh cost ∝ batch, never the base; readers always see
# a complete snapshot. The query replays batch 0 after the drain (the
# crash case): if the marker contract broke, the replay re-applies the
# delta and every count in the doubled-source oracle goes wrong.
# ---------------------------------------------------------------------------
def st9_streaming_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..sinks.txlog import TxLogFormat
    from ..streaming.txlog_sink import incremental_view_writer
    from ._det import dec

    work = tempfile.mkdtemp(prefix="stq9_")
    src, view, ckpt = f"{work}/src", f"{work}/view", f"{work}/ckpt"
    _link_events_into(sf_dir, src, n_copies=2)

    fmt = TxLogFormat()
    writer = incremental_view_writer(fmt, view, "st9", ["event_type"], ["value"])
    stream = _raw_events_stream(spark, sf_dir, src, max_files_per_trigger=1)
    with _stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(writer)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)

    # crash-replay of batch 0: the txn marker must make it a no-op —
    # otherwise the view double-counts and the oracle hash-mismatches
    replay = load(spark, sf_dir, "events").limit(100)
    writer(replay, 0)

    return (
        fmt.read(spark, view)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.round(F.col("value"), 2).cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


ST9_SQL = """
SELECT event_type,
       2 * COUNT(*) AS n_events,
       CAST(ROUND(2 * SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["st9_streaming_view_maintenance"] = st9_streaming_view_maintenance
ORACLES["st9_streaming_view_maintenance"] = ST9_SQL


# ---------------------------------------------------------------------------
# ST10 — CUSTOM Python streaming DataSource with offset tracking
# (sources/ticks_datasource.py, the Spark 4 streaming DataSource API —
# the Kafka-shaped contract: initialOffset / read(start) /
# readBetweenOffsets replay / commit). The source is bounded and every
# row is a pure function of its offset, so the arithmetic oracle
# catches any duplicated, lost or reordered offset range. After the
# full drain the query RESTARTS from the same checkpoint: the second
# run must append NOTHING (committed offsets respected) — a violated
# offset contract doubles counts against the oracle. sf-independent
# by design (the source generates; no table read), which is itself
# the point: the operator under test is the source protocol.
# ---------------------------------------------------------------------------
_TICKS_END = 5_000
_TICKS_STEP = 1_000


def st10_custom_source_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.ticks_datasource import register_ticks_source

    register_ticks_source(spark)
    tmp = tempfile.mkdtemp(prefix="st10_")
    out = f"{tmp}/out"

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out)

    def drain():
        stream = (
            spark.readStream.format("ticks")
            .option("end", str(_TICKS_END))
            .option("step", str(_TICKS_STEP))
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)

    with _stream_shuffle(spark):
        drain()
        drain()  # restart from the same checkpoint: must be a no-op
    return (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))
        .orderBy("user_id")
    )


ST10_SQL = f"""
SELECT CAST(i % 50 AS INT) AS user_id,
       COUNT(*) AS n_rows,
       CAST(SUM((i * i) % 97 + i % 13) AS BIGINT) AS sum_v
FROM range(0, {_TICKS_END}) t(i)
GROUP BY 1
ORDER BY 1
"""

QUERIES["st10_custom_source_stream"] = st10_custom_source_stream
ORACLES["st10_custom_source_stream"] = ST10_SQL


# ---------------------------------------------------------------------------
# ST11 — dropDuplicatesWithinWatermark (the Spark 3.5+ TTL'd streaming
# dedup): st6 deduplicates with UNBOUNDED key state — correct, but at
# 100 TB/day the state grows forever; the WithinWatermark variant
# expires each key once the event-time watermark passes it, bounding
# state to the lateness horizon (the production contract for
# at-least-once sources whose duplicates arrive close together). Same
# doubled-source drain as st6; duplicates land within the 1-day
# horizon, so the result must equal the single-copy aggregate — any
# premature state eviction (or missed duplicate) breaks the hash.
# ---------------------------------------------------------------------------
def st11_streaming_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ._det import dsum

    work = tempfile.mkdtemp(prefix="stq11_")
    src, out, ckpt = f"{work}/src", f"{work}/out", f"{work}/ckpt"
    _link_events_into(sf_dir, src, n_copies=2)

    stream = (
        _raw_events_stream(spark, sf_dir, src, max_files_per_trigger=1)
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
    )

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out)

    with _stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("total_value"),
        )
        .orderBy("event_type")
    )


ST11_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["st11_streaming_dedup_ttl"] = st11_streaming_dedup_ttl
ORACLES["st11_streaming_dedup_ttl"] = ST11_SQL


# ---------------------------------------------------------------------------
# ST12 — stream-STATIC enrichment join: the most common production
# streaming join (facts stream in, the dimension is a table) — Spark
# broadcasts/rescans the static side per micro-batch with NO state
# store at all, unlike the stream-stream st4 whose both sides hold
# watermarked state. Dimension: a user→segment table derived
# deterministically from customer; the drained enriched stream must
# aggregate exactly like the batch join the oracle runs. Left join
# keeps unmatched users (NULL segment bucket) — proving the
# enrichment doesn't silently drop facts.
# ---------------------------------------------------------------------------
def st12_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ._det import dsum

    src = _staged_stream_dir(sf_dir)
    work = tempfile.mkdtemp(prefix="stq12_")
    out, ckpt = f"{work}/out", f"{work}/ckpt"

    dim = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 40)  # leave some stream users unmatched
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    stream = _raw_events_stream(spark, sf_dir, src).join(
        F.broadcast(dim), "user_id", "left"
    )

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out)

    with _stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)
    return (
        spark.read.parquet(out)
        .groupBy(F.coalesce("c_mktsegment", F.lit("<unmatched>")).alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("total_value"),
        )
        .orderBy("segment")
    )


ST12_SQL = """
SELECT COALESCE(c.c_mktsegment, '<unmatched>') AS segment,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users,
       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_value
FROM events e
LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 40) c
       ON e.user_id = c.c_custkey
GROUP BY 1
ORDER BY segment
"""

QUERIES["st12_stream_static_enrich"] = st12_stream_static_enrich
ORACLES["st12_stream_static_enrich"] = ST12_SQL


# ---------------------------------------------------------------------------
# ST13 — streaming SKETCH maintenance: HLL distinct-count registers
# kept current per micro-batch, replay-safe BY ALGEBRA.
#
# Ties the sketch family (q97) to the streaming tier (st8/st9): a
# "distinct event ids seen" integrity monitor (duplicate-delivery
# detection) maintained incrementally — each micro-batch computes its
# own 256-register HLL file (the q97 primitives at p = 8) and
# max-merges it into a TxLogFormat-stored register table via one
# snapshot-isolated overwrite.
#
# Unlike st8/st9, NO transaction markers are needed: max-merge is
# idempotent AND commutative, so a crash-replayed batch is a no-op by
# algebra, not by bookkeeping — the query proves it by re-applying
# batch 0 after the drain. The source is deliberately doubled
# (n_copies = 2): ~2x duplicate delivery leaves every register — and
# therefore the estimate — EXACTLY as a single copy would, which the
# oracle certifies by rebuilding the registers from the single-copy
# events table in SQL and matching bit-for-bit.
#
# Scale shape: per-batch register extraction is map-side codegen +
# one 256-key agg; the stored table is 256 rows regardless of stream
# volume; the merge reads/writes kilobytes per batch.
# ---------------------------------------------------------------------------

_ST13_P = 8

# estimator constants live in ONE place — sketches.hll_params (q97's)
from .sketches import hll_params as _hll_params  # noqa: E402

_ST13_M, _ST13_FIELD, _ST13_NUM, _ST13_DEN, _ST13_SCALE = _hll_params(_ST13_P)


def _st13_registers(df: DataFrame) -> DataFrame:
    from .classify import md5_prefix_int
    from .sketches import _rho

    h = md5_prefix_int(F.col("event_id").cast("string"), 15)
    return (
        df.select(h.alias("h"))
        .select(
            (F.col("h") % _ST13_M).alias("idx"),
            _rho(F.expr(f"h div {_ST13_M}"), _ST13_FIELD).alias("rho"),
        )
        .groupBy("idx")
        .agg(F.max("rho").alias("m_reg"))
    )


def st13_streaming_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sinks.txlog import TxLogFormat

    work = tempfile.mkdtemp(prefix="st13_")
    src, table, ckpt = f"{work}/src", f"{work}/table", f"{work}/ckpt"
    _link_events_into(sf_dir, src, n_copies=2)
    fmt = TxLogFormat()

    def merge_registers(batch_df: DataFrame, batch_id: int) -> None:
        regs = _st13_registers(batch_df)
        try:
            current = fmt.read(batch_df.sparkSession, table)
        except FileNotFoundError:  # first batch only — anything else
            current = None  # must fail loudly, not reset the registers
        if current is not None:
            regs = current.unionByName(regs).groupBy("idx").agg(
                F.max("m_reg").alias("m_reg")
            )
        fmt.overwrite(regs, table)

    stream = _raw_events_stream(spark, sf_dir, src, max_files_per_trigger=1)
    # no stateful operator in this drain (registry lives in files) —
    # the _stream_shuffle state-partition pin would only throttle the
    # per-batch aggregation to 4 tasks (VERDICT r10 #5 drain floor).
    # r12 re-probe of VERDICT r11 #2 (driver saw 0.802 + anti-scaling
    # after the r11 unpin): two paired 5-rep knob probes, opposite
    # orders, pin-restored vs unpinned — mins 3.62 vs 3.63 s, medians
    # split (4.22/4.51 vs 4.02/4.26). Parity: the r11 regression was
    # driver-window drift, not the unpin. Unpinned shape retained.
    q = (
        stream.writeStream.foreachBatch(merge_registers)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q)

    # crash-replay: the ACTUAL first staged file (= batch 0 under
    # maxFilesPerTrigger=1) again — a no-op because max-merge is
    # idempotent (the registers, and so the hash, must not move)
    merge_registers(spark.read.parquet(f"{src}/00-events.parquet"), 0)

    from .sketches import hll_estimate_frame

    return hll_estimate_frame(fmt.read(spark, table), _ST13_P)


from .classify import sql_md5_prefix_int as _sql_md5p13  # noqa: E402

ST13_SQL = f"""
WITH hashes AS (
  SELECT {_sql_md5p13(15)} AS hv
  FROM (SELECT md5(CAST(event_id AS VARCHAR)) AS h FROM events)
),
rho AS (
  SELECT hv % {_ST13_M} AS idx,
         CASE WHEN hv // {_ST13_M} = 0 THEN {_ST13_FIELD + 1}
              ELSE {_ST13_FIELD + 1} - length(bin(hv // {_ST13_M})) END AS rho
  FROM hashes
),
regs AS (SELECT idx, MAX(rho) AS m_reg FROM rho GROUP BY idx),
est AS (
  SELECT CAST({_ST13_M} - COUNT(*) AS BIGINT) AS n_zero_registers,
         CAST(SUM(1::BIGINT << ({_ST13_FIELD + 1} - m_reg))
              + ({_ST13_M} - COUNT(*)) * {_ST13_SCALE}::BIGINT AS BIGINT) AS s_scaled
  FROM regs
)
SELECT n_zero_registers, s_scaled,
       CAST({{LC13}} AS BIGINT) AS hll_estimate
FROM (
  SELECT n_zero_registers, s_scaled,
         CAST(CAST('{_ST13_NUM}' AS HUGEINT)
              // ({_ST13_DEN}::HUGEINT * s_scaled::HUGEINT) AS BIGINT) AS raw_est
  FROM est
)
"""

from .sketches import sql_hll_estimate_case as _sql_hll_case13  # noqa: E402

ST13_SQL = ST13_SQL.replace("{LC13}", _sql_hll_case13(_ST13_P))

QUERIES["st13_streaming_hll_registers"] = st13_streaming_hll_registers
ORACLES["st13_streaming_hll_registers"] = ST13_SQL


# ---------------------------------------------------------------------------
# ST14 — watermarked stream-stream LEFT OUTER join: the last canonical
# Structured Streaming join mode not yet covered (st4 is the inner
# form). The semantics worth testing is the NULL-completion rule:
# an unmatched left row is emitted (with null right columns) only when
# the global watermark passes the row's join-condition upper bound —
# i.e. when the engine can PROVE no future right row can match — and
# a finite drain leaves the youngest unmatched rows un-emitted forever
# (still parked in the state store). The DuckDB oracle replays exactly
# that rule: matched pairs always; null-extended rows only where
# view_ts + 30 min (condition bound) + 1 h (watermark delay) < max(ts)
# — the final-watermark eviction frontier. Event times are
# microsecond-random, so the frontier comparison cannot tie.
#
# Scale shape: identical to st4 (state keyed by user_id, eviction
# bounds state to the watermark horizon); the outer form adds no
# shuffle — null-completion happens at state expiry inside the join
# operator.
# ---------------------------------------------------------------------------


def st14_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    src = _staged_stream_dir(sf_dir)
    tmp = tempfile.mkdtemp(prefix="stq14_")

    def read():
        return _raw_events_stream(spark, sf_dir, src)

    views = (
        read()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        read()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id AND
            purchase_ts >= view_ts AND
            purchase_ts <= view_ts + INTERVAL 30 MINUTES
            """
        ),
        "leftOuter",
    ).select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")

    out = f"{tmp}/out"

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out)

    with _stream_shuffle(spark):
        q = (
            joined.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)
    return spark.read.parquet(out).orderBy("view_id", "purchase_id")


ST14_SQL = """
WITH v AS (
  SELECT user_id, event_id AS view_id, ts AS view_ts
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id AS p_user_id, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
),
mx AS (
  -- the engine's global watermark is the MIN across watermarked
  -- inputs of (max observed event time - delay): both sides carry a
  -- 1 h delay on their own column, so the final eviction frontier is
  -- least(max view_ts, max purchase_ts) - 1 h
  SELECT LEAST((SELECT MAX(view_ts) FROM v),
               (SELECT MAX(purchase_ts) FROM p)) - INTERVAL 1 HOUR AS wm
),
j AS (
  SELECT v.user_id, v.view_id, p.purchase_id, v.view_ts, p.purchase_ts
  FROM v LEFT JOIN p
    ON v.user_id = p.p_user_id
   AND p.purchase_ts >= v.view_ts
   AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
)
SELECT user_id, view_id, purchase_id, view_ts, purchase_ts
FROM j CROSS JOIN mx
WHERE purchase_id IS NOT NULL
   OR view_ts + INTERVAL 30 MINUTE < wm
ORDER BY view_id, purchase_id
"""

QUERIES["st14_stream_stream_left_outer"] = st14_stream_stream_left_outer
ORACLES["st14_stream_stream_left_outer"] = ST14_SQL


# ---------------------------------------------------------------------------
# ST15 — streaming NEAR-duplicate suppression: an LSH band-bucket
# registry maintained across micro-batches. st6/st11 deduplicate EXACT
# keys; a 100 TB/day ingest pipeline also has to suppress *near*
# duplicates at the door (the m4/q122 batch job, turned into a
# continuously-maintained registry). Each micro-batch computes q122's
# portable MinHash signatures (1 md5 + 16 multiplies per shingle, ONE
# 16-min-column grouped agg per doc), explodes them into 4 band keys,
# and appends the per-batch bucket minima to the registry. The
# registry is an append log reduced by MIN on read — min is
# associative, commutative and IDEMPOTENT, so a crash-replayed batch
# re-appending its minima cannot change the answer (st13's
# idempotent-by-algebra discipline; a deployment MERGE-mins into a
# keyed store — sinks/txlog.py merge_into is that operator — and keeps
# only the winning owner per bucket). Suppression rule: a document is
# a near-dup iff any of its band buckets is owned by a smaller doc_id
# — the canonical-min selection q74/m4 use, evaluated here against the
# final registry so the verdict is independent of batch arrival order.
# The corpus is doubled (every doc gets an exact copy at
# id + max(doc_id)+1 — the data-derived offset, q122's discipline)
# so suppression provably fires; the oracle replays
# signatures, banding and the ownership rule in SQL and must agree on
# every per-source count.
# ---------------------------------------------------------------------------
_ST15_FILES = 4


def st15_streaming_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from ..catalog import load
    from ..functions import text as TXT
    from .classify import md5_prefix_int
    from .dedup import _Q122_AB, _Q122_BANDS, _Q122_P, _Q122_R

    work = tempfile.mkdtemp(prefix="stq15_")
    src, reg, dbs, ckpt = f"{work}/src", f"{work}/reg", f"{work}/dbs", f"{work}/ckpt"

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    # dup-id offset derived from the data (r6 ADVICE — q122's rule),
    # folded into the 1-row collect this query already pays for staging
    mx = docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    off = mx + 1
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + F.lit(off)).alias("doc_id"), "source", "text")
    )
    # r12: pin the doubled corpus — the staging loop below runs
    # _ST15_FILES filtered write jobs and the final assembly joins
    # `doubled` again, so each of those 5 consumers re-scanned the
    # parquet + union without the pin. Paired knob probes, both orders
    # (min-of-4, sf0.1): mins 5.213/4.838 vs 5.533/5.062 pinned vs
    # unpinned. Oracle MATCH sf0.01 + sf0.1.
    doubled = doubled.localCheckpoint(eager=False)
    # contiguous doc_id ranges per staged file: arrival order == id
    # order, so the registry's owners match at-ingest greedy decisions
    hi = mx + off + 1
    step = hi // _ST15_FILES + 1
    for k in range(_ST15_FILES):
        doubled.filter(
            (F.col("doc_id") >= k * step) & (F.col("doc_id") < (k + 1) * step)
        ).coalesce(1).write.mode("append").parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    bkey = ["source", "band", "r0", "r1", "r2", "r3"]

    def bands_of(df: DataFrame) -> DataFrame:
        sh = df.select(
            "doc_id", "source", TXT.shingles(F.col("text"), 3).alias("sh")
        ).filter(F.size("sh") > 0)
        hashed = sh.select(
            "doc_id", "source", F.explode("sh").alias("s")
        ).select("doc_id", "source", md5_prefix_int(F.col("s"), 7).alias("base"))
        sigs = hashed.groupBy("doc_id", "source").agg(
            *[
                F.min((F.lit(a) * F.col("base") + F.lit(b)) % _Q122_P).alias(f"mh{i}")
                for i, (a, b) in enumerate(_Q122_AB)
            ]
        )
        return sigs.select(
            "doc_id",
            "source",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            *[
                                F.col(f"mh{_Q122_R * b + r}").alias(f"r{r}")
                                for r in range(_Q122_R)
                            ],
                        )
                        for b in range(_Q122_BANDS)
                    ]
                )
            ).alias("bk"),
        ).select("doc_id", "source", "bk.*")

    def sink(batch: DataFrame, batch_id: int) -> None:
        b = bands_of(batch).localCheckpoint(eager=False)  # one sig pass, two sinks
        b.groupBy(*bkey).agg(F.min("doc_id").alias("owner")).write.mode(
            "append"
        ).parquet(reg)
        b.write.mode("append").parquet(dbs)

    # drain-floor tuning (VERDICT r10 #5, ST15_DECOMP: 89% of st15's
    # sf10 cost was micro-batch machinery, not plan): 2 files per
    # trigger halves the lifecycle count while still proving the
    # cross-batch registry merge (2 batches, each covering distinct
    # doc ranges), and the _stream_shuffle 4-partition pin is skipped —
    # it exists to fix the STATE-STORE partition count, and this drain
    # has no stateful operator (dedup lives in the reg/dbs files), so
    # the pin only throttled the per-batch signature aggregation to 4
    # tasks. Measured at sf0.1: 9.0 s → 4.2 s, hash unchanged.
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    def drain() -> None:
        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)

    drain()
    drain()  # restart from the checkpoint: must be a no-op (and any
    #         replayed batch is absorbed by the min-on-read algebra)

    owners = (
        spark.read.parquet(reg)
        .groupBy(*bkey)
        .agg(F.min("owner").alias("owner"))
    )
    verdict = (
        spark.read.parquet(dbs)
        .join(owners, bkey)
        .groupBy("doc_id", "source")
        .agg(F.max((F.col("owner") < F.col("doc_id")).cast("int")).alias("supp"))
    )
    return (
        doubled.select("doc_id", "source")
        .join(verdict.select("doc_id", "supp"), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.lit(1) - F.coalesce(F.col("supp"), F.lit(0)))
            .cast("long")
            .alias("n_admitted"),
            F.sum(F.coalesce(F.col("supp"), F.lit(0))).cast("long").alias("n_suppressed"),
        )
        .orderBy("source")
    )


def _st15_sql() -> str:
    from .classify import sql_md5_prefix_int
    from .dedup import _Q122_AB, _Q122_BANDS, _Q122_P, _Q122_R

    minexprs = ",\n         ".join(
        f"MIN(({a} * base + {b}) % {_Q122_P}) AS mh{i}"
        for i, (a, b) in enumerate(_Q122_AB)
    )
    bandsel = "\n  UNION ALL ".join(
        "SELECT doc_id, source, {b} AS band, {rs} FROM sigs".format(
            b=b,
            rs=", ".join(f"mh{_Q122_R * b + r} AS r{r}" for r in range(_Q122_R)),
        )
        for b in range(_Q122_BANDS)
    )
    return rf"""
WITH d0 AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents), source, text FROM documents
),
toks AS (
  SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS t FROM d0
),
sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
  FROM toks
  WHERE len(t) >= 3
),
inv AS (
  SELECT doc_id, source, UNNEST(s) AS shingle FROM sh
),
hashed AS (
  SELECT doc_id, source, {sql_md5_prefix_int(7)} AS base
  FROM (SELECT doc_id, source, md5(shingle) AS h FROM inv)
),
sigs AS (
  SELECT doc_id, source,
         {minexprs}
  FROM hashed GROUP BY doc_id, source
),
bands AS (
  {bandsel}
),
owners AS (
  SELECT source, band, r0, r1, r2, r3, MIN(doc_id) AS owner
  FROM bands GROUP BY ALL
),
verdict AS (
  SELECT b.doc_id,
         MAX(CASE WHEN o.owner < b.doc_id THEN 1 ELSE 0 END) AS supp
  FROM bands b
  JOIN owners o USING (source, band, r0, r1, r2, r3)
  GROUP BY b.doc_id
)
SELECT d0.source,
       COUNT(*) AS n_docs,
       CAST(SUM(1 - COALESCE(v.supp, 0)) AS BIGINT) AS n_admitted,
       CAST(SUM(COALESCE(v.supp, 0)) AS BIGINT) AS n_suppressed
FROM d0 LEFT JOIN verdict v USING (doc_id)
GROUP BY d0.source
ORDER BY d0.source
"""


QUERIES["st15_streaming_lsh_dedup"] = st15_streaming_lsh_dedup
ORACLES["st15_streaming_lsh_dedup"] = _st15_sql()


# ---------------------------------------------------------------------------
# ST16 — streaming ADDITIVE-sketch maintenance: a Count-Min frequency
# sketch (q95's cells, user-keyed) kept current per micro-batch,
# exactly-once BY TRANSACTION MARKERS.
#
# The deliberate contrast with st13: HLL registers are max-merged —
# idempotent BY ALGEBRA, so crash-replayed batches are absorbed with
# no bookkeeping. CMS counters are ADDITIVE: re-adding a replayed
# batch's cells would double-count, so this is the state family that
# NEEDS the st6/st8 transaction-marker discipline. Each micro-batch
# appends its partial cells tagged with the batch_id; the read side
# reconciles per (batch_id, r, c) with MAX (replayed partials are
# bit-identical, and a torn append is healed by the replay that
# follows a crash) and only then SUMs across batches — so a batch's
# cells count ONCE no matter how many times the sink ran it.
#
# Duplicate DELIVERY, by contrast, is two legitimate events and MUST
# double the counters: the source is staged twice (n_copies = 2,
# maxFilesPerTrigger = 1 → one batch per copy) and the oracle counts
# every event twice — while the replay leg re-runs batch 0's file
# through the sink once more and the result must NOT move. Both
# semantics in one hash-checked answer.
#
# Scale shape: per-batch cell extraction is one (user → count) agg +
# a d-way explode over DISTINCT users (q95's build); the registry
# grows d·w rows per batch — kilobytes — and the reconciliation
# reads/aggregates that dim-scale frame. Probes (exact top-20 users)
# attach estimates via a broadcast of the 192-cell frame.
# ---------------------------------------------------------------------------

_ST16_D = 3
_ST16_W = 64
_ST16_TOP = 20


def st16_streaming_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.cms import cms_build, cms_estimate

    work = tempfile.mkdtemp(prefix="st16_")
    src, reg, ckpt = f"{work}/src", f"{work}/reg", f"{work}/ckpt"
    _link_events_into(sf_dir, src, n_copies=2)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        counts = batch_df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        cells = cms_build(counts, "user_id", "n", depth=_ST16_D, width=_ST16_W)
        cells.select(
            F.lit(batch_id).cast("long").alias("batch_id"), "r", "c", "cnt"
        ).write.mode("append").parquet(reg)

    stream = _raw_events_stream(spark, sf_dir, src, max_files_per_trigger=1)

    def drain() -> None:
        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)

    # no stateful operator in this drain (registry lives in files) —
    # the _stream_shuffle state-partition pin would only throttle the
    # per-batch aggregation to 4 tasks (VERDICT r10 #5 drain floor)
    drain()
    drain()  # checkpoint restart: no new batches, registry untouched

    # crash-replay: run batch 0's file through the sink AGAIN with the
    # same batch_id — the txn-marker reconciliation below must absorb it
    from ..catalog import normalize_event_ts

    sink(normalize_event_ts(spark.read.parquet(f"{src}/00-events.parquet")), 0)

    cells = (
        spark.read.parquet(reg)
        .groupBy("batch_id", "r", "c")
        .agg(F.max("cnt").alias("cnt"))  # replayed partials are identical
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
    from pyspark.sql import Window

    exact = (
        spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    w = Window.orderBy(F.desc("n_exact"), F.asc("user_id"))
    probes = exact.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _ST16_TOP
    )
    est = cms_estimate(probes, "user_id", cells, depth=_ST16_D, width=_ST16_W)
    return est.select(
        F.col("rk").cast("long").alias("rk"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("n_exact")).cast("long").alias("over_est"),
    ).orderBy("rk")


def _st16_sql() -> str:
    from ..operators.bloom import K1, K2, P, S1, S2

    def pos(key: str, r: int) -> str:
        h1 = f"((({key}) % {P}) * {K1} + {S1}) % {P}"
        h2 = f"((({key}) % {P}) * {K2} + {S2}) % {P}"
        return f"(({h1}) + {r} * ({h2})) % {P} % {_ST16_W}"

    case = " ".join(
        f"WHEN {r} THEN {pos('user_id', r)}" for r in range(_ST16_D)
    )
    rs = ", ".join(str(r) for r in range(_ST16_D))
    return f"""
WITH counts AS (
  -- doubled delivery: every event arrives twice (two staged copies)
  SELECT user_id, 2 * COUNT(*) AS n FROM events GROUP BY user_id
),
cells AS (
  SELECT r, c, SUM(n) AS cnt
  FROM (
    SELECT n, u.r, CASE u.r {case} END AS c
    FROM counts, UNNEST([{rs}]) AS u(r)
  )
  GROUP BY r, c
),
probes AS (
  SELECT user_id, n AS n_exact,
         row_number() OVER (ORDER BY n DESC, user_id ASC) AS rk
  FROM counts
  QUALIFY rk <= {_ST16_TOP}
),
est AS (
  SELECT p.rk, p.user_id, p.n_exact, MIN(COALESCE(ce.cnt, 0)) AS cms_est
  FROM (
    SELECT rk, user_id, n_exact, u.r, CASE u.r {case} END AS c
    FROM probes, UNNEST([{rs}]) AS u(r)
  ) p
  LEFT JOIN cells ce ON ce.r = p.r AND ce.c = p.c
  GROUP BY p.rk, p.user_id, p.n_exact
)
SELECT CAST(rk AS BIGINT) AS rk,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - n_exact AS BIGINT) AS over_est
FROM est
ORDER BY rk
"""


QUERIES["st16_streaming_cms_counts"] = st16_streaming_cms_counts
ORACLES["st16_streaming_cms_counts"] = _st16_sql()


# ---------------------------------------------------------------------------
# ST17 (r8) — streaming EXACT quantiles via an additive value-histogram
# registry.
#
# The quantile operators so far are batch (q22 exact percentiles, q113
# KLL-style sketch); the streaming tier was missing the shape a
# monitoring pipeline actually runs: per-event-type latency/value
# percentiles maintained incrementally. Sketches (t-digest/KLL) are
# NOT additive-exact, so instead of a mergeable approximation this
# uses the property the corpus actually has — values are cent-quantized
# doubles, a BOUNDED INTEGER DOMAIN — and keeps the exact per-(type,
# cent) histogram, which IS additive: per micro-batch the sink appends
# partial (batch_id, event_type, value_cents, cnt) rows; the read side
# reconciles per (batch_id, type, v) with MAX (the st16 txn-marker
# discipline — replayed partials are bit-identical) then SUMs across
# batches, and exact quantiles fall out of one cumulative window over
# the bounded histogram: pct-th percentile = min v with cum(v) >=
# ceil(pct·n/100) — the explicit rank definition, written out
# IDENTICALLY in the oracle so no engine's percentile_disc semantics
# are trusted.
#
# Same two-semantics contract as st16: duplicate DELIVERY (two staged
# copies, one batch each) legitimately doubles every histogram count
# (quantiles are invariant to uniform doubling — the oracle doubles
# and the values must not move, which is itself a property check);
# crash-REPLAY of batch 0 through the sink must be absorbed by the
# marker reconciliation.
#
# Scale shape: per-batch cell extraction is one (type, cent) agg —
# map-side combine does the heavy lifting; the registry grows
# |distinct cents per type| rows per batch (~20k at sf0.1 —
# kilobytes); quantile extraction windows over the bounded histogram,
# never the event stream.
# ---------------------------------------------------------------------------

_ST17_PCTS = (1, 5, 25, 50, 75, 95, 99)


def st17_streaming_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    work = tempfile.mkdtemp(prefix="st17_")
    src, reg, ckpt = f"{work}/src", f"{work}/reg", f"{work}/ckpt"
    _link_events_into(sf_dir, src, n_copies=2)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        cells = (
            batch_df.filter(F.col("value").isNotNull())
            .select(
                "event_type",
                F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v"),
            )
            .groupBy("event_type", "v")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        cells.select(
            F.lit(batch_id).cast("long").alias("batch_id"), "event_type", "v", "cnt"
        ).write.mode("append").parquet(reg)

    stream = _raw_events_stream(spark, sf_dir, src, max_files_per_trigger=1)

    def drain() -> None:
        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)

    # no stateful operator in this drain (registry lives in files) —
    # the _stream_shuffle state-partition pin would only throttle the
    # per-batch aggregation to 4 tasks (VERDICT r10 #5 drain floor)
    drain()
    drain()  # checkpoint restart: no new batches, registry untouched

    # crash-replay: batch 0's file through the sink AGAIN with the same
    # batch_id — MAX-reconciliation below must absorb the duplicate
    from ..catalog import normalize_event_ts

    sink(normalize_event_ts(spark.read.parquet(f"{src}/00-events.parquet")), 0)

    from pyspark.sql import Window

    hist = (
        spark.read.parquet(reg)
        .groupBy("batch_id", "event_type", "v")
        .agg(F.max("cnt").alias("cnt"))  # replayed partials are identical
        .groupBy("event_type", "v")
        .agg(F.sum("cnt").alias("cnt"))
    )
    cum = hist.select(
        "event_type",
        "v",
        F.sum("cnt").over(Window.partitionBy("event_type").orderBy("v")).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )
    pcts = cum.select(
        "event_type",
        "v",
        "cum",
        "n",
        F.explode(F.array(*[F.lit(p) for p in _ST17_PCTS])).alias("pct"),
    )
    return (
        pcts.filter(F.col("cum") >= F.expr("(pct * n + 99) DIV 100"))
        .groupBy("event_type", "pct")
        .agg(F.max("n").cast("long").alias("n"), F.min("v").cast("long").alias("value_cents"))
        .select("event_type", F.col("pct").cast("long").alias("pct"), "n", "value_cents")
        .orderBy("event_type", "pct")
    )


_ST17_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
hist AS (
  -- doubled delivery: every event arrives twice (two staged copies)
  SELECT event_type, v, 2 * COUNT(*) AS cnt FROM ev GROUP BY event_type, v
),
cum AS (
  SELECT event_type, v,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
),
p AS (SELECT UNNEST([{", ".join(str(p) for p in _ST17_PCTS)}]) AS pct)
SELECT event_type,
       CAST(pct AS BIGINT) AS pct,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MIN(v) AS BIGINT) AS value_cents
FROM cum, p
WHERE cum >= (pct * n + 99) // 100
GROUP BY event_type, pct
ORDER BY event_type, pct
"""

QUERIES["st17_streaming_exact_quantiles"] = st17_streaming_exact_quantiles
ORACLES["st17_streaming_exact_quantiles"] = _ST17_SQL


# ---------------------------------------------------------------------------
# ST18 (r8) — streaming ZONE-MAP maintenance: q133's data-skipping
# stats computed the way a lakehouse actually computes them — ON THE
# WRITE PATH, per micro-batch (Delta/Iceberg attach per-file min/max
# at commit time; this is that operator with the file = the daily
# zone). Each batch appends its partial zone cells (batch_id, z,
# n_rows, min_s, max_s); the read side MAX/MIN-reconciles per
# (batch_id, z) — replayed partials are bit-identical, the st16
# txn-marker discipline, needed because n_rows is ADDITIVE — then
# merges across batches with the zone-map algebra (SUM n, MIN min,
# MAX max) and evaluates q133's lossless prune test over a fixed
# timestamp-range predicate suite. Doubled delivery doubles n_rows
# and leaves min/max fixed (the algebraic/additive split inside ONE
# state row); batch-0 crash-replay must not move the hash. Epochs are
# floored per term (the q137 sub-second lesson).
# ---------------------------------------------------------------------------

_ST18_PREDS = (  # (pred_id, lo, hi) — inclusive UTC timestamp ranges
    (1, "2024-01-05 00:00:00", "2024-01-07 23:59:59"),
    (2, "2024-01-15 00:00:00", "2024-01-15 23:59:59"),
    (3, "2024-01-01 00:00:00", "2024-01-31 23:59:59"),
    (4, "2024-01-25 00:00:00", "2024-01-31 23:59:59"),
)


def st18_streaming_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    work = tempfile.mkdtemp(prefix="st18_")
    src, reg, ckpt = f"{work}/src", f"{work}/reg", f"{work}/ckpt"
    _link_events_into(sf_dir, src, n_copies=2)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        cells = (
            batch_df.select(
                F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)").alias("s")
            )
            .select(F.expr("s DIV 86400").alias("z"), "s")
            .groupBy("z")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("s").alias("min_s"),
                F.max("s").alias("max_s"),
            )
        )
        cells.select(
            F.lit(batch_id).cast("long").alias("batch_id"), "z", "n_rows", "min_s", "max_s"
        ).write.mode("append").parquet(reg)

    stream = _raw_events_stream(spark, sf_dir, src, max_files_per_trigger=1)

    def drain() -> None:
        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)

    # no stateful operator in this drain (registry lives in files) —
    # the _stream_shuffle state-partition pin would only throttle the
    # per-batch aggregation to 4 tasks (VERDICT r10 #5 drain floor)
    drain()
    drain()  # checkpoint restart: no new batches

    from ..catalog import normalize_event_ts

    sink(normalize_event_ts(spark.read.parquet(f"{src}/00-events.parquet")), 0)

    zones = (
        spark.read.parquet(reg)
        .groupBy("batch_id", "z")
        .agg(  # replayed partials are bit-identical
            F.max("n_rows").alias("n_rows"),
            F.min("min_s").alias("min_s"),
            F.max("max_s").alias("max_s"),
        )
        .groupBy("z")
        .agg(  # the zone-map merge algebra
            F.sum("n_rows").alias("n_rows"),
            F.min("min_s").alias("min_s"),
            F.max("max_s").alias("max_s"),
        )
    )
    import datetime as _dt

    def _ep(iso: str) -> int:
        return int(
            _dt.datetime.fromisoformat(iso).replace(tzinfo=_dt.timezone.utc).timestamp()
        )

    preds = spark.createDataFrame(
        [(pid, _ep(lo), _ep(hi)) for pid, lo, hi in _ST18_PREDS],
        "pred_id long, lo_s long, hi_s long",
    )
    audited = zones.crossJoin(F.broadcast(preds)).withColumn(
        "pruned",
        ((F.col("max_s") < F.col("lo_s")) | (F.col("min_s") > F.col("hi_s"))).cast("long"),
    )
    matching = (
        # normalize like the sink/replay path: on Spark<4.1 the legacy
        # INT64 read yields bigint ts and unix_timestamp() would null out
        normalize_event_ts(spark.read.parquet(src))
        .select(F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)").alias("s"))
        .crossJoin(F.broadcast(preds))
        .filter((F.col("s") >= F.col("lo_s")) & (F.col("s") <= F.col("hi_s")))
        .groupBy("pred_id")
        .agg(F.count(F.lit(1)).alias("matching_rows"))
    )
    return (
        audited.groupBy("pred_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_zones"),
            F.sum("pruned").cast("long").alias("n_pruned"),
            F.sum(F.when(F.col("pruned") == 0, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("scanned_rows"),
        )
        .join(matching, "pred_id", "left")
        .select(
            "pred_id",
            "n_zones",
            "n_pruned",
            "scanned_rows",
            F.coalesce("matching_rows", F.lit(0)).cast("long").alias("matching_rows"),
        )
        .orderBy("pred_id")
    )


def _st18_sql() -> str:
    pred_rows = ", ".join(
        f"({pid}, TIMESTAMP '{lo}', TIMESTAMP '{hi}')" for pid, lo, hi in _ST18_PREDS
    )
    return f"""
WITH base AS (
  -- doubled delivery: every event arrives twice (two staged copies)
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM (SELECT ts FROM events UNION ALL SELECT ts FROM events)
),
zones AS (
  SELECT s // 86400 AS z, COUNT(*) AS n_rows, MIN(s) AS min_s, MAX(s) AS max_s
  FROM base GROUP BY 1
),
preds AS (
  SELECT pred_id,
         CAST(floor(epoch(lo)) AS BIGINT) AS lo_s,
         CAST(floor(epoch(hi)) AS BIGINT) AS hi_s
  FROM (VALUES {pred_rows}) AS t(pred_id, lo, hi)
),
audited AS (
  SELECT p.pred_id, z.n_rows,
         CASE WHEN z.max_s < p.lo_s OR z.min_s > p.hi_s THEN 1 ELSE 0 END AS pruned
  FROM zones z CROSS JOIN preds p
),
matching AS (
  SELECT p.pred_id, COUNT(*) AS matching_rows
  FROM base b JOIN preds p ON b.s BETWEEN p.lo_s AND p.hi_s
  GROUP BY p.pred_id
)
SELECT a.pred_id,
       CAST(COUNT(*) AS BIGINT) AS n_zones,
       CAST(SUM(a.pruned) AS BIGINT) AS n_pruned,
       CAST(SUM(CASE WHEN a.pruned = 0 THEN a.n_rows ELSE 0 END) AS BIGINT)
         AS scanned_rows,
       CAST(COALESCE(MAX(m.matching_rows), 0) AS BIGINT) AS matching_rows
FROM audited a LEFT JOIN matching m ON a.pred_id = m.pred_id
GROUP BY a.pred_id
ORDER BY a.pred_id
"""


QUERIES["st18_streaming_zonemap"] = st18_streaming_zonemap
ORACLES["st18_streaming_zonemap"] = _st18_sql()


# ---------------------------------------------------------------------------
# ST19 — streaming Benford first-digit audit (r9): q106's fraud/anomaly
# audit computed the way a monitoring pipeline actually computes it —
# incrementally on the ingest path. The per-batch first-digit histogram
# is ADDITIVE state (a crash-replayed batch would double-count), so the
# registry uses the st16/st17/st18 txn-marker discipline: each micro-
# batch appends (batch_id, digit, cnt) partials; the read side
# MAX-reconciles per (batch_id, digit) — replayed partials are
# bit-identical — then SUMs across batches. Duplicate DELIVERY (two
# staged copies) legitimately doubles counts and the oracle counts
# every event twice; obs_ppm is doubling-invariant (a property check in
# itself) while total/chi_term scale with it. The batch-0 crash-replay
# leg re-runs the sink and the hash must not move.
#
# Scale shape (100 TB): per-batch cell extraction is one map-side-
# combined 9-row aggregate; the registry grows <= 9 rows per batch; the
# Benford report runs on the reconciled 9-row frame.
# ---------------------------------------------------------------------------


def st19_streaming_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .training import _BENFORD_PPM

    work = tempfile.mkdtemp(prefix="st19_")
    src, reg, ckpt = f"{work}/src", f"{work}/reg", f"{work}/ckpt"
    _link_events_into(sf_dir, src, n_copies=2)

    cents = F.round(F.col("value").cast("decimal(12,4)") * 100, 0).cast("long")
    digit = F.substring(F.col("cents").cast("string"), 1, 1).cast("int")

    def _digits(df: DataFrame) -> DataFrame:
        return (
            df.select(cents.alias("cents"))
            .filter(F.col("cents") > 0)
            .select(digit.alias("digit"))
            .groupBy("digit")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _digits(batch_df).select(
            F.lit(batch_id).cast("long").alias("batch_id"), "digit", "cnt"
        ).write.mode("append").parquet(reg)

    stream = _raw_events_stream(spark, sf_dir, src, max_files_per_trigger=1)

    def drain() -> None:
        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)

    # no stateful operator in this drain (registry lives in files) —
    # the _stream_shuffle state-partition pin would only throttle the
    # per-batch aggregation to 4 tasks (VERDICT r10 #5 drain floor)
    drain()
    drain()  # checkpoint restart: no new batches, registry untouched

    # crash-replay: batch 0's ACTUAL input through the sink AGAIN, same
    # batch_id. The file set is derived from the FileStreamSource commit
    # log ({ckpt}/sources/0/0 — one JSON entry per file), NOT assumed:
    # with maxFilesPerTrigger=1 batch 0 happens to be 00-events.parquet,
    # but hardcoding that would silently blend partials from DIFFERENT
    # files under the per-(batch_id, digit) MAX-reconcile if the trigger
    # packing ever changed — the reconcile only detects replays of the
    # SAME input.
    import json as _json

    from ..catalog import normalize_event_ts

    with open(f"{ckpt}/sources/0/0") as fh:
        batch0_files = [
            _json.loads(line)["path"]
            for line in fh
            if line.startswith("{")
        ]
    assert batch0_files, "st19: empty batch-0 file manifest in checkpoint"
    sink(normalize_event_ts(spark.read.parquet(*batch0_files)), 0)

    obs = (
        spark.read.parquet(reg)
        .groupBy("batch_id", "digit")
        .agg(F.max("cnt").alias("cnt"))  # replayed partials are identical
        .groupBy("digit")
        .agg(F.sum("cnt").alias("observed"))
    )
    tot = obs.agg(F.sum("observed").alias("total"))
    exp_map = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
    )
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("digit").cast("int").alias("digit"),
            F.col("observed").cast("long").alias("observed"),
            F.col("total").cast("long").alias("total"),
            F.expr("observed * 1000000 div total").alias("obs_ppm"),
            exp_map[F.col("digit")].cast("long").alias("exp_ppm"),
        )
        .withColumn("delta_ppm", F.col("obs_ppm") - F.col("exp_ppm"))
        .withColumn(
            "chi_term",
            F.expr(
                "CAST((CAST(observed AS DECIMAL(38,0)) * 1000000 - CAST(exp_ppm AS DECIMAL(38,0)) * total)"
                " * (CAST(observed AS DECIMAL(38,0)) * 1000000 - CAST(exp_ppm AS DECIMAL(38,0)) * total)"
                " div (CAST(exp_ppm AS DECIMAL(38,0)) * total * 1000000) AS BIGINT)"
            ),
        )
        .orderBy("digit")
    )


def _st19_sql() -> str:
    from .training import _BENFORD_PPM

    case = " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    return f"""
WITH cents AS (
  SELECT CAST(round(CAST(value AS DECIMAL(12,4)) * 100, 0) AS BIGINT) AS cents
  FROM events
),
obs AS (
  -- doubled delivery: every event arrives twice (two staged copies)
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         2 * COUNT(*) AS observed
  FROM cents WHERE cents > 0
  GROUP BY 1
),
tot AS (SELECT SUM(observed) AS total FROM obs)
SELECT CAST(digit AS INTEGER) AS digit,
       CAST(observed AS BIGINT) AS observed,
       CAST(total AS BIGINT) AS total,
       CAST(observed * 1000000 // total AS BIGINT) AS obs_ppm,
       CAST(CASE digit {case} END AS BIGINT) AS exp_ppm,
       CAST(observed * 1000000 // total - CASE digit {case} END AS BIGINT) AS delta_ppm,
       CAST((CAST(observed AS HUGEINT) * 1000000 - CAST(CASE digit {case} END AS HUGEINT) * total)
            * (CAST(observed AS HUGEINT) * 1000000 - CAST(CASE digit {case} END AS HUGEINT) * total)
            // (CAST(CASE digit {case} END AS HUGEINT) * total * 1000000) AS BIGINT) AS chi_term
FROM obs, tot
ORDER BY digit
"""


QUERIES["st19_streaming_benford"] = st19_streaming_benford
ORACLES["st19_streaming_benford"] = _st19_sql()


# ---------------------------------------------------------------------------
# ST20 — streaming EWMA level maintenance (the streaming counterpart
# of q149, and the time-series member of the st16-st19 registry
# family: CMS counts, exact quantiles, zonemaps, Benford — now the
# smoothed level itself, the metric a monitoring dashboard actually
# plots over the ingest path).
#
# The serial EWMA recurrence cannot be maintained incrementally
# across out-of-order micro-batches; q149's truncated power-of-two
# kernel CAN, because it makes the smoothed value a read-side
# transform of PURELY ADDITIVE state: per-batch daily cents partials
# (event_type, day, cents) append to the registry; the read side
# MAX-reconciles per (batch_id, event_type, day) — replayed partials
# of the SAME batch are identical, the st16-st19 exactly-once
# discipline — SUMs across batches into the daily frame, and applies
# the 16-day 2^(15-k) kernel there (explode + one hash agg, q149's
# exact-integer shape). Duplicate DELIVERY (two staged copies)
# legitimately doubles every daily total, which scales ewma_cents by
# exactly 2 (the kernel is linear) — a property check in itself.
# Crash-replay of batch 0 (file set from the FileStreamSource commit
# log, the st19 rule) must not move the hash.
#
# Scale: per-batch state is a <=|days x types| map-side agg; the
# registry grows O(days x types) rows per batch; the kernel runs on
# the reconciled calendar-bounded frame, never on events.
# ---------------------------------------------------------------------------


def st20_streaming_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import tempfile

    from ..catalog import normalize_event_ts
    from .behavior import _Q149_H

    work = tempfile.mkdtemp(prefix="st20_")
    src, reg, ckpt = f"{work}/src", f"{work}/reg", f"{work}/ckpt"
    _link_events_into(sf_dir, src, n_copies=2)

    cents = F.round(F.col("value").cast("decimal(12,4)") * 100, 0).cast("long")

    def _daily(df: DataFrame) -> DataFrame:
        return (
            df.select(
                "event_type", F.col("ts").cast("date").alias("day"), cents.alias("c")
            )
            .groupBy("event_type", "day")
            .agg(F.sum("c").alias("cents"))
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _daily(batch_df).select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "event_type",
            "day",
            "cents",
        ).write.mode("append").parquet(reg)

    stream = _raw_events_stream(spark, sf_dir, src, max_files_per_trigger=1)

    def drain() -> None:
        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q)

    # no stateful operator in this drain (registry lives in files) —
    # the _stream_shuffle state-partition pin would only throttle the
    # per-batch aggregation to 4 tasks (VERDICT r10 #5 drain floor)
    drain()
    drain()  # checkpoint restart: no new batches, registry untouched

    # crash-replay batch 0's ACTUAL file set (st19's commit-log rule)
    with open(f"{ckpt}/sources/0/0") as fh:
        batch0_files = [
            _json.loads(line)["path"] for line in fh if line.startswith("{")
        ]
    assert batch0_files, "st20: empty batch-0 file manifest in checkpoint"
    sink(normalize_event_ts(spark.read.parquet(*batch0_files)), 0)

    daily = (
        spark.read.parquet(reg)
        .groupBy("batch_id", "event_type", "day")
        .agg(F.max("cents").alias("cents"))  # replayed partials identical
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("cents"))
    )
    contrib = daily.select(
        "event_type",
        "cents",
        F.explode(F.expr(f"sequence(0, {_Q149_H})")).alias("k"),
        F.col("day").alias("src_day"),
    ).select(
        "event_type",
        F.expr("date_add(src_day, k)").alias("day"),
        F.expr(f"cents * shiftleft(CAST(1 AS BIGINT), {_Q149_H} - k)").alias("num"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {_Q149_H} - k)").alias("den"),
    )
    smoothed = contrib.groupBy("event_type", "day").agg(
        F.sum("num").alias("num"), F.sum("den").alias("den")
    )
    return (
        smoothed.join(daily.select("event_type", "day", "cents"), ["event_type", "day"])
        .select(
            "event_type",
            "day",
            F.col("cents").cast("long").alias("cents"),
            F.expr("num DIV den").alias("ewma_cents"),
        )
        .orderBy("event_type", "day")
    )


def _st20_sql() -> str:
    from .behavior import _Q149_H

    return f"""
WITH daily AS (
  -- doubled delivery: every event arrives twice (two staged copies)
  SELECT event_type, CAST(ts AS DATE) AS day,
         2 * SUM(CAST(round(CAST(value AS DECIMAL(12,4)) * 100, 0) AS BIGINT)) AS cents
  FROM events
  GROUP BY event_type, CAST(ts AS DATE)
),
contrib AS (
  SELECT d.event_type,
         d.day + CAST(k AS INT) AS day,
         d.cents * (1::BIGINT << ({_Q149_H} - k)) AS num,
         (1::BIGINT << ({_Q149_H} - k)) AS den
  FROM daily d CROSS JOIN (SELECT UNNEST(range(0, {_Q149_H + 1})) AS k)
),
smoothed AS (
  SELECT event_type, day, SUM(num) AS num, SUM(den) AS den
  FROM contrib GROUP BY event_type, day
)
SELECT s.event_type, s.day, CAST(d.cents AS BIGINT) AS cents,
       CAST(s.num // s.den AS BIGINT) AS ewma_cents
FROM smoothed s JOIN daily d ON s.event_type = d.event_type AND s.day = d.day
ORDER BY s.event_type, s.day
"""


QUERIES["st20_streaming_ewma"] = st20_streaming_ewma
ORACLES["st20_streaming_ewma"] = _st20_sql()
