"""Q69/Q70 — behavioral analytics over ``events``: cohort retention and
top event paths. The reference's weekly reporting cadence
(`/root/reference/test.py:130`, the `minggu` key) generalizes to
event-time cohorting; path analysis is the ordered-aggregation
counterpart of the q35 funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load

WEEK_SECONDS = 7 * 86400
DAY_SECONDS = 86400


# ---------------------------------------------------------------------------
# Q69 — weekly cohort retention (the classic growth-analytics triangle):
# users are cohorted by the epoch-aligned week of their FIRST event;
# each (cohort, week-offset) cell counts distinct users still active.
# Week identity comes from F.window (epoch-aligned, the q11a contract);
# the offset is a datediff — integer arithmetic on both engines, no
# timezone exposure. Shape: two hash aggs + one join on user_id + a
# window over the (cohorts × offsets) frame, which is bounded by the
# calendar, not the data. Retention as integer ppm (engine-exact).
# ---------------------------------------------------------------------------
def q69_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    uw = (
        events.select(
            "user_id", F.window("ts", "7 days").start.alias("wk_start")
        )
        .distinct()
    )
    first = uw.groupBy("user_id").agg(F.min("wk_start").alias("cohort_start"))
    act = (
        uw.join(first, "user_id")
        .groupBy(
            "cohort_start",
            (F.datediff("wk_start", "cohort_start") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    w = Window.partitionBy("cohort_start")
    return (
        act.withColumn(
            "cohort_size",
            F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(w),
        )
        .select(
            "cohort_start",
            "week_offset",
            "n_active",
            "cohort_size",
            F.expr("n_active * 1000000 DIV cohort_size").alias("retained_ppm"),
        )
        .orderBy("cohort_start", "week_offset")
    )


Q69_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / {WEEK_SECONDS}) AS BIGINT) AS wk
  FROM events
),
first AS (SELECT user_id, MIN(wk) AS cwk FROM uw GROUP BY user_id),
act AS (
  SELECT f.cwk, uw.wk - f.cwk AS week_offset,
         COUNT(DISTINCT uw.user_id) AS n_active
  FROM uw JOIN first f USING (user_id)
  GROUP BY 1, 2
),
sized AS (
  SELECT *,
         MAX(CASE WHEN week_offset = 0 THEN n_active END)
           OVER (PARTITION BY cwk) AS cohort_size
  FROM act
)
SELECT TIMESTAMP '1970-01-01' + INTERVAL (cwk * {WEEK_SECONDS}) SECOND AS cohort_start,
       CAST(week_offset AS BIGINT) AS week_offset,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(cohort_size AS BIGINT) AS cohort_size,
       CAST(n_active * 1000000 // cohort_size AS BIGINT) AS retained_ppm
FROM sized
ORDER BY cohort_start, week_offset
"""


# ---------------------------------------------------------------------------
# Q70 — top event paths (ordered aggregation): the first 5 event types
# per (user, epoch-day), in (ts, event_id) total order, joined into a
# '>' path string; paths ranked by frequency. Spark builds the ordered
# string from collect_list(struct) + array_sort + slice (the q16
# flatten discipline — no array column ever reaches the driver or a
# result hash); the oracle uses string_agg ORDER BY over a
# row_number-limited subquery. One shuffle on (user, day), one on path.
# ---------------------------------------------------------------------------
_PATH_LEN = 5


def q70_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    day = F.window("ts", "1 day").start.alias("day")
    per_day = (
        events.select("user_id", day, F.struct("ts", "event_id", "event_type").alias("s"))
        .groupBy("user_id", "day")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(F.collect_list("s")), lambda x: x.event_type
                    ),
                    1,
                    _PATH_LEN,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        per_day.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_user_days"))
        .orderBy(F.desc("n_user_days"), "path")
        .limit(10)
    )


Q70_SQL = f"""
WITH ordered AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / {DAY_SECONDS}) AS BIGINT) AS day,
         event_type, ts, event_id,
         row_number() OVER (
           PARTITION BY user_id, CAST(floor(epoch(ts) / {DAY_SECONDS}) AS BIGINT)
           ORDER BY ts, event_id
         ) AS rn
  FROM events
),
paths AS (
  SELECT user_id, day,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM ordered
  WHERE rn <= {_PATH_LEN}
  GROUP BY user_id, day
)
SELECT path, COUNT(*) AS n_user_days
FROM paths
GROUP BY path
ORDER BY n_user_days DESC, path
LIMIT 10
"""


QUERIES = {
    "q69_cohort_retention": q69_cohort_retention,
    "q70_top_event_paths": q70_top_event_paths,
}

ORACLES = {
    "q69_cohort_retention": Q69_SQL,
    "q70_top_event_paths": Q70_SQL,
}


# ---------------------------------------------------------------------------
# Q86 — capped sessionization: sessions break on a 30-minute
# inactivity gap (q11e's rule) AND on a 4-hour duration cap measured
# from the gap-session's start — the production sessionizer contract
# (a bot firing an event every minute for a week must not produce one
# week-long session). Two-phase, fully window-expressible: LAG marks
# gap breaks → running SUM assigns gap-sessions (one user_id shuffle
# serves every window); within each gap-session the cap partitions
# events into fixed 4-hour buckets from the session start — integer
# epoch arithmetic, identical on both engines.
# ---------------------------------------------------------------------------
_SESS_GAP_S = 1800
_SESS_CAP_S = 14400


def q86_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
            > _SESS_GAP_S,
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    gap_sessions = marked.withColumn(
        "gsid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    wg = Window.partitionBy("user_id", "gsid")
    capped = gap_sessions.withColumn(
        "sub",
        (
            (F.unix_timestamp("ts") - F.unix_timestamp(F.min("ts").over(wg)))
            / _SESS_CAP_S
        ).cast("long"),
    )
    return (
        capped.groupBy("user_id", "gsid", "sub")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            "session_start",
            "n_events",
            (
                F.unix_timestamp("session_end") - F.unix_timestamp("session_start")
            ).alias("duration_s"),
        )
        .orderBy("user_id", "session_start")
    )


Q86_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts, 1) OVER
                (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > {_SESS_GAP_S}
              THEN 1 ELSE 0 END AS brk
  FROM events
),
gs AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gsid
  FROM marked
),
capped AS (
  SELECT *,
         CAST((CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(MIN(ts) OVER (PARTITION BY user_id, gsid))) AS BIGINT))
              // {_SESS_CAP_S} AS BIGINT) AS sub
  FROM gs
)
SELECT user_id,
       MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       CAST(CAST(floor(epoch(MAX(ts))) AS BIGINT) - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS BIGINT) AS duration_s
FROM capped
GROUP BY user_id, gsid, sub
ORDER BY user_id, session_start
"""

QUERIES["q86_capped_sessions"] = q86_capped_sessions
ORACLES["q86_capped_sessions"] = Q86_SQL
