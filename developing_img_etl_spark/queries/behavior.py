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
