"""Q101 — entity resolution: blocking + Fellegi–Sunter match scoring.

The reference joins rows to reference dimensions by exact keys
(`/root/reference/test.py:76-92` FOTO_FOLDER_MAP lookups); real-world
corpus/CRM consolidation needs PROBABILISTIC record linkage — the
Fellegi–Sunter model (JASA 1969; the backbone of Splink, dedupe.io,
and every census linkage system): block candidate pairs on a cheap
key, score field-by-field agreement with integer log-odds weights,
classify match / possible / non-match against thresholds.

A "dirty" copy of ``customer`` is derived arithmetically IN-QUERY (the
Febrl/benchmark-generator construction, so both engines rebuild the
identical corruption without a side table):

  - one character dropped from the name at position 10 + custkey % 3
    (inside the zero-padding, so the parsed numeric id survives)
  - account balance rounded to the nearest 10 dollars (truncating
    integer-cents arithmetic — no float rounding)
  - every 7th record's market segment overwritten with 'UNKNOWN'

Blocking key: (c_nationkey, right(name, 1)) — the last name character
survives the corruption. Deliberately coarse so the candidate set
contains true pairs AND same-block impostors; a deployment tightens
the key (or unions several keys) exactly like turning this knob.

Agreement weights (frozen integer model):
  numeric-id parse agrees      +30 / -10
  |balance diff| <= $5         +16 / -12
  segment agrees                +8 /  -6
Thresholds: match >= 30, possible >= 10.

Scale shape: the dirty side is a map-side projection (no second scan
at deployment — it stands in for "the other source"); candidates come
from ONE equi-join on the blocking key (never a cross join); scoring
is codegen CASE arithmetic on candidates only. Block sizes are
n/(25*10) of each source — bounded skew a deployment controls via the
key. The oracle replays corruption, blocking, and scoring verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load

_W_NUM_A, _W_NUM_D = 30, -10
_W_BAL_A, _W_BAL_D = 16, -12
_W_SEG_A, _W_SEG_D = 8, -6
_T_MATCH, _T_POSSIBLE = 30, 10
_BAL_TOL_CENTS = 500


def q101_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal").cast("decimal(12,4)") * 100, 0).cast("long")
    clean = cust.select(
        F.col("c_custkey").alias("clean_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        cents.alias("bal_cents"),
        F.col("c_mktsegment").alias("seg"),
    )
    # char at 1-based position 10 + custkey % 3 dropped (zero-pad region)
    dirty = cust.select(
        (F.col("c_custkey") + 1000000).alias("dirty_id"),
        F.concat(
            F.expr("substr(c_name, 1, CAST(9 + c_custkey % 3 AS INT))"),
            F.expr("substr(c_name, CAST(11 + c_custkey % 3 AS INT))"),
        ).alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.expr("1000 * ((CAST(round(CAST(c_acctbal AS DECIMAL(12,4)) * 100, 0) AS BIGINT) + 500) div 1000)").alias("bal_cents"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )

    def blocked(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            *[F.col(c).alias(f"{prefix}_{c}") for c in df.columns],
            F.col("nat").alias("b_nat"),
            F.expr("right(name, 1)").alias("b_last"),
            # try_cast mirrors the oracle's TRY_CAST: a name without
            # trailing digits degrades to NULL instead of throwing
            # CAST_INVALID_INPUT under ANSI mode (ADVICE r4)
            F.expr("TRY_CAST(regexp_extract(name, '([0-9]+)$', 1) AS BIGINT)").alias(
                f"{prefix}_num"
            ),
        )

    # The blocking join expands ~|block|x per probe row (600x at sf1):
    # scan-size-based input splits cannot anticipate that, so a single
    # row-group file would funnel the whole expansion into one task.
    # Round-robin repartition of the (tiny) probe side spreads the
    # fanout across every core/executor — the broadcast build side is
    # replicated everywhere, so no co-location is lost. Same pattern a
    # 1000-executor deployment needs against hot blocking keys.
    par = spark.sparkContext.defaultParallelism
    cand = blocked(clean, "l").repartition(par).join(
        F.broadcast(blocked(dirty, "r")), ["b_nat", "b_last"]
    )
    scored = cand.select(
        F.col("l_clean_id").alias("clean_id"),
        F.col("r_dirty_id").alias("dirty_id"),
        F.when(F.col("l_num") == F.col("r_num"), _W_NUM_A).otherwise(_W_NUM_D).alias("w_num"),
        F.when(
            F.abs(F.col("l_bal_cents") - F.col("r_bal_cents")) <= _BAL_TOL_CENTS,
            _W_BAL_A,
        ).otherwise(_W_BAL_D).alias("w_bal"),
        F.when(F.col("l_seg") == F.col("r_seg"), _W_SEG_A).otherwise(_W_SEG_D).alias("w_seg"),
    ).withColumn("score", F.col("w_num") + F.col("w_bal") + F.col("w_seg"))
    return (
        scored.select(
            "clean_id",
            "dirty_id",
            F.col("w_num").cast("int").alias("w_num"),
            F.col("w_bal").cast("int").alias("w_bal"),
            F.col("w_seg").cast("int").alias("w_seg"),
            F.col("score").cast("int").alias("score"),
            F.when(F.col("score") >= _T_MATCH, "match")
            .when(F.col("score") >= _T_POSSIBLE, "possible")
            .otherwise("non_match")
            .alias("cls"),
        )
        .orderBy(F.desc("score"), "clean_id", "dirty_id")
        .limit(200)
    )


Q101_SQL = rf"""
WITH clean AS (
  SELECT c_custkey AS clean_id, c_name AS name, c_nationkey AS nat,
         CAST(round(CAST(c_acctbal AS DECIMAL(12,4)) * 100, 0) AS BIGINT) AS bal_cents,
         c_mktsegment AS seg
  FROM customer
),
dirty AS (
  SELECT c_custkey + 1000000 AS dirty_id,
         substr(c_name, 1, CAST(9 + c_custkey % 3 AS INT))
           || substr(c_name, CAST(11 + c_custkey % 3 AS INT)) AS name,
         c_nationkey AS nat,
         1000 * ((CAST(round(CAST(c_acctbal AS DECIMAL(12,4)) * 100, 0) AS BIGINT) + 500) // 1000) AS bal_cents,
         CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS seg
  FROM customer
),
lb AS (
  SELECT *, nat AS b_nat, right(name, 1) AS b_last,
         TRY_CAST(regexp_extract(name, '([0-9]+)$', 1) AS BIGINT) AS l_num
  FROM clean
),
rb AS (
  SELECT *, nat AS b_nat, right(name, 1) AS b_last,
         TRY_CAST(regexp_extract(name, '([0-9]+)$', 1) AS BIGINT) AS r_num
  FROM dirty
),
scored AS (
  SELECT lb.clean_id, rb.dirty_id,
         CASE WHEN lb.l_num = rb.r_num THEN {_W_NUM_A} ELSE {_W_NUM_D} END AS w_num,
         CASE WHEN abs(lb.bal_cents - rb.bal_cents) <= {_BAL_TOL_CENTS}
              THEN {_W_BAL_A} ELSE {_W_BAL_D} END AS w_bal,
         CASE WHEN lb.seg = rb.seg THEN {_W_SEG_A} ELSE {_W_SEG_D} END AS w_seg
  FROM lb JOIN rb ON lb.b_nat = rb.b_nat AND lb.b_last = rb.b_last
)
SELECT clean_id, dirty_id,
       CAST(w_num AS INTEGER) AS w_num,
       CAST(w_bal AS INTEGER) AS w_bal,
       CAST(w_seg AS INTEGER) AS w_seg,
       CAST(w_num + w_bal + w_seg AS INTEGER) AS score,
       CASE WHEN w_num + w_bal + w_seg >= {_T_MATCH} THEN 'match'
            WHEN w_num + w_bal + w_seg >= {_T_POSSIBLE} THEN 'possible'
            ELSE 'non_match' END AS cls
FROM scored
ORDER BY score DESC, clean_id, dirty_id
LIMIT 200
"""


QUERIES = {"q101_entity_resolution": q101_entity_resolution}
ORACLES = {"q101_entity_resolution": Q101_SQL}
