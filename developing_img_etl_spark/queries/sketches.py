"""Q97 — HyperLogLog distinct-count sketch, built from scratch and
replayed EXACTLY on both engines.

The reference pipeline sizes its corpus by counting rows/images
(`/root/reference/test.py:120-133` tallies processed records); the
100 TB generalization is cardinality estimation: "how many distinct
n-grams / users / URLs does this corpus contain" is the canonical
sketch workload, and HLL is the canonical sketch (Flajolet et al.
2007; Heule et al. "HyperLogLog in Practice", Google, 2013).

q17 already exercises Spark's built-in approx_count_distinct, but its
HLL++ register layout is engine-private, so that query is rows-only.
This query builds the sketch FROM PRIMITIVES so the DuckDB oracle can
replay it bit-for-bit — turning an "approximate" operator into a
hash-matched one:

  h       = first 15 hex digits of md5(shingle)       (60-bit portable hash)
  idx     = h % 512                                   (m = 512 registers, p = 9)
  w       = h // 512                                  (51-bit rho field)
  rho(w)  = 52 - bitlen(w), w = 0 -> 52               (leading-zero rank;
                                                       bitlen via bin(), which
                                                       both engines render
                                                       without leading zeros)
  M[idx]  = max(rho)                                  (the register file)

The estimator is evaluated in EXACT integer arithmetic — no floating
point anywhere, so partitioning/accumulation order cannot flip a bit:

  sum 2^-M scaled by 2^52:  S = sum(1 << (52 - M)) + n_zero * 2^52
  alpha_m = 0.7213 / (1 + 1.079/m) = 7213*m / (10*(1000m + 1079))
  E = alpha_m * m^2 / sum(2^-M)
    = (7213 * m^3 * 2^52)  DIV  (10*(1000m+1079) * S)

The numerator constant is ~4.4e27 — DECIMAL(38,0) in Spark, HUGEINT in
DuckDB; both `div`/`//` truncate identically. S <= m * 2^52 = 2^61
fits a BIGINT.

Mergeability — THE property that makes the sketch a distributed
operator — is proven inside the query: per-language register files are
merged by taking the element-wise max, and the merged scope's row must
equal the directly-computed global scope's row (the oracle recomputes
both independently, so the hash-match certifies max-merge == direct
on both engines).

Scale shape: the hash/idx/rho arithmetic is map-side codegen on the
shared persisted shingle index (`_shingle.py` — zero extra scans); the
only shuffles carry (scope, idx, rho) — 512 registers per scope, i.e.
KILOBYTES, regardless of whether the input is 500 docs or 100 TB. The
exact_distinct audit column is the one data-sized aggregation, present
to make the estimator's error measurable in the result itself (a
deployment doing pure estimation would drop it and shuffle only
registers).

Accuracy: sigma = 1.04/sqrt(512) ~= 4.6%; tests/test_approx_ops.py
pins every scope within 15% of exact at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ._shingle import shingle_index
from .classify import md5_prefix_int, sql_md5_prefix_int

_P = 9
_M = 1 << _P  # 512 registers
_FIELD = 60 - _P  # 51-bit rho field; rho in 1..52
_NUM = 7213 * _M**3 * 2**_FIELD * 2  # alpha_m * m^3 scaled: 7213*m^3*2^52
# NB: 2**_FIELD * 2 == 2^52 — the S scale below.
_DEN_C = 10 * (1000 * _M + 1079)
_S_SCALE = 1 << (_FIELD + 1)  # 2^52: the scaled value of an empty register


def _rho(w: Column) -> Column:
    """Leading-zero rank of the 51-bit field: 52 - bitlen(w); 0 -> 52."""
    return F.when(w == 0, F.lit(_FIELD + 1)).otherwise(
        F.lit(_FIELD + 1) - F.length(F.bin(w))
    )


def q97_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    sh = shingle_index(spark, sf_dir).select("doc_id", "s")
    tagged = sh.join(docs, "doc_id").select(
        "lang",
        "s",
        md5_prefix_int(F.col("s"), 15).alias("h"),
    )
    row = tagged.select(
        "lang",
        "s",
        (F.col("h") % _M).alias("idx"),
        _rho(F.expr(f"h div {_M}")).alias("rho"),
    )

    regs_lang = row.groupBy("lang", "idx").agg(F.max("rho").alias("m_reg"))
    regs_all = row.groupBy("idx").agg(F.max("rho").alias("m_reg")).select(
        F.lit("__all__").alias("lang"), "idx", "m_reg"
    )
    regs_merged = regs_lang.groupBy("idx").agg(F.max("m_reg").alias("m_reg")).select(
        F.lit("__merged__").alias("lang"), "idx", "m_reg"
    )
    regs = regs_lang.select("lang", "idx", "m_reg").unionByName(regs_all).unionByName(
        regs_merged
    )

    est = (
        regs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_FIELD + 1} - m_reg)")).alias(
                "s_present"
            ),
        )
        .select(
            F.col("lang").alias("scope"),
            (F.lit(_M) - F.col("n_present")).cast("long").alias("n_zero_registers"),
            (
                F.col("s_present")
                + (F.lit(_M) - F.col("n_present")) * F.lit(_S_SCALE)
            ).cast("long").alias("s_scaled"),
        )
        .withColumn(
            "hll_estimate",
            F.expr(
                f"CAST('{_NUM}' AS DECIMAL(38,0)) div "
                f"(CAST({_DEN_C} AS DECIMAL(38,0)) * CAST(s_scaled AS DECIMAL(38,0)))"
            ).cast("long"),
        )
    )

    exact_lang = tagged.groupBy("lang").agg(
        F.countDistinct("s").alias("exact_distinct")
    )
    exact_all = tagged.agg(F.countDistinct("s").alias("exact_distinct"))
    exact = exact_lang.unionByName(
        exact_all.select(F.lit("__all__").alias("lang"), "exact_distinct")
    ).unionByName(
        exact_all.select(F.lit("__merged__").alias("lang"), "exact_distinct")
    ).select(F.col("lang").alias("scope"), "exact_distinct")

    return (
        est.join(exact, "scope")
        .select(
            "scope",
            "n_zero_registers",
            "s_scaled",
            "hll_estimate",
            "exact_distinct",
            F.expr(
                "CAST(CAST(abs(hll_estimate - exact_distinct) AS DECIMAL(38,0))"
                " * 1000000 DIV exact_distinct AS BIGINT)"
            ).alias("err_ppm"),
        )
        .orderBy("scope")
    )


_SQL_H = sql_md5_prefix_int(15)

Q97_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
  FROM toks
  WHERE len(t) >= 3
),
tagged AS (
  SELECT lang, shingle, {_SQL_H} AS hv
  FROM (SELECT lang, UNNEST(s) AS shingle, md5(UNNEST(s)) AS h FROM sh)
),
rho AS (
  SELECT lang, shingle, hv % {_M} AS idx,
         CASE WHEN hv // {_M} = 0 THEN {_FIELD + 1}
              ELSE {_FIELD + 1} - length(bin(hv // {_M})) END AS rho
  FROM tagged
),
regs_lang AS (
  SELECT lang, idx, MAX(rho) AS m_reg FROM rho GROUP BY lang, idx
),
regs AS (
  SELECT lang, idx, m_reg FROM regs_lang
  UNION ALL
  SELECT '__all__' AS lang, idx, MAX(rho) AS m_reg FROM rho GROUP BY idx
  UNION ALL
  SELECT '__merged__' AS lang, idx, MAX(m_reg) AS m_reg FROM regs_lang GROUP BY idx
),
est AS (
  SELECT lang AS scope,
         CAST({_M} - COUNT(*) AS BIGINT) AS n_zero_registers,
         CAST(SUM(1::BIGINT << ({_FIELD + 1} - m_reg))
              + ({_M} - COUNT(*)) * {_S_SCALE}::BIGINT AS BIGINT) AS s_scaled
  FROM regs GROUP BY lang
),
exact_lang AS (
  SELECT lang, COUNT(DISTINCT shingle) AS exact_distinct FROM rho GROUP BY lang
),
exact_all AS (
  SELECT COUNT(DISTINCT shingle) AS exact_distinct FROM rho
),
exact AS (
  SELECT lang AS scope, exact_distinct FROM exact_lang
  UNION ALL SELECT '__all__', exact_distinct FROM exact_all
  UNION ALL SELECT '__merged__', exact_distinct FROM exact_all
),
final AS (
  SELECT e.scope, e.n_zero_registers, e.s_scaled,
         CAST(CAST('{_NUM}' AS HUGEINT)
              // ({_DEN_C}::HUGEINT * e.s_scaled::HUGEINT) AS BIGINT) AS hll_estimate,
         x.exact_distinct
  FROM est e JOIN exact x USING (scope)
)
SELECT scope, n_zero_registers, s_scaled, hll_estimate,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       CAST(CAST(abs(hll_estimate - exact_distinct) AS HUGEINT)
            * 1000000 // exact_distinct AS BIGINT) AS err_ppm
FROM final
ORDER BY scope
"""


QUERIES = {"q97_hll_distinct": q97_hll_distinct}
ORACLES = {"q97_hll_distinct": Q97_SQL}
