"""Value-level sf10 correctness for the DuckDB-DNF dedup queries
(VERDICT r8 #3 / "What's missing" #1).

SF10_PROBE records 9 queries whose one-shot DuckDB oracle dies at sf10
(the near-dup pair-generation family). This script closes the evidence
gap for q30 / q74 / q122 by computing the SAME answer through a
DIFFERENT, resource-bounded oracle path and comparing values against
the Spark result at sf10:

- q30/q74: the sf1_gate iterative min-label propagation (temp-table
  fixpoint in O(diameter) linear rounds — the identical fixpoint the
  recursive `reach` CTE defines, without materializing the quadratic
  reachable-pair set), run under a DuckDB memory cap with spill.
- q122: a PIECEWISE replay of the oracle SQL — the sig stage (md5 over
  ~52M doubled shingle rows + 16 min-aggs) runs in doc_id-hash chunks
  that each write a small sigs parquet; the band/candidate/verify
  stages then run over the combined sigs (1 row/doc-variant) plus a
  candidate-restricted shingle re-derivation. Every stage is
  memory-bounded; the union of chunks is exactly the oracle's `sigs`
  CTE because the signature of a doc depends only on its own shingles.

Resumable per query (a MATCH row in the ledger with the current code
fingerprint is kept). Writes SF10_DNF_EVIDENCE.json.

Usage: python scripts/sf10_dnf_evidence.py [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo/scripts")

SF = os.environ.get("DNF_SF", "/root/repo/testdata/sf10")
OUT = os.environ.get("DNF_OUT", "/root/repo/SF10_DNF_EVIDENCE.json")
PROGRESS = os.environ.get("DNF_PROGRESS", "/root/repo/SF10_DNF_PROGRESS.jsonl")
TMP = f"/root/repo/tmp/dnf-evidence-{os.path.basename(SF.rstrip('/'))}"
N_CHUNKS = 8

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _con():
    import duckdb

    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    os.makedirs("/root/repo/tmp/duck-spill", exist_ok=True)
    con.execute("SET temp_directory='/root/repo/tmp/duck-spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _compare(spark_df, expected) -> None:
    """assert_matches' exact comparison, with the expected frame
    supplied directly instead of via a one-shot oracle SQL run."""
    import pandas as pd
    from oracle_utils import _canon

    actual = _canon(spark_df.toPandas())
    expected = _canon(expected)
    assert list(actual.columns) == list(expected.columns), (
        f"columns: spark={list(actual.columns)} oracle={list(expected.columns)}"
    )
    assert len(actual) == len(expected), f"rows: {len(actual)} vs {len(expected)}"
    for c in actual.columns:
        a, e = actual[c], expected[c]
        a_f, e_f = (pd.api.types.is_float_dtype(x) for x in (a, e))
        a_i, e_i = (pd.api.types.is_integer_dtype(x) for x in (a, e))
        assert not ((a_f and e_i) or (a_i and e_f)), f"{c}: dtype drift {a.dtype}/{e.dtype}"
        neq = ~(a.eq(e) | (a.isna() & e.isna()))
        assert not neq.any(), f"column {c!r}: {int(neq.sum())} mismatches"


# ---------------------------------------------------------------------------
# q30 / q74 — iterative closure (sf1_gate's verifier, memory-bounded)
# ---------------------------------------------------------------------------
def _check_closure(name: str, spark_df) -> None:
    from sf1_gate import _iterative_components

    con = _con()
    t0 = time.time()
    _iterative_components(con)
    print(f"  [closure fixpoint: {time.time() - t0:.0f}s]", flush=True)
    if name == "q30_dedup_clusters":
        exp = con.execute(
            "SELECT doc_id, CAST(component_id AS BIGINT) AS component_id, "
            "CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT) AS cluster_size "
            "FROM comp ORDER BY doc_id"
        ).fetchdf()
    else:  # q74_canonical_dedup
        exp = con.execute("""
WITH ranked AS (
  SELECT c.doc_id, c.component_id, d.source, d.n_chars,
         row_number() OVER (PARTITION BY c.component_id
                            ORDER BY d.n_chars DESC, c.doc_id) AS rk
  FROM comp c JOIN documents d USING (doc_id)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rk <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN rk = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
       CAST(SUM(CASE WHEN rk = 1 THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
FROM ranked GROUP BY source ORDER BY source
""").fetchdf()
    con.close()
    _compare(spark_df, exp)


# ---------------------------------------------------------------------------
# q122 — piecewise oracle replay
# ---------------------------------------------------------------------------
def _check_q122(spark_df) -> None:
    from developing_img_etl_spark.queries.classify import sql_md5_prefix_int
    from developing_img_etl_spark.queries.dedup import (
        _Q122_AB,
        _Q122_BAND_CAP,
        _Q122_BANDS,
        _Q122_K,
        _Q122_P,
        _Q122_R,
    )

    os.makedirs(TMP, exist_ok=True)
    minexprs = ",\n         ".join(
        f"MIN(({a} * base + {b}) % {_Q122_P}) AS mh{i}"
        for i, (a, b) in enumerate(_Q122_AB)
    )
    # stage 0: materialize the oracle's `inv` CTE (doubled shingle
    # inverted index) ONCE — a streaming UNNEST write, no aggregation,
    # so it runs under the memory cap at any corpus size
    inv_pq = f"{TMP}/inv.parquet"
    if not os.path.exists(inv_pq):
        con = _con()
        t0 = time.time()
        con.execute(rf"""
COPY (
  WITH toks AS (
    SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS t
    FROM documents
  ),
  sh AS (
    SELECT doc_id, source,
           list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
             i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
    FROM toks WHERE len(t) >= 3
  ),
  inv0 AS (
    SELECT doc_id, source, len(s) AS n_sh, UNNEST(s) AS shingle FROM sh
  )
  SELECT * FROM inv0
  UNION ALL
  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents), source, n_sh, shingle
  FROM inv0
) TO '{inv_pq}.tmp.parquet' (FORMAT PARQUET)
""")
        con.close()
        os.rename(f"{inv_pq}.tmp.parquet", inv_pq)
        print(f"  [inv materialized: {time.time() - t0:.0f}s]", flush=True)

    # stage 1: per-chunk sigs (the signature of a doc-variant depends
    # only on its own shingles, so a doc_id-hash partition of `inv` is
    # an exact partition of the oracle's `sigs` CTE)
    for c in range(N_CHUNKS):
        dst = f"{TMP}/sigs_{c}.parquet"
        if os.path.exists(dst):
            continue
        con = _con()
        t0 = time.time()
        con.execute(rf"""
COPY (
  WITH hashed AS (
    SELECT doc_id, source, n_sh, {sql_md5_prefix_int(7)} AS base
    FROM (SELECT doc_id, source, n_sh, md5(shingle) AS h
          FROM '{inv_pq}' WHERE doc_id % {N_CHUNKS} = {c})
  )
  SELECT doc_id, source, MAX(n_sh) AS n_sh,
         {minexprs}
  FROM hashed GROUP BY doc_id, source
) TO '{dst}.tmp.parquet' (FORMAT PARQUET)
""")
        con.close()
        os.rename(f"{dst}.tmp.parquet", dst)
        print(f"  [sigs chunk {c + 1}/{N_CHUNKS}: {time.time() - t0:.0f}s]", flush=True)

    # stage 2: bands -> candidates over the combined sigs (1 row per
    # doc-variant), then candidate-restricted exact verification
    con = _con()
    con.execute(f"CREATE VIEW sigs AS SELECT * FROM '{TMP}/sigs_*.parquet'")
    bandsel = "\n  UNION ALL ".join(
        "SELECT doc_id, source, {b} AS band, {rs} FROM sigs".format(
            b=b,
            rs=", ".join(f"mh{_Q122_R * b + r} AS r{r}" for r in range(_Q122_R)),
        )
        for b in range(_Q122_BANDS)
    )
    t0 = time.time()
    con.execute(f"""
CREATE TEMP TABLE cand AS
WITH bands AS (
  {bandsel}
),
bkeep AS (
  SELECT source, band, r0, r1, r2, r3 FROM bands
  GROUP BY ALL HAVING COUNT(*) BETWEEN 2 AND {_Q122_BAND_CAP}
),
bb AS (
  SELECT b.* FROM bands b JOIN bkeep USING (source, band, r0, r1, r2, r3)
)
SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands
FROM bb a JOIN bb b
  ON a.source = b.source AND a.band = b.band
 AND a.r0 = b.r0 AND a.r1 = b.r1 AND a.r2 = b.r2 AND a.r3 = b.r3
 AND a.doc_id < b.doc_id
GROUP BY 1, 2, 3
""")
    n_cand = con.execute("SELECT COUNT(*) FROM cand").fetchone()[0]
    print(f"  [candidates: {n_cand} rows, {time.time() - t0:.0f}s]", flush=True)

    # CANDIDATE-BOUNDED intersection (the Spark-side r7 shape, here in
    # DuckDB): enumerate each candidate pair's left-doc shingles and
    # equi-join against the right doc's postings — cost is
    # |cand| x shingles/doc, LINEAR in the candidate count. The
    # oracle's posting-list SELF-join over candidate docs is sum(df^2):
    # in this corpus every doc has an identical twin, so ~every doc is
    # a candidate and that join filled 75 GB of spill before dying
    # (first r9 attempt). Semantics identical: COUNT of shared
    # distinct shingles per candidate (source, id_a, id_b).
    t0 = time.time()
    con.execute(rf"""
CREATE TEMP TABLE common AS
SELECT c.source, c.id_a, c.id_b, COUNT(*) AS n_common
FROM cand c
JOIN '{inv_pq}' a ON a.source = c.source AND a.doc_id = c.id_a
JOIN '{inv_pq}' b ON b.source = c.source AND b.doc_id = c.id_b
                 AND b.shingle = a.shingle
GROUP BY 1, 2, 3
""")
    print(f"  [common: {time.time() - t0:.0f}s]", flush=True)

    matches = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(_Q122_K)
    )
    exp = con.execute(f"""
SELECT c.source, c.id_a, c.id_b,
       CAST(c.n_bands AS BIGINT) AS n_bands,
       CAST({matches} AS BIGINT) AS minhash_matches,
       CAST(({matches}) * 1000000 // {_Q122_K} AS BIGINT) AS est_ppm,
       CAST(COALESCE(cm.n_common, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(cm.n_common, 0) * 1000000
            // (sa.n_sh + sb.n_sh - COALESCE(cm.n_common, 0)) AS BIGINT) AS exact_ppm
FROM cand c
JOIN sigs sa ON sa.doc_id = c.id_a
JOIN sigs sb ON sb.doc_id = c.id_b
LEFT JOIN common cm
  ON cm.source = c.source AND cm.id_a = c.id_a AND cm.id_b = c.id_b
ORDER BY 1, 2, 3
""").fetchdf()
    con.close()
    _compare(spark_df, exp)


CHECKS = {
    "q30_dedup_clusters": _check_closure,
    "q74_canonical_dedup": _check_closure,
    "q122_minhash_lsh_pairs": _check_q122,
}


def main() -> int:
    from query_fingerprint import build_fingerprints

    from developing_img_etl_spark.queries import all_oracles, all_queries
    from developing_img_etl_spark.session import get_spark

    names = sys.argv[1:] or list(CHECKS)
    qs, oracles = all_queries(), all_oracles()
    fps = build_fingerprints(qs, oracles)

    statuses: dict[str, str] = {}
    secs: dict[str, float] = {}
    if os.path.exists(PROGRESS):
        with open(PROGRESS) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("status") == "MATCH" and rec.get("fp") == fps.get(rec["name"]):
                    statuses[rec["name"]] = "MATCH"
                    secs[rec["name"]] = rec.get("s", 0.0)

    spark = get_spark("sf10-dnf", cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    failures: list[str] = []
    for name in names:
        if statuses.get(name) == "MATCH":
            print(f"  {name}: MATCH (ledger)", flush=True)
            continue
        t0 = time.time()
        try:
            check = CHECKS[name]
            if check is _check_closure:
                check(name, qs[name](spark, SF))
            else:
                check(qs[name](spark, SF))
            statuses[name] = "MATCH"
        except Exception as e:  # noqa: BLE001
            statuses[name] = f"FAIL: {type(e).__name__}: {e}"
            failures.append(name)
        finally:
            from developing_img_etl_spark.queries import _shingle

            spark.catalog.clearCache()
            _shingle._CACHE.clear()
        secs[name] = round(time.time() - t0, 1)
        with open(PROGRESS, "a") as f:
            f.write(
                json.dumps(
                    {
                        "name": name,
                        "status": statuses[name][:300],
                        "s": secs[name],
                        "fp": fps.get(name),
                    }
                )
                + "\n"
            )
        print(f"  {name}: {statuses[name][:120]}  [{secs[name]:.1f}s]", flush=True)
    with open(OUT, "w") as f:
        json.dump(
            {
                "sf_dir": SF,
                "method": {
                    "q30_dedup_clusters": "iterative min-label fixpoint (DuckDB temp tables, 24GB cap + spill)",
                    "q74_canonical_dedup": "iterative min-label fixpoint (DuckDB temp tables, 24GB cap + spill)",
                    "q122_minhash_lsh_pairs": f"piecewise oracle replay ({N_CHUNKS} sig chunks + candidate-restricted verify)",
                },
                "statuses": statuses,
                "seconds": secs,
                "failures": failures,
            },
            f,
            indent=1,
        )
    print("ALL GREEN" if not failures else f"FAILURES: {failures}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
