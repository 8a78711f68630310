"""Full correctness pass at sf1 (VERDICT r4 #2's companion evidence).

Runs every declared query at the self-generated sf1 and hash-compares
against its oracle exactly like scripts/driver_sim.py, with ONE
relaxation: a per-oracle wall cap (oracle_utils.ORACLE_CAP_S). The
DuckDB recursive-CTE closure oracles (q30/q74: `reach` materializes
every reachable pair per component and iterates to the component
diameter) stop terminating at 50k docs — those surface as recorded
ORACLE-DNF rows instead of hanging the pass, and are then cross-checked
by an ITERATIVE DuckDB closure (temp-table min-label propagation, the
same fixpoint the recursive CTE defines, evaluated in O(diameter)
cheap rounds instead of one quadratic recursion).

Writes SF1_CORRECTNESS.json. Exit 0 = every query is MATCH,
rows-only-by-design, or DNF-but-iteratively-verified.

Usage: python scripts/sf1_gate.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import __spark_entry__ as entrymod
from developing_img_etl_spark.session import get_spark
from tests import oracle_utils
from tests.oracle_utils import OracleTimeout, assert_matches

SF = "/root/repo/testdata/sf1"
CAP_S = 180.0
# per-oracle cap overrides: q103's oracle is a BOUNDED unrolled round
# chain (not a runaway recursion) that legitimately costs ~180-210 s at
# sf1 — right at the default cap, so it flapped MATCH/DNF across runs
# (r9: a cap interrupt mis-routed it into the q30/q74 closure
# cross-check, which asserts the wrong shape). Give it headroom; the
# truly non-terminating recursive-CTE closures (q30/q74) keep the
# default cap + iterative verification.
CAP_OVERRIDES = {
    "q103_label_propagation": 480.0,
    # q123's SimHash block-permutation oracle is likewise bounded and
    # terminating, ~180-260 s at sf1 — same borderline flap
    "q123_simhash_hamming_pairs": 600.0,
}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _iterative_components(con) -> None:
    """Materialize `comp(doc_id, component_id)` for the q30/q74 edge
    set via temp-table min-label propagation — the same fixpoint the
    recursive `reach` CTE defines (component id = min reachable id),
    in O(diameter) rounds of linear work."""
    from developing_img_etl_spark.queries import dedup

    # the pair-generation cap MUST track the engine's (ADVICE r5): a
    # hardcoded literal here would silently desynchronize this verifier
    # from q30/q74 if _PAIR_DF_CAP ever changes
    con.execute(rf"""
CREATE OR REPLACE TEMP TABLE und AS
WITH toks AS (
  SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
  FROM toks WHERE len(t) >= 3
),
inv AS (SELECT doc_id, source, UNNEST(s) AS shingle FROM sh),
inv_df AS (
  SELECT source, shingle FROM inv GROUP BY source, shingle
  HAVING COUNT(*) BETWEEN 2 AND {dedup._PAIR_DF_CAP}
),
inv_k AS (
  SELECT i.doc_id, i.source, i.shingle FROM inv i JOIN inv_df USING (source, shingle)
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM inv_k a JOIN inv_k b
    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT id_a AS u, id_b AS v FROM pairs
UNION SELECT id_b, id_a FROM pairs
""")
    con.execute(
        "CREATE OR REPLACE TEMP TABLE lab AS "
        "SELECT u AS n, u AS m FROM (SELECT DISTINCT u FROM und)"
    )
    while True:
        con.execute("""
CREATE OR REPLACE TEMP TABLE nxt AS
SELECT l.n, LEAST(l.m, COALESCE(p.pm, l.m)) AS m
FROM lab l LEFT JOIN (
  SELECT e.v AS n, MIN(l2.m) AS pm FROM lab l2 JOIN und e ON l2.n = e.u GROUP BY e.v
) p USING (n)
""")
        changed = con.execute(
            "SELECT COUNT(*) FROM lab l JOIN nxt x USING (n) WHERE l.m <> x.m"
        ).fetchone()[0]
        con.execute("CREATE OR REPLACE TEMP TABLE lab AS SELECT * FROM nxt")
        if changed == 0:
            break
    con.execute("""
CREATE OR REPLACE TEMP TABLE comp AS
SELECT d.doc_id, COALESCE(l.m, d.doc_id) AS component_id
FROM documents d LEFT JOIN lab l ON d.doc_id = l.n
""")


def _closure_oracle(name: str, spark_df) -> None:
    """Cross-check q30/q74 at sf1 against the iterative closure."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    _iterative_components(con)
    if name == "q30_dedup_clusters":
        exp = con.execute(
            "SELECT doc_id, CAST(component_id AS BIGINT) AS component_id, "
            "CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT) AS cluster_size "
            "FROM comp ORDER BY doc_id"
        ).fetchdf()
    elif name == "q74_canonical_dedup":  # canonical selection over the components
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
    else:
        raise AssertionError(
            f"no iterative closure oracle for {name} — raise its cap in "
            "CAP_OVERRIDES instead of routing it here"
        )
    act = spark_df.toPandas()
    act = act[sorted(act.columns)].sort_values(by=sorted(act.columns), ignore_index=True)
    exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns), ignore_index=True)
    assert list(act.columns) == list(exp.columns), (act.columns, exp.columns)
    assert len(act) == len(exp), (len(act), len(exp))
    for c in act.columns:
        assert act[c].eq(exp[c]).all(), f"{name}: column {c} differs"


def main() -> int:
    import os

    oracle_utils.ORACLE_CAP_S = CAP_S
    # bound the oracle beside the gate's own Spark JVM (and any
    # concurrent sf10 pass): uncapped DuckDB defaults to ~80 % of RAM,
    # which is box-fatal when two JVMs are resident; sf1 oracles fit
    # comfortably in 24 GB with spill as the escape hatch.
    oracle_utils.DUCK_MEMORY_LIMIT = "24GB"
    oracle_utils.DUCK_TEMP_DIR = "/root/repo/tmp/duck-spill-sf1"
    # r11: bound the spill so a runaway oracle plan dies as its own
    # clean FAIL instead of filling the disk under every later query
    # (the q39 sf10 cascade; see scripts/sf10_spotcheck.py)
    oracle_utils.DUCK_MAX_TEMP_SIZE = "40GiB"
    # r11: per-oracle subprocess isolation (see sf10_spotcheck.py) —
    # an in-process OOM degrades this process's allocator for every
    # later oracle; isolation also returns each oracle's memory to the
    # OS between queries instead of ratcheting the pass footprint.
    oracle_utils.DUCK_SUBPROCESS = True
    spark = get_spark("sf1-gate", cpus=32)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # per-query code fingerprint (transitive import closure + oracle
    # text — see scripts/query_fingerprint.py, shared with the sf10
    # spot-check ledger since r9): a kept green row whose fingerprint
    # no longer matches is STALE and must re-run.
    from query_fingerprint import build_fingerprints

    fps = build_fingerprints(queries, oracles)
    # resumable: green statuses from a previous pass are kept only if
    # their code fingerprint is unchanged; FAIL rows, stale rows, and
    # queries not yet recorded re-run (a full-from-scratch pass =
    # delete SF1_CORRECTNESS.json first)
    statuses: dict[str, str] = {}
    out_path = "/root/repo/SF1_CORRECTNESS.json"
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev_doc = json.load(f)
        prev = prev_doc.get("statuses", {})
        prev_fps = prev_doc.get("fingerprints", {})
        stale = [
            k for k, v in prev.items()
            if k in queries and not v.startswith("FAIL")
            and prev_fps.get(k) != fps[k]
        ]
        statuses = {
            k: v for k, v in prev.items()
            if k in queries and not v.startswith("FAIL") and k not in stale
        }
        if statuses:
            print(f"resuming: {len(statuses)} green rows kept", flush=True)
        if stale:
            print(f"stale (code changed, re-running): {sorted(stale)}", flush=True)
    failures: list[str] = []
    for name, fn in queries.items():
        if name in statuses:
            continue
        t0 = time.time()
        oracle_utils.ORACLE_CAP_S = CAP_OVERRIDES.get(name, CAP_S)
        try:
            df = fn(spark, SF)
            if name in oracles:
                try:
                    assert_matches(df, oracles[name], SF)
                    statuses[name] = "MATCH"
                except OracleTimeout:
                    _closure_oracle(name, df)
                    cap = CAP_OVERRIDES.get(name, CAP_S)
                    statuses[name] = f"ORACLE-DNF(>{cap:.0f}s), iterative-verified"
            else:
                n = df.count()
                statuses[name] = f"rows-only ({n})"
                assert n >= 0
        except Exception as e:  # noqa: BLE001
            statuses[name] = f"FAIL: {type(e).__name__}: {e}"
            failures.append(name)
        print(f"  {name}: {statuses[name]}  [{time.time() - t0:.1f}s]", flush=True)
    with open("/root/repo/SF1_CORRECTNESS.json", "w") as f:
        json.dump(
            {
                "sf_dir": SF,
                "statuses": statuses,
                "failures": failures,
                "fingerprints": fps,
            },
            f,
            indent=1,
        )
    print(("ALL GREEN" if not failures else f"FAILURES: {failures}"), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
