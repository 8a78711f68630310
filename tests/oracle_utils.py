"""DuckDB-oracle equivalence harness (SURVEY.md §5.2 item 1).

Mirrors the driver's check: run the Spark query and the oracle SQL on
the same parquet, sort columns by name, sort rows, compare values.

Hash-equivalence with the driver (VERDICT r5 #2): the driver hashes
canonicalized VALUES, so an int64 Spark column vs a float64 oracle
column (`123` vs `123.0`) is a driver hash-red even when every value is
numerically equal — DuckDB's SUM(BIGINT)/list_sum(BIGINT[]) return
HUGEINT, which fetchdf() renders as float64. This gate therefore FAILS
on any int-vs-float dtype pairing instead of coercing; the fix is
always `CAST(... AS BIGINT)` in the oracle SQL. With that rule, a MATCH
here is a reliable predictor of a driver hash-green.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from developing_img_etl_spark.catalog import TABLES


class OracleTimeout(Exception):
    """Raised when ORACLE_CAP_S is set and the oracle exceeds it."""


# optional per-oracle wall cap (seconds); None = strict/no cap (the
# driver-gate behavior). Scale probes (scripts/sf1_gate.py) set this so
# a DuckDB recursive-closure oracle that stops terminating at large SF
# surfaces as a recorded DNF instead of hanging the whole pass.
ORACLE_CAP_S: float | None = None

# optional DuckDB memory bound + spill dir; None = DuckDB's default
# (~80% of RAM — fine for the sf0.01 driver gate, fatal at sf10 where
# the Spark JVM's persisted caches already hold a large share of the
# box: the r8 widened spotcheck died with a native OOM on q53's
# oracle). Scale probes set this so the oracle spills instead.
DUCK_MEMORY_LIMIT: str | None = None
DUCK_TEMP_DIR: str | None = None
# optional spill-size bound. r11: q39's one-shot oracle plan spilled
# >75 GB at the 16GB memory cap — past this box's free disk — taking
# down every subsequent oracle in the pass (and nearly the host) with
# native bad_alloc/IO errors. A bounded temp dir turns a runaway-spill
# plan into a clean per-query OOM FAIL instead of a host-wide cascade.
DUCK_MAX_TEMP_SIZE: str | None = None

# run each oracle in a FRESH SUBPROCESS (r11): an in-process DuckDB
# OOM at a big memory cap degrades the host process's allocator — the
# sf10 pass saw every later oracle die with 2-32 KB bad_alloc and the
# process eventually segfault in libc. Isolation gives each oracle a
# clean allocator, returns its memory to the OS afterwards, and turns
# a native crash into that one query's FAIL instead of killing the
# whole resumable pass. Off by default (the sf0.01 driver gate is
# in-process and fine); scale probes turn it on.
DUCK_SUBPROCESS = False

_SUBPROC_RUNNER = r"""
import json, sys
import duckdb

cfg = json.load(open(sys.argv[1]))
con = duckdb.connect()
if cfg.get("memory_limit"):
    con.execute("SET memory_limit='%s'" % cfg["memory_limit"])
if cfg.get("temp_dir"):
    import os
    os.makedirs(cfg["temp_dir"], exist_ok=True)
    con.execute("SET temp_directory='%s'" % cfg["temp_dir"])
if cfg.get("max_temp"):
    con.execute("SET max_temp_directory_size='%s'" % cfg["max_temp"])
for name in cfg["tables"]:
    con.execute(
        "CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet'"
        % (name, cfg["sf_dir"], name)
    )
con.execute(cfg["sql"]).fetchdf().to_parquet(cfg["out"])
"""


def _duckdb_run_subprocess(sql: str, sf_dir: str) -> pd.DataFrame:
    import json
    import os
    import subprocess
    import sys
    import tempfile

    with tempfile.TemporaryDirectory(prefix="duck-oracle-") as td:
        cfg_path = os.path.join(td, "cfg.json")
        out_path = os.path.join(td, "result.parquet")
        with open(cfg_path, "w") as f:
            json.dump(
                {
                    "sql": sql,
                    "sf_dir": sf_dir,
                    "tables": list(TABLES),
                    "memory_limit": DUCK_MEMORY_LIMIT,
                    "temp_dir": DUCK_TEMP_DIR,
                    "max_temp": DUCK_MAX_TEMP_SIZE,
                    "out": out_path,
                },
                f,
            )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _SUBPROC_RUNNER, cfg_path],
                capture_output=True,
                text=True,
                timeout=ORACLE_CAP_S,
            )
        except subprocess.TimeoutExpired as e:
            raise OracleTimeout(f"oracle exceeded {ORACLE_CAP_S}s") from e
        if proc.returncode != 0:
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            raise RuntimeError(
                f"oracle subprocess rc={proc.returncode}: {' | '.join(tail)}"
            )
        return pd.read_parquet(out_path)


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    import threading

    if DUCK_SUBPROCESS:
        return _duckdb_run_subprocess(sql, sf_dir)
    con = duckdb.connect()
    timer = None
    try:
        if DUCK_MEMORY_LIMIT is not None:
            con.execute(f"SET memory_limit='{DUCK_MEMORY_LIMIT}'")
        if DUCK_TEMP_DIR is not None:
            import os as _os

            _os.makedirs(DUCK_TEMP_DIR, exist_ok=True)
            con.execute(f"SET temp_directory='{DUCK_TEMP_DIR}'")
        if DUCK_MAX_TEMP_SIZE is not None:
            con.execute(f"SET max_temp_directory_size='{DUCK_MAX_TEMP_SIZE}'")
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        if ORACLE_CAP_S is not None:
            timer = threading.Timer(ORACLE_CAP_S, con.interrupt)
            timer.start()
        try:
            return con.execute(sql).fetchdf()
        except duckdb.InterruptException as e:
            raise OracleTimeout(f"oracle exceeded {ORACLE_CAP_S}s") from e
    finally:
        if timer is not None:
            timer.cancel()
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_matches(
    spark_df, sql: str, sf_dir: str, *, float_tol: float = 0.0, require_rows: bool = False
) -> None:
    import time as _t
    _t0 = _t.time()
    _pdf = spark_df.toPandas()
    _t1 = _t.time()
    actual = _canon(_pdf)
    expected = _canon(duckdb_run(sql, sf_dir))
    _t2 = _t.time()
    print(f"[timing] spark={_t1-_t0:.1f}s canon+duck={_t2-_t1:.1f}s")
    if require_rows:
        assert len(expected) > 0, "oracle returned no rows — query is vacuous at this SF"

    assert list(actual.columns) == list(expected.columns), (
        f"column mismatch: spark={list(actual.columns)} oracle={list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row-count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    for c in actual.columns:
        a, e = actual[c], expected[c]
        a_float = pd.api.types.is_float_dtype(a)
        e_float = pd.api.types.is_float_dtype(e)
        a_int = pd.api.types.is_integer_dtype(a)
        e_int = pd.api.types.is_integer_dtype(e)
        # driver hash-equivalence: int64 `123` vs float64 `123.0` is a
        # driver hash-red even when values match — fail loudly here.
        assert not ((a_float and e_int) or (a_int and e_float)), (
            f"column {c!r} dtype drift: spark={a.dtype} oracle={e.dtype} — "
            "the driver hashes values strictly (123 != 123.0); if the oracle "
            "side is float64 from a HUGEINT SUM/list_sum, wrap it in "
            "CAST(... AS BIGINT)"
        )
        if a_float or e_float:
            a = a.astype(float)
            e = e.astype(float)
            bad = []
            for i, (x, y) in enumerate(zip(a, e)):
                if pd.isna(x) and pd.isna(y):
                    continue
                if pd.isna(x) != pd.isna(y) or not math.isclose(
                    x, y, rel_tol=float_tol, abs_tol=float_tol
                ):
                    bad.append((i, x, y))
                if len(bad) >= 5:
                    break
            assert not bad, f"column {c!r} float mismatch (first rows): {bad}"
        else:
            neq = ~(a.eq(e) | (a.isna() & e.isna()))
            assert not neq.any(), (
                f"column {c!r} mismatch at rows {list(actual.index[neq][:5])}: "
                f"spark={list(a[neq][:5])} oracle={list(e[neq][:5])}"
            )
