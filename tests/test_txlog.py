"""TxLogFormat (sinks/txlog.py): the transactional TableFormat tier —
atomic commits, snapshot isolation, time travel, conflict detection,
vacuum, crash-debris immunity."""

from __future__ import annotations

import json
import os

import pytest

from developing_img_etl_spark.sinks.txlog import TxConflict, TxLogFormat
from developing_img_etl_spark.sinks.writer import TableFormat

SCHEMA = "k INT, v STRING"


def _rows(spark, path, fmt, **kw):
    return {r.k: r.v for r in fmt.read(spark, path, SCHEMA, **kw).collect()}


def test_seam_append_read_versions(spark, tmp_path):
    fmt = TxLogFormat()
    assert isinstance(fmt, TableFormat)
    path = str(tmp_path / "t")

    assert not fmt.exists(spark, path)
    assert fmt.read(spark, path, SCHEMA).count() == 0  # first-run empty frame

    fmt.append(spark.createDataFrame([(1, "a")], SCHEMA), path)
    fmt.append(spark.createDataFrame([(2, "b")], SCHEMA), path)
    assert fmt.exists(spark, path)
    assert fmt.versions(path) == [0, 1]
    assert _rows(spark, path, fmt) == {1: "a", 2: "b"}
    # time travel: v0 predates the second append
    assert _rows(spark, path, fmt, version=0) == {1: "a"}


def test_overwrite_is_snapshot_isolated(spark, tmp_path):
    fmt = TxLogFormat()
    path = str(tmp_path / "t")
    fmt.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA), path)

    # read -> transform -> overwrite of the SAME path, no localCheckpoint:
    # legal because input files are immutable (only un-referenced)
    cur = fmt.read(spark, path, SCHEMA)
    from pyspark.sql import functions as F

    fmt.overwrite(cur.withColumn("v", F.upper("v")), path)
    assert _rows(spark, path, fmt) == {1: "A", 2: "B"}
    # the pre-overwrite snapshot is still fully readable
    assert _rows(spark, path, fmt, version=0) == {1: "a", 2: "b"}


def test_commit_conflict_detected(spark, tmp_path):
    fmt = TxLogFormat()
    path = str(tmp_path / "t")
    fmt.append(spark.createDataFrame([(1, "a")], SCHEMA), path)

    # a concurrent writer claims v1 between our read and our commit
    log = os.path.join(path, "_txlog")
    with open(os.path.join(log, "00000001.json"), "w") as f:
        json.dump({"version": 1, "add": [], "remove": []}, f)
    with pytest.raises(TxConflict):
        fmt._commit(path, add=[], remove=[], expected_version=1)
    # blind append (no expected version) just takes the next slot
    v = fmt._commit(path, add=[], remove=[])
    assert v == 2


def test_crash_debris_is_invisible(spark, tmp_path):
    fmt = TxLogFormat()
    path = str(tmp_path / "t")
    fmt.append(spark.createDataFrame([(1, "a")], SCHEMA), path)

    # a crashed writer left staged data with no commit record, and a
    # torn temp log record — readers must see neither
    with open(os.path.join(path, "data-deadbeef-part-0.parquet"), "wb") as f:
        f.write(b"not even parquet")
    with open(os.path.join(path, "_txlog", "zzz.json.tmp"), "w") as f:
        f.write("{not json")
    assert _rows(spark, path, fmt) == {1: "a"}
    assert fmt.versions(path) == [0]


def test_vacuum_drops_only_unreachable(spark, tmp_path):
    fmt = TxLogFormat()
    path = str(tmp_path / "t")
    fmt.append(spark.createDataFrame([(1, "a")], SCHEMA), path)
    fmt.overwrite(spark.createDataFrame([(1, "x"), (2, "y")], SCHEMA), path)
    assert _rows(spark, path, fmt, version=0) == {1: "a"}

    deleted = fmt.vacuum(path, retain_versions=0)
    assert deleted, "v0's files should have been vacuumed"
    # latest snapshot intact; vacuumed snapshot no longer readable
    assert _rows(spark, path, fmt) == {1: "x", 2: "y"}
    with pytest.raises(Exception):  # noqa: B017 — files gone is the contract
        fmt.read(spark, path, SCHEMA, version=0).collect()
    # idempotent
    assert fmt.vacuum(path, retain_versions=0) == []
