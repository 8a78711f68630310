"""Idempotent REST upsert sink (SURVEY.md §2.1 S7).

The reference uploads one image per record with two synchronous HTTPS
round-trips and no session reuse (/root/reference/test.py:62-93: GET
current sha, then PUT create-or-replace), and — in v2 — skips failures
per record (test.py:89-91). The engine generalizes:

  - side effects ONLY in foreachPartition: one transport per PARTITION
    (connection/session reuse), records streamed through it;
  - exactly-once-ish via content-hash compare: identical content is
    skipped without a write (the sha-check generalized);
  - bounded retry with backoff per record; failures become status rows,
    never job failures (v2 semantics, fixing v1's raise_for_status
    abort, trial-img-processor.py:53);
  - the transport is injectable: tests use LocalFsTransport; a real
    deployment supplies an HTTP one. No network dependency in-repo.
"""

from __future__ import annotations

import hashlib
import os
import time
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, Row


class Transport:
    """One instance per partition. get_hash → None if absent."""

    def get_hash(self, key: str) -> str | None:  # pragma: no cover - interface
        raise NotImplementedError

    def put(self, key: str, content: bytes) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class LocalFsTransport(Transport):
    """Filesystem fake of the remote store — same contract, no network."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, key: str) -> str:
        return os.path.join(self.root, key)

    def get_hash(self, key: str) -> str | None:
        p = self._path(key)
        if not os.path.exists(p):
            return None
        with open(p, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()

    def put(self, key: str, content: bytes) -> None:
        p = self._path(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(content)
        os.replace(tmp, p)


@dataclass
class UploadResult:
    key: str
    status: str  # uploaded | skipped_identical | failed
    attempts: int


def upload_partition(
    rows: Iterator[Row],
    transport_factory,
    *,
    key_col: str = "object_key",
    content_col: str = "content",
    max_retries: int = 3,
    backoff_s: float = 0.05,
) -> Iterator[UploadResult]:
    """Upsert every row of one partition through ONE transport."""
    transport: Transport = transport_factory()
    for row in rows:
        key, content = row[key_col], bytes(row[content_col])
        digest = hashlib.sha256(content).hexdigest()
        attempts = 0
        while True:
            attempts += 1
            try:
                if transport.get_hash(key) == digest:
                    yield UploadResult(key, "skipped_identical", attempts)
                    break
                transport.put(key, content)
                yield UploadResult(key, "uploaded", attempts)
                break
            except Exception:  # noqa: BLE001
                if attempts > max_retries:
                    yield UploadResult(key, "failed", attempts)
                    break
                time.sleep(backoff_s * (2 ** (attempts - 1)))


def upload(df: DataFrame, transport_factory, **kw) -> DataFrame:
    """Run the upsert across the cluster; returns per-record status rows
    for auditing.

    This IS an action: the side-effecting PUTs are forced exactly once
    here, and the status rows are pinned with an eager localCheckpoint
    — MEMORY_AND_DISK storage (no cache-eviction recompute) AND
    truncated lineage, so a lost block makes downstream actions FAIL
    rather than silently re-executing the PUTs against a real
    transport. A plain .cache() (MEMORY_ONLY, lineage intact) would
    replay the uploads on eviction or executor loss."""
    spark = df.sparkSession

    def run(it: Iterator[Row]):
        for r in upload_partition(it, transport_factory, **kw):
            yield (r.key, r.status, r.attempts)

    statuses = spark.createDataFrame(
        df.rdd.mapPartitions(run), "object_key string, status string, attempts int"
    )
    # eager=True runs the uploads exactly once, here.
    return statuses.localCheckpoint(eager=True)
