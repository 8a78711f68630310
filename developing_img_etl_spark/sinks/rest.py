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
  - the transport is injectable: LocalFsTransport (filesystem fake)
    and HttpTransport (real GET-sha/PUT wire protocol, keep-alive,
    verified TLS, env-sourced token) share the contract; tests drive
    HttpTransport against a stdlib http.server fixture, so the wire
    path is exercised without any network dependency.
"""

from __future__ import annotations

import hashlib
import os
import time
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, Row


class Transport:
    """One instance per partition. get_hash → None if absent.

    ``content_hash`` defines the digest the remote store reports, so
    the skip-identical compare in ``upload_partition`` works against
    stores with their own hashing scheme (git-style blob SHA-1 for
    ``HttpTransport``, sha256 for the filesystem fake)."""

    def get_hash(self, key: str) -> str | None:  # pragma: no cover - interface
        raise NotImplementedError

    def put(self, key: str, content: bytes) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    @staticmethod
    def content_hash(content: bytes) -> str:
        return hashlib.sha256(content).hexdigest()


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


class HttpTransport(Transport):
    """Real network transport for the GET-sha/PUT upsert protocol the
    reference speaks against the GitHub contents API
    (/root/reference/test.py:62-93) — completing S7 parity:

      GET  {base_path}/{key} → 200 + JSON {"sha": <git blob sha1>}
                             | 404 (absent)
      PUT  {base_path}/{key} ← JSON {"message", "content": base64,
                                     "sha": <existing, when replacing>}

    Deliberate fixes over the reference's client:

      - TLS is VERIFIED (stdlib default context); the reference passes
        ``verify=False`` on both calls (test.py:70,87) — a real MITM
        hole this transport refuses to reproduce (no opt-out knob).
      - ONE keep-alive connection per transport (= per partition,
        upload_partition's contract); the reference opens a fresh
        HTTPS handshake per record per round-trip.
      - The bearer token is read from the environment AT CALL TIME
        (never stored in the plan, never serialized to executors as a
        captured literal) via ``token_env``.
      - ``content_hash`` is the git blob digest ``sha1("blob <n>\\0" +
        content)`` so skip-identical compares against the sha the API
        actually reports.

    Transient failures raise — retry/backoff and failure-skip
    (test.py:89-91 semantics) live in ``upload_partition``, shared
    with every other transport.
    """

    def __init__(
        self,
        host: str,
        base_path: str,
        *,
        port: int | None = None,
        scheme: str = "https",
        token_env: str = "REST_SINK_TOKEN",
        timeout_s: float = 30.0,
        commit_message: str = "upsert via rest sink",
    ):
        self.host = host
        self.port = port
        self.scheme = scheme
        self.base_path = base_path.rstrip("/")
        self.token_env = token_env
        self.timeout_s = timeout_s
        self.commit_message = commit_message
        self._conn = None
        self._last_sha: dict[str, str] = {}

    @staticmethod
    def content_hash(content: bytes) -> str:
        # git blob object id: sha1 over "blob <len>\0" + bytes
        h = hashlib.sha1(b"blob %d\x00" % len(content))  # noqa: S324 - git oid, not crypto
        h.update(content)
        return h.hexdigest()

    # -- connection management -------------------------------------------
    def _connection(self):
        if self._conn is None:
            import http.client
            import ssl

            if self.scheme == "https":
                self._conn = http.client.HTTPSConnection(
                    self.host,
                    self.port,
                    timeout=self.timeout_s,
                    context=ssl.create_default_context(),  # verified, always
                )
            else:  # plain http: only ever the test fixture
                self._conn = http.client.HTTPConnection(
                    self.host, self.port, timeout=self.timeout_s
                )
        return self._conn

    def _reset(self) -> None:
        if self._conn is not None:
            try:
                self._conn.close()
            except Exception:  # noqa: BLE001
                pass
            self._conn = None

    def _headers(self) -> dict[str, str]:
        headers = {
            "Accept": "application/json",
            "User-Agent": "developing-img-etl-spark-rest-sink",
        }
        token = os.environ.get(self.token_env)
        if token:
            headers["Authorization"] = f"Bearer {token}"
        return headers

    def _request(self, method: str, url: str, body: bytes | None = None):
        """One round-trip; reconnects once on a dropped keep-alive."""
        import http.client

        headers = self._headers()
        if body is not None:
            headers["Content-Type"] = "application/json"
        for attempt in (0, 1):
            conn = self._connection()
            try:
                conn.request(method, url, body=body, headers=headers)
                resp = conn.getresponse()
                return resp.status, resp.read()
            except (http.client.HTTPException, ConnectionError, OSError):
                self._reset()
                if attempt:
                    raise
        raise AssertionError("unreachable")

    # -- Transport contract ------------------------------------------------
    def _url(self, key: str) -> str:
        from urllib.parse import quote

        return f"{self.base_path}/{quote(key)}"

    def get_hash(self, key: str) -> str | None:
        status, body = self._request("GET", self._url(key))
        if status == 404:
            self._last_sha.pop(key, None)
            return None
        if status != 200:
            raise OSError(f"GET {key}: HTTP {status}")
        import json

        sha = json.loads(body)["sha"]
        self._last_sha[key] = sha
        return sha

    def put(self, key: str, content: bytes) -> None:
        import base64
        import json

        payload: dict[str, str] = {
            "message": self.commit_message,
            "content": base64.b64encode(content).decode("ascii"),
        }
        # replacing requires the current sha (the reference's GET-then-
        # PUT dance); upload_partition always calls get_hash first, so
        # the cached sha avoids a second GET per record
        sha = self._last_sha.get(key)
        if sha is not None:
            payload["sha"] = sha
        status, body = self._request(
            "PUT", self._url(key), json.dumps(payload).encode()
        )
        if status not in (200, 201):
            raise OSError(f"PUT {key}: HTTP {status}")
        self._last_sha[key] = self.content_hash(content)


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
        digest = transport.content_hash(content)
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
