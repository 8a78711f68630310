"""HttpTransport contract tests against a stdlib http.server fixture.

The wire protocol is the GitHub-contents-style GET-sha/PUT upsert the
reference speaks per record (/root/reference/test.py:62-93); the
fixture implements it in-memory, including the replace-requires-sha
rule, optional transient 500s, and Authorization capture — so the real
HTTP path (keep-alive, reconnect, conditional PUT, env token) is
exercised with zero network dependency, and the semantics proved for
LocalFsTransport in test_streaming.py are re-proved on the wire.
"""

from __future__ import annotations

import base64
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from developing_img_etl_spark.sinks.rest import (
    HttpTransport,
    LocalFsTransport,
    upload,
    upload_partition,
)

BASE = "/api/contents"


class _Store:
    def __init__(self):
        self.blobs: dict[str, bytes] = {}
        self.fail_remaining = 0  # next N requests answer 500
        self.auth_seen: list[str | None] = []
        self.lock = threading.Lock()


def _make_handler(store: _Store):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def _key(self) -> str | None:
            if not self.path.startswith(BASE + "/"):
                return None
            from urllib.parse import unquote

            return unquote(self.path[len(BASE) + 1 :])

        def _maybe_fail(self) -> bool:
            with store.lock:
                store.auth_seen.append(self.headers.get("Authorization"))
                if store.fail_remaining > 0:
                    store.fail_remaining -= 1
                    self.send_response(500)
                    self.end_headers()
                    return True
            return False

        def do_GET(self):
            if self._maybe_fail():
                return
            key = self._key()
            if key is None or key not in store.blobs:
                self.send_response(404)
                self.end_headers()
                return
            body = json.dumps(
                {"sha": HttpTransport.content_hash(store.blobs[key])}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_PUT(self):
            if self._maybe_fail():
                return
            key = self._key()
            n = int(self.headers.get("Content-Length", "0"))
            payload = json.loads(self.rfile.read(n))
            content = base64.b64decode(payload["content"])
            with store.lock:
                existing = store.blobs.get(key)
                if existing is not None:
                    # replace requires the CURRENT sha (GitHub rule)
                    if payload.get("sha") != HttpTransport.content_hash(existing):
                        self.send_response(409)
                        self.end_headers()
                        return
                created = existing is None
                store.blobs[key] = content
            self.send_response(201 if created else 200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"{}")

    return Handler


@pytest.fixture()
def http_store():
    store = _Store()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(store))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield store, server.server_address[1]
    finally:
        server.shutdown()
        server.server_close()


def _transport(port: int) -> HttpTransport:
    return HttpTransport("127.0.0.1", BASE, port=port, scheme="http")


class _R(dict):
    pass


def _rows(pairs):
    return iter([_R(object_key=k, content=v) for k, v in pairs])


def test_http_transport_upsert_cycle(http_store):
    store, port = http_store
    tr = _transport(port)
    assert tr.get_hash("a/x.bin") is None
    tr.put("a/x.bin", b"v1")
    assert store.blobs["a/x.bin"] == b"v1"
    assert tr.get_hash("a/x.bin") == HttpTransport.content_hash(b"v1")
    tr.put("a/x.bin", b"v2")  # replace: uses the sha cached by get_hash
    assert store.blobs["a/x.bin"] == b"v2"


def test_http_put_replace_requires_sha(http_store):
    store, port = http_store
    store.blobs["k"] = b"old"
    tr = _transport(port)
    # blind PUT over an existing key (no prior get_hash) → 409 → OSError
    with pytest.raises(OSError):
        tr.put("k", b"new")
    assert store.blobs["k"] == b"old"
    tr.get_hash("k")
    tr.put("k", b"new")
    assert store.blobs["k"] == b"new"


def test_http_token_from_env_at_call_time(http_store, monkeypatch):
    store, port = http_store
    tr = _transport(port)
    tr.get_hash("nope")
    assert store.auth_seen[-1] is None
    monkeypatch.setenv("REST_SINK_TOKEN", "s3cret")
    tr.get_hash("nope")  # same transport: token picked up per call
    assert store.auth_seen[-1] == "Bearer s3cret"


def test_http_partition_parity_with_localfs(http_store, tmp_path):
    """Same records, same statuses through both transports — the
    LocalFsTransport contract re-proved on the wire."""
    store, port = http_store
    root = str(tmp_path / "store")
    os.makedirs(root, exist_ok=True)
    pairs = [(f"d/f{i}.bin", bytes([i]) * 32) for i in range(8)]

    def statuses(factory):
        return [
            (r.key, r.status)
            for r in upload_partition(_rows(pairs), factory, backoff_s=0.0)
        ]

    for factory in (lambda: _transport(port), lambda: LocalFsTransport(root)):
        assert [s for _, s in statuses(factory)] == ["uploaded"] * 8
        assert [s for _, s in statuses(factory)] == ["skipped_identical"] * 8
    changed = [(k, v + b"!") for k, v in pairs]
    out = [
        r.status
        for r in upload_partition(_rows(changed), lambda: _transport(port), backoff_s=0.0)
    ]
    assert out == ["uploaded"] * 8
    assert store.blobs["d/f0.bin"] == bytes([0]) * 32 + b"!"


def test_http_retry_then_fail_skips_record(http_store):
    """Transient 500s retry; a persistently failing record becomes a
    status row and the NEXT record still uploads (test.py:89-91)."""
    store, port = http_store
    store.fail_remaining = 2  # first record: GET 500, retry GET 500, then ok
    out = list(
        upload_partition(
            _rows([("a", b"1"), ("b", b"2")]),
            lambda: _transport(port),
            max_retries=3,
            backoff_s=0.0,
        )
    )
    assert [(r.status, r.key) for r in out] == [("uploaded", "a"), ("uploaded", "b")]
    assert out[0].attempts == 3 and out[1].attempts == 1
    store.fail_remaining = 10**6  # persistent outage for record one only
    out2 = list(
        upload_partition(
            _rows([("c", b"3")]),
            lambda: _transport(port),
            max_retries=2,
            backoff_s=0.0,
        )
    )
    assert out2[0].status == "failed" and out2[0].attempts == 3
    store.fail_remaining = 0
    out3 = list(
        upload_partition(_rows([("d", b"4")]), lambda: _transport(port), backoff_s=0.0)
    )
    assert out3[0].status == "uploaded"


def test_http_upload_through_spark(spark, http_store):
    """End-to-end through foreachPartition-style mapPartitions: the
    executor-side python workers reach the fixture over real sockets."""
    store, port = http_store
    df = spark.createDataFrame(
        [(f"s/f{i}.bin", bytes([i]) * 16) for i in range(12)],
        "object_key string, content binary",
    )
    base = BASE  # locals only: the closure must not reference this
    # test module (not importable on executor python workers)

    def factory(port=port, base=base):
        from developing_img_etl_spark.sinks.rest import HttpTransport

        return HttpTransport("127.0.0.1", base, port=port, scheme="http")

    r1 = upload(df, factory).groupBy("status").count().collect()
    assert {r.status: r["count"] for r in r1} == {"uploaded": 12}
    r2 = upload(df, factory).groupBy("status").count().collect()
    assert {r.status: r["count"] for r in r2} == {"skipped_identical": 12}
    assert len(store.blobs) == 12
