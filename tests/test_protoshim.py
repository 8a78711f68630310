"""Unit tests for the vendored minimal protobuf runtime
(developing_img_etl_spark/vendor/protoshim) — the st7 state-protocol
fallback. The end-to-end proof is test_streaming.py's st7 test (the
shim drives the real JVM state server); these tests pin the wire
format itself with hand-computed golden bytes so a regression fails
with a byte diff, not a hung state server.
"""

from __future__ import annotations

import pytest

from developing_img_etl_spark.vendor import ensure_protobuf

ensure_protobuf()


@pytest.fixture(scope="module")
def sm():
    return pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_golden_bytes_scalar_and_nested(sm):
    # StateRequest{version=2, statefulProcessorCall{getValueState{
    #   stateName="ab"}}} — hand-encoded:
    # 08 02                 version=2          (field 1, varint)
    # 12 06                 statefulProcessorCall (field 2, len 6)
    #   12 04               getValueState      (field 2, len 4)
    #     0a 02 61 62       stateName="ab"     (field 1, len 2)
    msg = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(stateName="ab")
        ),
    )
    assert msg.SerializeToString() == bytes.fromhex("0802" "1206" "1204" "0a026162")


def test_proto3_default_suppression(sm):
    # plain scalars at default value are not emitted...
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""
    # ...but a oneof member is emitted even when default-valued
    sh = sm.SetHandleState(state=sm.PRE_INIT)  # PRE_INIT == 0, plain field
    assert sh.SerializeToString() == b""  # state is NOT in a oneof: suppressed
    call = sm.StatefulProcessorCall(setHandleState=sh)
    assert call.SerializeToString() == bytes.fromhex("0a00")  # oneof member: emitted


def test_negative_int_is_twos_complement_64(sm):
    m = sm.TimerInfo(timestampMs=-1)
    # field 2 varint: tag 0x10 then ten 0xff..0x01 bytes
    assert m.SerializeToString() == bytes.fromhex("10" + "ff" * 9 + "01")
    r = sm.TimerInfo()
    r.ParseFromString(m.SerializeToString())
    assert r.timestampMs == -1


def test_repeated_bytes_and_messages_roundtrip(sm):
    lg = sm.StateResponseWithListGet(statusCode=3, value=[b"a", b"bb", b""], requireNextFetch=True)
    r = sm.StateResponseWithListGet()
    r.ParseFromString(lg.SerializeToString())
    assert (r.statusCode, r.value, r.requireNextFetch) == (3, [b"a", b"bb", b""], True)

    t = sm.StateResponseWithTimer(
        timer=[sm.TimerInfo(key=b"k", timestampMs=9), sm.TimerInfo(timestampMs=-4)]
    )
    r2 = sm.StateResponseWithTimer()
    r2.ParseFromString(t.SerializeToString())
    assert [(x.key, x.timestampMs) for x in r2.timer] == [(b"k", 9), (b"", -4)]


def test_oneof_last_write_wins(sm):
    x = sm.StateRequest(timerRequest=sm.TimerRequest())
    x.utilsRequest = sm.UtilsRequest(parseStringSchema=sm.ParseStringSchema(schema="a INT"))
    r = sm.StateRequest()
    r.ParseFromString(x.SerializeToString())
    assert r.WhichOneof("method") == "utilsRequest"
    assert r.utilsRequest.parseStringSchema.schema == "a INT"
    # the displaced member reads as a default instance
    assert r.timerRequest.timerValueRequest.getWatermark.SerializeToString() == b""


def test_unknown_fields_are_skipped(sm):
    # append an unknown field (number 15, varint 7) to a valid message
    base = sm.StateResponse(statusCode=1).SerializeToString()
    r = sm.StateResponse()
    r.ParseFromString(base + bytes.fromhex("7807"))
    assert r.statusCode == 1


def test_enum_constants_hoisted(sm):
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED, sm.DATA_PROCESSED) == (0, 1, 2, 3)
    assert (sm.TIMER_PROCESSED, sm.CLOSED) == (4, 5)


def test_kwargs_none_means_unset(sm):
    c = sm.StateCallCommand(stateName="s", ttl=None)
    assert c.SerializeToString() == bytes.fromhex("0a0173")
    # unset submessage access yields a default view, not None
    assert c.ttl.durationMs == 0


def test_ensure_protobuf_idempotent():
    # after activation, google.protobuf is importable and further calls
    # are no-ops (reported as "real" since the import now succeeds)
    assert ensure_protobuf() in ("real", "shim")
    import google.protobuf.descriptor  # noqa: F401
    from google.protobuf.message import Message

    assert hasattr(Message, "SerializeToString") or Message is not None
