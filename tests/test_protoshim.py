"""Vendored mini protobuf runtime (vendor/protoshim) — wire-format
exactness and the generated-pb2 execution surface. The peer for these
bytes in production is JAVA protobuf (Spark's transformWithStateInPandas
state server), so the encoding must match the public spec byte-for-byte;
the golden vectors below are hand-derived from
protobuf.dev/programming-guides/encoding.

The live end-to-end proof is tests/test_streaming.py::
test_stateful_running_totals_tws, which now runs (not skips) in this
environment: the shim serializes every state-server request and parses
every JVM response during a real RocksDB-backed TWS query."""

from __future__ import annotations

import pytest

from pwc_challenge_dataengineer_spark.vendor import enable_protoshim

if not enable_protoshim():
    pytest.skip("protobuf unavailable even via shim", allow_module_level=True)

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402
from google.protobuf import _mini  # noqa: E402


# ------------------------------------------------------------ wire codec


@pytest.mark.parametrize(
    "value,expected",
    [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (300, b"\xac\x02"),  # the spec's worked example
        (2**32, b"\x80\x80\x80\x80\x10"),
        # negative ints: 10-byte two's-complement-64 varint per spec
        (-1, b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"),
        (-2, b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"),
    ],
)
def test_varint_golden(value, expected):
    out = bytearray()
    _mini.encode_varint(out, value)
    assert bytes(out) == expected
    decoded, pos = _mini.decode_varint(bytes(out), 0)
    assert pos == len(expected)
    if value < 0:
        assert _mini._to_signed64(decoded) == value
    else:
        assert decoded == value


def test_zigzag():
    for v in (0, -1, 1, -2, 2**30, -(2**30), 2**62, -(2**62)):
        assert _mini._zigzag_dec(_mini._zigzag_enc(v)) == v


# ---------------------------------------------------- generated pb2 file


def test_golden_nested_request_bytes():
    """Hand-derived golden encoding of a nested oneof request."""
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(
                stateName="cnt",
                schema="x INT",
                ttl=sm.TTLConfig(durationMs=5000),
            )
        ),
    )
    assert req.SerializeToString() == bytes.fromhex(
        "0802"  # 1: version=2
        "1213"  # 2: statefulProcessorCall, 19 bytes
        "1211"  # .2: getValueState, 17 bytes
        "0a03636e74"  # ..1: stateName "cnt"
        "12057820494e54"  # ..2: schema "x INT"
        "2203"  # ..4: ttl, 3 bytes
        "088827"  # ...1: durationMs=5000
    )


def test_proto3_default_elision_and_presence():
    # implicit-presence scalars at their default value are NOT serialized
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""
    # ...but non-defaults are
    assert sm.StateResponse(statusCode=1).SerializeToString() == b"\x08\x01"
    # oneof members serialize even when the payload is empty (presence)
    req = sm.StateRequest(
        timerRequest=sm.TimerRequest(
            timerValueRequest=sm.TimerValueRequest(
                getWatermark=sm.GetWatermark()
            )
        )
    )
    b = req.SerializeToString()
    assert b == bytes.fromhex("2a040a021200")
    r2 = sm.StateRequest()
    r2.ParseFromString(b)
    assert r2.WhichOneof("method") == "timerRequest"
    assert r2.timerRequest.WhichOneof("method") == "timerValueRequest"
    assert (
        r2.timerRequest.timerValueRequest.WhichOneof("method")
        == "getWatermark"
    )


def test_reading_singular_message_does_not_flip_presence():
    # real protobuf: merely READING a singular submessage returns an
    # unstored default — HasField stays False and nothing serializes
    req = sm.StateRequest()
    _ = req.statefulProcessorCall  # read-only touch
    assert not req.HasField("statefulProcessorCall")
    assert req.SerializeToString() == b""
    assert req.WhichOneof("method") is None
    # read identity is stable (same lazy default each time)
    assert req.statefulProcessorCall is req.statefulProcessorCall
    # ...but WRITING THROUGH the read reference links the whole chain
    req.statefulProcessorCall.getValueState.stateName = "s"
    assert req.HasField("statefulProcessorCall")
    assert req.WhichOneof("method") == "statefulProcessorCall"
    assert req.statefulProcessorCall.getValueState.stateName == "s"
    rt = sm.StateRequest()
    rt.ParseFromString(req.SerializeToString())
    assert rt.statefulProcessorCall.getValueState.stateName == "s"


def test_write_through_lazy_ref_respects_oneof_and_clear():
    call = sm.StatefulProcessorCall()
    lazy_a = call.getValueState  # unstored default
    call.getListState = sm.StateCallCommand(stateName="b")
    # mutating the stale read-ref commits it, displacing the oneof sibling
    lazy_a.stateName = "a"
    assert call.WhichOneof("method") == "getValueState"
    assert not call.HasField("getListState")
    # a cleared field's old reference is detached — mutating it afterwards
    # must not silently re-install it
    call.ClearField("getValueState")
    lazy_a.stateName = "zombie"
    assert not call.HasField("getValueState")
    # explicit assignment detaches the previously-read lazy default too
    req = sm.StateRequest()
    stale = req.implicitGroupingKeyRequest
    req.implicitGroupingKeyRequest = sm.ImplicitGroupingKeyRequest()
    stale.setImplicitKey.key = b"old"
    assert not req.implicitGroupingKeyRequest.HasField("setImplicitKey")


def test_unknown_field_name_raises():
    req = sm.StateRequest()
    with pytest.raises(AttributeError):
        req.setImplicitKey = sm.SetImplicitKey()  # wrong message level


def test_oneof_last_write_wins():
    call = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(stateName="a")
    )
    call.getListState = sm.StateCallCommand(stateName="b")
    assert call.WhichOneof("method") == "getListState"
    assert not call.HasField("getValueState")


def test_repeated_bytes_and_messages_round_trip():
    resp = sm.StateResponseWithListGet(
        statusCode=0,
        value=[b"one", b"two", b"three"],
        requireNextFetch=True,
    )
    r2 = sm.StateResponseWithListGet()
    r2.ParseFromString(resp.SerializeToString())
    assert list(r2.value) == [b"one", b"two", b"three"]
    assert r2.requireNextFetch is True

    it = sm.StateResponseWithMapIterator(statusCode=0)
    kv = it.kvPair.add(key=b"k1", value=b"v1")
    assert kv.key == b"k1"
    it.kvPair.add(key=b"k2", value=b"v2")
    r3 = sm.StateResponseWithMapIterator()
    r3.ParseFromString(it.SerializeToString())
    assert [(p.key, p.value) for p in r3.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_proto3_optional_synthetic_oneof():
    # TimerInfo.key is `optional bytes` (synthetic oneof _key): presence
    # must round-trip even for the empty value
    t = sm.TimerInfo(key=b"", timestampMs=42)
    r = sm.TimerInfo()
    r.ParseFromString(t.SerializeToString())
    assert r.HasField("key") and r.key == b""
    r2 = sm.TimerInfo()
    r2.ParseFromString(sm.TimerInfo(timestampMs=42).SerializeToString())
    assert not r2.HasField("key")


def test_enum_surface():
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Value("INITIALIZED") == 2
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"
    msg = sm.SetHandleState(state=sm.TIMER_PROCESSED)
    r = sm.SetHandleState()
    r.ParseFromString(msg.SerializeToString())
    assert r.state == sm.TIMER_PROCESSED


def test_unknown_fields_skipped():
    # field 1000 varint + field 999 length-delimited, then statusCode=7
    extra = bytearray()
    _mini.encode_varint(extra, (1000 << 3) | 0)
    _mini.encode_varint(extra, 123456)
    _mini.encode_varint(extra, (999 << 3) | 2)
    _mini.encode_varint(extra, 3)
    extra += b"abc"
    extra += b"\x08\x07"
    r = sm.StateResponse()
    r.ParseFromString(bytes(extra))
    assert r.statusCode == 7


def test_google_namespace_stays_open(tmp_path, monkeypatch):
    """The shim's ``google`` package must not terminate namespace-package
    merging: a sibling ``google.*`` distribution elsewhere on sys.path
    (google-auth, google-cloud-*) must stay importable after
    enable_protoshim() puts the shim first."""
    import importlib
    import sys

    pkg = tmp_path / "google" / "protoshim_ns_probe"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("MARKER = 'sibling-ok'\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    # the shim's google is already imported; extend_path recomputation
    # happens at import time, so re-extend for the new sys.path entry
    import google

    importlib.reload(google)
    mod = importlib.import_module("google.protoshim_ns_probe")
    try:
        assert mod.MARKER == "sibling-ok"
        # and the shim still owns google.protobuf
        import google.protobuf as gp

        assert "protoshim" in (gp.__file__ or "")
    finally:
        sys.modules.pop("google.protoshim_ns_probe", None)
        importlib.reload(google)


def test_never_shadows_real_protobuf(monkeypatch):
    import google.protobuf as gp

    assert enable_protoshim() is True
    # the active module is the shim ONLY because the real wheel is absent
    assert ("protoshim" in gp.__file__) == ("0.0.0" in gp.__version__)
