"""vendor/miniproto — wire-format unit tests + the t10 end-to-end run.

The mini protobuf runtime only exists to back PySpark's generated
``StateMessage_pb2`` module, so the tests drive exactly that module:
golden wire bytes (hand-encoded from the public proto3 spec), oneof
semantics, signed-varint round-trips, repeated fields, unknown-field
tolerance — then the integration proof: t10's transformWithState
stream, whose every state interaction crosses this runtime twice
(Python worker → JVM state server and back).
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

VENDOR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vendor",
    "miniproto",
)

# Mirror the production gate: prefer a real protobuf, else vendored.
# Gate on google.protobuf (not the bare `google` namespace root): a
# host with google-auth but no protobuf must still get the fallback,
# exactly as hetnetdb_spark/streaming/queries.py does.
def _has_protobuf():
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no `google` package/namespace at all
        return False


if not _has_protobuf() and VENDOR not in sys.path:
    sys.path.append(VENDOR)

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_golden_handshake_bytes():
    # StateRequest{version=2, statefulProcessorCall{setHandleState{
    # state=CREATED}}} — hand-encoded: field1 varint 2;
    # field2 LEN{field1 LEN{field1 varint 1}}.
    call = sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.CREATED)
    )
    req = sm.StateRequest(version=2, statefulProcessorCall=call)
    assert req.SerializeToString() == bytes.fromhex("080212040a020801")


def test_default_enum_value_omitted_but_oneof_member_kept():
    # proto3: state=PRE_INIT(0) serializes to an EMPTY SetHandleState,
    # but the oneof member itself must still be emitted (tag + len 0)
    # so the JVM sees which branch was taken.
    call = sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
    )
    req = sm.StateRequest(statefulProcessorCall=call)
    assert req.SerializeToString() == bytes.fromhex("12020a00")
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.statefulProcessorCall.setHandleState.state == sm.PRE_INIT


def test_oneof_assignment_clears_siblings():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CLOSED)
        )
    )
    req.implicitGroupingKeyRequest = sm.ImplicitGroupingKeyRequest(
        removeImplicitKey=sm.RemoveImplicitKey()
    )
    assert not req.HasField("statefulProcessorCall")
    assert req.HasField("implicitGroupingKeyRequest")


def test_signed_int64_round_trip():
    for v in (0, 1, -1, 123456789012345, -(2**63), 2**63 - 1):
        msg = sm.TimerInfo(timestampMs=v)
        back = sm.TimerInfo()
        back.ParseFromString(msg.SerializeToString())
        assert back.timestampMs == v


def test_repeated_bytes_and_messages():
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"", b"bb"], requireNextFetch=True
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(resp.SerializeToString())
    assert back.value == [b"a", b"", b"bb"]
    assert back.requireNextFetch is True
    assert back.errorMessage == ""  # unset → proto3 default

    rt = sm.StateResponseWithTimer(
        statusCode=1,
        timer=[sm.TimerInfo(key=b"k", timestampMs=9), sm.TimerInfo(timestampMs=-5)],
    )
    back2 = sm.StateResponseWithTimer()
    back2.ParseFromString(rt.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back2.timer] == [(b"k", 9), (b"", -5)]


def test_unknown_fields_are_retained_and_round_tripped():
    # A newer peer adding field 99 (varint 42) and field 98 (bytes
    # "zz") must not desynchronize parsing of the known fields around
    # them — and (round-10, proto3 3.5+ semantics) must SURVIVE a
    # decode/re-encode round-trip: known fields first in ascending
    # field order, then the unknowns byte-identically in arrival
    # order. Silent dropping would corrupt state for a PySpark
    # upgrade that relies on unknown-field preservation.
    known = sm.StateResponse(statusCode=7, value=b"xy").SerializeToString()
    unknown = bytes.fromhex("d806") + b"\x2a" + bytes.fromhex("9206") + b"\x02zz"
    back = sm.StateResponse()
    back.ParseFromString(unknown + known)
    assert back.statusCode == 7
    assert back.value == b"xy"
    assert back.SerializeToString() == known + unknown


def test_parse_replaces_prior_unknowns():
    # ParseFromString is replace semantics for unknown fields too: a
    # second clean parse must not leak the first parse's unknowns.
    unknown = bytes.fromhex("d806") + b"\x2a"
    msg = sm.StateResponse()
    msg.ParseFromString(unknown)
    clean = sm.StateResponse(statusCode=3).SerializeToString()
    msg.ParseFromString(clean)
    assert msg.SerializeToString() == clean


def test_wire_type_mismatch_retained_as_unknown():
    # A KNOWN field number arriving on the wrong wire type is an
    # unknown field per the wire spec (retained, re-emitted), never a
    # value for that field. statusCode is field 1 varint; send field 1
    # as LEN instead.
    mismatch = b"\x0a\x03abc"  # tag(1, LEN), len 3, "abc"
    msg = sm.StateResponse()
    msg.ParseFromString(mismatch)
    assert msg.statusCode == 0  # untouched default
    assert msg.SerializeToString() == mismatch


def test_repeated_field_access_is_live():
    # Real protobuf returns a live container for unset repeated
    # fields — appends must stick (round-9 ADVICE fix: the old
    # runtime returned a fresh list, silently dropping the append).
    resp = sm.StateResponseWithListGet(statusCode=0)
    resp.value.append(b"grew")
    back = sm.StateResponseWithListGet()
    back.ParseFromString(resp.SerializeToString())
    assert back.value == [b"grew"]


def test_unset_message_default_auto_vivifies_on_write():
    # Real-protobuf auto-vivification (round-9, required by
    # PySpark's `state_call_command.ttl.durationMs = n` TTL path):
    # READING the default of an unset embedded field does not set
    # presence; the first field WRITE through it attaches the
    # submessage to the parent.
    req = sm.StateRequest()
    sub = req.statefulProcessorCall  # reading the default is fine
    assert not req.HasField("statefulProcessorCall")
    sub.setHandleState = sm.SetHandleState(state=sm.CREATED)
    assert req.HasField("statefulProcessorCall")
    assert req.statefulProcessorCall.setHandleState.state == sm.CREATED
    # The wire round-trip carries the vivified chain.
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.statefulProcessorCall.setHandleState.state == sm.CREATED


def test_auto_vivify_chain_and_oneof_clearing():
    # Chained vivification (`a.b.c = x`) attaches bottom-up, and the
    # attachment routes through the parent's __setattr__ so ONEOF
    # siblings are cleared exactly as a direct assignment would.
    cmd = sm.StateCallCommand(stateName="s")
    cmd.ttl.durationMs = 250  # the exact shape PySpark's TTL path writes
    assert cmd.HasField("ttl") and cmd.ttl.durationMs == 250
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 250 and back.stateName == "s"
    # Vivified writes participate in oneof clearing: setting one
    # member through the default must evict a previously-set sibling.
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    req.stateVariableRequest.valueStateCall = sm.ValueStateCall(
        stateName="v"
    )
    assert req.HasField("stateVariableRequest")
    assert not req.HasField("statefulProcessorCall")


def test_repeated_on_unset_default_still_fails_loudly():
    # The one in-place pattern vivification cannot honor: a live
    # repeated container on a NOT-YET-ATTACHED default (appends
    # would never trigger attachment). Must raise, not drop.
    call = sm.ListStateCall(stateName="l")
    with pytest.raises(NotImplementedError):
        call.appendList.value.append(b"lost")
    assert not call.HasField("appendList")


def test_singular_message_occurrences_merge():
    # proto3 wire spec: repeated occurrences of a SINGULAR embedded
    # message merge field-by-field instead of replacing wholesale.
    a = sm.StateCallCommand(stateName="s").SerializeToString()
    b = sm.StateCallCommand(schema="v int").SerializeToString()

    # Hand-frame two occurrences of statefulProcessorCall(field 2 of
    # StateRequest) → LEN{ getValueState=... } twice; inner uses
    # StatefulProcessorCall.getValueState (field 2, LEN).
    def frame(field_number, payload):
        tag = bytes([(field_number << 3) | 2])
        return tag + bytes([len(payload)]) + payload

    inner1 = frame(2, a)  # getValueState = StateCallCommand(stateName)
    inner2 = frame(2, b)  # getValueState = StateCallCommand(schema)
    wire_msg = frame(2, inner1) + frame(2, inner2)
    req = sm.StateRequest()
    req.ParseFromString(wire_msg)
    merged = req.statefulProcessorCall.getValueState
    assert merged.stateName == "s"  # survives the second occurrence
    assert merged.schema == "v int"


def test_string_fields_utf8():
    cmd = sm.StateCallCommand(stateName="naïve✓", schema="v int")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.stateName == "naïve✓"
    assert back.schema == "v int"


def test_t10_transform_with_state_end_to_end(spark, oracle):
    """The integration proof: a real transformWithStateInPandas
    stream with MapState over RocksDB, every get/update/iterator
    crossing the miniproto wire twice. Oracle: COUNT(DISTINCT) +
    COUNT(*) per user over the same events."""
    from hetnetdb_spark import registry
    from tests.conftest import SF_DIR
    from tests.oracle_compare import assert_frames_match

    registry.load_all()
    if "t10_transform_with_state" not in registry.QUERIES:
        pytest.skip("no protobuf runtime available (real or vendored)")
    got = registry.QUERIES["t10_transform_with_state"](spark, SF_DIR).toPandas()
    want = oracle.execute(registry.ORACLE["t10_transform_with_state"]).fetchdf()
    assert_frames_match(got, want, "t10_transform_with_state")


def test_pending_default_is_cached_per_field():
    # Two reads of the same unset message field must hand back the
    # SAME pending instance (real protobuf has one live submessage);
    # writes through either reference land in one place.
    req = sm.StateRequest()
    a = req.statefulProcessorCall
    b = req.statefulProcessorCall
    assert a is b
    a.setHandleState = sm.SetHandleState(state=sm.CREATED)
    assert req.statefulProcessorCall.setHandleState.state == sm.CREATED


def test_direct_assignment_detaches_stale_pending_default():
    # A direct field assignment supersedes a previously handed-out
    # pending default: a late write through the stale reference must
    # NOT clobber the directly-assigned value.
    cmd = sm.StateCallCommand()
    stale = cmd.ttl  # pending default handed out, never written yet
    cmd.ttl = sm.TTLConfig(durationMs=500)
    stale.durationMs = 9  # mutates a disconnected object
    assert cmd.ttl.durationMs == 500


def test_oneof_direct_assignment_immune_to_stale_sibling_pending():
    # Direct assignment to one oneof member must also detach the
    # PENDING defaults of its siblings: a late write through a stale
    # sibling reference may not evict the directly-assigned value.
    req = sm.StateRequest()
    stale = req.statefulProcessorCall  # pending sibling, never written
    req.timerRequest = sm.TimerRequest()
    stale.setHandleState = sm.SetHandleState(state=sm.CREATED)
    assert req.HasField("timerRequest")
    assert not req.HasField("statefulProcessorCall")


def test_parse_into_pending_default_attaches_to_parent():
    # ADVICE r9: cmd.ttl.ParseFromString(wire) on the not-yet-attached
    # default child must attach it (real protobuf notifies the parent
    # listener on any modification) — presence flips and the decoded
    # data serializes with the parent, consistent with the
    # __setattr__ auto-vivification path.
    wire = sm.TTLConfig(durationMs=750).SerializeToString()
    cmd = sm.StateCallCommand()
    cmd.ttl.ParseFromString(wire)
    assert cmd.HasField("ttl")
    assert cmd.ttl.durationMs == 750
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 750


def test_empty_parse_into_pending_default_stays_unset():
    # An empty payload decodes no fields: nothing to materialize, so
    # presence on the parent stays false (reading a default never
    # sets presence).
    cmd = sm.StateCallCommand()
    cmd.ttl.ParseFromString(b"")
    assert not cmd.HasField("ttl")


def test_merge_into_pending_default_attaches_unknowns_too():
    # Even a payload made ONLY of unknown fields is a modification:
    # the child attaches and the unknown bytes survive through the
    # parent's serialization.
    unknown = bytes.fromhex("d806") + b"\x2a"
    cmd = sm.StateCallCommand()
    cmd.ttl.MergeFromString(unknown)
    assert cmd.HasField("ttl")
    assert cmd.ttl.SerializeToString() == unknown


def test_parse_detaches_outstanding_pendings():
    # Replace semantics: ParseFromString severs lazy children handed
    # out earlier, so a late write cannot clobber parsed content.
    wire = sm.StateCallCommand(ttl=sm.TTLConfig(durationMs=500)).SerializeToString()
    cmd = sm.StateCallCommand()
    stale = cmd.ttl
    cmd.ParseFromString(wire)
    stale.durationMs = 9  # mutates a disconnected object
    assert cmd.ttl.durationMs == 500
