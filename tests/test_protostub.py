"""Vendored minimal protobuf runtime (strawboat_spark/vendor/protostub):
wire-format unit tests plus the integration property that matters — the
runtime drives pyspark's real generated StateMessage_pb2 module (the
transformWithStateInPandas state protocol; see
tests/test_streaming.py::test_transform_with_state_topk for the
end-to-end JVM exchange)."""

from __future__ import annotations

import pytest

from strawboat_spark.streaming.protostub import install

installed = install()
try:
    from google.protobuf import miniproto as mp
except ImportError:  # real protobuf present: the stub (rightly) stays out
    mp = None

pytestmark = pytest.mark.skipif(
    mp is None, reason="real google.protobuf installed; stub not in play"
)


def _msg_cls(fields):
    cls = type("M", (mp.MiniMessage,), {})
    cls._FIELDS = {f.name: f for f in fields}
    cls._FIELDS_BY_NUM = {f.number: f for f in fields}
    cls._FIELDS_SORTED = sorted(fields, key=lambda f: f.number)
    return cls


def test_varint_boundaries():
    for v in (0, 1, 127, 128, 300, 2**32 - 1, 2**63 - 1, -1, -2**63):
        enc = mp.enc_varint(v)
        dec, pos = mp.dec_varint(enc, 0)
        assert pos == len(enc)
        assert mp._to_signed64(dec) == v


def test_scalar_roundtrip_all_types():
    fields = [
        mp.FieldDef("i32", 1, mp.T_INT32, False),
        mp.FieldDef("i64", 2, mp.T_INT64, False),
        mp.FieldDef("u64", 3, mp.T_UINT64, False),
        mp.FieldDef("s64", 4, mp.T_SINT64, False),
        mp.FieldDef("b", 5, mp.T_BOOL, False),
        mp.FieldDef("d", 6, mp.T_DOUBLE, False),
        mp.FieldDef("f32", 7, mp.T_FLOAT, False),
        mp.FieldDef("s", 8, mp.T_STRING, False),
        mp.FieldDef("by", 9, mp.T_BYTES, False),
        mp.FieldDef("fx64", 10, mp.T_SFIXED64, False),
    ]
    M = _msg_cls(fields)
    m = M(i32=-42, i64=-(2**40), u64=2**63, s64=-7, b=True, d=1.5, f32=2.0,
          s="héllo", by=b"\x00\xff", fx64=-9)
    out = M()
    out.ParseFromString(m.SerializeToString())
    assert (out.i32, out.i64, out.u64, out.s64, out.b) == (-42, -(2**40), 2**63, -7, True)
    assert (out.d, out.f32, out.s, out.by, out.fx64) == (1.5, 2.0, "héllo", b"\x00\xff", -9)


def test_explicit_default_is_serialized_absent_is_not():
    M = _msg_cls([mp.FieldDef("x", 1, mp.T_INT32, False)])
    assert M().SerializeToString() == b""
    assert M(x=0).SerializeToString() == b"\x08\x00"  # oneof members need this
    out = M()
    out.ParseFromString(b"")
    assert out.x == 0  # default on read


def test_repeated_packed_emit_and_both_parse_forms():
    M = _msg_cls([mp.FieldDef("xs", 1, mp.T_INT64, True)])
    m = M(xs=[1, 2, 300])
    wire = m.SerializeToString()
    assert wire[0] == (1 << 3) | 2  # packed: length-delimited
    out = M()
    out.ParseFromString(wire)
    assert out.xs == [1, 2, 300]
    # unpacked arrivals of the same field must also parse
    unpacked = b"\x08\x01\x08\x02\x08\xac\x02"
    out2 = M()
    out2.ParseFromString(unpacked)
    assert out2.xs == [1, 2, 300]


def test_repeated_bytes_and_messages():
    Sub = _msg_cls([mp.FieldDef("v", 1, mp.T_INT32, False)])
    f = mp.FieldDef("subs", 1, mp.T_MESSAGE, True)
    f.message_cls = Sub
    M = _msg_cls([f, mp.FieldDef("bs", 2, mp.T_BYTES, True)])
    m = M(subs=[Sub(v=1), Sub(v=2)], bs=[b"a", b"bb"])
    out = M()
    out.ParseFromString(m.SerializeToString())
    assert [s.v for s in out.subs] == [1, 2]
    assert out.bs == [b"a", b"bb"]
    # live-list semantics: reading then appending must stick
    fresh = M()
    fresh.bs.append(b"z")
    assert fresh.SerializeToString() != b""


def test_unknown_fields_skipped():
    M = _msg_cls([mp.FieldDef("x", 1, mp.T_INT32, False)])
    # field 9 varint, field 7 length-delimited, field 3 fixed64, then x=5
    wire = b"\x48\x2a" + b"\x3a\x03abc" + b"\x19" + b"\x00" * 8 + b"\x08\x05"
    out = M()
    out.ParseFromString(wire)
    assert out.x == 5


def test_reading_submessage_does_not_create_presence():
    Sub = _msg_cls([mp.FieldDef("v", 1, mp.T_INT32, False)])
    f = mp.FieldDef("sub", 1, mp.T_MESSAGE, False)
    f.message_cls = Sub
    M = _msg_cls([f])
    m = M()
    assert m.sub.v == 0  # default view
    assert m.SerializeToString() == b""  # still absent (oneof correctness)


def test_real_statemessage_pb2_roundtrips():
    sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(
                stateName="counter", valueStateUpdate=sm.ValueStateUpdate(value=b"\x01\x02")
            )
        )
    )
    wire = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(wire)
    call = back.stateVariableRequest.valueStateCall
    assert call.stateName == "counter"
    assert call.valueStateUpdate.value == b"\x01\x02"
    # enum constants exported at module level, in declared order
    assert isinstance(sm.PRE_INIT, int) and sm.CREATED != sm.CLOSED


def test_stub_never_shadows_real_protobuf(monkeypatch):
    import importlib.util

    if importlib.util.find_spec("google") is not None:
        import google

        if "vendor/protostub" not in (getattr(google, "__file__", "") or ""):
            assert install() is False


def test_property_random_messages_roundtrip():
    """Hypothesis: random values over a mixed-type message survive
    serialize->parse bit-exactly (within float32 rounding for T_FLOAT)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    fields = [
        mp.FieldDef("a", 1, mp.T_INT64, False),
        mp.FieldDef("b", 2, mp.T_UINT64, False),
        mp.FieldDef("c", 3, mp.T_SINT64, False),
        mp.FieldDef("d", 4, mp.T_DOUBLE, False),
        mp.FieldDef("e", 5, mp.T_STRING, False),
        mp.FieldDef("f", 6, mp.T_BYTES, False),
        mp.FieldDef("g", 7, mp.T_BOOL, False),
        mp.FieldDef("h", 8, mp.T_INT64, True),
        mp.FieldDef("i", 9, mp.T_FIXED64, False),
        mp.FieldDef("j", 10, mp.T_SFIXED32, False),
    ]
    M = _msg_cls(fields)
    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

    @settings(max_examples=200, deadline=None)
    @given(
        a=i64,
        b=st.integers(min_value=0, max_value=2**64 - 1),
        c=i64,
        d=st.floats(allow_nan=False),
        e=st.text(max_size=40),
        f=st.binary(max_size=40),
        g=st.booleans(),
        h=st.lists(i64, max_size=8),
        i=st.integers(min_value=0, max_value=2**64 - 1),
        j=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    )
    def check(a, b, c, d, e, f, g, h, i, j):
        m = M(a=a, b=b, c=c, d=d, e=e, f=f, g=g, h=h, i=i, j=j)
        out = M()
        out.ParseFromString(m.SerializeToString())
        assert (out.a, out.b, out.c, out.d) == (a, b, c, d)
        assert (out.e, out.f, out.g) == (e, f, g)
        assert out.h == h
        assert (out.i, out.j) == (i, j)

    check()
