"""Property tests for the BSON/OP_MSG codec (no Spark, no server):
arbitrary nested documents round-trip byte-faithfully through
encode_document/decode_document and the OP_MSG framing."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hstream_spark.sources.bson_wire import (
    Int64,
    decode_document,
    decode_op_msg,
    encode_document,
    encode_op_msg,
)

# BSON keys: non-empty, no NUL; values: the wire types the codec speaks
_key = st.text(min_size=1, max_size=20).filter(lambda s: "\x00" not in s)
_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=50),
    st.binary(max_size=50),
    st.datetimes(
        min_value=dt.datetime(1970, 1, 2),
        max_value=dt.datetime(2200, 1, 1),
    ),
)
_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(_key, children, max_size=4),
    ),
    max_leaves=12,
)
_doc = st.dictionaries(_key, _value, max_size=6)


def _canon(v):
    """Expected decode image: datetimes truncate to ms and come back
    tz-aware UTC; tuples become lists."""
    if isinstance(v, dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        ms = int(v.timestamp() * 1000)
        return dt.datetime.fromtimestamp(ms / 1000.0, tz=dt.timezone.utc)
    if isinstance(v, dict):
        return {k: _canon(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_canon(x) for x in v]
    if isinstance(v, bytearray):
        return bytes(v)
    return v


@settings(max_examples=200, deadline=None)
@given(doc=_doc)
def test_document_round_trip(doc):
    buf = encode_document(doc)
    out, consumed = decode_document(buf)
    assert consumed == len(buf)
    assert out == _canon(doc)


@settings(max_examples=100, deadline=None)
@given(doc=_doc, rid=st.integers(min_value=0, max_value=2**31 - 1))
def test_op_msg_round_trip(doc, rid):
    frame = encode_op_msg(doc, request_id=rid)
    out = decode_op_msg(frame)
    assert out == _canon(doc)


@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_int64_marker_forces_wide_encoding(v):
    """Int64-wrapped small ints encode as BSON int64 (0x12), plain ints
    as int32 (0x10) — the getMore cursor-id requirement."""
    wide = encode_document({"v": Int64(v)})
    narrow = encode_document({"v": v})
    assert wide[4] == 0x12
    assert narrow[4] == 0x10
    assert decode_document(wide)[0] == decode_document(narrow)[0] == {"v": v}


def test_nul_in_key_rejected():
    with pytest.raises(ValueError, match="NUL"):
        encode_document({"a\x00b": 1})
