"""Property-based tests for the pure-Python Avro codec: arbitrary
values roundtrip through encode/decode (hypothesis)."""

import hypothesis.strategies as st
from hypothesis import given, settings

from goconnect_spark.functions import avro_py

_SCHEMA = {
    "type": "record",
    "name": "P",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "by", "type": "bytes"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "u", "type": ["null", "string"]},
    ],
}

_value = st.fixed_dictionaries(
    {
        "l": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.text(max_size=50),
        "d": st.floats(allow_nan=False),
        "by": st.binary(max_size=50),
        "arr": st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=10),
        "m": st.dictionaries(st.text(max_size=10), st.integers(min_value=0, max_value=2**32), max_size=5),
        "u": st.none() | st.text(max_size=20),
    }
)


@settings(max_examples=200, deadline=None)
@given(_value)
def test_roundtrip_property(value):
    assert avro_py.decode(avro_py.encode(value, _SCHEMA), _SCHEMA) == value


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_property(v):
    schema = {"type": "record", "name": "Z", "fields": [{"name": "v", "type": "long"}]}
    assert avro_py.decode(avro_py.encode({"v": v}, schema), schema) == {"v": v}
