"""Avro codec + schema evolution (reference serde fixtures parity:
coder/serde/avro.coder.fixtures/user.go, examples/list-avro-sr-kafka
record schema) and the full Confluent wire chain on a DataFrame."""

import json

import pyspark.sql.functions as F
import pytest

from goconnect_spark.functions import avro_py
from goconnect_spark.functions.serde import sr_prepend_header, sr_schema_id, sr_strip_header

# examples/list-avro-sr-kafka/main.go:42-61 record
EXAMPLE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Example",
        "fields": [
            {"name": "seqNo", "type": "long", "default": 0},
            {"name": "timestamp", "type": "long", "default": -1},
            {"name": "text", "type": "string", "default": ""},
        ],
    }
)

# avro_user_evolution fixture (V1 writer / V2 reader with aliases,
# bytes->string promotion, defaults)
USER_V1 = {
    "type": "record",
    "name": "User",
    "fields": [
        {"name": "Errors", "type": {"type": "array", "items": "string"}},
        {"name": "Phone", "type": ["null", "int"]},
        {"name": "first_name", "type": "bytes"},
        {"name": "last_name", "type": "bytes"},
    ],
}
USER_V2 = {
    "type": "record",
    "name": "User",
    "fields": [
        {"name": "FirstName", "type": "string", "aliases": ["first_name"]},
        {"name": "LastName", "type": "string", "aliases": ["last_name"]},
        {"name": "Phone", "type": ["null", "int"], "default": None},
        {"name": "Errors", "type": {"type": "array", "items": "string"}, "default": []},
        {"name": "Region", "type": "string", "default": "EU"},
    ],
}


def test_roundtrip_primitives_and_collections():
    schema = {
        "type": "record",
        "name": "T",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "u", "type": ["null", "string"]},
        ],
    }
    val = {
        "b": True, "i": -42, "l": 1 << 40, "d": 2.5, "s": "héllo",
        "by": b"\x00\x01", "arr": [1, -2, 3], "m": {"k1": "v1", "k2": "v2"},
        "u": None,
    }
    assert avro_py.decode(avro_py.encode(val, schema), schema) == val
    val2 = dict(val, u="present")
    assert avro_py.decode(avro_py.encode(val2, schema), schema) == val2


def test_zigzag_negative_longs():
    schema = {"type": "record", "name": "N", "fields": [{"name": "v", "type": "long"}]}
    for v in (0, -1, 1, -(1 << 62), (1 << 62) - 1):
        assert avro_py.decode(avro_py.encode({"v": v}, schema), schema) == {"v": v}


def test_schema_evolution_aliases_promotions_defaults():
    writer_val = {
        "Errors": ["e1"],
        "Phone": 123,
        "first_name": b"Ada",
        "last_name": b"Lovelace",
    }
    body = avro_py.encode(writer_val, USER_V1)
    decoded = avro_py.decode(body, USER_V1)
    projected = avro_py.project(decoded, USER_V1, USER_V2)
    assert projected == {
        "FirstName": "Ada",       # alias + bytes->string promotion
        "LastName": "Lovelace",
        "Phone": 123,
        "Errors": ["e1"],
        "Region": "EU",           # reader default
    }


def test_projection_drop_field():
    # kafka-sr1-avro-sr2-kafka drop-field case: {seqNo, timestamp}
    reader = {
        "type": "record",
        "name": "Example",
        "fields": [
            {"name": "seqNo", "type": "long", "default": 0},
            {"name": "timestamp", "type": "long", "default": -1},
        ],
    }
    body = avro_py.encode({"seqNo": 7, "timestamp": 99, "text": "x" * 100}, json.loads(EXAMPLE_SCHEMA))
    out = avro_py.project(avro_py.decode(body, EXAMPLE_SCHEMA), EXAMPLE_SCHEMA, reader)
    assert out == {"seqNo": 7, "timestamp": 99}


def test_confluent_wire_chain_on_dataframe(spark):
    # full SR chain: encode records -> prepend wire header -> DataFrame
    # -> schema id + strip header + avro_decode_udf -> struct column
    rows = [
        (i, bytearray(avro_py.encode({"seqNo": i, "timestamp": 1000 + i, "text": f"msg{i}"},
                                     json.loads(EXAMPLE_SCHEMA))))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, body binary")
    wired = df.select("id", sr_prepend_header(F.col("body"), 4242).alias("payload"))
    dec = avro_py.avro_decode_udf(EXAMPLE_SCHEMA, "seqNo long, timestamp long, text string")
    out = wired.select(
        sr_schema_id(F.col("payload")).alias("sid"),
        dec(sr_strip_header(F.col("payload"))).alias("rec"),
    ).select("sid", "rec.seqNo", "rec.text")
    got = out.orderBy("seqNo").collect()
    assert len(got) == 50
    assert all(r.sid == 4242 for r in got)
    assert got[7].seqNo == 7 and got[7].text == "msg7"


def test_decode_udf_with_reader_projection(spark):
    reader = json.dumps(
        {
            "type": "record",
            "name": "Example",
            "fields": [
                {"name": "seqNo", "type": "long", "default": 0},
                {"name": "note", "type": "string", "default": "n/a"},
            ],
        }
    )
    body = bytearray(avro_py.encode({"seqNo": 5, "timestamp": 1, "text": "t"},
                                    json.loads(EXAMPLE_SCHEMA)))
    df = spark.createDataFrame([(body,)], "body binary")
    dec = avro_py.avro_decode_udf(EXAMPLE_SCHEMA, "seqNo long, note string", reader_schema=reader)
    r = df.select(dec("body").alias("rec")).collect()[0].rec
    assert r.seqNo == 5 and r.note == "n/a"


def test_union_branch_resolved_by_value_type():
    """ADVICE r1: multi-branch unions must encode via the branch whose
    type matches the value — not the first non-null branch."""
    schema = {
        "type": "record",
        "name": "U",
        "fields": [{"name": "v", "type": ["int", "boolean", "string"]}],
    }
    for val in (True, False, 7, "hey"):
        data = avro_py.encode({"v": val}, schema)
        assert avro_py.decode(data, schema) == {"v": val}
    # null still resolves in nullable unions, and bool != int branch
    nullable = {
        "type": "record",
        "name": "N",
        "fields": [{"name": "v", "type": ["null", "boolean", "long"]}],
    }
    for val in (None, True, 123456789):
        data = avro_py.encode({"v": val}, nullable)
        assert avro_py.decode(data, nullable) == {"v": val}


def test_sr1_to_sr2_reencode_byte_exact(spark):
    """VERDICT r1 item 4 (reference examples/kafka-sr1-avro-sr2-kafka/
    main.go:75-83): decode with registry A's writer schema, project to
    the target schema, register under registry B, re-encode under the
    new id — byte-exact against a locally composed expectation."""
    import pyspark.sql.functions as F

    from goconnect_spark.functions.serde import InMemorySchemaRegistry, sr_reencode

    sr1 = InMemorySchemaRegistry(start_id=41)
    v1_id = sr1.register("user-value", json.dumps(USER_V1))
    sr2 = InMemorySchemaRegistry(start_id=7)

    users = [
        {"Errors": ["e1", "e2"], "Phone": 123, "first_name": b"Ada", "last_name": b"L"},
        {"Errors": [], "Phone": None, "first_name": b"Bob", "last_name": b"M"},
    ]
    payloads = [
        bytes([0]) + v1_id.to_bytes(4, "big") + avro_py.encode(u, USER_V1) for u in users
    ]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)], "i int, value binary")
    out, tid = sr_reencode(df, "value", sr1, sr2, "user-value", json.dumps(USER_V2))
    assert tid == 7
    got = [bytes(r.value) for r in out.orderBy("i").collect()]
    want = [
        bytes([0]) + tid.to_bytes(4, "big")
        + avro_py.encode(avro_py.project(u, USER_V1, USER_V2), USER_V2)
        for u in users
    ]
    assert got == want
    # the rewritten payloads decode under v2 with evolution applied
    dec = avro_py.decode(got[0][5:], USER_V2)
    assert dec["FirstName"] == "Ada" and dec["Region"] == "EU" and dec["Phone"] == 123
    # registering the same schema again is idempotent (same id)
    assert sr2.register("user-value", json.dumps(USER_V2)) == tid


def test_sr_reencode_udf_rejects_unknown_id_and_bad_magic(spark):
    from goconnect_spark.functions.serde import sr_reencode_udf

    udf = sr_reencode_udf({1: json.dumps(USER_V1)}, json.dumps(USER_V2), 9)
    bad_id = bytes([0]) + (99).to_bytes(4, "big") + avro_py.encode(
        {"Errors": [], "Phone": None, "first_name": b"x", "last_name": b"y"}, USER_V1
    )
    df = spark.createDataFrame([(bad_id,)], "value binary")
    with pytest.raises(Exception, match="99"):
        df.select(udf("value")).collect()
    bad_magic = spark.createDataFrame([(b"\x01garbage",)], "value binary")
    with pytest.raises(Exception, match="magic"):
        bad_magic.select(udf("value")).collect()


def test_corrupt_union_and_enum_indexes_rejected():
    """A corrupt branch/symbol index must raise, never resolve via
    Python's negative list indexing (round-13 mutation-check finding:
    the raw byte 0x01 zigzag-decodes to -1 and used to silently select
    the LAST union branch)."""
    union_schema = ["null", "int"]
    # valid: index zigzag(1)=0x02 then int zigzag(5)=0x0A
    assert avro_py.decode(bytes([0x02, 0x0A]), union_schema) == 5
    # raw 0x01 -> index -1: out of range, not branch[-1]
    with pytest.raises(ValueError, match="union index -1"):
        avro_py.decode(bytes([0x01, 0x0A]), union_schema)
    # index 2 (zigzag 0x04) on a 2-branch union: out of range
    with pytest.raises(ValueError, match="union index 2"):
        avro_py.decode(bytes([0x04, 0x0A]), union_schema)
    enum_schema = {"type": "enum", "name": "E", "symbols": ["a", "b"]}
    assert avro_py.decode(bytes([0x02]), enum_schema) == "b"
    with pytest.raises(ValueError, match="enum index -1"):
        avro_py.decode(bytes([0x01]), enum_schema)
    with pytest.raises(ValueError, match="enum index 2"):
        avro_py.decode(bytes([0x04]), enum_schema)


def test_encode_coercion_matches_arrow_pandas_shapes():
    """The encode UDF path sees Arrow->pandas shapes (numpy scalars,
    float64-widened nullable ints, ndarray lists); _to_native +
    _coerce must map them onto the writer schema before encoding."""
    import numpy as np

    schema = {"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "int"},
        {"name": "d", "type": ["null", "int"]},
        {"name": "x", "type": "double"},
        {"name": "g", "type": {"type": "array", "items": "int"}},
    ]}
    # what a pandas record dict looks like after Arrow conversion
    row = {"a": np.int32(7), "d": float("nan"), "x": np.float64(2.5),
           "g": np.array([1, 2], dtype=np.int64)}
    native = avro_py._coerce(avro_py._to_native(row), schema)
    body = avro_py.encode(native, schema)
    assert avro_py.decode(body, schema) == {
        "a": 7, "d": None, "x": 2.5, "g": [1, 2]}
    # non-null nullable int arrives float64-widened: 2.0 -> int branch
    row2 = dict(row, d=2.0)
    native2 = avro_py._coerce(avro_py._to_native(row2), schema)
    assert avro_py.decode(avro_py.encode(native2, schema), schema)["d"] == 2


def test_zero_byte_item_blocks_roundtrip():
    """ADVICE r13: items of zero encoded size (null; records whose
    fields are all zero-byte) legitimately consume 0 bytes, so the
    remaining-bytes clamp must not reject decode(encode(x)) — those
    fall back to a finite iteration cap instead."""
    arr_null = {"type": "array", "items": "null"}
    for n in (0, 1, 3, 7, 100):
        val = [None] * n
        assert avro_py.decode(avro_py.encode(val, arr_null), arr_null) == val
    empty_rec = {"type": "record", "name": "E", "fields": []}
    arr_rec = {"type": "array", "items": empty_rec}
    val = [{}, {}, {}, {}]
    assert avro_py.decode(avro_py.encode(val, arr_rec), arr_rec) == val
    # a record of only-null fields is also zero-byte
    null_rec = {"type": "record", "name": "N",
                "fields": [{"name": "a", "type": "null"}]}
    arr_nrec = {"type": "array", "items": null_rec}
    val = [{"a": None}] * 5
    assert avro_py.decode(avro_py.encode(val, arr_nrec), arr_nrec) == val
    # map values of null still work: each entry's key costs >= 1 byte
    map_null = {"type": "map", "values": "null"}
    val = {"k1": None, "k2": None}
    assert avro_py.decode(avro_py.encode(val, map_null), map_null) == val
    # and the corrupt-count protection is retained for zero-byte items
    w = avro_py._Writer()
    w.write_long(1 << 40)
    with pytest.raises(ValueError, match="block count"):
        avro_py.decode(w.buf.getvalue(), arr_null)


def test_decode_total_on_truncated_and_corrupt_bodies():
    """Corrupt-input totality (round 13, the decode-fuzz contract the
    multimodal decoders already carry): every STRICT prefix of a valid
    record body must raise ValueError/EOFError — never return
    silently-truncated data (BytesIO.read used to short-read) and
    never loop on a corrupt block count."""
    schema = {"type": "record", "name": "R", "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "x", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "u", "type": ["null", "long"]},
        {"name": "a", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ]}
    val = {"b": True, "x": 2.5, "s": "héllo", "u": 7,
           "a": [1, -2, 300], "m": {"k1": "v1", "k2": "v2"}}
    body = avro_py.encode(val, schema)
    assert avro_py.decode(body, schema) == val
    for cut in range(len(body)):
        with pytest.raises((ValueError, EOFError)):
            avro_py.decode(body[:cut], schema)
    # corrupt block count over zero-byte items must raise, not loop:
    # array<null> with count zigzag(2^40)
    import io as _io
    w = avro_py._Writer()
    w.write_long(1 << 40)
    huge = w.buf.getvalue()
    with pytest.raises(ValueError, match="block count"):
        avro_py.decode(huge, {"type": "array", "items": "null"})
    # ADVICE r13: a corrupt count over MULTI-byte items is caught by
    # the n * min_size bound even when n <= remaining (the old clamp
    # missed this): count 3 doubles (24 B) with only 8 B present
    w2 = avro_py._Writer()
    w2.write_long(3)
    w2.buf.write(b"\x00" * 8)
    with pytest.raises((ValueError, EOFError)):
        avro_py.decode(w2.buf.getvalue(),
                       {"type": "array", "items": "double"})
    # random garbage bodies: documented exceptions only
    import random
    rng = random.Random(13)
    for _ in range(500):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 24)))
        try:
            avro_py.decode(blob, schema)
        except (ValueError, EOFError, UnicodeDecodeError):
            pass
