"""Avro binary codec + wire framing: byte-pinned fixtures so the
format is verified asymmetrically (not just encode→decode round-trip).
Pinned values come from the Avro 1.x binary-encoding spec examples."""

import struct

import pytest

from omniparser_spark.sources.avro_wire import (
    CHANGE_REGISTRY,
    CHANGE_SCHEMA_V1,
    CHANGE_SCHEMA_V2,
    AvroError,
    decode_value,
    decode_varint,
    decode_wire,
    encode_value,
    encode_varint,
    encode_wire,
    resolve_record,
)


def _enc(schema, value) -> bytes:
    out = bytearray()
    encode_value(schema, value, out)
    return bytes(out)


def test_zigzag_varint_spec_bytes():
    # Avro spec examples: 0->00, -1->01, 1->02, -2->03, 2->04, -64->7f,
    # 64->80 01
    cases = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
             2: b"\x04", -64: b"\x7f", 64: b"\x80\x01"}
    for n, raw in cases.items():
        out = bytearray()
        encode_varint(n, out)
        assert bytes(out) == raw, n
        val, pos = decode_varint(raw, 0)
        assert (val, pos) == (n, len(raw))


def test_string_and_primitives_bytes():
    # "foo" -> 06 66 6f 6f  (length 3 zigzag = 06)
    assert _enc("string", "foo") == b"\x06foo"
    assert _enc("boolean", True) == b"\x01"
    assert _enc("double", 1.0) == struct.pack("<d", 1.0)
    # union ["null","string"]: null -> branch 0 (00); "a" -> 02 02 61
    u = ["null", "string"]
    assert _enc(u, None) == b"\x00"
    assert _enc(u, "a") == b"\x02\x02a"
    assert decode_value(u, b"\x02\x02a", 0) == ("a", 3)


def test_array_and_map_block_format():
    sch = {"type": "array", "items": "long"}
    # [3, 27] -> count 2 (04), 06, 36, terminator 00
    assert _enc(sch, [3, 27]) == b"\x04\x06\x36\x00"
    assert decode_value(sch, b"\x04\x06\x36\x00", 0) == ([3, 27], 4)
    # negative block count with byte-size prefix is spec-legal on read
    blocked = b"\x03\x04\x06\x36\x00"  # count -2, size 2, items, end
    assert decode_value(sch, blocked, 0)[0] == [3, 27]
    msch = {"type": "map", "values": "int"}
    assert decode_value(msch, _enc(msch, {"k": 7}), 0)[0] == {"k": 7}


def test_record_roundtrip_and_resolution():
    rec = {
        "offset": 42, "op": "U", "conv_id": "c9", "turn_idx": 3,
        "role": "user", "text": "hi", "ts_ms": 1700000000000,
    }
    body = _enc(CHANGE_SCHEMA_V1, rec)
    back, pos = decode_value(CHANGE_SCHEMA_V1, body, 0)
    assert pos == len(body) and back == rec
    # v1 writer -> v2 reader: `tool` takes the reader default (None)
    resolved = resolve_record(CHANGE_SCHEMA_V1, CHANGE_SCHEMA_V2, back)
    assert resolved["tool"] is None and resolved["offset"] == 42
    # v2 writer -> v1 reader: writer-only field dropped
    rec2 = dict(rec, tool="search")
    back2, _ = decode_value(CHANGE_SCHEMA_V2, _enc(CHANGE_SCHEMA_V2, rec2), 0)
    narrowed = resolve_record(CHANGE_SCHEMA_V2, CHANGE_SCHEMA_V1, back2)
    assert "tool" not in narrowed


def test_wire_framing_and_errors():
    rec = {"offset": 1, "op": "I", "conv_id": None, "turn_idx": None,
           "role": None, "text": None, "ts_ms": None}
    msg = encode_wire(1, CHANGE_SCHEMA_V1, rec)
    assert msg[0] == 0 and struct.unpack_from(">I", msg, 1)[0] == 1
    out = decode_wire(msg, CHANGE_REGISTRY, CHANGE_SCHEMA_V2)
    assert out["offset"] == 1 and out["tool"] is None
    assert out["_schema_id"] == 1
    with pytest.raises(AvroError, match="bad magic"):
        decode_wire(b"\x01" + msg[1:], CHANGE_REGISTRY, CHANGE_SCHEMA_V2)
    with pytest.raises(AvroError, match="unknown schema id"):
        decode_wire(encode_wire(99, CHANGE_SCHEMA_V1, rec),
                    CHANGE_REGISTRY, CHANGE_SCHEMA_V2)
    with pytest.raises(AvroError, match="trailing"):
        decode_wire(msg + b"\x00", CHANGE_REGISTRY, CHANGE_SCHEMA_V2)
    with pytest.raises(AvroError):
        decode_wire(msg[:-1], CHANGE_REGISTRY, CHANGE_SCHEMA_V2)
    with pytest.raises(AvroError, match="no default"):
        # reader field with no default absent from writer
        reader = {"type": "record", "name": "r",
                  "fields": [{"name": "missing", "type": "string"}]}
        decode_wire(msg, CHANGE_REGISTRY, reader)


def test_decode_avro_wire_dataframe(spark):
    from omniparser_spark.sources.avro_wire import decode_avro_wire

    rows = []
    for i in range(10):
        rec = {"offset": i, "op": "I", "conv_id": f"c{i}", "turn_idx": i,
               "role": "user", "text": f"m{i}", "ts_ms": 1000 + i}
        if i % 3 == 0:
            body = encode_wire(1, CHANGE_SCHEMA_V1,
                               {k: v for k, v in rec.items() if k != "tool"})
        else:
            body = encode_wire(2, CHANGE_SCHEMA_V2, dict(rec, tool="t"))
        if i == 7:
            body = body[:-1]  # truncated -> quarantine
        rows.append((body,))
    df = spark.createDataFrame(rows, "payload binary")
    out = decode_avro_wire(df).collect()
    ok = [r for r in out if r["_ok"]]
    bad = [r for r in out if not r["_ok"]]
    assert len(ok) == 9 and len(bad) == 1
    assert "avro decode failed" in bad[0]["_error"]
    v1 = [r for r in ok if r["schema_id"] == 1]
    assert v1 and all(r["tool"] is None for r in v1)
    assert all(r["tool"] == "t" for r in ok if r["schema_id"] == 2)


def test_avro_frame_format_in_apply_dispatch(spark):
    """register_avro_format plugs framed Avro into the apply loop's
    decode dispatch alongside proto and the text formats: one
    decode_payload pass over a mixed batch, writer->reader resolution
    for v1 frames, shared quarantine gate for corrupt frames."""
    import base64
    import datetime

    from omniparser_spark.sources.avro_wire import (
        CHANGE_SCHEMA_V1,
        CHANGE_SCHEMA_V2,
        encode_wire,
        register_avro_format,
    )
    from omniparser_spark.sources.decoders import decode_payload
    from omniparser_spark.sources.proto_wire import (
        CHANGE_FIELDS as PROTO_FIELDS,
        encode_wire as proto_encode,
        register_proto_format,
    )

    register_avro_format()
    register_proto_format()

    def avro_frame(i, v2=True, corrupt=False):
        rec = {
            "offset": i, "op": "I", "conv_id": f"c{i}", "turn_idx": i,
            "role": "user", "text": f"m{i}", "ts_ms": 1_700_000_000_000,
        }
        if v2:
            rec["tool"] = "search"
            b = encode_wire(2, CHANGE_SCHEMA_V2, rec)
        else:
            b = encode_wire(1, CHANGE_SCHEMA_V1, rec)
        if corrupt:
            b = b"\x7f" + b[1:]
        return base64.b64encode(b).decode("ascii")

    def proto_frame(i):
        rec = {
            "offset": i, "op": "I", "conv_id": f"p{i}", "turn_idx": i,
            "role": "user", "text": f"m{i}", "tool": "",
            "ts_ms": 1_700_000_000_000,
        }
        return base64.b64encode(
            proto_encode(7, PROTO_FIELDS, rec)
        ).decode("ascii")

    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        (0, "I", "avro", avro_frame(0, v2=True), ts, 0),
        (1, "I", "avro", avro_frame(1, v2=False), ts, 0),   # v1 writer
        (2, "I", "avro", avro_frame(2, corrupt=True), ts, 0),
        (3, "I", "proto", proto_frame(3), ts, 0),
        (4, "I", "json",
         '{"conv_id":"c4","turn_idx":4,"role":"user","text":"m4"}', ts, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "offset long, op string, format string, payload string, "
        "ts timestamp, source_part int",
    )
    out = {r.offset: r for r in decode_payload(df).collect()}
    assert out[0]["_ok"] and out[0]["turn"]["tool"] == "search"
    # v1 frame resolves against the v2 reader: tool takes its default
    assert out[1]["_ok"] and out[1]["turn"]["tool"] is None
    assert out[1]["turn"]["ts"] == "2023-11-14T22:13:20+00:00"
    assert not out[2]["_ok"] and out[2]["turn"] is None
    # both frame formats and a text format decode in the same pass
    assert out[3]["_ok"] and out[3]["turn"]["conv_id"] == "p3"
    assert out[4]["_ok"] and out[4]["turn"]["text"] == "m4"
