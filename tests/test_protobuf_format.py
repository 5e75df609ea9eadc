"""E4 protobuf wire codec: golden bytes pinned against the public encoding
spec, TestMessage (src/main/proto/parquet.proto:1-13) roundtrips, presence
semantics, unknown-field skipping, and the Spark pandas-UDF path."""

from kafka_connect_oss_spark.formats.protobuf_py import (TEST_MESSAGE_SPEC,
                                                         ProtoField,
                                                         decode_message,
                                                         encode_message)


def test_golden_wire_bytes():
    # examples straight from the protobuf encoding guide
    assert encode_message(TEST_MESSAGE_SPEC, {"boolean": True}) == b"\x08\x01"
    assert encode_message(TEST_MESSAGE_SPEC, {"int": 1}) == b"\x10\x01"
    assert encode_message(TEST_MESSAGE_SPEC, {"long": 150}) == b"\x18\x96\x01"
    assert encode_message(
        TEST_MESSAGE_SPEC, {"list1": ["testing"]}) == b"\x42\x07testing"
    assert encode_message(
        TEST_MESSAGE_SPEC, {"map1": {"a": "b"}}) == b"\x32\x06\x0a\x01a\x12\x01b"


def test_negative_ints_sign_extended():
    # negative int32/int64 encode as 10-byte two's-complement varints
    for n in (-1, -2, -2147483648):
        data = encode_message(TEST_MESSAGE_SPEC, {"int": n})
        assert decode_message(TEST_MESSAGE_SPEC, data)["int"] == n
    data = encode_message(TEST_MESSAGE_SPEC, {"long": -(1 << 62)})
    assert decode_message(TEST_MESSAGE_SPEC, data)["long"] == -(1 << 62)


def test_full_testmessage_roundtrip():
    msg = {"boolean": False, "int": 42, "long": 1 << 40, "float": 0.25,
           "double": -3.5, "map1": {"k€y": "välue", "": ""},
           "map2": {}, "list1": ["a", "", "ü"], "list2": []}
    out = decode_message(TEST_MESSAGE_SPEC, encode_message(TEST_MESSAGE_SPEC,
                                                           msg))
    assert out["boolean"] is False and out["int"] == 42
    assert out["long"] == 1 << 40
    assert out["float"] == 0.25 and out["double"] == -3.5
    assert out["map1"] == {"k€y": "välue", "": ""}
    assert out["map2"] == {} and out["list2"] == []
    assert out["list1"] == ["a", "", "ü"]


def test_presence_semantics():
    # unset optionals -> None; unset repeated/map -> empty containers
    out = decode_message(TEST_MESSAGE_SPEC,
                         encode_message(TEST_MESSAGE_SPEC, {}))
    assert out["boolean"] is None and out["int"] is None
    assert out["float"] is None and out["double"] is None
    assert out["map1"] == {} and out["list1"] == []


def test_unknown_fields_skipped():
    # a decoder built against an older spec must skip newer fields
    newer = TEST_MESSAGE_SPEC + (ProtoField(15, "extra", "string"),)
    data = encode_message(newer, {"int": 7, "extra": "future"})
    out = decode_message(TEST_MESSAGE_SPEC, data)
    assert out["int"] == 7 and "extra" not in out


def test_packed_repeated_decode():
    # proto3 scalars default to packed encoding — decoder must accept both
    spec = (ProtoField(1, "xs", "int32", repeated=True),)
    packed = bytearray()
    packed += b"\x0a"                      # field 1, wire type 2
    payload = b"\x01\x02\x96\x01"          # varints 1, 2, 150
    packed += bytes([len(payload)]) + payload
    assert decode_message(spec, bytes(packed))["xs"] == [1, 2, 150]


def test_spark_pandas_udf_roundtrip(spark, sf_dir):
    import pyspark.sql.functions as F

    from kafka_connect_oss_spark.formats import protobuf_py
    from kafka_connect_oss_spark.shipping import ensure_package_on_executors
    from kafka_connect_oss_spark.sources.batch import load_table

    ensure_package_on_executors(spark)
    ev = load_table(spark, sf_dir, "events").limit(200)
    msg = ev.select(
        "event_id",
        F.struct(
            (F.col("event_id") % 2 == 0).alias("boolean"),
            (F.col("event_id") % 1000).cast("int").alias("int"),
            F.col("event_id").alias("long"),
            F.col("value").cast("float").alias("float"),
            F.col("value").alias("double"),
            F.create_map(F.lit("et"), F.col("event_type")).alias("map1"),
            F.create_map(F.lit("u"), F.col("user_id").cast("string"))
            .alias("map2"),
            F.array(F.col("event_type")).alias("list1"),
            F.array(F.lit("x"), F.col("event_type")).alias("list2"),
        ).alias("msg"))
    enc = protobuf_py.proto_encode_col(protobuf_py.TEST_MESSAGE_SPEC)
    dec = protobuf_py.proto_decode_col(protobuf_py.TEST_MESSAGE_SPEC)
    decoded = msg.select(
        "event_id", F.col("msg").alias("orig"),
        dec(enc(F.col("msg"))).alias("d"))
    bad = decoded.where(
        (F.col("d.boolean") != F.col("orig.boolean"))
        | (F.col("d.int") != F.col("orig.int"))
        | (F.col("d.long") != F.col("orig.long"))
        | (F.col("d.double") != F.col("orig.double"))
        | (F.element_at("d.map1", "et") != F.element_at("orig.map1", "et"))
        | (F.element_at("d.list1", 1) != F.element_at("orig.list1", 1))
        | (F.element_at("d.list2", 2) != F.element_at("orig.list2", 2)))
    assert bad.count() == 0
    assert decoded.count() == 200
