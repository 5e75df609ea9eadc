"""TIMESTAMP_NTZ regression coverage (the round-3 environment shift).

PySpark 4.x reads parquet ``timestamp[us]`` columns with
isAdjustedToUTC=false as ``TimestampNTZType``; reference semantics are
timezone-less epoch millis (TopicPartitionWriter.java:186-191), which the
engine carries as ``TimestampType`` under a pinned-UTC session. These tests
pin the normalization boundary (sources/batch.normalize_timestamps) and the
Avro sink's handling of an NTZ-typed input, mirroring the timestamp
coverage of TestDataWriterAvro.java:110-188.
"""

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_oss_spark.config import PipelineConfig
from kafka_connect_oss_spark.functions import partition as P
from kafka_connect_oss_spark.sinks import commit_batch, read_committed
from kafka_connect_oss_spark.sources.batch import load_table, normalize_timestamps


def _ntz_frame(spark, n=40):
    rows = [("events", o % 2, o, o,
             datetime(2024, 3, 1 + o % 28, 7, o % 60, 30, 250_000))
            for o in range(n)]
    schema = T.StructType([
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampNTZType(), True),
    ])
    return spark.createDataFrame(rows, schema)


def test_load_table_yields_timestamp_not_ntz(spark, sf_dir):
    for name, col in (("events", "ts"), ("orders", "o_orderdate"),
                      ("lineitem", "l_shipdate")):
        df = load_table(spark, sf_dir, name)
        assert df.schema[col].dataType == T.TimestampType(), (name, col)


def test_normalize_timestamps_is_value_preserving(spark):
    ntz = _ntz_frame(spark)
    norm = normalize_timestamps(ntz)
    assert norm.schema["ts"].dataType == T.TimestampType()
    # under the UTC session the wall values are identical
    a = [r.ts for r in ntz.orderBy("offset").collect()]
    b = [r.ts for r in norm.orderBy("offset").collect()]
    assert a == b


def test_avro_roundtrip_ntz_input(spark, tmp_path):
    # an NTZ-typed frame pushed straight into the avro sink must encode as
    # timestamp-micros and read back with identical wall values
    # (TestDataWriterAvro.java:110-188 timestamp case, NTZ flavor)
    df = _ntz_frame(spark)
    cfg = PipelineConfig(url=str(tmp_path / "out"), format="avro",
                         flush_size=20)
    keys = commit_batch(df, P.default_partition(F.col("partition")), cfg)
    assert keys and all(k.endswith(".avro") for k in keys)
    back = read_committed(spark, cfg.url, cfg)
    a = sorted((r.offset, r.ts) for r in df.collect())
    b = sorted((r.offset, r.ts) for r in back.collect())
    assert a == b


def test_epoch_functions_accept_normalized_tables(spark, sf_dir):
    # the exact expression class that regressed in round 3
    ev = load_table(spark, sf_dir, "events").limit(10)
    out = ev.select(F.unix_micros("ts").alias("us"),
                    F.unix_millis("ts").alias("ms")).collect()
    assert all(r.us // 1000 == r.ms for r in out)
