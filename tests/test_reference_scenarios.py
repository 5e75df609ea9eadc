"""Mirrors of reference test scenarios not covered elsewhere (SURVEY.md §5):
non-zero start offsets (TestDataWriterAvro.java:110-188), enum/union
encoding (TestDataWriterAvro.java:190-224,538-604), the §1.3 type table
through a parquet round-trip (TestDataWriterParquetJson.java:88-161), and
version reporting (TestOSSSinkConnector.java:31-43)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import kafka_connect_oss_spark
from kafka_connect_oss_spark.config import PipelineConfig
from kafka_connect_oss_spark.functions import partition as P
from kafka_connect_oss_spark.sinks import commit_batch, read_committed
from kafka_connect_oss_spark.sources.batch import sink_records


def test_nonzero_start_offsets(spark, sf_dir, tmp_path):
    # consuming from the middle of a topic: object keys must carry the
    # true (shifted) start offsets, zero-padded
    cfg = PipelineConfig(url=str(tmp_path), format="json", flush_size=500)
    rec = sink_records(spark, sf_dir).withColumn(
        "offset", F.col("offset") + 154_000)
    keys = commit_batch(rec, P.default_partition(F.col("partition")), cfg)
    starts = sorted(int(k.rsplit("+", 1)[-1].split(".")[0]) for k in keys)
    assert starts[0] == 154_000
    assert all(s >= 154_000 for s in starts)
    assert all(k.rsplit("+", 1)[-1].split(".")[0].rjust(10, "0") in k
               for k in keys)
    back = read_committed(spark, str(tmp_path), cfg)
    assert back.agg(F.min("offset")).first()[0] == 154_000


def test_enum_union_as_struct_of_nullables(spark, tmp_path):
    # Avro enum -> string with a closed value set; union of branches ->
    # struct of nullable fields with exactly one branch set (one-of)
    enum_values = ("RED", "GREEN", "BLUE")
    rows = []
    for i in range(90):
        color = enum_values[i % 3]
        branch_int = i if i % 2 == 0 else None
        branch_str = f"s{i}" if i % 2 == 1 else None
        rows.append(("events", i % 2, i // 2, color, branch_int, branch_str))
    df = spark.createDataFrame(
        rows, "topic string, partition int, offset long, color string, "
              "u_int int, u_str string"
    ).withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp")) \
     .withColumn("u", F.struct("u_int", "u_str")).drop("u_int", "u_str")

    cfg = PipelineConfig(url=str(tmp_path), format="parquet", flush_size=100)
    commit_batch(df, P.default_partition(F.col("partition")), cfg)
    back = read_committed(spark, str(tmp_path), cfg)
    assert back.count() == 90
    # enum: closed value set round-trips
    assert {r.color for r in back.select("color").distinct().collect()} == \
        set(enum_values)
    # union: exactly one branch set per record (value-level equality,
    # SURVEY §7.4 #4)
    bad = back.where(
        (F.col("u.u_int").isNotNull() & F.col("u.u_str").isNotNull())
        | (F.col("u.u_int").isNull() & F.col("u.u_str").isNull()))
    assert bad.count() == 0


def test_type_table_roundtrip(spark, tmp_path):
    # SURVEY §1.3: boolean/int32/int64/float32/float64/string/bytes/
    # map<string,string>/array<string>/nested struct/nullables
    schema = T.StructType([
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("i32", T.IntegerType()),
        T.StructField("i64", T.LongType()),
        T.StructField("f32", T.FloatType()),
        T.StructField("f64", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("raw", T.BinaryType()),
        T.StructField("m", T.MapType(T.StringType(), T.StringType())),
        T.StructField("arr", T.ArrayType(T.StringType())),
        T.StructField("nested", T.StructType([
            T.StructField("inner", T.StructType([
                T.StructField("x", T.LongType())])),
            T.StructField("y", T.StringType(), nullable=True)])),
        T.StructField("opt", T.LongType(), nullable=True),
    ])
    rows = [("events", i % 2, i // 2, i % 2 == 0, i, i * 10, float(i) / 2,
             float(i) / 3, f"s{i}", bytes([i % 256, 255]),
             {"k": f"v{i}"}, [f"a{i}", "z"], ((i,), None if i % 3 else "y"),
             None if i % 5 == 0 else i)
            for i in range(60)]
    df = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    cfg = PipelineConfig(url=str(tmp_path), format="parquet", flush_size=100)
    commit_batch(df, P.default_partition(F.col("partition")), cfg)
    back = read_committed(spark, str(tmp_path), cfg)
    assert back.count() == 60
    got = {r.offset: r for r in back.where(F.col("partition") == 0).collect()}
    src = {r.offset: r for r in df.where(F.col("partition") == 0).collect()}
    for o, s in src.items():
        g = got[o]
        assert (g.b, g.i32, g.i64, g.s) == (s.b, s.i32, s.i64, s.s)
        assert bytes(g.raw) == bytes(s.raw)
        assert g.m == s.m and g.arr == s.arr
        assert g.nested.inner.x == s.nested.inner.x
        assert g.nested.y == s.nested.y and g.opt == s.opt
        assert abs(g.f32 - s.f32) < 1e-6 and g.f64 == s.f64


def test_version_reported():
    assert kafka_connect_oss_spark.__version__


def test_interleaved_multipartition_offsets(spark, sf_dir, tmp_path):
    # interleaved writes across partitions: per-partition offset sequences
    # stay independent and contiguous across committed files
    cfg = PipelineConfig(url=str(tmp_path), format="json", flush_size=137)
    rec = sink_records(spark, sf_dir)
    commit_batch(rec, P.default_partition(F.col("partition")), cfg)
    back = read_committed(spark, str(tmp_path), cfg)
    per_part = (back.groupBy("partition")
                .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"),
                     F.count(F.lit(1)).alias("n"),
                     F.countDistinct("offset").alias("nd")).collect())
    for r in per_part:
        assert r.lo == 0 and r.n == r.nd == r.hi + 1  # dense, no gaps/dupes
