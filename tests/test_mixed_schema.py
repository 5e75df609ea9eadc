"""Mixed-schema batches through the full decode -> track -> project ->
commit path (operators/evolution.process_mixed_schema_batch) — the mirror
of the reference's alternating-schema scenarios
(TestDataWriterAvro.java:354-437) under BACKWARD / NONE / FORWARD."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_oss_spark.config import PipelineConfig
from kafka_connect_oss_spark.operators.evolution import (
    SchemaTracker, process_mixed_schema_batch)
from kafka_connect_oss_spark.sinks import commit_batch, read_committed
from kafka_connect_oss_spark.streaming.pipeline import encoded_partition_column

SCHEMA_V1 = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.IntegerType()),
])
#: v2 adds a nullable field (backward-compatible; field-addition evolution —
#: cross-file type promotion is valid for projection (is_promotable) but
#: parquet's merge-on-read cannot reconcile it, so committed files keep
#: their written types, like the reference's own add/remove scenarios)
SCHEMA_V2 = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.IntegerType()),
    T.StructField("source", T.StringType(), nullable=True),
])
REGISTRY = {1: SCHEMA_V1, 2: SCHEMA_V2}


def _mixed_batch(spark, n=100):
    """Alternating v1/v2 JSON records in one batch, reference-style; both
    kafka partitions (i % 2) see both schemas (i % 4 flip)."""
    rows = []
    for i in range(n):
        if i % 4 < 2:
            rows.append(("events", i % 2, i // 2, 1,
                         f'{{"event_type":"t{i % 3}","value":{i}}}'))
        else:
            rows.append(("events", i % 2, i // 2, 2,
                         f'{{"event_type":"t{i % 3}","value":{i},'
                         f'"source":"s{i % 2}"}}'))
    df = spark.createDataFrame(
        rows, "topic string, partition int, offset long, schema_id int, "
              "value string")
    return df.withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))


def _writer(cfg):
    return lambda df: commit_batch(df, encoded_partition_column(cfg), cfg)


def test_backward_projects_old_records_onto_new(spark, tmp_path):
    cfg = PipelineConfig(url=str(tmp_path), format="parquet", flush_size=500)
    tracker = SchemaTracker("BACKWARD")
    batch = _mixed_batch(spark)
    keys = process_mixed_schema_batch(batch, REGISTRY, tracker, _writer(cfg))
    assert keys
    back = read_committed(spark, str(tmp_path), cfg)
    assert back.count() == 100
    # v1 group was written before v2 arrived -> v1 shape; v2 group carries
    # the adopted v2 target with source populated
    v2_rows = back.where(F.col("source").isNotNull())
    assert v2_rows.count() == 50
    # tracked target is now v2: replays of v1 records project onto it
    assert [f.name for f in tracker.projection_target("_stream").fields] == \
        ["event_type", "value", "source"]


def test_none_mode_writes_separate_schema_groups(spark, tmp_path):
    cfg = PipelineConfig(url=str(tmp_path), format="json", flush_size=500)
    tracker = SchemaTracker("NONE")
    keys = process_mixed_schema_batch(_mixed_batch(spark), REGISTRY, tracker,
                                      _writer(cfg))
    # one file set per schema group per partition (deviation note: the
    # reference cuts per record flip; grouping cuts per schema group)
    assert len(keys) == 4  # 2 schema groups x 2 kafka partitions
    back = read_committed(spark, str(tmp_path), cfg)
    assert back.count() == 100


def test_forward_keeps_oldest_schema(spark, tmp_path):
    cfg = PipelineConfig(url=str(tmp_path), format="parquet", flush_size=500)
    tracker = SchemaTracker("FORWARD")
    process_mixed_schema_batch(_mixed_batch(spark), REGISTRY, tracker,
                               _writer(cfg))
    back = read_committed(spark, str(tmp_path), cfg)
    # every record projected onto v1: no `source` column survives
    assert sorted(c for c in back.columns if c in ("event_type", "value",
                                                   "source")) == \
        ["event_type", "value"]
    assert back.count() == 100


def test_replayed_batch_is_idempotent(spark, tmp_path):
    cfg = PipelineConfig(url=str(tmp_path), format="json", flush_size=500)
    batch = _mixed_batch(spark)
    k1 = process_mixed_schema_batch(batch, REGISTRY, SchemaTracker("BACKWARD"),
                                    _writer(cfg))
    k2 = process_mixed_schema_batch(batch, REGISTRY, SchemaTracker("BACKWARD"),
                                    _writer(cfg))
    assert k1 == k2  # deterministic keys -> byte-identical re-upload
    assert read_committed(spark, str(tmp_path), cfg).count() == 100
