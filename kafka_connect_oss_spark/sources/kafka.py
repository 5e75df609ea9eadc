"""Kafka streaming source (SURVEY.md §2 S1, C3).

reference: the Connect framework polls and hands batches to
OSSSinkTask.put (OSSSinkTask.java:160-175); Spark's Kafka source replaces
the framework: one DataFrame partition per TopicPartition, offsets managed
by the checkpoint (C2), backpressure via maxOffsetsPerTrigger (C3 — the
pause/resume analog), rebalance handled internally (C5).

Requires the spark-sql-kafka package on the classpath; this module only
builds the plan, so environments without a broker can still import it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_oss_spark.config import PipelineConfig


def kafka_stream(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """readStream from Kafka -> SinkRecord envelope (FIXTURES.md F-1 shape:
    topic, partition, offset, ts, key, value)."""
    if not cfg.kafka_bootstrap_servers:
        raise ValueError("kafka_bootstrap_servers not configured")
    reader = (spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", cfg.kafka_bootstrap_servers)
              .option("subscribe", ",".join(cfg.topics))
              .option("startingOffsets", "earliest"))
    if cfg.max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger",
                               str(cfg.max_offsets_per_trigger))
    raw = reader.load()
    # Kafka's `timestamp` column is the Record timestamp (P5 extractor
    # Record); RecordField extraction happens post-decode in the pipeline.
    return raw.select(
        F.col("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("bigint").alias("offset"),
        F.col("timestamp").alias("ts"),
        F.col("key").cast("string").alias("key"),
        F.col("value"),
    )
