"""Record routing (SURVEY.md §2 P1, C2, C3 batch forms).

reference: OSSSinkTask.java:161-166 routes each SinkRecord to the
TopicPartitionWriter for its (topic, kafkaPartition). In Spark the Kafka
source already delivers one DataFrame partition per TopicPartition, so
routing is a groupBy that needs no extra shuffle when the grouping key is
the source partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route_summary(records: DataFrame) -> DataFrame:
    """P1: per-(topic, partition) delivery summary — what each
    TopicPartitionWriter would have seen (buffer FIFO = offset order)."""
    return records.groupBy("topic", "partition").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.min("offset").alias("first_offset"),
        F.max("offset").alias("last_offset"),
        F.countDistinct("event_type").alias("n_event_types"),
    )
