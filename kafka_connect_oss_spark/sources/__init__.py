"""Sources (SURVEY.md §2 S1-S2): Kafka stream, file-stream stand-in, batch tables."""

from kafka_connect_oss_spark.sources.batch import TABLES, load_table, sink_records

__all__ = ["TABLES", "load_table", "sink_records"]
