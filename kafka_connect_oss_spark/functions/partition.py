"""Partition-encoding expressions (SURVEY.md §2 P2-P5).

The reference's partitioners compute a directory-path fragment per record
("encodedPartition"); here each is a Column expression so Catalyst can fold
it into the scan projection and `partitionBy` can prune on it at read time.

reference: partitioner surface OSSSinkConnectorConfiguration.java:110-118;
timestamp extraction TopicPartitionWriter.java:186-191; path assembly
TopicPartitionWriter.java:256-285.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Joda-style tokens used in the reference's path.format (README.md:172-179)
# mapped to Spark datetime patterns. Only tokens the reference README uses.
_JODA_TO_SPARK = {"YYYY": "yyyy", "MM": "MM", "dd": "dd", "HH": "HH", "mm": "mm"}


def default_partition(kafka_partition: Column) -> Column:
    """P2 DefaultPartitioner: encodedPartition = 'partition=' + kafkaPartition
    (reference: README.md:5, TestDataWriterAvro.java:493-496)."""
    return F.concat(F.lit("partition="), kafka_partition.cast("string"))


def field_partition(field: Column, field_name: str) -> Column:
    """P3 FieldPartitioner: encodedPartition = '<name>=<value>'
    (reference: partition.field.name, TestOSSSinkConnectorBase.java:92)."""
    return F.concat(F.lit(field_name + "="), field.cast("string"))


def joda_to_spark_format(path_format: str) -> str:
    """Translate the reference's Joda `path.format` tokens to Spark's."""
    out = path_format
    for joda, spark_tok in _JODA_TO_SPARK.items():
        out = out.replace(joda, spark_tok)
    return out


def time_partition(ts: Column, path_format: str = "yyyy-MM-dd-HH",
                   timezone: str = "UTC") -> Column:
    """P4 TimeBasedPartitioner: encodedPartition = format(extracted ts)
    (reference: README.md:172-179; Hourly/Daily are fixed path formats).

    `ts` must already be the extracted timestamp (see extract_timestamp).
    Timezone conversion mirrors the reference's `timezone` config.
    """
    adjusted = ts if timezone in ("UTC", "Etc/UTC") else F.from_utc_timestamp(ts, timezone)
    return F.date_format(adjusted, path_format)


def hourly_partition(ts: Column, timezone: str = "UTC") -> Column:
    """P4 HourlyPartitioner (path.format=YYYY-MM-dd-HH)."""
    return time_partition(ts, "yyyy-MM-dd-HH", timezone)


def daily_partition(ts: Column, timezone: str = "UTC") -> Column:
    """P4 DailyPartitioner (path.format=YYYY-MM-dd)."""
    return time_partition(ts, "yyyy-MM-dd", timezone)


def duration_bucket(ts: Column, duration_ms: int) -> Column:
    """P4 partition.duration.ms bucketing: floor(epoch_millis / duration).

    Fixed-grid bucket index; at write time it becomes part of the encoded
    partition so each bucket is one directory (reference:
    partition.duration.ms README.md:174).

    Exact integer arithmetic throughout: (x - x % d) / d keeps the division
    an exact multiple, so the double intermediate is lossless even at
    epoch-microsecond magnitudes (~1.7e15 < 2^53) — a plain floor(x / d)
    would be off-by-one near bucket boundaries.
    """
    us = F.unix_micros(ts.cast("timestamp"))
    ms = ((us - us % 1000) / 1000).cast("bigint")
    return ((ms - ms % duration_ms) / duration_ms).cast("bigint")


def extract_timestamp(record_ts: Column | None, field: Column | None,
                      extractor: str = "Record") -> Column:
    """P5 timestamp.extractor = Wallclock | Record | RecordField
    (reference: TopicPartitionWriter.java:74,111-112,186-191; README.md:125
    documents that Wallclock breaks the exactly-once guarantee — mirrored
    here: Wallclock uses current_timestamp() and is non-deterministic).
    """
    if extractor == "Record":
        assert record_ts is not None
        return record_ts
    if extractor == "RecordField":
        assert field is not None
        return field.cast("timestamp")
    if extractor == "Wallclock":
        return F.current_timestamp()
    raise ValueError(f"unknown timestamp.extractor {extractor!r}")
