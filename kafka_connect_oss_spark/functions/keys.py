"""Object-key (file name) generation (SURVEY.md §2 P6, C1).

reference: TopicPartitionWriter.java:268-285 —
  <topics.dir>/<topic>/<encodedPartition>/<topic>+<kafkaPartition>+<zero-padded
  startOffset><extension>
with ZERO_PAD_FMT "%0{width}d" (FILENAME_OFFSET_ZERO_PAD_WIDTH_CONFIG,
example key README.md:270-271: topics/test/2019-06-12-16/test+0+0000154000.parquet).

Pure column expressions: the key is derived from (topic, partition,
startOffset) only, which is what makes re-uploads deterministic
(README.md:119-125) — same records => same keys => idempotent overwrite.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zero_pad(offset: Column, width: int = 10) -> Column:
    """'%010d'-style zero padding (TopicPartitionWriter.java:272-274).

    Uses format_string (Java String.format semantics: pads but NEVER
    truncates) rather than lpad, which would truncate offsets wider than
    `width` and collapse distinct files onto one object key.
    """
    return F.format_string(f"%0{width}d", offset.cast("long"))


def object_key(topic: Column, kafka_partition: Column, start_offset: Column,
               encoded_partition: Column, extension: str,
               topics_dir: str = "topics", zero_pad_width: int = 10) -> Column:
    """Full object key for one committed file."""
    return F.concat(
        F.lit(topics_dir + "/"), topic, F.lit("/"), encoded_partition, F.lit("/"),
        topic, F.lit("+"), kafka_partition.cast("string"), F.lit("+"),
        zero_pad(start_offset, zero_pad_width), F.lit(extension),
    )
