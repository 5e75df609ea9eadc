"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over kafka_connect_oss_spark.registry — the engine package owns
the operator implementations (SURVEY.md §2); this module exposes them in the
driver's (queries / oracle_sql / entry) shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import kafka_connect_oss_spark.registry_llm  # noqa: E402,F401 (registers entries)
import kafka_connect_oss_spark.registry_multimodal  # noqa: E402,F401 (registers entries)
import kafka_connect_oss_spark.registry_relational  # noqa: E402,F401 (registers entries)
import kafka_connect_oss_spark.registry_tpch  # noqa: E402,F401 (registers entries)
from kafka_connect_oss_spark.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full ingest plan — SinkRecord envelope -> hourly
    time-partitioning -> rotation -> deterministic offset-named object keys
    (the reference's whole dataflow as one DataFrame query)."""
    return QUERIES["r2_interval_rotation_files"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only check)."""
    return dict(ORACLES)
