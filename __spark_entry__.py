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


#: The driver's CORRECTNESS artifact samples the FIRST 50 queries in
#: queries() dict order. This list curates that window deliberately
#: (the round-2 lesson: new registrations silently evicted checked
#: queries). Priority: (1) queries that have never had a driver row
#: (the round-2 TPC-H/asof/funnel additions), (2) queries whose
#: implementation changed this round (old green rows no longer attest
#: current code), (3) new round-3 registrations, (4) §2-mapped core
#: operators for continuity. Entries with two rounds of green history
#: (llm/multimodal narrow queries) rotate out; tests/test_driver_window.py
#: pins the invariants.
DRIVER_WINDOW: list[str] = [
    # (1) never driver-checked before round 3
    "q4_order_priority", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q12_late_shipment_priority", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier",
    "q16_parts_supplier_relationship", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_discounted_revenue",
    "q20_dominant_suppliers", "q22_dormant_customers",
    "asof_purchase_attribution", "range_join_purchase_errors",
    "events_signup_funnel", "events_value_percentiles_sampled",
    "events_hourly_rollup_approx", "events_rollup_day_type",
    "orders_without_recent_lineitems",
    # (2) implementation changed in round 3
    "corpus_curated", "corpus_decontaminated", "corpus_mixture_sample",
    "dedup_cleaned_corpus", "sketch_distinct_users_kmv", "dedup_clusters",
    "dedup_multi_signal",
    # (4) §2-mapped core, green continuity
    "p1_route_topicpartition", "c2_offsets_to_commit",
    "p3_field_partitioner", "p4_hourly_partitioner", "p4_duration_bucket",
    "r1_size_rotation_files", "r2_interval_rotation_files",
    "r1_interleaved_commit_files", "r2_anchored_rotation_files",
    "r3_partition_change_rotation", "r4_scheduled_rotation",
    "e2_schema_projection", "e4_protobuf_decode", "e6_json_encode",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    driver's 50-query sample window is the curated DRIVER_WINDOW set."""
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in DRIVER_WINDOW:
        ordered[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only check)."""
    return dict(ORACLES)
