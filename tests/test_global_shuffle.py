"""Deterministic global shuffle for training order (packing.global_shuffle):
DuckDB-oracle parity (the driver-gate contract via tests/parity.compare),
permutation totality, seed sensitivity, and partitioning-independence."""

import duckdb

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators.packing import (
    global_shuffle, global_shuffle_oracle_sql)
from kafka_connect_oss_spark.sources.batch import load_table
from tests.parity import compare


def test_duckdb_parity_real_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    compare(global_shuffle(docs, seed=7, n_shards=16), con,
            global_shuffle_oracle_sql("documents", seed=7, n_shards=16),
            "global_shuffle")


def test_is_total_permutation(spark, sf_dir):
    """Every doc appears exactly once; within each shard pos is exactly
    1..shard_size (no gaps, no ties lost)."""
    docs = load_table(spark, sf_dir, "documents")
    out = global_shuffle(docs, seed=3, n_shards=8)
    assert out.count() == docs.count()
    bad = (out.groupBy("shard")
           .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"),
                F.min("pos").alias("mn"),
                F.countDistinct("pos").alias("dp"))
           .where((F.col("mx") != F.col("n")) | (F.col("mn") != 1)
                  | (F.col("dp") != F.col("n"))).count())
    assert bad == 0


def test_seed_changes_order_and_same_seed_is_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {(r.doc_id): (r.shard, r.pos)
         for r in global_shuffle(docs, seed=1).select(
             "doc_id", "shard", "pos").collect()}
    b = {(r.doc_id): (r.shard, r.pos)
         for r in global_shuffle(docs, seed=2).select(
             "doc_id", "shard", "pos").collect()}
    a2 = {(r.doc_id): (r.shard, r.pos)
          for r in global_shuffle(docs.repartition(13), seed=1).select(
              "doc_id", "shard", "pos").collect()}
    assert a == a2, "same seed must be partitioning-independent"
    assert a != b, "different seeds must permute differently"
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > len(a) * 0.9, "a seed change should move nearly all rows"


def test_plan_is_one_exchange_per_shard_sort(spark, sf_dir):
    """No global sort / range partitioning: the only Exchange is the hash
    partitioning on shard feeding the window sort."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (global_shuffle(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "rangepartitioning" not in plan.lower()
    assert plan.count("Exchange") == 1
    assert "Window" in plan
