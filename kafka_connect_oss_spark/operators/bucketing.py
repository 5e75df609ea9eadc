"""Bucketed-table layout: co-located joins without a shuffle.

At 100 TB the biggest recurring cost of the analytics surface is the
shuffle under every fact-fact join/aggregation on a shared key (user_id,
doc_id, orderkey). Spark's bucketed tables pre-hash-partition data ON DISK
(`bucketBy(n, key)` + `saveAsTable`), so every later join or aggregation
keyed on the bucket columns reads co-located buckets and skips the
Exchange entirely — the write-once/join-many trade every warehouse makes.
`tests/test_bucketing.py` pins the contract: a bucketed fact-fact join
plans with ZERO Exchange nodes.

Mechanics that matter at scale:

* n_buckets is fixed at write time — size it so bucket ~ HDFS-block/
  executor-memory scale at the target SF (buckets too few = giant tasks,
  too many = small files).
* both sides must be bucketed by the SAME columns into the SAME bucket
  count for the co-located join.
* `sortBy` within buckets additionally removes the Sort under
  SortMergeJoin (write-time sort, read-time merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist `df` as a parquet table bucketed by `bucket_cols`.

    Joins/aggregations keyed on `bucket_cols` against any table bucketed
    the same way then plan without an Exchange (verified by the plan test).
    """
    w = (df.write.mode(mode).format("parquet")
         .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def table_n_buckets(spark: SparkSession, table: str) -> int:
    """Bucket count of an existing bucketed table (from the catalog).

    Appends to a bucketed table must re-declare the identical spec;
    reading the count from the catalog instead of trusting the caller
    removes the mismatched-n_buckets footgun from incremental folds.
    """
    for row in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if row.col_name.strip() == "Num Buckets":
            return int(row.data_type)
    raise ValueError(f"{table} is not bucketed")


def ensure_database(spark: SparkSession, name: str, location: str) -> None:
    """Create (if absent) a database whose tables live under `location` —
    keeps bucketed-table storage off the default warehouse path."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} "
              f"LOCATION '{location}'")
