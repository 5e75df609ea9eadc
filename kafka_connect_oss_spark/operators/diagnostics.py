"""Shuffle-skew diagnostics: measure BEFORE salting.

The scale notes throughout this package say "skewed keys -> salting or
AQE skew-join"; this is the measuring half of that advice — a pre-flight
a pipeline runs on its join/agg keys before committing a 100 TB shuffle,
the Spark-side analog of the partition-balance visibility the reference
gets for free from Kafka's partition lag metrics (its parallelism unit,
OSSSinkTask.java per-TopicPartition writers).

One groupBy (map-side combined, the same shuffle shape the real job
would run but carrying one count per key instead of the payload), staged
once, feeding two bounded consumers: a keys-sized summary aggregate and
a TakeOrdered top-k. No global sort, no window over the key frame.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators.lifecycle import stage_local


def skew_report(df: DataFrame, cols: list[str],
                top_k: int = 20) -> tuple[DataFrame, dict]:
    """Heavy-hitter report for a prospective shuffle on ``cols``.

    Returns ``(top, summary)``:

    * ``top`` — the ``top_k`` heaviest keys as a DataFrame
      (cols..., n_rows, share, recommended_salt). ``recommended_salt``
      is the classic heuristic: how many ways this key must split so
      each piece is no larger than an average shuffle partition
      (ceil(n_rows / (total / spark.sql.shuffle.partitions))); 1 means
      the key needs no salting. Plan shape: orderBy+limit plans as
      TakeOrderedAndProject — k rows to the driver, never a sort of
      the key frame.
    * ``summary`` — {"n_rows","n_keys","max_key_rows","mean_key_rows",
      "p50_key_rows","p99_key_rows","skew_factor"(max/mean),
      "hot_keys"(count of keys above one average partition)} — the
      go/no-go numbers: skew_factor ~1 and hot_keys 0 mean the plain
      shuffle is fine; a four-digit skew_factor means salt (or rely on
      AQE skew-join, which splits oversized partitions at runtime but
      cannot split a single oversized KEY — only salting can).

    Diagnostic posture: the key frame is keys-sized (not corpus-sized)
    and is staged once for both consumers; driver-side data is the
    summary row + k rows, bounded.
    """
    shuffle_parts = int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"))
    g = stage_local(df.groupBy(*cols).agg(
        F.count(F.lit(1)).alias("n_rows")))
    s = g.agg(
        F.sum("n_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n_rows").alias("max_key_rows"),
        F.avg("n_rows").alias("mean_key_rows"),
        F.expr("percentile_approx(n_rows, 0.5)").alias("p50_key_rows"),
        F.expr("percentile_approx(n_rows, 0.99)").alias("p99_key_rows"),
    ).collect()[0].asDict()
    part_rows = max(1.0, s["n_rows"] / shuffle_parts)
    s["skew_factor"] = (s["max_key_rows"] / s["mean_key_rows"]
                        if s["mean_key_rows"] else 0.0)
    s["hot_keys"] = g.where(F.col("n_rows") > part_rows).count()
    top = (g.orderBy(F.desc("n_rows"), *cols).limit(top_k)
           .withColumn("share", F.col("n_rows") / F.lit(s["n_rows"]))
           .withColumn("recommended_salt",
                       F.greatest(F.lit(1), F.ceil(
                           F.col("n_rows") / F.lit(part_rows))
                           .cast("int"))))
    return top, s


def salted_agg(df: DataFrame, key_cols: list[str], salt_col,
               salt_factor: int, aggs: list, final_aggs: list) -> DataFrame:
    """The applying half of the report: two-phase salted aggregation —
    groupBy(key, salt) with ``aggs``, then groupBy(key) with
    ``final_aggs`` over the partials. The salt comes from hashing
    ``salt_col`` (any high-cardinality column, e.g. the row id), so the
    hot key's rows spread over ``salt_factor`` reducers and no single
    reducer holds more than ~max_key_rows/salt_factor; the final phase
    touches n_keys x salt_factor rows only, both phases map-side
    combined. Correct for decomposable aggregates (count/sum/min/max,
    and avg via sum+count split across the two phases — the caller
    writes the decomposition, this owns only the shuffle shape)."""
    salt = F.pmod(F.xxhash64(salt_col), F.lit(salt_factor)).alias("_salt")
    partial = df.groupBy(*key_cols, salt).agg(*aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)
