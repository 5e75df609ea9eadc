"""Bucketed co-located joins: the write-once/join-many layout for 100 TB
fact-fact keys (operators/bucketing.py). The whole point is the ABSENCE of
Exchange under joins/aggregations keyed on the bucket columns — pinned
here against the same-key join, the aggregation, and the values."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import bucketing as B
from kafka_connect_oss_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdemo")
    B.ensure_database(spark, "bucketdemo", str(loc))
    ev = load_table(spark, sf_dir, "events")
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "value"))
    clicks = (ev.where(F.col("event_type") == "click")
              .select("user_id", "ts"))
    B.write_bucketed(purchases, "bucketdemo.purchases", ["user_id"],
                     n_buckets=8)
    B.write_bucketed(clicks, "bucketdemo.clicks", ["user_id"], n_buckets=8)
    yield "bucketdemo.purchases", "bucketdemo.clicks", purchases, clicks
    spark.sql("DROP DATABASE bucketdemo CASCADE")


def test_bucketed_fact_fact_join_has_no_exchange(spark, bucketed_tables):
    tp, tc, _, _ = bucketed_tables
    # the 100 TB regime is two fact tables neither of which broadcasts;
    # at test scale Spark would auto-broadcast the tiny side, hiding the
    # co-located-bucket path this test exists to pin
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p, c = spark.table(tp), spark.table(tc)
        joined = (p.join(c, "user_id")
                  .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    tp, _, _, _ = bucketed_tables
    agg = (spark.table(tp).groupBy("user_id")
           .agg(F.sum("value").alias("total")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_values_match_unbucketed(spark, bucketed_tables):
    tp, tc, purchases, clicks = bucketed_tables
    got = {tuple(r) for r in
           (spark.table(tp).join(spark.table(tc), "user_id")
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
            .collect())}
    want = {tuple(r) for r in
            (purchases.join(clicks, "user_id")
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
             .collect())}
    assert got == want


def test_partitioned_write_prunes_at_scan(spark, sf_dir, tmp_path):
    # write-time partitionBy(lang) -> read-time predicate becomes a
    # PartitionFilter: non-matching directories are never opened (the
    # layout corpus_split_assign's docstring prescribes for split columns)
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").parquet(out)
    filtered = spark.read.parquet(out).where(F.col("lang") == "en")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters", 1)[1][:200], plan
    assert filtered.count() == docs.where(F.col("lang") == "en").count()
