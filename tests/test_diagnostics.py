"""Skew diagnostics: the measuring half (skew_report) against Python
goldens, and the applying half (salted_agg) against the plain shuffle's
answer."""

import math

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators.diagnostics import (salted_agg,
                                                           skew_report)
from kafka_connect_oss_spark.sources.batch import load_table


def _skewed(docs):
    return docs.withColumn(
        "k", F.when(F.col("doc_id") % 2 == 0, F.lit("hot"))
        .otherwise(F.col("doc_id").cast("string")))


def test_skew_report_matches_python_golden(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    df = _skewed(docs)
    top, s = skew_report(df, ["k"], top_k=5)
    rows = top.collect()

    from collections import Counter
    counts = Counter("hot" if r.doc_id % 2 == 0 else str(r.doc_id)
                     for r in docs.select("doc_id").collect())
    total, n_keys = sum(counts.values()), len(counts)
    hot_n = counts["hot"]
    assert s["n_rows"] == total and s["n_keys"] == n_keys
    assert s["max_key_rows"] == hot_n
    assert abs(s["mean_key_rows"] - total / n_keys) < 1e-9
    assert abs(s["skew_factor"] - hot_n / (total / n_keys)) < 1e-9

    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part_rows = max(1.0, total / parts)
    assert s["hot_keys"] == sum(1 for c in counts.values()
                                if c > part_rows)
    assert rows[0].k == "hot" and rows[0].n_rows == hot_n
    assert abs(rows[0].share - hot_n / total) < 1e-12
    assert rows[0].recommended_salt == math.ceil(hot_n / part_rows)
    # every other key fits one partition -> no salting recommended
    assert all(r.recommended_salt == 1 for r in rows[1:])
    # top-k is TakeOrdered, never a global sort of the key frame
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_salted_agg_equals_plain_shuffle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    df = _skewed(docs)
    got = salted_agg(
        df, ["k"], F.col("doc_id"), 8,
        aggs=[F.count(F.lit(1)).alias("_n"),
              F.sum(F.length("text")).alias("_s")],
        final_aggs=[F.sum("_n").alias("n"),
                    (F.sum("_s") / F.sum("_n")).alias("avg_len")])
    want = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.length("text")).alias("avg_len"))
    g = {r.k: (r.n, round(r.avg_len, 9)) for r in got.collect()}
    w = {r.k: (r.n, round(r.avg_len, 9)) for r in want.collect()}
    assert g == w
