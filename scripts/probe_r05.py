#!/usr/bin/env python
"""Round-5 scale probe for the two operators whose blocking/join strategy
changed this round (VERDICT r04 "What's wrong" items 1-2):

  * dedup_cleaned_corpus — drop-list join WITHOUT the forced broadcast
    hint. The probe input is clone-dense (SCALE id-shifted copies of every
    document => drops ~ (SCALE-1)/SCALE of the corpus), exactly the regime
    where a forced broadcast would ship O(corpus) ids to every task. The
    hint's absence is pinned statically (test_cleaned_corpus_no_forced_
    broadcast); here we record wall-clock growth. NOTE: at probe scale AQE
    still (correctly) picks a broadcast at runtime — the drop list is a few
    MB — which is the point of removing the hint rather than the join: the
    decision is now size-driven, not hard-coded.

  * multimodal-style embedding near-dup — blocked on (modality, sign-LSH
    bucket) vs the old modality-only key. Reports the CANDIDATE PAIR COUNT
    (sum over blocks of C(n,2)) under both keys: the composite key must cut
    candidates by ~2^n_planes and keep growth ~quadratic-per-block with
    16x smaller blocks; wall time for the composite operator is timed.

    python scripts/probe_r05.py              # SCALE=10
    SCALE=20 python scripts/probe_r05.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(os.environ.get("SCALE", "10"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from scripts.scale_probe import scaled

    spark = (SparkSession.builder.master("local[32]")
             .appName("probe-r05")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_MEM", "48g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from kafka_connect_oss_spark.functions import vectors as V
    from kafka_connect_oss_spark.operators import dedup, multimodal as MM
    from kafka_connect_oss_spark.shipping import ensure_package_on_executors
    from kafka_connect_oss_spark.sources.batch import load_table

    ensure_package_on_executors(spark)
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = scaled(load_table(spark, SF_DIR, "documents"), ["doc_id"], SCALE)
    print(f"scale={SCALE} docs={docs.count():,}")

    # ---- cleaned corpus (clone-dense: drops ~ (SCALE-1)/SCALE of docs) ----
    def cleaned():
        near = (dedup.connectivity_edges(docs, jaccard_threshold=0.08)
                .select(F.col("id_b").alias("doc_id")).distinct())
        w = Window.partitionBy(F.md5("text"))
        exact = (docs.withColumn("keep", F.min("doc_id").over(w))
                 .where(F.col("doc_id") != F.col("keep")).select("doc_id"))
        drops = near.union(exact).distinct()
        return (docs.join(drops.withColumn("_drop", F.lit(1)),
                          "doc_id", "left")
                .groupBy("lang")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.count(F.when(F.col("_drop").isNull(), 1))
                     .alias("n_kept")))

    t0 = time.perf_counter()
    rows = cleaned().collect()
    dt = time.perf_counter() - t0
    kept = sum(r.n_kept for r in rows)
    total = sum(r.n_docs for r in rows)
    print(f"cleaned_corpus: {dt:6.2f}s  docs={total:,} kept={kept:,} "
          f"(drop_rate={1 - kept / total:.2%})")

    # ---- multimodal near-dup blocking: candidates + wall time ------------
    mm = MM.attach_binary(docs)
    emb = MM.binary_embed(mm)
    arr = emb.select(
        "doc_id",
        F.array(*[F.col(f"v{j}") for j in range(MM.EMBED_DIMS)])
        .alias("embedding"))
    from kafka_connect_oss_spark.registry_multimodal import (_MM_CENTER_SPARK,
                                                             _MM_COSINE,
                                                             _MM_PLANES)
    bucket = V.lsh_bucket_sql(_MM_CENTER_SPARK, _MM_PLANES, "spark")
    joined = (arr.join(mm.select("doc_id", "modality"), "doc_id")
              .withColumn("bucket", F.expr(bucket)).cache())
    joined.count()

    def candidates(keys):
        sizes = joined.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
        return sizes.agg(F.sum(F.expr("n * (n - 1) / 2"))).first()[0]

    c_old = candidates(["modality"])
    c_new = candidates(["modality", "bucket"])
    print(f"candidates modality-only={c_old:,.0f} composite={c_new:,.0f} "
          f"(x{c_old / max(c_new, 1):.1f} reduction)")

    t0 = time.perf_counter()
    n = dedup.embedding_near_dup(joined, threshold=_MM_COSINE,
                                 vec_col="embedding",
                                 id_col="doc_id",
                                 block_col=["modality", "bucket"]).count()
    print(f"mm_near_dup_composite: {time.perf_counter() - t0:6.2f}s  "
          f"pairs={n:,}")
    spark.stop()


if __name__ == "__main__":
    main()
