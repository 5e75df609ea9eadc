"""After-measure for the r17 CC rewrite: row times (min of N) for the
three CC rows + unchanged control rows, and the round-2 physical plan
of the rewritten loop (Exchange count per round is the claim to check).

Usage: python scripts/probe_r17_cc_after.py [reps]
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName("probe_r17_cc_after")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "24g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from kafka_connect_oss_spark.measure import calibrate, warm_up  # noqa: E402
from kafka_connect_oss_spark.operators import dedup  # noqa: E402
from kafka_connect_oss_spark.sources.batch import load_table  # noqa: E402

warm_up(spark, int(cpus))
print(f"calib: {calibrate(spark):.3f}")

JT = 0.3
docs = load_table(spark, sf_dir, "documents")


def timed(label, fn):
    best = None
    for _ in range(reps):
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.3f}s (min of {reps})")
    return best


# instrumented loop over the new path: per-round wall + round-2 plan
def loop_instrumented():
    members, sig, rep_pairs = dedup._lsh_rep_stage(
        docs, "text", "doc_id", 3, JT, materialize_members=False)
    edges_sym = (rep_pairs.select(F.col("id_a").alias("src"),
                                  F.col("id_b").alias("dst"))
                 .union(rep_pairs.select(F.col("id_b").alias("src"),
                                         F.col("id_a").alias("dst"))))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (edges_sym.repartition(n_part, "dst")
             .localCheckpoint(eager=False))
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .repartition(n_part, "node")
              .withColumn("label", F.col("node")))
    rounds = 0
    for _ in range(20):
        t0 = time.perf_counter()
        neighbor_min = (edges.join(labels, edges.dst == labels.node)
                        .groupBy("src").agg(F.min("label").alias("nmin")))
        updated = (labels.join(neighbor_min,
                               labels.node == neighbor_min.src, "left")
                   .select(F.col("node"), F.col("label").alias("_prev"),
                           F.least(F.col("label"),
                                   F.coalesce(F.col("nmin"),
                                              F.col("label")))
                           .alias("label")).localCheckpoint(eager=False))
        changed = updated.where(F.col("label") != F.col("_prev")).count()
        rounds += 1
        print(f"  round {rounds}: {time.perf_counter() - t0:.3f}s "
              f"changed={changed}")
        if rounds == 2:
            plan = updated._sc._jvm.PythonSQLUtils.explainString(
                updated._jdf.queryExecution(), "formatted")
            out = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "plans", "r17",
                "cc_round_after.txt")
            with open(out, "w") as f:
                f.write(plan)
            print(f"  round-2 plan: {plan.count('Exchange')} Exchange "
                  f"mentions -> {out}")
        labels = updated.select("node", "label")
        if changed == 0:
            break


print("instrumented rewritten loop (1 rep):")
t0 = time.perf_counter()
loop_instrumented()
print(f"loop total: {time.perf_counter() - t0:.3f}s")

timed("dedup_clusters row",
      lambda: dedup.dedup_clusters_from_docs(docs, jaccard_threshold=JT)
      .count())
timed("dedup_cluster_stats row",
      lambda: dedup.cluster_size_stats(docs, jaccard_threshold=JT).count())
timed("corpus_leakage_safe_split row",
      lambda: dedup.leakage_safe_split(
          docs, (("train", 98), ("val", 99), ("test", 100)),
          jaccard_threshold=JT).count())
# unchanged control row sharing the LSH machinery (for box-noise
# normalization against BENCH_r16)
timed("control dedup_minhash_lsh_pairs",
      lambda: dedup.lsh_candidate_pairs(docs, jaccard_threshold=JT).count())
print(f"calib after: {calibrate(spark):.3f}")
spark.stop()
