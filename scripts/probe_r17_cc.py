"""Phase probe for the connected-components family (r17 optimization
round, guide §1: measure first).

The three rows — dedup_clusters, dedup_cluster_stats,
corpus_leakage_safe_split — share connectivity_edges (LSH rep stage +
star edges) + the dedup_clusters min-label loop. Before rewriting
anything this probe answers:

  1. how much of a row's wall is the pair build vs the CC loop vs the
     final consumer aggregate;
  2. how many propagation rounds the loop runs at this SF and what one
     round costs (the fixed-latency x rounds hypothesis);
  3. how large the edge frame is, split rep-pairs vs star edges (the
     collapsed-graph rewrite only pays if the star side dominates or
     the loop runs a member-propagation round).

Usage: python scripts/probe_r17_cc.py [reps]
"""
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
         .appName("probe_r17_cc")
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
from kafka_connect_oss_spark.operators.lifecycle import stage_local  # noqa: E402
from kafka_connect_oss_spark.sources.batch import load_table  # noqa: E402

warm_up(spark, int(cpus))
print(f"calib: {calibrate(spark):.3f}")

JT = 0.3


def timed(label, fn):
    best = None
    for _ in range(reps):
        spark.catalog.clearCache()
        import gc
        gc.collect()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.3f}s (min of {reps})")
    return best


docs = load_table(spark, sf_dir, "documents")

# --- phase 1: the pair build alone -----------------------------------
timed("connectivity_edges (LSH rep stage + star) noop-count",
      lambda: dedup.connectivity_edges(docs, jaccard_threshold=JT)
      .write.format("noop").mode("overwrite").save())

# edge composition: how much of the frame is star vs rep-pair
members, sig, rep_pairs = dedup._lsh_rep_stage(
    docs, "text", "doc_id", 3, JT, materialize_members=False)
n_rep_pairs = rep_pairs.count()
rep_sizes = sig.select(F.col("doc_id").alias("rep"),
                       F.expr("size(hh)").alias("_nsh"))
star = (members.where(F.col("doc_id") != F.col("rep"))
        .join(rep_sizes, "rep").where(F.col("_nsh") > 0))
n_star = star.count()
print(f"edges: rep_pairs={n_rep_pairs} star={n_star}")

# --- phase 2: the CC loop, instrumented ------------------------------
def cc_instrumented():
    pairs0 = dedup.connectivity_edges(docs, jaccard_threshold=JT)
    doc_ids = docs.select(F.col("doc_id").alias("id_a"))
    t0 = time.perf_counter()
    pairs = stage_local(
        pairs0.join(doc_ids, "id_a", "semi")
        .join(doc_ids.withColumnRenamed("id_a", "id_b"), "id_b", "semi")
        .select("id_a", "id_b"))
    edges = (pairs.select(F.col("id_a").alias("src"),
                          F.col("id_b").alias("dst"))
             .union(pairs.select(F.col("id_b").alias("src"),
                                 F.col("id_a").alias("dst"))))
    edges = stage_local(edges)
    edge_nodes = stage_local(
        edges.select(F.col("src").alias("node")).distinct())
    labels = edge_nodes.withColumn("label", F.col("node"))
    n_nodes = edge_nodes.count()
    print(f"  edge-node count job (incl. pair build): "
          f"{time.perf_counter() - t0:.3f}s  n_nodes={n_nodes}")
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
        labels = updated.select("node", "label")
        rounds += 1
        print(f"  round {rounds}: {time.perf_counter() - t0:.3f}s "
              f"changed={changed}")
        if changed == 0:
            break
    t0 = time.perf_counter()
    isolated = (docs.select(F.col("doc_id").alias("node"))
                .join(edge_nodes, "node", "left_anti")
                .select("node", F.col("node").alias("label")))
    out = labels.unionByName(isolated)
    out.write.format("noop").mode("overwrite").save()
    print(f"  final union noop: {time.perf_counter() - t0:.3f}s")


print("instrumented CC (1 rep):")
t0 = time.perf_counter()
cc_instrumented()
print(f"instrumented CC total: {time.perf_counter() - t0:.3f}s")

# --- phase 3: the three rows end-to-end ------------------------------
timed("dedup_clusters row",
      lambda: dedup.dedup_clusters(
          docs, dedup.connectivity_edges(docs, jaccard_threshold=JT))
      .count())
timed("dedup_cluster_stats row",
      lambda: dedup.cluster_size_stats(docs, jaccard_threshold=JT).count())
timed("corpus_leakage_safe_split row",
      lambda: dedup.leakage_safe_split(
          docs, (("train", 98), ("val", 99), ("test", 100)),
          jaccard_threshold=JT).count())
print(f"calib after: {calibrate(spark):.3f}")
spark.stop()
