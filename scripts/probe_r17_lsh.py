"""Stage-by-stage decomposition of the two LSH pair-family rows
(VERDICT r16 item 6): where do dedup_minhash_lsh_pairs (3.14 s in
BENCH_r16) and dedup_containment_pairs (2.68 s) actually spend their
time — the staged materialization jobs, the banded/posting candidate
join, or the verification/expansion consumer plan?

Method: warm session, min-of-N per phase; each staged frame is forced
with .count() in dependency order so a phase's reading isolates ITS
materialization on top of already-materialized inputs. An unchanged
control row (dedup_ngram_jaccard_pairs — blocked exact tier, no staged
frames) normalizes against box-noise phases, and the fixed-plan
calibration probe brackets the run (the r10-r12 discipline).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from kafka_connect_oss_spark.measure import calibrate, warm_up  # noqa: E402
from kafka_connect_oss_spark.operators import dedup  # noqa: E402
from kafka_connect_oss_spark.registry import load_table  # noqa: E402
from kafka_connect_oss_spark.registry_llm import JACCARD_DEMO  # noqa: E402

warm_up(spark, 32)
print(f"calib_before={calibrate(spark):.3f}")

docs = load_table(spark, sf_dir, "documents")


def timed(label, thunk):
    import gc
    best = []
    for _ in range(reps):
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.perf_counter()
        thunk()
        best.append(time.perf_counter() - t0)
    print(f"{label}: min={min(best):.3f}s all={[round(t, 2) for t in best]}",
          flush=True)


# ---- full rows (the bench numbers to decompose) --------------------
timed("FULL dedup_minhash_lsh_pairs",
      lambda: dedup.lsh_candidate_pairs(
          docs, jaccard_threshold=JACCARD_DEMO).count())
timed("FULL dedup_containment_pairs",
      lambda: dedup.containment_pairs(
          docs, threshold=JACCARD_DEMO).count())
timed("CONTROL dedup_ngram_jaccard_pairs",
      lambda: dedup.ngram_jaccard_pairs(
          docs, block_cols=["lang", "source"],
          threshold=JACCARD_DEMO).count())


# ---- lsh_candidate_pairs phases ------------------------------------
def lsh_phases():
    from kafka_connect_oss_spark.operators.lifecycle import stage_local
    t0 = time.perf_counter()
    keyed = docs.select("doc_id", F.md5(F.col("text")).alias("_tmd5"))
    groups = keyed.groupBy("_tmd5").agg(F.min("doc_id").alias("rep"),
                                        F.count(F.lit(1)).alias("gn"))
    members = stage_local(keyed.join(groups, "_tmd5")
                          .select("doc_id", "_tmd5", "rep", "gn"))
    members.count()
    t1 = time.perf_counter()
    rep_docs = docs.join(groups.select(F.col("rep").alias("doc_id")),
                         "doc_id", "semi")
    sig = stage_local(dedup.signature_frame(rep_docs, "text", 3, "doc_id"))
    sig.count()
    t2 = time.perf_counter()
    bands = dedup.minhash_band_keys(sig, "doc_id")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, ["band", "band_key"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b")).distinct())
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("hh").alias("h_a"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("hh").alias("h_b"))
    rep_pairs = (cand.join(sa, "id_a").join(sb, "id_b")
                 .withColumn("inter",
                             F.expr("size(array_intersect(h_a, h_b))"))
                 .withColumn("jaccard",
                             F.round(F.col("inter") /
                                     (F.expr("size(h_a)")
                                      + F.expr("size(h_b)")
                                      - F.col("inter")), 4))
                 .where(F.col("jaccard") >= JACCARD_DEMO)
                 .select("id_a", "id_b", "jaccard"))
    rep_pairs.count()
    t3 = time.perf_counter()
    print(f"  lsh phases: members={t1-t0:.3f} sig={t2-t1:.3f} "
          f"band+verify={t3-t2:.3f} (one rep)", flush=True)


for _ in range(3):
    lsh_phases()


# ---- containment_pairs phases ---------------------------------------
def containment_phases():
    from kafka_connect_oss_spark.operators.lifecycle import stage_local
    t0 = time.perf_counter()
    keyed = docs.select("doc_id", F.md5(F.col("text")).alias("_tmd5"))
    groups = keyed.groupBy("_tmd5").agg(F.min("doc_id").alias("rep"),
                                        F.count(F.lit(1)).alias("gn"))
    members = stage_local(keyed.join(groups, "_tmd5")
                          .select("doc_id", "_tmd5", "rep", "gn"))
    members.count()
    t1 = time.perf_counter()
    rep_docs = docs.join(groups.select(F.col("rep").alias("doc_id")),
                         "doc_id", "semi")
    posts = stage_local(dedup.shingle_hash_pairs(rep_docs, "text", 3,
                                                 "doc_id"))
    posts.count()
    t2 = time.perf_counter()
    ok = (posts.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
          .where(F.col("_df") <= dedup.HOT_SHINGLE_DF_CAP).select("_h"))
    capped = stage_local(posts.join(ok, "_h", "semi"))
    capped.count()
    t3 = time.perf_counter()
    sig = stage_local(posts.groupBy("doc_id")
                      .agg(F.collect_list("_h").alias("hh")))
    sig.count()
    t4 = time.perf_counter()
    idx = capped.groupBy("_h").agg(F.collect_list("doc_id").alias("_ids"))
    cand = (idx.select(F.explode("_ids").alias("id_a"), "_ids")
            .select("id_a", F.explode("_ids").alias("id_b"))
            .where(F.col("id_a") < F.col("id_b"))
            .distinct())
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("hh").alias("h_a"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("hh").alias("h_b"))
    rep_pairs = (cand.join(sa, "id_a").join(sb, "id_b")
                 .withColumn("inter",
                             F.expr("size(array_intersect(h_a, h_b))"))
                 .withColumn("containment",
                             F.round(F.col("inter") /
                                     F.least(F.expr("size(h_a)"),
                                             F.expr("size(h_b)")), 4))
                 .where(F.col("containment") >= JACCARD_DEMO))
    rep_pairs.count()
    t5 = time.perf_counter()
    print(f"  containment phases: members={t1-t0:.3f} posts={t2-t1:.3f} "
          f"capped={t3-t2:.3f} sig={t4-t3:.3f} cand+verify={t5-t4:.3f} "
          f"(one rep)", flush=True)


for _ in range(3):
    containment_phases()

print(f"calib_after={calibrate(spark):.3f}")
spark.stop()
