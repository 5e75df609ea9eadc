"""Round-8 probes.

1. ivf_assign large-K: time the literal-inline path as K grows (the
   expression-tree cliff) vs the broadcast-join path at SemDeDup-scale K
   (r07 VERDICT What's-wrong #3).
2. incremental dedup: sf-scaling of the exact shingle-posting candidate
   form that replaced the banded candidates.

Usage: python scripts/probe_r08.py [ivf|inc]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_oss_spark.operators import dedup, similarity  # noqa: E402
from kafka_connect_oss_spark.sources.batch import load_table  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

which = sys.argv[1] if len(sys.argv) > 1 else "ivf"


def synth_centroids(k: int, d: int):
    # deterministic unit-ish vectors; values irrelevant to the probe
    return spark.range(1, k + 1).select(
        F.col("id").cast("int").alias("cid"),
        F.expr(f"transform(sequence(1, {d}), j -> "
               f"cast(pmod(id * j, 97) - 48 as double) / 48.0)").alias("cv"))


if which == "ivf":
    emb = load_table(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"), "embeddings")
    n = emb.count()
    d = 64
    for k, forced in [(512, "literal"), (2048, "literal"),
                      (4096, "literal"), (4096, "join"),
                      (16384, "join"), (65536, "join")]:
        cents = synth_centroids(k, d)
        kw = ({"literal_max_k": 10 ** 9} if forced == "literal"
              else {"literal_max_k": 1})
        t0 = time.time()
        out = similarity.ivf_assign(emb, cents, **kw)
        n_assigned = out.count()
        ncid = out.select("cid").distinct().count()
        print(f"K={k:6d} path={forced:7s} wall={time.time() - t0:6.2f}s "
              f"rows={n_assigned} distinct_cids={ncid}", flush=True)
else:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = load_table(spark, sf, "documents")
    base = docs.where(F.col("doc_id") % 2 == 0)
    inc = docs.where(F.col("doc_id") % 2 == 1)
    for rep in range(3):
        t0 = time.time()
        n = dedup.incremental_dedup_status(base, inc).count()
        print(f"incremental sf={sf} rep={rep} wall={time.time() - t0:5.2f}s "
              f"rows={n}", flush=True)

spark.stop()
