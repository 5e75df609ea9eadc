"""Bloom-prefilter A/B at its design regime (r10 judge item 6).

The decontaminate fallback (benchmark too large to inline) semi-joins
EVERY corpus shingle against the distributed benchmark hash set; the
bloom_bits option prefilters the corpus shingle stream against a
broadcast bitmap first. This probe runs the fallback at sf1 with
bloom_bits unset vs set and reports min-of-3 wall time plus the
operator's whole claim: how many (id, hash) rows survive the prefilter
to reach the exact verify join.

Usage: python scripts/probe_r11_bloom.py  (env SPARK_GRAFT_SF1_DIR,
default /tmp/spark_graft_sf1)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", CPUS)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "32g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from kafka_connect_oss_spark.functions import bloom as B  # noqa: E402
from kafka_connect_oss_spark.operators.dedup import (  # noqa: E402
    shingle_hash_pairs)
from kafka_connect_oss_spark.operators.text import decontaminate  # noqa: E402
from kafka_connect_oss_spark.shipping import (  # noqa: E402
    ensure_package_on_executors)
from kafka_connect_oss_spark.sources.batch import load_table  # noqa: E402

ensure_package_on_executors(spark)

docs_all = load_table(spark, SF1, "documents")
BLOOM_BITS = 1 << 23

# Two regimes:
#  * DESIGN regime — the one bloom_bits exists for: a huge benchmark
#    (>1M distinct hashes, forcing the semi-join fallback) that shares
#    almost nothing with the corpus, the normal case for a real eval
#    suite vs a crawl. Synthesized with per-id-unique shingles because
#    the synthetic documents table is far too self-similar (only ~23k
#    distinct 3-gram shingles in 10k docs) to provide one.
#  * OVERLAP regime — benchmark drawn FROM the corpus (every doc
#    contaminated, prefilter mostly passes): the worst case, included
#    so the cost side of the bitmap (build + probe) is priced too.
bench_design = spark.range(600_000).selectExpr(
    "id AS doc_id",
    "concat('bm', id, 'p bm', id, 'q bm', id, 'r bm', id, 's') AS text")
bench_overlap = docs_all.where(F.col("doc_id") % 5 == 0)

out = {"sf1_dir": SF1, "bloom_bits": BLOOM_BITS, "bloom_k": 5}


def regime(tag, corpus, bench):
    n_hashes = (shingle_hash_pairs(bench, distinct=False)
                .select("_h").distinct().count())
    res = {"n_bench_hashes": n_hashes}
    for mode, bits in (("exact", None), ("bloom", BLOOM_BITS)):
        ts, n = [], None
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = decontaminate(corpus, bench, max_broadcast_hashes=1000,
                              bloom_bits=bits).count()
            ts.append(time.perf_counter() - t0)
        res[f"{mode}_sec_min3"] = round(min(ts), 3)
        res[f"{mode}_clean_rows"] = n
    assert res["exact_clean_rows"] == res["bloom_clean_rows"], \
        "bloom path must be value-identical (no false negatives)"
    # the claim itself: verify-join input rows with vs without prefilter
    doc_h = shingle_hash_pairs(corpus, distinct=False)
    total = doc_h.count()
    bench_h = (shingle_hash_pairs(bench, distinct=False)
               .select("_h").distinct())
    filt = B.bloom_build(bench_h, "_h", BLOOM_BITS, 5)
    survivors = B.bloom_prefilter(doc_h, "_h", filt,
                                  BLOOM_BITS, 5).count()
    res["corpus_shingle_rows"] = total
    res["rows_into_verify_join_bloom"] = survivors
    res["shuffle_reduction"] = round(1 - survivors / total, 4)
    out[tag] = res


regime("design_disjoint_1m", docs_all, bench_design)
regime("overlap_worst_case", docs_all.where(F.col("doc_id") % 5 != 0),
       bench_overlap)
print(json.dumps(out))
