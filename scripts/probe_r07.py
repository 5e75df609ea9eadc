#!/usr/bin/env python
"""Round-7 probe (r06 VERDICT item 7): streaming sessionization state
bound at the 10x replay size.

`sessionize` is the one applyInPandasWithState operator that never got the
measured-state-bound treatment the asof/range joins got in round 6. Replay
scaled events in time-ordered micro-batches and record the state store's
numRowsTotal per batch: state = one row per user with an OPEN session, so
with event-time timeouts firing as the watermark passes (last event +
gap), rows must stay ~#active-users, flat across batches, while total
input grows per batch.

    python scripts/probe_r07.py              # sessionization state probe
    ONLY=r7ops python scripts/probe_r07.py   # exponents for the reshaped ops
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = int(os.environ.get("SCALE", "10"))
N_CHUNKS = int(os.environ.get("N_CHUNKS", "8"))
ONLY = os.environ.get("ONLY", "")


def r7ops_exponents() -> None:
    """Wall-time exponents at SCALE 1/10/20 for the two operators this
    round reshaped: incremental dedup (lazy one-job form) and blocked
    n-gram Jaccard (hash intersect + shared shingle cache). Clone-dense
    id-shifted inputs — identical-content groups grow DEEP, the
    adversarial regime for both."""
    import math

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_connect_oss_spark.operators import dedup
    from kafka_connect_oss_spark.sources.batch import load_table
    from scripts.scale_probe import scaled

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_MEM", "48g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[int, float]] = {}
    for n in (1, 10, 20):
        docs = scaled(load_table(spark, SF_DIR, "documents"),
                      ["doc_id"], n)
        base = docs.where(F.col("doc_id") % 2 == 0)
        inc = docs.where(F.col("doc_id") % 2 == 1)
        probes = {
            "incremental_dedup_status":
                lambda: dedup.incremental_dedup_status(base, inc).count(),
            "ngram_jaccard_pairs":
                lambda: dedup.ngram_jaccard_pairs(
                    docs, ["lang", "source"], threshold=0.5).count(),
        }
        for name, fn in probes.items():
            best, rows = 1e9, 0
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                rows = fn()
                best = min(best, time.perf_counter() - t0)
            results.setdefault(name, {})[n] = best
            print(f"{name} x{n}: {best:.2f}s rows={rows:,}", flush=True)
    for name, r in results.items():
        e = math.log(r[20] / r[1]) / math.log(20)
        print(f"{name}: 1x={r[1]:.2f} 10x={r[10]:.2f} 20x={r[20]:.2f} "
              f"e(1->20)={e:.2f}")
    spark.stop()


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from kafka_connect_oss_spark.shipping import ensure_package_on_executors
    from kafka_connect_oss_spark.sources.batch import sink_records
    from kafka_connect_oss_spark.streaming import analytics as A
    from scripts.scale_probe import scaled

    spark = (SparkSession.builder.master("local[32]")
             .appName("probe-r07")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_MEM", "48g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ensure_package_on_executors(spark)

    tmp = tempfile.mkdtemp(prefix="probe_r07_sess_")
    try:
        ev = scaled(sink_records(spark, SF_DIR), ["event_id", "user_id"],
                    SCALE).select("user_id", "ts")
        n_input = ev.count()
        n_users = ev.select("user_id").distinct().count()
        chunked = ev.withColumn(
            "q", F.ntile(N_CHUNKS).over(Window.orderBy("ts")))
        stream_dir = os.path.join(tmp, "chunks")
        os.makedirs(stream_dir)
        for i in range(1, N_CHUNKS + 1):
            part = os.path.join(tmp, f"part_{i}")
            chunked.where(F.col("q") == i).drop("q") \
                .coalesce(4).write.parquet(part)
            for j, f in enumerate(sorted(os.listdir(part))):
                if f.endswith(".parquet"):
                    dst = os.path.join(stream_dir, f"c{i:02d}_{j}.parquet")
                    shutil.copy(os.path.join(part, f), dst)
                    os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

        schema = spark.read.parquet(stream_dir).schema
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "4").parquet(stream_dir))
        gap_ms = 30 * 60 * 1000
        t0 = time.perf_counter()
        q = (A.sessionize(sdf, gap_ms=gap_ms, watermark="1 second")
             .writeStream.format("memory").queryName("sess10x")
             .outputMode("append")
             .option("checkpointLocation", os.path.join(tmp, "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(1200)
        wall = time.perf_counter() - t0
        states = []
        for pr in q.recentProgress:
            for op in pr.get("stateOperators") or []:
                if pr.get("numInputRows", 0) or op.get("numRowsTotal"):
                    states.append(op.get("numRowsTotal"))
        emitted = spark.sql("SELECT count(*) n FROM sess10x").first()["n"]

        # batch golden: gap-sessionization via lag/cumsum
        w = Window.partitionBy("user_id").orderBy("ts")
        gaps = (ev.withColumn("_prev", F.lag("ts").over(w))
                .withColumn("_new", (F.col("_prev").isNull() | (
                    F.col("ts").cast("double") -
                    F.col("_prev").cast("double") > gap_ms / 1000.0))
                    .cast("int"))
                .withColumn("_sid", F.sum("_new").over(w)))
        batch_sessions = (gaps.groupBy("user_id", "_sid")
                          .agg(F.min("ts").alias("session_start"),
                               F.max("ts").alias("session_end"),
                               F.count(F.lit(1)).alias("n_events")))
        n_batch = batch_sessions.count()
        print(f"sessionize {SCALE}x: input={n_input:,} users={n_users:,} "
              f"emitted_sessions={emitted:,} batch_sessions={n_batch:,} "
              f"wall={wall:.1f}s")
        print(f"sessionize state rows/batch: {states} "
              f"(max={max(states) if states else 0:,} vs users={n_users:,} "
              f"= {100 * max(states) / n_input:.2f}% of input)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    if ONLY == "r7ops":
        r7ops_exponents()
    else:
        main()
