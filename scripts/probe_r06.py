#!/usr/bin/env python
"""Round-6 probes (VERDICT r05 items 6-7).

1. Streaming as-of + range joins at the 10x probe size, MULTI-BATCH
   replay: measure the state store's numRowsTotal per micro-batch to show
   watermark pruning keeps state bounded (the carry-row claim,
   streaming/analytics.py), and golden-check emitted rows vs the batch
   operator at that scale.
2. Cohort retention matrix + exact per-group quantile at SCALE in
   {1, 10, 20}: wall-time exponents (expect e < 1) and the quantile's
   driver-collected histogram row count (bounded by groups x 4096).

    python scripts/probe_r06.py            # everything
    ONLY=stream python scripts/probe_r06.py
    ONLY=batch  python scripts/probe_r06.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ONLY = os.environ.get("ONLY", "")

from scripts.scale_probe import scaled  # noqa: E402


def build_spark():
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[32]")
             .appName("probe-r06")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_MEM", "48g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def stream_state_probe(spark, scale: int = 10, n_chunks: int = 8) -> None:
    """Replay scaled purchase/click events in time-ordered micro-batches
    through streaming_asof_join and streaming_range_join; report state
    rows per batch (watermark pruning evidence) + batch golden check."""
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_connect_oss_spark.operators.asof import asof_join, range_join
    from kafka_connect_oss_spark.shipping import ensure_package_on_executors
    from kafka_connect_oss_spark.sources.batch import sink_records
    from kafka_connect_oss_spark.streaming import analytics as A

    ensure_package_on_executors(spark)
    tmp = tempfile.mkdtemp(prefix="probe_r06_stream_")
    try:
        ev = scaled(sink_records(spark, SF_DIR), ["event_id", "user_id"],
                    scale)
        p = (ev.where(F.col("event_type") == "purchase")
             .select("user_id", "ts", "event_id"))
        # pre-dedup right on (user, ts): removes tie ambiguity between
        # batch hash tie-break and streaming max-id tie-break
        c = (ev.where(F.col("event_type") == "click")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("event_id")))
        base = (p.withColumn("side", F.lit(1))
                .unionByName(c.withColumn("side", F.lit(0))))
        n_input = base.count()
        chunked = base.withColumn(
            "q", F.ntile(n_chunks).over(Window.orderBy("ts")))
        stream_dir = os.path.join(tmp, "chunks")
        os.makedirs(stream_dir)
        for i in range(1, n_chunks + 1):
            part = os.path.join(tmp, f"part_{i}")
            chunked.where(F.col("q") == i).drop("q") \
                .coalesce(4).write.parquet(part)
            for j, f in enumerate(sorted(os.listdir(part))):
                if f.endswith(".parquet"):
                    dst = os.path.join(stream_dir, f"c{i:02d}_{j}.parquet")
                    shutil.copy(os.path.join(part, f), dst)
                    os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

        schema = spark.read.parquet(stream_dir).schema

        def run(df_fn, name):
            sdf = (spark.readStream.schema(schema)
                   .option("maxFilesPerTrigger", "4").parquet(stream_dir))
            t0 = time.perf_counter()
            q = (df_fn(sdf).writeStream.format("memory").queryName(name)
                 .outputMode("append")
                 .option("checkpointLocation", os.path.join(tmp, "ck_" + name))
                 .trigger(availableNow=True).start())
            q.awaitTermination(1200)
            wall = time.perf_counter() - t0
            states = []
            for pr in q.recentProgress:
                for op in pr.get("stateOperators") or []:
                    if pr.get("numInputRows", 0) or op.get("numRowsTotal"):
                        states.append(op.get("numRowsTotal"))
            return wall, states

        # --- streaming as-of ---
        def build_asof(sdf):
            return A.streaming_asof_join(
                sdf.where(F.col("side") == 1), sdf.where(F.col("side") == 0),
                key_col="user_id", watermark="1 second")

        wall, states = run(build_asof, "asof10x")
        got = {(r.key, r.l_id): r.r_id
               for r in spark.sql("SELECT * FROM asof10x").collect()}
        expect = {(r.user_id, r.event_id): r.c_event_id
                  for r in asof_join(p, c, on=["user_id"],
                                     right_prefix="c_").collect()}
        mism = sum(1 for k, v in got.items() if expect.get(k, "#") != v)
        print(f"asof 10x: input={n_input:,} emitted={len(got):,} "
              f"batch_expect={len(expect):,} mismatches={mism} "
              f"wall={wall:.1f}s")
        print(f"asof state rows/batch: {states} "
              f"(max={max(states) if states else 0:,} "
              f"= {100 * max(states) / n_input:.1f}% of input)")
        assert mism == 0, "streaming asof diverged from batch"
        assert len(got) >= len(expect) // 2

        # --- streaming range join ---
        e = (ev.where(F.col("event_type") == "error")
             .select("user_id", "ts", "event_id"))
        err_dir = os.path.join(tmp, "err")
        e.coalesce(8).write.parquet(err_dir)
        eschema = spark.read.parquet(err_dir).schema

        def build_range(sdf):
            es = (spark.readStream.schema(eschema)
                  .option("maxFilesPerTrigger", "2").parquet(err_dir))
            return A.streaming_range_join(
                sdf.where(F.col("side") == 1).drop("side"), es,
                on=["user_id"], lower_ms=0, upper_ms=6 * 3600_000,
                right_prefix="e_")

        wall, states = run(build_range, "range10x")
        n_rj = spark.sql("SELECT count(*) n FROM range10x").first()["n"]
        expect_rj = range_join(p, e, on=["user_id"], lower_ms=0,
                               upper_ms=6 * 3600_000,
                               right_prefix="e_").count()
        print(f"range 10x: emitted={n_rj:,} batch_expect={expect_rj:,} "
              f"wall={wall:.1f}s")
        print(f"range state rows/batch: {states} "
              f"(max={max(states) if states else 0:,})")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def batch_exponent_probe(spark) -> None:
    """Cohort retention + exact quantile at SCALE 1/10/20 with exponents."""
    import math

    from pyspark.sql import functions as F

    from kafka_connect_oss_spark.operators import sketches as SK
    from kafka_connect_oss_spark.sources.batch import load_table

    def cohort(ev):
        from kafka_connect_oss_spark.functions.rounding import fround
        act = ev.select("user_id",
                        F.col("ts").cast("date").alias("day")).distinct()
        first = act.groupBy("user_id").agg(F.min("day").alias("cohort"))
        m = (act.join(first, "user_id")
             .groupBy("cohort", F.datediff("day", "cohort").alias("day_offset"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_active")))
        size = (m.where(F.col("day_offset") == 0)
                .select("cohort", F.col("n_active").alias("cohort_size")))
        return (m.join(size, "cohort")
                .select(F.col("cohort").cast("string").alias("cohort_day"),
                        "day_offset", "n_active",
                        fround(F.col("n_active") /
                               F.col("cohort_size").cast("double"), 4)
                        .alias("retention")))

    results: dict[str, dict[int, float]] = {"cohort": {}, "quantile": {}}
    for scale in (1, 10, 20):
        ev = scaled(load_table(spark, SF_DIR, "events"),
                    ["event_id", "user_id"], scale)
        n = ev.count()
        best_c = best_q = None
        rows_c = rows_q = 0
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows_c = cohort(ev).count()
            dt = time.perf_counter() - t0
            best_c = dt if best_c is None else min(best_c, dt)
            t0 = time.perf_counter()
            rows_q = SK.exact_quantile_disc(ev, "value", 0.5,
                                            "event_type").count()
            dt = time.perf_counter() - t0
            best_q = dt if best_q is None else min(best_q, dt)
        groups = ev.select("event_type").distinct().count()
        results["cohort"][scale] = best_c
        results["quantile"][scale] = best_q
        print(f"scale={scale} events={n:,}: cohort {best_c:.2f}s "
              f"({rows_c} rows), quantile {best_q:.2f}s ({rows_q} rows, "
              f"driver-walked hist <= {groups}x4096 = {groups * 4096:,} "
              f"rows)")
    for name, r in results.items():
        e10 = math.log10(r[20] / r[1]) / math.log10(20)
        print(f"{name}: e(1->20) = {e10:.2f} "
              f"({r[1]:.2f}s -> {r[10]:.2f}s -> {r[20]:.2f}s)")


def r6_ops_exponent_probe(spark) -> None:
    """New round-6 operators at SCALE 1/10/20: novelty, BM25, diversity,
    duplicate spans. Inputs are id-shifted self-unions (clone-dense:
    every copy repeats the same texts, so novelty's first-owner groups
    and dup-span groups grow deep — the adversarial regime)."""
    import math

    from kafka_connect_oss_spark.operators import similarity
    from kafka_connect_oss_spark.operators import text as TXT
    from kafka_connect_oss_spark.sources.batch import load_table

    ops = {
        "novelty_score": lambda d, e: TXT.novelty_score(d),
        "bm25_topk": lambda d, e: TXT.bm25_topk(d),
        "duplicate_spans": lambda d, e: TXT.duplicate_spans(d),
        "embedding_diversity": lambda d, e: similarity.embedding_diversity(
            e, dim=64),
        "weighted_sample": lambda d, e: TXT.weighted_sample(d),
        "token_entropy": lambda d, e: TXT.token_entropy(d),
        "unigram_nll": lambda d, e: TXT.unigram_nll(d),
    }
    results: dict[str, dict[int, float]] = {k: {} for k in ops}
    for scale in (1, 10, 20):
        docs = scaled(load_table(spark, SF_DIR, "documents"),
                      ["doc_id"], scale)
        emb = scaled(load_table(spark, SF_DIR, "embeddings"),
                     ["vec_id"], scale)
        line = [f"scale={scale}:"]
        for name, fn in ops.items():
            best, rows = None, 0
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                rows = fn(docs, emb).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results[name][scale] = best
            line.append(f"{name} {best:.2f}s/{rows:,}r")
        print(" ".join(line))
    for name, r in results.items():
        e = math.log10(r[20] / r[1]) / math.log10(20)
        print(f"{name}: e(1->20) = {e:.2f} "
              f"({r[1]:.2f}s -> {r[10]:.2f}s -> {r[20]:.2f}s)")


def main() -> None:
    spark = build_spark()
    spark.range(1000).selectExpr("sum(id)").collect()
    if ONLY in ("", "stream"):
        stream_state_probe(spark)
    if ONLY in ("", "batch"):
        batch_exponent_probe(spark)
    if ONLY in ("", "r6ops"):
        r6_ops_exponent_probe(spark)
    spark.stop()


if __name__ == "__main__":
    main()
