"""One-off r16 probe: where does a streaming golden row's wall time go?

Variant B: prep via single-collect median-ts predicate split (no
global-sort ntile recomputed per chunk) + persisted base; stream at
several shuffle-partition counts. Throwaway diagnostics for VERDICT
r15 item 2 — not part of the suite.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import shutil  # noqa: E402
import tempfile  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_oss_spark.shipping import ensure_package_on_executors  # noqa: E402
from kafka_connect_oss_spark.sources.batch import load_table  # noqa: E402
from kafka_connect_oss_spark.streaming import analytics as A  # noqa: E402
from kafka_connect_oss_spark.streaming.replay import (  # noqa: E402
    drop_single_file, ephemeral_out_dir, few_shuffle_partitions,
    pin_time_order)

load_table(spark, sf_dir, "events").count()
ensure_package_on_executors(spark)


def run_once(nparts):
    marks = [("t0", time.time())]
    with few_shuffle_partitions(spark, nparts):
        workdir = tempfile.mkdtemp(prefix="probe_asof_")
        try:
            ev = load_table(spark, sf_dir, "events")
            p = (ev.where(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id"))
            c = (ev.where(F.col("event_type") == "click")
                 .groupBy("user_id", "ts")
                 .agg(F.max("event_id").alias("event_id")))
            base = (p.withColumn("side", F.lit(1))
                    .unionByName(c.withColumn("side", F.lit(0)))).persist()
            stats = base.agg(
                F.max("ts").alias("maxts"),
                F.expr("percentile_approx(ts, 0.5)").alias("cut")).collect()[0]
            maxts, cut = stats["maxts"], stats["cut"]
            chunk_dir = f"{workdir}/chunks"
            os.makedirs(chunk_dir)
            drop_single_file(base.where(F.col("ts") < F.lit(cut)),
                             workdir, chunk_dir, "c1")
            drop_single_file(base.where(F.col("ts") >= F.lit(cut)),
                             workdir, chunk_dir, "c2")
            base.unpersist()
            import datetime
            drop_single_file(spark.createDataFrame(
                [(-1, maxts + datetime.timedelta(hours=1), -1, 0)],
                "user_id long, ts timestamp, event_id long, side int"),
                workdir, chunk_dir, "c9_sentinel")
            pin_time_order(chunk_dir, ["c1", "c2", "c9_sentinel"])
            marks.append(("prep_done", time.time()))

            schema = spark.read.parquet(chunk_dir).schema
            sdf = (spark.readStream.schema(schema)
                   .option("maxFilesPerTrigger", "1").parquet(chunk_dir))
            j = A.streaming_asof_join(sdf.where(F.col("side") == 1),
                                      sdf.where(F.col("side") == 0),
                                      key_col="user_id",
                                      watermark="1 second")
            out = ephemeral_out_dir("probe_asof_out_")
            q = (j.writeStream.outputMode("append")
                 .option("checkpointLocation", f"{workdir}/ck")
                 .trigger(availableNow=True).start(out))
            q.awaitTermination()
            marks.append(("stream_done", time.time()))
            n = spark.read.parquet(out).orderBy("key", "l_id").count()
            marks.append(("read_done", time.time()))
            prog = q.recentProgress
            rows_per_batch = [(pr["batchId"], pr["numInputRows"],
                               pr["durationMs"].get("triggerExecution"))
                              for pr in prog]
            return marks, n, rows_per_batch
        finally:
            shutil.rmtree(workdir, ignore_errors=True)


for nparts in (32, 21, 8):
    marks, n, batches = run_once(nparts)
    t = dict(marks)
    print(f"\n=== shuffle.partitions={nparts}  rows={n}")
    print(f"prep   : {t['prep_done'] - t['t0']:.2f}s")
    print(f"stream : {t['stream_done'] - t['prep_done']:.2f}s")
    print(f"read   : {t['read_done'] - t['stream_done']:.2f}s")
    print(f"batches (id, inputRows, triggerMs): {batches}")
