"""r16 optimization probe: per-phase wall time of the seated streaming
rows (prep / stream / read), 2 reps each (rep 1 warms the Python
workers + state store; rep 2 is the bench-steady-state number).
Throwaway diagnostics — not part of the suite.
"""
import datetime
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

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

from kafka_connect_oss_spark.measure import calibrate, warm_up  # noqa: E402
from kafka_connect_oss_spark.operators import bucketing as B  # noqa: E402
from kafka_connect_oss_spark.operators import dedup  # noqa: E402
from kafka_connect_oss_spark.shipping import (  # noqa: E402
    ensure_package_on_executors)
from kafka_connect_oss_spark.sources.batch import load_table  # noqa: E402
from kafka_connect_oss_spark.streaming import analytics as A  # noqa: E402
from kafka_connect_oss_spark import registry_staged_r15 as R15  # noqa: E402
from kafka_connect_oss_spark import registry_staged_r16 as R16  # noqa: E402
from kafka_connect_oss_spark.streaming.replay import (  # noqa: E402
    drop_labeled_chunks, drop_single_file, ephemeral_out_dir,
    pin_time_order)

warm_up(spark, int(cpus))
ensure_package_on_executors(spark)
print(f"calib={calibrate(spark)}")


class Marks:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.rows = []

    def mark(self, label):
        t = time.perf_counter()
        self.rows.append((label, t - self.t0))
        self.t0 = t

    def show(self, name, rep):
        total = sum(d for _, d in self.rows)
        parts = "  ".join(f"{l}={d:.2f}" for l, d in self.rows)
        print(f"{name} rep{rep}: total={total:.2f}  {parts}")


def run_asof(rep):
    m = Marks()
    workdir = tempfile.mkdtemp(prefix="probe_asof_")
    try:
        ev = load_table(spark, sf_dir, "events")
        p = (ev.where(F.col("event_type") == "purchase")
             .select("user_id", "ts", "event_id"))
        c = (ev.where(F.col("event_type") == "click")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("event_id")))
        base = (p.withColumn("side", F.lit(1))
                .unionByName(c.withColumn("side", F.lit(0))))
        stats = ev.agg(
            F.max("ts").alias("maxts"),
            F.expr("percentile_approx(ts, 0.5)").alias("cut")).collect()[0]
        m.mark("stats")
        sent = spark.createDataFrame(
            [(-1, stats["maxts"] + datetime.timedelta(hours=1), -1, 0)],
            "user_id long, ts timestamp, event_id long, side int")
        labeled = (base.withColumn("chunk", F.when(
                       F.col("ts") < F.lit(stats["cut"]),
                       F.lit("c1")).otherwise(F.lit("c2")))
                   .unionByName(sent.withColumn("chunk", F.lit("c2"))))
        chunk_dir = f"{workdir}/chunks"
        os.makedirs(chunk_dir)
        present = drop_labeled_chunks(labeled, "chunk", ["c1", "c2"],
                                      workdir, chunk_dir)
        pin_time_order(chunk_dir, present)
        m.mark("chunks")
        sdf = (spark.readStream.schema(labeled.drop("chunk").schema)
               .option("maxFilesPerTrigger", "1").parquet(chunk_dir))
        j = A.streaming_asof_join(sdf.where(F.col("side") == 1),
                                  sdf.where(F.col("side") == 0),
                                  key_col="user_id", watermark="1 second")
        out = ephemeral_out_dir("probe_asof_out_")
        q = (j.writeStream.outputMode("append")
             .option("checkpointLocation", f"{workdir}/ck")
             .trigger(availableNow=True).start(out))
        q.awaitTermination()
        m.mark("stream")
        n = spark.read.parquet(out).orderBy("key", "l_id").count()
        m.mark("read")
        batches = [(pr["batchId"], pr["numInputRows"],
                    pr["durationMs"].get("triggerExecution"))
                   for pr in q.recentProgress]
        m.show("asof", rep)
        print(f"   rows={n} batches={batches}")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def run_iid(rep):
    m = Marks()
    workdir = tempfile.mkdtemp(prefix="probe_iid_")
    db = "iidstate_" + os.path.basename(workdir).rsplit("iid_", 1)[-1]
    try:
        docs = load_table(spark, sf_dir, "documents")
        B.ensure_database(spark, db, f"{workdir}/state")
        dedup.compact_base_tables(
            docs.where(F.col("doc_id") % 3 == 0), f"{db}.s", n_buckets=4)
        m.mark("compact")
        chunk_dir = f"{workdir}/chunks"
        os.makedirs(chunk_dir)

        def drop_chunk(i):
            drop_single_file(docs.where(F.col("doc_id") % 3 == i),
                             workdir, chunk_dir, f"c{i}")

        drop_chunk(1)
        m.mark("chunk1")
        schema = spark.read.parquet(chunk_dir).schema
        out = ephemeral_out_dir("probe_iid_out_")
        ck = f"{workdir}/ck"

        def run_epoch():
            sdf = (spark.readStream.schema(schema)
                   .option("maxFilesPerTrigger", "1").parquet(chunk_dir))
            q = A.run_incremental_dedup(sdf, f"{db}.s", out, ck,
                                        refresh_state=True)
            q.awaitTermination()

        run_epoch()
        m.mark("epoch1")
        drop_chunk(2)
        m.mark("chunk2")
        run_epoch()
        m.mark("epoch2")
        n = (spark.read.parquet(out)
             .withColumn("batch_id", F.col("batch_id").cast("long"))
             .orderBy("batch_id", "doc_id")).count()
        m.mark("read")
        m.show("iid", rep)
        print(f"   rows={n}")
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(workdir, ignore_errors=True)


def run_sess(rep):
    m = Marks()
    workdir = tempfile.mkdtemp(prefix="probe_sess_")
    try:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
        chunk_dir = f"{workdir}/chunks"
        os.makedirs(chunk_dir)
        cut, maxts = R16._session_cut_ts(ev)
        m.mark("cut+maxts")
        sent = spark.createDataFrame(
            [(A.SESSION_FLUSH_USER,
              A.session_flush_ts(maxts, gap_ms=R16._SESS_GAP_MS,
                                 watermark_delay_ms=R16._SESS_WATERMARK_MS))],
            "user_id long, ts timestamp")
        schema = R16._drop_cut_chunks_with_sentinel(
            ev, cut, sent, workdir, chunk_dir)
        m.mark("chunks")
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "1").parquet(chunk_dir))
        out = ephemeral_out_dir("probe_sess_out_")
        q = (A.sessionize(sdf, gap_ms=R16._SESS_GAP_MS,
                          watermark=R16._SESS_WATERMARK)
             .writeStream.outputMode("append")
             .option("checkpointLocation", f"{workdir}/ck")
             .trigger(availableNow=True).start(out))
        q.awaitTermination()
        m.mark("stream")
        n = (spark.read.parquet(out).where(F.col("user_id") >= 0)).count()
        m.mark("read")
        batches = [(pr["batchId"], pr["numInputRows"],
                    pr["durationMs"].get("triggerExecution"))
                   for pr in q.recentProgress]
        m.show("sess", rep)
        print(f"   rows={n} batches={batches}")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def run_wtopk(rep):
    m = Marks()
    workdir = tempfile.mkdtemp(prefix="probe_wtopk_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "user_id")
        chunk_dir = f"{workdir}/chunks"
        os.makedirs(chunk_dir)
        cut, maxts = R16._window_cut_ts(ev)
        m.mark("cut+maxts")
        sent = spark.createDataFrame(
            [(A.session_flush_ts(maxts, gap_ms=R16._TOPK_WINDOW_MS,
                                 watermark_delay_ms=R16._TOPK_WATERMARK_MS),
              "sentinel", -1)],
            "ts timestamp, event_type string, user_id long")
        schema = R16._drop_cut_chunks_with_sentinel(
            ev, cut, sent, workdir, chunk_dir)
        m.mark("chunks")
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "1").parquet(chunk_dir))
        out = ephemeral_out_dir("probe_wtopk_out_")
        q = A.run_windowed_topk(sdf, out, f"{workdir}/ck", k=3,
                                window=R16._TOPK_WINDOW,
                                watermark=R16._TOPK_WATERMARK)
        q.awaitTermination()
        m.mark("stream")
        n = (spark.read.parquet(out).where(F.col("user_id") >= 0)).count()
        m.mark("read")
        batches = [(pr["batchId"], pr["numInputRows"],
                    pr["durationMs"].get("triggerExecution"))
                   for pr in q.recentProgress]
        m.show("wtopk", rep)
        print(f"   rows={n} batches={batches}")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


which = sys.argv[1:] or ["asof", "iid", "sess", "wtopk"]
fns = {"asof": run_asof, "iid": run_iid, "sess": run_sess,
       "wtopk": run_wtopk}
for name in which:
    for rep in range(2):
        fns[name](rep)
print(f"calib={calibrate(spark)}")
spark.stop()
