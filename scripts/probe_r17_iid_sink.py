"""Job-by-job floor audit of the stream_incremental_dedup_refresh sink
(r16 VERDICT item 7 / r17 item 7): the r16 phase probe attributed the
row to compact(1.7) + epoch1(5.0) + epoch2(5.1); this probe opens each
epoch's SINK into its constituent jobs — staged-shingle classify +
statuses write, then the fold's three bucketed appends — to decide
whether any per-epoch job is removable or the 11-12 s row is the
attested floor.

Methodology: the registry row's exact replay (base %3==0 compacted,
two single-file chunks, availableNow epochs with checkpoint resume),
with run_incremental_dedup's sink re-stated inline and a perf_counter
around each action. One steady-state rep; components are proportions
of the epoch, not a decomposition of the bench min (the r16 ADVICE
note applies).

Usage: python scripts/probe_r17_iid_sink.py
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName("probe_r17_iid_sink")
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
from kafka_connect_oss_spark.operators import bucketing as B  # noqa: E402
from kafka_connect_oss_spark.operators import dedup  # noqa: E402
from kafka_connect_oss_spark.operators.bucketing import (  # noqa: E402
    table_n_buckets, write_bucketed)
from kafka_connect_oss_spark.operators.dedup import (  # noqa: E402
    incremental_dedup_status_from_tables, shingle_hash_pairs,
    signature_frame_from_pairs)
from kafka_connect_oss_spark.operators.lifecycle import stage_local  # noqa: E402
from kafka_connect_oss_spark.registry_staged_r15 import (  # noqa: E402
    _STREAM_SPLIT_MOD, _drop_single_file)
from kafka_connect_oss_spark.sources.batch import load_table  # noqa: E402

warm_up(spark, int(cpus))
print(f"calib: {calibrate(spark):.3f}")

workdir = tempfile.mkdtemp(prefix="probe_iid_sink_")
db = "iidprobe_" + os.path.basename(workdir).rsplit("sink_", 1)[-1]
docs = load_table(spark, sf_dir, "documents")

T = {}


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    T[label] = T.get(label, 0.0) + dt
    print(f"  {label}: {dt:.3f}s")
    return out


try:
    B.ensure_database(spark, db, f"{workdir}/state")
    t("compact_base", lambda: dedup.compact_base_tables(
        docs.where(F.col("doc_id") % _STREAM_SPLIT_MOD == 0),
        f"{db}.s", n_buckets=4))

    chunk_dir = f"{workdir}/chunks"
    os.makedirs(chunk_dir)
    out_dir = f"{workdir}/out"
    ck = f"{workdir}/ck"
    prefix = f"{db}.s"

    def drop_chunk(i):
        _drop_single_file(
            docs.where(F.col("doc_id") % _STREAM_SPLIT_MOD == i),
            workdir, chunk_dir, f"c{i}")

    def sink(batch, batch_id):
        ep = f"epoch{batch_id}"
        posts = stage_local(shingle_hash_pairs(batch, "text", 3, "doc_id"))
        status = incremental_dedup_status_from_tables(
            batch.sparkSession, prefix, batch, "text", "doc_id",
            3, 0.3, inc_posts=posts)
        status = stage_local(status)
        t(f"{ep} classify+status write", lambda: (
            status.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(out_dir)))
        kept = batch.join(
            status.where(F.col("status") == "kept").select("doc_id"),
            "doc_id", "semi")
        # fold_accepted_into_state, opened up job by job
        breps = spark.table(f"{prefix}_digests")
        kd = kept.select("doc_id", F.md5(F.col("text")).alias("_d"))
        firsts = kd.groupBy("_d").agg(F.min("doc_id").alias("_rep"))
        new = stage_local(firsts.join(breps, "_d", "anti"))
        new_ids = new.select(F.col("_rep").alias("doc_id"))
        sig = stage_local(signature_frame_from_pairs(
            posts.join(new_ids, "doc_id", "semi"), "doc_id"))
        t(f"{ep} fold sig append", lambda: write_bucketed(
            sig, f"{prefix}_sig", ["doc_id"],
            table_n_buckets(spark, f"{prefix}_sig"), mode="append"))
        post = sig.select("doc_id", F.explode("hh").alias("_h"))
        t(f"{ep} fold postings append", lambda: write_bucketed(
            post, f"{prefix}_postings", ["_h"],
            table_n_buckets(spark, f"{prefix}_postings"), mode="append"))
        t(f"{ep} fold digests append", lambda: write_bucketed(
            new.select("_d", "_rep"), f"{prefix}_digests", ["_d"],
            table_n_buckets(spark, f"{prefix}_digests"), mode="append"))

    drop_chunk(1)
    schema = spark.read.parquet(chunk_dir).schema

    def run_epoch(n):
        t0 = time.perf_counter()
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "1").parquet(chunk_dir))
        q = (sdf.writeStream.outputMode("append")
             .option("checkpointLocation", ck)
             .foreachBatch(sink).trigger(availableNow=True).start())
        q.awaitTermination()
        print(f"epoch {n} total: {time.perf_counter() - t0:.3f}s")

    t0_all = time.perf_counter()
    run_epoch(1)
    drop_chunk(2)
    run_epoch(2)
    readback = spark.read.parquet(out_dir).count()
    print(f"both epochs + readback ({readback} rows): "
          f"{time.perf_counter() - t0_all:.3f}s")
    sink_total = sum(v for k, v in T.items() if k != "compact_base")
    print(f"sink jobs total: {sink_total:.3f}s "
          f"(epoch wall minus this = stream start/stop + no-data "
          f"micro-batch + checkpoint machinery)")
    print(f"calib after: {calibrate(spark):.3f}")
finally:
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
