"""One-off r16 probe: per-step prep timing for the asof harness."""
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

from kafka_connect_oss_spark.sources.batch import load_table  # noqa: E402
from kafka_connect_oss_spark.streaming.replay import (  # noqa: E402
    drop_single_file, few_shuffle_partitions, pin_time_order)

load_table(spark, sf_dir, "events").count()


def step(label, t0):
    t1 = time.time()
    print(f"  {label}: {t1 - t0:.2f}s")
    return t1


for rep in range(2):
    print(f"--- rep {rep}")
    with few_shuffle_partitions(spark, 4):
        workdir = tempfile.mkdtemp(prefix="probe_prep_")
        t = time.time()
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
        t = step("persist+agg", t)
        chunk_dir = f"{workdir}/chunks"
        os.makedirs(chunk_dir)
        drop_single_file(base.where(F.col("ts") < F.lit(stats["cut"])),
                         workdir, chunk_dir, "c1")
        t = step("c1 write", t)
        drop_single_file(base.where(F.col("ts") >= F.lit(stats["cut"])),
                         workdir, chunk_dir, "c2")
        t = step("c2 write", t)
        base.unpersist()
        import datetime
        drop_single_file(spark.createDataFrame(
            [(-1, stats["maxts"] + datetime.timedelta(hours=1), -1, 0)],
            "user_id long, ts timestamp, event_id long, side int"),
            workdir, chunk_dir, "c9_sentinel")
        t = step("sentinel write", t)
        pin_time_order(chunk_dir, ["c1", "c2", "c9_sentinel"])
        schema = spark.read.parquet(chunk_dir).schema
        t = step("schema read", t)
        shutil.rmtree(workdir, ignore_errors=True)
