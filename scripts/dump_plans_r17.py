"""Dump .explain('formatted') for named queries to plans/r17/<q>_<tag>.txt.

Usage: python scripts/dump_plans_r17.py before q1 q2 ...
The optimization-round evidence files the judge checks plan claims
against (OPTIMIZATION_r17.md).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from kafka_connect_oss_spark.measure import resolve_query  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
tag = sys.argv[1]
names = sys.argv[2:]

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

out_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r17")
os.makedirs(out_dir, exist_ok=True)

qs = entry_mod.queries()
for name in names:
    fn = resolve_query(name, qs)
    df = fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
        f.write(plan)
    print(f"{name}: {plan.count('Exchange')} Exchange, "
          f"{plan.count('Scan parquet')} scans -> {name}_{tag}.txt")
spark.stop()
