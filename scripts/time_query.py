"""Min-of-N wall timer for registered queries: python scripts/time_query.py q1 [q2 ...]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_REPS (default 3).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

qs = entry_mod.queries()
for name in sys.argv[1:]:
    times = []
    for _ in range(reps):
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        n = df.count()
        times.append(time.monotonic() - t0)
    print(f"{name}: min={min(times):.2f}s all={[round(t, 2) for t in times]} rows={n}")
spark.stop()
