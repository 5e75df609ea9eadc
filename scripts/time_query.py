"""Min-of-N wall timer for registered queries: python scripts/time_query.py q1 [q2 ...]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_REPS (default 3).

Prints the fixed-plan ambient-load calibration probe (bench.py's
_calibrate shape) before and after the queries: only believe a
round-over-round delta when calib is at its quiet baseline (~0.26 s at
32 cpus on a quiet box; >0.4 s marks the reading contaminated — the
r10/r11 adjudication rule).
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


# calibration + warm-up + lookup shared with bench.py (measure.py —
# the probe must stay code-identical across both consumers)
from kafka_connect_oss_spark.measure import (  # noqa: E402
    calibrate as _calib, resolve_query, warm_up)


def calibrate() -> float:
    return _calib(spark)


warm_up(spark, int(cpus))

print(f"calib_before={calibrate()}")
qs = entry_mod.queries()
for name in sys.argv[1:]:
    fn = resolve_query(name, qs)
    times = []
    for _ in range(reps):
        spark.catalog.clearCache()
        # same discipline as bench.py: drain Python GC outside the
        # timed region (mid-rep collection of a prior rep's DataFrame
        # refs stalls the driver in py4j detach/unpersist — the cause
        # of the sporadic 5-10x rep spikes on staged-plan rows)
        import gc
        gc.collect()
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        n = df.count()
        times.append(time.monotonic() - t0)
    print(f"{name}: min={min(times):.2f}s all={[round(t, 2) for t in times]} rows={n}")
print(f"calib_after={calibrate()}")
spark.stop()
