"""Simulate the driver's CORRECTNESS gate: run the first-50 window queries
Spark-vs-DuckDB at sf0.01 and report row/schema/value agreement."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

qs, osql = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")

if os.environ.get("ONLY"):
    names = [n.strip() for n in os.environ["ONLY"].split(",") if n.strip()]
else:
    names = list(qs) if os.environ.get("ALL") else list(qs)[:50]
bad = []
for name in names:
    try:
        sdf = qs[name](spark, SF)
        cols = sorted(sdf.columns)
        srows = sorted(tuple(str(r[c]) for c in cols) for r in sdf.collect())
        if name not in osql:
            print(f"{name}: rows-only ({len(srows)})")
            continue
        res = con.execute(osql[name])
        ocols = [d[0] for d in res.description]
        order = sorted(range(len(ocols)), key=lambda i: ocols[i])
        drows = sorted(tuple(str(row[i]) for i in order)
                       for row in res.fetchall())
        ok = srows == drows
        schema_ok = cols == sorted(ocols)
        tag = "MATCH" if (ok and schema_ok) else "MISMATCH"
        if tag == "MISMATCH":
            bad.append(name)
        print(f"{name}: {tag} spark={len(srows)} oracle={len(drows)} "
              f"schema={'ok' if schema_ok else (cols, sorted(ocols))}")
    except Exception as ex:
        bad.append(name)
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
print("\nFAILED:", bad if bad else "none")
spark.stop()
