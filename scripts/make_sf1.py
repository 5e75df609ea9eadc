#!/usr/bin/env python
"""Materialize an sf1-scale copy of the driver testdata (10x sf0.1) under
/tmp for the bench anchor: several sub-second sf0.1 entries are dominated
by fixed job overhead, so the 2x-of-baseline claim needs one measurement
at a scale where data cost dominates (VERDICT r04 stretch item).

Fact tables are 10 id-shifted copies with a SHARED shift per key entity,
so every foreign key keeps resolving (copy i of orders references copy i
of customer, etc.); nation/region stay single-copy dimensions, exactly
like TPC-H dbgen at any SF. No synthetic generation — every byte derives
from the driver's own parquet.

    python scripts/make_sf1.py               # -> /tmp/spark_graft_sf1
    SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
N = int(os.environ.get("SCALE", "10"))

#: table -> {column: shift-entity}; shift amounts are computed ONCE per
#: entity from its owning table, then applied everywhere it is referenced
KEYS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
OWNER = {"cust": ("customer", "c_custkey"), "supp": ("supplier", "s_suppkey"),
         "part": ("part", "p_partkey"), "order": ("orders", "o_orderkey"),
         "event": ("events", "event_id"), "user": ("events", "user_id"),
         "doc": ("documents", "doc_id"), "vec": ("embeddings", "vec_id")}
DIMS = ("region", "nation")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[32]")
             .appName("make-sf1")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_MEM", "48g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from kafka_connect_oss_spark.sources.batch import load_table

    shift = {}
    for ent, (tbl, col) in OWNER.items():
        shift[ent] = (load_table(spark, SRC, tbl)
                      .agg(F.max(col)).first()[0] or 0) + 1

    def write_single_file(df, tbl: str) -> None:
        # the driver layout is ONE FILE per table named <tbl>.parquet (the
        # file-stream source globs on that name), so write a 1-part dir and
        # move the part file into place
        import glob as _glob
        import shutil

        tmp = f"{OUT}/_tmp_{tbl}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = f"{OUT}/{tbl}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        shutil.move(part, dst)
        shutil.rmtree(tmp)

    os.makedirs(OUT, exist_ok=True)
    for tbl in DIMS:
        write_single_file(load_table(spark, SRC, tbl), tbl)
        print(f"{tbl}: dimension, single copy")
    for tbl, cols in KEYS.items():
        df = load_table(spark, SRC, tbl)
        parts = [df.select(*[
            (F.col(c) + i * shift[cols[c]]).alias(c) if c in cols
            else F.col(c) for c in df.columns]) for i in range(N)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        write_single_file(out, tbl)
        print(f"{tbl}: x{N}")
    print("done ->", OUT)


if __name__ == "__main__":
    main()
