#!/usr/bin/env python
"""BPE fit at realistic vocabulary scale (r11 VERDICT item 7).

fit_bpe_merges is proven correct at toy merge counts (test_bpe.py,
BPE_N_MERGES=24 in the registry). The design's load-bearing promise at
real tokenizer scale (~1k merges) is that the per-round re-staging
(localCheckpoint discipline) keeps BOTH of these flat as rounds
accumulate:

* per-round wall time (a lineage pile-up would grow it linearly), and
* plan node count of the staged word frame (the flat-plan-depth claim).

This probe runs one fit at $SPARK_GRAFT_SF_DIR (default the sf1
materialization, scripts/make_sf1.py -> /tmp/spark_graft_sf1) with
N_MERGES=$SPARK_GRAFT_BPE_MERGES (default 1000) and prints one JSON
line: total wall, per-round wall summarized by quarter of the run
(flat == quarters comparable), plan node counts sampled every 100
rounds (flat == constant), and the learned-merge tail as a sanity
check. Result recorded in the BENCH_SF1_r12 notes.

Corpus: documents.text UNION customer.c_name. The synthetic documents
table has a 31-word vocabulary, which exhausts BPE after ~93 merges
(measured); c_name contributes 15k distinct words (numeric-ID shaped),
sustaining 1k+ merges. Per-round cost is O(word-table size) by design,
so a 15k-word table is exactly the realistic-regime probe — what the
words spell doesn't matter to the wall-time claim.
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/spark_graft_sf1")
N_MERGES = int(os.environ.get("SPARK_GRAFT_BPE_MERGES", "1000"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_connect_oss_spark.operators import bpe
    from kafka_connect_oss_spark.sources.batch import load_table

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("probe-r12-bpe")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_MEM", "48g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")

    docs = (load_table(spark, SF_DIR, "documents").select("text")
            .unionByName(load_table(spark, SF_DIR, "customer")
                         .select(F.col("c_name").alias("text"))))
    round_wall: list[float] = []
    plan_nodes: dict[int, int] = {}
    last = time.perf_counter()

    last_wf = {}

    def on_round(i: int, wf) -> None:
        nonlocal last
        now = time.perf_counter()
        round_wall.append(now - last)
        last = now
        last_wf["i"], last_wf["wf"] = i, wf
        if i % 100 == 0:
            plan = wf._jdf.queryExecution().explainString(jmode)
            plan_nodes[i] = len(re.findall(r"^\(\d+\) ", plan, re.M))

    t0 = time.perf_counter()
    merges = bpe.fit_bpe_merges(docs, N_MERGES, on_round=on_round)
    total = time.perf_counter() - t0
    # on_round only fires after a RECORDED merge: when the fit stops
    # EARLY (exhausted vocabulary / no pair with freq >= 2), the
    # terminal round still ran the full vocab-scale aggregate — append
    # its wall so the quarter means cover every round total_wall_sec
    # covers. A fit that reaches the requested cap has no such round.
    if len(merges) < N_MERGES:
        round_wall.append(time.perf_counter() - last)
    if last_wf and last_wf["i"] not in plan_nodes:
        # sample the FINAL round too (the fit may exhaust early, so the
        # last round index is only known after the loop)
        plan = last_wf["wf"]._jdf.queryExecution().explainString(jmode)
        plan_nodes[last_wf["i"]] = len(re.findall(r"^\(\d+\) ", plan, re.M))

    n = len(round_wall)
    # four near-equal quarters covering EVERY round (an early-exhausted
    # fit must not drop its tail — that is where lineage pile-up shows)
    bounds = [round(n * f / 4) for f in range(5)]
    quarters = [
        round(sum(round_wall[a:b]) / max(b - a, 1), 4)
        for a, b in zip(bounds, bounds[1:]) if b > a]
    out = {
        "sf_dir": SF_DIR,
        "n_merges_requested": N_MERGES,
        "n_merges_learned": len(merges),
        "total_wall_sec": round(total, 2),
        "mean_round_sec_by_quarter": quarters,
        "max_round_sec": round(max(round_wall), 3) if round_wall else None,
        "plan_nodes_by_round": plan_nodes,
        "last_merge": merges[-1] if merges else None,
        "last_merge_freq": merges[-1][2] if merges else None,
    }
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
