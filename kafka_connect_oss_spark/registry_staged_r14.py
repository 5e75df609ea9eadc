"""Round-13 staged seat definitions, to be SEATED at round 14.

Same contract as the r12 and r13 batches (registry_staged_r12/_r13
module docstrings): each entry is the EXACT (query builder, oracle)
pair the registry will hold, proven through the tests/parity.compare
driver contract BEFORE registration (tests/test_staged_seats_r14.py,
round 13). A future registry_seated_r14 module performs the mechanical
seating move at round 14; this module is the single definition site
and importing it never mutates QUERIES/ORACLES.

Why these two (the r12 judge's item 6 named both candidates — each an
operator that exists and is pytest-pinned but had no driver row):

* stream_cms_batch_equivalence — the streaming Count-Min monitor
  (streaming/analytics.run_cms_monitor, r12) driven END-TO-END inside
  a registry row: the corpus arrives as a multi-batch availableNow
  file stream, each micro-batch writes its own d x w sketch partition,
  and the row returns sketches.cms_merge over the whole partition set.
  The oracle is the BATCH sketch of the same corpus
  (sketches.cms_table_oracle_sql) — mergeability is the theorem, the
  driver compare is its proof, and this is the repo's first
  driver-attested row whose value flows through writeStream/
  foreachBatch (the §2 rotation-file rows attest streaming file
  layout; this attests streaming STATE correctness).
* sketch_kmv_source_overlap — the cross-source overlap PLANNER
  (operators/sketches.kmv_source_overlap): all source pairs' shared-
  shingle estimates from per-source KMV sketches — one corpus distinct
  + a two-level K-min fold vs the exact matrix's three corpus-scale
  stages (what you run over 100 TB BEFORE paying for
  corpus_cross_source_overlap). kmv_key_overlap (row
  sketch_user_overlap_kmv) is the two-frame primitive; this seats its
  all-pairs grouped form.

Capacity arithmetic (the r12 policy in __spark_entry__.py): seating
two at r14 requires two retirements; the planned rows are named in
__spark_entry__.PLANNED_R14_RETIREMENTS with their attested siblings
(both latest-green r11, so retiring them also shrinks the r14 rotation
obligation by two), keeping the driver-visible registry at exactly 150.

SEATING CHECKLIST for the r14 builder (mirror registry_seated_r13's
move): (1) create registry_seated_r14.py importing this module;
(2) import it from __spark_entry__.py, tests/test_oracle_parity.py and
tests/test_plan_guards.py; (3) move PLANNED_R14_RETIREMENTS into
RETIRED_SEATS and delete the planning dict; (4) rebuild DRIVER_WINDOW
(2 staged at the head + the 48 remaining r11-attested rows —
scripts/window_math.py prints the list); (5) convert
tests/test_staged_seats_r14.py to the seated form and move
test_plan_guards.STAGED_PINS into PINS; (6) run window_math
(expect 50/50, zero >=4-stale), scripts/driver_sim.py, full pytest.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import sketches as SK
from kafka_connect_oss_spark.sources.batch import load_table

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLES: dict[str, str] = {}
STAGED_LAZY_ORACLES: dict[str, Callable[[str], str]] = {}

#: the streaming row splits the corpus into this many single-file
#: micro-batches (maxFilesPerTrigger=1) so cms_merge folds a REAL
#: multi-partition set — one batch would make mergeability vacuous
_CMS_STREAM_CHUNKS = 2


def stream_cms_batch_equivalence(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Streaming CMS monitor end-to-end: documents replayed as a
    _CMS_STREAM_CHUNKS-batch availableNow file stream through
    streaming/analytics.run_cms_monitor (each micro-batch writes its
    own d x w counter partition under batch_id=N), then cms_merge over
    the accumulated partition set. Mergeability means the result must
    equal the batch sketch of the whole corpus cell-for-cell — which is
    exactly what the oracle computes, so the driver compare attests the
    stream pipeline, the per-batch sketch build, AND the merge in one
    row. Chunking is by doc_id parity (deterministic), and the merged
    cells are chunking-invariant anyway (cell-wise sums commute).

    Scale note: the streamed state is d*w rows per batch (kilobytes);
    the equivalence property is what lets a 100 TB ingest keep running
    token frequencies without ever rebuilding from the corpus.

    Harness note (r16 optimization): the chunk files land in ONE write
    job via replay.drop_labeled_chunks (the one-job pattern the
    r15/r16 cohorts use — each per-chunk coalesce(1) write previously
    cost its own job + parquet commit of pure fixed latency), and the
    replay order is mtime-PINNED instead of resting on copy-order
    mtimes. The merged cells are chunking-order-invariant anyway
    (cell-wise sums commute), so the pin hardens only the batch_id ->
    chunk mapping, not the result."""
    from kafka_connect_oss_spark.streaming import analytics as A
    from kafka_connect_oss_spark.streaming.replay import (
        drop_labeled_chunks, pin_time_order)

    import os

    workdir = tempfile.mkdtemp(prefix="kafka_connect_oss_spark_cms_eq_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        chunk_dir = f"{workdir}/chunks"
        os.makedirs(chunk_dir)
        # label = c{doc_id % N}: same row->chunk mapping as the old
        # per-chunk filters (rows whose label is not a listed name —
        # impossible for non-negative ids — are dropped identically)
        lab = docs.withColumn(
            "chunk", F.concat(F.lit("c"), (F.col("doc_id")
                                           % _CMS_STREAM_CHUNKS)
                              .cast("string")))
        present = drop_labeled_chunks(
            lab, "chunk", [f"c{i}" for i in range(_CMS_STREAM_CHUNKS)],
            workdir, chunk_dir)
        pin_time_order(chunk_dir, present)
        schema = lab.drop("chunk").schema
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "1").parquet(chunk_dir))
        q = A.run_cms_monitor(sdf, f"{workdir}/out", f"{workdir}/ck")
        q.awaitTermination()
        merged = SK.cms_merge(spark.read.parquet(f"{workdir}/out"))
        # the stream sink is torn down with workdir after collection;
        # materialize before cleanup
        rows = merged.orderBy("j", "bucket").collect()
        return spark.createDataFrame(rows, merged.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


STAGED_QUERIES["stream_cms_batch_equivalence"] = stream_cms_batch_equivalence
STAGED_ORACLES["stream_cms_batch_equivalence"] = SK.cms_table_oracle_sql(
    "documents")


def sketch_kmv_source_overlap(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """All-pairs cross-source overlap estimates from per-source KMV
    shingle sketches (operators/sketches.kmv_source_overlap) — the
    planner that decides which pairs are worth the exact
    corpus_cross_source_overlap matrix."""
    return SK.kmv_source_overlap(load_table(spark, sf_dir, "documents"))


STAGED_QUERIES["sketch_kmv_source_overlap"] = sketch_kmv_source_overlap
STAGED_ORACLES["sketch_kmv_source_overlap"] = (
    SK.kmv_source_overlap_oracle_sql("documents"))
