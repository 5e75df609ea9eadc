"""Round-16 staged seat definitions, to be SEATED at round 17.

Same contract as the r12-r16 batches (their module docstrings): each
entry is the EXACT (query builder, oracle) pair the registry will hold,
proven through the tests/parity.compare driver contract BEFORE
registration (tests/test_staged_seats_r17.py, round 16). A future
registry_seated_r17 module performs the mechanical seating move at
round 17; this module is the single definition site and importing it
never mutates QUERIES/ORACLES.

Why these two (named as the r17 candidates by the r15 staging module
and DE-RISKED in round 15 by scripts/probe_r17_monitors.py, which
drove both compositions end-to-end and printed oracle-exact MATCH at
sf0.01 — these rows lift that probe verbatim):

* stream_ingest_qc_batch_equivalence — run_ingest_qc
  (streaming/analytics.py: every micro-batch appends ONE telemetry row
  (batch_id, n_docs, mean_quality, gopher_pass_rate, exact_dup_rate) —
  the ingest-time quality monitor a training-data pipeline runs NEXT
  TO the sink, the way the reference commits bytes per poll batch,
  OSSSinkTask.java:160-175) driven end-to-end as a driver row. The
  oracle composes per-batch quality/gopher/dup SQL from the SAME
  fragments that back the green corpus_curriculum_order /
  text_gopher_quality_flags / dedup_exact oracles, one CTE block per
  batch, batches labeled by the replay predicate.
* stream_drift_monitor_batch_equivalence — run_drift_monitor (every
  micro-batch scored as a snapshot against a BASELINE corpus via
  operators/drift.drift_report: per-source smoothed unigram KL,
  new-vocab rate, volume/length deltas) driven end-to-end. The oracle
  is drift_report_oracle_sql — the exact SQL behind the green
  corpus_drift_report row — evaluated once per batch predicate and
  unioned with batch labels.

Both monitors are STATELESS across batches (each output row describes
only its own batch), so unlike every earlier streaming cohort there is
no sentinel flush — the whole attestation difficulty is the
deterministic batch_id -> chunk mapping, which replay.pin_time_order
settles (oldest-mtime-first file scheduling made a guarantee). What
the rows add beyond the green batch siblings: the foreachBatch
append-to-parquet telemetry path itself — batch labeling, per-batch
re-aggregation, restart-safe output — which previously had only
matches-batch pytest.

Capacity arithmetic (the r12 policy in __spark_entry__.py): the r16
seating returned the driver-visible registry to exactly 150, AND the
r16 replay-overhead rewrite reset the staleness clock of the two
seated r15 streaming rows (REWRITTEN=16: stream_asof_batch_equivalence
and stream_incremental_dedup_refresh hard-seat at r17). So the r17
window carries 2 staged + 2 rewritten hard seats over a 50-row
r14-attested obligation — FOUR retirements are needed, not two:
__spark_entry__.PLANNED_R17_RETIREMENTS names them up front (all four
latest-green r14 variant/eval/first-stage rows with surviving
siblings, all in the r14 cohort, so they also shrink the obligation
from 50 to 46). r17 window forecast: 2 staged + 2 rewritten + 46 = 50
exactly, zero deferrals; registry after seating = 150 - 4 + 2 = 148
(the 2 spare seats fund an r18 staging with zero retirements, the r14
precedent).

r18 STAGING CANDIDATES (for the r17 builder's end-of-round staging —
with the registry at 148, a two-row cohort needs NO retirements): the
remaining pytest-only streaming surfaces, in value order: (a) a
schema-evolution rotation golden row — the E1/R5 path
(operators/evolution.py detection + pipeline rotation-on-schema-change)
driven across micro-batches with alternating schemas and proven
against the read-back object inventory; (b) a streaming sliding-window
rollup equivalence row (events_sliding_rollup's streaming sibling —
overlapping F.window assignment under append mode, sentinel-flushed
like the topk row). NEITHER is de-risked yet: write a
probe_r18 script first (the r15->r17 probe-then-stage pattern).

SEATING CHECKLIST for the r17 builder (mirror registry_seated_r16's
move): (1) create registry_seated_r17.py importing this module;
(2) import it from __spark_entry__.py, tests/test_oracle_parity.py and
tests/test_plan_guards.py; (3) execute PLANNED_R17_RETIREMENTS into
RETIRED_SEATS (with COVERAGE.md waiver notes) and delete the planning
dict; (4) rebuild DRIVER_WINDOW (2 staged + the 2 REWRITTEN streaming
rows at the head + the 46 remaining r14-attested rows window_math
prints); (5) convert tests/test_staged_seats_r17.py to the seated
form and add both rows to bench.HEADLINE (the staged auto-enumerated
bench rows retire with the seating); (6) run window_math (expect
50/50, zero >=4-stale), scripts/driver_sim.py, full pytest, and a
5x-consecutive same-session stability run of both rows.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_oss_spark.functions import text as X
from kafka_connect_oss_spark.functions.rounding import round_sql
from kafka_connect_oss_spark.operators import drift as DRIFT
from kafka_connect_oss_spark.operators import text as TXT
from kafka_connect_oss_spark.sources.batch import load_table
# shared bounded-replay plumbing — single definition site for the
# streaming golden rows' harness (see streaming/replay.py docstring)
from kafka_connect_oss_spark.streaming.replay import (
    drop_labeled_chunks as _drop_labeled_chunks,
    ephemeral_out_dir as _ephemeral_out_dir,
    pin_time_order as _pin_time_order,
)

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLES: dict[str, str] = {}
STAGED_LAZY_ORACLES: dict[str, Callable[[str], str]] = {}

#: the QC replay's two micro-batches, by predicate — deliberately
#: UNEVEN (1/4 vs 3/4 of the corpus) so the per-batch telemetry rows
#: differ and a batch-labeling bug cannot cancel out
_QC_PREDS = ["doc_id % 4 = 0", "doc_id % 4 <> 0"]

#: the drift replay: baseline = even doc_ids (written as a static
#: corpus), arrivals = the two odd residues as one micro-batch each —
#: two DIFFERENT snapshots scored against ONE fixed baseline
_DRIFT_BASE_PRED = "doc_id % 2 = 0"
_DRIFT_ARRIVAL_PREDS = ["doc_id % 4 = 1", "doc_id % 4 = 3"]


def _stream_chunks(spark: SparkSession, df: DataFrame, chunk_expr,
                   names: list[str], workdir: str) -> DataFrame:
    """Drop df into one time-ordered micro-batch file per chunk label
    (ONE write job) and return the readStream over them. No sentinel:
    both monitors are stateless across batches — nothing is withheld
    at end-of-stream, so there is nothing to flush."""
    chunk_dir = f"{workdir}/chunks"
    os.makedirs(chunk_dir)
    lab = df.withColumn("chunk", chunk_expr)
    present = _drop_labeled_chunks(lab, "chunk", names, workdir, chunk_dir)
    _pin_time_order(chunk_dir, present)
    return (spark.readStream.schema(lab.drop("chunk").schema)
            .option("maxFilesPerTrigger", "1").parquet(chunk_dir))


def stream_ingest_qc_batch_equivalence(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """run_ingest_qc driven end-to-end: the documents corpus replayed
    as two uneven micro-batches; every batch appends one telemetry row
    (n_docs, mean_quality, gopher_pass_rate, exact_dup_rate) from
    foreachBatch; proven cell-for-cell equal to the same three
    quality/gopher/dup aggregates computed per batch-predicate in SQL.

    Scale note: the monitor's output is ONE row per micro-batch — the
    aggregation is a map-side-combinable mean/rate fold over the batch
    only, never over history; at 100 TB the QC table grows with batch
    COUNT, not data volume. The exact-dup rate is within-batch by
    design (cross-corpus dedup is the dedup family's job; the monitor
    is a cheap per-commit fingerprint, reference parity:
    OSSSinkTask.java:160-175 commits per poll batch)."""
    from kafka_connect_oss_spark.streaming import analytics as A

    workdir = tempfile.mkdtemp(prefix="kafka_connect_oss_spark_qc_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        sdf = _stream_chunks(
            spark, docs,
            F.when(F.expr(_QC_PREDS[0]), "c0").otherwise("c1"),
            ["c0", "c1"], workdir)
        out = _ephemeral_out_dir("kafka_connect_oss_spark_qc_out_")
        q = A.run_ingest_qc(sdf, out, f"{workdir}/ck")
        q.awaitTermination()
        # the sink outlives workdir (atexit-cleaned): LAZY parquet read
        return (spark.read.parquet(out)
                .withColumn("batch_id", F.col("batch_id").cast("long"))
                .orderBy("batch_id"))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _qc_batch_sql(pred: str) -> str:
    """One batch's QC row in DuckDB — quality/gopher/dup fragments
    IDENTICAL to the fragments behind the green corpus_curriculum_order
    / text_gopher_quality_flags / dedup_exact oracles, so both engines
    tokenize, score and gate identically."""
    tok = X.sql_tokens("text", "duckdb")
    gopher = TXT.gopher_quality_flags_oracle_sql(
        f"(SELECT * FROM documents WHERE {pred})")
    return f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       {round_sql('AVG(quality)', 4)} AS mean_quality,
       {round_sql('AVG(CASE WHEN pass_gopher THEN 1.0 ELSE 0.0 END)', 4)}
         AS gopher_pass_rate,
       {round_sql('AVG(CASE WHEN _dup THEN 1.0 ELSE 0.0 END)', 4)}
         AS exact_dup_rate
    FROM (SELECT doc_id, {X.sql_quality_duckdb('t')} AS quality
          FROM (SELECT doc_id, {tok} AS t
                FROM documents WHERE {pred})) q
    JOIN (SELECT doc_id, pass_gopher FROM ({gopher})) g USING (doc_id)
    JOIN (SELECT doc_id,
                 doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text))
                   AS _dup
          FROM documents WHERE {pred}) d USING (doc_id)"""


STAGED_QUERIES["stream_ingest_qc_batch_equivalence"] = (
    stream_ingest_qc_batch_equivalence)
STAGED_ORACLES["stream_ingest_qc_batch_equivalence"] = (
    " UNION ALL ".join(
        f"SELECT b.*, CAST({i} AS BIGINT) AS batch_id "
        f"FROM ({_qc_batch_sql(p)}) b"
        for i, p in enumerate(_QC_PREDS))
    + " ORDER BY batch_id")


def stream_drift_monitor_batch_equivalence(spark: SparkSession,
                                           sf_dir: str) -> DataFrame:
    """run_drift_monitor driven end-to-end: a fixed BASELINE corpus
    (even doc_ids) on disk, the two odd residues arriving as one
    micro-batch each; every batch is scored as a snapshot against the
    baseline (per-source smoothed unigram KL, new-vocab rate,
    volume/length deltas — operators/drift.drift_report) and appended
    with its batch_id; proven cell-for-cell equal to
    drift_report_oracle_sql per batch predicate.

    Scale note: per batch, the baseline side is a fixed pre-aggregated
    word-count profile and the snapshot side is increment-sized; the
    join is per-source-vocab bounded, so monitoring cost tracks the
    INCREMENT, not the corpus — the property that makes a per-commit
    drift gate affordable at 100 TB."""
    from kafka_connect_oss_spark.streaming import analytics as A

    workdir = tempfile.mkdtemp(prefix="kafka_connect_oss_spark_drift_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        docs.where(F.expr(_DRIFT_BASE_PRED)).write.parquet(
            f"{workdir}/baseline")
        sdf = _stream_chunks(
            spark, docs.where(~F.expr(_DRIFT_BASE_PRED)),
            F.when(F.expr(_DRIFT_ARRIVAL_PREDS[0]), "c0").otherwise("c1"),
            ["c0", "c1"], workdir)
        out = _ephemeral_out_dir("kafka_connect_oss_spark_drift_out_")
        q = A.run_drift_monitor(sdf, f"{workdir}/baseline", out,
                                f"{workdir}/ck")
        q.awaitTermination()
        # the sink outlives workdir (atexit-cleaned): LAZY parquet read
        return (spark.read.parquet(out)
                .withColumn("batch_id", F.col("batch_id").cast("long"))
                .orderBy("batch_id", "source"))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _drift_oracle_sql() -> str:
    base = f"(SELECT * FROM documents WHERE {_DRIFT_BASE_PRED})"
    return (" UNION ALL ".join(
        f"SELECT r.*, CAST({i} AS BIGINT) AS batch_id FROM "
        f"({DRIFT.drift_report_oracle_sql(base, f'(SELECT * FROM documents WHERE {p})')}) r"
        for i, p in enumerate(_DRIFT_ARRIVAL_PREDS))
        + " ORDER BY batch_id, source")


STAGED_QUERIES["stream_drift_monitor_batch_equivalence"] = (
    stream_drift_monitor_batch_equivalence)
STAGED_ORACLES["stream_drift_monitor_batch_equivalence"] = (
    _drift_oracle_sql())
