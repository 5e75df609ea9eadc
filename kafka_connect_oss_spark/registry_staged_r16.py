"""Round-15 staged seat definitions, to be SEATED at round 16.

Same contract as the r12-r15 batches (their module docstrings): each
entry is the EXACT (query builder, oracle) pair the registry will hold,
proven through the tests/parity.compare driver contract BEFORE
registration (tests/test_staged_seats_r16.py, round 15). A future
registry_seated_r16 module performs the mechanical seating move at
round 16; this module is the single definition site and importing it
never mutates QUERIES/ORACLES.

Why these two (the r14 staging module named BOTH as the r16 candidates,
in value order — each is a pytest-only streaming golden form whose
state machinery has no driver attestation):

* stream_sessionize_batch_equivalence — the custom stateful session
  operator (streaming/analytics.sessionize, applyInPandasWithState +
  event-time timeouts: per-user (start, last, count) state with a
  30-min gap timeout) driven end-to-end inside a driver row and proven
  EXACTLY equal to batch gap sessionization. Bounded replays withhold
  sessions still open at end-of-stream (append mode never passes their
  last+gap timeout — the r07 probe withheld 600 sessions), which is
  why test_sessionize_matches_batch_sessionization can only assert
  subset+coverage; the session_flush_ts SENTINEL (one event under the
  reserved SESSION_FLUSH_USER key, far enough to out-run gap +
  watermark delay) drives the final watermark past every open
  session's timeout, so the emitted set becomes ALL real sessions and
  the oracle is simply the gaps-and-islands SQL (the same shape the
  green sessions_per_user row uses). Unlike the r15 asof row (newest
  right-row state), session state is a RUNNING AGGREGATE that must
  survive micro-batch boundaries intact — this row is the first driver
  attestation of that state shape.
* stream_windowed_topk_batch_equivalence — the two-piece streaming
  top-k (streaming/analytics.streaming_windowed_counts +
  topk_of_closed_windows inside foreachBatch: append-final hourly
  counts, then per-batch ranking — rank over a streaming frame is
  unsupported, this is the documented Structured Streaming shape)
  driven end-to-end and proven EXACTLY equal to the batch hourly
  top-3. The same sentinel trick (one far-future event) pushes the
  final watermark past every real window's end, so every window closes
  and emits — the pytest's "got <= want, >=90%" weakens to equality.
  Append mode emits a closed window's rows exactly once, in one batch,
  which is precisely the invariant that makes per-batch ranking equal
  global ranking — the row attests that invariant, not just the
  counts.

Capacity arithmetic (the r12 policy in __spark_entry__.py): the r15
seating returned the driver-visible registry to exactly 150, so
seating these two at r16 REQUIRES two retirements —
__spark_entry__.PLANNED_R16_RETIREMENTS names them up front
(sessions_per_user and events_top_users_per_type: each is the batch
variant row whose machinery its staged streaming sibling attests
strictly more of, and both sit in the r13-attested cohort that is
r16's rotation obligation, so retiring them also shrinks that
obligation from 50 to 48). r16 window forecast: 2 staged + the 48
remaining r13-attested rows = 50 exactly, zero deferrals
(scripts/window_math.py models this).

r17 STAGING CANDIDATES (for the r16 builder's end-of-round staging —
retirements will be needed again): the remaining pytest-only
foreachBatch golden forms, in value order: (a) a run_drift_monitor row
(per-batch distribution vs a baseline profile); (b) a run_ingest_qc
row (per-batch quality/gopher/dup telemetry). BOTH ARE ALREADY
DE-RISKED: scripts/probe_r17_monitors.py drives each as a two-batch
pinned-order replay against a composed DuckDB oracle and prints MATCH
at sf0.01 — lift those compositions into the staged module. Both are
stateless across batches, so no sentinel flush is needed; the only
harness subtlety is the deterministic batch labeling, which
replay.pin_time_order settles. Natural retirements: latest-green
variant rows with seated siblings, chosen by the same criteria as the
r14/r16 pairs.

SEATING CHECKLIST for the r16 builder (mirror registry_seated_r15's
move): (1) create registry_seated_r16.py importing this module;
(2) import it from __spark_entry__.py, tests/test_oracle_parity.py and
tests/test_plan_guards.py; (3) execute PLANNED_R16_RETIREMENTS into
RETIRED_SEATS (with COVERAGE.md waiver notes) and delete the planning
dict; (4) rebuild DRIVER_WINDOW (2 staged at the head + the 48
remaining r13-attested rows window_math prints — plus any row
REWRITTEN during r15+ under the rewrite-resets-staleness rule);
(5) convert tests/test_staged_seats_r16.py to the seated form (the
cohort is deliberately unpinned in test_plan_guards.STAGED_PINS —
lazy sink reads, the r13 ADVICE 3 rationale); (6) run window_math
(expect 50/50, zero >=4-stale), scripts/driver_sim.py, full pytest.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_oss_spark.sources.batch import load_table
# shared bounded-replay plumbing — single definition site for the
# streaming golden rows' harness (see streaming/replay.py docstring)
from kafka_connect_oss_spark.streaming.replay import (
    drop_labeled_chunks as _drop_labeled_chunks,
    ephemeral_out_dir as _ephemeral_out_dir,
    pin_time_order as _pin_time_order,
    require_nodata_microbatches as _require_nodata_microbatches,
)

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLES: dict[str, str] = {}
STAGED_LAZY_ORACLES: dict[str, Callable[[str], str]] = {}

#: mirrors registry_relational.SESSION_GAP_MS (not imported — importing
#: that module registers its queries, and a staged definition module
#: must never touch the live registry)
_SESS_GAP_MS = 30 * 60 * 1000

_TOPK_K = 3
#: the sentinel arithmetic (session_flush_ts) needs these horizons in
#: ms, and the stream API needs them as interval strings — the ms value
#: is primary and the string DERIVED so the two can never drift (r15
#: ADVICE: the topk sentinel silently relied on session_flush_ts's
#: default watermark_delay_ms equaling the "2 hours" literal)
_TOPK_WINDOW_MS = 60 * 60 * 1000
_TOPK_WINDOW = f"{_TOPK_WINDOW_MS // 60000} minutes"
_TOPK_WATERMARK_MS = 2 * 3600 * 1000
_TOPK_WATERMARK = f"{_TOPK_WATERMARK_MS // 60000} minutes"
_SESS_WATERMARK_MS = 2 * 3600 * 1000
_SESS_WATERMARK = f"{_SESS_WATERMARK_MS // 60000} minutes"


def _session_cut_ts(ev: DataFrame):
    """A timestamp strictly INSIDE some session — the 2nd distinct ts
    of the earliest multi-ts session — so splitting the replay at it
    (ts < cut | ts >= cut) forces at least one session's state to
    survive a micro-batch boundary. A count-based ntile split lands
    between sessions at every test SF (sessions are 2-3 events wide),
    which would make the multi-batch replay VACUOUS: a build that
    dropped state between batches would still pass parity. Placing the
    cut mid-session is what makes the cross-batch claim load-bearing
    (tests/test_staged_seats_r16.py pins it). Returns (cut, maxts):
    cut is None when no session has two distinct ts (degenerate
    corpus) — the caller then replays as a single real batch, still
    correct, just single-batch. maxts (the sentinel anchor) rides in
    the SAME collect as a 1-row cross join: the prep phase pays one
    driver job instead of two (r16 optimization — guide §1.2 "don't
    compute things you throw away" applied to job count; ~0.2-0.4 s of
    fixed per-rep latency at any SF). HARNESS-ONLY, like the r15
    chunking: a deployed stream arrives in arrival order and never
    plans its own batch boundaries."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    lab = (ev
           .withColumn("prev", F.lag("ts").over(w))
           .withColumn("brk", (F.col("prev").isNull() | (
               F.unix_micros("ts") - F.unix_micros("prev")
               > _SESS_GAP_MS * 1000)).cast("int"))
           .withColumn("sid", F.sum("brk").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    multi = (lab.groupBy("user_id", "sid")
             .agg(F.min("ts").alias("t0"),
                  F.count_distinct("ts").alias("nts"))
             .where(F.col("nts") > 1)
             .orderBy("t0", "user_id").limit(1))
    row = (multi.alias("m")
           .join(lab.alias("l"), (F.col("m.user_id") == F.col("l.user_id"))
                 & (F.col("m.sid") == F.col("l.sid"))
                 & (F.col("l.ts") > F.col("m.t0")))
           .agg(F.min("l.ts").alias("cut"))
           .crossJoin(ev.agg(F.max("ts").alias("maxts"))).collect())
    return (row[0]["cut"], row[0]["maxts"]) if row else (None, None)


def _window_cut_ts(ev: DataFrame):
    """Same idea for the top-k row: a timestamp strictly inside the
    earliest hourly window that has >= 2 distinct ts, so at least one
    window's streaming aggregate accumulates across two micro-batches
    before the watermark closes it. Returns (cut, maxts) from one
    collect, like ``_session_cut_ts``."""
    win = (ev.groupBy(F.window("ts", _TOPK_WINDOW).alias("w"))
           .agg(F.min("ts").alias("t0"),
                F.count_distinct("ts").alias("nts"))
           .where(F.col("nts") > 1)
           .orderBy("t0").limit(1))
    row = (win.alias("m")
           .join(ev.alias("l"),
                 (F.col("l.ts") >= F.col("m.w.start"))
                 & (F.col("l.ts") < F.col("m.w.end"))
                 & (F.col("l.ts") > F.col("m.t0")))
           .agg(F.min("l.ts").alias("cut"))
           .crossJoin(ev.agg(F.max("ts").alias("maxts"))).collect())
    return (row[0]["cut"], row[0]["maxts"]) if row else (None, None)


def _drop_cut_chunks_with_sentinel(df: DataFrame, cut, sent: DataFrame,
                                   workdir: str, chunk_dir: str):
    """Split the replay at `cut` into two globally time-ordered
    micro-batch files (everything before the cut, then the rest; with
    no cut, one real batch), with the sentinel row riding INSIDE the
    final chunk file — it only has to be processed with-or-after every
    real row for the flush argument to hold, and merging it saves one
    whole micro-batch of fixed overhead (r15 VERDICT item 2). All
    chunks land in ONE write job (replay.drop_labeled_chunks) and the
    replay order is mtime-pinned. Returns the chunk row schema for
    readStream (saves the schema-inference read of the files)."""
    names = ["c1", "c2"] if cut is not None else ["c1"]
    chunk = (F.when(F.col("ts") < F.lit(cut), "c1").otherwise("c2")
             if cut is not None else F.lit("c1"))
    lab = (df.withColumn("chunk", chunk)
           .unionByName(sent.withColumn("chunk", F.lit(names[-1]))))
    present = _drop_labeled_chunks(lab, "chunk", names, workdir, chunk_dir)
    _pin_time_order(chunk_dir, present)
    return lab.drop("chunk").schema


def stream_sessionize_batch_equivalence(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Streaming sessionization (applyInPandasWithState, 30-min gap,
    event-time timeouts) proven cell-for-cell equal to batch
    gaps-and-islands sessionization, replayed as two time-ordered
    micro-batches CUT MID-SESSION (_session_cut_ts — so the attested
    state provably survives a batch boundary) with a session_flush_ts
    sentinel under the reserved SESSION_FLUSH_USER key riding in the
    final chunk (processed with-or-after every real row, which is all
    the flush argument needs). The sentinel advances the
    final watermark past every open session's last+gap timeout, so ALL
    real sessions emit (append-mode withholding, the reason the pytest
    only asserts subset+coverage, is exactly what the sentinel
    discharges); the sentinel's own open session is the only one
    withheld and its key is filtered at the end.

    Scale note: state per user is one (start, last, count) triple,
    evicted at timeout — a 100 TB stream's state is bounded by the
    number of users concurrently inside the watermark horizon, never
    by history length. Reference parity: the per-writer state tuple
    the reference keeps per partition (TopicPartitionWriter.java:63-87)
    maps onto exactly this (key -> state row, timeout) shape."""
    from kafka_connect_oss_spark.shipping import ensure_package_on_executors
    from kafka_connect_oss_spark.streaming import analytics as A

    ensure_package_on_executors(spark)
    _require_nodata_microbatches(spark, "stream_sessionize_batch_equivalence")
    workdir = tempfile.mkdtemp(prefix="kafka_connect_oss_spark_sess_")
    try:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
        chunk_dir = f"{workdir}/chunks"
        os.makedirs(chunk_dir)
        # one prep collect: the cut search carries maxts with it
        cut, maxts = _session_cut_ts(ev)
        sent = spark.createDataFrame(
            [(A.SESSION_FLUSH_USER,
              A.session_flush_ts(maxts, gap_ms=_SESS_GAP_MS,
                                 watermark_delay_ms=_SESS_WATERMARK_MS))],
            "user_id long, ts timestamp")
        schema = _drop_cut_chunks_with_sentinel(
            ev, cut, sent, workdir, chunk_dir)
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "1").parquet(chunk_dir))
        out = _ephemeral_out_dir("kafka_connect_oss_spark_sess_out_")
        q = (A.sessionize(sdf, gap_ms=_SESS_GAP_MS,
                          watermark=_SESS_WATERMARK)
             .writeStream.outputMode("append")
             .option("checkpointLocation", f"{workdir}/ck")
             .trigger(availableNow=True).start(out))
        q.awaitTermination()
        # the sink outlives workdir (atexit-cleaned): LAZY parquet read.
        # epoch-us projection matches the green sessions_per_user
        # oracle's convention (value-preserving under the UTC pin)
        return (spark.read.parquet(out)
                .where(F.col("user_id") >= 0)
                .select("user_id",
                        F.unix_micros("session_start")
                        .alias("session_start_us"),
                        F.unix_micros("session_end")
                        .alias("session_end_us"),
                        "n_events")
                .orderBy("user_id", "session_start_us"))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


STAGED_QUERIES["stream_sessionize_batch_equivalence"] = (
    stream_sessionize_batch_equivalence)
# the gaps-and-islands SQL — the same shape the green sessions_per_user
# oracle uses, minus the session_id (the streaming operator does not
# number sessions; per-user sessions are disjoint in time, so the
# (user, start) pair is already a unique key). LAG ordered by ts alone
# is deterministic here: equal-ts ties have delta 0, which can never
# straddle a 30-min break.
STAGED_ORACLES["stream_sessionize_batch_equivalence"] = f"""WITH seq AS (
    SELECT user_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
    FROM events),
brk AS (
    SELECT user_id, ts,
           CASE WHEN prev IS NULL
                OR epoch_us(ts) - epoch_us(prev) > {_SESS_GAP_MS * 1000}
                THEN 1 ELSE 0 END AS is_break
    FROM seq),
sid AS (
    SELECT user_id, ts,
           SUM(is_break) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM brk)
SELECT user_id, epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) AS session_end_us, COUNT(*) AS n_events
FROM sid GROUP BY user_id, session_id
ORDER BY user_id, session_start_us"""


def stream_windowed_topk_batch_equivalence(spark: SparkSession,
                                           sf_dir: str) -> DataFrame:
    """Streaming top-k (append-final hourly counts ->
    topk_of_closed_windows inside foreachBatch) proven cell-for-cell
    equal to the batch hourly top-3 per (window, event_type), replayed
    as two time-ordered micro-batches CUT MID-WINDOW (_window_cut_ts —
    so at least one window's aggregate provably accumulates across a
    batch boundary before closing) with a far-future sentinel event
    riding in the final chunk (processed with-or-after every real row,
    which is all the flush argument needs).
    The sentinel pushes the final watermark past every
    real window's end (session_flush_ts with gap = the window length:
    maxts + 1h + watermark delay + margin, so watermark lands at
    maxts + 1h + margin > every real window end), so every window
    closes and emits; append mode emits a closed window's rows exactly
    ONCE, all in the same micro-batch — the invariant that makes the
    per-batch ranking equal the global ranking, and the thing this row
    attests beyond the counts. The sentinel's own window never closes
    (its key is filtered defensively anyway).

    Scale note: state is one count per (open window, event_type, user)
    triple inside the watermark horizon — eviction at window close
    keeps it bounded regardless of stream length; the per-batch rank
    is a per-window-sized sort, never global."""
    from kafka_connect_oss_spark.streaming import analytics as A

    _require_nodata_microbatches(
        spark, "stream_windowed_topk_batch_equivalence")
    workdir = tempfile.mkdtemp(prefix="kafka_connect_oss_spark_wtopk_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "user_id")
        chunk_dir = f"{workdir}/chunks"
        os.makedirs(chunk_dir)
        # one prep collect: the cut search carries maxts with it
        cut, maxts = _window_cut_ts(ev)
        # gap = the window length and delay = the stream's watermark, so
        # the sentinel lands at maxts + window + watermark + margin —
        # past every real window's close threshold by construction
        sent = spark.createDataFrame(
            [(A.session_flush_ts(maxts, gap_ms=_TOPK_WINDOW_MS,
                                 watermark_delay_ms=_TOPK_WATERMARK_MS),
              "sentinel", -1)],
            "ts timestamp, event_type string, user_id long")
        schema = _drop_cut_chunks_with_sentinel(
            ev, cut, sent, workdir, chunk_dir)
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "1").parquet(chunk_dir))
        out = _ephemeral_out_dir("kafka_connect_oss_spark_wtopk_out_")
        q = A.run_windowed_topk(sdf, out, f"{workdir}/ck", k=_TOPK_K,
                                window=_TOPK_WINDOW,
                                watermark=_TOPK_WATERMARK)
        q.awaitTermination()
        # the sink outlives workdir (atexit-cleaned): LAZY parquet read
        return (spark.read.parquet(out)
                .where(F.col("user_id") >= 0)
                .select(F.unix_micros("window_start")
                        .alias("window_start_us"),
                        "event_type", "user_id", "n_events", "rank")
                .orderBy("window_start_us", "event_type", "rank"))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


STAGED_QUERIES["stream_windowed_topk_batch_equivalence"] = (
    stream_windowed_topk_batch_equivalence)
# F.window("ts", "1 hour") is epoch-aligned, i.e. date_trunc('hour');
# tie-break matches topk_of_closed_windows (n_events DESC, user_id)
STAGED_ORACLES["stream_windowed_topk_batch_equivalence"] = f"""WITH c AS (
    SELECT date_trunc('hour', ts) AS w, event_type, user_id,
           COUNT(*) AS n_events
    FROM events GROUP BY 1, 2, 3),
r AS (
    SELECT c.*, ROW_NUMBER() OVER (PARTITION BY w, event_type
               ORDER BY n_events DESC, user_id) AS rank
    FROM c)
SELECT epoch_us(w) AS window_start_us, event_type, user_id, n_events,
       CAST(rank AS INT) AS rank
FROM r WHERE rank <= {_TOPK_K}
ORDER BY window_start_us, event_type, rank"""
