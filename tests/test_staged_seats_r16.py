"""Round-15 staged operators, seated at round 16 (registry_seated_r16).

In round 15 this module ran the staged (query, oracle) pairs through
tests/parity.compare at two SFs BEFORE registration so seating carried
zero new correctness risk; the parity burden now lives in the
registry-wide sweep (tests/test_oracle_parity.py picks the two up
automatically). What this module still pins:

* every staged name is registered, and the registry's callable is the
  staged callable (the seat is verbatim, not a re-implementation);
* every staged oracle string is the registered one;
* the staged module on its own still never mutates the registry — only
  importing registry_seated_r16 does (the freeze-after-sweep invariant);
* the seating executed the PLANNED_R16_RETIREMENTS trade written at
  r15 (sessions_per_user, events_top_users_per_type into
  RETIRED_SEATS) and the driver-visible registry is back at exactly
  150 (capacity);
* the substantive semantics stay load-bearing: the replay cuts land
  strictly INSIDE a session / an hourly window (so the attested state
  provably crosses a micro-batch boundary — a build that dropped state
  between batches could not pass), and the session-boundary contract
  holds on a constructed corpus (gap-exact ties, single-event users,
  sentinel never leaks).
"""

import importlib
import os
import re
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from kafka_connect_oss_spark import registry_seated_r16  # noqa: F401 (seats)
from kafka_connect_oss_spark import registry_staged_r16 as S
from kafka_connect_oss_spark.registry import LAZY_ORACLES, ORACLES, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SEATED = {"stream_sessionize_batch_equivalence",
          "stream_windowed_topk_batch_equivalence"}

RETIRED_WITH_SEATING = {"sessions_per_user", "events_top_users_per_type"}


def test_staged_set_is_exactly_the_r15_two():
    assert set(S.STAGED_QUERIES) == SEATED
    # every staged query has exactly one oracle form (no lazy oracles
    # in this batch)
    assert set(S.STAGED_ORACLES) == SEATED
    assert not S.STAGED_LAZY_ORACLES


@pytest.mark.parametrize("name", sorted(SEATED))
def test_seated_verbatim(name):
    assert name in QUERIES, f"{name} not seated"
    # registry.register wraps the callable (timezone pin + package ship);
    # the wrapped closure must close over the staged function itself
    wrapped = QUERIES[name]
    cell_fns = [c.cell_contents for c in (wrapped.__closure__ or ())]
    assert S.STAGED_QUERIES[name] in cell_fns, (
        f"{name}: registry callable does not wrap the staged definition")
    assert ORACLES[name] == S.STAGED_ORACLES[name]
    assert name not in LAZY_ORACLES


def test_staged_module_alone_does_not_register():
    # fresh interpreter: importing registry_staged_r16 must leave the live
    # registry untouched (seating happens only via registry_seated_r16)
    code = (
        "from kafka_connect_oss_spark import registry_staged_r16 as S\n"
        "from kafka_connect_oss_spark.registry import QUERIES, ORACLES\n"
        "leak = set(S.STAGED_QUERIES) & set(QUERIES)\n"
        "assert not leak, f'staged leaked into registry: {leak}'\n"
        "assert not set(S.STAGED_ORACLES) & set(ORACLES)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr


def test_reimport_is_idempotent():
    before = len(QUERIES)
    importlib.reload(registry_seated_r16)
    assert len(QUERIES) == before


def test_retirement_trade_executed():
    """Capacity arithmetic, post-seating form: the registry stood at
    150, so the two r16 seats required the two retirements planned at
    r15 — the planning dict is gone (executed, not pending), both
    retirees moved to RETIRED_SEATS (still in the full registry for
    parity/bench), and the driver-visible registry is back at exactly
    150 with the seated rows at the head of the r16 window."""
    import __spark_entry__ as E

    assert not hasattr(E, "PLANNED_R16_RETIREMENTS")
    assert RETIRED_WITH_SEATING <= set(E.RETIRED_SEATS)
    qs = E.queries()
    assert not RETIRED_WITH_SEATING & set(qs)
    # the trade landed the registry back at exactly 150; the r17 trade
    # later took it to 147 — the live size is pinned by the current
    # round's seat test, here only the r16 invariants
    assert len(qs) <= 150
    assert SEATED <= set(qs)
    # (the r16 window-head position was round-specific — the r17 window
    # seats its own staged pair at the head; test_staged_seats_r17
    # carries that assertion now)
    assert not SEATED & set(E.RETIRED_SEATS)


def _events(spark, sf_dir, cols):
    from kafka_connect_oss_spark.sources.batch import load_table

    return load_table(spark, sf_dir, "events").select(*cols)


def test_session_state_crosses_chunk_boundary(spark, sf_dir):
    """The sessionize row must attest state that SURVIVES a micro-batch
    boundary: the replay cut (_session_cut_ts) must land strictly
    inside some session, i.e. at least one session has events in both
    chunks — otherwise the multi-batch replay is vacuous (every
    session local to one batch) and a build that dropped state between
    batches would still pass parity. (A count-based ntile split fails
    this at every test SF — the cut is placed mid-session on purpose.)"""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir, ["user_id", "ts"])
    cut, maxts = S._session_cut_ts(ev)
    assert cut is not None, "no multi-ts session at this SF"
    assert maxts == ev.agg(F.max("ts")).collect()[0][0], (
        "the merged cut+maxts collect must carry the true max ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    lab = (ev
           .withColumn("q", (F.col("ts") >= F.lit(cut)).cast("int"))
           .withColumn("prev", F.lag("ts").over(w))
           .withColumn("brk", (F.col("prev").isNull() | (
               F.unix_micros("ts") - F.unix_micros("prev")
               > S._SESS_GAP_MS * 1000)).cast("int"))
           .withColumn("sid", F.sum("brk").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    spanning = (lab.groupBy("user_id", "sid")
                .agg(F.countDistinct("q").alias("nq"))
                .where(F.col("nq") > 1).count())
    assert spanning > 0, (
        "no session spans the chunk boundary — the replay no longer "
        "attests cross-batch session state")


def test_topk_window_crosses_chunk_boundary(spark, sf_dir):
    """Same non-vacuousness pin for the windowed top-k row: the replay
    cut (_window_cut_ts) must land strictly inside some hourly window,
    so that window's streaming aggregate really accumulates across
    micro-batches before the watermark closes it."""
    ev = _events(spark, sf_dir, ["user_id", "ts", "event_type"])
    cut, maxts = S._window_cut_ts(ev)
    assert cut is not None, "no multi-ts hourly window at this SF"
    assert maxts == ev.agg(F.max("ts")).collect()[0][0], (
        "the merged cut+maxts collect must carry the true max ts")
    spanning = (ev
                .withColumn("q", (F.col("ts") >= F.lit(cut)).cast("int"))
                .groupBy(F.window("ts", S._TOPK_WINDOW).alias("w"))
                .agg(F.countDistinct("q").alias("nq"))
                .where(F.col("nq") > 1).count())
    assert spanning > 0, (
        "no hourly window spans the chunk boundary — the replay no "
        "longer attests cross-batch window state")


def test_sessionize_edge_semantics_constructed(spark, tmp_path):
    """Session-boundary contract on a constructed corpus (the
    Q2-tie-fixture precedent): (a) a gap of EXACTLY 30 min does not
    break a session (the operator's break condition is strictly >),
    (b) 30 min + 1 s does, (c) a single-event user yields a 1-event
    session, (d) the sentinel user never leaks into the output."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 10, 0)
    m = lambda mins, secs=0: t0 + datetime.timedelta(  # noqa: E731
        minutes=mins, seconds=secs)
    rows = [
        # user 1: 10:00, 10:30 (exactly gap -> same session), then
        # 11:00:01 (gap + 1s after 10:30 -> new session)
        (1, 1, m(0), "click"),
        (2, 1, m(30), "click"),
        (3, 1, m(60, 1), "click"),
        # user 2: single event
        (4, 2, m(5), "click"),
    ]
    (spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
     .write.parquet(str(tmp_path / "events.parquet")))

    got = {(r.user_id, r.session_start_us, r.session_end_us, r.n_events)
           for r in S.STAGED_QUERIES["stream_sessionize_batch_equivalence"](
               spark, str(tmp_path)).collect()}
    # the session TZ is pinned UTC (conftest), so naive fixture wall
    # times are UTC wall times; a bare dt.timestamp() would use the
    # HOST timezone and break on any non-UTC box (code-review finding)
    us = lambda dt: int(dt.replace(  # noqa: E731
        tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    assert got == {
        (1, us(m(0)), us(m(30)), 2),
        (1, us(m(60, 1)), us(m(60, 1)), 1),
        (2, us(m(5)), us(m(5)), 1),
    }, got


def test_oracle_sql_mentions_no_spark_internals():
    """Both oracles must be plain DuckDB SQL over the pre-registered
    views (driver contract) — no table functions pointing at paths."""
    for name, sql in S.STAGED_ORACLES.items():
        assert "read_parquet" not in sql, name
        assert re.search(r"\bFROM events\b", sql), name
