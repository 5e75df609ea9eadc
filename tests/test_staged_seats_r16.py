"""Round-16 seat candidates (registry_staged_r16) run through the exact
driver contract — tests/parity.compare — before they are ever
registered, so seating them at r16 carries zero new correctness risk.
Also pins that importing the staged module does NOT touch the live
registry (the freeze-after-sweep invariant), that the multi-batch
state both rows claim to attest is non-vacuous (a session / an hourly
window really spans the chunk boundary), and the capacity plan: the
registry is at 150, so the r16 seating trades the two
PLANNED_R16_RETIREMENTS rows for the two staged seats."""

import os
import re
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

import kafka_connect_oss_spark.registry_llm  # noqa: F401 (registers entries)
from kafka_connect_oss_spark import registry_staged_r16 as S
from kafka_connect_oss_spark.registry import LAZY_ORACLES, ORACLES, QUERIES
from tests.parity import compare, duck_connection

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_staged_names_not_registered():
    staged = set(S.STAGED_QUERIES)
    assert staged == {"stream_sessionize_batch_equivalence",
                      "stream_windowed_topk_batch_equivalence"}
    assert not staged & set(QUERIES), "staged op leaked into the registry"
    assert not staged & set(ORACLES)
    assert not staged & set(LAZY_ORACLES)
    # every staged query has exactly one oracle form
    assert set(S.STAGED_ORACLES) | set(S.STAGED_LAZY_ORACLES) == staged
    assert not set(S.STAGED_ORACLES) & set(S.STAGED_LAZY_ORACLES)


@pytest.mark.parametrize("name", sorted(S.STAGED_ORACLES))
def test_staged_parity(name, spark, sf_dir, duck):
    df = S.STAGED_QUERIES[name](spark, sf_dir)
    compare(df, duck, S.STAGED_ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(S.STAGED_ORACLES))
def test_staged_parity_second_sf(name, spark, sf_dir):
    """Second scale factor (the driver-compare SF, sf0.01 — distinct
    from the conftest default sf0.001): the sentinel flush and the
    cross-batch state must stay non-degenerate across SFs."""
    sf = "/root/testdata/sf0.01"
    if sf_dir.rstrip("/") == sf:
        sf = "/root/testdata/sf0.001"
    con = duck_connection(sf)
    try:
        df = S.STAGED_QUERIES[name](spark, sf)
        assert df.count() > 0, f"{name} degenerate (empty) at {sf}"
        compare(df, con, S.STAGED_ORACLES[name], name)
    finally:
        con.close()


def test_staged_module_alone_does_not_register():
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
    cut = S._session_cut_ts(ev)
    assert cut is not None, "no multi-ts session at this SF"
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
    cut = S._window_cut_ts(ev)
    assert cut is not None, "no multi-ts hourly window at this SF"
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


def test_planned_r16_retirements_are_valid():
    """The capacity trade is executable as written: exactly one
    retirement per staged seat; each planned row is currently
    driver-visible (it must still hold its r15 rotation seat), not
    already retired, latest-green in the driver record, and its waiver
    names a sibling that will be driver-visible after the trade (a
    staged row or a surviving registry row). Post-trade arithmetic
    lands back at exactly 150."""
    import __spark_entry__ as E
    from tests.driver_records import green, latest_rows

    plan = E.PLANNED_R16_RETIREMENTS
    assert len(plan) == len(S.STAGED_QUERIES) == 2
    qs = E.queries()
    latest = latest_rows()
    for name, why in plan.items():
        assert name in qs, f"{name} not driver-visible"
        assert name not in E.RETIRED_SEATS
        row = latest.get(name)
        assert row is not None, f"{name} never driver-attested"
        assert green(row), (
            f"{name} latest driver row is red — fix, don't retire")
        survivors = (set(qs) - set(plan)) | set(S.STAGED_QUERIES)
        mentioned = set(re.findall(r"[a-z0-9_]+", why)) & survivors
        assert mentioned, f"{name}: waiver names no surviving sibling"
    assert len(qs) - len(plan) + len(S.STAGED_QUERIES) == 150


def test_oracle_sql_mentions_no_spark_internals():
    """Both oracles must be plain DuckDB SQL over the pre-registered
    views (driver contract) — no table functions pointing at paths."""
    for name, sql in S.STAGED_ORACLES.items():
        assert "read_parquet" not in sql, name
        assert re.search(r"\bFROM events\b", sql), name
