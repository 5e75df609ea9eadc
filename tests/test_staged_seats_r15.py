"""Round-14 staged operators, seated at round 15 (registry_seated_r15).

In round 14 this module ran the staged (query, oracle) pairs through
tests/parity.compare at two SFs BEFORE registration so seating carried
zero new correctness risk; the parity burden now lives in the
registry-wide sweep (tests/test_oracle_parity.py picks the two up
automatically). What this module still pins:

* every staged name is registered, and the registry's callable is the
  staged callable (the seat is verbatim, not a re-implementation);
* every staged oracle string is the registered one;
* the staged module on its own still never mutates the registry — only
  importing registry_seated_r15 does (the freeze-after-sweep invariant);
* the seating required ZERO retirements (the four r14 retirements had
  left the registry at 148; 148 + 2 = 150 exactly) and the registry is
  now back at capacity;
* the pre-seating hardening (r14 judge item 1 + both streaming ADVICE
  items) holds: both rows return LAZY reads of their ephemeral sinks,
  never a collect()-materialized local relation;
* the substantive semantics stay load-bearing: the dedup row's state
  fold is non-vacuous (ablating it flips batch-1 statuses) and the
  asof row's sentinel flush emits EXACTLY one row per purchase.
"""

import importlib
import os
import re
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from kafka_connect_oss_spark import registry_seated_r15  # noqa: F401 (seats)
from kafka_connect_oss_spark import registry_staged_r15 as S
from kafka_connect_oss_spark.registry import LAZY_ORACLES, ORACLES, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SEATED = {"stream_asof_batch_equivalence", "stream_incremental_dedup_refresh"}


def test_staged_set_is_exactly_the_r14_two():
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
    # fresh interpreter: importing registry_staged_r15 must leave the live
    # registry untouched (seating happens only via registry_seated_r15)
    code = (
        "from kafka_connect_oss_spark import registry_staged_r15 as S\n"
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
    importlib.reload(registry_seated_r15)
    assert len(QUERIES) == before


def test_zero_retirement_seating_executed():
    """Capacity arithmetic, post-seating form: the four r14 retirements
    left the registry at 148, so the two r15 seats fit with zero
    retirements — no planning dict ever existed for r15, no new
    RETIRED_SEATS entries landed with the seating, and the
    driver-visible registry is back at exactly 150 (capacity)."""
    import __spark_entry__ as E

    assert not hasattr(E, "PLANNED_R15_RETIREMENTS")
    # the registry stood at exactly 150 (capacity) from this seating
    # until the r17 trade (150 - 5 + 2 = 147); the live size is pinned
    # by the current round's seat test — here only the r15 invariants
    assert len(E.queries()) <= 150
    assert SEATED <= set(E.queries())
    # (the r15 window-head position was round-specific — the r16 window
    # seats its own staged pair at the head; test_staged_seats_r16
    # carries that assertion now)
    assert not SEATED & set(E.RETIRED_SEATS)


def test_dedup_stream_fold_is_load_bearing(spark, sf_dir):
    """The refresh row must attest a REAL state fold: at least one
    batch-1 doc must classify dup_near/dup_exact ONLY because of
    batch-0's folded kept docs. Proven against the oracle's own CTEs:
    re-run batch-1's classification with the fold's unions removed
    (state = base only) and require the statuses to differ somewhere —
    if they never differ, the row would be green even with fold_
    accepted_into_state stubbed out, i.e. vacuous."""
    import duckdb

    sql = S.STAGED_ORACLES["stream_incremental_dedup_refresh"]
    nofold = (sql
              .replace("b0_kept", "b0_kept_unused")
              .replace("s1_dig AS (SELECT dg, rep FROM s0_dig\n"
                       "           UNION ALL SELECT dg, doc_id AS rep "
                       "FROM b0_kept_unused)",
                       "s1_dig AS (SELECT dg, rep FROM s0_dig)")
              .replace("s1_rep AS (SELECT doc_id, hh FROM s0_rep\n"
                       "           UNION ALL SELECT doc_id, hh "
                       "FROM b0_kept_unused)",
                       "s1_rep AS (SELECT doc_id, hh FROM s0_rep)"))
    assert nofold != sql, "fold-removal rewrite failed to apply"
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/documents.parquet')")
        real = dict(con.execute(
            f"SELECT doc_id, status FROM ({sql}) WHERE batch_id = 1"
        ).fetchall())
        base_only = dict(con.execute(
            f"SELECT doc_id, status FROM ({nofold}) WHERE batch_id = 1"
        ).fetchall())
        flips = {k for k in real if real[k] != base_only[k]}
        assert flips, ("no batch-1 status depends on the fold — the "
                       "streaming row no longer attests state growth")
    finally:
        con.close()


def _is_lazy_sink_read(df) -> None:
    """The seated form of the r14 judge's item 1: the row must return a
    lazy read of its (atexit-cleaned) sink, not a collect()-rebuilt
    LocalRelation — at bench sf1 the old shape materialized ~10^5 rows
    on the driver inside every timed run."""
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "LocalRelation" not in plan, plan
    assert "parquet" in plan, plan


def test_asof_row_emits_every_left_row(spark, sf_dir):
    """The sentinel-flush contract: the streamed as-of join must emit
    EXACTLY one row per purchase (the batch-equivalence claim is about
    the full set, not a watermark-dependent subset), and the sentinel
    itself must not leak into the output."""
    from kafka_connect_oss_spark.sources.batch import load_table

    df = S.STAGED_QUERIES["stream_asof_batch_equivalence"](spark, sf_dir)
    _is_lazy_sink_read(df)
    got = df.collect()
    n_purchases = (load_table(spark, sf_dir, "events")
                   .where(F.col("event_type") == "purchase").count())
    assert len(got) == n_purchases, (len(got), n_purchases)
    assert all(r.key != -1 and r.l_id != -1 for r in got), "sentinel leaked"


def test_refresh_row_returns_lazy_frame(spark, sf_dir):
    """Same laziness pin for the dedup-refresh row, plus a cheap
    non-degeneracy check (both batches present, more than one status)."""
    df = S.STAGED_QUERIES["stream_incremental_dedup_refresh"](spark, sf_dir)
    _is_lazy_sink_read(df)
    rows = df.collect()
    assert {r.batch_id for r in rows} == {0, 1}
    assert len({r.status for r in rows}) > 1


def test_asof_edge_semantics_constructed(spark, tmp_path):
    """As-of shape contract on a constructed corpus (the Q2-tie-fixture
    precedent — the synthetic events may never produce these edges at
    a given SF): (a) equal timestamps match (at-or-BEFORE is
    inclusive), (b) a purchase with no preceding click yields NULL r_*,
    (c) the match is the LATEST preceding click, not just any."""
    import datetime

    t = lambda m: datetime.datetime(2024, 1, 1, 10, m)  # noqa: E731
    rows = [
        # user 1: purchase at 10:00 with click at exactly 10:00 -> match
        (101, 1, t(0), "click"),
        (102, 1, t(0), "purchase"),
        # user 1: purchase BEFORE any click -> NULL
        (103, 1, t(0) - datetime.timedelta(hours=1), "purchase"),
        # user 2: clicks 10:00 and 10:05, purchase 10:03 -> 10:00 click
        (201, 2, t(0), "click"),
        (202, 2, t(5), "click"),
        (203, 2, t(3), "purchase"),
    ]
    (spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
     .write.parquet(str(tmp_path / "events.parquet")))

    got = {(r.key, r.l_id): (r.r_ts, r.r_id)
           for r in S.STAGED_QUERIES["stream_asof_batch_equivalence"](
               spark, str(tmp_path)).collect()}
    assert got[(1, 102)] == (t(0), 101), got
    assert got[(1, 103)] == (None, None), got
    assert got[(2, 203)] == (t(0), 201), got
    assert len(got) == 3


def test_oracle_sql_mentions_no_spark_internals():
    """Both oracles must be plain DuckDB SQL over the pre-registered
    views (driver contract) — no table functions pointing at paths."""
    for name, sql in S.STAGED_ORACLES.items():
        assert "read_parquet" not in sql, name
        assert re.search(r"\bFROM (documents|events)\b", sql), name
