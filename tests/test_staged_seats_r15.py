"""Round-15 seat candidates (registry_staged_r15) run through the exact
driver contract — tests/parity.compare — before they are ever
registered, so seating them at r15 carries zero new correctness risk.
Also pins that importing the staged module does NOT touch the live
registry (the freeze-after-sweep invariant), and the capacity
arithmetic: the r14 seating left the driver-visible registry at 148 of
150, so this cohort seats with ZERO retirements (there is deliberately
no PLANNED_R15_RETIREMENTS dict)."""

import os
import re
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

import kafka_connect_oss_spark.registry_llm  # noqa: F401 (registers entries)
from kafka_connect_oss_spark import registry_staged_r15 as S
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
    assert staged == {"stream_incremental_dedup_refresh",
                      "stream_asof_batch_equivalence"}
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
    from the conftest default sf0.001): state growth and the sentinel
    flush must stay non-degenerate across SFs."""
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
        "from kafka_connect_oss_spark import registry_staged_r15 as S\n"
        "from kafka_connect_oss_spark.registry import QUERIES, ORACLES\n"
        "leak = set(S.STAGED_QUERIES) & set(QUERIES)\n"
        "assert not leak, f'staged leaked into registry: {leak}'\n"
        "assert not set(S.STAGED_ORACLES) & set(ORACLES)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr


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


def test_asof_row_emits_every_left_row(spark, sf_dir):
    """The sentinel-flush contract: the streamed as-of join must emit
    EXACTLY one row per purchase (the batch-equivalence claim is about
    the full set, not a watermark-dependent subset), and the sentinel
    itself must not leak into the output."""
    from kafka_connect_oss_spark.sources.batch import load_table

    df = S.STAGED_QUERIES["stream_asof_batch_equivalence"](spark, sf_dir)
    got = df.collect()
    n_purchases = (load_table(spark, sf_dir, "events")
                   .where(F.col("event_type") == "purchase").count())
    assert len(got) == n_purchases, (len(got), n_purchases)
    assert all(r.key != -1 and r.l_id != -1 for r in got), "sentinel leaked"


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


def test_no_planned_r15_retirements_by_design():
    """Capacity arithmetic: the four r14 retirements left the registry
    at 148, so the two r15 seats fit with zero retirements — pin that
    the registry is exactly at capacity AFTER the (simulated) seating
    and that no planning dict exists to execute."""
    import __spark_entry__ as E

    assert not hasattr(E, "PLANNED_R15_RETIREMENTS")
    visible = len(E.queries())
    assert visible + len(S.STAGED_QUERIES) == 150, (
        f"registry {visible} + staged {len(S.STAGED_QUERIES)} != 150 — "
        f"the zero-retirement r15 plan no longer holds; name retirements")


def test_oracle_sql_mentions_no_spark_internals():
    """Both oracles must be plain DuckDB SQL over the pre-registered
    views (driver contract) — no table functions pointing at paths."""
    for name, sql in S.STAGED_ORACLES.items():
        assert "read_parquet" not in sql, name
        assert re.search(r"\bFROM (documents|events)\b", sql), name
