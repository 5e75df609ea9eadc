"""Round-17 seat candidates (registry_staged_r17) run through the exact
driver contract — tests/parity.compare — before they are ever
registered, so seating them at r17 carries zero new correctness risk.
Also pins that importing the staged module does NOT touch the live
registry (the freeze-after-sweep invariant), that the per-batch
telemetry both rows claim to attest is non-vacuous (the two replay
batches produce DIFFERENT rows, so a batch-labeling bug cannot cancel
out), and the capacity plan: the r17 window carries 2 staged + 2
r16-REWRITTEN hard seats, so the seating trades FOUR
PLANNED_R17_RETIREMENTS rows (registry 150 - 4 + 2 = 148)."""

import os
import re
import subprocess
import sys

import pytest

import kafka_connect_oss_spark.registry_llm  # noqa: F401 (registers entries)
from kafka_connect_oss_spark import registry_staged_r17 as S
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
    assert staged == {"stream_ingest_qc_batch_equivalence",
                      "stream_drift_monitor_batch_equivalence"}
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
    from the conftest default sf0.001): the batch labeling and the
    per-batch aggregates must stay non-degenerate across SFs."""
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
        "from kafka_connect_oss_spark import registry_staged_r17 as S\n"
        "from kafka_connect_oss_spark.registry import QUERIES, ORACLES\n"
        "leak = set(S.STAGED_QUERIES) & set(QUERIES)\n"
        "assert not leak, f'staged leaked into registry: {leak}'\n"
        "assert not set(S.STAGED_ORACLES) & set(ORACLES)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr


def test_qc_batches_are_distinguishable(spark, sf_dir):
    """The QC replay's uneven split must be load-bearing: the two
    telemetry rows must DIFFER beyond batch_id — otherwise a
    batch-labeling bug (c1 replayed before c0, ids swapped) would
    produce the same result set and the attestation of the
    batch_id -> chunk mapping would be vacuous."""
    rows = S.STAGED_QUERIES["stream_ingest_qc_batch_equivalence"](
        spark, sf_dir).collect()
    assert len(rows) == 2
    a, b = (tuple(str(v) for k, v in sorted(r.asDict().items())
                  if k != "batch_id") for r in rows)
    assert a != b, "QC batches identical — labeling attestation vacuous"
    # and the split really is uneven (the designed reason they differ)
    assert rows[0]["n_docs"] != rows[1]["n_docs"]


def test_drift_batches_are_distinguishable(spark, sf_dir):
    """Same non-vacuousness pin for the drift row: the two snapshots
    score differently against the baseline, so the per-batch labeling
    is provably load-bearing."""
    rows = S.STAGED_QUERIES["stream_drift_monitor_batch_equivalence"](
        spark, sf_dir).collect()
    by_batch: dict[int, set] = {}
    for r in rows:
        d = r.asDict()
        bid = d.pop("batch_id")
        by_batch.setdefault(bid, set()).add(
            tuple(str(v) for _, v in sorted(d.items())))
    assert set(by_batch) == {0, 1}
    assert by_batch[0] != by_batch[1], (
        "drift batches identical — labeling attestation vacuous")


def test_planned_r17_retirements_are_valid():
    """The capacity trade is executable as written: FIVE retirements —
    one per hard seat that does NOT come out of r17's own rotation
    obligation (2 staged seats at capacity + the 3 r16-REWRITTEN rows
    last attested r15; the 4th rewritten row, stream_cms, is
    r14-attested so its seat was in the obligation anyway); each
    planned row is currently driver-visible, not already retired,
    latest-green in the driver record, in the r14-attested cohort (so
    retiring it also shrinks r17's rotation obligation), and its
    waiver names a sibling that will be driver-visible after the
    trade. Post-trade arithmetic lands at 147 (the spare seats fund an
    r18 staging with zero retirements — the r14 precedent)."""
    import json

    import __spark_entry__ as E
    from tests.driver_records import green, latest_rows

    plan = E.PLANNED_R17_RETIREMENTS
    rewritten_hard = {n for n, rnd in E.REWRITTEN.items() if rnd == 16}
    assert len(S.STAGED_QUERIES) + len(rewritten_hard) == 6
    qs = E.queries()
    latest = latest_rows()
    with open(os.path.join(REPO, "CORRECTNESS_r14.json")) as fh:
        r14_cohort = set(json.load(fh))
    rewritten_outside_obligation = rewritten_hard - r14_cohort
    assert len(plan) == (len(S.STAGED_QUERIES)
                         + len(rewritten_outside_obligation)) == 5
    for name, why in plan.items():
        assert name in qs, f"{name} not driver-visible"
        assert name not in E.RETIRED_SEATS
        assert name in r14_cohort, (
            f"{name} not in the r14 cohort — retiring it would not "
            f"shrink the r17 obligation")
        row = latest.get(name)
        assert row is not None, f"{name} never driver-attested"
        assert green(row), (
            f"{name} latest driver row is red — fix, don't retire")
        survivors = (set(qs) - set(plan)) | set(S.STAGED_QUERIES)
        mentioned = set(re.findall(r"[a-z0-9_]+", why)) & survivors
        assert mentioned, f"{name}: waiver names no surviving sibling"
    assert len(qs) - len(plan) + len(S.STAGED_QUERIES) == 147


def test_oracle_sql_mentions_no_spark_internals():
    """Both oracles must be plain DuckDB SQL over the pre-registered
    views (driver contract) — no table functions pointing at paths."""
    for name, sql in S.STAGED_ORACLES.items():
        assert "read_parquet" not in sql, name
        assert re.search(r"\bFROM documents\b", sql), name
