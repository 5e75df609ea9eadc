"""Round-16 staged operators, seated at round 17 (registry_seated_r17).

In round 16 this module ran the staged (query, oracle) pairs through
tests/parity.compare at two SFs BEFORE registration so seating carried
zero new correctness risk; the parity burden now lives in the
registry-wide sweep (tests/test_oracle_parity.py picks the two up
automatically). What this module still pins:

* every staged name is registered, and the registry's callable is the
  staged callable (the seat is verbatim, not a re-implementation);
* every staged oracle string is the registered one;
* the staged module on its own still never mutates the registry — only
  importing registry_seated_r17 does (the freeze-after-sweep invariant);
* the seating executed the PLANNED_R17_RETIREMENTS trade written at
  r16 (five latest-green-r14 variant/eval/first-stage rows into
  RETIRED_SEATS) and the driver-visible registry landed at exactly
  147 with the seated rows and the four r16-REWRITTEN hard seats at
  the head of the r17 window;
* the substantive semantics stay load-bearing: the per-batch telemetry
  both rows attest is non-vacuous (the replay batches produce
  DIFFERENT rows, so a batch-labeling bug cannot cancel out).
"""

import importlib
import os
import re
import subprocess
import sys

import pytest

from kafka_connect_oss_spark import registry_seated_r17  # noqa: F401 (seats)
from kafka_connect_oss_spark import registry_staged_r17 as S
from kafka_connect_oss_spark.registry import LAZY_ORACLES, ORACLES, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SEATED = {"stream_ingest_qc_batch_equivalence",
          "stream_drift_monitor_batch_equivalence"}

RETIRED_WITH_SEATING = {"sim_random_projection", "sim_ann_recall_eval",
                        "corpus_duplicate_spans", "text_bpe_pair_stats",
                        "sim_embedding_quantize"}

REWRITTEN_HARD_SEATS = ["dedup_incremental_status",
                        "stream_asof_batch_equivalence",
                        "stream_cms_batch_equivalence",
                        "stream_incremental_dedup_refresh"]


def test_staged_set_is_exactly_the_r16_two():
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
    # fresh interpreter: importing registry_staged_r17 must leave the live
    # registry untouched (seating happens only via registry_seated_r17)
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


def test_reimport_is_idempotent():
    before = len(QUERIES)
    importlib.reload(registry_seated_r17)
    assert len(QUERIES) == before


def test_retirement_trade_executed():
    """Capacity arithmetic, post-seating form: the registry stood at
    150 and the r17 window carries SIX hard seats (2 staged + 4
    r16-REWRITTEN), so the seating executed the five retirements
    planned at r16 — the planning dict is gone (executed, not
    pending), all five retirees moved to RETIRED_SEATS (still in the
    full registry for parity/bench), and the driver-visible registry
    landed at exactly 147 with the six hard seats at the head of the
    r17 window."""
    import __spark_entry__ as E

    assert not hasattr(E, "PLANNED_R17_RETIREMENTS")
    assert RETIRED_WITH_SEATING <= set(E.RETIRED_SEATS)
    qs = E.queries()
    assert not RETIRED_WITH_SEATING & set(qs)
    assert len(qs) == 147
    assert SEATED <= set(qs)
    assert list(qs)[:2] == sorted(SEATED), (
        "the two seated rows must hold the head of the r17 window")
    assert list(qs)[2:6] == REWRITTEN_HARD_SEATS, (
        "the four r16-REWRITTEN rows must hard-seat right after the "
        "staged pair")
    assert not SEATED & set(E.RETIRED_SEATS)
    # every retiree's waiver names a sibling that is STILL driver-visible
    for name in RETIRED_WITH_SEATING:
        why = E.RETIRED_SEATS[name]
        assert set(re.findall(r"[a-z0-9_]+", why)) & set(qs), (
            f"{name}: waiver names no driver-visible sibling")


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


def test_oracle_sql_mentions_no_spark_internals():
    """Both oracles must be plain DuckDB SQL over the pre-registered
    views (driver contract) — no table functions pointing at paths."""
    for name, sql in S.STAGED_ORACLES.items():
        assert "read_parquet" not in sql, name
        assert re.search(r"\bFROM documents\b", sql), name
