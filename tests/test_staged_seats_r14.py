"""Round-13 staged operators, seated at round 14 (registry_seated_r14).

In round 13 this module ran the staged (query, oracle) pairs through
tests/parity.compare at two SFs BEFORE registration so seating carried
zero new correctness risk; the parity burden now lives in the
registry-wide sweep (tests/test_oracle_parity.py picks the two up
automatically). What this module still pins is the seating itself:

* every staged name is registered, and the registry's callable is the
  staged callable (the seat is verbatim, not a re-implementation);
* every staged oracle string is the registered one;
* the staged module on its own still never mutates the registry — only
  importing registry_seated_r14 does (the freeze-after-sweep invariant);
* the four round-14 retirements (the two PLANNED_R14_RETIREMENTS
  written at r13 plus the two freed for the REWRITTEN q15/q17 hard
  seats) landed in RETIRED_SEATS (the capacity policy's trade);
* the streaming equivalence row stays genuinely multi-batch (the
  mergeability theorem it attests would be vacuous on one batch).
"""

import importlib
import os
import subprocess
import sys

import pytest

from kafka_connect_oss_spark import registry_seated_r14  # noqa: F401 (seats)
from kafka_connect_oss_spark import registry_staged_r14 as S
from kafka_connect_oss_spark.registry import LAZY_ORACLES, ORACLES, QUERIES

SEATED = {"stream_cms_batch_equivalence", "sketch_kmv_source_overlap"}


def test_staged_set_is_exactly_the_r13_two():
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
    # fresh interpreter: importing registry_staged_r14 must leave the live
    # registry untouched (seating happens only via registry_seated_r14)
    code = (
        "from kafka_connect_oss_spark import registry_staged_r14 as S\n"
        "from kafka_connect_oss_spark.registry import QUERIES, ORACLES\n"
        "leak = set(S.STAGED_QUERIES) & set(QUERIES)\n"
        "assert not leak, f'staged leaked into registry: {leak}'\n"
        "assert not set(S.STAGED_ORACLES) & set(ORACLES)\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr


def test_reimport_is_idempotent():
    before = len(QUERIES)
    importlib.reload(registry_seated_r14)
    assert len(QUERIES) == before


def test_planned_retirements_executed():
    """The retirements tied to the r14 seating were executed: the two
    named at r12 (PLANNED_R14_RETIREMENTS) plus the two freed so the
    r13-rewritten q15/q17 could seat under the rewrite-resets-staleness
    rule. Each now lives in RETIRED_SEATS, stays in the full registry
    (parity sweep + bench keep covering it), and no longer consumes a
    driver seat."""
    import __spark_entry__ as E

    assert not hasattr(E, "PLANNED_R14_RETIREMENTS"), (
        "the r14 plan was executed — the planning dict must be gone")
    executed = {"events_hourly_rollup_approx",
                "events_value_percentiles_sampled",
                "sketch_user_overlap_kmv", "text_langid_confusion"}
    assert executed <= set(E.RETIRED_SEATS)
    visible = set(E.queries())
    for name in executed:
        assert name in QUERIES, f"{name}: retired rows stay registered"
        assert name in ORACLES or name in LAZY_ORACLES
        assert name not in visible, f"{name}: retired but driver-visible"
        assert name not in E.DRIVER_WINDOW


def test_cms_stream_row_is_truly_multi_batch(spark, sf_dir):
    """The equivalence row must exercise a REAL merge: the streamed
    corpus arrives in _CMS_STREAM_CHUNKS micro-batches, so a build that
    silently collapsed to one batch (making mergeability vacuous) fails
    here. Proven indirectly: each parity chunk is non-empty at every
    test SF, so maxFilesPerTrigger=1 yields one batch per chunk."""
    from pyspark.sql import functions as F

    from kafka_connect_oss_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    for i in range(S._CMS_STREAM_CHUNKS):
        n = docs.where(F.col("doc_id") % S._CMS_STREAM_CHUNKS == i).count()
        assert n > 0, f"chunk {i} empty — stream would not be multi-batch"
