"""Round-11 staged operators, seated at round 12 (registry_seated_r12).

In round 11 this module ran the staged (query, oracle) pairs through
tests/parity.compare BEFORE registration so seating carried zero new
correctness risk; the parity burden now lives in the registry-wide sweep
(tests/test_oracle_parity.py picks the five up automatically). What this
module still pins is the seating itself:

* every staged name is registered, and the registry's callable is the
  staged callable (the seat is verbatim, not a re-implementation);
* every staged oracle string / lazy-oracle factory is the registered one;
* the staged module on its own still never mutates the registry — only
  importing registry_seated_r12 does (the freeze-after-sweep invariant).
"""

import importlib
import os
import subprocess
import sys

import pytest

from kafka_connect_oss_spark import registry_seated_r12  # noqa: F401 (seats)
from kafka_connect_oss_spark import registry_staged_r12 as S
from kafka_connect_oss_spark.registry import LAZY_ORACLES, ORACLES, QUERIES

SEATED = {"text_bpe_encode", "text_span_dedup", "corpus_drift_report",
          "pack_nosplit_layout", "text_bpe_fertility"}


def test_staged_set_is_exactly_the_r11_five():
    assert set(S.STAGED_QUERIES) == SEATED
    # every staged query has exactly one oracle form
    assert set(S.STAGED_ORACLES) | set(S.STAGED_LAZY_ORACLES) == SEATED
    assert not set(S.STAGED_ORACLES) & set(S.STAGED_LAZY_ORACLES)


@pytest.mark.parametrize("name", sorted(SEATED))
def test_seated_verbatim(name):
    assert name in QUERIES, f"{name} not seated"
    # registry.register wraps the callable (timezone pin + package ship);
    # the wrapped closure must close over the staged function itself
    wrapped = QUERIES[name]
    cell_fns = [c.cell_contents for c in (wrapped.__closure__ or ())]
    assert S.STAGED_QUERIES[name] in cell_fns, (
        f"{name}: registry callable does not wrap the staged definition")
    if name in S.STAGED_ORACLES:
        assert ORACLES[name] == S.STAGED_ORACLES[name]
    else:
        assert LAZY_ORACLES[name] is S.STAGED_LAZY_ORACLES[name]


def test_staged_module_alone_does_not_register():
    # fresh interpreter: importing registry_staged_r12 must leave the live
    # registry untouched (seating happens only via registry_seated_r12)
    code = (
        "from kafka_connect_oss_spark import registry_staged_r12 as S\n"
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
    importlib.reload(registry_seated_r12)
    assert len(QUERIES) == before
