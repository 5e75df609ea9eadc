"""Round-12 seat candidates (registry_staged_r12) run through the exact
driver contract — tests/parity.compare — before they are ever
registered, so seating them at r12 carries zero new correctness risk.
Also pins that importing the staged module does NOT touch the live
registry (the freeze-after-sweep invariant)."""

import pytest

import kafka_connect_oss_spark.registry_llm  # noqa: F401 (registers entries)
from kafka_connect_oss_spark import registry_staged_r12 as S
from kafka_connect_oss_spark.registry import LAZY_ORACLES, ORACLES, QUERIES
from tests.parity import compare, duck_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_staged_names_not_registered():
    staged = set(S.STAGED_QUERIES)
    assert staged == {"text_bpe_encode", "text_span_dedup",
                      "corpus_drift_report", "pack_nosplit_layout",
                      "text_bpe_fertility"}
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


@pytest.mark.parametrize("name", sorted(S.STAGED_LAZY_ORACLES))
def test_staged_lazy_parity(name, spark, sf_dir, duck):
    df = S.STAGED_QUERIES[name](spark, sf_dir)
    compare(df, duck, S.STAGED_LAZY_ORACLES[name](sf_dir), name)
