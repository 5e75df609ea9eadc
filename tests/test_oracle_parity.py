"""Every registry query with an oracle must match DuckDB — the same check
the driver runs (CORRECTNESS_r{N}.json), kept green locally at sf0.001."""

import pytest

import kafka_connect_oss_spark.registry_llm  # noqa: F401 (registers entries)
import kafka_connect_oss_spark.registry_multimodal  # noqa: F401 (registers entries)
import kafka_connect_oss_spark.registry_relational  # noqa: F401 (registers entries)
import kafka_connect_oss_spark.registry_seated  # noqa: F401 (seats the r10 staged ops)
import kafka_connect_oss_spark.registry_seated_r12  # noqa: F401 (seats the r12 staged ops)
import kafka_connect_oss_spark.registry_seated_r13  # noqa: F401 (seats the r13 staged ops)
import kafka_connect_oss_spark.registry_seated_r14  # noqa: F401 (seats the r14 staged ops)
import kafka_connect_oss_spark.registry_seated_r15  # noqa: F401 (seats the r15 staged ops)
import kafka_connect_oss_spark.registry_seated_r16  # noqa: F401 (seats the r16 staged ops)
import kafka_connect_oss_spark.registry_seated_r17  # noqa: F401 (seats the r17 staged ops)
import kafka_connect_oss_spark.registry_tpch  # noqa: F401 (registers entries)
from kafka_connect_oss_spark.registry import LAZY_ORACLES, ORACLES, QUERIES
from tests.parity import compare, duck_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    compare(df, duck, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(LAZY_ORACLES))
def test_lazy_oracle_parity(name, spark, sf_dir, duck):
    # data-fitted oracles (model literals) resolve at the test SF; the
    # query's own fit and the oracle's fit must agree bit-for-bit
    df = QUERIES[name](spark, sf_dir)
    compare(df, duck, LAZY_ORACLES[name](sf_dir), name)


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES) - set(LAZY_ORACLES)))
def test_rows_only(name, spark, sf_dir):
    # non-SQL-expressible ops: the driver records a rows-only check
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
