"""Round-12 staged operators, seated at round 13 (registry_seated_r13).

In round 12 this module ran the staged (query, oracle) pairs through
tests/parity.compare at two SFs BEFORE registration so seating carried
zero new correctness risk; the parity burden now lives in the
registry-wide sweep (tests/test_oracle_parity.py picks the three up
automatically). What this module still pins is the seating itself:

* every staged name is registered, and the registry's callable is the
  staged callable (the seat is verbatim, not a re-implementation);
* every staged oracle string is the registered one;
* the staged module on its own still never mutates the registry — only
  importing registry_seated_r13 does (the freeze-after-sweep invariant);
* the three PLANNED_R13_RETIREMENTS written at r12 landed in
  RETIRED_SEATS (the capacity policy's seat-for-seat trade);
* the constructed Q2 tie fixture (window-min equality keeps BOTH
  suppliers; region filter precedes the min) stays as a semantics pin.
"""

import importlib
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from kafka_connect_oss_spark import registry_seated_r13  # noqa: F401 (seats)
from kafka_connect_oss_spark import registry_staged_r13 as S
from kafka_connect_oss_spark.registry import LAZY_ORACLES, ORACLES, QUERIES

SEATED = {"q2_min_cost_supplier", "q11_important_supply",
          "sketch_cms_calibration"}


def test_staged_set_is_exactly_the_r12_three():
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
    # fresh interpreter: importing registry_staged_r13 must leave the live
    # registry untouched (seating happens only via registry_seated_r13)
    code = (
        "from kafka_connect_oss_spark import registry_staged_r13 as S\n"
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
    importlib.reload(registry_seated_r13)
    assert len(QUERIES) == before


def test_planned_retirements_executed():
    """The three retirements named at r12 (PLANNED_R13_RETIREMENTS)
    were executed with the seating: each now lives in RETIRED_SEATS,
    stays in the full registry (parity sweep + bench keep covering it),
    and no longer consumes a driver seat."""
    import __spark_entry__ as E

    assert not hasattr(E, "PLANNED_R13_RETIREMENTS"), (
        "the r13 plan was executed — the planning dict must be gone")
    executed = {"dedup_minhash_signature", "dedup_simhash",
                "sim_ann_lsh_topk"}
    assert executed <= set(E.RETIRED_SEATS)
    visible = set(E.queries())
    for name in executed:
        assert name in QUERIES, f"{name}: retired rows stay registered"
        assert name in ORACLES or name in LAZY_ORACLES
        assert name not in visible, f"{name}: retired but driver-visible"
        assert name not in E.DRIVER_WINDOW


def test_q2_tie_semantics(spark, tmp_path):
    """Q2 shape contract: when two regional suppliers share a part's
    minimum supply cost, BOTH rows return (the window-min equality
    filter, like TPC-H Q2's correlated subquery) — constructed fixture
    because the synthetic corpus may never produce an exact cents tie."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey int, r_name string"
    ).write.parquet(f"{sf}/region.parquet")
    spark.createDataFrame(
        [(0, "NATION_A", 0), (1, "NATION_B", 0), (2, "NATION_C", 1)],
        "n_nationkey int, n_name string, n_regionkey int"
    ).write.parquet(f"{sf}/nation.parquet")
    spark.createDataFrame(
        [(1, "SUP_1", 0, 10.0), (2, "SUP_2", 1, 20.0),
         (3, "SUP_3", 2, 30.0)],  # SUP_3 is outside EUROPE
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    ).write.parquet(f"{sf}/supplier.parquet")
    spark.createDataFrame(
        [(7, "p", "B", "T", 5, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double"
    ).write.parquet(f"{sf}/part.parquet")
    # both EU suppliers ship part 7 at min 4.00; the ASIA supplier at
    # 1.00 must NOT drag the min down (region filter precedes the min)
    li = [(1, 7, 1, 1, 1.0, 4.00, 0.0, 0.0, "N", "O", "2020-01-01"),
          (2, 7, 1, 2, 1.0, 9.00, 0.0, 0.0, "N", "O", "2020-01-02"),
          (3, 7, 2, 1, 1.0, 4.00, 0.0, 0.0, "N", "O", "2020-01-03"),
          (4, 7, 3, 1, 1.0, 1.00, 0.0, 0.0, "N", "O", "2020-01-04")]
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate string"
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp")
                 ).write.parquet(f"{sf}/lineitem.parquet")

    rows = sorted(
        (r.s_name, r.supplycost_cents)
        for r in S.STAGED_QUERIES["q2_min_cost_supplier"](spark, sf).collect())
    assert rows == [("SUP_1", 400), ("SUP_2", 400)], rows
