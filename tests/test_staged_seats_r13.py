"""Round-13 seat candidates (registry_staged_r13) run through the exact
driver contract — tests/parity.compare — before they are ever
registered, so seating them at r13 carries zero new correctness risk.
Also pins that importing the staged module does NOT touch the live
registry (the freeze-after-sweep invariant), and that the capacity
policy's planned retirements name rows that are (a) still registered,
(b) latest-green, and (c) covered by a still-attested sibling."""

import json
import os
import re

import pytest
from pyspark.sql import functions as F

import kafka_connect_oss_spark.registry_llm  # noqa: F401 (registers entries)
from kafka_connect_oss_spark import registry_staged_r13 as S
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
    assert staged == {"q2_min_cost_supplier", "q11_important_supply",
                      "sketch_cms_calibration"}
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
    from the conftest default sf0.001): the threshold constants must
    stay non-degenerate (non-empty, non-everything) across SFs."""
    sf = "/root/testdata/sf0.01"
    if sf_dir.rstrip("/") == sf:
        sf = "/root/testdata/sf0.001"
    con = duck_connection(sf)
    try:
        df = S.STAGED_QUERIES[name](spark, sf)
        n = df.count()
        assert n > 0, f"{name} degenerate (empty) at {sf}"
        if name == "q11_important_supply":
            # non-everything: the 2x-mean-share threshold must actually
            # filter (every part qualifying would make the HAVING shape
            # vacuous at this SF)
            n_parts = con.execute(
                "SELECT COUNT(DISTINCT l_partkey) FROM lineitem"
            ).fetchone()[0]
            assert n < n_parts, f"{name}: threshold filtered nothing"
        compare(df, con, S.STAGED_ORACLES[name], name)
    finally:
        con.close()


def test_planned_retirements_are_valid():
    """Every staged r13 seat displaces one retirement (capacity policy
    in __spark_entry__.py). Each planned retirement must still be a
    live registered row whose latest driver attestation is green, and
    its named sibling must be registered and driver-visible."""
    import __spark_entry__ as E

    planned = getattr(E, "PLANNED_R13_RETIREMENTS", {})
    assert len(planned) == len(S.STAGED_QUERIES), (
        "one retirement per staged seat")
    visible = set(E.queries())
    rounds = sorted(
        int(m.group(1)) for f in os.listdir(REPO)
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f)))
    latest: dict[str, dict] = {}
    for r in rounds:
        with open(os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")) as fh:
            for k, rec in json.load(fh).items():
                latest[k] = rec
    for name, sibling_note in planned.items():
        assert name in QUERIES and name in visible, (
            f"{name}: planned retirement must still be seated pre-r13")
        rec = latest.get(name)
        # same green() predicate as scripts/window_math.py: all three
        # match flags, no error
        assert rec and rec.get("rows_match") and rec.get("schema_match") \
            and rec.get("hash_match") and not rec.get("err"), (
            f"{name}: retirement requires a latest-green driver row")
        siblings = re.findall(r"[a-z][a-z0-9_]{3,}", sibling_note)
        named = [s for s in siblings if s in QUERIES]
        assert named, f"{name}: sibling note must name a registered row"
        assert any(s in visible for s in named), (
            f"{name}: at least one sibling must be driver-visible")
        assert name not in E.DRIVER_WINDOW, (
            f"{name}: a planned retirement must not consume a current-"
            f"window seat (attest-then-retire wastes the seat)")


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
