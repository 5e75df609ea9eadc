"""Round-14 seat candidates (registry_staged_r14) run through the exact
driver contract — tests/parity.compare — before they are ever
registered, so seating them at r14 carries zero new correctness risk.
Also pins that importing the staged module does NOT touch the live
registry (the freeze-after-sweep invariant), and that the capacity
policy's planned retirements name rows that are (a) still registered,
(b) latest-green, and (c) covered by a still-attested sibling."""

import json
import os
import re

import pytest

import kafka_connect_oss_spark.registry_llm  # noqa: F401 (registers entries)
from kafka_connect_oss_spark import registry_staged_r14 as S
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
    assert staged == {"stream_cms_batch_equivalence",
                      "sketch_kmv_source_overlap"}
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
    from the conftest default sf0.001): estimates and merges must stay
    non-degenerate across SFs."""
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


def test_cms_stream_row_is_truly_multi_batch(spark, sf_dir):
    """The equivalence row must exercise a REAL merge: the streamed
    corpus arrives in _CMS_STREAM_CHUNKS micro-batches, so a build that
    silently collapsed to one batch (making mergeability vacuous) fails
    here. Proven indirectly: each parity chunk is non-empty at every
    test SF, so maxFilesPerTrigger=1 yields one batch per chunk."""
    from kafka_connect_oss_spark.sources.batch import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    for i in range(S._CMS_STREAM_CHUNKS):
        n = docs.where(F.col("doc_id") % S._CMS_STREAM_CHUNKS == i).count()
        assert n > 0, f"chunk {i} empty — stream would not be multi-batch"


def test_planned_retirements_are_valid():
    """Every staged r14 seat displaces one retirement (capacity policy
    in __spark_entry__.py). Each planned retirement must still be a
    live registered row whose latest driver attestation is green, and
    its named sibling must be registered and driver-visible."""
    import __spark_entry__ as E

    planned = getattr(E, "PLANNED_R14_RETIREMENTS", {})
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
            f"{name}: planned retirement must still be seated pre-r14")
        rec = latest.get(name)
        # same green() predicate as scripts/window_math.py
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
