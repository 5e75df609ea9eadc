"""Round-10 registrations: the r09 compliance/publisher surface promoted
from parity-in-pytest into the registry (text_line_dedup,
dedup_takedown_expansion, corpus_publish_decisions). Named tests per the
seating convention: registry-level oracle parity at the driver's
correctness SF plus semantic goldens for the registered demo shapes."""

import pytest

from pyspark.sql import functions as F

from tests.parity import compare, duck_connection

ORACLE_SF = "/root/testdata/sf0.01"

NEW = ["text_line_dedup", "dedup_takedown_expansion",
       "corpus_publish_decisions"]


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e
    return e


@pytest.fixture(scope="module")
def con():
    return duck_connection(ORACLE_SF)


@pytest.mark.parametrize("name", NEW)
def test_registered_parity_at_driver_sf(spark, entry, con, name):
    """The exact driver-gate contract (row count + columns + typed
    values via tests/parity.compare, including the r10 type-family
    assertion) for each round-10 registration at sf0.01."""
    sdf = entry.queries()[name](spark, ORACLE_SF)
    compare(sdf, con, entry.oracle_sql()[name], name)


def test_takedown_expansion_covers_sources(spark, entry):
    """The registered demo edits each work ('REQ: ' prefix) so it is
    near- but not byte-identical to its source doc: the expansion must
    contain the work's own digest AND the source doc's digest (the
    derivative-copy case the plain digest anti-join misses)."""
    from kafka_connect_oss_spark.sources.batch import load_table

    got = {r.digest for r in
           entry.queries()["dedup_takedown_expansion"](
               spark, ORACLE_SF).collect()}
    docs = load_table(spark, ORACLE_SF, "documents")
    sources = docs.where(F.col("doc_id") % 101 == 7)
    src_digests = {r[0] for r in
                   sources.select(F.md5("text")).collect()}
    work_digests = {r[0] for r in sources.select(
        F.md5(F.concat(F.lit("REQ: "), F.col("text")))).collect()}
    assert src_digests, "demo selects no works at sf0.01"
    assert src_digests <= got, "source docs of edited works not expanded"
    assert work_digests <= got, "work digests must always be covered"


def test_publish_decisions_reason_precedence(spark):
    """First-match attribution on a crafted corpus: blocklisted beats
    duplicate beats quality; the dup-group min publishes (reason NULL)
    when it passes the gates; a blocklisted digest takes the whole
    identity group."""
    from kafka_connect_oss_spark.operators.packing import (
        corpus_publish_decisions)

    good = "the and for with " + " ".join(f"word{i}word" for i in range(60))
    rows = [(0, good), (1, good),          # dup pair, passes gates
            (2, "short"),                  # fails gopher
            (3, "bad " + good)]            # blocklisted below
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bl = docs.where(F.col("doc_id") == 3).select(
        F.md5("text").alias("digest"))
    got = {r.doc_id: r._reason
           for r in corpus_publish_decisions(docs, bl).collect()}
    assert got == {0: None, 1: "duplicate", 2: "quality",
                   3: "blocklisted"}


def test_line_dedup_registered_is_nondegenerate(spark, entry):
    """The registered query lines documents into 3-word lines before
    deduping — assert the demo actually removes a meaningful share of
    lines AND leaves most documents non-empty (both degeneracies
    guarded: 'nothing hot' and 'everything hot')."""
    df = entry.queries()["text_line_dedup"](spark, ORACLE_SF)
    agg = df.agg(F.sum("n_removed").alias("rm"),
                 F.sum("n_lines").alias("nl"),
                 F.sum(F.when(F.length("clean_text") > 0, 1)
                       .otherwise(0)).alias("nonempty"),
                 F.count(F.lit(1)).alias("n")).collect()[0]
    assert 0 < agg.rm < agg.nl
    assert agg.nonempty > agg.n * 0.5


def test_bounded_posting_index_semantics_and_plan(spark):
    """The r09-judge buffer fix: the hot-shingle cap must bind BEFORE
    any posting list materializes. Pins (a) output identity with the
    old HAVING-on-size form on a corpus with a genuinely hot shingle,
    and (b) the plan shape — a LeftSemi join fed by a count aggregate
    sits below the collect_list aggregate, so over-cap keys never reach
    the list build."""
    from kafka_connect_oss_spark.operators.dedup import (
        _bounded_posting_index, shingle_hash_pairs)

    hot = "common boiler plate"                  # one shingle, df = n_docs
    docs = spark.createDataFrame(
        [(i, f"{hot} u{i} v{i} w{i}") for i in range(12)],
        "doc_id long, text string")
    posts = shingle_hash_pairs(docs)

    cap = 5
    got = {r._h: sorted(r._ids) for r in
           _bounded_posting_index(posts, "doc_id", cap).collect()}
    old = {r._h: sorted(r._ids) for r in
           (posts.groupBy("_h")
            .agg(F.collect_list("doc_id").alias("_ids"))
            .where(F.expr("size(_ids)") <= cap)).collect()}
    assert got == old and got, "bounded index must equal the HAVING form"
    # the hot shingle (df=12 > cap) is gone; per-doc shingles survive
    assert all(len(ids) <= cap for ids in got.values())

    plan = (_bounded_posting_index(posts, "doc_id", cap)
            ._jdf.queryExecution().executedPlan().toString())
    assert "LeftSemi" in plan, "cap must pre-filter via semi-join"
    assert plan.index("collect_list") < plan.index("LeftSemi"), \
        "collect_list must sit ABOVE the semi-join (plans print top-down)"
    # uncapped path: no semi-join, single aggregate
    plan_nocap = (_bounded_posting_index(posts, "doc_id", None)
                  ._jdf.queryExecution().executedPlan().toString())
    assert "LeftSemi" not in plan_nocap
