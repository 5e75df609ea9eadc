"""Per-source epoch/repeat allocation (packing.epoch_plan): DuckDB-oracle
parity, hand goldens for the cap/uncapped branches, and the
budget-accounting invariants."""

import duckdb

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators.packing import (epoch_plan,
                                                       epoch_plan_oracle_sql)
from kafka_connect_oss_spark.sources.batch import load_table
from tests.parity import compare


def test_duckdb_parity_real_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    compare(epoch_plan(docs, budget_tokens=1_000_000), con,
            epoch_plan_oracle_sql("documents", budget_tokens=1_000_000),
            "epoch_plan")


def _corpus(spark):
    # src_a: 10 tokens total, src_b: 90 tokens total
    rows = [(0, "a", " ".join(f"w{i}" for i in range(10))),
            (1, "b", " ".join(f"x{i}" for i in range(45))),
            (2, "b", " ".join(f"y{i}" for i in range(45)))]
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def test_natural_weights_uncapped(spark):
    """Natural weights + budget == corpus size -> exactly one epoch per
    source, full utilization."""
    got = {r.source: r for r in
           epoch_plan(_corpus(spark), budget_tokens=100).collect()}
    assert got["a"].epochs == 1.0 and got["b"].epochs == 1.0
    assert got["a"].planned_tokens == 10
    assert got["b"].planned_tokens == 90
    assert got["a"].utilization == 1.0


def test_explicit_weights_hit_the_repeat_cap(spark):
    """Equal weights push the small source to the max_epochs cap, so the
    plan runs under budget and utilization says by how much."""
    got = {r.source: r for r in
           epoch_plan(_corpus(spark), budget_tokens=100, max_epochs=2.0,
                      weights={"a": 1.0, "b": 1.0}).collect()}
    # target 50 each; src_a capped at 2 epochs -> 20 tokens
    assert got["a"].epochs == 2.0 and got["a"].planned_tokens == 20
    assert got["b"].epochs == round(50 / 90, 4)
    assert got["b"].planned_tokens == 50
    assert got["a"].utilization == round(70 / 100, 4)


def test_epochs_never_exceed_cap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    over = (epoch_plan(docs, budget_tokens=10**9, max_epochs=3.5)
            .where(F.col("epochs") > 3.5).count())
    assert over == 0


def test_zero_sum_weights_raise(spark):
    """An explicit weights dict that cannot produce a positive weight sum
    must fail loudly instead of planning all-NULL rows (r10 ADVICE)."""
    import pytest

    with pytest.raises(ValueError, match="positive"):
        epoch_plan(_corpus(spark), budget_tokens=100,
                   weights={"a": 0.0, "b": 0.0})
    with pytest.raises(ValueError, match="positive"):
        epoch_plan(_corpus(spark), budget_tokens=100, weights={})


def test_absent_source_weights_raise_at_execution(spark):
    """A positive dict naming only sources absent from the corpus zeroes
    the effective weight sum at runtime — the plan raises instead of
    emitting NULL targets."""
    import pytest

    df = epoch_plan(_corpus(spark), budget_tokens=100,
                    weights={"nope": 1.0})
    with pytest.raises(Exception, match="effective weight sum"):
        df.collect()


def test_explicit_weights_still_plan(spark):
    got = {r.source: r for r in
           epoch_plan(_corpus(spark), budget_tokens=100,
                      weights={"a": 1.0, "b": 3.0}).collect()}
    assert got["a"].target_tokens == 25
    assert got["b"].target_tokens == 75
