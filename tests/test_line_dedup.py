"""Corpus line-level dedup (RefinedWeb line-wise corrections): hand
goldens on a crafted lined corpus + full DuckDB-oracle parity (the
driver-gate contract via tests/parity.py, since the driver window is
frozen this round)."""

import duckdb

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators.text import (line_dedup,
                                                    line_dedup_oracle_sql)
from kafka_connect_oss_spark.sources.batch import load_table
from tests.parity import compare


def _lined_corpus(spark, tmp_path):
    boiler = "Subscribe to our newsletter"
    cookie = "  this site uses COOKIES  "  # normalizes across variants
    rows = [
        (0, f"{boiler}\nunique first line\n\nThis site uses cookies"),
        (1, f"repeated inside\nrepeated inside\n{boiler}\nanother unique"),
        (2, f"{cookie}\n{boiler}"),                      # fully boilerplate
        (3, "only unique content here"),
        (4, ""),                                         # empty doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "lined.parquet")
    df.coalesce(1).write.parquet(p)
    return df, p + "/*.parquet"


def test_line_dedup_hand_golden(spark, tmp_path):
    docs, _ = _lined_corpus(spark, tmp_path)
    got = {r.doc_id: r for r in line_dedup(docs, min_df=2).collect()}

    # boilerplate ("subscribe...", "this site uses cookies" across its
    # case/whitespace variants) leaves; unique + blank lines stay
    assert got[0].clean_text == "unique first line\n"
    assert (got[0].n_lines, got[0].n_removed) == (4, 2)
    # a line repeated only WITHIN one doc is not corpus boilerplate
    assert got[1].clean_text == \
        "repeated inside\nrepeated inside\nanother unique"
    assert got[1].n_removed == 1
    # fully-boilerplate doc is repaired to empty, not dropped
    assert got[2].clean_text == "" and got[2].n_removed == 2
    assert got[3].clean_text == "only unique content here"
    assert got[4].clean_text == "" and got[4].n_lines == 1


def test_line_dedup_duckdb_parity(spark, sf_dir, tmp_path):
    docs, path = _lined_corpus(spark, tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lined AS SELECT * FROM read_parquet('{path}')")
    compare(line_dedup(docs, min_df=2), con,
            line_dedup_oracle_sql("lined", min_df=2), "line_dedup")

    # and over the real documents table (no newlines -> each doc is one
    # line; exact clones normalize equal and are removed as boilerplate
    # on BOTH engines — the parity is the point)
    real = load_table(spark, sf_dir, "documents")
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM "
                 f"read_parquet('{sf_dir}/documents.parquet')")
    compare(line_dedup(real, min_df=2), con2,
            line_dedup_oracle_sql("documents", min_df=2),
            "line_dedup_real")


def test_line_dedup_plan_no_cartesian(spark, tmp_path):
    docs, _ = _lined_corpus(spark, tmp_path)
    plan = (line_dedup(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
