"""redact_pii: placement semantics, count correctness, and cross-engine
parity of the regex subset (Java on Spark, RE2 on DuckDB) on adversarial
strings — the guarantee behind the text_pii_redacted oracle."""

import duckdb

from kafka_connect_oss_spark.operators.text import (redact_pii,
                                                    redact_pii_oracle_sql)

CASES = [
    (0, "mail me at jane.doe+spam@sub.example.co.uk today"),
    (1, "server 192.168.0.1 and 10.0.255.7 rebooted"),
    (2, "call +1 555-867-5309 or 020 7946 0958 now"),
    (3, "no pii here at all"),
    (4, "a@b.io x 1.2.3.4 y +44 123456789 z"),
    (5, "trailing dot host 1.2.3.4."),
    (6, ""),
    (7, "double@@at.com is not an@address sort.of@ok.org"),
]


def test_redact_pii_semantics(spark):
    docs = spark.createDataFrame(CASES, "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert out[0].redacted_text == "mail me at <EMAIL> today"
    assert out[0].n_email == 1 and out[0].n_ipv4 == 0
    assert out[1].redacted_text == "server <IP> and <IP> rebooted"
    assert out[1].n_ipv4 == 2
    assert out[2].n_phone == 2
    assert "<PHONE>" in out[2].redacted_text
    assert out[3].redacted_text == CASES[3][1]
    assert (out[3].n_email, out[3].n_ipv4, out[3].n_phone) == (0, 0, 0)
    assert out[6].redacted_text == ""


def test_redact_pii_matches_duckdb_on_adversarial_strings(spark):
    docs = spark.createDataFrame(CASES, "doc_id long, text string")
    srows = sorted(map(tuple, redact_pii(docs).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", CASES)
    drows = sorted(map(tuple,
                       con.execute(redact_pii_oracle_sql("t")).fetchall()))
    assert srows == drows


def test_prune_frequent_tokens_semantics(spark):
    from kafka_connect_oss_spark.operators.text import prune_frequent_tokens

    # 'common' in 3/4 docs (75%), 'rare' in 1; threshold 0.5 prunes only
    # 'common'; duplicates and order of surviving tokens preserved
    docs = spark.createDataFrame(
        [(0, "common rare common x"), (1, "common y"), (2, "common z"),
         (3, "w w rare")], "doc_id long, text string")
    out = {r.doc_id: r for r in
           prune_frequent_tokens(docs, df_frac=0.5).collect()}
    assert out[0].pruned_text == "rare x"
    assert (out[0].n_tokens, out[0].n_removed) == (4, 2)
    assert out[3].pruned_text == "w w rare"
    assert out[3].n_removed == 0


def test_prune_frequent_tokens_empty_frequent_set(spark):
    from kafka_connect_oss_spark.operators.text import prune_frequent_tokens

    # no token crosses a 0.99 threshold -> everything survives verbatim
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "c d")], "doc_id long, text string")
    out = {r.doc_id: r.pruned_text
           for r in prune_frequent_tokens(docs, df_frac=0.99).collect()}
    assert out == {0: "a b", 1: "c d"}


def test_prune_frequent_tokens_matches_duckdb(spark):
    from kafka_connect_oss_spark.operators.text import (
        prune_frequent_tokens, prune_frequent_tokens_oracle_sql)

    rows = [(0, "common rare common x"), (1, "common y"), (2, "common z"),
            (3, "w w rare"), (4, ""), (5, "  spaced   out  common ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    srows = sorted(map(tuple, prune_frequent_tokens(docs, 0.5).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    drows = sorted(map(tuple, con.execute(
        prune_frequent_tokens_oracle_sql("t", 0.5)).fetchall()))
    assert srows == drows


def test_redact_pii_plan_is_narrow(spark):
    # the scrub must be a pure projection: no exchange anywhere
    docs = spark.createDataFrame([(0, "a@b.co")], "doc_id long, text string")
    plan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_prune_frequent_tokens_plan_broadcasts_frequent_set(spark):
    from kafka_connect_oss_spark.operators.text import prune_frequent_tokens

    docs = spark.createDataFrame([(0, "a b"), (1, "a c")],
                                 "doc_id long, text string")
    plan = prune_frequent_tokens(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    # corpus side joins the 1-row frequent set via broadcast, never a
    # shuffled join of the corpus
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the only hash shuffle is the vocabulary DF aggregation
    assert plan.count("Exchange hashpartitioning") <= 2
