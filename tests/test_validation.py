"""operators/validation: single-pass expectation suites, known-violation
fixtures, dialect parity of the oracle emitters, and the one-scan plan
guarantee."""

import duckdb
import pytest

from kafka_connect_oss_spark.operators import validation as V
from tests.parity import compare, duck_connection


@pytest.fixture(scope="module")
def dirty(spark):
    # 8 rows with one violation of each kind planted deliberately
    rows = [
        (1, "alpha beta", "en", "src1", 10),
        (2, "gamma", "en", "src2", 5),
        (2, "dup id", "de", "src3", 6),          # unique violation
        (3, None, "fr", "src4", 0),              # text null + range 0
        (4, "delta", "xx", "src5", 5),           # lang not accepted
        (5, "epsilon", "es", "bad6", 7),         # source pattern
        (6, "zeta", "zh", "src7", 99),           # n_chars != length(text)
        (None, "eta", "en", "src8", 3),          # doc_id null
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")


SUITE = [
    V.not_null("doc_id"),
    V.unique("doc_id"),
    V.not_null("text"),
    V.accepted_values("lang", ["de", "en", "es", "fr", "zh"]),
    V.matches("source", "^src[0-9]+$"),
    V.in_range("n_chars", 1, 100_000),
    V.satisfies("len_ok", "n_chars = length(text)"),
]


def test_known_violations(spark, dirty):
    rep = {r.check_id: r for r in
           V.expectations_report(dirty, SUITE).collect()}
    assert rep["not_null:doc_id"].violations == 1
    assert rep["unique:doc_id"].violations == 1
    assert rep["not_null:text"].violations == 1
    assert rep["accepted_values:lang"].violations == 1
    assert rep["matches:source"].violations == 1
    assert rep["in_range:n_chars"].violations == 1
    # row 6: n_chars=99 != 4; row 3: text null -> predicate null ->
    # violation; rows 1,2 lengths mismatch too (10!=10? "alpha beta"=10
    # matches; "gamma"=5 matches; "dup id"=6 matches)
    assert rep["satisfies:len_ok"].violations >= 2
    assert all(not rep[c].passed for c in (
        "not_null:doc_id", "unique:doc_id", "satisfies:len_ok"))
    assert all(r.n_rows == 8 for r in rep.values())


def test_tolerated_rate_passes(spark, dirty):
    rep = V.expectations_report(
        dirty, [V.not_null("doc_id", max_violation_rate=0.2)]).collect()
    assert rep[0].violations == 1 and rep[0].passed


def test_empty_table_passes_everything(spark):
    empty = spark.createDataFrame([], "doc_id long, text string,"
                                      " lang string, source string,"
                                      " n_chars long")
    rep = V.expectations_report(empty, SUITE).collect()
    assert len(rep) == len(SUITE)
    assert all(r.passed and r.violations == 0 and r.n_rows == 0
               and r.violation_rate == 0.0 for r in rep)


def test_empty_suite_rejected(spark, dirty):
    with pytest.raises(ValueError):
        V.expectations_report(dirty, [])


def test_single_pass_plan(spark, dirty):
    # the whole battery reads the table ONCE, however many checks it
    # carries — one Scan, no Join. (COUNT(DISTINCT) inside the unique
    # check adds its standard two-phase exchange on top of the final
    # SinglePartition exchange; both operate on already-aggregated rows,
    # not on a second pass over the data.)
    plan = (V.expectations_report(dirty, SUITE)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Scan") == 1
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2


def test_referential_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
    row = V.referential_expectation(child, "fk", parent, "pk").collect()[0]
    assert row.check_id == "referential:fk"
    assert row.violations == 1          # fk=99; null fk is not an orphan
    assert row.n_rows == 4 and not row.passed


def test_oracle_parity_on_testdata(spark, sf_dir):
    # the staged corpus_expectations_report runs through the full driver
    # contract in test_staged_seats; here pin the two emitters separately
    from kafka_connect_oss_spark.sources.batch import load_table

    con = duck_connection(sf_dir)
    try:
        docs = load_table(spark, sf_dir, "documents")
        suite = [V.not_null("doc_id"), V.unique("doc_id"),
                 V.in_range("n_chars", 1, 100_000),
                 V.satisfies("len_ok", "n_chars = length(text)")]
        compare(V.expectations_report(docs, suite), con,
                V.expectations_report_oracle_sql("documents", suite),
                "expectations_report")
        compare(
            V.referential_expectation(
                load_table(spark, sf_dir, "orders"), "o_custkey",
                load_table(spark, sf_dir, "customer"), "c_custkey"),
            con,
            V.referential_expectation_oracle_sql(
                "orders", "o_custkey", "customer", "c_custkey"),
            "referential_expectation")
    finally:
        con.close()


def test_matches_backslash_regex_parity(spark):
    """Spark's parser eats backslashes inside single-quoted literals
    (DuckDB's does not) — matches() must double them for the Spark side
    so both engines compile the identical pattern (r10 ADVICE)."""
    df = spark.createDataFrame(
        [(1, "123"), (2, "abc"), (3, "4x5"), (4, None)],
        "id long, s string")
    exp = V.matches("s", r"^\d+$")
    rep = {r.check_id: r for r in
           V.expectations_report(df, [exp]).collect()}
    # with the unescaped bug the Spark pattern becomes '^d+$': 0 matches
    # -> 3 violations; the true pattern accepts only '123' -> 2
    assert rep["matches:s"].violations == 2
    con = duckdb.connect()
    con.register("tbl", df.toPandas())
    dv = con.execute(
        "SELECT " + exp.duck_agg + " FROM tbl").fetchone()[0]
    assert dv == 2, "DuckDB oracle must count the same violations"
