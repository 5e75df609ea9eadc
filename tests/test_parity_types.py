"""The r09 regression class, pinned: three window seats were lost to an
oracle whose final SELECT left a SUM() uncast — DuckDB widened it to
HUGEINT, pandas turned that into float64, and the driver's typed value
hash failed while every stringifying local comparison (including
tests/parity.compare's own value loop) said MATCH. These tests feed
compare() exactly that shape and assert it now FAILS loudly, and that
the width-level differences the driver demonstrably tolerates
(BIGINT-vs-INTEGER, DECIMAL-vs-DOUBLE — green for rounds r01-r09) still
pass."""

import duckdb
import pytest

from tests.parity import assert_types, compare


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_hugeint_final_select_fails(spark, con):
    """An uncast SUM() (HUGEINT) against a Spark BIGINT must fail even
    though the values stringify equal — the exact r09 bug."""
    sdf = spark.sql("SELECT CAST(6 AS BIGINT) AS total")
    with pytest.raises(AssertionError, match="type-family|HUGEINT"):
        compare(sdf, con,
                "SELECT SUM(x) AS total FROM (VALUES (1), (2), (3)) t(x)",
                "hugeint_case")


def test_hugeint_cast_to_bigint_passes(spark, con):
    """The one-line fix (CAST(SUM(..) AS BIGINT)) makes the same query
    green."""
    sdf = spark.sql("SELECT CAST(6 AS BIGINT) AS total")
    compare(sdf, con,
            "SELECT CAST(SUM(x) AS BIGINT) AS total "
            "FROM (VALUES (1), (2), (3)) t(x)", "hugeint_fixed")


def test_decimal_vs_bigint_fails(spark, con):
    """DECIMAL leaking into a final select against an int-family Spark
    column is the same family break (pandas Decimal/float vs int)."""
    sdf = spark.sql("SELECT CAST(2 AS BIGINT) AS v")
    with pytest.raises(AssertionError, match="type-family"):
        assert_types(sdf.dtypes, con, "SELECT CAST(2 AS DECIMAL(10,2)) AS v",
                     "decimal_case")


def test_integer_width_difference_tolerated(spark, con):
    """BIGINT-vs-INTEGER stays green: the driver attested rows with this
    exact shape for rounds (events_top_users_per_type rnk, r01/r04/r07),
    so the harness must not be stricter than the contract it mirrors."""
    sdf = spark.sql("SELECT CAST(1 AS INT) AS rnk")
    compare(sdf, con, "SELECT CAST(1 AS BIGINT) AS rnk", "width_case")


def test_decimal_vs_double_tolerated(spark, con):
    """DECIMAL(13,1)-vs-DOUBLE stays green (events_value_histogram
    bin_lo, driver-green r05/r08): both land in the float family."""
    sdf = spark.sql("SELECT CAST(1.5 AS DOUBLE) AS bin_lo")
    compare(sdf, con, "SELECT CAST(1.5 AS DECIMAL(13,1)) AS bin_lo",
            "decimal_double_case")


def test_array_inner_family_checked(spark, con):
    """The family walk recurses into arrays: array<bigint> vs a DuckDB
    HUGEINT[] must fail, BIGINT[] must pass."""
    sdf = spark.sql("SELECT array(CAST(1 AS BIGINT)) AS xs")
    assert_types(sdf.dtypes, con, "SELECT [CAST(1 AS BIGINT)] AS xs", "arr_ok")
    with pytest.raises(AssertionError, match="type-family"):
        assert_types(sdf.dtypes, con,
                     "SELECT [CAST(1 AS HUGEINT)] AS xs", "arr_bad")
