"""Declarative data-quality expectations, evaluated in ONE aggregate pass.

The pipeline-ops counterpart of the reference's config validation
(OSSSinkConnectorConfiguration.java validates the CONFIG surface; a data
engine must also validate the DATA before training jobs consume it —
the Deequ/Great-Expectations role). A check suite compiles into a single
``df.agg(...)`` whose conditional counts all map-side combine, so the
whole battery costs one scan of the table regardless of how many checks
it carries — at 100 TB that is the difference between one pass and one
pass per check. The single agg row is then unpivoted (``stack``) into a
long-format report:

    (check_id, violations, n_rows, violation_rate, passed)

Every builder emits BOTH dialects (Spark + DuckDB) from the same
constants, the module's standing parity discipline, so the report is
oracle-checkable end to end; every count is cast to BIGINT in the duck
dialect (uncast SUM widens to HUGEINT — the r09 typed-hash lesson).

Referential integrity (child keys contained in a parent table) cannot
live in the single-table agg; ``referential_expectation`` emits the same
report row from a left-anti join whose parent side is key-distinct (and
broadcast by AQE when small) — union it onto the single-pass report.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REPORT_COLUMNS = ("check_id", "violations", "n_rows", "violation_rate",
                  "passed")


@dataclass(frozen=True)
class Expectation:
    """One check: a pair of aggregate expressions (per dialect) counting
    violating rows, plus the tolerated violation rate (0.0 = hard)."""

    check_id: str
    spark_agg: str
    duck_agg: str
    max_violation_rate: float = 0.0


def _pred_violations(spark_pred: str, duck_pred: str) -> tuple[str, str]:
    # violation = predicate not TRUE (null predicates violate: an
    # expectation you cannot evaluate is not met)
    return (
        f"SUM(CASE WHEN coalesce({spark_pred}, false) THEN 0 ELSE 1 END)",
        f"SUM(CASE WHEN coalesce({duck_pred}, false) THEN 0 ELSE 1 END)",
    )


def not_null(col: str, max_violation_rate: float = 0.0) -> Expectation:
    s, d = _pred_violations(f"{col} IS NOT NULL", f"{col} IS NOT NULL")
    return Expectation(f"not_null:{col}", s, d, max_violation_rate)


def unique(col: str, max_violation_rate: float = 0.0) -> Expectation:
    """Duplicate rows beyond the first occurrence of each value count as
    violations (COUNT(col) - COUNT(DISTINCT col)); nulls are ignored
    here — pair with not_null when null keys are also illegal."""
    agg = f"(COUNT({col}) - COUNT(DISTINCT {col}))"
    return Expectation(f"unique:{col}", agg, agg, max_violation_rate)


def in_range(col: str, lo, hi, max_violation_rate: float = 0.0,
             ) -> Expectation:
    pred = f"({col} IS NULL OR {col} BETWEEN {lo} AND {hi})"
    s, d = _pred_violations(pred, pred)
    return Expectation(f"in_range:{col}", s, d, max_violation_rate)


def accepted_values(col: str, values: list[str],
                    max_violation_rate: float = 0.0) -> Expectation:
    lits = ", ".join("'" + v.replace("'", "''") + "'" for v in values)
    pred = f"({col} IS NULL OR {col} IN ({lits}))"
    s, d = _pred_violations(pred, pred)
    return Expectation(f"accepted_values:{col}", s, d, max_violation_rate)


def matches(col: str, regex: str, max_violation_rate: float = 0.0,
            ) -> Expectation:
    """Anchor the regex yourself when full-match is intended — both
    engines search for the pattern anywhere in the string.

    Spark's default parser interprets backslash escapes inside a
    single-quoted literal ('^\\d+$' would reach RLIKE as '^d+$') while
    DuckDB's does not, so the Spark side doubles every backslash — the
    two engines then compile the identical pattern."""
    r_spark = regex.replace("\\", "\\\\").replace("'", "''")
    r_duck = regex.replace("'", "''")
    s, d = _pred_violations(
        f"({col} IS NULL OR {col} RLIKE '{r_spark}')",
        f"({col} IS NULL OR regexp_matches({col}, '{r_duck}'))")
    return Expectation(f"matches:{col}", s, d, max_violation_rate)


def satisfies(check_id: str, spark_pred: str, duck_pred: str | None = None,
              max_violation_rate: float = 0.0) -> Expectation:
    """Arbitrary row predicate (the Deequ `satisfies`); pass the DuckDB
    form only when the Spark SQL fragment is not dialect-neutral."""
    s, d = _pred_violations(spark_pred, duck_pred or spark_pred)
    return Expectation(f"satisfies:{check_id}", s, d, max_violation_rate)


def expectations_report(df: DataFrame,
                        checks: list[Expectation]) -> DataFrame:
    """Evaluate the suite in one aggregate pass and unpivot to the long
    report. Empty tables report zero violations and pass every check
    (rate 0/0 -> 0)."""
    if not checks:
        raise ValueError("empty expectation suite")
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")] + [
        F.expr(c.spark_agg).cast("long").alias(f"_v{i}")
        for i, c in enumerate(checks)]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c.check_id}', _v{i}, CAST({c.max_violation_rate} AS DOUBLE)"
        for i, c in enumerate(checks))
    long = row.selectExpr(
        f"stack({len(checks)}, {stack}) AS (check_id, violations, _mr)",
        "_n")
    return long.selectExpr(
        "check_id",
        "coalesce(violations, CAST(0 AS BIGINT)) AS violations",
        "_n AS n_rows",
        "coalesce(ROUND(CAST(violations AS DOUBLE) / nullif(_n, 0), 6), 0.0)"
        " AS violation_rate",
        "coalesce(ROUND(CAST(violations AS DOUBLE) / nullif(_n, 0), 6), 0.0) <= _mr"
        " AS passed")


def expectations_report_oracle_sql(table_expr: str,
                                   checks: list[Expectation]) -> str:
    """DuckDB mirror of ``expectations_report``: the same single agg in a
    CTE, unpivoted by UNION ALL (DuckDB's stack equivalent)."""
    aggs = ["CAST(COUNT(*) AS BIGINT) AS _n"] + [
        f"CAST({c.duck_agg} AS BIGINT) AS _v{i}"
        for i, c in enumerate(checks)]
    rows = []
    for i, c in enumerate(checks):
        cid = c.check_id.replace("'", "''")
        rate = f"coalesce(ROUND(CAST(_v{i} AS DOUBLE) / nullif(_n, 0), 6), 0.0)"
        rows.append(
            f"SELECT '{cid}' AS check_id,"
            f" coalesce(_v{i}, CAST(0 AS BIGINT)) AS violations,"
            f" _n AS n_rows, {rate} AS violation_rate,"
            f" {rate} <= {c.max_violation_rate} AS passed FROM a")
    return ("WITH a AS (SELECT " + ", ".join(aggs) + f" FROM {table_expr}) "
            + " UNION ALL ".join(rows))


def referential_expectation(child: DataFrame, col: str, parent: DataFrame,
                            parent_col: str, check_id: str | None = None,
                            max_violation_rate: float = 0.0) -> DataFrame:
    """One report row: child rows whose non-null ``col`` has no match in
    ``parent.parent_col``. The parent side reduces to distinct keys
    before the anti-join (AQE broadcasts it when small); the child side
    is a narrow single-column scan."""
    cid = check_id or f"referential:{col}"
    keys = parent.select(F.col(parent_col).alias(col)).distinct()
    orphans = (child.select(col).where(F.col(col).isNotNull())
               .join(keys, col, "left_anti")
               .agg(F.count(F.lit(1)).cast("long").alias("violations")))
    total = child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    return (orphans.crossJoin(F.broadcast(total))
            .selectExpr(
                f"'{cid}' AS check_id", "violations", "n_rows",
                "coalesce(ROUND(CAST(violations AS DOUBLE) / nullif(n_rows, 0), 6),"
                " 0.0) AS violation_rate",
                "coalesce(ROUND(CAST(violations AS DOUBLE) / nullif(n_rows, 0), 6),"
                f" 0.0) <= {max_violation_rate} AS passed"))


def referential_expectation_oracle_sql(child_expr: str, col: str,
                                       parent_expr: str, parent_col: str,
                                       check_id: str | None = None,
                                       max_violation_rate: float = 0.0,
                                       ) -> str:
    cid = (check_id or f"referential:{col}").replace("'", "''")
    rate = "coalesce(ROUND(CAST(v AS DOUBLE) / nullif(n, 0), 6), 0.0)"
    return f"""WITH v AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v FROM {child_expr} c
      WHERE c.{col} IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM {parent_expr} p
                        WHERE p.{parent_col} = c.{col})),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {child_expr})
    SELECT '{cid}' AS check_id, v AS violations, n AS n_rows,
           {rate} AS violation_rate,
           {rate} <= {max_violation_rate} AS passed
    FROM v, n"""
