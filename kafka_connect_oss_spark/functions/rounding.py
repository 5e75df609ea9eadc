"""Cross-engine deterministic rounding.

Spark's ROUND (BigDecimal HALF_UP on the shortest decimal repr) and
DuckDB's ROUND disagree on exact ties (e.g. 0.86875 at 4 digits), and the
rational-valued outputs of dedup/text operators (k/n ratios) hit ties
routinely. floor(x * 10^d + 0.5) / 10^d is pure double arithmetic — on
identical input doubles both engines produce identical bits, so oracle
value-hashes match. (Half-up-toward-+inf for negatives; consistency is
what matters, not the tie direction.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_sql(x_expr: str, digits: int) -> str:
    """Dialect-neutral SQL fragment (valid in Spark SQL and DuckDB)."""
    m = float(10 ** digits)
    return f"(floor(({x_expr}) * {m} + 0.5) / {m})"


def fround(col: Column, digits: int) -> Column:
    m = float(10 ** digits)
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)
