"""As-of (point-in-time) join — an operator the reference and Spark both
lack natively (driver-mandated extension; DuckDB/kdb/pandas merge_asof
semantics: for every left row, the single right row with the greatest
right_ts <= left_ts for the same key).

Spark-first plan: NOT a range theta-join (which Catalyst executes as a
broadcast-nested-loop / cartesian per key — quadratic per key and a
scale cliff). Instead the classic union-tag trick:

  1. union both sides, tagged, with right payload columns nulled on left
     rows — a narrow projection;
  2. one Window per key ordered by (ts, side-tag): ``last(payload,
     ignorenulls=true)`` over rows-unbounded-preceding carries the most
     recent right payload forward to each left row;
  3. filter back to left rows.

Cost: ONE shuffle + sort on the join key — the same shape as any windowed
aggregation, linear in |left| + |right|, skew-safe under AQE. The side
tag orders right rows before left rows at equal timestamps, so the match
is inclusive (left_ts >= right_ts), matching DuckDB's ``ASOF JOIN ... ON
l.ts >= r.ts`` for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_prefix: str = "r_") -> DataFrame:
    """Backward as-of join: left columns + the latest right row's columns
    (prefixed) whose right_ts <= left_ts per `on` key. Left rows with no
    prior right row keep NULL right columns (left-join semantics)."""
    lcols = [c for c in left.columns]
    rpayload = [c for c in right.columns if c not in on]

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in rpayload])
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols if c not in on],
        *[F.col(c).alias(f"_r_{c}") for c in rpayload])

    w = (Window.partitionBy(*on).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = l_tagged.unionByName(r_tagged).select(
        *on, "_ts", "_side",
        *[F.col(f"_l_{c}") for c in lcols if c not in on],
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
          for c in rpayload])
    out = carried.where(F.col("_side") == 1).select(
        *on,
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in on],
        *[F.col(f"_r_{c}").alias(f"{right_prefix}{c}") for c in rpayload])
    return out
