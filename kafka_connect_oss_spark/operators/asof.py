"""Temporal joins — as-of and bounded-range — operators the reference and
Spark both lack natively (driver-mandated extension; DuckDB/kdb/pandas
merge_asof semantics: for every left row, the single right row with the
greatest right_ts <= left_ts for the same key).

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
              right_prefix: str = "r_",
              skew_bucket_ms: int | None = None) -> DataFrame:
    """Backward as-of join: left columns + the latest right row's columns
    (prefixed) whose right_ts <= left_ts per `on` key. Left rows with no
    prior right row keep NULL right columns (left-join semantics).

    The matched right row is carried as ONE struct (not per-column
    ``last()`` calls): a right row whose payload columns include legitimate
    NULLs must still be matched atomically — independent per-column
    carries would stitch together a composite row that never existed.
    Ties among equal right timestamps are broken deterministically by a
    content hash of the right payload (largest wins), so re-runs and
    retries pick the same row regardless of partitioning.

    ``skew_bucket_ms``: skew hardening for hot keys. The plain plan's
    window is partitioned by the join key alone, so one mega-key's entire
    history serializes through a single task (window functions get no AQE
    skew split). With a bucket width set, the window partitions by
    (key, time-bucket) — a hot key's timeline spreads across buckets —
    and the cross-bucket carry is reconstructed from per-bucket "last
    right payload" summaries (one row per key x bucket, orders of
    magnitude smaller than the raw history) via a second, tiny window.
    Same semantics, pinned by test_asof_skew_bucketed_matches_plain;
    equal timestamps always share a bucket, so tie behavior is identical.
    """
    lcols = [c for c in left.columns]
    rpayload = [c for c in right.columns if c not in on]

    r_struct = F.struct(*[F.col(c).alias(c) for c in rpayload])
    r_struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tie"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in on],
        F.lit(None).cast(r_struct_type).alias("_r"))
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.xxhash64(r_struct).alias("_tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols if c not in on],
        r_struct.alias("_r"))

    union = l_tagged.unionByName(r_tagged)
    l_pass = [F.col(f"_l_{c}") for c in lcols if c not in on]
    out_cols = [
        *on,
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in on],
        *[F.col(f"_r.{c}").alias(f"{right_prefix}{c}") for c in rpayload]]

    if skew_bucket_ms is None:
        # _side orders right rows (0) before left rows (1) at equal ts ->
        # inclusive match; _tie makes the winner among equal-ts right rows
        # deterministic (last() takes the max-hash row).
        w = (Window.partitionBy(*on).orderBy("_ts", "_side", "_tie")
             .rowsBetween(Window.unboundedPreceding, 0))
        carried = union.select(
            *on, "_ts", "_side", *l_pass,
            F.last("_r", ignorenulls=True).over(w).alias("_r"))
        return carried.where(F.col("_side") == 1).select(*out_cols)

    # ---- skew-hardened plan: window over (key, coarse time bucket) ----
    bk = F.floor(F.unix_millis(F.col("_ts").cast("timestamp"))
                 / F.lit(skew_bucket_ms))
    u = union.withColumn("_bk", bk)
    w_in = (Window.partitionBy(*on, "_bk").orderBy("_ts", "_side", "_tie")
            .rowsBetween(Window.unboundedPreceding, 0))
    in_bucket = u.select(
        *on, "_bk", "_ts", "_side", *l_pass,
        F.last("_r", ignorenulls=True).over(w_in).alias("_r_in"))

    # per-(key, bucket) last right payload; buckets that hold only left
    # rows still need a summary row so the carry survives right-row gaps
    r_last = (u.where(F.col("_side") == 0)
              .groupBy(*on, "_bk")
              .agg(F.max_by("_r", F.struct("_ts", "_tie"))
                   .alias("_bk_last_r")))
    all_bk = u.select(*on, "_bk").distinct()
    w_carry = (Window.partitionBy(*on).orderBy("_bk")
               .rowsBetween(Window.unboundedPreceding, -1))
    carry = (all_bk.join(r_last, [*on, "_bk"], "left")
             .select(*on, "_bk",
                     F.last("_bk_last_r", ignorenulls=True).over(w_carry)
                     .alias("_carry_r")))

    joined = (in_bucket.where(F.col("_side") == 1)
              .join(carry, [*on, "_bk"])
              .withColumn("_r", F.coalesce("_r_in", "_carry_r")))
    return joined.select(*out_cols)


def range_join(left: DataFrame, right: DataFrame, on: list[str],
               lower_ms: int, upper_ms: int,
               left_ts: str = "ts", right_ts: str = "ts",
               right_prefix: str = "r_") -> DataFrame:
    """Bounded-interval join: pairs with right_ts - left_ts in
    [lower_ms, upper_ms] per key (e.g. "errors within 10 minutes after a
    purchase").

    Spark-first plan: a naive range predicate on a key-only equi-join
    explodes per key and, keyless, degrades to a broadcast-nested-loop.
    Here both sides are time-bucketed with bucket width >= the interval
    span, the right timestamp shifted by -lower: a qualifying pair then
    lands either in the same bucket or adjacent ones, so the LEFT side is
    replicated exactly 2x (buckets b, b+1) and the join is a plain
    equi-join on (key, bucket) + exact filter. Linear, shuffle on
    (key, bucket) — time-skew (hot hours) spreads across buckets by
    construction.
    """
    span_ms = upper_ms - lower_ms
    if span_ms <= 0:
        raise ValueError("upper_ms must exceed lower_ms")
    width_us = span_ms * 1000
    lo_us, hi_us = lower_ms * 1000, upper_ms * 1000

    # cast: unix_micros rejects TIMESTAMP_NTZ inputs; under the engine's
    # pinned-UTC session the cast is value-preserving (sources/batch.py)
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    rpayload = [c for c in right.columns if c not in on]

    l_b = (left
           .withColumn("_us", l_us)
           .withColumn("_bk", F.explode(F.array(
               F.floor(F.col("_us") / width_us),
               F.floor(F.col("_us") / width_us) + 1))))
    r_b = (right
           .select(*on, r_us.alias("_r_us"),
                   *[F.col(c).alias(f"{right_prefix}{c}") for c in rpayload])
           .withColumn("_bk", F.floor((F.col("_r_us") - lo_us) / width_us)))
    joined = (l_b.join(r_b, [*on, "_bk"])
              .where((F.col("_r_us") - F.col("_us") >= lo_us)
                     & (F.col("_r_us") - F.col("_us") <= hi_us)))
    # bucket-b/b+1 double-match is impossible (one bucket per right row),
    # so no distinct needed
    return joined.drop("_bk", "_us", "_r_us")
