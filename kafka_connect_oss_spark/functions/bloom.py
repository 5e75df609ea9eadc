"""Distributed Bloom filter as a broadcastable single-row bitmap.

Scale role: a semi-join whose build side is too large to inline as a
literal (text.decontaminate's >1M-hash regime) still shuffles EVERY probe
row today. A Bloom bitmap keeps the 100 TB probe side narrow: build the
m-bit filter distributed (explode k probe positions -> per-word bit_or ->
ONE dense ``array<bigint>`` row), broadcast that row, and prefilter
probe rows in whole-stage codegen before the exact join. Bloom filters
have NO false negatives, so `bloom prefilter + exact verify join` is
value-identical to the exact join — the filter only shrinks the shuffled
row set (by 1 - FP-rate on the non-matching majority). This is the same
runtime-row-filtering idea Spark's own InjectRuntimeFilter applies to
shuffle joins, exposed as an explicit operator so the planner-independent
pipelines (decontamination, blocklists) can rely on it.

Design notes:

* Positions are ``xxhash64(value, j) & (m-1)`` for j in 0..k-1 —
  JVM-side, engine-stable, no Python. m must be a power of two.
* The bitmap is a DENSE ``array<bigint>`` (length m/64) in one row:
  ``element_at(array, i)`` is O(1) on UnsafeArrayData, whereas a
  MAP bitmap would linear-scan its entries per probe (k scans/row —
  ruinous). Dense fill is a tiny m/64-row range join, then ONE
  executor-side ``array_sort(collect_list(struct))`` -> values.
* The probe side crossJoins the broadcast single row (a
  BroadcastNestedLoopJoin over exactly one build row — effectively a
  free closure capture) and filters with k O(1) word lookups per row.
* No DuckDB dialect: the oracle of any bloom-guarded pipeline is the
  EXACT semantics (no false negatives), never the filter internals.

Sizing: FP ~= (1 - e^(-k*n/m))^k. The decontaminate fallback regime
(n > 1M hashes) with the default m = 2^23 bits (1 MiB) and k = 5 gives
~2% FP at n = 1M and ~18% at n = 2M — still a 5-50x shuffle reduction;
callers with bigger build sides pass a bigger m.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 23
DEFAULT_K = 5

#: column name the build emits and the probe reads
BITMAP_COL = "bloom_bm"


def _positions(value_expr: str, m_bits: int, k: int) -> list[str]:
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    return [f"(xxhash64({value_expr}, {j}) & {m_bits - 1})"
            for j in range(k)]


def bloom_build(values: DataFrame, value_col: str,
                m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                ) -> DataFrame:
    """ONE-row DataFrame [`bloom_bm`: array<bigint> of length m_bits/64]
    over the distinct-or-not values of ``value_col`` (duplicates only
    re-set bits — build from the cheaper frame). Fully distributed: the
    heavy explode/bit_or aggregates map-side; only m/64 words cross the
    final shuffle."""
    spark = values.sparkSession
    m_words = m_bits >> 6
    pos = F.explode(F.array(
        *[F.expr(p) for p in _positions(value_col, m_bits, k)])).alias("pos")
    words = values.select(pos).select(
        F.expr("pos >> 6").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT))")
        .alias("b"))
    bits = words.groupBy("w").agg(F.expr("bit_or(b)").alias("b"))
    dense = (spark.range(m_words).select(F.col("id").alias("w"))
             .join(bits, "w", "left")
             .select("w", F.coalesce("b", F.lit(0).cast("long")).alias("b")))
    return dense.agg(F.expr(
        "transform(array_sort(collect_list(struct(w, b))), s -> s.b)")
        .alias(BITMAP_COL))


def bloom_might_contain(value_expr: str,
                        m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                        bitmap_col: str = BITMAP_COL) -> Column:
    """Membership predicate against a ``bloom_build`` bitmap column (the
    caller crossJoins the broadcast build row first). True for every
    value that was in the build set (never a false negative); true for a
    sizing-dependent fraction of absent values (the exact verify join
    downstream removes those)."""
    conds = [
        f"(element_at({bitmap_col}, CAST(({p}) >> 6 AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(({p}) & 63 AS INT))) != 0"
        for p in _positions(value_expr, m_bits, k)]
    return F.expr(" AND ".join(conds))


def bloom_prefilter(probe: DataFrame, value_col: str, bloom: DataFrame,
                    m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                    ) -> DataFrame:
    """``probe`` rows whose ``value_col`` might be in the filter — the
    broadcast crossJoin + predicate + bitmap drop, packaged."""
    return (probe.crossJoin(F.broadcast(bloom))
            .where(bloom_might_contain(value_col, m_bits, k))
            .drop(BITMAP_COL))
