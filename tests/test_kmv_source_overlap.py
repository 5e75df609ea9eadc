"""Deterministic invariants of the KMV cross-source overlap planner
(operators/sketches.kmv_source_overlap) — properties that hold EXACTLY
for any sketch size K, so they pin estimator correctness independently
of the probabilistic error bound the oracle-parity sweep exercises:

* identical sources (one source's docs replayed under a second name):
  ka == kb, so jaccard_est == 1.0 and inter_est == union_est exactly;
* shingle-disjoint sources: no union min can be a member of both
  sketches, so jaccard_est == 0.0 and inter_est == 0.0 exactly;
* below-K sources: union_est is the EXACT distinct union cardinality
  (the < K branch), n_a/n_b are exact counts.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import sketches as SK


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


def test_identical_sources_estimate_exactly_one(spark):
    base = [(i, "a", f"alpha beta gamma delta token{i} epsilon zeta")
            for i in range(30)]
    twin = [(100 + i, "b", t) for i, (_, _, t) in enumerate(base)]
    out = SK.kmv_source_overlap(_docs(spark, base + twin)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source_a, r.source_b) == ("a", "b")
    assert r.n_a == r.n_b  # same distinct shingle sets
    assert r.jaccard_est == 1.0
    assert r.inter_est == r.union_est


def test_disjoint_sources_estimate_exactly_zero(spark):
    rows = ([(i, "a", f"left{i} left{i+1} left{i+2} left{i+3}")
             for i in range(20)] +
            [(100 + i, "b", f"right{i} right{i+1} right{i+2} right{i+3}")
             for i in range(20)])
    out = SK.kmv_source_overlap(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.jaccard_est == 0.0
    assert r.inter_est == 0.0
    assert r.n_a > 0 and r.n_b > 0


def test_below_k_union_is_exact(spark):
    # 3-gram shingles of a 5-token doc = 3 distinct shingles per doc;
    # two sources of 2 docs each stay far below K=64, so the union
    # estimate takes the exact (< K) branch
    rows = [(0, "a", "p q r s t"), (1, "a", "u v w x y"),
            (2, "b", "p q r s t"), (3, "b", "f g h i j")]
    out = SK.kmv_source_overlap(_docs(spark, rows)).collect()
    (r,) = out
    assert r.n_a == 6 and r.n_b == 6
    # union = 6 (shared doc) + 3 + 3 distinct shingle sets per side - overlap
    assert r.union_est == 9.0
    # shared shingles: the 3 from the common doc -> jaccard 3/9
    assert r.jaccard_est == pytest.approx(3 / 9, abs=1e-4)
    assert r.inter_est == pytest.approx(3.0, abs=1e-3)


def test_pair_count_and_ordering(spark):
    rows = [(i, f"s{i % 4}", f"tok{i} tok{i+1} tok{i+2} tok{i+3}")
            for i in range(40)]
    out = SK.kmv_source_overlap(_docs(spark, rows)).collect()
    assert len(out) == 6  # C(4, 2)
    pairs = [(r.source_a, r.source_b) for r in out]
    assert pairs == sorted(pairs)
    assert all(a < b for a, b in pairs)
