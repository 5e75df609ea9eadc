"""functions/bloom: distributed Bloom bitmap build + codegen probe, and
the bloom-guarded decontamination regime that must be value-identical to
the exact paths (no false negatives => prefilter + exact verify == exact).
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_oss_spark.functions import bloom as B
from kafka_connect_oss_spark.operators.text import decontaminate

M = 1 << 14  # 16 Kib bitmap is plenty for the test cardinalities
K = 5


def _membership(spark, build_vals, probe_vals):
    built = B.bloom_build(
        spark.createDataFrame([(v,) for v in build_vals], "h long"), "h",
        m_bits=M, k=K)
    probe = spark.createDataFrame([(v,) for v in probe_vals], "h long")
    got = (B.bloom_prefilter(probe, "h", built, m_bits=M, k=K)
           .select("h").collect())
    return {r.h for r in got}


def test_no_false_negatives(spark):
    # every built value must probe true — the property the exact-verify
    # equivalence rests on
    vals = [0, 1, -1, 7, 2**59, -(2**59), 123456789] + list(range(100, 400))
    assert _membership(spark, vals, vals) == set(vals)


def test_false_positive_rate_sane(spark):
    # disjoint probes: with n=300, m=2^14, k=5 the expected FP rate is
    # ~(1 - e^(-5*300/16384))^5 ~= 5e-6; assert a loose 2% bound so the
    # test never flakes while still catching a broken probe (a predicate
    # stuck true would fail instantly)
    build = list(range(1_000_000, 1_000_300))
    probe = list(range(2_000_000, 2_005_000))
    hits = _membership(spark, build, probe)
    assert len(hits) <= len(probe) * 0.02


def test_empty_build_rejects_everything(spark):
    assert _membership(spark, [], [1, 2, 3]) == set()


def test_bitmap_is_dense_array(spark):
    built = B.bloom_build(
        spark.createDataFrame([(1,), (2,)], "h long"), "h",
        m_bits=M, k=K).collect()
    assert len(built) == 1
    bm = built[0][B.BITMAP_COL]
    assert len(bm) == M >> 6
    assert any(w != 0 for w in bm)


def test_m_bits_must_be_power_of_two():
    with pytest.raises(ValueError):
        B._positions("h", 3000, 2)


def test_decontaminate_bloom_guard_matches_exact(spark, sf_dir):
    # the bloom-guarded fallback must produce the exact clean set of both
    # the plain fallback and the broadcast-literal path on the same inputs
    from kafka_connect_oss_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 11 == 0).limit(40)
    exact_ids = sorted(
        r.doc_id for r in
        decontaminate(docs, bench, ngram=3,
                      max_broadcast_hashes=None).select("doc_id").collect())
    # max_broadcast_hashes=0 forces the distributed fallback; bloom_bits
    # engages the bitmap prefilter inside it
    bloom_ids = sorted(
        r.doc_id for r in
        decontaminate(docs, bench, ngram=3, max_broadcast_hashes=0,
                      bloom_bits=1 << 16).select("doc_id").collect())
    assert bloom_ids == exact_ids
    assert 0 < len(bloom_ids) < docs.count()


def test_bloom_prefilter_plan_shape(spark):
    # the probe side must stay narrow: ONE broadcast nested-loop join
    # against the single bitmap row, membership evaluated as a Filter —
    # no Exchange introduced on the probe side before the filter
    built = B.bloom_build(
        spark.createDataFrame([(1,)], "h long"), "h", m_bits=M, k=K)
    probe = spark.range(100).select(F.col("id").alias("h"))
    plan = (B.bloom_prefilter(probe, "h", built, m_bits=M, k=K)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan
    # Catalyst absorbs the membership predicate into the join condition
    # itself (xxhash64/element_at probes evaluated per stream row), and
    # the stream child — the text between the join node and the build
    # side's BroadcastExchange — is a bare projection with no Exchange
    body = plan.split("BroadcastNestedLoopJoin", 1)[1]
    cond, stream = body.split("BroadcastExchange", 1)[0], None
    assert "xxhash64" in cond and "element_at" in cond
    stream = body.split("BroadcastExchange", 1)[0].split("\n", 1)[1]
    assert "Exchange" not in stream
