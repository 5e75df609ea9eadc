"""Property-based invariants for the round-9 second-batch operators
(hypothesis): semantic_decontam must equal a plain-numpy argmax over ANY
vector set (including ties and scale-invariance), zipf_profile must equal
a numpy least-squares fit for ANY token multiset, and shard_manifest must
be a content function (permutation-invariant, injective per shard on the
generated corpora)."""

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import packing as PK
from kafka_connect_oss_spark.operators import similarity as SIM
from kafka_connect_oss_spark.operators import text as TXT

_coord = st.integers(min_value=-3, max_value=3).map(float)
_vec = st.lists(_coord, min_size=4, max_size=4).filter(
    lambda v: any(x != 0 for x in v))


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(train=st.lists(_vec, min_size=1, max_size=6),
       bench=st.lists(_vec, min_size=1, max_size=4))
def test_semantic_decontam_matches_numpy(spark, train, bench):
    tdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(train)],
        "vec_id long, embedding array<double>")
    bdf_raw = spark.createDataFrame(
        [(i, v) for i, v in enumerate(bench)],
        "vec_id long, embedding array<double>")
    bdf = (SIM.with_normalized(bdf_raw, fan_out=False)
           .select(F.col("vec_id").alias("bench_id"),
                   F.col("nv").alias("bench_nv")))
    got = {r.vec_id: r for r in
           SIM.semantic_decontam(tdf, bdf, threshold=0.5).collect()}
    tn = [np.array(v) / np.linalg.norm(v) for v in train]
    bn = [np.array(v) / np.linalg.norm(v) for v in bench]
    for i, tv in enumerate(tn):
        cos = [float(tv @ bv) for bv in bn]
        best = max(cos)
        # lowest bench id among max-cosine ties (exact-tie only: the
        # operator compares raw doubles, so near-ties are not ties)
        want_id = min(j for j, c in enumerate(cos) if c == best)
        assert got[i].best_bench_id == want_id
        assert math.isclose(got[i].max_cosine, round(best, 6),
                            abs_tol=1.5e-6)
        assert got[i].contaminated == (round(best, 6) >= 0.5)


_zword = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_zdoc = st.lists(_zword, min_size=1, max_size=20).map(" ".join)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_zdoc, min_size=1, max_size=5))
def test_zipf_profile_matches_numpy(spark, texts):
    docs = spark.createDataFrame(
        [(i + 1, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string")
    row = TXT.zipf_profile(docs).collect()[0]
    tf: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                tf[w] = tf.get(w, 0) + 1
    ordered = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(ordered) + 1, dtype=float))
    y = np.log(np.array([c for _, c in ordered], dtype=float))
    assert row.n_types == len(ordered)
    vx = float(np.var(x))
    if vx == 0.0:
        assert row.zipf_slope is None
        return
    cov = float(np.mean(x * y) - np.mean(x) * np.mean(y))
    assert math.isclose(row.zipf_slope, round(-cov / vx, 4), abs_tol=2e-4)
    vy = float(np.var(y))
    if vy == 0.0:
        assert row.r2 is None
    else:
        assert math.isclose(row.r2, round(cov * cov / (vx * vy), 4),
                            abs_tol=2e-4)


_text = st.text(alphabet="abc ", min_size=0, max_size=12)


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(st.tuples(st.integers(0, 50), _text),
                     min_size=1, max_size=10, unique_by=lambda r: r[0]),
       seed=st.integers(0, 3))
def test_shard_manifest_is_a_content_function(spark, rows, seed):
    """Any permutation / physical partitioning of the same rows produces
    the identical manifest, and totals reconcile with the input."""
    df1 = spark.createDataFrame(rows, "doc_id long, text string")
    perm = list(reversed(rows))
    df2 = spark.createDataFrame(perm, "doc_id long, text string") \
        .repartition(2 + seed)
    m1 = sorted(map(tuple, PK.shard_manifest(df1, n_shards=3).collect()))
    m2 = sorted(map(tuple, PK.shard_manifest(df2, n_shards=3).collect()))
    assert m1 == m2
    assert sum(r[1] for r in m1) == len(rows)
    assert sum(r[2] for r in m1) == sum(len(t) for _, t in rows)
