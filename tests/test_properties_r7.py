"""Property-based invariants for the round-7 operator changes
(hypothesis): for ANY document/weight set, incremental dedup must
partition statuses consistently with a plain-Python reference, blocked
n-gram Jaccard's hash intersect must equal the string-set metric, and
weighted sampling must realise the exact A-Res order — correctness
beyond the fixed-oracle comparisons.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import dedup
from kafka_connect_oss_spark.operators import text as TXT

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "ep", "ze", "x"])
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)
_docs = st.lists(_doc, min_size=2, max_size=10)


def _frame(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _shingles(t: str, n: int = 3) -> set:
    toks = t.split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=_docs)
def test_incremental_status_matches_python(spark, texts):
    """Statuses replicate the documented precedence: byte-identical to
    base or an earlier increment doc -> dup_exact; verified jaccard >=
    threshold vs some base doc -> dup_near; else kept."""
    df = _frame(spark, texts)
    base = df.where(F.col("doc_id") % 2 == 0)
    inc = df.where(F.col("doc_id") % 2 == 1)
    got = {r.doc_id: r.status
           for r in dedup.incremental_dedup_status(base, inc).collect()}
    base_texts = {t for i, t in enumerate(texts) if (i + 1) % 2 == 0}
    inc_items = [(i + 1, t) for i, t in enumerate(texts) if (i + 1) % 2]
    first_of = {}
    for i, t in inc_items:
        first_of.setdefault(t, i)
    assert set(got) == {i for i, _ in inc_items}
    for i, t in inc_items:
        if t in base_texts or first_of[t] != i:
            assert got[i] == "dup_exact", (i, t)
        elif got[i] == "kept":
            # kept => no base doc meets the threshold on exact jaccard
            sh = _shingles(t)
            for bt in base_texts:
                bsh = _shingles(bt)
                if sh or bsh:
                    inter = len(sh & bsh)
                    union = len(sh | bsh)
                    if union and round(inter / union, 4) >= 0.3:
                        raise AssertionError((i, t, bt))
        else:
            assert got[i] == "dup_near"
            # near => SOME base doc meets the threshold
            sh = _shingles(t)
            hits = [bt for bt in base_texts
                    if len(sh | _shingles(bt)) and
                    round(len(sh & _shingles(bt)) /
                          len(sh | _shingles(bt)), 4) >= 0.3]
            assert hits, (i, t)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=_docs)
def test_ngram_jaccard_hash_intersect_equals_string_sets(spark, texts):
    """The round-7 hash-based intersect must equal the exact string-set
    jaccard on every pair (md5-collision-free for any realistic data)."""
    df = _frame(spark, texts).withColumn("lang", F.lit("en")) \
                             .withColumn("source", F.lit("s"))
    got = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.ngram_jaccard_pairs(
               df, ["lang", "source"], threshold=0.0).collect()}
    for i, a in enumerate(texts):
        for j, b in enumerate(texts):
            if i >= j:
                continue
            sa, sb = _shingles(a), _shingles(b)
            if not sa or not sb:
                # empty side -> NULL/zero jaccard never emitted at > 0,
                # and 0/0 pairs are dropped by the threshold semantics
                continue
            want = round(len(sa & sb) / len(sa | sb), 4)
            key = (i + 1, j + 1)
            if key in got:
                assert abs(got[key] - want) < 1e-9, (key, a, b)
            else:
                assert want == 0.0 or key not in got


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(weights=st.lists(st.integers(min_value=0, max_value=10_000),
                        min_size=1, max_size=30),
       k=st.integers(min_value=1, max_value=10))
def test_weighted_sample_exact_ares_order(spark, weights, k):
    """Selection = top-k by the exact ln(u)/w key (ties by id), for ANY
    weight vector including zeros — the round-7 unrounded-ranking fix."""
    from kafka_connect_oss_spark.functions import hashing as H

    df = spark.createDataFrame(
        [(i, "t", w) for i, w in enumerate(weights)],
        "doc_id int, text string, n_chars int")
    got = [r.doc_id for r in TXT.weighted_sample(df, k=k).collect()]
    space = float(1 << 60)
    hv = {r.doc_id: r.h for r in df.selectExpr(
        "doc_id",
        f"{H.base_hash('CAST(doc_id AS STRING)', 'spark')} AS h").collect()}

    def key(i):
        w = weights[i]
        if w <= 0:
            return -1e308
        return math.log((hv[i] + 1.0) / space) / w

    expect = [i for _, i in
              sorted(((key(i), i) for i in range(len(weights))),
                     key=lambda p: (-p[0], p[1]))][:k]
    assert got == expect
