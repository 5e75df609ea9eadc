"""Property-based invariants for the round-7 late additions
(hypothesis): RRF fusion must equal a plain-Python reference for ANY
pair of score lists, and DSIR importance must equal a plain-Python
hashed-unigram model for ANY corpus/source layout — correctness beyond
the fixed-oracle comparisons."""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_oss_spark.operators import similarity
from kafka_connect_oss_spark.operators import text as TXT

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "ep", "ze", "x"])
_doc = st.lists(_word, min_size=0, max_size=10).map(" ".join)


def _py_base_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(scores_a=st.lists(st.integers(0, 50), min_size=1, max_size=8,
                         unique=True),
       scores_b=st.lists(st.integers(0, 50), min_size=1, max_size=8,
                         unique=True))
def test_rrf_matches_python_reference(spark, scores_a, scores_b):
    """For any two ranked lists (ids drawn from overlapping ranges),
    rrf_fuse must reproduce sum-of-1/(60+rank) with (score desc, id)
    rank assignment and (rrf desc, id) output order."""
    a = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(scores_a)],
        "doc_id long, score double")
    b = spark.createDataFrame(
        [(i + len(scores_a) // 2, float(s)) for i, s in enumerate(scores_b)],
        "doc_id long, cosine double")
    got = [(r.doc_id, r.rrf)
           for r in similarity.rrf_fuse(a, b, k=100).collect()]

    def ranks(pairs):
        ordered = sorted(pairs, key=lambda p: (-p[1], p[0]))
        return {i: rk + 1 for rk, (i, _) in enumerate(ordered)}

    ra = ranks([(i, float(s)) for i, s in enumerate(scores_a)])
    rb = ranks([(i + len(scores_a) // 2, float(s))
                for i, s in enumerate(scores_b)])
    expect = {}
    for i in set(ra) | set(rb):
        expect[i] = round((1.0 / (60 + ra[i]) if i in ra else 0.0)
                          + (1.0 / (60 + rb[i]) if i in rb else 0.0), 6)
    want = sorted(expect.items(), key=lambda p: (-p[1], p[0]))
    assert got == want


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc, min_size=2, max_size=8),
       target_mask=st.lists(st.booleans(), min_size=2, max_size=8))
def test_dsir_matches_python_reference(spark, texts, target_mask):
    """For any corpus split into target/raw sources, dsir_importance
    must equal the plain-Python hashed-unigram log-ratio model
    (add-0.5 smoothing over 1024 buckets, weight = sum over tokens)."""
    mask = (target_mask * len(texts))[:len(texts)]
    rows = [(i, t, "tgt" if m else "raw")
            for i, (t, m) in enumerate(zip(texts, mask))]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: (r.n_tokens, r.log_weight)
           for r in TXT.dsir_importance(df, target_source="tgt",
                                        buckets=1024).collect()}

    buckets = 1024
    alpha = 0.5
    ct: dict = {}
    cr: dict = {}
    for i, t, src in rows:
        for w in t.split():
            if not w:
                continue
            b = _py_base_hash(w) % buckets
            cr[b] = cr.get(b, 0) + 1
            if src == "tgt":
                ct[b] = ct.get(b, 0) + 1
    nr, nt = sum(cr.values()), sum(ct.values())
    for i, t, src in rows:
        toks = [w for w in t.split() if w]
        s = sum(math.log((ct.get(_py_base_hash(w) % buckets, 0) + alpha)
                         / (nt + alpha * buckets))
                - math.log((cr[_py_base_hash(w) % buckets] + alpha)
                           / (nr + alpha * buckets)) for w in toks)
        assert got[i][0] == len(toks)
        assert abs(got[i][1] - round(s, 6)) <= 1e-6
