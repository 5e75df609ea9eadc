"""Property-based invariants for the round-6 corpus operators
(hypothesis): for ANY document set, the scoring/sampling/dedup-signal
math must satisfy its analytic bounds and cross-check against a plain
Python reference — correctness beyond the fixed-oracle comparisons.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_oss_spark.operators import text as TXT

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "ep", "ze", "x"])
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)
_docs = st.lists(_doc, min_size=1, max_size=8)


def _frame(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string")


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=_docs)
def test_token_entropy_matches_python(spark, texts):
    got = {r.doc_id: r for r in TXT.token_entropy(_frame(spark, texts))
           .collect()}
    for i, t in enumerate(texts):
        toks = t.split()
        counts = {}
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
        n = len(toks)
        want = -sum(c / n * math.log(c / n) for c in counts.values())
        r = got[i + 1]
        assert r.n_tokens == n and r.n_distinct == len(counts)
        assert abs(r.entropy - want) < 1e-3
        # bounds: 0 <= H <= ln(distinct); norm in [0, 1] or NULL
        # (outputs are rounded to 4dp, so allow the rounding quantum)
        assert -5e-5 <= r.entropy <= math.log(len(counts)) + 5e-5
        if len(counts) > 1:
            assert -5e-5 <= r.norm_entropy <= 1 + 5e-5
        else:
            assert r.norm_entropy is None


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=_docs)
def test_unigram_nll_matches_python(spark, texts):
    got = {r.doc_id: r for r in TXT.unigram_nll(_frame(spark, texts))
           .collect()}
    tf: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            tf[w] = tf.get(w, 0) + 1
    total = sum(tf.values())
    for i, t in enumerate(texts):
        toks = t.split()
        want = sum(-math.log(tf[w] / total) for w in toks) / len(toks)
        r = got[i + 1]
        assert r.n_tokens == len(toks)
        assert abs(r.nll - want) < 1e-3
        assert r.nll >= -1e-9  # tf/total <= 1 => -ln >= 0


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=_docs, k=st.integers(1, 6))
def test_weighted_sample_is_topk_of_python_keys(spark, texts, k):
    from kafka_connect_oss_spark.functions import hashing as H

    df = _frame(spark, texts).selectExpr(
        "doc_id", "text", "length(text) AS n_chars")
    got = [(r.doc_id, r.weight) for r in TXT.weighted_sample(df, k=k)
           .collect()]
    # python reference: same hash-uniform, same key, same ordering
    space = float(1 << 60)
    rows = []
    for i, t in enumerate(texts):
        did, w = i + 1, float(len(t))
        h = int(hashlib_md5_fold(str(did)))
        u = (h + 1.0) / space
        key = u ** (1.0 / w) if w > 0 else 0.0
        rows.append((round(key, 6), did, w))
    rows.sort(key=lambda r: (-r[0], r[1]))
    want = [(did, w) for _, did, w in rows[:k]]
    assert got == want


def hashlib_md5_fold(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=_docs)
def test_novelty_totals_conserve_first_owners(spark, texts):
    # sum of n_novel over docs == number of distinct shingles in the
    # corpus (every shingle has exactly one first owner)
    rows = TXT.novelty_score(_frame(spark, texts), ngram=2).collect()
    shingles = set()
    for t in texts:
        toks = t.split()
        for j in range(len(toks) - 1):
            shingles.add((toks[j], toks[j + 1]))
    assert sum(r.n_novel for r in rows) == len(shingles)
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=_docs)
def test_bm25_matches_python(spark, texts):
    terms, k1, b = ("alpha", "beta"), 1.2, 0.75
    got = {r.doc_id: r.score for r in
           TXT.bm25_topk(_frame(spark, texts), terms=terms, k=len(texts))
           .collect()}
    docs = [t.split() for t in texts]
    n_docs = len(docs)
    avgdl = sum(len(d) for d in docs) / n_docs
    for i, toks in enumerate(docs):
        score = 0.0
        for t in terms:
            df = sum(1 for d in docs if t in d)
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            tf = float(toks.count(t))
            score += (idf * tf * (k1 + 1.0) /
                      (tf + k1 * (1.0 - b + b * len(toks) / avgdl)))
        assert abs(got[i + 1] - score) < 1e-3, texts[i]


_vals = st.lists(st.floats(-100, 100, allow_nan=False, width=32),
                 min_size=1, max_size=40)


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(vals=_vals, p=st.sampled_from([0.1, 0.5, 0.9]))
def test_exact_quantile_equals_sorted_rank(spark, vals, p):
    from kafka_connect_oss_spark.operators import sketches as SK

    df = spark.createDataFrame([("g", float(v)) for v in vals],
                               "grp string, value double")
    got = {r.grp: r.q for r in
           SK.exact_quantile_disc(df, "value", p, "grp", n_bins=8).collect()}
    want = sorted(float(v) for v in vals)[max(1, math.ceil(p * len(vals))) - 1]
    assert got == {"g": want}
