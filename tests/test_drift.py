"""Corpus drift report (operators/drift.py): KL behavior on controlled
shifts, identity baseline, new-vocab accounting, and determinism.
(DuckDB parity runs in tests/test_staged_seats_r12.py through the staged
registry entry.)"""

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import drift as D
from kafka_connect_oss_spark.sources.batch import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string,"
                                       " text string")


def test_identical_snapshots_report_zero(spark):
    d = _docs(spark, [(i, "a", "alpha beta gamma") for i in range(6)])
    rows = {r.source: r for r in D.drift_report(d, d).collect()}
    assert rows["a"].kl_snap_base == 0.0
    assert rows["a"].new_vocab_rate == 0.0
    assert rows["a"].mean_chars_delta == 0.0
    assert rows["a"].n_docs_base == rows["a"].n_docs_snap == 6


def test_injected_drift_raises_kl(spark):
    base = _docs(spark, [(i, "a", "alpha beta gamma delta")
                         for i in range(8)])
    mild = _docs(spark, [(i, "a", "alpha beta gamma delta")
                         for i in range(7)]
                 + [(7, "a", "alpha beta gamma epsilon")])
    wild = _docs(spark, [(i, "a", "zeta eta theta iota")
                         for i in range(8)])
    kl = {}
    for tag, snap in (("mild", mild), ("wild", wild)):
        kl[tag] = D.drift_report(base, snap).collect()[0].kl_snap_base
    assert 0 < kl["mild"] < kl["wild"]


def test_new_vocab_rate_counts_unseen_words(spark):
    base = _docs(spark, [(0, "a", "alpha beta")])
    snap = _docs(spark, [(0, "a", "alpha newword")])
    r = D.drift_report(base, snap).collect()[0]
    # snapshot vocab = {alpha, newword}; unseen = {newword}
    assert r.new_vocab_rate == 0.5
    assert r.union_vocab == 3


def test_sources_missing_one_side(spark):
    base = _docs(spark, [(0, "a", "alpha beta"), (1, "b", "gamma")])
    snap = _docs(spark, [(0, "a", "alpha beta"), (2, "c", "delta")])
    rows = {r.source: r for r in D.drift_report(base, snap).collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["b"].n_docs_snap == 0 and rows["b"].tokens_snap == 0
    assert rows["c"].n_docs_base == 0 and rows["c"].tokens_base == 0
    # KL stays finite through smoothing on one-sided sources
    assert rows["b"].kl_snap_base is not None
    assert rows["c"].kl_snap_base is not None


def test_deterministic_across_partitionings(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 2 == 0)
    snap = docs.where(F.col("doc_id") % 3 != 0)
    a = sorted(map(tuple, D.drift_report(base, snap).collect()))
    b = sorted(map(tuple, D.drift_report(
        base.repartition(17), snap.repartition(5)).collect()))
    assert a == b


# -- property-based invariants (hypothesis) ---------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_text = st.lists(_word, min_size=1, max_size=6).map(" ".join)
_src = st.sampled_from(["s1", "s2"])
_row = st.tuples(_src, _text)
_corpus = st.lists(_row, min_size=1, max_size=8)


def _hframe(spark, rows):
    return spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        "doc_id long, source string, text string")


def _py_kl(base_rows, snap_rows, source, k=0.5):
    """Plain-Python reference for the per-source smoothed KL."""
    import math

    cb, cs = {}, {}
    for s, t in base_rows:
        if s == source:
            for w in t.split():
                cb[w] = cb.get(w, 0) + 1
    for s, t in snap_rows:
        if s == source:
            for w in t.split():
                cs[w] = cs.get(w, 0) + 1
    vocab = set(cb) | set(cs)
    if not vocab:
        return None
    tb, ts, v = sum(cb.values()), sum(cs.values()), len(vocab)
    total = 0.0
    for w in sorted(vocab):
        p = (cs.get(w, 0) + k) / (ts + k * v)
        q = (cb.get(w, 0) + k) / (tb + k * v)
        term = p * math.log(p / q)
        total += math.floor(term * 1e9 + 0.5) / 1e9
    return math.floor(total * 1e4 + 0.5) / 1e4


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(base=_corpus, snap=_corpus)
def test_kl_matches_python_reference_and_is_nonnegative(spark, base, snap):
    got = {r.source: r for r in
           D.drift_report(_hframe(spark, base), _hframe(spark, snap))
           .collect()}
    for source in got:
        want = _py_kl(base, snap, source)
        assert got[source].kl_snap_base == want, (source, base, snap)
        # Gibbs: KL of two proper smoothed distributions is >= 0; the
        # 9-dp addend rounding can push the sum a hair below zero
        assert got[source].kl_snap_base >= -1e-4
        assert got[source].new_vocab_rate is None or \
            0.0 <= got[source].new_vocab_rate <= 1.0
