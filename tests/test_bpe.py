"""Distributed BPE training (operators/bpe.py): fit against a pure-Python
reference implementation of the public algorithm, pair statistics against
the DuckDB oracle (the driver-gate contract via tests/parity.compare),
and the encoder's self-consistency invariant (encoding the training
corpus reproduces the trainer's final symbol sequences)."""

import collections

import duckdb
import pytest

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import bpe
from kafka_connect_oss_spark.sources.batch import load_table
from tests.parity import compare


# ---------------------------------------------------------------- reference
def _ref_word_syms(word):
    return [*word[:-1], word[-1] + bpe.EOW]


def _ref_pair_counts(wf):
    counts = collections.Counter()
    for syms, freq in wf:
        for i in range(len(syms) - 1):
            counts[(syms[i], syms[i + 1])] += freq
    return counts


def _ref_apply_merge(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _ref_fit(texts, n_merges):
    """Sennrich et al. 2016 algorithm 1 with the operators' tie-break
    (freq desc, then pair lexicographic) and freq>=2 stop rule."""
    freqs = collections.Counter(w for t in texts for w in t.split() if w)
    wf = [(_ref_word_syms(w), f) for w, f in freqs.items()]
    merges = []
    for _ in range(n_merges):
        counts = _ref_pair_counts(wf)
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b, n))
        wf = [(_ref_apply_merge(s, a, b), f) for s, f in wf]
    return merges, wf


_TEXTS = ["low low low lower lowest",
          "new newer newest low",
          "wider wide wide new"]


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        list(enumerate(_TEXTS)), "doc_id long, text string")


def test_fit_matches_python_reference(spark, toy):
    got = bpe.fit_bpe_merges(toy, 12)
    want, _ = _ref_fit(_TEXTS, 12)
    assert got == want
    assert len(got) >= 6, "toy corpus must actually produce merges"


def test_pair_stats_duckdb_parity_initial_and_replayed(spark, toy,
                                                       tmp_path):
    p = str(tmp_path / "toy.parquet")
    toy.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW toy AS SELECT * FROM read_parquet('{p}/*.parquet')")
    compare(bpe.pair_stats(toy), con,
            bpe.pair_stats_oracle_sql("toy"), "bpe_pair_stats_r0")
    # replay the first 4 learned merges, then compare round-5 stats —
    # exercises the packed-string replace equivalence incl. EOW symbols
    merges = [(a, b) for a, b, _ in bpe.fit_bpe_merges(toy, 4)]
    assert len(merges) == 4
    compare(bpe.pair_stats(toy, merges=merges), con,
            bpe.pair_stats_oracle_sql("toy", merges=merges),
            "bpe_pair_stats_r4")


def test_pair_stats_parity_on_real_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    compare(bpe.pair_stats(docs), con,
            bpe.pair_stats_oracle_sql("documents"), "bpe_pair_stats_real")


def test_encode_reproduces_trainer_state(spark, toy):
    """Encoding the training corpus with the fitted merges must yield
    exactly the symbol sequences the trainer ended with (the reference
    encoder/trainer consistency property), and token counts shrink
    monotonically with more merges."""
    fitted = bpe.fit_bpe_merges(toy, 10)
    merges = [(a, b) for a, b, _ in fitted]
    enc = {r.doc_id: list(r.tokens)
           for r in bpe.bpe_encode(toy, merges).collect()}
    _, wf_ref = _ref_fit(_TEXTS, 10)
    ref_syms = {}
    freqs = {w: s for s, _ in wf_ref
             for w in [("".join(s)).replace(bpe.EOW, "")]}
    for did, text in enumerate(_TEXTS):
        seq = []
        for w in text.split():
            seq.extend(freqs[w])
        ref_syms[did] = seq
    assert enc == ref_syms

    n_full = {r.doc_id: r.n_tokens
              for r in bpe.bpe_encode(toy, merges).collect()}
    n_half = {r.doc_id: r.n_tokens
              for r in bpe.bpe_encode(toy, merges[:3]).collect()}
    n_none = {r.doc_id: r.n_tokens
              for r in bpe.bpe_encode(toy, []).collect()}
    for d in n_full:
        assert n_full[d] <= n_half[d] <= n_none[d]


def test_encode_open_vocab_and_plan_is_narrow(spark, toy):
    """Unseen characters stay as character pieces (open vocabulary), and
    the encode plan has no shuffle Exchange before the per-doc
    regroup — the merge folds are narrow projections."""
    merges = [(a, b) for a, b, _ in bpe.fit_bpe_merges(toy, 6)]
    unseen = spark.createDataFrame([(99, "zq xyzzy")],
                                   "doc_id long, text string")
    row = bpe.bpe_encode(unseen, merges).collect()[0]
    assert row.n_tokens >= 2
    joined = "".join(row.tokens).replace(bpe.EOW, "")
    assert joined == "zqxyzzy"

    plan = (bpe.bpe_encode(toy, merges)._jdf.queryExecution()
            .executedPlan().toString())
    # exactly one exchange: the final groupBy(doc_id) regroup
    assert plan.count("Exchange") <= 2  # partial+final agg pair


def test_fit_determinism_across_partitionings(spark, toy):
    one = bpe.fit_bpe_merges(toy.repartition(1), 8)
    many = bpe.fit_bpe_merges(toy.repartition(7), 8)
    assert one == many


# ------------------------------------------------------------- hypothesis
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_words = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=4), min_size=1, max_size=12)
_corpus = st.lists(_words, min_size=1, max_size=4)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(wordlists=_corpus, n=st.integers(min_value=1, max_value=6))
def test_fit_property_matches_reference(spark, wordlists, n):
    """Any tiny corpus over {a,b,c}: the distributed fit equals the
    pure-Python reference algorithm, merges and counts both."""
    texts = [" ".join(ws) for ws in wordlists]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    assert bpe.fit_bpe_merges(docs, n) == _ref_fit(texts, n)[0]


def test_ranked_encoder_equals_fold_encoder(spark, toy):
    """bpe_encode_ranked (greedy lowest-rank-first, mapInPandas — the
    production path for real merge-list sizes) must equal bpe_encode
    (sequential fold replay) exactly: same tokens, same counts."""
    merges = [(a, b) for a, b, _ in bpe.fit_bpe_merges(toy, 10)]
    fold = {r.doc_id: (list(r.tokens), r.n_tokens)
            for r in bpe.bpe_encode(toy, merges).collect()}
    ranked = {r.doc_id: (list(r.tokens), r.n_tokens)
              for r in bpe.bpe_encode_ranked(toy, merges).collect()}
    assert ranked == fold

    # empty-merge and unseen-text edges agree too
    unseen = spark.createDataFrame(
        [(7, "zq xyzzy"), (8, "")], "doc_id long, text string")
    f2 = {r.doc_id: list(r.tokens)
          for r in bpe.bpe_encode(unseen, merges).collect()}
    r2 = {r.doc_id: list(r.tokens)
          for r in bpe.bpe_encode_ranked(unseen, merges).collect()}
    assert r2 == f2


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(wordlists=_corpus, n=st.integers(min_value=1, max_value=5))
def test_ranked_encoder_property_equals_fold(spark, wordlists, n):
    """Greedy-by-rank == sequential replay on random corpora/merge
    budgets — the standard BPE encoder equivalence, pinned."""
    texts = [" ".join(ws) for ws in wordlists]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    merges = [(a, b) for a, b, _ in bpe.fit_bpe_merges(docs, n)]
    fold = {r.doc_id: list(r.tokens)
            for r in bpe.bpe_encode(docs, merges).collect()}
    ranked = {r.doc_id: list(r.tokens)
              for r in bpe.bpe_encode_ranked(docs, merges).collect()}
    assert ranked == fold
