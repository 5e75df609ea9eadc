"""Property-based invariants for the round-9 operator additions
(hypothesis): span_coverage must equal a plain-Python interval-merge
reference for ANY corpus (chunk grid, cross-doc recurrence, merged
coverage), and gopher_quality_flags must replicate the rule set
word-for-word — correctness beyond the fixed-oracle comparisons."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_oss_spark.operators import text as TXT

_word = st.sampled_from(["aa", "bb", "cc", "d", "ee", "f"])
_doc = st.lists(_word, min_size=0, max_size=10).map(" ".join)
_docs = st.lists(_doc, min_size=2, max_size=8)

_SIZE, _STRIDE, _MIN_LEN, _MIN_DOCS = 5, 3, 2, 2


def _frame(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _py_span_coverage(texts):
    """Plain-Python reference: same chunk grid (1-based starts 1, 1+stride,
    ... while start <= max(1, len)), spans recurring in >= MIN_DOCS
    distinct docs, per-doc merged interval length."""
    chunks = {}   # (doc, start) -> text
    by_span = {}  # chunk text -> set of docs
    for i, t in enumerate(texts):
        doc = i + 1
        s = 1
        while s <= max(1, len(t)):
            c = t[s - 1:s - 1 + _SIZE]
            if len(c) >= _MIN_LEN:
                chunks[(doc, s)] = c
                by_span.setdefault(c, set()).add(doc)
            s += _STRIDE
    dup_spans = {c for c, ds in by_span.items() if len(ds) >= _MIN_DOCS}
    out = {}
    for i, t in enumerate(texts):
        doc = i + 1
        ivs = sorted((s, s + len(c) - 1) for (d, s), c in chunks.items()
                     if d == doc and c in dup_spans)
        total, cur = 0, None
        for s, e in ivs:
            if cur is None or s > cur[1]:
                if cur:
                    total += cur[1] - cur[0] + 1
                cur = [s, e]
            else:
                cur[1] = max(cur[1], e)
        if cur:
            total += cur[1] - cur[0] + 1
        out[doc] = (total, round(total / max(len(t), 1), 4))
    return out


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=_docs)
def test_span_coverage_matches_python(spark, texts):
    got = {r.doc_id: (r.dup_chars, r.dup_coverage)
           for r in TXT.span_coverage(
               _frame(spark, texts), size=_SIZE, stride=_STRIDE,
               min_docs=_MIN_DOCS, min_len=_MIN_LEN).collect()}
    assert got == _py_span_coverage(texts)


_gdoc = st.lists(st.sampled_from(
    ["the", "and", "of", "to", "zz", "w1", "###", "a...b", "7", "xy"]),
    min_size=0, max_size=80).map(" ".join)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_gdoc, min_size=1, max_size=6))
def test_gopher_flags_match_python(spark, texts):
    stop = set(("the", "a", "of", "and", "to", "in", "is"))
    got = {r.doc_id: r for r in
           TXT.gopher_quality_flags(_frame(spark, texts)).collect()}
    for i, t in enumerate(texts):
        doc, words = i + 1, [w for w in t.split(" ") if w]
        n = len(words)
        r = got[doc]
        assert r.n_words == n
        assert r.flag_word_count == (50 <= n <= 100000)
        mean_ok = (n > 0 and
                   3.0 <= sum(map(len, words)) / n <= 10.0)
        assert r.flag_mean_word_len == mean_ok
        sym = t.count("#") + t.count("...")  # non-overlapping, like replace
        sym_ok = n > 0 and sym / n <= 0.1
        assert r.flag_symbol_ratio == sym_ok
        alpha = sum(1 for w in words if any(c.isalpha() for c in w))
        alpha_ok = n > 0 and alpha / n >= 0.8
        assert r.flag_alpha_words == alpha_ok
        stop_ok = sum(1 for w in words if w in stop) >= 2
        assert r.flag_stopwords == stop_ok
        assert r.pass_gopher == (r.flag_word_count and mean_ok and sym_ok
                                 and alpha_ok and stop_ok)
