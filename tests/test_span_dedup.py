"""Exact-substring REPAIR (`text.span_dedup`): hand goldens, the
measurer==repairer consistency pin against the oracled span_coverage,
and a hypothesis Python-reference equivalence — the span-level twin of
the line_dedup suite."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators.text import span_coverage, span_dedup
from kafka_connect_oss_spark.sources.batch import load_table

_SIZE, _STRIDE, _MIN_LEN, _MIN_DOCS = 5, 3, 2, 2


def _frame(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _py_intervals(texts):
    """Merged per-doc 1-based intervals of chunks recurring in >=
    MIN_DOCS distinct docs — same grid as the operators."""
    chunks, by_span = {}, {}
    for i, t in enumerate(texts):
        doc, s = i + 1, 1
        while s <= max(1, len(t)):
            c = t[s - 1:s - 1 + _SIZE]
            if len(c) >= _MIN_LEN:
                chunks[(doc, s)] = c
                by_span.setdefault(c, set()).add(doc)
            s += _STRIDE
    dup = {c for c, ds in by_span.items() if len(ds) >= _MIN_DOCS}
    out = {}
    for i, t in enumerate(texts):
        doc = i + 1
        ivs = sorted((s, s + len(c) - 1) for (d, s), c in chunks.items()
                     if d == doc and c in dup)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        out[doc] = merged
    return out


def _py_span_dedup(texts):
    ivs = _py_intervals(texts)
    out = {}
    for i, t in enumerate(texts):
        doc, cur, acc, removed = i + 1, 1, [], 0
        for s, e in ivs[doc]:
            acc.append(t[cur - 1:s - 1])
            removed += e - s + 1
            cur = e + 1
        acc.append(t[cur - 1:])
        out[doc] = ("".join(acc), removed)
    return out


def test_span_dedup_hand_golden(spark):
    # grid size=5 stride=3: doc1/doc2 share the 5-char chunk at start 1
    shared = "XYZWV"
    texts = [shared + "abc", shared + "defgh", "uniquetail"]
    got = {r.doc_id: (r.clean_text, r.removed_chars)
           for r in span_dedup(_frame(spark, texts), size=_SIZE,
                               stride=_STRIDE, min_docs=_MIN_DOCS,
                               min_len=_MIN_LEN).collect()}
    assert got == _py_span_dedup(texts)
    # the shared prefix left both docs; unique doc untouched
    assert got[3] == ("uniquetail", 0)
    assert not got[1][0].startswith("XYZWV")


def test_span_dedup_prices_what_coverage_measures(spark, sf_dir):
    """removed_chars == span_coverage.dup_chars for EVERY document, and
    the clean text is exactly that many chars shorter — on the real
    table at defaults and at an aggressive small grid."""
    docs = load_table(spark, sf_dir, "documents")
    for kw in [dict(), dict(size=20, stride=12, min_len=8)]:
        cov = {r[0]: r.dup_chars
               for r in span_coverage(docs, **kw).collect()}
        lens = {r[0]: len(r[1] or "")
                for r in docs.select("doc_id", "text").collect()}
        for r in span_dedup(docs, **kw).collect():
            assert r.removed_chars == cov[r.doc_id], r.doc_id
            assert len(r.clean_text) == lens[r.doc_id] - r.removed_chars


_word = st.sampled_from(["aaaa", "bbbb", "ccd", "ee", "ffff"])
_doc = st.lists(_word, min_size=0, max_size=8).map("".join)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc, min_size=2, max_size=6))
def test_span_dedup_matches_python_reference(spark, texts):
    got = {r.doc_id: (r.clean_text, r.removed_chars)
           for r in span_dedup(_frame(spark, texts), size=_SIZE,
                               stride=_STRIDE, min_docs=_MIN_DOCS,
                               min_len=_MIN_LEN).collect()}
    assert got == _py_span_dedup(texts)
