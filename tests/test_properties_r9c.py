"""Property-based invariants for the round-9 continuation operators
(hypothesis, derandomized like the sibling modules): line_dedup must
equal a plain-Python reference for ANY corpus (normalization, distinct-
doc df, order preservation, blank handling), and salted_agg must equal
the plain shuffle for any salt factor (count/sum/avg decomposition)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators.diagnostics import salted_agg
from kafka_connect_oss_spark.operators.text import line_dedup

_line = st.sampled_from(
    ["alpha", "ALPHA", " alpha ", "beta beta", "", "  ", "gamma",
     "cookie notice", "Cookie Notice"])
_doc = st.lists(_line, min_size=0, max_size=6).map("\n".join)
_docs = st.lists(_doc, min_size=1, max_size=6)


def _frame(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _py_line_dedup(texts, min_df):
    """Plain-Python reference: split on newline, df over lower+trim of
    non-blank lines counted per DISTINCT doc, remove hot lines, keep
    blanks and order."""
    dfs = {}
    for i, t in enumerate(texts):
        for n in {ln.strip().lower() for ln in t.split("\n")
                  if ln.strip() != ""}:
            dfs[n] = dfs.get(n, 0) + 1
    hot = {n for n, c in dfs.items() if c >= min_df}
    out = {}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [ln for ln in lines
                if ln.strip() == "" or ln.strip().lower() not in hot]
        out[i + 1] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(texts=_docs, min_df=st.integers(min_value=1, max_value=3))
def test_line_dedup_matches_python_reference(spark, texts, min_df):
    got = {r.doc_id: (r.clean_text, r.n_lines, r.n_removed)
           for r in line_dedup(_frame(spark, texts),
                               min_df=min_df).collect()}
    assert got == _py_line_dedup(texts, min_df)


_vals = st.lists(
    st.tuples(st.sampled_from(["k1", "k2", "hot"]),
              st.integers(min_value=-100, max_value=100)),
    min_size=1, max_size=20)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(rows=_vals, factor=st.integers(min_value=1, max_value=7))
def test_salted_agg_matches_plain_for_any_factor(spark, rows, factor):
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "rid long, k string, v long")
    got = {r.k: (r.n, r.s, round(r.avg, 9)) for r in salted_agg(
        df, ["k"], F.col("rid"), factor,
        aggs=[F.count(F.lit(1)).alias("_n"), F.sum("v").alias("_s")],
        final_aggs=[F.sum("_n").alias("n"), F.sum("_s").alias("s"),
                    (F.sum("_s") / F.sum("_n")).alias("avg")]).collect()}
    want = {}
    for k, v in rows:
        n, s = want.get(k, (0, 0))
        want[k] = (n + 1, s + v)
    want = {k: (n, s, round(s / n, 9)) for k, (n, s) in want.items()}
    assert got == want
