"""Learned quality scorer (operators/quality_model.py): feature parity,
bit-identical refits, score parity with fitted literals, and the
distillation sanity check (the smooth score separates the hard gate's
classes)."""

import duckdb

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import quality_model as QM
from kafka_connect_oss_spark.operators.text import gopher_quality_flags
from kafka_connect_oss_spark.sources.batch import load_table
from tests.parity import compare


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con


def test_feature_parity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fx = QM._feature_exprs("text")
    sel = ", ".join(f"{fx[n][1]} AS {n}" for n in QM.FEATURE_NAMES)
    compare(QM.quality_features(docs), _con(sf_dir),
            f"SELECT doc_id, {sel} FROM documents", "quality_features")


def test_fit_is_deterministic_across_partitionings(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    m1 = QM.fit_quality_classifier(docs)
    m2 = QM.fit_quality_classifier(docs.repartition(13))
    assert m1 == m2, "refits must be bit-identical (9-dp rounding)"
    assert any(w != 0 for w in m1["w"]), "fit must actually learn"


def test_score_parity_with_fitted_model(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    model = QM.fit_quality_classifier(docs)
    compare(QM.quality_score(docs, model), _con(sf_dir),
            QM.quality_score_oracle_sql("documents", model),
            "quality_score")


def test_distills_the_gate(spark, sf_dir):
    """Self-distillation sanity: mean score of gate-passing docs must
    clearly exceed mean score of failing docs, and probs stay in
    (0, 1)."""
    docs = load_table(spark, sf_dir, "documents")
    model = QM.fit_quality_classifier(docs)
    scored = QM.quality_score(docs, model)
    labeled = (gopher_quality_flags(docs)
               .select("doc_id", "pass_gopher")
               .join(scored, "doc_id"))
    agg = {r.pass_gopher: r.m for r in
           (labeled.groupBy("pass_gopher")
            .agg(F.avg("quality_prob").alias("m")).collect())}
    assert set(agg) == {True, False}, \
        "test corpus must exercise both gate outcomes"
    assert agg[True] > agg[False] + 0.2
    rng = scored.agg(F.min("quality_prob"), F.max("quality_prob")).first()
    assert 0.0 <= rng[0] and rng[1] <= 1.0


def test_empty_and_degenerate_text(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "    "), (2, "the and for with " +
          " ".join(f"word{i}word" for i in range(60)))],
        "doc_id long, text string")
    model = {"names": QM.FEATURE_NAMES,
             "mu": [0.0] * 6, "sigma": [1.0] * 6,
             "w": [0.1] * 6, "b": -0.2}
    rows = {r.doc_id: r.quality_prob
            for r in QM.quality_score(docs, model).collect()}
    assert all(0.0 <= v <= 1.0 for v in rows.values())
    assert rows[0] == rows[1]  # both all-zero feature vectors


def test_null_text_scores_finite(spark):
    """NULL text must flow 0-features (not NULL/NaN) through fit and a
    finite probability through score (r10 ADVICE: size(NULL) is NULL)."""
    rows = [(i, "some words here repeated " * (i + 2)) for i in range(40)]
    rows += [(98, None), (99, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    feats = {r.doc_id: r for r in QM.quality_features(docs).collect()}
    assert feats[99].f_n_words == 0.0
    assert all(getattr(feats[99], n) == 0.0 for n in QM.FEATURE_NAMES)
    model = QM.fit_quality_classifier(docs, sample_size=64)
    assert all(w == w for w in model["w"]), "fit must not absorb NaN"
    scored = {r.doc_id: r for r in
              QM.quality_score(docs, model).collect()}
    assert scored[99].quality_prob is not None
    assert 0.0 <= scored[99].quality_prob <= 1.0
