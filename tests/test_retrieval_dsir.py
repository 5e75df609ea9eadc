"""Invariants for the round-7 late additions: DSIR importance weights
(hashed-unigram target-vs-raw log ratio) and hybrid BM25+cosine
reciprocal-rank-fusion retrieval. Oracle parity is covered by the
registry sweep (test_oracle_parity.py); these pin the semantic
properties parity alone cannot see."""

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import similarity
from kafka_connect_oss_spark.operators import text as TX
from kafka_connect_oss_spark.sources.batch import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_dsir_scores_every_doc(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = TX.dsir_importance(docs).collect()
    assert len(out) == docs.count()
    assert all(r.n_tokens >= 0 for r in out)


def test_dsir_favors_target_domain(spark, sf_dir):
    """The defining DSIR property: docs FROM the target source must
    score higher on average than the rest of the pool — the model was
    fit to prefer exactly their feature distribution."""
    docs = _docs(spark, sf_dir)
    target = "src0"
    scored = (TX.dsir_importance(docs, target_source=target)
              .join(docs.select("doc_id", "source"), "doc_id"))
    rows = (scored.groupBy(F.col("source") == F.lit(target))
            .agg(F.avg("log_weight").alias("m")).collect())
    means = {r[0]: r.m for r in rows}
    assert means[True] > means[False]


def test_dsir_empty_doc_scores_zero(spark):
    docs = spark.createDataFrame(
        [(0, "data model learning", "src0"), (1, "", "src1"),
         (2, "data data", "src1")],
        "doc_id long, text string, source string")
    rows = {r.doc_id: r for r in TX.dsir_importance(docs).collect()}
    assert rows[1].n_tokens == 0 and rows[1].log_weight == 0.0
    assert rows[0].n_tokens == 3 and rows[2].n_tokens == 2


def test_rrf_bounds_and_rank_consistency(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    bm = TX.bm25_topk(docs, k=50)
    q = similarity.query_vector(spark, emb, 0)
    cos = (similarity.topk_cosine(emb, q, k=50)
           .withColumnRenamed("vec_id", "doc_id"))
    out = similarity.rrf_fuse(bm, cos, k=10).collect()
    assert len(out) == 10
    kk = 60
    for r in out:
        expect = (1.0 / (kk + r.rank_a) if r.rank_a is not None else 0.0) \
            + (1.0 / (kk + r.rank_b) if r.rank_b is not None else 0.0)
        assert abs(r.rrf - expect) < 1e-6
        assert r.rank_a is not None or r.rank_b is not None
    # fused ordering is by rrf desc with id tie-break
    scores = [(r.rrf, -r.doc_id) for r in out]
    assert scores == sorted(scores, reverse=True)


def test_rrf_both_legs_beat_single_leg_at_equal_rank(spark):
    """A doc ranked r in BOTH legs must outscore a doc ranked r in only
    one — the additivity that makes RRF favor lexical+semantic hits."""
    a = spark.createDataFrame([(1, 5.0), (2, 4.0)], "doc_id long, score double")
    b = spark.createDataFrame([(1, 0.9), (3, 0.8)], "doc_id long, cosine double")
    rows = {r.doc_id: r.rrf for r in
            similarity.rrf_fuse(a, b, k=10).collect()}
    assert rows[1] > rows[2] and rows[1] > rows[3]


def test_cluster_quota_sample_respects_quota_and_order(spark, sf_dir):
    """Per-cluster quota: <= 20 rows per cid, ranked by (quality desc,
    doc_id), and every kept doc outranks every dropped doc of its own
    cluster — the salted two-phase window must equal the plain window."""
    import kafka_connect_oss_spark.registry_llm  # noqa: F401 (registers)
    from kafka_connect_oss_spark.registry import QUERIES

    out = QUERIES["corpus_cluster_quota_sample"](spark, sf_dir).collect()
    by_cid = {}
    for r in out:
        by_cid.setdefault(r.cid, []).append(r)
    for cid, rows in by_cid.items():
        assert len(rows) <= 20
        ranked = sorted(rows, key=lambda r: r.rk)
        keys = [(-r.quality, r.doc_id) for r in ranked]
        assert keys == sorted(keys)
        assert [r.rk for r in ranked] == list(range(1, len(rows) + 1))
