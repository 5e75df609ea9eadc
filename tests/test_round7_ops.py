"""Round-7 fixes pinned: BM25 term quoting, zero-norm embedding
diversity, unrounded weighted-sample ranking, k-means early exit,
incremental dedup's precomputed-base-signature path, and the lazy
lifecycle modes."""

import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import dedup, sketches, similarity
from kafka_connect_oss_spark.operators import text as TX
from kafka_connect_oss_spark.sources.batch import load_table


def test_bm25_quoted_term_parses_both_engines(spark, sf_dir):
    """A term containing a single quote (and one with a backslash) must
    not break expression parsing (round-6 advisor finding)."""
    import duckdb

    docs = load_table(spark, sf_dir, "documents")
    out = TX.bm25_topk(docs, terms=("o'brien", "data", "a\\b"), k=5)
    rows = out.collect()
    assert len(rows) == 5  # corpus contains 'data'; scoring still ranks
    sql = TX.bm25_topk_oracle_sql(
        f"read_parquet('{sf_dir}/documents.parquet')",
        terms=("o'brien", "data", "a\\b"), k=5)
    orows = duckdb.sql(sql).fetchall()
    assert sorted((r.doc_id, r.score) for r in rows) == \
        sorted((i, s) for i, s in orows)


def test_embedding_diversity_excludes_zero_norm(spark):
    df = spark.createDataFrame(
        [(1, "a", [1.0, 0.0]), (2, "a", [1.0, 0.0]),
         (3, "a", [0.0, 0.0]),  # zero-norm: no direction, must not count
         (4, "b", [0.0, 0.0])],  # all-zero group: no row
        "vec_id int, label string, embedding array<double>")
    for dim in (2, None):  # wide-agg fast path AND posexplode fallback
        out = {r.label: r for r in
               similarity.embedding_diversity(
                   df, dim=dim, group_col="label").collect()}
        assert out["a"].n == 2
        assert out["a"].mean_pairwise_cosine == pytest.approx(1.0)
        assert "b" not in out


def test_weighted_sample_ranks_by_unrounded_key(spark):
    """Docs whose display keys collide at 6 decimals must still be
    selected by the exact ln(u)/w order, not by id (round-6 advisor
    finding: id-biased within-bucket selection)."""
    from kafka_connect_oss_spark.functions import hashing as H

    n, k = 400, 40
    df = spark.createDataFrame(
        [(i, "x" * 50, 500) for i in range(n)],
        "doc_id int, text string, n_chars int")
    got = [r.doc_id for r in TX.weighted_sample(df, k=k).collect()]
    # local recompute of the exact A-Res keys with the same hash
    space = float(1 << 60)
    hv = {r.doc_id: r.h for r in df.selectExpr(
        "doc_id",
        f"{H.base_hash('CAST(doc_id AS STRING)', 'spark')} AS h").collect()}
    exact = sorted(
        ((math.log((hv[i] + 1.0) / space) / 500.0, -i) for i in range(n)),
        reverse=True)[:k]
    expect = [-negid for _, negid in exact]
    assert got == expect
    # and the displayed rounded skey genuinely collides across ranks
    # (the regression regime: rounding would have re-ordered by id)
    skeys = [r.skey for r in TX.weighted_sample(df, k=k).collect()]
    assert len(set(skeys)) < len(skeys)


def test_empty_text_never_crashes_stats(spark):
    """Zero-token documents must not 0/0-throw under ANSI mode; their
    ratio columns are NULL (mirrored in the oracle SQL)."""
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "real words here")],
                               "doc_id long, text string")
    rows = {r.doc_id: r for r in TX.text_stats(df).collect()}
    assert rows[1].avg_token_len is None and rows[1].stopword_ratio is None
    assert rows[3].avg_token_len is not None
    q = {r.doc_id: r for r in TX.quality_score(df).collect()}
    assert q[2].distinct_ratio is None and q[3].quality is not None


def test_zero_vector_never_crashes_or_ranks(spark):
    """A corrupt all-zero embedding must neither throw under ANSI mode
    (Spark x/0) nor top the ranking (DuckDB NaN DESC): with the nullif
    guard it simply drops out of top-k."""
    rows = [(i, [float(i + 1), 1.0]) for i in range(5)] + [(99, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = similarity.query_vector(spark, df, 1)
    got = similarity.topk_cosine(df, q, k=5).collect()
    assert [r.vec_id for r in got if r.cosine is not None] == \
        [r.vec_id for r in got]  # every ranked row carries a real score
    assert 99 not in {r.vec_id for r in got}


def test_kmeans_early_exit_deterministic_and_bounded(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = similarity.kmeans_centroids(emb, n_centroids=4, n_iters=5)
    b = similarity.kmeans_centroids(emb, n_centroids=4, n_iters=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # tol=0 restores the fixed-iteration path and still fits
    c = similarity.kmeans_centroids(emb, n_centroids=4, n_iters=2, tol=0.0)
    assert c.count() == 4


def test_incremental_dedup_accepts_precomputed_base_sig(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 2 == 0)
    inc = docs.where(F.col("doc_id") % 2 == 1)
    default = sorted(map(tuple,
                         dedup.incremental_dedup_status(base, inc).collect()))
    # deploy-scale path: signature table computed once, passed in
    breps = (base.select("doc_id", F.md5(F.col("text")).alias("_d"))
             .groupBy("_d").agg(F.min("doc_id").alias("_rep")))
    rep_docs = base.join(breps.select(F.col("_rep").alias("doc_id")),
                         "doc_id", "semi")
    sig = dedup.signature_frame(rep_docs)
    reused = sorted(map(tuple, dedup.incremental_dedup_status(
        base, inc, base_sig=sig).collect()))
    assert default == reused


def test_incremental_dedup_from_compacted_tables(spark, sf_dir,
                                                 tmp_path_factory):
    """The deploy-scale contract made concrete: compaction writes three
    bucketed tables; each ingest batch classifies against table scans —
    result identical to the in-memory operator."""
    from kafka_connect_oss_spark.operators import bucketing as B

    loc = tmp_path_factory.mktemp("dedupstate")
    B.ensure_database(spark, "dedupstate", str(loc))
    try:
        docs = load_table(spark, sf_dir, "documents")
        base = docs.where(F.col("doc_id") % 2 == 0)
        inc = docs.where(F.col("doc_id") % 2 == 1)
        dedup.compact_base_tables(base, "dedupstate.b", n_buckets=8)
        expect = sorted(map(tuple, dedup.incremental_dedup_status(
            base, inc).collect()))
        got = sorted(map(tuple, dedup.incremental_dedup_status_from_tables(
            spark, "dedupstate.b", inc).collect()))
        assert got == expect
        # base side reads the bucketed tables: bucket pruning metadata
        # (SelectedBucketsCount) in the plan proves the scans are the
        # compacted state, not a base re-derivation (toString truncates
        # long plans, so match the scan marker rather than every path)
        plan = (dedup.incremental_dedup_status_from_tables(
            spark, "dedupstate.b", inc)
            ._jdf.queryExecution().executedPlan().toString())
        assert "SelectedBucketsCount" in plan
    finally:
        spark.sql("DROP DATABASE dedupstate CASCADE")


def test_lifecycle_lineage_mode_round_trips(spark, sf_dir, monkeypatch):
    """SPARK_GRAFT_LIFECYCLE=lineage keeps results identical (quantile +
    novelty both route through stage_local)."""
    from kafka_connect_oss_spark.operators import lifecycle

    docs = load_table(spark, sf_dir, "documents").limit(200)
    before = sorted(map(tuple, TX.novelty_score(docs).collect()))
    monkeypatch.setattr(lifecycle, "LIFECYCLE_MODE", "lineage")
    after = sorted(map(tuple, TX.novelty_score(docs).collect()))
    assert before == after


def test_exact_quantile_still_exact_after_lazy_rewrite(spark):
    rows = [(g, float(v)) for g in ("a", "b")
            for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r.q for r in
           sketches.exact_quantile_disc(df, "v", 0.5, "g").collect()}
    assert out == {"a": 50.0, "b": 50.0}
