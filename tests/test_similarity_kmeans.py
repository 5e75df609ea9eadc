"""kmeans_centroids (fitted IVF) invariants: model shape, unit norms,
assignment partitioning, and recall against exact brute force — the
non-SQL-expressible op's correctness pinning (no DuckDB oracle possible
for an iterative float fit)."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import similarity
from kafka_connect_oss_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_kmeans_model_shape_and_unit_norm(spark, emb):
    cents = similarity.kmeans_centroids(emb, n_centroids=16, n_iters=3)
    rows = cents.collect()
    assert sorted(r.cid for r in rows) == list(range(1, 17))
    for r in rows:
        norm = sum(x * x for x in r.cv) ** 0.5
        assert abs(norm - 1.0) < 1e-9
        assert len(r.cv) == 64


def test_kmeans_assignment_covers_all_vectors(spark, emb):
    cents = similarity.kmeans_centroids(emb, n_centroids=8, n_iters=2)
    assigned = similarity.ivf_assign(emb, cents)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    cids = {r.cid for r in assigned.select("cid").distinct().collect()}
    assert cids <= set(range(1, 9))


def test_kmeans_ivf_recall_at_least_seed_quality(spark, emb):
    # fitted centroids must not be WORSE than the lowest-id seed stand-in:
    # recall@10 vs exact brute force, nprobe=4 of 16
    q = similarity.query_vector(spark, emb, 0)
    exact = {r.vec_id for r in
             similarity.topk_cosine(emb, q, k=10).collect()}

    seed_hits = {r.vec_id for r in
                 similarity.ann_ivf_topk(emb, q, k=10, n_centroids=16,
                                         nprobe=4).collect()}
    cents = similarity.kmeans_centroids(emb, n_centroids=16, n_iters=5)
    fit_hits = {r.vec_id for r in
                similarity.ann_ivf_topk(emb, q, k=10, nprobe=4,
                                        centroids=cents).collect()}
    assert len(fit_hits & exact) >= len(seed_hits & exact)
    # and the fitted index must be a usable ANN at all
    assert len(fit_hits & exact) >= 5


def test_kmeans_iterations_do_not_degenerate(spark, emb):
    # objective (mean max-cosine to assigned centroid) must not decrease
    # from iteration 1 to 5 — Lloyd's monotonicity, spherical variant
    def objective(cents):
        a = similarity.with_normalized(emb).select("vec_id", "nv")
        scored = (a.crossJoin(F.broadcast(cents))
                  .groupBy("vec_id")
                  .agg(F.max(similarity.V.dot(F.col("nv"), F.col("cv")))
                       .alias("best")))
        return scored.agg(F.avg("best")).first()[0]

    o1 = objective(similarity.kmeans_centroids(emb, 16, n_iters=1))
    o5 = objective(similarity.kmeans_centroids(emb, 16, n_iters=5))
    assert o5 >= o1 - 1e-9


def test_pq_codebooks_kmeans_fit_and_recall(spark, emb):
    # Euclidean per-subspace fit: shape, and ADC recall must not regress
    # vs the seed codebooks on the same query
    cbs = similarity.pq_codebooks_kmeans(emb, n_iters=3)
    assert len(cbs) == similarity.PQ_M
    assert all(len(cb) == similarity.PQ_CODES for cb in cbs)
    assert all(len(c) == 64 // similarity.PQ_M for cb in cbs for c in cb)

    q = similarity.query_vector(spark, emb, 0)
    exact = {r.vec_id for r in similarity.topk_cosine(emb, q, k=10).collect()}
    seed = {r.vec_id for r in similarity.ann_pq_topk(emb, q, k=10).collect()}
    fit = {r.vec_id for r in
           similarity.ann_pq_topk(emb, q, k=10, codebooks=cbs).collect()}
    assert len(fit & exact) >= len(seed & exact)


def test_kmeans_l2_assignment_is_argmin_distance(spark):
    # 1-d sanity: points cluster around 0 and 10; fitted centers separate
    rows = [(i, [float(i % 5)]) for i in range(10)] + \
           [(i, [10.0 + float(i % 5)]) for i in range(10, 20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.kmeans_centroids(df, n_centroids=2, n_iters=5,
                                        metric="l2")
    vals = sorted(r.cv[0] for r in cents.collect())
    assert abs(vals[0] - 2.0) < 1.0 and abs(vals[1] - 12.0) < 1.0


def test_kmeans_fit_survives_zero_norm_vector(spark, emb):
    # a zero embedding normalizes to an all-NULL array (round-7 guard);
    # the fit must train without it and still assign it downstream
    zero = spark.createDataFrame(
        [(99999, [0.0] * 64)], "vec_id long, embedding array<double>")
    both = emb.select("vec_id", "embedding").union(zero)
    cents = similarity.kmeans_centroids(both, n_centroids=8, n_iters=2)
    assert cents.count() == 8
    assigned = similarity.ivf_assign(both, cents)
    assert assigned.where(F.col("vec_id") == 99999).count() == 1
