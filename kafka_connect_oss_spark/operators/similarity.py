"""Similarity search over embeddings (driver-mandated extension).

Three paths:

  brute-force top-k   broadcast the query vector, one narrow pass computing
                      cosine, TopK via sort+limit (Spark executes this as
                      TakeOrderedAndProject — per-partition heaps + a tiny
                      driver merge, NOT a global sort). Exact; the baseline.
  sign-LSH ANN        bucket every vector by the signs of dot(v, plane_j)
                      for deterministic hyperplanes, probe only the query's
                      bucket. At 100 TB the bucket column is a partition/
                      cluster key so a probe touches ~1/2^planes of data.
  IVF ANN             assign every vector to its nearest centroid (broadcast
                      K centroids, one narrow pass + argmax); probe only the
                      nprobe best centroids for the query. The cid column is
                      the physical partition key at scale.

No UDFs: dot products are zip_with/aggregate (codegen-adjacent HOFs); all
vectors are unit-normalized ONCE in a narrow pass (functions/vectors.
normalized_sql) so every comparison is a single dot product — HOF lambdas
are interpreted, so shaving the two norm folds per comparison is ~3x.
Planes/centroids are integer-generated/data-derived so DuckDB oracles
reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_oss_spark.functions import rounding as R
from kafka_connect_oss_spark.functions import vectors as V


def with_normalized(embeddings: DataFrame, vec_col: str = "embedding",
                    out_col: str = "nv") -> DataFrame:
    """Add the unit-normalized vector column (narrow, once per row)."""
    nv = V.normalized_sql(f"cast({vec_col} as array<double>)", "spark")
    return embeddings.withColumn(out_col, F.expr(nv))


def query_vector(spark: SparkSession, embeddings: DataFrame,
                 vec_id: int, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """1-row DataFrame holding the unit-normalized query vector."""
    return (with_normalized(embeddings.where(F.col(id_col) == vec_id),
                            vec_col, "qv")
            .select("qv"))


def topk_cosine(embeddings: DataFrame, query: DataFrame, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine: broadcast 1-row query, narrow pass, TopK."""
    scored = (with_normalized(embeddings, vec_col)
              .crossJoin(F.broadcast(query))
              .select(id_col,
                      R.fround(V.dot(F.col("nv"), F.col("qv")), 6)
                      .alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def with_lsh_bucket(embeddings: DataFrame, n_planes: int = 4,
                    vec_col: str = "nv") -> DataFrame:
    """Add the sign-LSH bucket id (narrow; the 100 TB layout would
    partition/cluster the table by this column). Buckets are computed on
    the normalized vector — signs are scale-invariant, so it equals the
    raw-vector bucket."""
    return embeddings.withColumn(
        "bucket", F.expr(V.lsh_bucket_sql(vec_col, n_planes, "spark")))


def ann_lsh_topk(embeddings: DataFrame, query: DataFrame, k: int = 10,
                 n_planes: int = 4, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: restrict the exact scorer to the query's bucket.

    Single-probe (bucket equality). Multi-probe = relax the equality to a
    hamming ball over bucket bits; same plan shape.
    """
    bucketed = with_lsh_bucket(with_normalized(embeddings, vec_col), n_planes)
    qb = (with_lsh_bucket(query.withColumnRenamed("qv", "nv"), n_planes)
          .select(F.col("nv").alias("qv"), F.col("bucket").alias("qbucket")))
    scored = (bucketed.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
              .select(id_col, "bucket",
                      R.fround(V.dot(F.col("nv"), F.col("qv")), 6)
                      .alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def ann_lsh_multiprobe_topk(embeddings: DataFrame, query: DataFrame,
                            k: int = 10, n_planes: int = 4,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> DataFrame:
    """Multi-probe LSH: search the query's bucket plus every bucket at
    hamming distance 1 (one plane flipped) — recall of ~(n_planes+1)x the
    single-probe candidate pool for the same index, no rebuild. The probe
    list stays tiny (n_planes+1 rows) and broadcasts; plan shape is
    identical to single-probe with an IN-list bucket join."""
    bucketed = with_lsh_bucket(with_normalized(embeddings, vec_col), n_planes)
    qb = (with_lsh_bucket(query.withColumnRenamed("qv", "nv"), n_planes)
          .select(F.col("nv").alias("qv"), F.col("bucket").alias("qbucket")))
    masks = F.array(*[F.lit(m) for m in [0] + [1 << j for j in range(n_planes)]])
    probes = (qb.withColumn("m", F.explode(masks))
              .select("qv", F.expr("cast(qbucket ^ m as bigint)")
                      .alias("pbucket")))
    scored = (bucketed.join(F.broadcast(probes),
                            F.col("bucket") == F.col("pbucket"))
              .select(id_col, "bucket",
                      R.fround(V.dot(F.col("nv"), F.col("qv")), 6)
                      .alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def ivf_centroids(embeddings: DataFrame, n_centroids: int = 16,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Deterministic seed centroids: the n lowest-id vectors, normalized.

    Stands in for an offline KMeans fit (pyspark.ml.clustering.KMeans on a
    sample, model broadcast) — seed-vector centroids keep the whole index
    SQL-expressible for the oracle while exercising the identical plan
    shape; swap this function for the fitted model at deploy time.
    """
    return (with_normalized(embeddings.where(F.col(id_col) < n_centroids),
                            vec_col, "cv")
            .select(F.col(id_col).alias("cid"), "cv"))


def ivf_assign(embeddings: DataFrame, centroids: DataFrame,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF build: nearest centroid per vector (broadcast K centroids, one
    narrow pass + argmax). At 100 TB this output IS the physical layout —
    write the table partitioned/clustered by `cid` so probes prune files.

    Ties break to the lowest cid (row_number, not max_by) so both engines
    agree deterministically.
    """
    from pyspark.sql import Window

    e = with_normalized(embeddings, vec_col).select(id_col, "nv")
    scored = (e.crossJoin(F.broadcast(centroids))
              .select(id_col, "cid", V.dot(F.col("nv"), F.col("cv"))
                      .alias("ccos")))
    w = Window.partitionBy(id_col).orderBy(F.col("ccos").desc(), F.col("cid"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).select(id_col, "cid"))


def ann_ivf_topk(embeddings: DataFrame, query: DataFrame, k: int = 10,
                 n_centroids: int = 16, nprobe: int = 4,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF probe: rank centroids against the query, exact-search only the
    vectors assigned to the best `nprobe` centroids (~nprobe/n_centroids of
    the corpus; with cid-partitioned layout the scan prunes to those files).
    """
    cents = ivf_centroids(embeddings, n_centroids, vec_col, id_col)
    assigned = ivf_assign(embeddings, cents, vec_col, id_col)
    probe = (query.crossJoin(F.broadcast(cents))
             .select(F.col("cid"),
                     V.dot(F.col("qv"), F.col("cv")).alias("qcos"))
             .orderBy(F.col("qcos").desc(), F.col("cid")).limit(nprobe)
             .select("cid"))
    e = with_normalized(embeddings, vec_col).select(id_col, "nv")
    cand = (e.join(assigned, id_col).join(F.broadcast(probe), "cid"))
    scored = (cand.crossJoin(F.broadcast(query))
              .select(id_col, "cid",
                      R.fround(V.dot(F.col("nv"), F.col("qv")), 6)
                      .alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)
