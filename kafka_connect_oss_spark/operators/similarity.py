"""Similarity search over embeddings (driver-mandated extension).

Two paths:

  brute-force top-k   broadcast the query vector, one narrow pass computing
                      cosine, TopK via sort+limit (Spark executes this as
                      TakeOrderedAndProject — per-partition heaps + a tiny
                      driver merge, NOT a global sort). Exact; the baseline.
  sign-LSH ANN        bucket every vector by the signs of dot(v, plane_j)
                      for deterministic hyperplanes, probe only the query's
                      bucket. At 100 TB the bucket column is a partition/
                      cluster key so a probe touches ~1/2^planes of data.

No UDFs: dot products are zip_with/aggregate (codegen); planes are
integer-generated (functions/vectors.py) so DuckDB oracles reproduce them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_oss_spark.functions import rounding as R
from kafka_connect_oss_spark.functions import vectors as V


def query_vector(spark: SparkSession, embeddings: DataFrame,
                 vec_id: int, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """1-row DataFrame holding the (double-cast) query vector."""
    return (embeddings.where(F.col(id_col) == vec_id)
            .select(V.as_double_array(F.col(vec_col)).alias("qv")))


def topk_cosine(embeddings: DataFrame, query: DataFrame, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine: broadcast 1-row query, narrow pass, TopK."""
    scored = (embeddings
              .crossJoin(F.broadcast(query))
              .select(id_col,
                      R.fround(V.cosine(V.as_double_array(F.col(vec_col)),
                                       F.col("qv")), 6).alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def with_lsh_bucket(embeddings: DataFrame, n_planes: int = 4,
                    vec_col: str = "embedding") -> DataFrame:
    """Add the sign-LSH bucket id (narrow; the 100 TB layout would
    partition/cluster the table by this column)."""
    vexpr = f"cast({vec_col} as array<double>)"
    return embeddings.withColumn(
        "bucket", F.expr(V.lsh_bucket_sql(vexpr, n_planes, "spark")))


def ann_lsh_topk(embeddings: DataFrame, query: DataFrame, k: int = 10,
                 n_planes: int = 4, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: restrict the exact scorer to the query's bucket.

    Single-probe (bucket equality). Multi-probe = relax the equality to a
    hamming ball over bucket bits; same plan shape.
    """
    bucketed = with_lsh_bucket(embeddings, n_planes, vec_col)
    qb = with_lsh_bucket(query.withColumnRenamed("qv", vec_col),
                         n_planes, vec_col) \
        .select(F.col(vec_col).alias("qv"), F.col("bucket").alias("qbucket"))
    scored = (bucketed.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
              .select(id_col, "bucket",
                      R.fround(V.cosine(V.as_double_array(F.col(vec_col)),
                                       F.col("qv")), 6).alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)
