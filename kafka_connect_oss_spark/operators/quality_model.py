"""Learned document-quality scorer — heuristic-filter distillation into a
logistic model (round 10).

Public recipe shape: production corpus pipelines distill their hard rule
sets (Gopher-style gates) or small labeled sets into a cheap linear
classifier over surface features, then score everything with it (the
CCNet/fastText-quality pattern: a linear model over hashed features at
corpus scale; here the features are the same surface statistics the rule
set reads, so the scorer is a smooth version of the gate).

The 100 TB discipline is the k-means one (`similarity.kmeans_centroids`
— train bounded, apply distributed):

* FEATURES are pure engine-paired column expressions (the same
  tokens/stopword/symbol math the Gopher gates use) — no UDF, no
  shuffle, oracle-mirrored in DuckDB;
* FIT runs on a deterministic hash-stride sample (content-stable: the
  same rows train at any partitioning/scale), collected bounded to the
  driver, full-batch gradient descent in float64 numpy with fixed
  iterations/rate, final parameters rounded to 9 decimals — independent
  fits are bit-identical (the kmeans determinism guarantee);
* SCORING inlines the fitted parameters as literals into one sigmoid
  projection — whole-stage codegen, embarrassingly parallel, zero
  shuffle, and the DuckDB oracle computes the identical arithmetic.

A tiny linear model never needs the cluster to FIT (a 65k-row sample
saturates it); the cluster is for the scoring pass. Labels default to
the Gopher composite gate (self-distillation); pass ``label_col`` to
fit on real labels instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_oss_spark.functions import hashing as H
from kafka_connect_oss_spark.functions import text as X

#: feature name -> (spark_expr, duckdb_expr) over a token-array binding
#: `t` and the raw text column; every expression NULL-guards empty docs
#: to 0 so the model sees finite inputs everywhere.
def _feature_exprs(text_col: str) -> dict[str, tuple[str, str]]:
    out: dict[str, tuple[str, str]] = {}
    for dialect in ("spark", "duckdb"):
        tok = X.sql_tokens(text_col, dialect)
        size = "size" if dialect == "spark" else "len"
        fil = "filter" if dialect == "spark" else "list_filter"
        tf = "transform" if dialect == "spark" else "list_transform"
        dedup = "array_distinct" if dialect == "spark" else "list_distinct"
        # size(NULL) is NULL in both engines, so a NULL text column would
        # flow NaN into the numpy fit and NULL quality_prob at scoring —
        # guard the count itself and every feature is finite (the other
        # five already COALESCE their NULL-propagating divisions to 0)
        n = f"COALESCE({size}({tok}), 0)"
        if dialect == "spark":
            tlen_sum = f"aggregate({tok}, 0, (acc, x) -> acc + length(x))"
            rx = f"{size}({fil}({tok}, x -> x rlike '[A-Za-z]'))"
        else:
            tlen_sum = f"list_sum({tf}({tok}, x -> length(x)))"
            rx = (f"{size}({fil}({tok}, x -> regexp_matches(x, "
                  f"'[A-Za-z]')))")
        nstop = X.sql_count_matching(tok, X.QUALITY_STOPWORDS, dialect)
        sym = (f"((length({text_col}) - length(replace({text_col}, '#', "
               f"''))) + (length({text_col}) - length(replace({text_col},"
               f" '...', ''))) / 3)")
        feats = {
            "f_n_words": f"CAST({n} AS DOUBLE)",
            "f_mean_word_len":
                f"COALESCE({tlen_sum} / CAST(NULLIF({n}, 0) AS DOUBLE), 0)",
            "f_stopword_ratio":
                f"COALESCE({nstop} / CAST(NULLIF({n}, 0) AS DOUBLE), 0)",
            "f_alpha_frac":
                f"COALESCE({rx} / CAST(NULLIF({n}, 0) AS DOUBLE), 0)",
            "f_symbol_ratio":
                f"COALESCE({sym} / CAST(NULLIF({n}, 0) AS DOUBLE), 0)",
            "f_distinct_ratio":
                f"COALESCE({size}({dedup}({tok})) "
                f"/ CAST(NULLIF({n}, 0) AS DOUBLE), 0)",
        }
        for k, v in feats.items():
            cur = out.get(k, (None, None))
            out[k] = (v, cur[1]) if dialect == "spark" else (cur[0], v)
    return out


FEATURE_NAMES = list(_feature_exprs("text"))


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc surface-statistic feature frame (id + the 6 features) —
    one narrow projection, no shuffle."""
    fx = _feature_exprs(text_col)
    return docs.select(
        id_col, *[F.expr(fx[name][0]).alias(name) for name in FEATURE_NAMES])


def _gopher_label_expr(text_col: str) -> str:
    """The composite Gopher gate as a 0/1 label (mirrors
    text.gopher_quality_flags pass_gopher)."""
    tok = X.sql_tokens(text_col, "spark")
    n = f"size({tok})"
    mean_len = (f"(aggregate({tok}, 0, (acc, x) -> acc + length(x)) "
                f"/ CAST(nullif({n}, 0) AS DOUBLE))")
    alpha = (f"(size(filter({tok}, x -> x rlike '[A-Za-z]')) "
             f"/ CAST(nullif({n}, 0) AS DOUBLE))")
    nstop = X.sql_count_matching(tok, X.QUALITY_STOPWORDS, "spark")
    sym = (f"((length({text_col}) - length(replace({text_col}, '#', ''))) "
           f"+ (length({text_col}) - length(replace({text_col}, '...', "
           f"''))) / 3)")
    return (f"CAST(({n} BETWEEN 50 AND 100000) "
            f"AND coalesce({mean_len} >= 3.0 AND {mean_len} <= 10.0, false)"
            f" AND coalesce({sym} / CAST(nullif({n}, 0) AS DOUBLE) <= 0.1, "
            f"false) AND coalesce({alpha} >= 0.8, false) "
            f"AND {nstop} >= 2 AS INT)")


def fit_quality_classifier(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           label_col: str | None = None,
                           sample_size: int = 65536,
                           n_iters: int = 300,
                           lr: float = 0.5) -> dict:
    """Deterministic logistic fit. Returns the model as plain rounded
    floats: {"names", "mu", "sigma", "w", "b"} — 9-decimal rounding is
    the bit-identical-refit guarantee (kmeans discipline), and the
    literals feed both the Spark scorer and the DuckDB oracle.

    Sample: hash-stride on the id (content-stable across partitionings
    and re-runs); collect is <= sample_size rows x 7 doubles. GD:
    full-batch, float64, fixed iters/rate, features standardized by
    sample mean/std (degenerate std -> 1)."""
    import math

    import numpy as np

    label = F.expr(label_col) if label_col else \
        F.expr(_gopher_label_expr(text_col))
    fx = _feature_exprs(text_col)
    # one projection: features AND the label (the label expression reads
    # the raw text column, which the feature frame no longer carries)
    feats = docs.select(
        id_col,
        *[F.expr(fx[name][0]).alias(name) for name in FEATURE_NAMES],
        label.alias("_y"))
    n_rows = docs.count()
    stride = max(1, math.ceil(n_rows / sample_size))
    key = F.expr(H.base_hash(f"CAST({id_col} AS STRING)", "spark"))
    sample = (feats.where(F.pmod(key, F.lit(stride)) == 0)
              .orderBy(id_col)
              .limit(sample_size).collect())
    Xm = np.array([[r[name] for name in FEATURE_NAMES] for r in sample],
                  dtype=np.float64)
    y = np.array([r["_y"] for r in sample], dtype=np.float64)
    mu = Xm.mean(axis=0)
    sigma = Xm.std(axis=0)
    sigma[sigma == 0] = 1.0
    Z = (Xm - mu) / sigma
    w = np.zeros(Z.shape[1])
    b = 0.0
    m = len(y)
    for _ in range(n_iters):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        g = p - y
        w -= lr * (Z.T @ g) / m
        b -= lr * g.mean()
    return {"names": list(FEATURE_NAMES),
            "mu": [round(float(v), 9) for v in mu],
            "sigma": [round(float(v), 9) for v in sigma],
            "w": [round(float(v), 9) for v in w],
            "b": round(float(b), 9)}


def _score_sql(model: dict, text_col: str, dialect: str) -> str:
    fx = _feature_exprs(text_col)
    i = 0 if dialect == "spark" else 1
    terms = [
        f"({model['w'][j]} * (({fx[name][i]}) - {model['mu'][j]}) "
        f"/ {model['sigma'][j]})"
        for j, name in enumerate(model["names"])]
    z = " + ".join([str(model["b"])] + terms)
    return f"ROUND(1.0 / (1.0 + exp(-({z}))), 4)"


def quality_score(docs: DataFrame, model: dict, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide scoring with a fitted model: ONE sigmoid projection
    with the parameters inlined as literals — codegen, zero shuffle.
    Returns (id_col, quality_prob) rounded to 4 (identical double math
    in the oracle)."""
    return docs.select(
        id_col,
        F.expr(_score_sql(model, text_col, "spark"))
        .alias("quality_prob"))


def quality_score_oracle_sql(table_expr: str, model: dict,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> str:
    """DuckDB mirror of ``quality_score`` for the same fitted model."""
    return (f"SELECT {id_col}, {_score_sql(model, text_col, 'duckdb')} "
            f"AS quality_prob FROM {table_expr}")
