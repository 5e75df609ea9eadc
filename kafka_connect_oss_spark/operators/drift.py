"""Corpus drift detection between two snapshots (driver-mandated
LLM-pipeline extension: monitoring).

A pretraining pipeline re-crawls and re-publishes continuously; the
question "did this source's CONTENT DISTRIBUTION move since the
baseline?" has to be answered per publish, before a drifted source
poisons a mixture that was tuned against the old distribution. Count
deltas (corpus_snapshot_diff) see churn; this sees SHIFT — a source can
replace every document and keep its distribution, or keep 90% of them
and still pivot its vocabulary.

Per source, the report carries the standard monitoring battery:

* smoothed unigram KL(snap || base) over the union vocabulary — the
  language-model-free distribution-shift number (same family as the
  DSIR importance ratios, aggregated corpus-side instead of per-doc);
* new-vocab rate — the fraction of the snapshot's vocabulary unseen in
  the baseline (OCR noise / language flips / spam injections spike it
  even when KL stays moderate, because smoothing dampens rare words);
* volume and length deltas (docs, tokens, mean chars) — the cheap
  sanity row that catches a broken upstream filter.

Scale shape: two word-count aggregates (map-side combined, output is
vocabulary-sized by Heaps' law), ONE full-outer join on (source, word),
a sources-sized totals aggregate broadcast back, then one final
per-source aggregate. Nothing is ever keyed finer than (source, word);
no windows, no driver state.

Cross-engine determinism: every KL addend rounds to 9 decimals BEFORE
summation (the pagerank discipline — both engines then sum identical
addend multisets, so ordering epsilon sits ~1e-15, far below the final
4-decimal rounding bin); counts and totals are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_oss_spark.functions import rounding as R
from kafka_connect_oss_spark.functions import text as X

#: add-k smoothing mass per word of the union vocabulary — keeps the KL
#: finite for words on one side only, identical constant in the oracle
SMOOTHING = 0.5


def _word_counts(docs: DataFrame, text_col: str, source_col: str,
                 tag: str) -> DataFrame:
    tok = X.sql_tokens(text_col, "spark")
    return (docs.select(source_col, F.explode(F.expr(tok)).alias("_w"))
            .groupBy(source_col, "_w")
            .agg(F.count(F.lit(1)).cast("long").alias(f"c_{tag}")))


def _doc_stats(docs: DataFrame, text_col: str, source_col: str,
               tag: str) -> DataFrame:
    return (docs.groupBy(source_col)
            .agg(F.count(F.lit(1)).cast("long").alias(f"docs_{tag}"),
                 F.sum(F.length(text_col)).cast("long")
                 .alias(f"chars_{tag}")))


def drift_report(base: DataFrame, snap: DataFrame, text_col: str = "text",
                 source_col: str = "source") -> DataFrame:
    """Per-source distribution-shift report of ``snap`` against ``base``.

    Returns (source, n_docs_base, n_docs_snap, tokens_base, tokens_snap,
    union_vocab, new_vocab_rate, kl_snap_base, mean_chars_delta), one
    row per source present in either snapshot. Sources missing from one
    side report against the smoothed-uniform baseline (KL is finite by
    smoothing; doc/token counts show 0).
    """
    k = SMOOTHING
    b = _word_counts(base, text_col, source_col, "b")
    s = _word_counts(snap, text_col, source_col, "s")
    j = (b.join(s, [source_col, "_w"], "full_outer")
         .select(source_col, "_w",
                 F.coalesce("c_b", F.lit(0)).alias("c_b"),
                 F.coalesce("c_s", F.lit(0)).alias("c_s")))
    tot = (j.groupBy(source_col)
           .agg(F.sum("c_b").cast("long").alias("t_b"),
                F.sum("c_s").cast("long").alias("t_s"),
                F.count(F.lit(1)).cast("long").alias("v_union"),
                F.sum(F.when((F.col("c_s") > 0) & (F.col("c_b") == 0), 1)
                      .otherwise(0)).cast("long").alias("v_new"),
                F.sum(F.when(F.col("c_s") > 0, 1).otherwise(0))
                .cast("long").alias("v_s")))
    p = (F.col("c_s") + k) / (F.col("t_s") + k * F.col("v_union"))
    q = (F.col("c_b") + k) / (F.col("t_b") + k * F.col("v_union"))
    term = R.fround(p * F.log(p / q), 9)
    kl = (j.join(F.broadcast(tot), source_col)
          .groupBy(source_col)
          .agg(R.fround(F.sum(term), 4).alias("kl_snap_base")))
    db = _doc_stats(base, text_col, source_col, "b")
    ds = _doc_stats(snap, text_col, source_col, "s")
    # left-join from the token totals: the report is keyed by sources
    # with at least one token on either side (a doc-bearing but
    # token-free source is degenerate; both engines drop it identically)
    out = (tot.join(kl, source_col)
           .join(db, source_col, "left")
           .join(ds, source_col, "left"))
    mean_b = F.col("chars_b") / F.col("docs_b")
    mean_s = F.col("chars_s") / F.col("docs_s")
    return out.select(
        source_col,
        F.coalesce("docs_b", F.lit(0)).cast("long").alias("n_docs_base"),
        F.coalesce("docs_s", F.lit(0)).cast("long").alias("n_docs_snap"),
        F.col("t_b").alias("tokens_base"),
        F.col("t_s").alias("tokens_snap"),
        F.col("v_union").alias("union_vocab"),
        R.fround(F.col("v_new") / F.nullif(F.col("v_s").cast("double"),
                                           F.lit(0.0)), 4)
        .alias("new_vocab_rate"),
        "kl_snap_base",
        R.fround(F.coalesce(mean_s, F.lit(0.0))
                 - F.coalesce(mean_b, F.lit(0.0)), 4)
        .alias("mean_chars_delta"))


def drift_report_oracle_sql(base_expr: str, snap_expr: str,
                            text_col: str = "text",
                            source_col: str = "source") -> str:
    """DuckDB mirror: identical smoothing constant, identical 9-decimal
    addend rounding, identical final rounding."""
    k = SMOOTHING
    btok = X.sql_tokens(text_col, "duckdb")
    term = R.round_sql(
        f"((c_s + {k}) / (t_s + {k} * v_union))"
        f" * ln(((c_s + {k}) / (t_s + {k} * v_union))"
        f" / ((c_b + {k}) / (t_b + {k} * v_union)))", 9)
    return f"""WITH wb AS (
      SELECT {source_col}, w, CAST(COUNT(*) AS BIGINT) AS c_b
      FROM (SELECT {source_col}, UNNEST({btok}) AS w FROM {base_expr})
      GROUP BY {source_col}, w),
    ws AS (
      SELECT {source_col}, w, CAST(COUNT(*) AS BIGINT) AS c_s
      FROM (SELECT {source_col}, UNNEST({btok}) AS w FROM {snap_expr})
      GROUP BY {source_col}, w),
    j AS (
      SELECT COALESCE(wb.{source_col}, ws.{source_col}) AS {source_col},
             COALESCE(wb.w, ws.w) AS w,
             COALESCE(c_b, 0) AS c_b, COALESCE(c_s, 0) AS c_s
      FROM wb FULL OUTER JOIN ws
        ON wb.{source_col} = ws.{source_col} AND wb.w = ws.w),
    tot AS (
      SELECT {source_col}, CAST(SUM(c_b) AS BIGINT) AS t_b,
             CAST(SUM(c_s) AS BIGINT) AS t_s,
             CAST(COUNT(*) AS BIGINT) AS v_union,
             CAST(SUM(CASE WHEN c_s > 0 AND c_b = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_new,
             CAST(SUM(CASE WHEN c_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS v_s
      FROM j GROUP BY {source_col}),
    kl AS (
      SELECT j.{source_col},
             {R.round_sql(f"SUM({term})", 4)} AS kl_snap_base
      FROM j JOIN tot USING ({source_col})
      GROUP BY j.{source_col}),
    db AS (SELECT {source_col}, CAST(COUNT(*) AS BIGINT) AS docs_b,
                  CAST(SUM(length({text_col})) AS BIGINT) AS chars_b
           FROM {base_expr} GROUP BY {source_col}),
    ds AS (SELECT {source_col}, CAST(COUNT(*) AS BIGINT) AS docs_s,
                  CAST(SUM(length({text_col})) AS BIGINT) AS chars_s
           FROM {snap_expr} GROUP BY {source_col})
    SELECT t.{source_col},
           CAST(COALESCE(db.docs_b, 0) AS BIGINT) AS n_docs_base,
           CAST(COALESCE(ds.docs_s, 0) AS BIGINT) AS n_docs_snap,
           t.t_b AS tokens_base, t.t_s AS tokens_snap,
           t.v_union AS union_vocab,
           {R.round_sql("t.v_new / CAST(nullif(t.v_s, 0) AS DOUBLE)", 4)}
             AS new_vocab_rate,
           kl.kl_snap_base,
           {R.round_sql(
               "COALESCE(ds.chars_s / CAST(ds.docs_s AS DOUBLE), 0)"
               " - COALESCE(db.chars_b / CAST(db.docs_b AS DOUBLE), 0)",
               4)} AS mean_chars_delta
    FROM tot t JOIN kl USING ({source_col})
    LEFT JOIN db ON db.{source_col} = t.{source_col}
    LEFT JOIN ds ON ds.{source_col} = t.{source_col}"""
