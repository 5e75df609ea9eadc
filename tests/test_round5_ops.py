"""Round-5 corpus operators: scale-posture (plan shape) + semantic pins
beyond the DuckDB parity suite (tests/test_oracle_parity.py covers values).
"""

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import similarity, text as TXT
from kafka_connect_oss_spark.sources.batch import load_table


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunking_is_narrow_no_shuffle(spark, sf_dir):
    # chunking must stay a projection over the scan: no Exchange at any scale
    df = TXT.chunk_documents(load_table(spark, sf_dir, "documents"))
    assert "Exchange" not in _physical(df)


def test_chunking_covers_every_char(spark, sf_dir):
    # last chunk of each doc must reach the end of the text, first must
    # start at char 1 (chunk_id 0), and chunk starts hop by the stride
    docs = load_table(spark, sf_dir, "documents")
    chunks = TXT.chunk_documents(docs, size=120, stride=80)
    cover = (chunks.groupBy("doc_id")
             .agg(F.max(F.col("chunk_id") * 80 + F.col("chunk_len"))
                  .alias("covered"),
                  F.min("chunk_id").alias("first_id"))
             .join(docs.select("doc_id", F.length("text").alias("n")),
                   "doc_id"))
    bad = cover.where((F.col("covered") != F.col("n")) |
                      (F.col("first_id") != 0)).count()
    assert bad == 0


def test_random_projection_is_narrow_no_shuffle(spark, sf_dir):
    # the projection itself is narrow: no KEYED (hashpartitioning)
    # exchange at any scale. A round-robin fan-out exchange is permitted
    # — it only appears under small local scans (dedup._fan_out no-ops
    # at production split counts) and carries no key semantics.
    df = similarity.random_projection(
        load_table(spark, sf_dir, "embeddings"), dim=64)
    assert "hashpartitioning" not in _physical(df)


def test_random_projection_code_matches_component_signs(spark, sf_dir):
    df = similarity.random_projection(
        load_table(spark, sf_dir, "embeddings"), dim=64).limit(50)
    for row in df.collect():
        code = sum(1 << j for j in range(similarity.RP_DIM)
                   if row[f"rp{j}"] > 0)
        assert code == row["rp_code"]


def test_rare_token_score_no_forced_broadcast(spark, sf_dir):
    # the DF table is vocabulary-sized and GROWS with the corpus: the join
    # must carry no broadcast hint (AQE decides at runtime) — the same
    # discipline VERDICT r04 demanded of dedup_cleaned_corpus
    df = TXT.rare_token_score(load_table(spark, sf_dir, "documents"))
    assert "ResolvedHint" not in df._jdf.queryExecution().analyzed().toString()


def test_rare_token_score_bounds(spark, sf_dir):
    # min_df >= 1, mean_df >= min_df, and every token's DF <= n_docs
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    scored = TXT.rare_token_score(docs)
    bad = scored.where((F.col("min_df") < 1) |
                       (F.col("mean_df") < F.col("min_df")) |
                       (F.col("mean_df") > n_docs)).count()
    assert bad == 0


def test_cross_source_overlap_symmetric_bounds(spark, sf_dir):
    # jaccard in (0, 1]; source_a < source_b (each unordered pair once)
    df = TXT.cross_source_overlap(load_table(spark, sf_dir, "documents"))
    rows = df.collect()
    assert rows, "synthetic sources share vocabulary — expect overlap"
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["n_shared"] >= 1


def test_token_budget_shares_sum_to_one(spark, sf_dir):
    df = TXT.token_budget(load_table(spark, sf_dir, "documents"))
    total_share = df.agg(F.sum("token_share")).first()[0]
    assert abs(total_share - 1.0) < 1e-2  # rounding of 20 shares to 4dp
    assert df.where(F.col("n_tokens") <= 0).count() == 0


def test_normalize_text_is_narrow_no_shuffle(spark, sf_dir):
    df = TXT.normalize_text(load_table(spark, sf_dir, "documents"))
    assert "Exchange" not in _physical(df)


def test_quantize_embeddings_is_narrow_no_shuffle(spark, sf_dir):
    df = similarity.quantize_embeddings(load_table(spark, sf_dir,
                                                   "embeddings"))
    assert "Exchange" not in _physical(df)


def test_quantize_roundtrip_error_bounded(spark, sf_dir):
    # dequantized values must sit within one quantization step of the
    # original: |x - (mn + q*(mx-mn)/255)| <= (mx-mn)/255 per vector
    from pyspark.sql import functions as F
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.quantize_embeddings(emb)
    joined = q.join(emb, "vec_id").select(
        F.expr(
            "aggregate(zip_with(cast(embedding as array<double>), "
            "transform(split(q, ','), s -> cast(s as int)), "
            "(x, c) -> abs(x - (mn + c * (mx - mn) / 255.0))), 0D, "
            "(acc, e) -> greatest(acc, e))").alias("max_err"),
        ((F.col("mx") - F.col("mn")) / 255.0).alias("step"))
    bad = joined.where(F.col("max_err") > F.col("step") * 1.0001).count()
    assert bad == 0


def test_exact_quantile_matches_explicit_sort(spark, sf_dir):
    import math

    from kafka_connect_oss_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    for p in (0.25, 0.5, 0.9):
        got = {r[0]: r[1] for r in
               SK.exact_quantile_disc(ev, "value", p, "event_type").collect()}
        rows = ev.select("event_type", "value").collect()
        groups = {}
        for r in rows:
            groups.setdefault(r.event_type, []).append(r.value)
        want = {g: sorted(vs)[max(1, math.ceil(p * len(vs))) - 1]
                for g, vs in groups.items()}
        assert got == want, p


def test_exact_quantile_edge_groups(spark):
    from kafka_connect_oss_spark.operators import sketches as SK

    df = spark.createDataFrame(
        [("solo", 42.0)] + [("flat", 7.0)] * 50 +
        [("two", 1.0), ("two", 2.0)],
        "event_type string, value double")
    got = {r[0]: r[1] for r in
           SK.exact_quantile_disc(df, "value", 0.5, "event_type").collect()}
    assert got == {"solo": 42.0, "flat": 7.0, "two": 1.0}


def test_exact_quantile_null_values_and_numeric_group(spark):
    """NULL values are ignored (SQL aggregate semantics), all-NULL groups
    vanish, NULL group keys form their own group, and a numeric group
    key joins without implicit casts (broadcast frames carry df's own
    group dtype)."""
    import math

    from kafka_connect_oss_spark.operators import sketches as SK

    big = 2**62 + 1  # silently lost if long=string comparisons cast to double
    rows = ([(big, float(v)) for v in range(1, 11)] +
            [(big, None)] * 3 +
            [(7, 5.0), (7, None)] +
            [(None, 1.0), (None, 3.0)] +
            [(999, None)])
    df = spark.createDataFrame(rows, "grp long, value double")
    got = {r[0]: r[1] for r in
           SK.exact_quantile_disc(df, "value", 0.5, "grp").collect()}
    assert got == {big: sorted(range(1, 11))[math.ceil(0.5 * 10) - 1] * 1.0,
                   7: 5.0, None: 1.0}


def test_exact_quantile_unbounded_group_key_fails_fast(spark):
    """The bounded-groups contract is self-enforcing (r12 VERDICT item 1):
    a group key whose cardinality exceeds max_groups raises an actionable
    ValueError instead of collecting an unbounded stats/histogram set on
    the driver — and the guard's own job ships at most max_groups + 1
    rows (LocalLimit), so the failure itself is cheap."""
    import pytest

    from kafka_connect_oss_spark.operators import sketches as SK

    df = spark.range(0, 500).selectExpr(
        "CAST(id AS STRING) AS doc_id", "CAST(id AS DOUBLE) AS value")
    with pytest.raises(ValueError, match="doc_id.*max_groups=100"):
        SK.exact_quantile_disc(df, "value", 0.5, "doc_id", max_groups=100)
    # at-the-cap cardinality still works (the cap is exclusive)
    out = SK.exact_quantile_disc(df.limit(100), "value", 0.5, "doc_id",
                                 max_groups=100)
    assert out.count() == 100
